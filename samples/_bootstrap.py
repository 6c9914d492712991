"""Make ``import liblcg_tpu`` work when a sample is run straight from a
source checkout (``python samples/sampleN.py``) without ``pip install -e .``.

``python script.py`` puts ``samples/`` — not the repo root — on
``sys.path``; this module (importable precisely because samples/ is on the
path) adds the repo root only when the package is not already installed.
The installed package always wins.
"""

import importlib.util
import os
import sys

if importlib.util.find_spec("liblcg_tpu") is None:
    _repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    if _repo not in sys.path:
        sys.path.insert(0, _repo)
