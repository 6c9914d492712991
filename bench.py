#!/usr/bin/env python
"""Driver entry: delegates to the packaged benchmark
(``liblcg_tpu/bench.py``; also installed as ``liblcg-tpu-bench``).

Run from the repo root (``python bench.py``) or anywhere with the package
installed.  Prints ONE JSON line.
"""

from liblcg_tpu.bench import main

if __name__ == "__main__":
    main()
