"""LIVE reference-binary oracle: rebuild the reference and re-measure.

test_reference_parity.py pins iteration counts measured from the
reference binary; this test keeps that oracle honest by actually
building the unmodified reference sources (profiling/
make_reference_counts.sh --quick, cached objects after the first run)
and asserting the pinned counts against a fresh run of its own
lcg_solver/clcg_solver.  Deterministic rows must match exactly; the
random-shadow methods (complex CGS/TFQMR seed from time(0) inside the
reference) get the same bands the parity tests use.
"""

import json
import os
import shutil
import subprocess

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "profiling", "make_reference_counts.sh")


@pytest.mark.skipif(shutil.which("g++") is None, reason="needs g++")
@pytest.mark.skipif(
    not os.path.exists("/root/reference/src/lib/lcg.cpp"),
    reason="reference sources not present",
)
def test_reference_binary_counts_live():
    proc = subprocess.run(
        ["bash", SCRIPT, "--quick"], capture_output=True, text=True,
        timeout=420, cwd=ROOT,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    got = json.loads(proc.stdout)

    real = got["real_case10k_eps1e-12"]
    # Deterministic recurrences: exact.
    assert real["cg"]["iterations"] == 121
    assert real["cgs"]["iterations"] == 68
    # omega/restart arithmetic is rounding-sensitive run to run.
    assert abs(real["bicgstab"]["iterations"] - 80) <= 5
    assert abs(real["bicgstab2"]["iterations"] - 81) <= 6

    # Random-shadow methods (the reference seeds rbar0 from time(0)):
    # counts swing WIDELY run to run — measured c10k cgs 707-827 and c1k
    # tfqmr 1450-1616 across four regenerations — so the live assertion
    # is a broad plausibility band; the deterministic rows above carry
    # the exact parity.
    c1k = got["complex_case1k_eps1e-6_absdiff"]
    assert c1k["bicg"]["iterations"] == 407
    assert c1k["bicg_sym"]["iterations"] == 407
    assert abs(c1k["cgs"]["iterations"] - 732) <= 250
    assert abs(c1k["tfqmr"]["iterations"] - 1464) <= 400

    c10k = got["complex_case10k_eps1e-6_absdiff"]
    assert c10k["bicg"]["iterations"] == 450
    assert c10k["bicg_sym"]["iterations"] == 450
    assert abs(c10k["cgs"]["iterations"] - 817) <= 250
    assert abs(c10k["tfqmr"]["iterations"] - 1536) <= 400

    # Every run CONVERGED (0 = LCG_CONVERGENCE; positive codes are
    # non-convergence exits, negatives are errors).
    for grp in (real, c1k, c10k):
        for name, row in grp.items():
            assert row["ret"] == 0, (name, row)
