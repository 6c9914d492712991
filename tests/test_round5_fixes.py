"""Round-5 regression tests.

VERDICT r4 item 4: the bench stdout JSON line outgrew the driver's
2000-char tail window (BENCH_r03/r04 ``"parsed": null``).  The fix is a
compact curated headline line on stdout + the full record in
``bench_full.json``.  These tests pin the contract.
"""

import json

from liblcg_tpu.bench import _COMPACT_MAP, _OK_KEYS, _compact_report


def _worst_case_full_report():
    out = {
        "metric": "laplacian128_f64_cg100_device_ms",
        "value": 123456.789,
        "unit": "ms",
        "vs_baseline": 123456.789,
        "device": "TpuDevice(id=0, process_index=0, coords=(0,0,0))",
    }
    for full_key, _ in _COMPACT_MAP:
        out[full_key] = 123456.789
    for k in _OK_KEYS:
        out[k] = True
    out["stale_fields_from_prior_run"] = ["w (from 2026-01-01T00:00:00Z)"]
    return out


def test_compact_line_fits_driver_tail_window():
    line = json.dumps(_compact_report(_worst_case_full_report()))
    # Driver tail is 2000 chars; leave headroom for incidental stdout.
    assert len(line) < 1500, len(line)


def test_compact_line_keeps_driver_contract_fields():
    c = _compact_report(_worst_case_full_report())
    for k in ("metric", "value", "unit", "vs_baseline"):
        assert k in c
    assert c["ok"] is True
    assert c["stale_n"] == 1


def test_compact_ok_false_when_any_workload_failed():
    out = _worst_case_full_report()
    out["case10kc_ok"] = False
    assert _compact_report(out)["ok"] is False


def test_compact_ok_false_when_no_ok_fields_present():
    out = _worst_case_full_report()
    for k in _OK_KEYS:
        del out[k]
    assert _compact_report(out)["ok"] is False


# --- block-solve traces (VERDICT r4 weak #4 / next #7) ----------------------


def _spd_stack(n=64, nrhs=3):
    import numpy as np

    rng = np.random.default_rng(2)
    C = rng.standard_normal((n, n))
    A = C @ C.T / n + 4.0 * np.eye(n)
    B = rng.standard_normal((nrhs, n))
    return A, B


def test_block_cg_records_per_system_traces():
    import numpy as np

    import liblcg_tpu as lcg

    A, B = _spd_stack()
    op = lcg.DenseOperator(A)
    p = lcg.SolverParams(epsilon=1e-12)
    r = lcg.solve_batched(op, B, method="block_cg", params=p, trace_len=8)
    tr = np.asarray(r.trace)
    assert tr.shape == (3, 8)
    # every system's early residuals are recorded and decreasing overall
    assert np.all(tr[:, 1] > 0)
    assert np.all(tr[:, 4] < tr[:, 1])
    # the vmapped batched path records the same metric; the t=0 entry
    # (initial residual, before any step) must agree exactly — later
    # entries legitimately diverge (shared vs independent Krylov spaces)
    r2 = lcg.solve_batched(op, B, method="cg", params=p, trace_len=8)
    np.testing.assert_allclose(tr[:, 0], np.asarray(r2.trace)[:, 0],
                               rtol=1e-6)


def test_block_cg_traces_sharded():
    import numpy as np

    import liblcg_tpu as lcg

    n = 64
    rng = np.random.default_rng(3)
    main = 4.0 + rng.uniform(0, 1, n)
    off = rng.uniform(-0.5, 0.5, n - 1)
    rows = np.concatenate([np.arange(n), np.arange(n - 1), np.arange(1, n)])
    cols = np.concatenate([np.arange(n), np.arange(1, n), np.arange(n - 1)])
    vals = np.concatenate([main, off, off])
    A8 = lcg.ShardedSparseOperator(n, rows, cols, vals, n_devices=8)
    B = np.stack([np.ones(n), 2.0 * np.ones(n), np.arange(n) * 0.1])
    r = lcg.solve_sharded(A8, B, method="block_cg",
                          params=lcg.SolverParams(epsilon=1e-12),
                          trace_len=6)
    tr = np.asarray(r.trace)
    assert tr.shape == (3, 6) and np.all(tr[:, 1] > 0)
