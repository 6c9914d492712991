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
