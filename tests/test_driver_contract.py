"""Regression guard for the driver entry points: entry() must stay
jittable single-chip and dryrun_multichip() must compile+run the full SPMD
solve stack on a virtual mesh."""

import sys
import os

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    x, status, t = out
    assert int(status) >= 0
    assert int(t) > 0


def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)


def test_dryrun_multichip_4():
    import __graft_entry__ as g

    g.dryrun_multichip(4)
