"""CI guard for the driver entry points.

Round-2 lesson (VERDICT.md round 2, Missing #1): a feature landed in
``__graft_entry__.dryrun_multichip`` without the entry being re-run, so the
driver artifact went red while the component suite stayed green.  This test
runs the actual driver entry on the 8-virtual-device CPU mesh so the entry
can never rot unnoticed again.
"""

import os
import sys

import jax

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_dryrun_multichip_8_devices(capsys):
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
    out = capsys.readouterr().out
    assert "dryrun_multichip OK" in out


def test_entry_compiles_single_device():
    """entry() must return (fn, example_args) that jit-compiles and runs."""
    import __graft_entry__ as ge

    fn, args = ge.entry()
    lowered = jax.jit(fn).lower(*args)
    compiled = lowered.compile()
    rows, valid, count = compiled(*args)
    assert rows.shape[0] == 1000
    assert valid.dtype == jax.numpy.bool_
    assert int(count) >= 0
