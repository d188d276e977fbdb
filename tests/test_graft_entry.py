"""The driver contract: entry() compiles single-chip; dryrun_multichip
executes on a virtual 8-device mesh."""

import jax


def test_entry_compiles_and_runs():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (64 * 64, 3)
    assert bool(jax.numpy.isfinite(out).all())


def test_dryrun_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
