"""Driver contract tests: entry() compiles, dryrun_multichip executes."""

import jax

import __graft_entry__ as ge


def test_entry_compiles_single_device():
    fn, args = ge.entry()
    out = jax.eval_shape(fn, *args)
    assert tuple(out.shape) == (4, 4716)
    # compile (no execution — flagship dims are slow to run on 1 CPU core)
    jax.jit(fn).lower(*args).compile()


def test_dryrun_multichip_8():
    ge.dryrun_multichip(8)


def test_dryrun_multichip_odd():
    # odd device counts fall back to pure DP
    ge.dryrun_multichip(1)
