"""Driver contract: entry() compiles; dryrun_multichip runs on 8 virtual devices."""

import sys

import pytest

sys.path.insert(0, "/root/repo")


def test_entry_compiles():
    import jax

    import __graft_entry__ as g

    fn, (variables, batch) = g.entry()
    out = jax.jit(fn)(variables, batch)
    assert set(out) == {"phys", "verb"}
    assert out["verb"].shape == (4, 2)


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__ as g

    g.dryrun_multichip(8)
