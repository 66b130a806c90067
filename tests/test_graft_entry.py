"""Driver-contract regression tests for __graft_entry__."""

import sys

import jax
import pytest

sys.path.insert(0, "/root/repo")


def test_entry_shapes():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == (4, 64, 64, 3)


def test_dryrun_multichip_small():
    import __graft_entry__ as g
    g.dryrun_multichip(2)
