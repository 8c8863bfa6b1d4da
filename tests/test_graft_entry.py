"""Driver entry-point tests: dryrun_multichip at several device counts."""

import sys

import pytest

sys.path.insert(0, "/root/repo")
import __graft_entry__ as graft  # noqa: E402


@pytest.mark.parametrize("n", [2, 4, 8])
def test_dryrun_multichip(n):
    graft.dryrun_multichip(n)


def test_entry_traces():
    import jax

    fn, args = graft.entry()
    # compile-check on CPU via eval_shape (no heavy execute)
    out = jax.eval_shape(fn, *args)
    assert out.shape[1:] == (256, 256, 3)
