"""Driver entry-point contracts (__graft_entry__.py)."""

import sys
import os

import jax
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def test_entry_traces_to_scalar_loss():
    import __graft_entry__

    fn, args = __graft_entry__.entry()
    out = jax.eval_shape(fn, *args)
    assert out.shape == ()


@pytest.mark.slow
def test_dryrun_multichip_8():
    import __graft_entry__

    __graft_entry__.dryrun_multichip(8)  # asserts finite loss internally
