"""Driver entry points must stay green: single-chip compile check and the
full five-step multi-chip dry run (the external correctness gate)."""

import os
import sys

import numpy as np
import pytest

import jax


sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_entry_compiles_and_runs():
    import __graft_entry__ as g

    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert out.shape[0] == 1 and np.isfinite(np.asarray(out)).all()


def test_dryrun_multichip():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    import __graft_entry__ as g

    g.dryrun_multichip(8)  # raises on any non-finite loss
