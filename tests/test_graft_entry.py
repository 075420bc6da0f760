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

    # Exercises the hermetic subprocess path (ACX_DRYRUN_INNER unset here),
    # which re-execs the inner body under a scrubbed JAX_PLATFORMS=cpu env.
    g.dryrun_multichip(8)  # raises on any non-finite loss


def test_scrubbed_cpu_env_isolation(monkeypatch):
    """The child env must pin CPU and drop remote-PJRT plugin paths so a
    broken default (TPU) backend in the driver process can never leak in
    (MULTICHIP_r01/r02 both failed on exactly this)."""
    import __graft_entry__ as g

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv(
        "PYTHONPATH", "/root/.axon_site:/some/other/dir"
    )
    monkeypatch.setenv(
        "XLA_FLAGS", "--xla_force_host_platform_device_count=2 --foo=bar"
    )
    env = g._scrubbed_cpu_env(8)
    assert env["JAX_PLATFORMS"] == "cpu"
    assert env["ACX_DRYRUN_INNER"] == "1"
    assert "--xla_force_host_platform_device_count=8" in env["XLA_FLAGS"]
    assert "--foo=bar" in env["XLA_FLAGS"]
    parts = env["PYTHONPATH"].split(os.pathsep)
    assert not any(".axon_site" in p for p in parts)
    assert "/some/other/dir" in parts
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assert repo in parts
