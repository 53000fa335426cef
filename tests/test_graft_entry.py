"""Invocation-proofing tests for __graft_entry__.dryrun_multichip.

The driver runs ``dryrun_multichip(n)`` in contexts we do not control.
Rounds 1 and 2 both failed the same way: the guard trusted
``JAX_PLATFORMS=cpu`` while the axon sitecustomize (triggered by
``PALLAS_AXON_POOL_IPS``) had force-set ``jax_platforms="axon,cpu"``
via ``axon.register._install_jax_hooks``, so eager ops dispatched onto
the TPU relay and died on libtpu version skew.

These tests exercise the decision logic under each suspect context using
a FAKE axon sitecustomize that mimics the platform override without
dialing the real relay (dialing would serialize on the live TPU lease).
Each context must end with the dp-step and sp-forward success lines.
"""
import os
import subprocess
import sys
import textwrap

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_FAKE_SITECUSTOMIZE = textwrap.dedent(
    """
    # Mimics /root/.axon_site/sitecustomize.py: when PALLAS_AXON_POOL_IPS
    # is set, axon.register.register() force-sets jax_platforms="axon,cpu"
    # regardless of the JAX_PLATFORMS env var. We reproduce the override
    # (the part that broke rounds 1-2) without loading the PJRT plugin.
    import os

    if os.environ.get("PALLAS_AXON_POOL_IPS"):
        import jax

        jax.config.update("jax_platforms", "axon,cpu")
    """
)

_DRYRUN = "import __graft_entry__ as g; g.dryrun_multichip(4)"


def _scrubbed_env():
    env = os.environ.copy()
    # Start from a clean slate for the axon knobs; each test then layers
    # its own context on top.
    for var in (
        "JAX_PLATFORMS",
        "PALLAS_AXON_POOL_IPS",
        "PALLAS_AXON_REMOTE_COMPILE",
        "AXON_POOL_SVC_OVERRIDE",
        "AXON_LOOPBACK_RELAY",
        "_SE3_DRYRUN_CHILD",
    ):
        env.pop(var, None)
    env["PYTHONPATH"] = REPO
    env["XLA_FLAGS"] = ""
    return env


def _run(code, env, timeout=900):
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=timeout,
    )
    assert proc.returncode == 0, (
        f"rc={proc.returncode}\nstdout:\n{proc.stdout}\nstderr:\n{proc.stderr}"
    )
    assert "dp step ok" in proc.stdout, proc.stdout
    assert "sp forward ok" in proc.stdout, proc.stdout
    return proc


@pytest.fixture(scope="module")
def fake_axon_site(tmp_path_factory):
    d = tmp_path_factory.mktemp("fake_axon_site")
    (d / "sitecustomize.py").write_text(_FAKE_SITECUSTOMIZE)
    return str(d)


@pytest.mark.slow
def test_dryrun_ambient_axon_env(fake_axon_site):
    """Context 1: the ambient driver env — JAX_PLATFORMS=axon, relay knobs
    set, sitecustomize on PYTHONPATH. Must re-exec into a scrubbed child."""
    env = _scrubbed_env()
    env["JAX_PLATFORMS"] = "axon"
    env["PALLAS_AXON_POOL_IPS"] = "203.0.113.9"  # TEST-NET, never dialed
    env["PALLAS_AXON_REMOTE_COMPILE"] = "1"
    env["PYTHONPATH"] = os.pathsep.join([fake_axon_site, REPO])
    _run(_DRYRUN, env)


@pytest.mark.slow
def test_dryrun_cpu_env_with_axon_sitecustomize(fake_axon_site):
    """Context 2 (the recorded r01/r02 failure): JAX_PLATFORMS=cpu is set
    but PALLAS_AXON_POOL_IPS is also set, so the sitecustomize overrides
    the platform list. The env var must NOT be trusted; the run must go
    through the scrubbed subprocess."""
    env = _scrubbed_env()
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = "203.0.113.9"
    env["PYTHONPATH"] = os.pathsep.join([fake_axon_site, REPO])
    _run(_DRYRUN, env)


@pytest.mark.slow
def test_dryrun_preinitialized_parent():
    """Context 3: the parent process already initialized a jax backend with
    too few devices before calling dryrun_multichip. The fast path must
    detect the shortfall and fall through to the subprocess."""
    env = _scrubbed_env()
    env["JAX_PLATFORMS"] = "cpu"  # single CPU device, no force-host-count
    code = (
        "import jax; jax.devices(); "  # initialize backend first
        + _DRYRUN
    )
    _run(code, env)


def test_dryrun_decision_never_touches_jax_when_axon_live(fake_axon_site):
    """With the relay live, the parent's decision logic must not initialize
    any jax backend (initialization would dial the TPU lease). The fake
    sitecustomize makes any backend init raise (unknown platform 'axon'
    first in jax_platforms), so surviving to the subprocess decision
    proves no backend was touched in the parent."""
    env = _scrubbed_env()
    env["JAX_PLATFORMS"] = "cpu"
    env["PALLAS_AXON_POOL_IPS"] = "203.0.113.9"
    env["PYTHONPATH"] = os.pathsep.join([fake_axon_site, REPO])
    code = (
        "import __graft_entry__ as g, unittest.mock as m\n"
        "with m.patch.object(g, '_dryrun_subprocess') as sub:\n"
        "    g.dryrun_multichip(4)\n"
        "assert sub.call_count == 1, sub.call_count\n"
        "print('decision ok')\n"
    )
    proc = subprocess.run(
        [sys.executable, "-c", code],
        env=env,
        cwd=REPO,
        capture_output=True,
        text=True,
        timeout=120,
    )
    assert proc.returncode == 0, proc.stderr
    assert "decision ok" in proc.stdout
