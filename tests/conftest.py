"""Test harness config: run all tests on a virtual 8-device CPU mesh.

The driver environment pins JAX_PLATFORMS=axon (remote TPU tunnel); tests
must override it — unit tests on the tunnel pay a remote compile round trip
per jit. Env vars must be set before jax is imported anywhere.
"""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_threefry_partitionable", True)
# Persistent compilation cache: the suite is compile-bound; repeated runs
# (and unchanged modules within a run) hit the disk cache instead.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(__file__), os.pardir, ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
try:  # JAX >= 0.4.34 spelling; harmless if both work.
    jax.config.update("jax_num_cpu_devices", 8)
except Exception:  # pragma: no cover
    pass
