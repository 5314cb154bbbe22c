"""Test configuration: force JAX onto a virtual 8-device CPU mesh so sharding
tests run without TPU hardware and numerics run in double precision.

Note: this environment's sitecustomize registers an 'axon' TPU backend and
calls jax.config.update("jax_platforms", "axon,cpu") at interpreter start, so
setting the env var alone is NOT enough — we must override the config value
again here, before any JAX computation initializes the backends."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("PYACEQD_TPU_PRECISION", "double")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: protocol-scale cross-method gates (minutes on CPU)")
