"""Test configuration: force JAX onto CPU with 8 virtual devices so sharding
tests exercise a real multi-device mesh without TPU hardware. Must run before
any jax import."""
import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()
