"""Test configuration: force an 8-device virtual CPU platform so sharding
tests exercise real SPMD partitioning without TPU hardware.

Note: this environment pre-imports jax via a sitecustomize hook with
JAX_PLATFORMS=axon (a tunneled TPU backend), so setting env vars here is
not enough — the platform must be overridden through jax.config before any
backend is initialized (backends initialize lazily at first use)."""

import os
import tempfile

os.environ["JAX_PLATFORMS"] = "cpu"
# isolate the autotune/guard measurement sidecar (utils/tunecache.py):
# tests must neither read hardware measurements from the committed
# .bench_autotune.json nor write CPU-backend records into it
os.environ.setdefault(
    "TUNE_SIDECAR_FILE",
    os.path.join(tempfile.mkdtemp(prefix="tunecache_"), "sidecar.json"),
)
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def pytest_sessionstart(session):
    n = jax.device_count()
    assert jax.devices()[0].platform == "cpu", jax.devices()
    assert n == 8, f"expected 8 virtual CPU devices, got {n}"
