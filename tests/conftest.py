"""Test harness: run everything on a virtual 8-device CPU mesh so sharding
tests work without TPU hardware (the driver separately dry-runs multichip)."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"  # force: global env sets 'axon'
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in flags:
    # compile time dominates the suite on this 1-core box; opt level 0
    # halves it (sharded train-step test: 118 s -> 55 s, numerics unchanged
    # within test tolerances)
    flags = (flags + " --xla_backend_optimization_level=0").strip()
os.environ["XLA_FLAGS"] = flags
os.environ.setdefault("JAX_ENABLE_X64", "0")

# jax may be pre-imported at interpreter startup (sitecustomize) with the
# default 'axon' TPU platform baked into jax.config from the env at import
# time — in that case the os.environ writes above come too late. Override
# through jax.config directly (safe: the backend is not yet initialized at
# conftest collection time, so the CPU platform + virtual device count take
# effect).
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Persistent XLA compilation cache for the CPU test programs: the UNet
# train-step compiles cost 300-900 s EACH on a 1-core box (XLA:CPU prints
# its own "Very slow compile?" warning); with the cache, repeat runs of the
# full/slow tier skip them entirely. First run on a fresh host still pays.
jax.config.update("jax_compilation_cache_dir",
                  os.path.expanduser("~/.cache/jax_comp_cache_cpu_tests"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


# Build the native library if missing (a few seconds; native tests skip
# gracefully if the toolchain is unavailable).
def _ensure_native():
    import subprocess
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    so = os.path.join(root, "native", "libipdm_native.so")
    if os.path.exists(so):
        return
    try:
        subprocess.run(["make", "-C", os.path.join(root, "native")],
                       check=True, capture_output=True, timeout=120)
    except Exception:
        pass


_ensure_native()
