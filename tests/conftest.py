import os

# Force CPU with 8 virtual devices so sharding tests exercise a real mesh
# without TPU hardware, and enable x64 for numerical-parity tolerances.
#
# Note: this environment's sitecustomize registers an "axon" TPU-tunnel PJRT
# plugin and force-sets jax.config jax_platforms="axon,cpu" (overriding the
# JAX_PLATFORMS env var), so we must undo it through jax.config as well.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

assert jax.default_backend() == "cpu", jax.default_backend()

# Persistent XLA compilation cache: the suite is compile-bound (every
# (problem-shape x options) pair is one XLA program), so repeated runs and
# re-runs after edits skip unchanged compiles entirely.
import tempfile
from pathlib import Path

# CDDP_TPU_XLA_CACHE_DIR overrides the location (e.g. to measure a cold
# run against a fresh directory without discarding the warm cache).
#
# The cache key is suffixed with a host-CPU-feature fingerprint: XLA:CPU
# stores AOT-compiled machine code whose cache key does NOT include the
# host ISA, so a cache written on one machine and read on another (VM
# migration between runs) loads executables built for missing CPU features
# — observed here as a hard SIGSEGV inside
# compilation_cache.get_executable_and_time during the fast tier.
import hashlib


def _host_cpu_fingerprint() -> str:
    try:
        with open("/proc/cpuinfo") as f:
            for line in f:
                if line.startswith("flags"):
                    feats = " ".join(sorted(line.split(":", 1)[1].split()))
                    return hashlib.sha256(feats.encode()).hexdigest()[:12]
    except OSError:
        pass
    import platform

    return hashlib.sha256(platform.processor().encode()).hexdigest()[:12]


_cache = Path(
    os.environ.get(
        "CDDP_TPU_XLA_CACHE_DIR",
        str(
            Path(tempfile.gettempdir())
            / f"cddp_tpu_xla_cache-{_host_cpu_fingerprint()}"
        ),
    )
)
_cache.mkdir(parents=True, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
