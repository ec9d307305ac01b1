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

_cache = Path(tempfile.gettempdir()) / "cddp_tpu_xla_cache"
_cache.mkdir(exist_ok=True)
jax.config.update("jax_compilation_cache_dir", str(_cache))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.1)
