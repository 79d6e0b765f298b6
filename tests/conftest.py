"""Test harness: force an 8-device virtual CPU mesh (SURVEY.md §4).

Multi-chip sharding logic is validated on virtual CPU devices exactly the
way the driver's ``dryrun_multichip`` does; the real chip is reserved for
bench.py.

NOTE: this image ships an 'axon' TPU plugin that programmatically overrides
the JAX_PLATFORMS environment variable at import time — the only reliable
way to force CPU is ``jax.config.update('jax_platforms', 'cpu')`` *after*
importing jax (but before any backend initialisation).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", False)
# Persistent compile cache: XLA:CPU compiles of the traversal while-loops are
# expensive on this host; cache them across test runs.
jax.config.update("jax_compilation_cache_dir", "/tmp/pbrt_tpu_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
