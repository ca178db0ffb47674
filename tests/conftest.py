import os

# Tests always run on a virtual 8-device CPU mesh so multi-chip sharding paths are
# exercised without TPU hardware (SURVEY.md §4 implication).  The ambient
# environment registers an 'axon' TPU-tunnel backend via sitecustomize and forces
# jax_platforms to it, so an env-var override is not enough: set the config knob
# directly before any backend initializes.  bench.py is the only entry point that
# touches real hardware.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
# persistent compile cache: XLA CPU programs here are large (8-level extractors,
# 15-iteration BA) and identical across test runs
jax.config.update("jax_compilation_cache_dir", "/tmp/fbev_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
