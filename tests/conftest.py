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
# NOTE: the persistent compile cache is deliberately NOT enabled for CPU test
# runs.  On this host, re-LOADING XLA:CPU AOT executables from the cache
# segfaults inside compilation_cache.get_executable_and_time (the loader warns
# "+prefer-no-scatter ... not supported on the host machine ... could lead to
# execution errors such as SIGILL" and then delivers exactly that) — observed
# three times in round 3, including with a cache written by THIS machine in the
# same session.  TPU executables (bench.py via the axon backend) are unaffected
# and keep their cache.
