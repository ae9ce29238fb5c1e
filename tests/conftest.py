# Force true CPU execution for the test suite. The launch environment injects an 'axon'
# PJRT plugin (tunneled TPU) via /root/.axon_site and presets JAX_PLATFORMS=axon;
# environment variables set here are overridden by that site hook, so the jax.config API
# is the only reliable switch. Without this the suite silently runs through the TPU
# tunnel with remote compilation (minutes per jit).
import os

# XLA:CPU executable serialization segfaults intermittently in this jaxlib (crash inside
# LoadedExecutable.serialize() during a cache write), so the persistent compilation cache
# must stay OFF for the CPU test suite. It remains on for TPU runs (bench/driver).
os.environ.setdefault("BEPUPHYSICS2_TPU_NO_CACHE", "1")

# The CI box exposes ONE cpu core; at the default backend optimization level a single
# full-step compile takes 10+ minutes there (LLVM time, not tracing). Level 1 compiles
# the same program ~5x faster and the suite only checks correctness, not CPU speed.
# (Level 0 compiles another ~35% faster but slows EXECUTION of the interpret-mode
# Pallas equivalence tests past their former wall time — measured net loss.)
# (Must be set before jax/xla initializes — appended, not overwritten.)
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_backend_optimization_level=1"
).strip()

# Make Simulation.run() default to python-loop stepping: tests then only compile the
# single-step program per scene (~10-20s each on CPU) instead of also paying the much
# larger step_n scan compile (~60-90s). test_simulation covers the scan path explicitly.
os.environ.setdefault("BEPUPHYSICS2_TPU_RUN_CHUNK", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)


# The suite leaks compiled executables across ~100 jit-heavy tests; combined with an
# intermittent XLA:CPU crash in executable finalization this can segfault mid-suite
# (observed twice at the same big-scan test). Dropping every jit cache between modules
# keeps the live-executable set small and has not reproduced since.
import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    yield
    jax.clear_caches()
