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

# Make Simulation.run() default to python-loop stepping: tests then only compile the
# single-step program per scene (~10-20s each on CPU) instead of also paying the much
# larger step_n scan compile (~60-90s). test_simulation covers the scan path explicitly.
os.environ.setdefault("BEPUPHYSICS2_TPU_RUN_CHUNK", "0")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)
