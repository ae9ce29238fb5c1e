"""Pallas TPU kernels (the hand-scheduled compute path under the XLA engine).

- ``sweep``: the solver's velocity-iteration interior and the whole-solve mega kernel —
  VMEM-resident body state across every color slice / substep, exact bf16x3 one-hot MXU
  routing for constraint-row gathers/scatters (see ops/sweep.py for the full design).
"""
from . import sweep  # noqa: F401
