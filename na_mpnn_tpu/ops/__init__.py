"""Pallas TPU kernels for the NA-MPNN hot path.

``INTERPRET`` is a process-wide switch that runs every kernel in Pallas
interpret mode (pure XLA emulation) — used by the CPU test suite to exercise
the exact kernel code paths without TPU hardware. Set it before the first
trace of a jitted function that uses the kernels.
"""

INTERPRET = False


def interpret_mode() -> bool:
    return INTERPRET
