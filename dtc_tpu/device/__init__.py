"""Device-facing utilities: gate-count/depth reports, QASM export, QPU
layouts, job-record decoding, device-noise import.

We simulate logical circuits directly (no transpiler needed for correctness
— SURVEY.md §2d), so this layer exists for parity with the reference's
hardware tooling: the gate-count CSV artifacts, the OpenQASM export path,
the hand-crafted snake layouts, and the IQM raw-job post-processing.
"""

from dtc_tpu.device.transpile import gate_counts, write_gate_count_csv  # noqa: F401
from dtc_tpu.device.qasm import circuit_to_qasm  # noqa: F401
