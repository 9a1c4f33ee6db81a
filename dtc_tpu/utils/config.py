"""One dataclass config covering the reference's shared CLI vocabulary.

The reference duplicates an argparse block across all 37 scripts
(--L --inst --randomphi --phi_delta --phi_amplitude --tf --g --noise_prob
--use_noise --initial_state --use_fakebackend,
autocorr-delta-a-single-qiskit-fast.py:25-39; adaptive extras at
autocorr-delta-a-single-qiskit-fast-g-optimization.py:104-111; polarization
extras at autocorr-delta-a-single-qiskit-fast-circular-polarization.py:42-43).
Here it is one frozen dataclass shared by every experiment driver.
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class SimConfig:
    # Chain / drive
    L: int = 4
    g: float = 0.97
    inst: int = 1
    randomphi: int = 1          # 0 = prethermal (phi=-0.4 fixed), 1 = DTC
    phi_delta: float = 0.0
    phi_amplitude: float = 1.0
    tf: int = 50
    initial_state: str = "vacuum"   # "vacuum" | "neel"
    polarization: str = "x"     # x|y|xy|yx|circular_left|circular_right|circular_static|xy_cycle
    circular_frequency: float = 0.5
    xy_cycle_period: int = 5    # kick axis flips every this many cycles ("xy_cycle")

    # Noise
    noise_prob: float = 0.05
    use_noise: int = 1
    use_fakebackend: int = 0    # device-noise import mode (FakeBrisbane analogue)
    fake_device: str = "brisbane"  # "brisbane" | "garnet" — which QPU's
                                # calibration shape use_fakebackend=1 mimics
                                # (reference switches by script variant:
                                # FakeBrisbane vs IQMFakeGarnet)
    calibration_path: Optional[str] = None  # real calibration snapshot
                                # (our schema or a Qiskit BackendProperties
                                # JSON) overriding the synthetic one
    n_trajectories: int = 256   # Pauli-twirl trajectories per instance
    shots: int = 0              # 0 = analytic expectation; >0 = Bernoulli shot sampling
    estimator_shots: int = 0    # 0 = exact estimator; >0 = gaussian sampling noise
                                # with sigma = 1/sqrt(shots) on each energy estimate
                                # (BackendEstimatorV2 precision=1/sqrt(1024) emulation,
                                # autocorr-delta-a-single-ibm-energy.py:228-231)
    seed: int = 0

    # Adaptive-g control (autocorr-delta-a-single-qiskit-fast-g-optimization.py:104-111)
    target_echo: float = 1.0
    feedback_gain: float = 0.01
    exponential_feedback: int = 1
    decay_compensation: float = 0.1
    g_min: float = 0.84
    g_max: float = 1.0
    use_optimization: int = 1
    optimization_iterations: int = 5

    # Engine
    ancilla_faithful: bool = False  # literal Hadamard-test ancilla (validation mode)
    dtype: str = "complex64"
    qubit: Optional[int] = None     # autocorrelator site; default L//2

    @property
    def probe_qubit(self) -> int:
        # Reference: qubit = int(L/2) in system labels 1..L -> 0-indexed L//2
        # (autocorr-delta-a-single-qiskit-fast.py:221).
        return self.L // 2 if self.qubit is None else self.qubit

    @property
    def T(self) -> int:
        return self.tf

    @property
    def noise_p(self) -> float:
        return self.noise_prob if self.use_noise else 0.0

    def replace(self, **kw) -> "SimConfig":
        return dataclasses.replace(self, **kw)
