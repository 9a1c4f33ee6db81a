"""Aer-equivalent noise models.

The reference attaches qiskit-aer ``depolarizing_error(p, 1)`` to every
transpiled u1/u2/u3 gate (autocorr-delta-a-single-qiskit-fast.py:84-86). What
that means physically is fixed by the transpiled gate stream, verified against
the shipped gate-count CSVs (autocorr_data_L4/gate_counts_t1_forward_*.csv:
u3=4=L kicks, u2=6, rz=7, cx=8 at L=4, t=1):

- each kick rotation -> ONE u3 -> one depolarizing event on that qubit;
  two-slot kicks (xy/yx/circular) -> two events per qubit per cycle;
- RZ and RZZ layers transpile to rz/cx, which carry NO noise;
- the interferometric ancilla sees exactly 6 noisy u2 gates (H, CZ->h-cx-h on
  each side), and each of those events contracts the measured ancilla
  coherence by exactly (1-p): the backward image of the measured Z_a through
  the remaining circuit has a non-identity ancilla factor at all six event
  sites, so the net effect is an analytic (1-p)^6 prefactor on A(t)
  (empirically: reference av_autocorr(t=0) = 0.734 ~ 0.95^6 = 0.7351 at
  p=0.05, autocorr_data_L20_polarization/autocorr_data_*_polx_*.csv row 0).

Two execution modes:
- trajectories: sample one Pauli per (event, qubit) per trajectory
  (P(I)=1-3p/4, P(X/Y/Z)=p/4 each — qiskit's mixed-unitary decomposition) and
  apply the whole per-event layer as one Pauli string;
- exact: vectorized density-matrix evolution (dtc_tpu.core.density) applies
  the depolarizing superoperator after every noisy gate.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class NoiseSpec:
    """Depolarizing-on-1q-gates noise with Aer-faithful placement."""

    p: float = 0.0
    # Number of noisy ancilla u2 gates in the interferometric circuit
    # (H + CZ decomposition on each side). Analytic contraction factor in
    # direct (ancilla-free) mode = (1-p) ** ancilla_u2_events.
    ancilla_u2_events: int = 6

    @property
    def enabled(self) -> bool:
        return self.p > 0.0

    @property
    def ancilla_factor(self) -> float:
        return (1.0 - self.p) ** self.ancilla_u2_events

    def measurement_factor(self, pauli_weight_1q: int) -> float:
        """Contraction from noisy basis-rotation u2 gates before measurement.

        BackendEstimatorV2 measures X-basis terms by appending an H (noisy u2)
        per X factor (autocorr-delta-a-single-qiskit-fast-energy.py:168-172);
        each contracts that factor's expectation by (1-p)... applied only when
        estimator-faithful energies are requested.
        """
        return (1.0 - self.p) ** pauli_weight_1q
