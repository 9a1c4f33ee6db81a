"""Logical gate-count / depth reporting (C10 parity).

The reference transpiles every circuit and dumps gate-count CSVs
(autocorr-delta-a-single-qiskit-fast.py:193-197). Since we apply logical
gates directly, counts are computed in closed form for the Aer-equivalent
basis {u3, u2, rz, cx, measure} — validated against the shipped artifacts:

  L=4, t=1, forward:  u3=4 (kicks) rz=7 (3 rzz + 4 rz) cx=8 (2 cz + 2*3 rzz)
                      u2=6 (H + two CZ->h-cx-h decompositions) measure=1
  L=4, t=1, echo:     u3=8 rz=14 cx=14 u2=6
  (autocorr_data_L4/gate_counts_t1_{forward,echo}_*.csv)
  L=20+anc, t=29, forward, 2-slot kick: u3=1160=2*20*29, rz=1131=29*(19+20),
  cx=1104=2+2*19*29 (autocorr_data_L20_circular-polarization/...t29...csv)
"""

from __future__ import annotations

from dtc_tpu.io import csvio
from dtc_tpu.models.drives import n_kick_slots


def gate_counts(L: int, t: int, *, echo: bool = False, polarization: str = "x",
                interferometric: bool = True) -> dict:
    """Aer-basis gate counts for the circuit at time t."""
    slots = n_kick_slots(polarization)
    cycles = 2 * t if echo else t
    counts = {
        "u3": slots * L * cycles,
        "rz": cycles * ((L - 1) + L),          # rzz angles + disorder rz
        "cx": 2 * (L - 1) * cycles,            # rzz decompositions
    }
    if interferometric:
        counts["u2"] = 6                        # H + 2x (CZ -> h cx h)
        counts["cx"] += 2                       # the CZs' cx cores
        counts["measure"] = 1
    return {k: v for k, v in counts.items() if v}


def circuit_depth(L: int, t: int, *, echo: bool = False,
                  polarization: str = "x", interferometric: bool = True) -> int:
    """Logical depth: per cycle = K kick layers + 2 RZZ layers + 1 RZ layer."""
    slots = n_kick_slots(polarization)
    per_cycle = slots + 3
    cycles = 2 * t if echo else t
    d = per_cycle * cycles
    if interferometric:
        d += 6  # h, (h cx h), ... boundary layers
    return d


def noisy_1q_gate_events(L: int, t: int, *, echo: bool = False,
                         polarization: str = "x",
                         interferometric: bool = True) -> int:
    """Number of depolarizing events Aer fires (errors attach to u1/u2/u3):
    the quantity that fixes total noise strength (SURVEY.md §7 'hard parts')."""
    c = gate_counts(L, t, echo=echo, polarization=polarization,
                    interferometric=interferometric)
    return c.get("u3", 0) + c.get("u2", 0) + c.get("u1", 0)


def write_gate_count_csv(path: str, L: int, t: int, **kw):
    """gate,count CSV in the reference artifact format."""
    c = gate_counts(L, t, **kw)
    csvio.write_columns(path, {"gate": list(c), "count": list(c.values())})
    return path
