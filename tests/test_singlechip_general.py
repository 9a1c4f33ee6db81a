"""Single-chip GENERAL-drive kernel delegation (engine._singlechip_general_*).

On TPU, non-x polarizations and per-cycle schedules at 24 <= L <= 29
route through the (1,1)-mesh degenerate run of the sharded general
cycle-kernel scan (no shard bits -> no collectives). These tests pin the
delegation wrappers trajectory-for-trajectory against the sigma-engine
sweeps (identical uniform draws via the shared _inst_keys salts) at the
interpret-feasible L=17 on the virtual CPU mesh; kernel-rate production
behavior is the TPU measurement in parity_results.json
(singlechip_general_l24). Reference behavior: the circular/Y-drive
studies of autocorr-delta-a-single-qiskit-fast-circular-polarization.py:
110-142 at large L.
"""

import jax
import numpy as np
import pytest

from dtc_tpu.experiments.engine import (
    _singlechip_general_echo,
    _singlechip_general_forward,
    build_context,
    echo_sweep,
    forward_sweep,
)
from dtc_tpu.io.disorder import generate_disorder
from dtc_tpu.utils.config import SimConfig


@pytest.fixture
def cfg():
    return SimConfig(L=17, tf=3, g=0.97, polarization="y",
                     n_trajectories=3, noise_prob=0.3)


def test_singlechip_general_forward_matches_sigma(cfg):
    hs, phis = generate_disorder(cfg.L, 1, seed=2)
    sched, params, noise = build_context(cfg, hs, phis)
    key = jax.random.PRNGKey(5)
    ref = forward_sweep(cfg, sched, params, noise, key)  # sigma on CPU
    got = _singlechip_general_forward(cfg, sched, params, noise, key,
                                      interpret=True)
    assert got.shape == ref.shape == (1, cfg.tf)
    assert abs(got[0, 0] - (1 - cfg.noise_p) ** 6) < 1e-5
    assert np.max(np.abs(got - ref)) < 1e-4, (got, ref)


@pytest.mark.slow
def test_singlechip_general_echo_matches_sigma(cfg):
    hs, phis = generate_disorder(cfg.L, 1, seed=2)
    sched, params, noise = build_context(cfg, hs, phis)
    key = jax.random.PRNGKey(5)
    ref = echo_sweep(cfg, sched, params, noise, key)
    got = _singlechip_general_echo(cfg, sched, params, noise, key,
                                   interpret=True)
    assert got.shape == ref.shape == (1, cfg.tf)
    assert np.max(np.abs(got - ref)) < 1e-4, (got, ref)
