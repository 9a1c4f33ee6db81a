"""Experiment drivers: end-to-end sweeps, CSV schema parity, shot noise."""

import os

import numpy as np
import pytest

from dtc_tpu.experiments.autocorr import (
    run_autocorr,
    run_polarization_comparison,
    run_shots_study,
)
from dtc_tpu.experiments.energy import run_energy, run_ham_comparison, run_per_qubit_z
from dtc_tpu.io import csvio
from dtc_tpu.io.disorder import generate_disorder, load_disorder, save_disorder
from dtc_tpu.utils.config import SimConfig

import exact_oracle as oracle

CFG = SimConfig(L=4, g=0.84, inst=2, tf=6, noise_prob=0.05, use_noise=1,
                n_trajectories=64, seed=3, dtype="complex128")


def test_autocorr_noiseless_matches_oracle(tmp_path):
    cfg = CFG.replace(use_noise=0, inst=1)
    hs, phis = generate_disorder(cfg.L, cfg.inst, seed=5)
    r = run_autocorr(cfg, hs, phis, out_dir=str(tmp_path))
    for t in range(cfg.tf):
        want = oracle.autocorr_dm(cfg.L, cfg.g, hs[0], phis[0], t, 0.0)
        np.testing.assert_allclose(r["av_autocorr"][t], want, atol=1e-10)
    np.testing.assert_allclose(r["av_autocorr_echo"], 1.0, atol=1e-12)
    # CSV schema contract
    cols = csvio.read_columns(r["csv_path"])
    assert list(cols) == ["time", "av_autocorr", "av_autocorr_echo",
                          "sqrt_av_autocorr_echo"]
    np.testing.assert_allclose(cols["av_autocorr"], r["av_autocorr"], atol=1e-15)


def test_autocorr_noisy_t0_is_ancilla_factor(tmp_path):
    # A(0) must equal (1-p)^6 exactly (only the 6 ancilla u2 events fire;
    # reference shows 0.734 ~ 0.95^6 at p=0.05)
    cfg = CFG.replace(inst=1, n_trajectories=8)
    r = run_autocorr(cfg, *generate_disorder(cfg.L, 1, seed=6), out_dir=str(tmp_path))
    np.testing.assert_allclose(r["av_autocorr"][0], 0.95**6, atol=1e-9)
    np.testing.assert_allclose(r["av_autocorr_echo"][0], 0.95**6, atol=1e-9)


def test_autocorr_noisy_matches_oracle_statistically(tmp_path):
    cfg = SimConfig(L=3, g=0.9, inst=1, tf=4, noise_prob=0.1, use_noise=1,
                    n_trajectories=4000, seed=3, dtype="complex128")
    hs, phis = generate_disorder(cfg.L, 1, seed=8)
    r = run_autocorr(cfg, hs, phis, out_dir=str(tmp_path))
    for t in range(cfg.tf):
        want_f = oracle.autocorr_dm(cfg.L, cfg.g, hs[0], phis[0], t, cfg.noise_prob)
        want_e = oracle.autocorr_dm(cfg.L, cfg.g, hs[0], phis[0], t, cfg.noise_prob,
                                    echo=True)
        assert abs(r["av_autocorr"][t] - want_f) < 0.05
        assert abs(r["av_autocorr_echo"][t] - want_e) < 0.05


def test_polarization_comparison_schema(tmp_path):
    cfg = CFG.replace(use_noise=0, inst=1, tf=4)
    r = run_polarization_comparison(cfg, polarizations=("x", "y"),
                                    out_dir=str(tmp_path))
    cols = csvio.read_columns(r["csv_path"])
    for pol in ("x", "y"):
        for c in (f"av_autocorr_{pol}", f"av_autocorr_echo_{pol}",
                  f"sqrt_av_autocorr_echo_{pol}", f"forward_upper_env_{pol}",
                  f"echo_lower_env_{pol}"):
            assert c in cols, c


def test_shots_study_variance_shrinks(tmp_path):
    cfg = CFG.replace(inst=1, tf=5, n_trajectories=32)
    r = run_shots_study(cfg, shots_list=(100, 100_000), out_dir=str(tmp_path))
    lo = r["av_autocorr_echo_shots100"]
    hi = r["av_autocorr_echo_shots100000"]
    exact_echo_scale = 0.95**6
    # high-shot curve should be much closer to the analytic trajectory mean
    assert np.abs(hi[0] - lo[0]) < 0.2
    assert abs(hi[0] - exact_echo_scale) < 0.05


def test_energy_noiseless_matches_oracle(tmp_path):
    cfg = SimConfig(L=3, g=0.9, inst=1, tf=4, use_noise=0, dtype="complex128")
    hs, phis = generate_disorder(cfg.L, 1, seed=9)
    r = run_energy(cfg, hs, phis, nprobs=(0.0,), out_dir=str(tmp_path))
    for t in range(cfg.tf):
        want = oracle.energy_dm(cfg.L, cfg.g, hs[0], phis[0], t, 0.0) / cfg.L
        np.testing.assert_allclose(r["energy_p_0"][t], want, atol=1e-10)


def test_energy_noisy_trajectories_vs_oracle(tmp_path):
    cfg = SimConfig(L=3, g=0.9, inst=1, tf=4, noise_prob=0.1, use_noise=1,
                    n_trajectories=3000, seed=4, dtype="complex128")
    hs, phis = generate_disorder(cfg.L, 1, seed=10)
    r = run_energy(cfg, hs, phis, nprobs=(0.1,), out_dir=str(tmp_path))
    for t in range(cfg.tf):
        want = oracle.energy_dm(cfg.L, cfg.g, hs[0], phis[0], t, 0.1) / cfg.L
        assert abs(r["energy_p_0.1"][t] - want) < 0.08, (t, r["energy_p_0.1"][t], want)


def test_ham_comparison_components_sum(tmp_path):
    # <H_full> = <H_z_zz> + <H_x_only> (linearity), noiseless
    cfg = SimConfig(L=3, g=0.9, inst=1, tf=4, use_noise=0, dtype="complex128")
    hs, phis = generate_disorder(cfg.L, 1, seed=11)
    r = run_ham_comparison(cfg, hs, phis, nprob=0.0, out_dir=str(tmp_path))
    np.testing.assert_allclose(
        r["energy_full"], np.asarray(r["energy_z_zz"]) + np.asarray(r["energy_x_only"]),
        atol=1e-10,
    )
    np.testing.assert_allclose(
        r["energy_z_zz"], np.asarray(r["energy_z_only"]) + np.asarray(r["energy_zz_only"]),
        atol=1e-10,
    )


def test_per_qubit_z_schema(tmp_path):
    cfg = SimConfig(L=4, g=0.84, inst=1, tf=3, use_noise=0, dtype="complex128")
    r = run_per_qubit_z(cfg, *generate_disorder(4, 1, seed=12), out_dir=str(tmp_path))
    assert all(f"z_q{q}" in r for q in range(4))
    # t=0 vacuum: all <Z_i> = 1
    for q in range(4):
        np.testing.assert_allclose(r[f"z_q{q}"][0], 1.0, atol=1e-12)


def test_disorder_roundtrip(tmp_path):
    hs, phis = generate_disorder(5, 3, seed=1)
    hp, pp = str(tmp_path / "hs.csv"), str(tmp_path / "phis.csv")
    save_disorder(hs, phis, hp, pp)
    h2, p2 = load_disorder(hp, pp, 5, 3)
    np.testing.assert_allclose(h2, hs, atol=0)
    np.testing.assert_allclose(p2, phis, atol=0)


def test_disorder_distributions():
    hs, phis = generate_disorder(6, 500, phi_amplitude=1.0, phi_delta=0.0, seed=2)
    assert hs.min() >= -np.pi and hs.max() <= np.pi
    assert phis.min() >= -1.5 * np.pi and phis.max() <= -0.5 * np.pi
    hs2, phis2 = generate_disorder(6, 2, randomphi=0, seed=2)
    np.testing.assert_allclose(phis2, -0.4)


def test_xy_cycle_comparison(tmp_path):
    from dtc_tpu.experiments.autocorr import run_xy_cycle_comparison

    cfg = SimConfig(L=4, tf=12, use_noise=0, inst=1, dtype="complex128",
                    xy_cycle_period=5)
    r = run_xy_cycle_comparison(cfg, out_dir=str(tmp_path))
    import os
    assert os.path.exists(r["csv_path"]) and os.path.exists(r["png_path"])
    # pure-x and xy-cycle agree for t <= 5 (identical schedule up to period)
    hs, phis = generate_disorder(cfg.L, 1, seed=cfg.seed)
    np.testing.assert_allclose(r["av_autocorr_x"][:5],
                               r["av_autocorr_xy_cycle"][:5], atol=1e-9)
    # and differ afterwards (Y cycles kick in)
    assert np.abs(np.asarray(r["av_autocorr_x"][6:])
                  - np.asarray(r["av_autocorr_xy_cycle"][6:])).max() > 1e-3


def test_estimator_shot_noise(tmp_path):
    """BackendEstimatorV2 precision emulation: gaussian sigma=1/sqrt(shots)
    per (instance, t) energy estimate, deterministic under a fixed seed
    (autocorr-delta-a-single-ibm-energy.py:228-231)."""
    from dtc_tpu.experiments.energy import apply_estimator_noise

    vals = np.zeros((4, 2000))
    noisy = apply_estimator_noise(vals, 1024, seed=1)
    sd = noisy.std()
    assert abs(sd - 1 / np.sqrt(1024)) < 0.1 / np.sqrt(1024)
    # shots=0 = exact passthrough; same seed = same draw
    assert apply_estimator_noise(vals, 0, seed=1) is vals
    np.testing.assert_array_equal(noisy, apply_estimator_noise(vals, 1024, seed=1))

    cfg = CFG.replace(use_noise=0, inst=1, estimator_shots=1024)
    hs, phis = generate_disorder(cfg.L, cfg.inst, seed=5)
    r_noisy = run_energy(cfg, hs, phis, nprobs=(0.0,), out_dir=str(tmp_path))
    r_exact = run_energy(cfg.replace(estimator_shots=0), hs, phis,
                         nprobs=(0.0,), out_dir=str(tmp_path))
    d = np.asarray(r_noisy["energy_p_0"]) - np.asarray(r_exact["energy_p_0"])
    assert 0 < np.max(np.abs(d)) < 6 / np.sqrt(1024) / cfg.L + 1e-12


def test_min_energy_analysis():
    from dtc_tpu.analysis.fits import min_energy_analysis

    t = np.arange(10, dtype=float)
    rep = min_energy_analysis(
        {"a": (t, -(10 - t) ** 0.5), "b": (t, t - 20.0)}, L=4)
    assert rep["per_source"]["b"]["t_min"] == 0.0
    assert rep["overall_min_source"] == "b"
    assert rep["overall_min"] == -20.0
    assert rep["overall_min_per_qubit"] == -5.0
