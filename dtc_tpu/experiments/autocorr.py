"""Autocorrelation sweep experiment.

Capability parity with autocorr-delta-a-single-qiskit-fast.py (canonical
driver, SURVEY.md §3.1) and the polarization variants: forward + echo
interferometric autocorrelator averaged over disorder instances, CSV schema
`time, av_autocorr, av_autocorr_echo, sqrt_av_autocorr_echo` (+6 envelope
columns when requested).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from dtc_tpu.analysis.envelope import find_envelope
from dtc_tpu.experiments.engine import (
    apply_shot_noise,
    build_context,
    echo_sweep,
    forward_sweep,
)
from dtc_tpu.io import csvio, naming
from dtc_tpu.io.disorder import get_disorder
from dtc_tpu.utils.profiling import phase_timer


def _raw_sqrt(x):
    """np.sqrt without clamping: the reference's base autocorr schema
    writes np.sqrt(av_autocorr_echo) directly (fast.py:263), so a
    negative trajectory-averaged echo records NaN in the contract column
    — clamping to 0 would silently diverge from the shipped CSVs at
    every late-time dip below zero. (The adaptive schemas use sqrt(|x|)
    instead — experiments/adaptive.py.)"""
    with np.errstate(invalid="ignore"):
        return np.sqrt(np.asarray(x, dtype=float))


def run_autocorr(cfg, hs=None, phis=None, *, out_dir=None, disorder_dir=None,
                 with_envelopes: bool = False, write=True,
                 method: str = "trajectories", emit_gate_counts=False) -> dict:
    """Run the forward + echo sweep; returns result dict and writes CSV.

    method: "trajectories" (Pauli-twirl ensemble, any L) or "exact" (exact
    density-matrix superoperator evolution, L <= ~13 — BASELINE config 1's
    density-matrix mode).
    """
    if hs is None or phis is None:
        hs, phis = get_disorder(cfg, disorder_dir)
    sched, params, noise = build_context(cfg, hs, phis)
    key = jax.random.PRNGKey(cfg.seed)

    if method == "exact":
        from dtc_tpu.core.density import dm_autocorr_echo_run, dm_autocorr_forward_run
        import jax.numpy as jnp

        hs_j, phis_j = params
        kw = dict(L=cfg.L, T=cfg.tf, K=sched.K, p=noise.p, q=cfg.probe_qubit,
                  initial_state=cfg.initial_state, dtype_name=cfg.dtype,
                  ancilla_factor=noise.ancilla_factor if noise.p > 0 else 1.0)
        autocorr = np.stack([
            np.asarray(dm_autocorr_forward_run(hs_j[i], phis_j[i],
                                               sched.angles, **kw))
            for i in range(cfg.inst)])
        if noise.p > 0:
            ts = jnp.arange(cfg.tf)
            echo = np.stack([
                np.asarray(dm_autocorr_echo_run(hs_j[i], phis_j[i],
                                                sched.angles, ts, **kw))
                for i in range(cfg.inst)])
        else:
            echo = np.ones((cfg.inst, cfg.tf))
    elif cfg.use_fakebackend:
        from dtc_tpu.experiments.device_sweeps import (
            device_echo_sweep,
            device_forward_sweep,
        )

        with phase_timer("forward(device)"):
            autocorr = device_forward_sweep(cfg, sched, params, key)
        with phase_timer("echo(device)"):
            echo = device_echo_sweep(cfg, sched, params, key)
    else:
        with phase_timer("forward"):
            autocorr = forward_sweep(cfg, sched, params, noise, key)
        with phase_timer("echo"):
            echo = echo_sweep(cfg, sched, params, noise, key)

    if cfg.shots:
        autocorr = apply_shot_noise(autocorr, cfg.shots, cfg.seed)
        echo = apply_shot_noise(echo, cfg.shots, cfg.seed + 1)

    av = autocorr.mean(axis=0)
    av_echo = echo.mean(axis=0)
    ts = np.arange(cfg.tf)
    data = {
        "time": ts,
        "av_autocorr": av,
        "av_autocorr_echo": av_echo,
        "sqrt_av_autocorr_echo": _raw_sqrt(av_echo),
    }
    if with_envelopes:
        fu, fl = find_envelope(av)
        eu, el = find_envelope(av_echo)
        su, sl = find_envelope(data["sqrt_av_autocorr_echo"])
        data.update(
            forward_upper_env=fu, forward_lower_env=fl,
            echo_upper_env=eu, echo_lower_env=el,
            sqrt_echo_upper_env=su, sqrt_echo_lower_env=sl,
        )

    result = dict(data)
    result["autocorr_per_instance"] = autocorr
    result["echo_per_instance"] = echo

    if write:
        folder = out_dir or naming.autocorr_folder_name(cfg)
        pol = cfg.polarization if cfg.polarization != "x" else None
        path = os.path.join(
            folder, naming.autocorr_csv_name(cfg, pol=pol, with_envelopes=with_envelopes)
        )
        csvio.write_columns(path, data)
        result["csv_path"] = path
        if emit_gate_counts:
            # per-timepoint transpiled gate-count artifacts
            # (autocorr-delta-a-single-qiskit-fast.py:193-197)
            from dtc_tpu.device.transpile import write_gate_count_csv

            for t in range(cfg.tf):
                for echo_flag in (False, True):
                    write_gate_count_csv(
                        os.path.join(folder, naming.gate_count_csv_name(
                            t, echo_flag)), cfg.L, t, echo=echo_flag,
                        polarization=cfg.polarization)
    return result


def run_polarization_comparison(cfg, polarizations=("x", "y", "xy", "yx"), *,
                                out_dir=None, disorder_dir=None, write=True) -> dict:
    """Per-polarization sweeps + merged comparison CSV with envelopes
    (autocorr-delta-a-single-qiskit-fast-polarization.py:381-399)."""
    merged = {"time": np.arange(cfg.tf)}
    per_pol = {}
    for pol in polarizations:
        c = cfg.replace(polarization=pol)
        r = run_autocorr(c, out_dir=out_dir, disorder_dir=disorder_dir,
                         with_envelopes=True, write=write)
        per_pol[pol] = r
        merged[f"av_autocorr_{pol}"] = r["av_autocorr"]
        merged[f"av_autocorr_echo_{pol}"] = r["av_autocorr_echo"]
        merged[f"sqrt_av_autocorr_echo_{pol}"] = r["sqrt_av_autocorr_echo"]
        merged[f"forward_upper_env_{pol}"] = r["forward_upper_env"]
        merged[f"forward_lower_env_{pol}"] = r["forward_lower_env"]
        merged[f"echo_upper_env_{pol}"] = r["echo_upper_env"]
        merged[f"echo_lower_env_{pol}"] = r["echo_lower_env"]
        merged[f"sqrt_echo_upper_env_{pol}"] = r["sqrt_echo_upper_env"]
        merged[f"sqrt_echo_lower_env_{pol}"] = r["sqrt_echo_lower_env"]
    if write:
        folder = out_dir or f"autocorr_data_L{cfg.L}_polarization"
        path = os.path.join(folder, naming.autocorr_comparison_csv_name(cfg))
        csvio.write_columns(path, merged)
        merged["csv_path"] = path
    merged["per_polarization"] = per_pol
    return merged


def run_shots_study(cfg, shots_list=(100, 1000, 10_000, 100_000, 1_000_000), *,
                    out_dir=None, disorder_dir=None, write=True) -> dict:
    """Echo vs shot count (autocorr-delta-a-single-qiskit-fast-shots.py:48-49,256-315)."""
    if cfg.shots:
        cfg = cfg.replace(shots=0)
    hs, phis = get_disorder(cfg, disorder_dir)
    sched, params, noise = build_context(cfg, hs, phis)
    key = jax.random.PRNGKey(cfg.seed)
    echo = echo_sweep(cfg, sched, params, noise, key)
    data = {"time": np.arange(cfg.tf)}
    for s in shots_list:
        sampled = apply_shot_noise(echo, int(s), cfg.seed + int(s))
        data[f"av_autocorr_echo_shots{int(s)}"] = sampled.mean(axis=0)
    if write:
        folder = out_dir or f"autocorr_data_L{cfg.L}_shots"
        path = os.path.join(folder, naming.autocorr_csv_name(cfg).replace(
            "autocorr_data_", "autocorr_shots_"))
        csvio.write_columns(path, data)
        data["csv_path"] = path
    return data


def run_xy_cycle_comparison(cfg, *, out_dir=None, disorder_dir=None,
                            write=True, period=None) -> dict:
    """XY-alternating drive vs pure-X comparison
    (autocorr-delta-a-single-qiskit-fast-polarization-xy-cycle.py:141-155 +
    draw-xy-cycle-noise-comparison.py): same disorder, both schedules,
    merged CSV + plot with period gridlines."""
    period = period or cfg.xy_cycle_period
    hs, phis = get_disorder(cfg.replace(polarization="x"), disorder_dir)
    r_x = run_autocorr(cfg.replace(polarization="x"), hs, phis, write=False)
    r_xy = run_autocorr(cfg.replace(polarization="xy_cycle",
                                    xy_cycle_period=period),
                        hs, phis, write=False)
    data = {
        "time": np.arange(cfg.tf),
        "av_autocorr_x": r_x["av_autocorr"],
        "av_autocorr_echo_x": r_x["av_autocorr_echo"],
        "av_autocorr_xy_cycle": r_xy["av_autocorr"],
        "av_autocorr_echo_xy_cycle": r_xy["av_autocorr_echo"],
    }
    result = dict(data)
    if write:
        folder = out_dir or f"autocorr_data_L{cfg.L}_xy_cycle"
        path = os.path.join(folder, naming.autocorr_csv_name(cfg).replace(
            "autocorr_data_", "autocorr_xy_cycle_"))
        csvio.write_columns(path, data)
        result["csv_path"] = path
        from dtc_tpu.analysis.plots import plot_xy_cycle_comparison

        png = plot_xy_cycle_comparison(
            {"x": (data["time"], data["av_autocorr_x"]),
             "xy_cycle": (data["time"], data["av_autocorr_xy_cycle"])},
            path.replace(".csv", ".png"), period=period,
            title=f"XY-alternating (period {period}) vs pure-X, L={cfg.L}")
        result["png_path"] = png
    return result
