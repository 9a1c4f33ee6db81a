"""Analysis layer: envelopes, fits, FFT diagnostics, plot rendering."""

import numpy as np

from dtc_tpu.analysis.envelope import find_envelope
from dtc_tpu.analysis.fft import dominant_frequency, subharmonic_weight
from dtc_tpu.analysis.fits import (
    fit_power_law,
    fit_sincos_decay,
    power_law,
    sincos_decay,
)


def test_envelope_bounds_signal():
    t = np.arange(50)
    y = np.cos(np.pi * t) * np.exp(-0.05 * t)
    up, lo = find_envelope(y)
    assert np.all(up >= y - 1e-9)
    assert np.all(lo <= y + 1e-9)
    # envelope should roughly track the decay
    assert up[0] > up[-1]


def test_sincos_fit_recovers_params():
    t = np.arange(60, dtype=float)
    true = dict(A=0.3, B=0.8, omega=np.pi, gamma=0.03, c=0.05)
    y = sincos_decay(t, true["A"], true["B"], true["omega"], true["gamma"], true["c"])
    rng = np.random.default_rng(0)
    y = y + rng.normal(0, 0.005, len(t))
    res = fit_sincos_decay(t, y)
    assert res.success and res.r_squared > 0.99
    # omega = pi -> f = 0.5: period doubling
    assert abs(res.params["frequency"] - 0.5) < 0.01
    assert abs(res.params["gamma"] - true["gamma"]) < 0.01


def test_sincos_fit_failure_recorded():
    res = fit_sincos_decay(np.arange(3.0), np.array([np.nan, np.nan, np.nan]))
    assert not res.success
    row = res.as_row(g=0.9)
    assert row["fit_success"] is False and row["g"] == 0.9


def test_power_law_fit():
    t = np.arange(1, 40, dtype=float)
    y = power_law(t, 2.0, -0.7, 0.3)
    res = fit_power_law(t, y)
    assert res.success
    assert abs(res.params["b"] + 0.7) < 1e-3


def test_fft_period_doubling_detection():
    t = np.arange(64)
    dtc = np.cos(np.pi * t)          # period-2 -> f = 0.5
    thermal = np.exp(-0.2 * t)       # no oscillation
    assert abs(dominant_frequency(dtc) - 0.5) < 0.02
    assert subharmonic_weight(dtc) > 0.9
    assert subharmonic_weight(thermal) < 0.2


def test_plots_render(tmp_path):
    from dtc_tpu.analysis import plots

    t = np.arange(30)
    cols = {
        "time": t,
        "av_autocorr": np.cos(np.pi * t) * np.exp(-0.05 * t),
        "av_autocorr_echo": np.exp(-0.08 * t),
        "sqrt_av_autocorr_echo": np.exp(-0.04 * t),
    }
    p1 = plots.plot_autocorr(cols, str(tmp_path / "a.png"))
    p2, res = plots.plot_sincos_fit(cols, str(tmp_path / "b.png"))
    p3 = plots.plot_fft_subharmonics(cols, str(tmp_path / "c.png"))
    p4 = plots.plot_with_envelopes(cols, str(tmp_path / "d.png"))
    r5 = plots.plot_energy_comparison(
        {"p=0": (t, -2 + 0.5 * np.log(t + 1)),
         "p=0.05": (t, -1.5 + 0.4 * np.log(t + 1))},
        str(tmp_path / "e.png"), with_power_law=True)
    p5 = r5["path"]
    # min-energy analysis (draw-energy-all.py:208-250): both traces are
    # increasing, so the minimum is at t=1 and p=0 is the overall minimum
    assert r5["min_energy"]["overall_min_source"] == "p=0"
    assert r5["min_energy"]["per_source"]["p=0"]["t_min"] == t[0]
    # per_qubit=True must NOT double-divide the min-energy report: the
    # report always carries RAW min_energy and min_energy_per_qubit = E/L
    r5pq = plots.plot_energy_comparison(
        {"p=0": (t, -2 + 0.5 * np.log(t + 1))},
        str(tmp_path / "e_pq.png"), per_qubit=True, L=4)
    row = r5pq["min_energy"]["per_source"]["p=0"]
    assert row["min_energy"] == -2.0
    assert row["min_energy_per_qubit"] == -0.5
    p6 = plots.plot_xy_cycle_comparison(
        {"xy_cycle": (t, np.cos(np.pi * t)), "x": (t, 0.9 * np.cos(np.pi * t))},
        str(tmp_path / "f.png"))
    p7 = plots.plot_energy_with_echo_inset(
        {"sim p=0.05": (t, -2 + 0.5 * np.log(t + 1))},
        {"torino": (t, np.exp(-0.1 * t)), "iqm": (t, np.exp(-0.15 * t))},
        str(tmp_path / "g.png"))
    import os
    for p in (p1, p2, p3, p4, p5, p6, p7):
        assert os.path.exists(p) and os.path.getsize(p) > 1000
    assert res.success


def test_fit_grid_and_polarization_plot(tmp_path):
    from dtc_tpu.analysis import plots

    t = np.arange(24)
    records = []
    for gi, g in enumerate([0.9, 0.97]):
        for ai, a in enumerate([0.5, 1.0]):
            y = a * np.cos(np.pi * t) * np.exp(-0.05 * t)
            records.append(({"row": gi, "col": ai, "g": g, "amp": a},
                            {"time": t, "av_autocorr": y}))
    png, rows = plots.plot_fit_grid(records, str(tmp_path / "grid.png"),
                                    fit_csv=str(tmp_path / "fits.csv"))
    assert len(rows) == 4 and all(r["fit_success"] for r in rows)
    from dtc_tpu.io import csvio
    fits = csvio.read_columns(str(tmp_path / "fits.csv"))
    assert "A_fitted" in fits and len(fits["A_fitted"]) == 4

    merged = {"time": t}
    for pol in ("x", "y"):
        merged[f"av_autocorr_{pol}"] = np.cos(np.pi * t)
        merged[f"av_autocorr_echo_{pol}"] = np.exp(-0.05 * t)
        merged[f"sqrt_av_autocorr_echo_{pol}"] = np.exp(-0.025 * t)
    png2 = plots.plot_polarization_comparison(merged, str(tmp_path / "pol.png"),
                                              ("x", "y"))
    import os
    assert os.path.getsize(png2) > 1000


def test_adaptive_comparison_plot(tmp_path):
    """The controlled-g 3-panel adaptive-vs-fixed summary figure
    (controlled-g.py:739-806) renders from the adaptive data CSV schema,
    with and without envelope columns present."""
    import os

    import numpy as np

    from dtc_tpu.analysis import plots

    t = np.arange(8, dtype=float)
    base = {
        "time": t,
        "av_autocorr_adaptive": np.cos(np.pi * t) * 0.8,
        "av_autocorr_echo_adaptive": 0.9 ** t,
        "av_autocorr_standard_g84": np.cos(np.pi * t) * 0.7,
        "av_autocorr_echo_standard_g84": 0.85 ** t,
        "av_autocorr_standard_g97": np.cos(np.pi * t) * 0.75,
        "av_autocorr_echo_standard_g97": 0.88 ** t,
        "av_g_values": np.linspace(0.84, 0.95, 8),
        "g_history_inst1": np.linspace(0.84, 0.96, 8),
    }
    p1 = plots.plot_adaptive_comparison(base, str(tmp_path / "a.png"))
    assert os.path.getsize(p1) > 0
    full = dict(base)
    for lab in ("adaptive", "g84", "g97"):
        full[f"upper_env_{lab}_forward"] = np.abs(base["av_autocorr_adaptive"])
        full[f"lower_env_{lab}_forward"] = -np.abs(base["av_autocorr_adaptive"])
    p2 = plots.plot_adaptive_comparison(full, str(tmp_path / "b.png"))
    assert os.path.getsize(p2) > 0
