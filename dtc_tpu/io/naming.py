"""Config-encoded filename schema — the reference's system of record.

Filenames ARE the experiment config key (SURVEY.md §5 observability):
autocorr: autocorr_data_{state}_g{g}_L{L}_inst{inst}_tf{tf}_randomphi{r}
          _delta{d}_amplitude{A}_noise{p}_usenoise{u}[_pol{pol}][_with_envelopes].csv
          (autocorr-delta-a-single-qiskit-fast.py:266)
energy:   energy_data_{state}_g{g}_L{L}_inst{inst}_randomphi{r}_delta{d}
          _amplitude{A}_noise{p}_usenoise{u}.csv
adaptive: autocorr_data_{state}_realtime_adaptive[_optimization_iterN|_expD|_linear]
          _g{g}_L{L}_inst{inst}_randomphi{r}_delta{d}_amplitude{A}_noise{p}
          _usenoise{u}_target{T}_gain{G}.csv
          (autocorr-delta-a-single-qiskit-fast-g-optimization.py:800-804)
"""

from __future__ import annotations


def _base(cfg) -> str:
    return (
        f"g{cfg.g}_L{cfg.L}_inst{cfg.inst}"
    )


def _suffix(cfg) -> str:
    return (
        f"randomphi{cfg.randomphi}_delta{cfg.phi_delta}_amplitude{cfg.phi_amplitude}"
        f"_noise{cfg.noise_prob}_usenoise{cfg.use_noise}"
    )


def autocorr_csv_name(cfg, *, pol: str | None = None, with_envelopes: bool = False) -> str:
    name = (
        f"autocorr_data_{cfg.initial_state}_{_base(cfg)}_tf{cfg.tf}_{_suffix(cfg)}"
    )
    if pol:
        name += f"_pol{pol}"
    if with_envelopes:
        name += "_with_envelopes"
    return name + ".csv"


def autocorr_comparison_csv_name(cfg, with_envelopes: bool = True) -> str:
    name = f"autocorr_data_comparison_{cfg.initial_state}_{_base(cfg)}_{_suffix(cfg)}"
    if with_envelopes:
        name += "_with_envelopes"
    return name + ".csv"


def energy_csv_name(cfg) -> str:
    return f"energy_data_{cfg.initial_state}_{_base(cfg)}_{_suffix(cfg)}.csv"


def adaptive_csv_name(cfg) -> str:
    if cfg.use_optimization:
        method = f"_optimization_iter{cfg.optimization_iterations}"
    elif cfg.exponential_feedback:
        method = f"_exp{cfg.decay_compensation}"
    else:
        method = "_linear"
    return (
        f"autocorr_data_{cfg.initial_state}_realtime_adaptive{method}_{_base(cfg)}"
        f"_{_suffix(cfg)}_target{cfg.target_echo}_gain{cfg.feedback_gain}.csv"
    )


def g_history_csv_name(cfg) -> str:
    return (
        f"g_history_{cfg.initial_state}_realtime_g{cfg.g}_L{cfg.L}_inst{cfg.inst}"
        f"_target{cfg.target_echo}_gain{cfg.feedback_gain}.csv"
    )


def gate_count_csv_name(t: int, echo: bool, *, opt_level: int = 0,
                        backend: str = "dtc_tpu", tag: str = "") -> str:
    echo_str = "echo" if echo else "forward"
    name = f"gate_counts_t{t}_{echo_str}_opt{opt_level}_{backend}"
    if tag:
        name += f"_{tag}"
    return name + ".csv"


def autocorr_folder_name(cfg) -> str:
    return f"autocorr_data_L{cfg.L}_noiseprob{cfg.noise_prob}_fakebackend{cfg.use_fakebackend}"


def energy_folder_name(cfg) -> str:
    return f"energy-data_L{cfg.L}-full-ham"
