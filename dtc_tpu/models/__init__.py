"""Model families: kicked-Ising drive schedules, noise channels, Hamiltonians."""

from dtc_tpu.models.drives import KickSchedule, build_kick_schedule  # noqa: F401
from dtc_tpu.models.noise import NoiseSpec  # noqa: F401
from dtc_tpu.models.hamiltonian import hamiltonian_terms  # noqa: F401
from dtc_tpu.models.device_noise import (  # noqa: F401
    DeviceNoiseModel,
    brisbane_like_model,
    model_from_calibration,
    synthetic_eagle_calibration,
)
