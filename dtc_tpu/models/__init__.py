"""Model families: kicked-Ising drive schedules, noise channels, Hamiltonians."""

from dtc_tpu.models.drives import KickSchedule, build_kick_schedule  # noqa: F401
from dtc_tpu.models.noise import NoiseSpec  # noqa: F401
from dtc_tpu.models.hamiltonian import hamiltonian_terms  # noqa: F401
