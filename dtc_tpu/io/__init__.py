"""Reference-compatible data IO: disorder, config-encoded filenames, CSV schemas."""

from dtc_tpu.io.disorder import generate_disorder, load_disorder, save_disorder  # noqa: F401
from dtc_tpu.io.naming import autocorr_csv_name, energy_csv_name  # noqa: F401
