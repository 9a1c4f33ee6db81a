"""Post-processing: envelopes, oscillation fits, FFT subharmonics, plots."""

from dtc_tpu.analysis.envelope import find_envelope  # noqa: F401
