import os

# Tests run on a virtual 8-device CPU mesh — the TPU-world analogue of the
# reference's fake backends (SURVEY.md §4): multi-chip sharding is validated
# without real chips.
#
# NOTE: use jax.config (not the JAX_PLATFORMS env var) to pin the platform —
# on this image the axon TPU plugin deadlocks device discovery when the env
# var is set, while the config route cleanly selects the host platform.
os.environ.pop("JAX_PLATFORMS", None)
_flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = _flags + " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
