"""Multi-chip simulation: device meshes + amplitude-sharded statevectors."""

from dtc_tpu.parallel.mesh import make_mesh  # noqa: F401
from dtc_tpu.parallel.sharded import make_sharded_autocorr_forward  # noqa: F401
