from pyaceqd_tpu.parallel.mesh import default_mesh, shard_batch
from pyaceqd_tpu.parallel.sweep import area_sweep
