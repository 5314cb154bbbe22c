"""Device-mesh utilities: parameter sweeps sharded over ICI.

The reference's only parallelism is a ThreadPoolExecutor fanning out ACE
subprocesses on one node (SURVEY.md §2.4).  Here the batch axes (pulse areas,
detunings, insertion times, matrix elements) are vmapped on a chip and sharded
over a 1D ``jax.sharding.Mesh`` across chips: embarrassingly parallel, so the
only collective is the implicit all-gather of results over ICI.
"""

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def default_mesh(n_devices=None):
    """1D mesh over (the first n) available devices, axis name 'batch'."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("batch",))


def shard_batch(x, mesh, axis=0):
    """Place an array with its leading (batch) axis sharded over the mesh."""
    spec = [None] * np.ndim(x)
    spec[axis] = "batch"
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))


def replicate(x, mesh):
    """Place an array fully replicated over the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(x, m, axis=0):
    """Pad the batch axis to a multiple of m (mesh size); returns (x, n_valid)."""
    n = x.shape[axis]
    rem = (-n) % m
    if rem == 0:
        return x, n
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad, mode="edge"), n
