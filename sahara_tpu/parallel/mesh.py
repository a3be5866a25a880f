"""Device mesh setup: data-parallel query sharding over replicated index.

The reference has no distribution layer at all (single process, single
thread — SURVEY.md §2.3); this module defines the TPU-native scaling story:
a 1-D ``data`` mesh axis spanning all chips, index arrays replicated
(``P()``), query batches sharded (``P('data')``), hit reduction via
collectives over ICI (SURVEY.md §5.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from sahara_tpu.engine.device import DeviceIndex
from sahara_tpu.index.fmindex import FMIndex

DATA_AXIS = "data"


def data_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    """A 1-D mesh over the first ``n_devices`` local devices.

    If the default backend has too few devices, falls back to the CPU
    backend (which honors ``--xla_force_host_platform_device_count`` for
    multi-chip dry runs even when a TPU plugin claims the default slot)."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None and len(devices) < n_devices:
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= n_devices:
                devices = cpu
    if n_devices is not None:
        if len(devices) < n_devices:
            raise ValueError(f"requested {n_devices} devices, have {len(devices)}")
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (DATA_AXIS,))


def replicate_index(index: FMIndex, mesh: Mesh) -> DeviceIndex:
    """Replicate all index arrays across the mesh (BASELINE.json north_star:
    index replicated per chip, queries sharded)."""
    sharding = NamedSharding(mesh, P())
    return DeviceIndex.from_host(index, sharding=sharding)


def shard_queries(queries: np.ndarray, mesh: Mesh) -> tuple[jax.Array, int]:
    """Pad the query batch to a multiple of the mesh size and shard it along
    the data axis.  Returns (device array [nq_padded, m], original count)."""
    n = mesh.devices.size
    nq, m = queries.shape
    pad = (-nq) % n
    if pad:
        queries = np.concatenate([queries, np.zeros((pad, m), dtype=queries.dtype)], axis=0)
    sharding = NamedSharding(mesh, P(DATA_AXIS, None))
    return jax.device_put(queries, sharding), nq
