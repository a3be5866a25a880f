"""Multi-host initialization and the cross-host search runner.

The reference has no distributed story (single process, SURVEY.md §2.3);
this module defines the TPU-native one: ``jax.distributed`` across hosts, a
global data mesh spanning every chip, index replicated per host (each host
loads the same index file — no cross-host index traffic), query FASTA
sharded by host rank, hits written per host and merged by rank order.
"""

from __future__ import annotations

import jax
import numpy as np

from sahara_tpu.parallel.mesh import DATA_AXIS


def initialize(coordinator_address: str | None = None, num_processes: int | None = None, process_id: int | None = None) -> None:
    """Initialize jax.distributed (no-op when single-process).

    On TPU pods the arguments are discovered from the environment; pass
    them explicitly for manual bring-up."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    elif coordinator_address is not None:
        jax.distributed.initialize(coordinator_address=coordinator_address)


def global_data_mesh():
    """A 1-D data mesh over every chip of every host."""
    from jax.sharding import Mesh

    return Mesh(np.array(jax.devices()), (DATA_AXIS,))


def host_query_slice(num_queries: int) -> tuple[int, int]:
    """[start, end) of the query range this host should load (query-file
    sharding by process rank; hosts hold only their slice in memory)."""
    rank = jax.process_index()
    n_proc = jax.process_count()
    per = -(-num_queries // n_proc)
    start = min(rank * per, num_queries)
    return start, min(start + per, num_queries)


def merge_host_outputs(paths: list[str], out_path: str) -> None:
    """Concatenate per-host hit files in rank order (global result order =
    query order, matching the single-host canonical ordering)."""
    with open(out_path, "w") as out:
        for p in paths:
            with open(p) as fh:
                out.write(fh.read())
