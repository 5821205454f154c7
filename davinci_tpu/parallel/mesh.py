"""Pod-slice parallelism: mesh construction, multi-host init, batch
sharding helpers.

Role parity + redesign: the reference scales proving with an HTTP
master/worker farm (SURVEY.md §2.4).  The TPU-native replacement is SPMD
over a jax device mesh: votes (MSM points, NTT rows, Poseidon batches)
shard across chips along a single "shard" axis; bucket sums and butterfly
exchanges ride ICI collectives (see msm.sharded_msm).  The HTTP farm
(davinci_tpu.workers) remains as the protocol-interop rim.

Multi-host: call distributed_init() once per process (jax.distributed) and
build the mesh over all global devices — the same sharded kernels then run
across hosts with DCN/ICI handled by the runtime.
"""

from __future__ import annotations

import jax
import numpy as np


def distributed_init(
    coordinator: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
):
    """Initialize jax.distributed for a multi-host pod slice.  No-op when
    args are None and the environment is single-process."""
    if coordinator is None:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )


def get_mesh(axis_name: str = "shard", devices=None) -> jax.sharding.Mesh:
    devs = devices if devices is not None else jax.devices()
    return jax.sharding.Mesh(np.array(devs), (axis_name,))


def shard_batch(mesh: jax.sharding.Mesh, arr, axis_name: str = "shard"):
    """Place an (n, ...) array sharded along its leading dim."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))
