"""Multi-host scale-out over ICI/DCN via jax.distributed.

The reference has no distributed anything (SURVEY.md §2/§5: zero network
code; parallelism ends at libzstd's in-process worker pool).  The TPU
framework's multi-host story, per the BASELINE north star:

  * every process (host) runs the same program under `jax.distributed`;
  * the frame batch is sharded over the GLOBAL device mesh — each host's
    chips compress the frame rows placed on them;
  * per-frame compressed lengths are all-gathered (tiny, rides ICI/DCN);
  * frame payloads are gathered IN FRAME ORDER to the writing host by
    replicating the (compress-bound-padded) output array — XLA turns the
    out-sharding change into the collective — and host 0 materializes and
    writes them sequentially, preserving the archive's ordering contract.

Single-process runs degenerate to the local mesh with no collectives, so
the same code path is exercised by the CPU test mesh (SURVEY.md §4).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from libzseek_tpu.parallel.mesh import FRAME_AXIS


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> None:
    """Bring up the jax.distributed runtime (no-op when single-process and
    nothing is configured).  Arguments default from the standard env vars
    (JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID) or the
    TPU pod metadata when available."""
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS")
    if coordinator_address is None and num_processes is None:
        return  # single process
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes, process_id=process_id)


def global_frame_mesh() -> Mesh:
    """1-D mesh over every device of every participating host."""
    return Mesh(np.asarray(jax.devices()), (FRAME_AXIS,))


def is_writer_process() -> bool:
    return jax.process_index() == 0


def replicate_to_hosts(mesh: Mesh, sharded) -> np.ndarray:
    """Materialize a row-sharded array on every host (the ordered payload
    gather): jit identity with replicated out-sharding inserts the
    all-gather; device_get then pulls local copies only."""
    rep = NamedSharding(mesh, P())
    out = jax.jit(lambda a: a, out_shardings=rep)(sharded)
    return np.asarray(jax.device_get(out))


def gather_frames_in_order(mesh: Mesh, payloads, lengths) -> list[bytes]:
    """All hosts participate; returns the ordered frame payload list (only
    meaningful on the writer process, but safe everywhere).

    payloads: (B, CAP) row-sharded device array of compress-bound-padded
    frame bytes; lengths: (B,) true byte counts."""
    host_payloads = replicate_to_hosts(mesh, payloads)
    host_lengths = replicate_to_hosts(mesh, lengths)
    return [host_payloads[i, : int(host_lengths[i])].tobytes()
            for i in range(host_payloads.shape[0])]
