"""Multi-host (DCN) fan-out — video-granularity data parallelism.

The workload is embarrassingly parallel at video granularity (each video's
atlas fit / flow / stage 2 touches only that video's tensors), so the
multi-host design is deliberately collective-free over DCN:

  * every process (host) runs the SAME `cli.batch` command;
  * `init_distributed` wires the JAX distributed runtime (coordinator +
    process grid) so the processes agree on who-is-who;
  * `assign_videos` deals each process a disjoint round-robin slice of the
    video list — no cross-host communication, no global barrier;
  * each process builds its mesh over its LOCAL devices only
    (`local_mesh`), so the within-video parallelism (sample batch, frame
    batch, chunk group — parallel/mesh.py) rides ICI and never touches DCN.

This is the layout SURVEY.md §2F/§5 prescribes ("DCN for multi-host
multi-video fan-out"); the reference has no distributed anything (its
"batch" is launching the pipeline once per video per GPU,
stage1_neural_atlas.py:267-268 CUDA_VISIBLE_DEVICES).

Launch recipe (one line per host):

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=4 \
    JAX_PROCESS_ID=<k> python -m deflicker_tpu.cli.batch --dcn \
        --video_dir data/videos --parallel_fit

On Cloud TPU pods `jax.distributed.initialize()` auto-discovers all three
values; the env vars are only needed on hand-wired clusters.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence, Tuple

import jax

from .mesh import Mesh, make_mesh


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> Tuple[int, int]:
    """Initialize the JAX distributed runtime (idempotent, env-aware).

    Returns (process_index, process_count).  Resolution order per value:
    explicit argument > JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    JAX_PROCESS_ID env > jax.distributed auto-detection (TPU pods).
    Single-process usage (nothing configured) skips initialization and
    returns (0, 1) — the code path is identical either way.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    try:
        already = jax._src.distributed.global_state.client is not None
    except Exception:                      # private API moved: assume fresh
        already = False
    if coordinator and not already:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    elif not already and (num_processes or 0) > 1:
        # pod-style auto-detection (no explicit coordinator)
        jax.distributed.initialize()
    return jax.process_index(), jax.process_count()


def assign_videos(videos: Sequence, process_id: int,
                  num_processes: int) -> List:
    """This process's disjoint share of the video list.

    Round-robin (videos[k::n]) rather than contiguous blocks: batch lists
    are commonly sorted (by name ~ by scene/length), and dealing
    interleaves long and short videos evenly across hosts.
    """
    if not 0 <= process_id < num_processes:
        raise ValueError(f"process_id {process_id} outside "
                         f"[0, {num_processes})")
    return list(videos)[process_id::num_processes]


def local_mesh(axis_name: str = "data") -> Optional[Mesh]:
    """Mesh over THIS process's devices only (None when single-device).

    Within-video parallelism stays on local ICI; the video axis is already
    split across hosts by `assign_videos`, so no jit program ever spans
    hosts — DCN carries nothing but the coordination handshake.
    """
    local = jax.local_devices()
    if len(local) <= 1:
        return None
    return make_mesh(devices=local, axis_name=axis_name)
