"""Device mesh + sharding policies — the framework's single parallelism home.

The reference has no distributed execution at all (SURVEY.md §2F: one GPU,
sequential subprocesses).  The TPU-native design exposes every data-parallel
axis the workload has through ONE 1-D `jax.sharding.Mesh`:

  * atlas fit:   the (samples_batch,) coordinate batch is sharded over
                 `data`; params replicate; XLA SPMD turns the loss means and
                 grad reductions into ICI psums (no hand-written collectives);
  * rendering:   frames (embarrassingly parallel in t) shard over `data`;
  * RAFT flow:   frame-pair batches shard over `data`;
  * stage-2 UNet: per-frame independent -> frame batch shards over `data`
                 (the sequential refinement scan stays per-video; multiple
                 videos shard over `data` instead);
  * multi-video fit: same-shaped videos' atlas fits are vmapped over a
                 leading video axis that shards over `data` with ZERO
                 collectives (atlas/multifit.py — videos are independent).

The MLPs here are 256-wide — far too small for tensor parallelism to pay;
batch/frame data parallelism saturates a v5e-8's MXUs, so a single mesh axis
is the whole story.  Multi-host (DCN) fan-out happens at video granularity
through the same axis.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(n_devices: Optional[int] = None,
              devices: Optional[Sequence] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D mesh over (the first n of) the available devices."""
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (axis_name,))


def data_axis_sharding(mesh: Mesh, axis: int = 0,
                       ndim: int = 1) -> NamedSharding:
    """Shard array dimension `axis` (of an ndim-array) over the data axis."""
    spec = [None] * ndim
    spec[axis] = DATA_AXIS
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard a 1-D (or leading-axis) batch over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def shard_constraint(x: jax.Array, mesh: Optional[Mesh],
                     axis: int = 0) -> jax.Array:
    """Inside-jit sharding annotation; no-op when mesh is None (single chip).

    This is the only mechanism the framework uses to express parallelism —
    XLA SPMD propagates the layout and inserts the ICI collectives.
    """
    if mesh is None or mesh.size <= 1:
        return x
    return jax.lax.with_sharding_constraint(
        x, data_axis_sharding(mesh, axis=axis, ndim=x.ndim))
