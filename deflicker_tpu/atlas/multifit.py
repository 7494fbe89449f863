"""Device-parallel multi-video atlas fitting (SPMD over a video axis).

The reference processes videos strictly one at a time — "batch" means
launching the pipeline once per video (SURVEY.md §2F; test.py is a
single-video CLI).  On TPU the fit is a small program (a 10k-sample batch
through 256-wide MLPs every step), so a single chip is latency-bound and a
pod is idle: the natural TPU-native batching axis is the VIDEO.

This module fits V same-shaped videos SIMULTANEOUSLY:

  * every fit tensor gains a leading V axis (params, optimizer state, RNG
    keys, VideoData) and the scan step is `jax.vmap`-ed over it — the Pallas
    fused-MLP kernel batches through its pallas_call batching rule, and all
    per-video matmuls fuse into larger batched dispatches (better MXU
    utilization even on ONE chip);
  * under a mesh, the V axis is sharded over the devices
    (`NamedSharding(P("data"))` on every leading axis) — videos are
    independent, so XLA SPMD partitions the whole step with ZERO collectives:
    linear scaling over ICI by construction.

Schedule semantics (chunk boundaries, global-rigidity stop, bootstrap stop,
eval cadence, non-finite failure detection) are identical to
`engine.fit_atlas` — same config drives both.  Checkpoint/resume stays a
single-video concern (`fit_atlas`); this is the throughput path.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional, Sequence, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .data import VideoData
from .engine import (AtlasConfig, AtlasSpecs, FitResult, Params,
                     init_models, make_loss_fn, make_scan_step,
                     pretrain_mapping)


def stack_video_data(datas: Sequence[VideoData]) -> VideoData:
    """Stack same-shaped videos into one VideoData with leading V axis.

    Builds each video's gather pack first so the stacked pytree is
    fit-ready; only the packs stack on DEVICE (the fit reads nothing
    else), the original tensors stack as host numpy.  Raises if shapes
    disagree (group clips by (T, H, W) before calling — `group_by_shape`)."""
    datas = [d.with_packed() for d in datas]
    shapes = {tuple(d.video.shape) for d in datas}
    if len(shapes) != 1:
        raise ValueError(f"cannot stack videos of differing shapes: {shapes}")
    packed = jnp.stack([d.packed for d in datas])
    host = [d._replace(packed=None) for d in datas]
    stacked = jax.tree_util.tree_map(
        lambda *xs: np.stack([np.asarray(x) for x in xs]), *host)
    return stacked._replace(packed=packed)


def group_by_shape(datas: Sequence[VideoData]) -> Dict[tuple, List[int]]:
    """Indices of `datas` grouped by (T, H, W) — one parallel fit per group."""
    groups: Dict[tuple, List[int]] = {}
    for idx, d in enumerate(datas):
        groups.setdefault(tuple(d.video.shape[:3]), []).append(idx)
    return groups


def _shard_leading(tree, mesh):
    """Place every leaf with its leading (video) axis sharded over the mesh.

    Videos are independent -> sharding the V axis partitions the entire fit
    step with no communication; XLA SPMD just runs V/n_devices videos' math
    on each device."""
    if mesh is None or mesh.size <= 1:
        return tree
    from jax.sharding import NamedSharding, PartitionSpec as P

    from ..parallel import DATA_AXIS

    sh = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), tree)


@partial(jax.jit, static_argnames=("vstep", "n_steps"), donate_argnums=(0,))
def _run_chunk_multi(carry_v, data_v: VideoData, vstep: Callable,
                     n_steps: int):
    """n_steps vmapped optimizer steps; `data_v` rides as a traced input
    (same HLO-constant rationale as engine._run_chunk)."""
    body = lambda c, _: vstep(c, data_v)
    carry_v, auxes = jax.lax.scan(body, carry_v, None, length=n_steps)
    # mean over the chunk's steps, keep the per-video axis
    return carry_v, jax.tree_util.tree_map(
        lambda a: jnp.mean(a, axis=0), auxes)


def init_models_multi(key: jax.Array, specs: AtlasSpecs,
                      n_videos: int) -> Params:
    """Per-video independent inits, stacked on a leading V axis."""
    keys = jax.random.split(key, n_videos)
    return jax.vmap(lambda k: init_models(k, specs))(keys)


def pretrain_mapping_multi(params_v, spec, key: jax.Array, n_videos: int,
                           num_frames: int, H: int, W: int,
                           uv_mapping_scale: float,
                           pretrain_iters: int = 100) -> list:
    """Identity-init pretraining vmapped over the video axis."""
    keys = jax.random.split(key, n_videos)
    fn = lambda p, k: pretrain_mapping(p, spec, k, num_frames, H, W,
                                       uv_mapping_scale, pretrain_iters)
    return jax.vmap(fn)(params_v, keys)


def unstack_tree(tree, n: int) -> list:
    return [jax.tree_util.tree_map(lambda x: x[v], tree) for v in range(n)]


def fit_atlas_multi(params_v: Params, specs: AtlasSpecs, data_v: VideoData,
                    cfg: AtlasConfig, key: jax.Array,
                    mesh=None,
                    eval_callback: Optional[Callable] = None,
                    log_callback: Optional[Callable] = None,
                    start_iteration: int = 0,
                    opt_state_v=None,
                    keys: Optional[jax.Array] = None,
                    checkpoint_callback: Optional[Callable] = None,
                    ) -> List[FitResult]:
    """Fit V videos in parallel; returns one FitResult per video.

    `params_v` / `data_v` carry a leading V axis on every leaf (from
    `init_models_multi` / `stack_video_data`).  `eval_callback(iteration,
    video_index, params, opt_state)` fires per video at the reference's
    cadence; `log_callback(iteration, video_index, record)` likewise.

    Resume: pass `start_iteration` (= steps already completed), the saved
    `opt_state_v` and the saved per-video `keys` — the continuation then
    restores the EXACT carry (params, optimizer moments, RNG stream; the
    reference's resume instead re-runs the checkpointed iteration once,
    stage1_neural_atlas.py:141-151) and replays the same sample sequence.
    The trajectory matches an uninterrupted fit up to XLA recompilation
    float noise: recompiling the identical step program is not bitwise
    stable (measured ~1e-4 param drift per chunk on CPU; with the
    persistent compile cache serving one binary it IS bitwise).
    `checkpoint_callback(iteration_count, carry)` fires with the full
    stacked carry (params_v, opt_state_v, keys) at the eval cadence and
    once at fit end; `iteration_count` is the number of completed steps,
    i.e. the `start_iteration` to resume with.
    """
    V = data_v.video.shape[0]
    T, H, W = data_v.video.shape[1:4]
    # the vmapped Pallas backward carries a bit more VMEM than the plain
    # one.  Hardware-verified caps (bench_multifit.py, v5e): single-atlas
    # vmapped fits tile 1536 (338.1 vs 329.6 aggregate video-it/s at 1024,
    # +2.6%).  The vmapped DUAL backward overflows the 16 MB scoped VMEM
    # budget at 1536 with either kernel body (v1 17.98 MB, v2 17.20 MB —
    # the alpha-MLP bwd is binding); the round-4 v2 default fits tile 1280
    # (151.1 vs 149.9 aggregate video-it/s at 1024, +0.8%), while the v1
    # fallback (DEFLICKER_IMLP_V2=0) stays capped at 1024.
    import os
    v2 = os.environ.get("DEFLICKER_IMLP_V2", "1") == "1"
    cap = (1280 if v2 else 1024) if specs.dual else 1536
    cfg = dataclasses.replace(
        cfg, pallas_tile=min(cfg.pallas_tile or cap, cap))
    if mesh is not None and (mesh.size <= 1 or V % mesh.size != 0):
        # uneven group: still batched (vmap), just not mesh-sharded —
        # callers wanting full utilization should pad groups to a multiple
        # of the device count
        mesh = None

    optimizer = optax.adam(cfg.learning_rate)
    if opt_state_v is None:
        opt_state_v = jax.vmap(optimizer.init)(params_v)
    if keys is None:
        keys = jax.random.split(key, V)
    carry = (params_v, opt_state_v, keys)
    carry = _shard_leading(carry, mesh)

    # single-video template VideoData for make_loss_fn's static-shape probe
    data_t = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(tuple(x.shape[1:]), x.dtype), data_v)

    # the fit reads only the packs: shard/hold those on device, shrink
    # every other leaf to per-video dummies (see VideoData.fit_view)
    z = lambda c: jnp.zeros((V, 1, 1, 1) + ((c,) if c else ()), jnp.float32)
    data_v = VideoData(z(3), z(3), z(3), z(0), z(2), z(2), z(0), z(0),
                       packed=data_v.packed)
    data_v = _shard_leading(data_v, mesh)

    def phase_flags(i: int) -> Tuple[bool, bool]:
        include_global = (cfg.include_global_rigidity_loss
                         and i <= cfg.stop_global_rigidity)
        include_boot = specs.dual and i <= cfg.stop_bootstrapping_iteration
        return include_global, include_boot

    boundaries = sorted({cfg.stop_global_rigidity + 1,
                         cfg.stop_bootstrapping_iteration + 1})
    eval_every = max(1, cfg.evaluate_every)

    vsteps: Dict[Tuple[bool, bool], Callable] = {}
    logs: List[List[Dict[str, float]]] = [[] for _ in range(V)]

    i = start_iteration
    while i < cfg.iters_num:
        flags = phase_flags(i)
        nxt = i + max(1, cfg.steps_per_call)
        for b in boundaries:
            if i < b < nxt:
                nxt = b
        next_eval = ((i // eval_every) + 1) * eval_every + 1
        if i < next_eval < nxt:
            nxt = next_eval
        nxt = min(nxt, cfg.iters_num)
        n_steps = nxt - i

        if flags not in vsteps:
            loss_fn = make_loss_fn(specs, cfg, data_t, *flags)
            step = make_scan_step(loss_fn, optimizer, cfg.samples_batch,
                                  H, W, T, mesh=None)
            vsteps[flags] = jax.vmap(lambda c, d: step(c, None, d))

        carry, aux_mean = _run_chunk_multi(carry, data_v,
                                           vstep=vsteps[flags],
                                           n_steps=n_steps)
        i = nxt
        recs = {k: np.asarray(v) for k, v in aux_mean.items()}   # (V,) each
        if not np.all(np.isfinite(recs["total"])):
            from ..utils.checkpoint import save_checkpoint

            bad = [v for v in range(V) if not np.isfinite(recs["total"][v])]
            rescue = save_checkpoint("deflicker_rescue_checkpoint_multi", {
                "params": carry[0], "opt_state": carry[1], "iteration": i})
            raise FloatingPointError(
                f"non-finite loss at iteration {i - 1} for video(s) {bad} "
                f"(state dumped to {rescue})")
        for v in range(V):
            rec = {k: float(recs[k][v]) for k in recs}
            logs[v].append({"iteration": i - 1, **rec})
            if log_callback is not None:
                log_callback(i - 1, v, rec)

        last = i - 1
        # same cadence as engine.fit_atlas (reference:
        # stage1_neural_atlas.py:246-251) — including an eval point landing
        # on the final iteration
        if last % eval_every == 0 and last > start_iteration:
            if eval_callback is not None:
                for v, (p, o) in enumerate(zip(unstack_tree(carry[0], V),
                                               unstack_tree(carry[1], V))):
                    eval_callback(last, v, p, o)
            if checkpoint_callback is not None:
                checkpoint_callback(i, carry)

    if checkpoint_callback is not None:
        checkpoint_callback(i, carry)
    params_v, opt_state_v, _ = carry
    return [FitResult(p, o, i, logs[v])
            for v, (p, o) in enumerate(zip(unstack_tree(params_v, V),
                                           unstack_tree(opt_state_v, V)))]
