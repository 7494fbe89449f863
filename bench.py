#!/usr/bin/env python
"""Benchmark: stage-1 atlas-fit throughput on the reference's headline
config (benchmark config 1 in BASELINE.md: 80 frames at 1/4 of 768x432,
10k-sample batches — the dominant hot loop, SURVEY.md §3.1 HOT LOOP 4).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...extras}.

vs_baseline: the reference publishes no throughput numbers (BASELINE.md);
our documented estimate for the PyTorch reference's stage-1 loop on an A100
is ~10 it/s (10k iterations in ~17 min — per-iteration work is ~11 small
MLP forwards + backward on 10k samples, dominated by kernel-launch/dispatch
overhead at this size; see BASELINE.md for the derivation). vs_baseline is
measured_its_per_sec / 10.0.
"""

import json
import time

import numpy as np

REFERENCE_A100_ITERS_PER_SEC = 10.0   # documented estimate, see BASELINE.md
T, H, W = 80, 108, 192                # Winter_Scenes_in_Holland @ down 4
WARMUP_ITERS = 250
BENCH_ITERS = 1000


def synthetic_video_data(T, H, W, seed=0):
    import jax.numpy as jnp

    from deflicker_tpu.atlas.data import VideoData

    rng = np.random.default_rng(seed)
    base = rng.uniform(0, 1, (1, H, W, 3)).astype(np.float32)
    drift = rng.uniform(-0.02, 0.02, (T, 1, 1, 3)).astype(np.float32)
    video = np.clip(base + drift, 0, 1).astype(np.float32)
    dx = np.zeros_like(video)
    dy = np.zeros_like(video)
    dx[:, :, :-1] = video[:, :, 1:] - video[:, :, :-1]
    dy[:, :-1, :] = video[:, 1:] - video[:, :-1]
    flow = rng.uniform(-1, 1, (T, H, W, 2)).astype(np.float32)
    ones = np.ones((T, H, W), np.float32)
    j = jnp.asarray
    return VideoData(j(video), j(dx), j(dy), j(ones * 0), j(flow), j(-flow),
                     j(ones), j(ones))


REAL_VIDEO = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
CACHE_DIR = "/tmp/deflicker_bench_cache"


def real_video_data(T, H, W):
    """Benchmark config (1)'s REAL input: the bundled test video at down 4,
    Farneback flow + consistency masks through the production data loader
    (so final_rgb_loss reflects convergence on real frames, not noise).
    Frames/flow cache under /tmp so repeat runs skip the preprocessing."""
    from pathlib import Path

    from deflicker_tpu.atlas.data import load_video_data
    from deflicker_tpu.flow.engine import FarnebackFlow, preprocess_optical_flow
    from deflicker_tpu.io.media import list_frames, video_to_frames

    src = Path(REAL_VIDEO)
    if not src.exists():
        return None
    frames_dir = Path(CACHE_DIR) / src.stem
    frames_dir.mkdir(parents=True, exist_ok=True)
    if not list_frames(frames_dir):
        video_to_frames(src, frames_dir, fps=10)
    preprocess_optical_flow(frames_dir, FarnebackFlow(), verbose=False)
    return load_video_data(frames_dir, H, W, T)


def main():
    import dataclasses
    import os

    import jax

    from deflicker_tpu.atlas.engine import (build_specs, init_models,
                                            make_loss_fn, make_scan_step,
                                            _run_chunk)
    from deflicker_tpu.config import AtlasConfig
    import optax

    cfg = AtlasConfig()          # the reference's config_flow_100 defaults
    overrides = {}
    if os.environ.get("BENCH_PRECISION"):
        overrides["fit_precision"] = os.environ["BENCH_PRECISION"]
    if os.environ.get("BENCH_PALLAS") == "1":
        overrides["use_pallas_imlp"] = True
    if os.environ.get("BENCH_TILE"):
        overrides["pallas_tile"] = int(os.environ["BENCH_TILE"])
    if overrides:
        cfg = dataclasses.replace(cfg, **overrides)
    # BENCH_DUAL=1: the seg path's 4-network fit (benchmark configs 3/4 —
    # all 10 loss terms incl. bootstrap; mask content doesn't affect speed)
    dual = os.environ.get("BENCH_DUAL") == "1"
    source = "real"
    try:
        data = real_video_data(T, H, W)
    except Exception:
        data = None
    if data is None:
        source, data = "synthetic", synthetic_video_data(T, H, W)
    data = data.with_packed()        # production fit path packs its gathers
    specs = build_specs(cfg, dual=dual)
    params = init_models(jax.random.key(0), specs)
    optimizer = optax.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)

    loss_fn = make_loss_fn(specs, cfg, data, include_global=True,
                           include_bootstrap=dual)
    step_fn = make_scan_step(loss_fn, optimizer, cfg.samples_batch, H, W, T)

    carry = (params, opt_state, jax.random.key(1))
    # warmup: compile + first chunk; the float() readback is the only
    # reliable completion barrier on remotely-attached devices
    # (block_until_ready returns early through the axon tunnel)
    carry, aux = _run_chunk(carry, data, step_fn=step_fn, n_steps=WARMUP_ITERS)
    float(aux["rgb"])

    t0 = time.perf_counter()
    done = 0
    while done < BENCH_ITERS:
        n = min(250, BENCH_ITERS - done)
        carry, aux = _run_chunk(carry, data, step_fn=step_fn, n_steps=n)
        done += n
    final_rgb = float(aux["rgb"])      # forces the whole queued chain
    dt = time.perf_counter() - t0

    its = BENCH_ITERS / dt
    device = jax.devices()[0]
    print(json.dumps({
        "metric": ("atlas_fit_iters_per_sec_dual" if dual
                   else "atlas_fit_iters_per_sec"),
        "value": round(its, 2),
        "unit": "it/s",
        "vs_baseline": round(its / REFERENCE_A100_ITERS_PER_SEC, 2),
        "config": f"{T}x{H}x{W}, batch {cfg.samples_batch}, "
                  f"{'dual' if dual else 'single'}-atlas, {source} video",
        "device": f"{device.platform}:{device.device_kind}",
        "final_rgb_loss": final_rgb,
    }))


if __name__ == "__main__":
    main()
