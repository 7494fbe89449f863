#!/usr/bin/env python
"""Per-stage + end-to-end benchmark harness (BASELINE.md evidence).

`bench.py` stays the driver's one-line headline (atlas-fit it/s); this
script measures everything else and merges results into BENCH_E2E.json:

  raft      RAFT flow fields/s, device-bound (batch resident on device,
            scalar readback barrier) at the working resolution
  stage2    stage-2 throughput: UNet filter frames/s (batched) and the
            sequential refinement scan frames/s
  e2e       the full pipeline (config 1: real test video, 80 frames,
            down 4, 10k iters) wall-clock fps + per-stage breakdown
  torchref  the PyTorch reference's stage-1 training iteration measured on
            THIS host's CPU by calling the reference's own modules — the
            reproducible (if weak) comparator BASELINE.md calls for
  jaxcpu    our stage-1 fit step on the same CPU — the apples-to-apples
            same-hardware framework comparison

Usage: python bench_e2e.py [raft|stage2|e2e|torchref|jaxcpu|all ...]
"""

import json
import sys
import time
from pathlib import Path

import numpy as np

OUT = Path(__file__).parent / "BENCH_E2E.json"


def _merge(update: dict) -> None:
    cur = json.loads(OUT.read_text()) if OUT.exists() else {}
    cur.update(update)
    OUT.write_text(json.dumps(cur, indent=2) + "\n")
    print(json.dumps(update))


def _device_str():
    import jax

    d = jax.devices()[0]
    return f"{d.platform}:{d.device_kind}"


def _stage2_weights_kind(cfg) -> str:
    """What the engine will actually load (mirrors filter/engine._resolve_ckpt):
    the reference's converted .pth, an in-framework-trained .ckpt sibling, or
    random init — quality numbers are only meaningful for the first two."""
    from deflicker_tpu.filter.engine import _resolve_ckpt

    p = _resolve_ckpt(cfg.ckpt_filter)
    if p is None:
        return "random-init"
    return "pretrained" if p.suffix in (".pth", ".pt") else "self-trained"


# ---------------------------------------------------------------------------
# RAFT device-bound throughput
# ---------------------------------------------------------------------------

def bench_raft(H=360, W=640, pairs=4, iters=20, reps=3):
    """Flow fields/s with inputs resident on device: isolates chip compute
    from the dev tunnel's ~5 MB/s host link (BASELINE.md caveats).
    Runs in bfloat16 — the production RAFTFlow default (flow/engine.py)."""
    import jax
    import jax.numpy as jnp

    from deflicker_tpu.models.raft import raft_flow, raft_init
    from deflicker_tpu.ops.pad import Padder

    B = pairs * 2                      # fwd+bwd directions in one batch
    padder = Padder(H, W, divisor=8, mode="sintel")
    rng = np.random.default_rng(0)
    im = rng.uniform(0, 255, (2, B, H, W, 3)).astype(np.float32)
    x1 = jax.device_put(padder.pad(jnp.asarray(im[0])))
    x2 = jax.device_put(padder.pad(jnp.asarray(im[1])))
    variables = raft_init(jax.random.key(0), image_hw=x1.shape[1:3])

    def run():
        _, up = raft_flow(variables, x1, x2, iters=iters,
                          dtype=jnp.bfloat16)
        return float(up[0, 0, 0, 0])   # readback barrier

    run()                              # compile + warmup
    t0 = time.perf_counter()
    for _ in range(reps):
        run()
    dt = (time.perf_counter() - t0) / reps
    fields_s = B / dt
    _merge({"raft": {
        "metric": "raft_flow_fields_per_sec_device",
        "value": round(fields_s, 2),
        "config": f"{H}x{W}, batch {B} (={pairs} pairs x 2 dir), "
                  f"{iters} GRU iters, bf16, random weights",
        "sec_per_batch": round(dt, 3),
        "device": _device_str(),
    }})


# ---------------------------------------------------------------------------
# Stage-2 device-bound throughput
# ---------------------------------------------------------------------------

def bench_stage2(H=432, W=768, batch=16, T_refine=16, reps=3):
    """Measures BOTH conv dtypes: bfloat16 (the pipeline default,
    PipelineConfig.stage2_dtype) and float32 (reference numerics)."""
    import jax
    import jax.numpy as jnp

    from deflicker_tpu.filter.engine import filter_frames, refine_sequence
    from deflicker_tpu.models.refine import transformnet_init
    from deflicker_tpu.models.unet import unet_init
    from deflicker_tpu.ops.pad import Padder

    padder = Padder(H, W, divisor=32, mode="other")
    rng = np.random.default_rng(0)
    content = jax.device_put(padder.pad(jnp.asarray(
        rng.uniform(0, 1, (batch, H, W, 3)).astype(np.float32))))
    style = jax.device_put(padder.pad(jnp.asarray(
        rng.uniform(0, 1, (batch, H, W, 3)).astype(np.float32))))
    preds = jax.device_put(padder.pad(jnp.asarray(
        rng.uniform(0, 1, (T_refine, H, W, 3)).astype(np.float32))))
    fvars = unet_init(jax.random.key(0))
    lvars = transformnet_init(jax.random.key(1))

    rec = {"metric": "stage2_frames_per_sec_device",
           "config": f"{H}x{W} (padded {padder.padded_hw}), UNet batch "
                     f"{batch}, refine scan T={T_refine}, random weights",
           "device": _device_str()}
    for dt, name in ((jnp.bfloat16, "bf16"), (jnp.float32, "f32")):
        def run_filter():
            p = filter_frames(fvars, content, style, dtype=dt)
            return float(p[0, 0, 0, 0])

        run_filter()
        t0 = time.perf_counter()
        for _ in range(reps):
            run_filter()
        dt_f = (time.perf_counter() - t0) / reps

        def run_refine():
            o = refine_sequence(lvars, preds, dtype=dt)
            return float(o[-1, 0, 0, 0])

        run_refine()
        t0 = time.perf_counter()
        for _ in range(reps):
            run_refine()
        dt_r = (time.perf_counter() - t0) / reps

        filt_fps = batch / dt_f
        ref_fps = T_refine / dt_r
        combined = 1.0 / (1.0 / filt_fps + 1.0 / ref_fps)
        rec[name] = {"filter_fps": round(filt_fps, 2),
                     "refine_fps": round(ref_fps, 2),
                     "combined_fps": round(combined, 2)}
    _merge({"stage2": rec})


# ---------------------------------------------------------------------------
# End-to-end pipeline (benchmark config 1)
# ---------------------------------------------------------------------------

def bench_e2e(iters=None, down=4):
    import os
    import tempfile

    from deflicker_tpu.cli.main import args_to_configs, build_parser

    video = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
    if iters is None:
        iters = int(os.environ.get("BENCH_E2E_ITERS", 10001))
    with tempfile.TemporaryDirectory() as td:
        argv = ["--video_name", video, "--down", str(down),
                "--iters", str(iters),
                "--root", str(Path(td) / "data"),
                "--results_root", str(Path(td) / "results")]
        cfg, atlas_cfg = args_to_configs(build_parser().parse_args(argv))
        from deflicker_tpu.cli.pipeline import run_pipeline

        m = run_pipeline(cfg, atlas_cfg)
    _merge({"e2e": {
        "metric": "end_to_end_frames_per_sec",
        "value": round(m["frames_per_sec"], 3),
        "frames": m["num_frames"],
        "iters": iters,
        "t_total": round(m["t_total"], 1),
        "breakdown": {k: round(m[k], 1) for k in
                      ("t_flow", "t_pretrain", "t_fit", "t_render",
                       "t_stage2") if k in m},
        "fit_iters_per_sec": round(m["iters_per_sec"], 1),
        "stage1_psnr": round(m["psnr"], 2),
        # final-output PSNR vs the input video — quoted next to E_warp so
        # random-init stage-2 smoothing can't masquerade as deflickering
        # quality (BASELINE.md quality-claim caveat)
        "final_psnr": round(m["final_psnr"], 2)
        if m.get("final_psnr") is not None else None,
        "stage2_weights": _stage2_weights_kind(cfg),
        "stage2_unpad": "crop",
        "input_ewarp_x100": round(m["input_ewarp"] * 100, 3)
        if m.get("input_ewarp") is not None else None,
        "final_ewarp_x100": round(m["final_ewarp"] * 100, 3)
        if m.get("final_ewarp") is not None else None,
        "device": _device_str(),
        "note": "host<->device transfers ride a ~5 MB/s dev tunnel here; "
                "t_render/t_stage2 are transfer-dominated in this env",
    }})


def bench_e2e_dual(iters=None, down=4):
    """Dual-atlas (seg) e2e quality — benchmark configs 3/4 analog with the
    grabcut mask fallback (carvekit/detectron2 absent here).  Reproducible
    replacement for the round-3 ad-hoc run behind `e2e_quality_dual`."""
    import os
    import tempfile

    from deflicker_tpu.cli.main import args_to_configs, build_parser
    from deflicker_tpu.cli.pipeline import run_pipeline

    video = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
    if iters is None:
        iters = int(os.environ.get("BENCH_E2E_ITERS", 10001))
    with tempfile.TemporaryDirectory() as td:
        argv = ["--video_name", video, "--down", str(down),
                "--iters", str(iters),
                "--class_name", "anything", "--mask_provider", "grabcut",
                "--root", str(Path(td) / "data"),
                "--results_root", str(Path(td) / "results")]
        cfg, atlas_cfg = args_to_configs(build_parser().parse_args(argv))
        m = run_pipeline(cfg, atlas_cfg)
    _merge({"e2e_dual": {
        "metric": "dual_atlas_seg_end_to_end",
        "value": round(m["frames_per_sec"], 3),
        "frames": m["num_frames"], "iters": iters, "down": down,
        "t_total": round(m["t_total"], 1),
        "breakdown": {k: round(m[k], 1) for k in
                      ("t_flow", "t_pretrain", "t_fit", "t_render",
                       "t_stage2") if k in m},
        "stage1_dual_psnr": round(m["psnr"], 2),
        "final_psnr": round(m["final_psnr"], 2)
        if m.get("final_psnr") is not None else None,
        "input_ewarp_x100": round(m["input_ewarp"] * 100, 3)
        if m.get("input_ewarp") is not None else None,
        "final_ewarp_x100": round(m["final_ewarp"] * 100, 3)
        if m.get("final_ewarp") is not None else None,
        "stage2_weights": _stage2_weights_kind(cfg),
        "stage2_unpad": "crop",
        "device": _device_str(),
        "config": "Winter Scenes, --class_name anything --mask_provider "
                  f"grabcut --down {down} --iters {iters}",
    }})


# ---------------------------------------------------------------------------
# Torch reference comparator (same host, CPU)
# ---------------------------------------------------------------------------

def _torch_ref_setup(T, resy, resx, samples, device):
    """Random tensors in the reference's exact layouts
    (unwrap_utils.load_input_data_single shapes) + its models."""
    sys.path.insert(0, "/root/reference")
    import torch
    from src.models.stage_1.implicit_neural_networks import IMLP

    g = torch.Generator().manual_seed(0)
    video_frames = torch.rand((resy, resx, 3, T), generator=g)
    dx = torch.zeros_like(video_frames)
    dy = torch.zeros_like(video_frames)
    dx[:, :-1] = video_frames[:, 1:] - video_frames[:, :-1]
    dy[:-1] = video_frames[1:] - video_frames[:-1]
    flows = torch.rand((resy, resx, 2, T, 1), generator=g) * 2 - 1
    flows_r = torch.rand((resy, resx, 2, T, 1), generator=g) * 2 - 1
    fmask = (torch.rand((resy, resx, T, 1), generator=g) > 0.1).float()
    fmask_r = (torch.rand((resy, resx, T, 1), generator=g) > 0.1).float()

    mapping1 = IMLP(input_dim=3, output_dim=2, hidden_dim=256,
                    use_positional=False, num_layers=6,
                    skip_layers=[]).to(device)
    atlas = IMLP(input_dim=2, output_dim=3, hidden_dim=256,
                 use_positional=True, positional_dim=10, num_layers=8,
                 skip_layers=[4, 7]).to(device)
    opt = torch.optim.Adam([{"params": list(mapping1.parameters())},
                            {"params": list(atlas.parameters())}], lr=1e-4)
    return (video_frames, dx, dy, flows, flows_r, fmask, fmask_r, mapping1,
            atlas, opt)


def _torch_ref_step(state, T, resy, resx, samples, device):
    """One training iteration exactly as stage1_neural_atlas.py:151-231,
    calling the reference's own loss functions."""
    import torch
    from src.models.stage_1.loss_utils import (get_gradient_loss_single,
                                               get_optical_flow_loss,
                                               get_rigidity_loss)

    (video_frames, dx, dy, flows, flows_r, fmask, fmask_r, mapping1, atlas,
     opt) = state
    larger_dim = max(resx, resy)
    inds = torch.randint(resy * resx * T, (samples, 1))
    j = (inds % resx)
    i = (inds // resx) % resy
    f = inds // (resy * resx)
    jif_current = torch.stack([j, i, f])            # (3, batch, 1)
    rgb_current = video_frames[i[:, 0], j[:, 0], :, f[:, 0]].to(device)
    xyt = torch.cat((j / (larger_dim / 2) - 1, i / (larger_dim / 2) - 1,
                     f / (T / 2.0) - 1), dim=1).to(device)

    uv1 = mapping1(xyt)
    alpha = torch.ones(samples, 1).to(device)
    rgb_out = (atlas(uv1 * 0.5 + 0.5) + 1.0) * 0.5
    gradient_loss = get_gradient_loss_single(dx, dy, jif_current, mapping1,
                                             atlas, rgb_out, device, resx, T)
    rgb_loss = (torch.norm(rgb_out - rgb_current, dim=1) ** 2).mean()
    rigidity = get_rigidity_loss(jif_current, 1, larger_dim, T, mapping1,
                                 uv1, device, uv_mapping_scale=0.8)
    global_rigidity = get_rigidity_loss(jif_current, 100, larger_dim, T,
                                        mapping1, uv1, device,
                                        uv_mapping_scale=0.8)
    flow_loss = get_optical_flow_loss(jif_current, uv1, flows_r, fmask_r,
                                      larger_dim, T, mapping1, flows, fmask,
                                      0.8, device, use_alpha=True,
                                      alpha=alpha)
    loss = (1.0 * rigidity + 5.0 * global_rigidity + 5000.0 * rgb_loss
            + 500.0 * flow_loss + 1000.0 * gradient_loss)
    opt.zero_grad()
    loss.backward()
    opt.step()
    return float(loss)


def bench_torchref(T=80, resy=108, resx=192, samples=10000, n_iters=20):
    import torch

    device = torch.device("cuda" if torch.cuda.is_available() else "cpu")
    torch.manual_seed(0)
    state = _torch_ref_setup(T, resy, resx, samples, device)
    for _ in range(3):
        _torch_ref_step(state, T, resy, resx, samples, device)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        _torch_ref_step(state, T, resy, resx, samples, device)
    dt = time.perf_counter() - t0
    _merge({"torchref": {
        "metric": "torch_reference_stage1_iters_per_sec",
        "value": round(n_iters / dt, 3),
        "config": f"{T}x{resy}x{resx}, batch {samples}, single-atlas, "
                  "reference modules (IMLP + loss_utils) verbatim",
        "device": str(device),
        "torch_threads": torch.get_num_threads(),
    }})


def bench_jaxcpu(n_iters=20):
    """Our fit step on the same CPU — run as a subprocess so the forced
    'axon' platform doesn't grab the TPU."""
    import subprocess

    code = r"""
import json, time
import numpy as np
import jax
jax.config.update("jax_platforms", "cpu")
import optax
import bench as B
from deflicker_tpu.atlas.engine import (build_specs, init_models,
                                        make_loss_fn, make_scan_step,
                                        _run_chunk)
from deflicker_tpu.config import AtlasConfig
cfg = AtlasConfig()
data = B.synthetic_video_data(B.T, B.H, B.W)
specs = build_specs(cfg, dual=False)
params = init_models(jax.random.key(0), specs)
optimizer = optax.adam(cfg.learning_rate)
opt_state = optimizer.init(params)
loss_fn = make_loss_fn(specs, cfg, data, True, False)
step_fn = make_scan_step(loss_fn, optimizer, cfg.samples_batch, B.H, B.W, B.T)
carry = (params, opt_state, jax.random.key(1))
carry, aux = _run_chunk(carry, data, step_fn=step_fn, n_steps=3)
float(aux["rgb"])
t0 = time.perf_counter()
carry, aux = _run_chunk(carry, data, step_fn=step_fn, n_steps=%d)
float(aux["rgb"])
print("JAXCPU_RESULT", json.dumps({"its": %d / (time.perf_counter() - t0)}))
""" % (n_iters, n_iters)
    out = subprocess.run([sys.executable, "-c", code],
                         cwd=str(Path(__file__).parent),
                         capture_output=True, text=True, timeout=1800)
    line = [l for l in out.stdout.splitlines() if "JAXCPU_RESULT" in l]
    assert line, out.stdout + out.stderr
    its = json.loads(line[-1].split("JAXCPU_RESULT ")[1])["its"]
    _merge({"jaxcpu": {
        "metric": "our_stage1_iters_per_sec_cpu",
        "value": round(its, 3),
        "config": "same config as torchref, jax CPU backend, "
                  "fused scan step",
    }})


# ---------------------------------------------------------------------------
# correlation-lookup mode shootout (materialized vs online-XLA vs Pallas)
# ---------------------------------------------------------------------------

def bench_corr(D=256, iters=20, reps=3):
    """ms per 20-iteration lookup sequence (the GRU loop's corr cost) for
    each corr mode at three working scales:
      45x80   = 640x360 native /8 (the bundled test video)
      90x160  = 1280x720 /8
      142x250 = ~2000px long edge /8 (reference max_long_edge cap)
    Materialized is skipped where the volume exceeds ~2 GB (the auto
    threshold).  Numbers decide corr_mode='auto' routing in models/raft.py.
    """
    import jax
    import jax.numpy as jnp

    from deflicker_tpu.models.raft import (build_corr_pyramid,
                                           build_fmap_pyramid, corr_lookup,
                                           corr_lookup_online)
    from deflicker_tpu.ops.pallas.corr_kernel import (corr_lookup_pallas,
                                                      pad_fmap_pyramid)

    rng = np.random.default_rng(0)
    results = {}
    for H, W in [(45, 80), (90, 160), (142, 250)]:
        n_pix = H * W
        vol_gb = n_pix * n_pix * 4 * 1.34 / 1e9
        f1 = jnp.asarray(rng.normal(size=(1, H, W, D)).astype(np.float32))
        f2 = jnp.asarray(rng.normal(size=(1, H, W, D)).astype(np.float32))
        ys, xs = np.meshgrid(np.arange(H, dtype=np.float32),
                             np.arange(W, dtype=np.float32), indexing="ij")
        coords0 = jnp.asarray(np.stack([xs, ys], -1)[None])

        def seq(lookup_fn, coords0):
            """iters lookups with drifting coords — the GRU access pattern."""
            def step(c, _):
                corr = lookup_fn(c)
                # cheap data-dependent drift so lookups can't be CSE'd
                c = c + 0.07 * jnp.tanh(corr[..., :2])
                return c, ()
            c, _ = jax.lax.scan(step, coords0, None, length=iters)
            return c

        modes = {}

        def timed(name, make_lookup):
            fn = jax.jit(lambda f1, f2, c0: seq(make_lookup(f1, f2), c0))
            out = fn(f1, f2, coords0)
            float(out[0, 0, 0, 0])             # compile + warm
            t0 = time.perf_counter()
            for _ in range(reps):
                out = fn(f1, f2, coords0)
                float(out[0, 0, 0, 0])         # readback barrier
            modes[name] = round((time.perf_counter() - t0) / reps * 1e3, 1)

        if vol_gb < 2.0:
            timed("materialized", lambda f1, f2:
                  (lambda pyr: lambda c: corr_lookup(pyr, c))(
                      build_corr_pyramid(f1, f2)))
        timed("pallas_bf16", lambda f1, f2:
              (lambda pad: lambda c: corr_lookup_pallas(f1, pad, c))(
                  pad_fmap_pyramid(build_fmap_pyramid(f2),
                                   dtype=jnp.bfloat16)))
        timed("pallas_f32", lambda f1, f2:
              (lambda pad: lambda c: corr_lookup_pallas(f1, pad, c))(
                  pad_fmap_pyramid(build_fmap_pyramid(f2))))
        if n_pix <= 4000:                      # online-XLA is very slow; cap
            timed("online_xla", lambda f1, f2:
                  (lambda pyr: lambda c: corr_lookup_online(f1, pyr, c))(
                      build_fmap_pyramid(f2)))
        results[f"{H}x{W}"] = {"volume_gb": round(vol_gb, 2),
                               "ms_per_20_lookups": modes}
        print(f"{H}x{W}: {modes}")
    _merge({"corr": {
        "metric": "corr_lookup_ms_per_20iter_sequence",
        "config": f"D={D}, B=1, radius 4, 4 levels",
        "results": results,
        "device": _device_str(),
    }})


# ---------------------------------------------------------------------------
# full-scale hardening (VERDICT item 5): full-res fit + mid-run resume +
# 100k-config boundary smoke
# ---------------------------------------------------------------------------

def bench_hardening():
    """(a) full-res (down 1 = 640x360) 10k-iteration single-atlas fit on the
    real test video, interrupted at 5000 iterations, checkpointed, resumed
    from the checkpoint, and rendered — the reference's heavy path
    (README.md:111) exercised end to end on TPU.  (b) a 100k-config smoke
    (iters_num=100001 truncated to 12001) crossing the stop_global_rigidity
    boundary and a 10000-iteration eval point, validating the chunked
    schedule logic at reference-heavy settings."""
    import dataclasses
    import tempfile

    import jax
    import optax

    import bench as B
    from deflicker_tpu.atlas.engine import (build_specs, fit_atlas,
                                            init_models, pretrain_mapping)
    from deflicker_tpu.atlas.render import evaluate_and_save
    from deflicker_tpu.config import AtlasConfig
    from deflicker_tpu.utils.checkpoint import load_checkpoint, save_checkpoint

    T, H, W = 80, 360, 640                      # down=1 for the test video
    data = B.real_video_data(T, H, W)
    assert data is not None, "test video missing"
    cfg = AtlasConfig()                          # 10001 iters, eval @ 10000
    specs = build_specs(cfg, dual=False)
    key = jax.random.key(0)
    params = init_models(key, specs)
    params["mapping1"] = pretrain_mapping(
        params["mapping1"], specs.mapping1, jax.random.key(1), T, H, W,
        cfg.uv_mapping_scale, cfg.pretrain_iter_number)

    with tempfile.TemporaryDirectory() as td:
        out_dir = Path(td)
        # ---- phase 1: fit to 5000, checkpoint (simulated interruption)
        half_cfg = dataclasses.replace(cfg, iters_num=5001)
        t0 = time.perf_counter()
        r1 = fit_atlas(params, specs, data, half_cfg, jax.random.key(2))
        t_half = time.perf_counter() - t0
        ck = save_checkpoint(out_dir / "checkpoint", {
            "params": r1.params, "opt_state": r1.opt_state,
            "iteration": r1.iteration})

        # ---- phase 2: resume from the checkpoint to 10000 + final render
        st = load_checkpoint(ck)
        t0 = time.perf_counter()
        r2 = fit_atlas(st["params"], specs, data, cfg, jax.random.key(3),
                       start_iteration=int(st["iteration"]),
                       opt_state=st["opt_state"])
        t_second = time.perf_counter() - t0
        t0 = time.perf_counter()
        _, psnr = evaluate_and_save(r2.params, specs, data, cfg, out_dir,
                                    r2.iteration - 1, r2.opt_state)
        t_render = time.perf_counter() - t0

    full_its = 10000 / (t_half + t_second)
    _merge({"hardening_fullres": {
        "metric": "fullres_fit_iters_per_sec",
        "value": round(full_its, 1),
        "config": f"{T}x{H}x{W} (down 1), 10k iters total, mid-run "
                  "checkpoint+resume at 5000, single-atlas, real video",
        "t_first_5k": round(t_half, 1), "t_resumed_5k": round(t_second, 1),
        "t_render": round(t_render, 1),
        "stage1_psnr_fullres": round(float(psnr), 2),
        "device": _device_str(),
    }})

    # ---- (b) 100k-config smoke: heavy schedule truncated after the
    # boundary + eval point (boundary at 5001, eval at 10000)
    T2, H2, W2 = 80, 108, 192
    data2 = B.real_video_data(T2, H2, W2)
    cfg2 = dataclasses.replace(cfg, iters_num=12001)
    evals = []
    specs2 = build_specs(cfg2, dual=False)
    params2 = init_models(jax.random.key(4), specs2)
    t0 = time.perf_counter()
    r = fit_atlas(params2, specs2, data2, cfg2, jax.random.key(5),
                  eval_callback=lambda i, p, o: evals.append(i))
    dt = time.perf_counter() - t0
    _merge({"hardening_100k_smoke": {
        "metric": "heavy_schedule_smoke",
        "iters_run": r.iteration, "t_total": round(dt, 1),
        "its": round(r.iteration / dt, 1),
        "eval_fired_at": evals,
        "config": "100k-style schedule truncated at 12001: crosses "
                  "stop_global_rigidity=5000 boundary + 10000 eval point",
        "device": _device_str(),
    }})


# ---------------------------------------------------------------------------
# batch multi-video throughput (BASELINE.md benchmark config 5)
# ---------------------------------------------------------------------------

def bench_batch(n_clips=3, iters=None, parallel=False):
    """Split the bundled test video into `n_clips` equal-length clips and
    run them through `cli.batch` — aggregate frames/s for the multi-video
    path.  Equal clip lengths keep one set of XLA shapes (one compile,
    amortized over the batch), which is the batching contract the CLI
    documents.  With `parallel=True` the clips' fits run SIMULTANEOUSLY in
    one vmapped program (`--parallel_fit`, atlas/multifit.py)."""
    import os
    import tempfile

    import cv2

    from deflicker_tpu.cli.batch import main as batch_main

    if iters is None:
        iters = int(os.environ.get("BENCH_BATCH_ITERS", 10001))
    src = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
    cap = cv2.VideoCapture(src)
    fps = cap.get(cv2.CAP_PROP_FPS)
    frames = []
    while True:
        ok, f = cap.read()
        if not ok:
            break
        frames.append(f)
    cap.release()
    per = len(frames) // n_clips

    with tempfile.TemporaryDirectory() as td:
        vids = []
        for c in range(n_clips):
            p = str(Path(td) / f"clip{c}.mp4")
            wr = cv2.VideoWriter(p, cv2.VideoWriter_fourcc(*"mp4v"), fps,
                                 (frames[0].shape[1], frames[0].shape[0]))
            for f in frames[c * per:(c + 1) * per]:
                wr.write(f)
            wr.release()
            vids.append(p)

        t0 = time.perf_counter()
        flags = ["--parallel_fit"] if parallel else []
        rc = batch_main(["--videos", *vids, "--down", "4",
                         "--iters", str(iters), *flags,
                         "--root", str(Path(td) / "data"),
                         "--results_root", str(Path(td) / "results")])
        dt = time.perf_counter() - t0
        assert rc == 0
        n_out = sum(
            len(list((Path(td) / "results" / f"clip{c}" / "final" /
                      "output").glob("*.png"))) for c in range(n_clips))
    key = "batch_parallel" if parallel else "batch"
    note = ("parallel_fit: all clips fit in ONE vmapped program "
            "(video-axis sharding over a mesh when devices allow)"
            if parallel else
            "sequential per-host batch; multi-host fans videos out "
            "over DCN with the same per-video code path")
    _merge({key: {
        "metric": "batch_aggregate_frames_per_sec",
        "value": round(n_out / dt, 3),
        "clips": n_clips, "frames_total": n_out, "iters_per_clip": iters,
        "t_total": round(dt, 1),
        "device": _device_str(),
        "note": note,
    }})


def bench_trained_stage2(n_clips=8, T=12, H=128, W=128,
                         weights_dir="pretrained_weights", dist="legacy"):
    """Quality of the in-framework-trained stage-2 networks on HELD-OUT
    synthetic clips (train/synth.py keys disjoint from the training stream):
    PSNR to the clean ground truth and exact-flow temporal error for the
    flickered input, the UNet output, and the refined output — trained
    weights vs the random-init fallback.  The honest "does training work"
    artifact (real-video quality additionally measured by `e2e` once the
    trained checkpoints are in place).

    dist: "legacy" (default) = the affine/iid distribution the shipped
    weights train on; "layered" = the harder fold (fg layer p=0.5, AR(1)
    flicker) from the round-3 distribution study."""
    import jax
    import jax.numpy as jnp

    from deflicker_tpu.filter.engine import (filter_frames, load_filter_engine,
                                             refine_sequence)
    from deflicker_tpu.metrics import psnr
    from deflicker_tpu.ops.sampling import flow_warp
    from deflicker_tpu.train.synth import make_clip

    wdir = Path(weights_dir)
    kw = ({"p_layer": 0.5, "corr_flicker": True} if dist == "layered"
          else {})                       # defaults ARE the legacy dist

    def temporal_err(x, clip):                      # x: (T,H,W,3) f32
        errs = []
        for t in range(1, x.shape[0]):
            w = flow_warp(x[t - 1], clip.flow_bw[t])
            m = clip.valid[t]
            errs.append(float((jnp.abs(x[t] - w) * m).sum() / (m.sum() * 3)))
        return float(np.mean(errs))

    def run(engine_kind):
        if engine_kind == "trained":
            eng = load_filter_engine(wdir / "neural_filter.ckpt",
                                     wdir / "local_refinement_net.ckpt")
        else:
            eng = load_filter_engine(None, None)    # random fallback
        rows = []
        for c in range(n_clips):
            clip = jax.jit(lambda k: make_clip(k, T, H, W, **kw))(
                jax.random.key(10_000 + c))         # held-out fold
            P = filter_frames(eng.filter_variables, clip.inp, clip.atlas)
            O = refine_sequence(eng.local_variables, P)
            O = jnp.clip(O, 0.0, 1.0)
            rows.append({
                "psnr_input": float(psnr(np.asarray(clip.inp),
                                         np.asarray(clip.clean))),
                "psnr_filtered": float(psnr(np.asarray(jnp.clip(P, 0, 1)),
                                            np.asarray(clip.clean))),
                "psnr_refined": float(psnr(np.asarray(O),
                                           np.asarray(clip.clean))),
                "temp_input": temporal_err(clip.inp, clip),
                "temp_refined": temporal_err(O, clip),
                "temp_clean": temporal_err(clip.clean, clip),
            })
        return {k: round(float(np.mean([r[k] for r in rows])), 4)
                for k in rows[0]}

    out = {"heldout_clips": n_clips, "shape": f"{T}x{H}x{W}", "dist": dist,
           "device": _device_str()}
    if (wdir / "neural_filter.ckpt").exists():
        out["trained"] = run("trained")
    out["random_init"] = run("random")
    print(json.dumps(out, indent=2))
    _merge({"trained_stage2": out})
    return out


def bench_config2(iters=100001):
    """BASELINE.json benchmark config 2, run to completion: image-folder
    input, FULL resolution (down 1), the reference's heavy 100k-iteration
    schedule (README.md:111), end to end through stage 2 with the shipped
    weights (VERDICT round-3 missing #2 — only a truncated 12k smoke was
    ever recorded)."""
    import tempfile

    from deflicker_tpu.api import Deflickerer
    from deflicker_tpu.io.media import video_to_frames

    video = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
    with tempfile.TemporaryDirectory() as td:
        root, rroot = Path(td) / "data", Path(td) / "results"
        frames = root / "config2_fullres"
        video_to_frames(video, frames, fps=10)     # image-folder input
        d = Deflickerer(root=str(root), results_root=str(rroot))
        t0 = time.perf_counter()
        m = d.process(frame_folder=str(frames), down=1, iters=iters)
        wall = time.perf_counter() - t0
        out = {
            "metric": "config2_fullres_100k_frames_per_sec",
            "value": round(m["num_frames"] / wall, 3),
            "iters": iters, "down": 1, "input": "image folder",
            "frames": m["num_frames"],
            "t_total": round(wall, 1),
            "breakdown": {k: round(m[k], 1) for k in
                          ("t_flow", "t_pretrain", "t_fit", "t_render",
                           "t_stage2") if k in m},
            "fit_iters_per_sec": round(m["iters_per_sec"], 1),
            "stage1_psnr": round(m["psnr"], 2),
            "final_psnr": round(m["final_psnr"], 2)
            if m.get("final_psnr") is not None else None,
            "input_ewarp_x100": round(m["input_ewarp"] * 100, 3)
            if m.get("input_ewarp") is not None else None,
            "final_ewarp_x100": round(m["final_ewarp"] * 100, 3)
            if m.get("final_ewarp") is not None else None,
            "stage2_weights": _stage2_weights_kind(d._pipe_cfg()),
            "device": _device_str(),
        }
    print(json.dumps(out, indent=2))
    _merge({"config2_fullres_100k": out})
    return out


def bench_warm(iters=None, repeats=3, down=4):
    """Warm-process e2e: N same-shape videos through ONE `api.Deflickerer`
    (the cli.serve daemon path) — the e2e number that is NOT
    compile-dominated (VERDICT round-3 weak #2: every fresh process repays
    the remote TPU compile because axon programs miss the persistent
    cache; a warm process pays it once).

    Run 1 absorbs every compile; runs 2..N measure the steady warm cost of
    a NEW video of the same shape (fresh frames, fresh flow, fresh fit —
    only the XLA executables and network weights are reused).
    """
    import os
    import shutil
    import tempfile

    from deflicker_tpu.api import Deflickerer
    from deflicker_tpu.io.media import video_to_frames

    video = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
    iters = (int(os.environ.get("BENCH_E2E_ITERS", 10001))
             if iters is None else iters)
    with tempfile.TemporaryDirectory() as td:
        root, rroot = Path(td) / "data", Path(td) / "results"
        raw = root / "warm_r0"
        video_to_frames(video, raw, fps=10)
        for r in range(1, repeats):
            shutil.copytree(raw, root / f"warm_r{r}")
        d = Deflickerer(root=str(root), results_root=str(rroot))
        runs = []
        for r in range(repeats):
            t0 = time.perf_counter()
            m = d.process(frame_folder=str(root / f"warm_r{r}"),
                          down=down, iters=iters)
            wall = time.perf_counter() - t0
            runs.append({
                "wall_s": round(wall, 1),
                "frames_per_sec": round(m["num_frames"] / wall, 3),
                "breakdown": {k: round(m[k], 1) for k in
                              ("t_flow", "t_pretrain", "t_fit", "t_render",
                               "t_stage2") if k in m},
                "fit_iters_per_sec": round(m["iters_per_sec"], 1),
                "stage1_psnr": round(m["psnr"], 2),
            })
            print(json.dumps({f"run_{r}": runs[-1]}), flush=True)
        warm = runs[1:] or runs
        out = {
            "metric": "warm_process_e2e_frames_per_sec",
            "value": round(float(np.mean([r["frames_per_sec"]
                                          for r in warm])), 3),
            "first_run_wall_s": runs[0]["wall_s"],
            "warm_run_wall_s": [r["wall_s"] for r in warm],
            "runs": runs,
            "iters": iters, "down": down,
            "stage2_weights": _stage2_weights_kind(d._pipe_cfg()),
            "device": _device_str(),
            "note": "each repeat is a fresh copy of the same frames: new "
                    "flow + new fit, reusing only weights and XLA "
                    "executables (the cli.serve daemon path)",
        }
    print(json.dumps(out, indent=2))
    _merge({"warm": out})
    return out


def bench_cacheprobe():
    """Bounded investigation of WHY axon (TPU) executables miss the
    persistent XLA compile cache (VERDICT round-3 weak #2b).

    Three probes, results recorded verbatim:
      1. cache-dir entry count before/after compiling a fresh trivial
         program on the TPU backend (with min-compile-time/entry-size
         floors dropped and cache-miss explanations logged);
      2. the same on the CPU backend (the control that DOES persist);
      3. an AOT `jax.experimental.serialize_executable` attempt on the TPU
         executable — if the PJRT plugin cannot serialize executables, the
         persistent cache cannot store them, and that is the root cause.
    """
    import io
    import logging
    import os

    import deflicker_tpu  # noqa: F401  (points jax at the persistent cache)
    import jax
    import jax.numpy as jnp

    out = {"device": _device_str()}
    cache_dir = os.path.expanduser("~/.cache/deflicker_tpu/xla")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    try:
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass
    jax.config.update("jax_explain_cache_misses", True)

    log_buf = io.StringIO()
    handler = logging.StreamHandler(log_buf)
    handler.setLevel(logging.DEBUG)
    loggers = [logging.getLogger(n) for n in
               ("jax._src.compilation_cache", "jax._src.compiler")]
    for lg in loggers:
        lg.setLevel(logging.DEBUG)
        lg.addHandler(handler)

    def entries():
        try:
            return sum(1 for _ in Path(cache_dir).rglob("*") if _.is_file())
        except OSError:
            return -1

    import secrets
    salt = float(int(secrets.token_hex(3), 16))  # fresh HLO every probe run

    for backend in ("tpu", "cpu"):
        try:
            devs = jax.devices(backend)
        except RuntimeError as e:
            out[backend] = {"skipped": str(e)[:120]}
            continue
        n0 = entries()
        x = jax.device_put(jnp.ones((256, 256)), devs[0])

        def fn(a):
            return (a @ a + salt).sum()

        t0 = time.perf_counter()
        lowered = jax.jit(fn).lower(x)
        compiled = lowered.compile()
        float(compiled(x))
        rec = {"entries_before": n0, "entries_after": entries(),
               "compile_wall_s": round(time.perf_counter() - t0, 2),
               "persisted": entries() > n0}
        try:
            from jax.experimental import serialize_executable

            blob, *_ = serialize_executable.serialize(compiled)
            rec["aot_serialize"] = f"ok, {len(blob)} bytes"
        except Exception as e:
            rec["aot_serialize"] = f"FAILED: {type(e).__name__}: {str(e)[:200]}"
        out[backend] = rec

    for lg in loggers:
        lg.removeHandler(lg.handlers[-1] if lg.handlers else handler)
    log = log_buf.getvalue()
    # keep the distinctive lines (miss explanations / not-cacheable notices)
    keep = [ln for ln in log.splitlines()
            if any(s in ln.lower() for s in
                   ("cache", "serializ", "persist", "miss"))][:40]
    out["cache_log_excerpt"] = keep
    print(json.dumps(out, indent=2))
    _merge({"cacheprobe": out})
    return out


_CACHEPROBE_CHILD = r'''
import io, json, logging, sys, time
import deflicker_tpu                    # points jax at the persistent cache
import jax, jax.numpy as jnp

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
buf = io.StringIO(); h = logging.StreamHandler(buf); h.setLevel(logging.DEBUG)
for n in ("jax._src.compilation_cache", "jax._src.compiler"):
    lg = logging.getLogger(n); lg.setLevel(logging.DEBUG); lg.addHandler(h)

x = jax.device_put(jnp.ones((512, 512), jnp.bfloat16), jax.devices("tpu")[0])

def fn(a):                               # FIXED program: identical HLO per run
    def body(c, _):
        return jnp.tanh(c @ c), None
    c, _ = jax.lax.scan(body, a, None, length=8)
    return c.astype(jnp.float32).sum()

t0 = time.perf_counter()
v = float(jax.jit(fn)(x))
wall = time.perf_counter() - t0
log = buf.getvalue()
keys = [ln.split("key '")[1].rstrip("'")
        for ln in log.splitlines() if "key 'jit_fn-" in ln]
print(json.dumps({
    "wall_s": round(wall, 2),
    "hit": "cache hit for 'jit_fn'" in log.lower()
           or ("jit_fn" in log and "MISS for 'jit_fn'" not in log),
    "miss": "MISS for 'jit_fn'" in log,
    "wrote": "Writing jit_fn" in log,
    "key": keys[0] if keys else None}))
'''


def bench_cacheprobe2():
    """Phase 2 of the cache investigation: a FIXED program compiled by two
    fresh subprocesses on the TPU backend.  If the second process hits the
    persistent cache (same key, no MISS, fast), cross-process caching of
    axon executables WORKS and round 3's 'axon never persists' note was an
    artifact of the probe (e.g. the 1.0 s min-compile-time floor, or a
    cache left uninitialized); if the keys differ between the two runs,
    the axon backend salts the cache key per process and THAT is the root
    cause of the compile-dominated e2e walls."""
    import subprocess
    import sys

    runs = []
    for i in range(2):
        p = subprocess.run([sys.executable, "-c", _CACHEPROBE_CHILD],
                           capture_output=True, text=True, timeout=1800,
                           cwd=str(Path(__file__).parent))
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("{")]
        runs.append(json.loads(line[-1]) if line else
                    {"error": (p.stdout + p.stderr)[-500:]})
        print(json.dumps({f"proc_{i}": runs[-1]}), flush=True)
    out = {"runs": runs, "device": _device_str()}
    if all("key" in r for r in runs):
        out["same_key"] = runs[0]["key"] == runs[1]["key"]
        out["second_process_hit"] = bool(runs[1].get("hit")
                                         and not runs[1].get("miss"))
    print(json.dumps(out, indent=2))
    _merge({"cacheprobe2": out})
    return out


_CACHEPROBE3_CHILD = r'''
import hashlib, io, json, logging, os, time
import deflicker_tpu                    # points jax at the persistent cache
import jax, optax

jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_explain_cache_misses", True)
buf = io.StringIO(); h = logging.StreamHandler(buf); h.setLevel(logging.DEBUG)
for n in ("jax._src.compilation_cache", "jax._src.compiler"):
    lg = logging.getLogger(n); lg.setLevel(logging.DEBUG); lg.addHandler(h)

from bench import T, H, W, synthetic_video_data
from deflicker_tpu.atlas.engine import (_run_chunk, build_specs, init_models,
                                        make_loss_fn, make_scan_step)
from deflicker_tpu.config import AtlasConfig

cfg = AtlasConfig()
specs = build_specs(cfg, dual=False)
data = synthetic_video_data(T, H, W).with_packed()
params = init_models(jax.random.key(0), specs)
optimizer = optax.adam(cfg.learning_rate)
loss_fn = make_loss_fn(specs, cfg, data, True, False)
step = make_scan_step(loss_fn, optimizer, cfg.samples_batch, H, W, T)
carry = (params, optimizer.init(params), jax.random.key(1))
lowered = _run_chunk.lower(carry, data.fit_view(), step_fn=step, n_steps=250)
txt = lowered.as_text()
rec = {"hlo_sha": hashlib.sha256(txt.encode()).hexdigest(),
       "hlo_bytes": len(txt),
       "hashseed": os.environ.get("PYTHONHASHSEED", "unset")}
if os.environ.get("CP3_DUMP"):
    open(os.environ["CP3_DUMP"], "w").write(txt)
if os.environ.get("CP3_COMPILE") == "1":
    t0 = time.perf_counter()
    compiled = lowered.compile()
    rec["compile_wall_s"] = round(time.perf_counter() - t0, 2)
    log = buf.getvalue()
    name = "jit__run_chunk"
    keys = [ln.split("key '")[1].rstrip("'") for ln in log.splitlines()
            if f"key '{name}-" in ln]
    low = log.lower()
    rec["miss"] = f"MISS for '{name}'" in log
    rec["wrote"] = f"Writing {name}" in log
    rec["hit"] = bool(f"cache hit for '{name}'" in low
                      or (keys and not rec["miss"]))
    rec["key"] = keys[0] if keys else None
    rec["log_chunk_lines"] = [ln for ln in log.splitlines()
                              if name in ln][:12]
print("CP3" + json.dumps(rec))
'''


def bench_cacheprobe3():
    """Phase 3 of the cache investigation: the PRODUCTION fit program.

    cacheprobe2 proved a fixed trivial scan persists cross-process on the
    axon backend, yet the e2e fit chunk (`_run_chunk` over `make_scan_step`)
    still repays its ~300-450 s remote compile in every fresh process
    (BENCH_E2E cacheprobe commit notes).  Two sub-probes isolate where the
    fit program diverges:

      A (cheap, no compile): two fresh subprocesses with DIFFERENT
        PYTHONHASHSEED values lower the bench-config fit chunk and hash the
        StableHLO text.  Differing hashes = the program itself is
        process-dependent (hash-ordering leaking into tracing) — the diff
        names the culprit; equal hashes = HLO is stable, move to B.
      B (CP3_PHASE_B=1, two remote compiles ~5-10 min each): the same
        child with CP3_COMPILE=1 on the real TPU backend, cache-miss
        logging on — records per-process cache key, hit/miss/write flags
        and the write log lines (a failed write of a large serialized
        executable would show here).
    """
    import os
    import subprocess
    import sys

    out = {"device": _device_str()}

    runs_a = []
    for i, seed in enumerate(("0", "1234567")):
        env = dict(os.environ, PYTHONHASHSEED=seed,
                   CP3_DUMP=f"/tmp/cp3_hlo_{i}.txt")
        p = subprocess.run([sys.executable, "-c", _CACHEPROBE3_CHILD],
                           capture_output=True, text=True, timeout=3600,
                           cwd=str(Path(__file__).parent), env=env)
        line = [ln for ln in p.stdout.splitlines() if ln.startswith("CP3")]
        runs_a.append(json.loads(line[-1][3:]) if line else
                      {"error": (p.stdout + p.stderr)[-500:]})
        print(json.dumps({f"lower_{i}": runs_a[-1]}), flush=True)
    out["lowering"] = runs_a
    if all("hlo_sha" in r for r in runs_a):
        out["hlo_stable_across_processes"] = (
            runs_a[0]["hlo_sha"] == runs_a[1]["hlo_sha"])
        if not out["hlo_stable_across_processes"]:
            # name the first diverging line so the culprit is recorded
            a = open("/tmp/cp3_hlo_0.txt").read().splitlines()
            b = open("/tmp/cp3_hlo_1.txt").read().splitlines()
            for j, (x, y) in enumerate(zip(a, b)):
                if x != y:
                    out["first_diff"] = {"line": j, "a": x[:200], "b": y[:200]}
                    break
            else:                       # one text is a prefix of the other
                out["first_diff"] = {"length_mismatch":
                                     {"a_lines": len(a), "b_lines": len(b)}}

    if os.environ.get("CP3_PHASE_B") == "1":
        runs_b = []
        for i in range(2):
            env = dict(os.environ, CP3_COMPILE="1")
            env.pop("CP3_DUMP", None)
            p = subprocess.run([sys.executable, "-c", _CACHEPROBE3_CHILD],
                               capture_output=True, text=True, timeout=3600,
                               cwd=str(Path(__file__).parent), env=env)
            line = [ln for ln in p.stdout.splitlines()
                    if ln.startswith("CP3")]
            runs_b.append(json.loads(line[-1][3:]) if line else
                          {"error": (p.stdout + p.stderr)[-500:]})
            print(json.dumps({f"compile_{i}": runs_b[-1]}), flush=True)
        out["compiles"] = runs_b
        if all("key" in r for r in runs_b):
            out["same_key"] = runs_b[0]["key"] == runs_b[1]["key"]
            out["second_process_hit"] = bool(runs_b[1].get("hit")
                                             and not runs_b[1].get("miss"))
    print(json.dumps(out, indent=2))
    _merge({"cacheprobe3": out})
    return out


def bench_gt_real(iters=None):
    """Ground-truth deflickering quality on REAL texture.

    The only real benchmark video has no clean reference, so real-footage
    quality claims were E_warp-only (no PSNR-to-clean; BASELINE.md).  This
    bench constructs a clean reference from the video itself:

      1. run stage 1 on the real video (config 1) and adopt its atlas
         render -- temporally consistent REAL texture by construction --
         as the CLEAN video;
      2. inject KNOWN flicker: iid global gain (the legacy training
         distribution), AR(1) drifting exposure, and a spatially-smooth
         LOCAL gain field (the paper's local-flicker case);
      3. run the FULL pipeline on each flickered video in the same warm
         process (identical shapes -> the fit compiles once);
      4. report PSNR(final, clean) vs PSNR(input, clean), plus the usual
         E_warp pair.

    This is the measurement CLAUDE.md says would discriminate the shipped
    iid/affine stage-2 weights from the broader-distribution variants:
    the drift/local folds are real-texture footage whose flicker is NOT
    iid-global.

    CAVEAT (recorded in the output as clean_is_in_model_family): the clean
    reference is itself a stage-1 atlas render, i.e. a video inside the
    atlas model's representable family, so the absolute fold PSNRs are
    upward-biased — quote them only as RELATIVE comparisons between
    stage-2 weight sets, never as real-footage reconstruction quality.
    """
    import os
    import tempfile

    import cv2

    from deflicker_tpu.api import Deflickerer
    from deflicker_tpu.io.media import (list_frames, read_image,
                                        video_to_frames, write_image)

    video = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
    iters = (int(os.environ.get("BENCH_E2E_ITERS", 10001))
             if iters is None else iters)

    def load_dir(d):
        return np.stack([read_image(p) for p in list_frames(d)])

    def psnr_to(a, b):
        mse = float(np.mean((a.astype(np.float64) - b) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    # one fixed seed PER FOLD: fold realizations are independent of fold
    # ordering, so recorded numbers stay comparable across revisions even
    # if folds are added/reordered (advisor finding, round 3)
    FOLD_SEEDS = {"iid": 101, "drift": 202, "local": 303, "occlude": 404}

    def drift_gain(rng, T):
        rho, std = 0.95, 0.15
        a = np.zeros(T)
        eps = rng.normal(0.0, std * np.sqrt(1 - rho**2), size=T)
        for t in range(1, T):
            a[t] = rho * a[t - 1] + eps[t]
        return np.clip(1.0 + a, 0.6, 1.4).reshape(T, 1, 1, 1)

    def composite_occluder(clean, rng):
        """Moving real-texture occluder: a crop of the clean video pasted
        back on its own smooth trajectory with a soft-ellipse matte — the
        result has layered/non-affine flow with REAL occlusion regions
        (the structure Winter Scenes' global pan lacks; exactly the case
        BASELINE.md's distribution study said would discriminate weights)."""
        T, H, W = clean.shape[:3]
        ph, pw = H // 3, W // 3
        patch = clean[0, H // 4:H // 4 + ph, W // 4:W // 4 + pw].copy()
        yy, xx = np.mgrid[0:ph, 0:pw]
        e = (((yy - ph / 2) / (ph / 2)) ** 2
             + ((xx - pw / 2) / (pw / 2)) ** 2)
        matte = np.clip((1.0 - e) * 3.0, 0.0, 1.0)[..., None]
        # smooth Lissajous-ish trajectory inside the frame
        phase = rng.uniform(0, 2 * np.pi, 2)
        out = clean.copy()
        for t in range(T):
            cy = int((H - ph) * (0.5 + 0.35 * np.sin(
                2 * np.pi * t / T + phase[0])))
            cx = int((W - pw) * (0.5 + 0.35 * np.sin(
                4 * np.pi * t / T + phase[1])))
            roi = out[t, cy:cy + ph, cx:cx + pw]
            roi[:] = matte * patch + (1 - matte) * roi
        return out

    def make_fold(clean, kind):
        """Returns (flickered_input, clean_reference) for one fold —
        the clean reference differs for 'occlude' (it contains the
        occluder, so PSNR-to-clean measures deflickering only)."""
        T, H, W = clean.shape[:3]
        rng = np.random.default_rng(FOLD_SEEDS[kind])
        ref = clean
        if kind == "iid":
            g = rng.uniform(0.7, 1.3, size=(T, 1, 1, 1))
        elif kind == "drift":                  # AR(1) exposure drift
            g = drift_gain(rng, T)
        elif kind == "local":                  # smooth spatial gain field
            low = rng.uniform(0.75, 1.25, size=(T, 6, 8)).astype(np.float32)
            g = np.stack([cv2.resize(f, (W, H), interpolation=cv2.INTER_CUBIC)
                          for f in low])[..., None]
        elif kind == "occlude":                # moving occluder + AR(1)
            ref = composite_occluder(clean, rng)
            g = drift_gain(rng, T)
        else:
            raise ValueError(kind)
        return np.clip(ref * g, 0.0, 1.0).astype(np.float32), ref

    with tempfile.TemporaryDirectory() as td:
        root, rroot = Path(td) / "data", Path(td) / "results"
        # Pre-downscale the decoded frames to the config-1 working
        # resolution (full res / 4) and run EVERY pipeline below at
        # down=1: clean-gen and all three folds then share every tensor
        # shape, so RAFT / fit / stage-2 each pay exactly one remote
        # compile in this warm process.
        raw = Path(td) / "raw"
        video_to_frames(video, raw, fps=10)
        src = root / "gt_clean_src"
        for p in list_frames(raw):
            f = read_image(p)
            h, w = f.shape[0] // 4, f.shape[1] // 4
            write_image(cv2.resize(f, (w, h), interpolation=cv2.INTER_AREA),
                        src / p.name)
        d = Deflickerer(root=str(root), results_root=str(rroot))
        m0 = d.process(frame_folder=str(src), down=1, iters=iters)
        clean_dir = rroot / src.name / "stage_1" / "output"
        clean = load_dir(clean_dir)
        out = {"iters": iters, "frames": int(clean.shape[0]),
               "shape": "x".join(str(s) for s in clean.shape[1:3]),
               "clean_source": "stage-1 atlas render of the real video "
                               "(temporally consistent by construction)",
               # the clean video is INSIDE the atlas model's representable
               # family, so psnr_stage1/psnr_final are upward-biased
               # (stage 1 can near-perfectly re-fit its own render): treat
               # fold PSNRs as RELATIVE comparisons between weight sets,
               # not absolute real-footage reconstruction quality
               "clean_is_in_model_family": True,
               "stage2_weights": _stage2_weights_kind(d._pipe_cfg()),
               "stage2_unpad": "crop",
               "cleangen_t_total": round(m0["t_total"], 1),
               "device": _device_str(), "folds": {}}
        # additional stage-2 weight sets (dirs holding neural_filter.ckpt +
        # local_refinement_net.ckpt), e.g. the breadth-trained variants:
        #   BENCH_GT_WEIGHTS="breadth=/path/to/dir,other=/path2"
        # Stage 1 runs ONCE per fold; each extra set re-runs only stage 2
        # on the same stage-1 output (same shapes -> zero extra compiles).
        weight_sets = {}
        for spec_str in filter(None, os.environ.get(
                "BENCH_GT_WEIGHTS", "").split(",")):
            name, _, wdir = spec_str.partition("=")
            weight_sets[name.strip()] = Path(wdir.strip())
        out["weight_sets"] = {"shipped": _stage2_weights_kind(d._pipe_cfg()),
                              **{k: str(v) for k, v in weight_sets.items()}}

        import jax.numpy as jnp

        from deflicker_tpu.cli.evaluate import compute_video_metrics
        from deflicker_tpu.cli.pipeline import run_stage2
        from deflicker_tpu.filter import load_filter_engine

        engines = {
            name: load_filter_engine(wdir / "neural_filter.pth",
                                     wdir / "local_refinement_net.pth",
                                     dtype=jnp.bfloat16)
            for name, wdir in weight_sets.items()}

        for kind in ("iid", "drift", "local", "occlude"):
            fd = root / f"gt_{kind}"
            flickered, clean_ref = make_fold(clean, kind)
            for t, frame in enumerate(flickered):
                write_image(frame, fd / f"{t:05d}.png")
            m = d.process(frame_folder=str(fd), down=1, iters=iters)
            final = load_dir(m["final_dir"])
            s1 = load_dir(rroot / fd.name / "stage_1" / "output")
            flickered = load_dir(fd)           # as quantized on disk
            rec = {
                "psnr_input": round(psnr_to(flickered, clean_ref), 2),
                "psnr_stage1": round(psnr_to(s1, clean_ref), 2),
                "psnr_final": round(psnr_to(final, clean_ref), 2),
                "input_ewarp_x100": round(m["input_ewarp"] * 100, 3)
                if m.get("input_ewarp") is not None else None,
                "final_ewarp_x100": round(m["final_ewarp"] * 100, 3)
                if m.get("final_ewarp") is not None else None,
                "t_total": round(m["t_total"], 1),
            }
            for name, engine in engines.items():
                alt_root = rroot / f"ws_{name}"
                cfg2 = d._pipe_cfg(video_frame_folder=str(fd))
                run_stage2(fd, cfg2, results_root=alt_root,
                           style_dir=rroot / fd.name / "stage_1" / "output",
                           engine=engine)
                alt_final_dir = alt_root / fd.name / "final" / "output"
                mm = compute_video_metrics(fd, alt_final_dir)
                rec[f"psnr_final_{name}"] = round(
                    psnr_to(load_dir(alt_final_dir), clean_ref), 2)
                if mm.get("ewarp_mean") is not None:
                    rec[f"final_ewarp_x100_{name}"] = round(
                        mm["ewarp_mean"] * 100, 3)
            out["folds"][kind] = rec
            print(json.dumps({kind: rec}), flush=True)
    _merge({"gt_real": out})
    return out


def bench_gt_diag(iters=None):
    """Attribute the stage-2 fidelity ceiling seen in gt_real.

    gt_real found final PSNR-to-clean pinned at ~18.6-19.0 dB for EVERY
    fold x EVERY stage-2 weight set while the folds' stage-1 renders sit
    at 23.7-32.0 dB — a weight-independent cap.  This diagnostic re-runs
    ONE fold (iid, same seed) keeping all intermediate outputs, and
    splits the loss three ways:

      per-stage:  PSNR(stage1), PSNR(filtered), PSNR(final) vs clean —
                  does the UNet filter or the ConvLSTM refiner lose it?
      per-frame:  PSNR(final)[t] — a decay with t means the recurrence
                  drifts past its clip_len=6 training horizon.
      tone-split: PSNR after per-frame scalar gain+bias correction —
                  if corrected >> raw, the cap is a global tone/exposure
                  shift (the filter re-exposing toward its training
                  statistics), not lost texture detail.

    Results land in BENCH_E2E.json gt_diag; outputs persist under
    BENCH_DIAG_DIR (default /tmp/gtdiag) for visual inspection.
    """
    import os
    import shutil

    import cv2

    from deflicker_tpu.api import Deflickerer
    from deflicker_tpu.io.media import (list_frames, read_image,
                                        video_to_frames, write_image)

    video = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
    iters = (int(os.environ.get("BENCH_E2E_ITERS", 10001))
             if iters is None else iters)
    base = Path(os.environ.get("BENCH_DIAG_DIR", "/tmp/gtdiag"))
    if base.exists():
        shutil.rmtree(base)
    root, rroot = base / "data", base / "results"

    def load_dir(d):
        return np.stack([read_image(p) for p in list_frames(d)])

    def psnr(a, b):
        mse = float(np.mean((a.astype(np.float64) - b) ** 2))
        return 10.0 * np.log10(1.0 / max(mse, 1e-12))

    def per_frame_psnr(a, b):
        return [round(psnr(x, y), 2) for x, y in zip(a, b)]

    def tone_corrected(a, b):
        """Per-frame scalar gain+bias least-squares fit of a onto b."""
        out = np.empty_like(a, dtype=np.float64)
        for t in range(a.shape[0]):
            x = a[t].astype(np.float64).ravel()
            y = b[t].astype(np.float64).ravel()
            vx = x.var()
            g = ((x * y).mean() - x.mean() * y.mean()) / max(vx, 1e-12)
            out[t] = np.clip(g * a[t] + (y.mean() - g * x.mean()), 0, 1)
        return out

    # 1. clean = stage-1 render of the real video (as in gt_real)
    raw = base / "raw"
    video_to_frames(video, raw, fps=10)
    src = root / "gt_clean_src"
    for p in list_frames(raw):
        f = read_image(p)
        h, w = f.shape[0] // 4, f.shape[1] // 4
        write_image(cv2.resize(f, (w, h), interpolation=cv2.INTER_AREA),
                    src / p.name)
    d = Deflickerer(root=str(root), results_root=str(rroot))
    d.process(frame_folder=str(src), down=1, iters=iters)
    clean = load_dir(rroot / src.name / "stage_1" / "output")

    # 2. the iid fold, same seed as gt_real
    rng = np.random.default_rng(101)
    T = clean.shape[0]
    g = rng.uniform(0.7, 1.3, size=(T, 1, 1, 1))
    fd = root / "gt_iid"
    for t, frame in enumerate(np.clip(clean * g, 0, 1).astype(np.float32)):
        write_image(frame, fd / f"{t:05d}.png")
    m = d.process(frame_folder=str(fd), down=1, iters=iters)

    s1 = load_dir(rroot / fd.name / "stage_1" / "output")
    filt = load_dir(rroot / fd.name / "neural_filter" / "output")
    final = load_dir(m["final_dir"])

    pf_final = per_frame_psnr(final, clean)
    out = {
        "fold": "iid", "iters": iters, "frames": int(T),
        "psnr_stage1": round(psnr(s1, clean), 2),
        "psnr_filtered": round(psnr(filt, clean), 2),
        "psnr_final": round(psnr(final, clean), 2),
        "psnr_filtered_vs_stage1": round(psnr(filt, s1), 2),
        "psnr_final_vs_filtered": round(psnr(final, filt), 2),
        "tonecorr_psnr_filtered": round(psnr(tone_corrected(filt, clean),
                                             clean), 2),
        "tonecorr_psnr_final": round(psnr(tone_corrected(final, clean),
                                          clean), 2),
        "per_frame_final_first10_mean": round(float(
            np.mean(pf_final[:10])), 2),
        "per_frame_final_last10_mean": round(float(
            np.mean(pf_final[-10:])), 2),
        "per_frame_final": pf_final,
        "per_frame_filtered": per_frame_psnr(filt, clean),
        "out_dir": str(base),
        "device": _device_str(),
    }
    _merge({"gt_diag": out})
    return out


BENCHES = {"raft": bench_raft, "stage2": bench_stage2, "e2e": bench_e2e,
           "e2e_dual": bench_e2e_dual,
           "torchref": bench_torchref, "jaxcpu": bench_jaxcpu,
           "corr": bench_corr, "hardening": bench_hardening,
           "batch": bench_batch,
           "batch_parallel": lambda: bench_batch(parallel=True),
           "trained_stage2": bench_trained_stage2,
           "gt_real": bench_gt_real,
           "gt_diag": bench_gt_diag,
           "warm": bench_warm,
           "cacheprobe": bench_cacheprobe,
           "cacheprobe2": bench_cacheprobe2,
           "cacheprobe3": bench_cacheprobe3,
           "config2": bench_config2}


if __name__ == "__main__":
    names = sys.argv[1:] or ["all"]
    if names == ["all"]:
        names = list(BENCHES)
    for n in names:
        BENCHES[n]()
