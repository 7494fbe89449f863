#!/usr/bin/env python
"""Fit-step time attribution (VERDICT round-2 item 9).

At 321 it/s the single-atlas step is ~3.1 ms with the fused-MLP kernels
accounting for ~1.74 ms — this harness attributes the rest by ABLATION
(the profiler path is unreliable through the remote 'axon' device): each
variant is the production scan step with one stage removed, so the deltas
between successive variants isolate sampling/gather, loss math, backward,
and Adam.  Prints one JSON line with the breakdown in ms/iter.

Variants (all lax.scan over N steps, readback barrier):
  sample_gather   device RNG sample + packed row gather + reduce
  forward         + coordinate variants + 3 MLP forwards + loss math
  backward        + value_and_grad (no update)
  sgd             + trivial update (params - lr*g): isolates tree-update cost
  full            + optax.adam (the production step)
"""

import json
import time

import numpy as np

from bench import T, H, W, real_video_data, synthetic_video_data

N_STEPS = 500
# warmup uses a full-length run (see loop below)


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from deflicker_tpu.atlas.engine import (build_specs, init_models,
                                            make_loss_fn)
    from deflicker_tpu.config import AtlasConfig

    cfg = AtlasConfig()
    try:
        data = real_video_data(T, H, W)
    except Exception:
        data = synthetic_video_data(T, H, W)
    data = data.with_packed()
    specs = build_specs(cfg, dual=False)
    params = init_models(jax.random.key(0), specs)
    optimizer = optax.adam(cfg.learning_rate)
    opt_state = optimizer.init(params)
    loss_fn = make_loss_fn(specs, cfg, data, include_global=True,
                           include_bootstrap=False)
    B = cfg.samples_batch

    def sample(key):
        key, kj, ki, kf = jax.random.split(key, 4)
        j = jax.random.randint(kj, (B,), 0, W)
        i = jax.random.randint(ki, (B,), 0, H)
        f = jax.random.randint(kf, (B,), 0, T)
        return key, j, i, f

    def step_sample_gather(carry, _, data):
        params, opt_state, key = carry
        key, j, i, f = sample(key)
        g = data.packed[f, i, j]
        return (params, opt_state, key), jnp.sum(g)

    def step_forward(carry, _, data):
        params, opt_state, key = carry
        key, j, i, f = sample(key)
        total, _ = loss_fn(params, data, j, i, f)
        return (params, opt_state, key), total

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step_backward(carry, _, data):
        params, opt_state, key = carry
        key, j, i, f = sample(key)
        (_, aux), grads = grad_fn(params, data, j, i, f)
        # consume grads without an update (sum keeps them live)
        probe = sum(jnp.sum(g) for g in jax.tree_util.tree_leaves(grads))
        return (params, opt_state, key), aux["total"] + 0.0 * probe

    def step_sgd(carry, _, data):
        params, opt_state, key = carry
        key, j, i, f = sample(key)
        (_, aux), grads = grad_fn(params, data, j, i, f)
        params = jax.tree_util.tree_map(lambda p, g: p - 1e-4 * g,
                                        params, grads)
        return (params, opt_state, key), aux["total"]

    def step_full(carry, _, data):
        params, opt_state, key = carry
        key, j, i, f = sample(key)
        (_, aux), grads = grad_fn(params, data, j, i, f)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), aux["total"]

    from functools import partial

    @partial(jax.jit, static_argnames=("fn", "n"))
    def run(carry, data, fn, n):
        return jax.lax.scan(lambda c, x: fn(c, x, data), carry, None,
                            length=n)

    results = {}
    for name, fn in (("sample_gather", step_sample_gather),
                     ("forward", step_forward),
                     ("backward", step_backward),
                     ("sgd", step_sgd),
                     ("full", step_full)):
        # warm with the SAME static scan length — a different length is a
        # different executable, so the timed call would eat the compile
        carry = (params, opt_state, jax.random.key(1))
        carry, out = run(carry, data, fn, N_STEPS)
        float(jnp.sum(out))                         # compile + warm barrier
        t0 = time.perf_counter()
        carry, out = run(carry, data, fn, N_STEPS)
        float(jnp.sum(out))                         # readback barrier
        dt = time.perf_counter() - t0
        results[name] = round(dt / N_STEPS * 1e3, 4)   # ms per iteration

    deltas = {
        "sample_gather_ms": results["sample_gather"],
        "fwd_math_ms": round(results["forward"] - results["sample_gather"], 4),
        "bwd_ms": round(results["backward"] - results["forward"], 4),
        "sgd_update_ms": round(results["sgd"] - results["backward"], 4),
        "adam_extra_ms": round(results["full"] - results["sgd"], 4),
    }
    import jax as _j

    dev = _j.devices()[0]
    print(json.dumps({
        "metric": "fit_step_breakdown_ms", "per_variant": results,
        "deltas": deltas,
        "its_per_sec_full": round(1e3 / results["full"], 1),
        "config": f"{T}x{H}x{W}, batch {B}, single-atlas, default path",
        "device": f"{dev.platform}:{dev.device_kind}"}))


def stash_ab():
    """A/B the backward kernel's remat vs HBM-activation-stash modes on
    the production full step (gradients are bit-identical by construction
    — tests/test_pallas_imlp.py::test_stash_bwd_matches_remat; this
    measures the compute-vs-bandwidth tradeoff on the real chip)."""
    import os
    import jax
    import jax.numpy as jnp
    import optax

    from deflicker_tpu.atlas.engine import (build_specs, init_models,
                                            make_loss_fn)
    from deflicker_tpu.config import AtlasConfig

    cfg = AtlasConfig()
    try:
        data = real_video_data(T, H, W)
    except Exception:
        data = synthetic_video_data(T, H, W)
    data = data.with_packed()
    specs = build_specs(cfg, dual=False)
    params0 = init_models(jax.random.key(0), specs)
    optimizer = optax.adam(cfg.learning_rate)
    B = cfg.samples_batch

    results = {}
    # stash mode streams 7 double-buffered (tile, 256) bf16 stash blocks
    # through VMEM on the 8-layer atlas backward — tile 1536 overflows the
    # 16 MB scoped budget (25.67 MB measured), so stash is A/B'd at
    # smaller tiles against the remat default.
    for mode, env, tile in (("remat_1536", "0", 1536),
                            ("stash_1024", "1", 1024),
                            ("stash_768", "1", 768)):
        import dataclasses as _dc

        os.environ["DEFLICKER_IMLP_STASH"] = env
        cfg_t = _dc.replace(cfg, pallas_tile=tile)
        loss_fn = make_loss_fn(specs, cfg_t, data, include_global=True,
                               include_bootstrap=False)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(carry, _, data):
            params, opt_state, key = carry
            key, kj, ki, kf = jax.random.split(key, 4)
            j = jax.random.randint(kj, (B,), 0, W)
            i = jax.random.randint(ki, (B,), 0, H)
            f = jax.random.randint(kf, (B,), 0, T)
            (_, aux), grads = grad_fn(params, data, j, i, f)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), aux["total"]

        run = jax.jit(lambda c, d: jax.lax.scan(
            lambda cc, x: step(cc, x, d), c, None, length=N_STEPS))
        carry = (params0, optimizer.init(params0), jax.random.key(1))
        try:
            carry, out = run(carry, data)
            float(jnp.sum(out))                     # compile + warm
            t0 = time.perf_counter()
            carry, out = run(carry, data)
            float(jnp.sum(out))                     # readback barrier
            dt = time.perf_counter() - t0
            results[mode] = round(N_STEPS / dt, 1)
        except Exception as e:                      # e.g. scoped-VMEM OOM
            results[mode] = f"failed: {str(e)[:120]}"
        print(f"  {mode}: {results[mode]}", flush=True)
    os.environ.pop("DEFLICKER_IMLP_STASH", None)

    dev = __import__("jax").devices()[0]
    print(json.dumps({
        "metric": "fit_step_stash_ab_its_per_sec", "per_mode": results,
        "config": f"{T}x{H}x{W}, batch {B}, single-atlas, bf16 tile default",
        "device": f"{dev.platform}:{dev.device_kind}"}))


def v2_ab():
    """A/B the v1 vs v2 kernel bodies on the production full step (VERDICT
    round-3 item 5: in-kernel pipelining / transpose removal is the named
    remaining MFU lever).  v2 replaces every transposed backward operand
    with a native-contraction dot_general and splits the skip-layer concat
    into two matmuls — no (tile, d+E) concat buffers, no (N, tile)
    materialized transposes (gradients match to float tolerance:
    tests/test_pallas_imlp.py::test_v2_matches_v1).  The freed VMEM may
    also lift the tile ceiling (2048 overflowed the 16 MB budget by only
    1.63 MB in round 3's mapping bwd), so v2 is probed at 2048 too."""
    import dataclasses as _dc
    import os

    import jax
    import jax.numpy as jnp
    import optax

    from deflicker_tpu.atlas.engine import (build_specs, init_models,
                                            make_loss_fn)
    from deflicker_tpu.config import AtlasConfig

    cfg = AtlasConfig()
    try:
        data = real_video_data(T, H, W)
    except Exception:
        data = synthetic_video_data(T, H, W)
    data = data.with_packed()
    specs = build_specs(cfg, dual=False)
    params0 = init_models(jax.random.key(0), specs)
    optimizer = optax.adam(cfg.learning_rate)
    B = cfg.samples_batch

    results = {}
    for mode, env, tile in (("v1_1792", "0", 1792),
                            ("v2_1792", "1", 1792),
                            ("v2_2048", "1", 2048),
                            ("v2_2560", "1", 2560)):
        os.environ["DEFLICKER_IMLP_V2"] = env
        cfg_t = _dc.replace(cfg, pallas_tile=tile)
        loss_fn = make_loss_fn(specs, cfg_t, data, include_global=True,
                               include_bootstrap=False)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(carry, _, data):
            params, opt_state, key = carry
            key, kj, ki, kf = jax.random.split(key, 4)
            j = jax.random.randint(kj, (B,), 0, W)
            i = jax.random.randint(ki, (B,), 0, H)
            f = jax.random.randint(kf, (B,), 0, T)
            (_, aux), grads = grad_fn(params, data, j, i, f)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), aux["total"]

        run = jax.jit(lambda c, d: jax.lax.scan(
            lambda cc, x: step(cc, x, d), c, None, length=N_STEPS))
        carry = (params0, optimizer.init(params0), jax.random.key(1))
        try:
            carry, out = run(carry, data)
            float(jnp.sum(out))                     # compile + warm
            t0 = time.perf_counter()
            carry, out = run(carry, data)
            float(jnp.sum(out))                     # readback barrier
            dt = time.perf_counter() - t0
            results[mode] = round(N_STEPS / dt, 1)
        except Exception as e:                      # e.g. scoped-VMEM OOM
            results[mode] = f"failed: {str(e)[:160]}"
        print(f"  {mode}: {results[mode]}", flush=True)
    os.environ.pop("DEFLICKER_IMLP_V2", None)

    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "fit_step_v2_ab_its_per_sec", "per_mode": results,
        "config": f"{T}x{H}x{W}, batch {B}, single-atlas, bf16",
        "device": f"{dev.platform}:{dev.device_kind}"}))


def pipe_ab(dual: bool = False):
    """A/B the software-pipelined half-tile kernel bodies (VERDICT r4 #8:
    overlap one half-tile's inter-layer VPU work with the other half's MXU
    matmuls — the one direction the stash/v2 negatives didn't test).
    Gradients match to float tolerance
    (tests/test_pallas_imlp.py::test_pipe_matches_default); this measures
    whether Mosaic actually converts the two independent dependency chains
    into MXU/VPU overlap on the chip.  Probed at the production tile 1792
    and at 2048 (half-tile temporaries change the VMEM high-water mark)."""
    import dataclasses as _dc
    import os

    import jax
    import jax.numpy as jnp
    import optax

    from deflicker_tpu.atlas.engine import (build_specs, init_models,
                                            make_loss_fn)
    from deflicker_tpu.config import AtlasConfig

    cfg = AtlasConfig()
    try:
        data = real_video_data(T, H, W)
    except Exception:
        data = synthetic_video_data(T, H, W)
    data = data.with_packed()
    specs = build_specs(cfg, dual=dual)
    params0 = init_models(jax.random.key(0), specs)
    optimizer = optax.adam(cfg.learning_rate)
    B = cfg.samples_batch

    results = {}
    base_tile = 1536 if dual else 1792      # select_imlp_apply defaults
    for mode, env, tile in ((f"default_{base_tile}", "0", base_tile),
                            (f"pipe_{base_tile}", "1", base_tile),
                            (f"pipe_{base_tile + 256}", "1",
                             base_tile + 256)):
        os.environ["DEFLICKER_IMLP_PIPE"] = env
        cfg_t = _dc.replace(cfg, pallas_tile=tile)
        loss_fn = make_loss_fn(specs, cfg_t, data, include_global=True,
                               include_bootstrap=dual)
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

        def step(carry, _, data):
            params, opt_state, key = carry
            key, kj, ki, kf = jax.random.split(key, 4)
            j = jax.random.randint(kj, (B,), 0, W)
            i = jax.random.randint(ki, (B,), 0, H)
            f = jax.random.randint(kf, (B,), 0, T)
            (_, aux), grads = grad_fn(params, data, j, i, f)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, key), aux["total"]

        run = jax.jit(lambda c, d: jax.lax.scan(
            lambda cc, x: step(cc, x, d), c, None, length=N_STEPS))
        carry = (params0, optimizer.init(params0), jax.random.key(1))
        try:
            carry, out = run(carry, data)
            float(jnp.sum(out))                     # compile + warm
            t0 = time.perf_counter()
            carry, out = run(carry, data)
            float(jnp.sum(out))                     # readback barrier
            dt = time.perf_counter() - t0
            results[mode] = round(N_STEPS / dt, 1)
        except Exception as e:                      # e.g. scoped-VMEM OOM
            results[mode] = f"failed: {str(e)[:160]}"
        print(f"  {mode}: {results[mode]}", flush=True)
    os.environ.pop("DEFLICKER_IMLP_PIPE", None)

    dev = jax.devices()[0]
    print(json.dumps({
        "metric": "fit_step_pipe_ab_its_per_sec", "per_mode": results,
        "config": f"{T}x{H}x{W}, batch {B}, "
                  f"{'dual' if dual else 'single'}-atlas, bf16",
        "device": f"{dev.platform}:{dev.device_kind}"}))


V5E_BF16_PEAK = 197e12        # TPU v5e MXU peak, bf16 multiplies (FLOP/s)


def sol(measured_its: float = 323.3, dual: bool = False):
    """Speed-of-light analysis of the fit step — pure arithmetic, no device.

    Counts the step's matmul FLOPs analytically from the IMLP layer shapes
    (models/imlp.IMLPSpec.layer_dims) and the per-network row counts the
    loss builds (engine.make_loss_fn: mapping x9 variants incl. global
    rigidity, atlas x3 per mapping, alpha x5 on dual), including the Pallas
    kernel's real work: rows padded to a tile multiple and the backward's
    remat forward (fwd 1x + bwd [remat fwd + dW + dx] 3x = 4x forward
    FLOPs; 3x is the algorithmic minimum).  Compares against the v5e bf16
    MXU peak at the measured iteration rate.
    """
    from deflicker_tpu.atlas.engine import build_specs, select_imlp_apply
    from deflicker_tpu.config import AtlasConfig

    cfg = AtlasConfig()
    specs = build_specs(cfg, dual=dual)
    B = cfg.samples_batch
    tile = 1536 if dual else 1792           # select_imlp_apply defaults

    def pad(rows):
        return ((max(rows, tile) + tile - 1) // tile) * tile

    def fwd_flops(spec, rows):
        macs = sum(fi * fo for fi, fo in spec.layer_dims())
        return 2 * macs * pad(rows)

    nets = {"mapping1": (specs.mapping1, 9 * B),
            "atlas": (specs.atlas, (6 if dual else 3) * B)}
    if dual:
        nets["mapping2"] = (specs.mapping2, 9 * B)
        nets["alpha"] = (specs.alpha, 5 * B)

    fwd = {k: fwd_flops(s, r) for k, (s, r) in nets.items()}
    total_fwd = sum(fwd.values())
    device_flops = 4 * total_fwd            # fwd + remat-bwd kernel
    useful_flops = 3 * total_fwd            # without the remat recompute

    step_s = 1.0 / measured_its
    print(json.dumps({
        "metric": "fit_step_speed_of_light",
        "config": f"batch {B}, {'dual' if dual else 'single'}-atlas, "
                  f"tile {tile}, rows padded",
        "fwd_gflops_per_net": {k: round(v / 1e9, 2) for k, v in fwd.items()},
        "device_gflops_per_step": round(device_flops / 1e9, 1),
        "useful_gflops_per_step": round(useful_flops / 1e9, 1),
        "measured_its_per_sec": measured_its,
        "achieved_tflops": round(device_flops / step_s / 1e12, 1),
        "mxu_utilization_pct": round(
            100 * device_flops / step_s / V5E_BF16_PEAK, 1),
        "useful_utilization_pct": round(
            100 * useful_flops / step_s / V5E_BF16_PEAK, 1),
        "sol_its_per_sec_at_peak": round(V5E_BF16_PEAK / device_flops, 1),
    }))


if __name__ == "__main__":
    import sys
    if "stash_ab" in sys.argv[1:]:
        stash_ab()
    elif "v2_ab" in sys.argv[1:]:
        v2_ab()
    elif "pipe_ab" in sys.argv[1:]:
        pipe_ab(dual="dual" in sys.argv[1:])
    elif "sol" in sys.argv[1:]:
        its = [float(a) for a in sys.argv[1:] if a.replace(".", "").isdigit()]
        sol(measured_its=its[0] if its else 323.3,
            dual="dual" in sys.argv[1:])
    else:
        main()
