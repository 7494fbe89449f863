#!/usr/bin/env python
"""Benchmark: vmapped multi-video atlas fit (atlas/multifit.py) throughput.

Measures the AGGREGATE it/s (videos x steps / wall) of the vmapped fit step
at a chosen Pallas tile, bypassing fit_atlas_multi's conservative tile cap so
new kernel variants can be compile-checked on real hardware before the cap in
`fit_atlas_multi` (atlas/multifit.py) is raised.  The vmapped backward is the
VMEM worst case: the pallas_call batching rule adds a leading V axis to every
block, so a tile that fits the single-video fit can overflow here.

Env knobs:
  MF_V=2        number of stacked videos
  MF_TILE=1536  Pallas batch tile to force (0 = XLA path)
  MF_DUAL=1     dual-atlas (4-network) fit — the heaviest backward
  MF_ITERS=500  timed steps (per video)

Prints ONE JSON line like bench.py.
"""

import json
import os
import time


def main():
    import dataclasses

    import jax
    import optax

    from bench import T, H, W, synthetic_video_data
    from deflicker_tpu.atlas.engine import (build_specs, init_models,
                                            make_loss_fn, make_scan_step)
    from deflicker_tpu.atlas.multifit import (_run_chunk_multi,
                                              stack_video_data)
    from deflicker_tpu.config import AtlasConfig

    V = int(os.environ.get("MF_V", "2"))
    tile = int(os.environ.get("MF_TILE", "1536"))
    dual = os.environ.get("MF_DUAL") == "1"
    iters = int(os.environ.get("MF_ITERS", "500"))
    warmup = min(250, iters)

    cfg = AtlasConfig()
    cfg = dataclasses.replace(cfg, use_pallas_imlp=tile > 0,
                              pallas_tile=tile or None)

    datas = [synthetic_video_data(T, H, W, seed=s) for s in range(V)]
    data_v = stack_video_data(datas)
    specs = build_specs(cfg, dual=dual)
    keys = jax.random.split(jax.random.key(0), V)
    params_v = jax.vmap(lambda k: init_models(k, specs))(keys)
    optimizer = optax.adam(cfg.learning_rate)
    opt_state_v = jax.vmap(optimizer.init)(params_v)

    # mirror fit_atlas_multi's fit view: single-video template for the
    # static-shape probe, dummy leaves + packed-only data on device
    import jax.numpy as jnp
    import numpy as np

    from deflicker_tpu.atlas.data import VideoData

    data_t = jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(tuple(x.shape[1:]), x.dtype), data_v)
    z = lambda c: jnp.zeros((V, 1, 1, 1) + ((c,) if c else ()), jnp.float32)
    data_fit = VideoData(z(3), z(3), z(3), z(0), z(2), z(2), z(0), z(0),
                         packed=data_v.packed)

    loss_fn = make_loss_fn(specs, cfg, data_t, include_global=True,
                           include_bootstrap=dual)
    step = make_scan_step(loss_fn, optimizer, cfg.samples_batch, H, W, T,
                          mesh=None)
    vstep = jax.vmap(lambda c, d: step(c, None, d))

    carry = (params_v, opt_state_v, jax.random.split(jax.random.key(1), V))
    carry, aux = _run_chunk_multi(carry, data_fit, vstep=vstep,
                                  n_steps=warmup)
    float(np.asarray(aux["rgb"])[0])   # readback barrier (tunnel-safe)

    t0 = time.perf_counter()
    done = 0
    while done < iters:
        n = min(250, iters - done)
        carry, aux = _run_chunk_multi(carry, data_fit, vstep=vstep, n_steps=n)
        done += n
    final_rgb = float(np.mean(np.asarray(aux["rgb"])))
    dt = time.perf_counter() - t0

    agg = V * iters / dt
    device = jax.devices()[0]
    print(json.dumps({
        "metric": "multifit_aggregate_iters_per_sec",
        "value": round(agg, 2),
        "unit": "video-it/s",
        "vs_baseline": round(agg / 10.0, 2),
        "config": f"V={V}, {'dual' if dual else 'single'}-atlas, "
                  f"tile={tile}, {T}x{H}x{W}, batch 10000",
        "per_video_its": round(iters / dt, 2),
        "device": f"{device.platform}:{device.device_kind}",
        "final_rgb_loss": final_rgb,
    }))


if __name__ == "__main__":
    main()
