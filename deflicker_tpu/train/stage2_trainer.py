"""Stage-2 training: neural filter (UNet) then local refinement (TransformNet).

The reference ships these two networks only as pretrained blobs
(src/neural_filter_and_refinement.py:46-66) plus vestigial, never-imported
training scaffolding (src/models/datasets_local.py, src/models/vgg.py); the
blobs are not available in this environment (.MISSING_LARGE_BLOBS).  This
module makes the framework self-sufficient: it trains both networks from
scratch on procedurally generated clips (train/synth.py) so a user without
the original weights still gets a REAL deflickering stage 2 — and records
honest quality numbers with trained (not random) weights.

TPU-first shape: data generation happens ON DEVICE inside the jitted train
step (closed-form Fourier clips — no dataset, no host I/O, no H2D), steps
run in `lax.scan` chunks like the atlas fit (atlas/engine.py pattern), and
convs compute in bf16 with f32 params/optimizer by default.

Training objectives:
  filter:  P = UNet(cat(flickered, atlas_proxy));  L1 to clean + gradient L1
           (sharpness term — the atlas input is deliberately blurry and the
           L1 alone lets the net lean on it).
  refiner: O_t = P_t + TransformNet(cat(P_t, O_{t-1}, P_t, P_{t-1})) through
           the inference recurrence (filter/engine.refine_sequence) with the
           UNet frozen;  L1 to clean + temporal warp loss
           |O_t - warp(O_{t-1})| on Clip.valid pixels (exact flow,
           occlusions and fg-mask edges excluded) — the E_warp metric
           (metrics/ewarp.py) as a training signal.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp
import optax

from ..models.refine import TransformNet, transformnet_init
from ..models.unet import UNet, unet_init
from ..ops.sampling import flow_warp
from .synth import make_clip, make_image_clip


@dataclasses.dataclass(frozen=True)
class TrainConfig:
    height: int = 128
    width: int = 128
    filter_steps: int = 4000
    refine_steps: int = 1500
    batch: int = 8               # frames per UNet step
    clip_len: int = 6            # refiner clip length
    clip_batch: int = 2          # refiner clips per step
    learning_rate: float = 2e-4
    lr_schedule: str = "constant"  # "constant" | "cosine" (warmup + decay)
    grad_weight: float = 0.5     # filter gradient-L1 weight
    temporal_weight: float = 2.0  # refiner warp-loss weight
    # defaults reproduce the SHIPPED weight recipe (affine/iid — measured
    # best on the real benchmark; the breadth axes are opt-in, BASELINE.md)
    texture_mix: float = 0.5     # P(real-image clip) when a bank is given
    p_layer: float = 0.0         # P(foreground layer per clip) — synth.py
    corr_flicker: bool = False   # AR(1) flicker series (False: iid)
    dtype: str = "bfloat16"      # conv compute dtype (params stay f32)
    steps_per_call: int = 50
    seed: int = 0

    @property
    def jdtype(self):
        return jnp.dtype(self.dtype)


def _make_optimizer(cfg: TrainConfig, total_steps: int):
    """Adam with the configured LR schedule.  "cosine": 3% linear warmup
    then cosine decay to lr/20 — Adam at a constant LR plateaus at an
    LR-bound noise floor (the shipped 18k run's refiner flatlined after
    ~4k steps at 2e-4); the decay trades exploration for a lower floor.
    The schedule step count lives in the optax state, so it threads
    cleanly through the donated scan-chunk carries."""
    if cfg.lr_schedule == "constant":
        return optax.adam(cfg.learning_rate)
    if cfg.lr_schedule != "cosine":
        raise ValueError(f"unknown lr_schedule {cfg.lr_schedule!r}")
    warmup = max(1, int(0.03 * total_steps))
    sched = optax.warmup_cosine_decay_schedule(
        init_value=cfg.learning_rate / 10, peak_value=cfg.learning_rate,
        warmup_steps=warmup, decay_steps=total_steps,
        end_value=cfg.learning_rate / 20)
    return optax.adam(sched)


def _make_clip_batch(key, bank, cfg: TrainConfig, B: int, T: int):
    """B clips: procedural Fourier textures, or — with probability
    cfg.texture_mix when a texture bank rides along — real-image textures
    (synth.make_image_clip; same shapes, same exact flow).  `bank` is a
    traced (N, th, tw, 3) array; pass a 1-texture dummy with texture_mix=0
    to disable (both lax.cond branches compile either way)."""
    k_pick, k_clips = jax.random.split(key)
    keys = jax.random.split(k_clips, B)

    def fourier(_):
        return jax.vmap(lambda k: make_clip(
            k, T, cfg.height, cfg.width, p_layer=cfg.p_layer,
            corr_flicker=cfg.corr_flicker))(keys)

    def image(_):
        def one(k):
            k_idx, k_clip = jax.random.split(k)
            idx = jax.random.randint(k_idx, (), 0, bank.shape[0])
            return make_image_clip(k_clip, bank[idx], T, cfg.height,
                                   cfg.width, p_layer=cfg.p_layer,
                                   corr_flicker=cfg.corr_flicker)
        return jax.vmap(one)(keys)

    use_image = jax.random.uniform(k_pick) < cfg.texture_mix
    return jax.lax.cond(use_image, image, fourier, None)


def _l1(a, b):
    return jnp.mean(jnp.abs(a - b))


def _grad_l1(a, b):
    dxa, dxb = a[:, :, 1:] - a[:, :, :-1], b[:, :, 1:] - b[:, :, :-1]
    dya, dyb = a[:, 1:] - a[:, :-1], b[:, 1:] - b[:, :-1]
    return _l1(dxa, dxb) + _l1(dya, dyb)


@partial(jax.jit, static_argnames=("cfg", "n_steps"), donate_argnums=(0,))
def _filter_chunk(carry, bank, cfg: TrainConfig, n_steps: int):
    """n_steps UNet train steps as one compiled scan."""
    net = UNet(in_channels=6, out_channels=3, features=32, dtype=cfg.jdtype)
    optimizer = _make_optimizer(cfg, cfg.filter_steps)

    def loss_fn(variables, key):
        clips = _make_clip_batch(key, bank, cfg, cfg.batch, 1)
        inp = clips.inp[:, 0]
        atlas = clips.atlas[:, 0]
        clean = clips.clean[:, 0]
        x = jnp.concatenate([inp, atlas], axis=-1).astype(cfg.jdtype)
        pred = net.apply(variables, x).astype(jnp.float32)
        rec = _l1(pred, clean)
        grad = _grad_l1(pred, clean)
        return rec + cfg.grad_weight * grad, {"rec": rec, "grad": grad}

    def step(c, _):
        variables, opt_state, key = c
        key, sub = jax.random.split(key)
        (total, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables, sub)
        updates, opt_state = optimizer.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return (variables, opt_state, key), {"total": total, **aux}

    carry, auxes = jax.lax.scan(step, carry, None, length=n_steps)
    return carry, jax.tree_util.tree_map(lambda a: jnp.mean(a), auxes)


@partial(jax.jit, static_argnames=("cfg", "n_steps"), donate_argnums=(0,))
def _refiner_chunk(carry, filter_variables: Dict, bank, cfg: TrainConfig,
                   n_steps: int):
    """n_steps TransformNet train steps (UNet frozen) as one compiled scan."""
    fnet = UNet(in_channels=6, out_channels=3, features=32, dtype=cfg.jdtype)
    lnet = TransformNet(nf=32, blocks=5, nc_out=3, dtype=cfg.jdtype)
    optimizer = _make_optimizer(cfg, cfg.refine_steps)
    B, T, H, W = cfg.clip_batch, cfg.clip_len, cfg.height, cfg.width

    def loss_fn(variables, key):
        clips = _make_clip_batch(key, bank, cfg, B, T)
        x = jnp.concatenate([clips.inp, clips.atlas], axis=-1)
        x = x.reshape(B * T, H, W, 6).astype(cfg.jdtype)
        P = fnet.apply(filter_variables, x).astype(jnp.float32)
        P = jax.lax.stop_gradient(P.reshape(B, T, H, W, 3))

        def step_t(c, xs):
            o_prev, p_prev = c
            p_t, clean_t, flow_t, valid_t = xs
            inp = jnp.concatenate([p_t, o_prev, p_t, p_prev], axis=-1)
            resid = lnet.apply(variables,
                               inp.astype(cfg.jdtype)).astype(jnp.float32)
            o_t = p_t + resid
            rec = _l1(o_t, clean_t)
            warped = jax.vmap(flow_warp)(o_prev, flow_t)
            # clip.valid: in-bounds AND occlusion/mask-edge-free — the
            # temporal loss must not penalize true occlusions (synth.py)
            temp = jnp.sum(jnp.abs(o_t - warped) * valid_t) / (
                jnp.sum(valid_t) * 3.0 + 1e-8)
            return (o_t, p_t), (rec, temp)

        seq = (jnp.swapaxes(P[:, 1:], 0, 1),
               jnp.swapaxes(clips.clean[:, 1:], 0, 1),
               jnp.swapaxes(clips.flow_bw[:, 1:], 0, 1),
               jnp.swapaxes(clips.valid[:, 1:], 0, 1))
        p0 = P[:, 0]
        (_, _), (recs, temps) = jax.lax.scan(step_t, (p0, p0), seq)
        rec, temp = jnp.mean(recs), jnp.mean(temps)
        return rec + cfg.temporal_weight * temp, {"rec": rec, "temp": temp}

    def step(c, _):
        variables, opt_state, key = c
        key, sub = jax.random.split(key)
        (total, aux), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(variables, sub)
        updates, opt_state = optimizer.update(grads, opt_state, variables)
        variables = optax.apply_updates(variables, updates)
        return (variables, opt_state, key), {"total": total, **aux}

    carry, auxes = jax.lax.scan(step, carry, None, length=n_steps)
    return carry, jax.tree_util.tree_map(lambda a: jnp.mean(a), auxes)


LogCallback = Callable[[str, int, Dict[str, float]], None]


def _run(chunk_fn, carry, total_steps: int, per_call: int, name: str,
         log_callback: Optional[LogCallback]) -> Tuple[tuple, List[Dict]]:
    logs = []
    done = 0
    while done < total_steps:
        n = min(per_call, total_steps - done)
        carry, aux = chunk_fn(carry, n)
        done += n
        rec = {k: float(v) for k, v in aux.items()}
        if not all(np.isfinite(v) for v in rec.values()):
            raise FloatingPointError(
                f"non-finite {name} loss at step {done}: {rec}")
        logs.append({"step": done, **rec})
        if log_callback is not None:
            log_callback(name, done, rec)
    return carry, logs


def _prep_bank(cfg: TrainConfig, texture_bank):
    """(bank array, effective cfg): a real bank rides as a traced arg; with
    none, a 1-texture dummy + texture_mix=0 (the image branch never fires)."""
    if texture_bank is None:
        dummy = jnp.zeros((1, cfg.height + 64, cfg.width + 64, 3),
                          jnp.float32)
        return dummy, dataclasses.replace(cfg, texture_mix=0.0)
    return jnp.asarray(texture_bank, jnp.float32), cfg


def train_filter(cfg: TrainConfig, key: jax.Array,
                 log_callback: Optional[LogCallback] = None,
                 texture_bank=None):
    """Train the UNet neural filter; returns (variables, logs).

    `texture_bank`: optional (N, th, tw, 3) f32 image bank
    (synth.load_texture_bank) mixed in with probability cfg.texture_mix."""
    bank, cfg = _prep_bank(cfg, texture_bank)
    k_init, k_train = jax.random.split(key)
    variables = unet_init(k_init, hw=(cfg.height, cfg.width))
    opt_state = _make_optimizer(cfg, cfg.filter_steps).init(variables)
    carry = (variables, opt_state, k_train)
    carry, logs = _run(lambda c, n: _filter_chunk(c, bank, cfg, n), carry,
                       cfg.filter_steps, cfg.steps_per_call, "filter",
                       log_callback)
    return carry[0], logs


def train_refiner(cfg: TrainConfig, key: jax.Array, filter_variables: Dict,
                  log_callback: Optional[LogCallback] = None,
                  texture_bank=None):
    """Train the refinement net through the inference recurrence (UNet
    frozen); returns (variables, logs)."""
    bank, cfg = _prep_bank(cfg, texture_bank)
    k_init, k_train = jax.random.split(key)
    variables = transformnet_init(k_init, hw=(cfg.height, cfg.width))
    opt_state = _make_optimizer(cfg, cfg.refine_steps).init(variables)
    carry = (variables, opt_state, k_train)
    carry, logs = _run(
        lambda c, n: _refiner_chunk(c, filter_variables, bank, cfg, n),
        carry, cfg.refine_steps, cfg.steps_per_call, "refiner", log_callback)
    return carry[0], logs


def train_stage2(cfg: TrainConfig, out_dir,
                 log_callback: Optional[LogCallback] = None,
                 texture_bank=None):
    """Train both networks and save engine-loadable checkpoints.

    Writes `neural_filter.ckpt` and `local_refinement_net.ckpt` under
    `out_dir` — drop-in for the reference's .pth names via --ckpt_filter /
    --ckpt_local (filter/engine.load_filter_engine handles both formats) —
    plus a scalars.jsonl training log.  Returns the two checkpoint paths.
    """
    import json
    from pathlib import Path

    from ..utils.checkpoint import save_checkpoint

    out_dir = Path(out_dir)
    out_dir.mkdir(parents=True, exist_ok=True)
    key = jax.random.key(cfg.seed)
    k_f, k_r = jax.random.split(key)

    scalars = open(out_dir / "scalars.jsonl", "a")

    def log(name, step, rec):
        scalars.write(json.dumps({"net": name, "step": step, **rec}) + "\n")
        scalars.flush()
        if log_callback is not None:
            log_callback(name, step, rec)

    try:
        fvars, _ = train_filter(cfg, k_f, log, texture_bank=texture_bank)
        fpath = save_checkpoint(out_dir / "neural_filter.ckpt", fvars)
        lvars, _ = train_refiner(cfg, k_r, fvars, log,
                                 texture_bank=texture_bank)
        lpath = save_checkpoint(out_dir / "local_refinement_net.ckpt", lvars)
    finally:
        scalars.close()
    (out_dir / "train_config.json").write_text(
        json.dumps(dataclasses.asdict(cfg), indent=2))
    return fpath, lpath
