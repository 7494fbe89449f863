"""Stage-1 engine: per-video test-time fit of the neural layered atlas.

TPU-native redesign of the reference's training loops
(`src/stage1_neural_atlas.py:151-231` single-atlas and
`src/stage1_neural_atlas_seg.py:191-315` dual-atlas):

  * sampling happens **on device** with `jax.random` instead of host
    `torch.randint` + CPU gathers + H2D copies per iteration;
  * every coordinate variant a step needs (base, gradient offsets, rigidity
    offsets, global-rigidity offsets, flow matches) is stacked into ONE
    batched forward per network per step, so each step is a handful of large
    MXU matmuls instead of ~11 small kernel launches;
  * the dynamic-size flow-match subsets of the reference (boolean indexing)
    become static-shape multiply-by-mask reductions (same means);
  * `steps_per_call` optimizer steps are fused into a single `lax.scan`
    device call, removing per-step dispatch overhead entirely;
  * the time-varying loss schedule (global rigidity until
    `stop_global_rigidity`, alpha bootstrapping until
    `stop_bootstrapping_iteration`) is handled by recompiling the scanned
    step at the (two) schedule boundaries, so each phase's graph contains
    only the work it needs.

Loss semantics match the reference term by term; see
`deflicker_tpu.losses.atlas_losses` for the per-term file:line citations.
"""

from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable, Dict, List, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from ..config import AtlasConfig
from ..losses import (alpha_bootstrap_loss, alpha_flow_loss, flow_loss,
                      gradient_loss, rgb_loss, rigidity_loss, sparsity_loss)
from ..models.imlp import IMLPSpec, imlp_apply, imlp_init
from ..ops.coords import normalize_xyt
from .data import VideoData

Params = Dict[str, list]


def select_imlp_apply(use_pallas: bool = False, precision: str = "highest",
                      tile: "int | None" = None, dual: bool = False):
    """Pick the IMLP forward path.

    Default: the XLA path — measured FASTER than the Pallas fused kernel at
    production batch sizes on v5e (XLA's fusion already keeps the chain on
    the MXU well); the kernel stays available as an opt-in
    (use_pallas_imlp=True, DEFLICKER_NO_PALLAS=1 kill switch).

    `precision`: "highest" = fp32 multiplies (reference numerics);
    "default" = bf16 multiply + fp32 accumulate (~4x MXU rate).
    """
    import os

    from ..ops.pallas import fused_imlp_available

    # the kernel only beats XLA in its bf16 configuration (265 vs 208 it/s
    # on v5e; the fp32 kernel measured 80 vs XLA's 108) — so "highest"
    # always routes to XLA
    if (use_pallas and precision == "default" and fused_imlp_available()
            and os.environ.get("DEFLICKER_NO_PALLAS") != "1"):
        from ..models.imlp import imlp_apply_fused

        # bf16 multiplies + bf16 backward stash -> bigger tiles fit the
        # 16 MB scoped-VMEM budget.  Hardware-verified ceilings (v5e,
        # bench.py BENCH_TILE probes): single-atlas 1792 (323.3 it/s;
        # 2048 overflows by 1.63 MB in the mapping backward), dual 1536
        # (the 8-layer alpha-MLP backward is binding)
        if tile is None:
            default = "1536" if dual else "1792"
            tile = int(os.environ.get("DEFLICKER_PALLAS_TILE", default))
        # DEFLICKER_IMLP_STASH=1: backward streams an HBM activation stash
        # instead of rematerializing the forward (bit-identical grads;
        # compute-vs-bandwidth experiment, bench_fitstep.py)
        stash = os.environ.get("DEFLICKER_IMLP_STASH") == "1"
        # v2 kernel bodies (native-contraction backward, split-skip
        # matmuls) are the round-4 DEFAULT: they tie v1 on speed at every
        # verified tile (single 1792: 319.6 both; dual 1536: 143.5 vs
        # 143.6 it/s) but need ~0.8 MB less scoped VMEM in the vmapped
        # dual backward, lifting that cap 1024 -> 1280 (atlas/multifit.py).
        # DEFLICKER_IMLP_V2=0 reverts to the round-3 bodies.
        v2 = os.environ.get("DEFLICKER_IMLP_V2", "1") == "1"
        # Software-pipelined half-tile kernel bodies: DEFAULT
        # (DEFLICKER_IMLP_PIPE=0 reverts; exclusive with STASH).  Wins
        # at every capped tile on v5e — single fit 320.3 -> 328.9 it/s
        # @1792, dual 142.8 -> 147.6 @1536, vmapped multifit single
        # 337.6 -> 348.9 video-it/s @1536 and dual 151.2 -> 155.3 @1280
        # (bench_fitstep.py pipe_ab, bench_multifit.py).
        pipe = os.environ.get("DEFLICKER_IMLP_PIPE", "1") == "1" \
            and not stash
        return partial(imlp_apply_fused, tile=tile,
                       compute_dtype=jnp.bfloat16, stash_bwd=stash, v2=v2,
                       pipe=pipe)
    prec = (jax.lax.Precision.HIGHEST if precision == "highest"
            else jax.lax.Precision.DEFAULT)
    return partial(imlp_apply, precision=prec)


class AtlasSpecs(NamedTuple):
    """Static IMLP architectures for one fit. mapping2/alpha are None on the
    single-atlas path (reference: alpha hardwired to 1,
    src/stage1_neural_atlas.py:177)."""

    mapping1: IMLPSpec
    atlas: IMLPSpec
    mapping2: Optional[IMLPSpec] = None
    alpha: Optional[IMLPSpec] = None

    @property
    def dual(self) -> bool:
        return self.mapping2 is not None


def build_specs(cfg: AtlasConfig, dual: bool) -> AtlasSpecs:
    """IMLP architectures exactly as instantiated by the reference
    (src/stage1_neural_atlas.py:112-128, src/stage1_neural_atlas_seg.py:127-161)."""
    mapping1 = IMLPSpec(
        input_dim=3, output_dim=2,
        hidden_dim=cfg.number_of_channels_mapping1,
        use_positional=cfg.use_positional_encoding_mapping1,
        positional_dim=cfg.number_of_positional_encoding_mapping1,
        num_layers=cfg.number_of_layers_mapping1, skip_layers=())
    atlas = IMLPSpec(
        input_dim=2, output_dim=3,
        hidden_dim=cfg.number_of_channels_atlas,
        use_positional=True,
        positional_dim=cfg.positional_encoding_num_atlas,
        num_layers=cfg.number_of_layers_atlas, skip_layers=(4, 7))
    if not dual:
        return AtlasSpecs(mapping1, atlas)
    mapping2 = IMLPSpec(
        input_dim=3, output_dim=2,
        hidden_dim=cfg.number_of_channels_mapping2,
        use_positional=cfg.use_positional_encoding_mapping2,
        positional_dim=cfg.number_of_positional_encoding_mapping2,
        num_layers=cfg.number_of_layers_mapping2, skip_layers=())
    alpha = IMLPSpec(
        input_dim=3, output_dim=1,
        hidden_dim=cfg.number_of_channels_alpha,
        use_positional=True,
        positional_dim=cfg.positional_encoding_num_alpha,
        num_layers=cfg.number_of_layers_alpha, skip_layers=())
    return AtlasSpecs(mapping1, atlas, mapping2, alpha)


def init_models(key: jax.Array, specs: AtlasSpecs) -> Params:
    keys = jax.random.split(key, 4)
    params: Params = {
        "mapping1": imlp_init(keys[0], specs.mapping1),
        "atlas": imlp_init(keys[1], specs.atlas),
    }
    if specs.dual:
        params["mapping2"] = imlp_init(keys[2], specs.mapping2)
        params["alpha"] = imlp_init(keys[3], specs.alpha)
    return params


def _squash_alpha(raw: jax.Array) -> jax.Array:
    """tanh output -> (0.001, 0.991): 0.5*(a+1)*0.99 + 0.001, the reference's
    BCE-safe squash (src/stage1_neural_atlas_seg.py:224-228)."""
    return 0.5 * (raw + 1.0) * 0.99 + 0.001


def make_loss_fn(specs: AtlasSpecs, cfg: AtlasConfig, data: VideoData,
                 include_global: bool, include_bootstrap: bool) -> Callable:
    """Build the per-batch loss over sampled integer pixel coords (j, i, f).

    Mirrors one iteration of the reference training loop
    (single: src/stage1_neural_atlas.py:159-231; dual:
    src/stage1_neural_atlas_seg.py:204-315) with all mapping-network queries
    fused into one forward per network.

    `data` here only supplies STATIC shape info; the returned
    loss_fn(params, data, j, i, f) takes the video tensors as a traced
    argument — closing over them would embed gigabytes of constants in the
    compiled program (full-res HLOs then exceed compile-service limits).
    """
    T, (H, W) = data.num_frames, data.res
    L = data.larger_dim
    dual = specs.dual
    tile = getattr(cfg, "pallas_tile", None)
    # per-variant tile defaults (select_imlp_apply): 1792 single / 1536
    # dual — the round-3 backward restructure (dW accumulated in output
    # blocks, pre-concat stash, bf16 weights) freed the VMEM that used to
    # cap dual at 1024 (measured dual: 143.6 it/s @1536 vs 141.4 @1024)
    apply_mlp = select_imlp_apply(cfg.use_pallas_imlp, cfg.fit_precision,
                                  tile, dual=dual)
    d = cfg.derivative_amount
    gd_fg = cfg.global_rigidity_derivative_amount_fg
    gd_bg = cfg.global_rigidity_derivative_amount_bg

    def norm(j, i, f):
        return normalize_xyt(j, i, f, L, T)

    def mapping_coords(j, i, f, ffwd, fbwd, gd):
        """The 7 (or 9 with global rigidity) coordinate variants one mapping
        network is queried at, stacked to (K, B, 3)."""
        fF = f.astype(jnp.float32)
        variants = [
            norm(j, i, f),                                     # 0: base
            norm(j + 1, i, f),                                 # 1: x+1 (gradient)
            norm(j, i + 1, f),                                 # 2: y+1 (gradient)
            norm(j, i - d, f),                                 # 3: y-d (rigidity)
            norm(j - d, i, f),                                 # 4: x-d (rigidity)
            norm(j + ffwd[:, 0], i + ffwd[:, 1], fF + 1.0),    # 5: fwd flow match
            norm(j + fbwd[:, 0], i + fbwd[:, 1], fF - 1.0),    # 6: bwd flow match
        ]
        if include_global:
            variants.append(norm(j, i - gd, f))                # 7: y-gd
            variants.append(norm(j - gd, i, f))                # 8: x-gd
        return jnp.stack(variants, axis=0)

    def run_mapping(params, spec, coords):
        K, B, _ = coords.shape
        out = apply_mlp(params, coords.reshape(K * B, 3), spec)
        return out.reshape(K, B, 2)

    def loss_fn(params: Params, data: VideoData, j: jax.Array,
                i: jax.Array, f: jax.Array):
        B = j.shape[0]
        if data.packed is not None:
            # one 16-channel row gather (see VideoData.with_packed)
            g = data.packed[f, i, j]
            rgb_gt, dx_gt, dy_gt = g[:, 0:3], g[:, 3:6], g[:, 6:9]
            ffwd, fbwd = g[:, 9:11], g[:, 11:13]
            mfwd, mbwd = g[:, 13], g[:, 14]
        else:
            rgb_gt = data.video[f, i, j]
            dx_gt = data.dx[f, i, j]
            dy_gt = data.dy[f, i, j]
            ffwd = data.flow_fwd[f, i, j]
            fbwd = data.flow_bwd[f, i, j]
            mfwd = data.mask_fwd[f, i, j]
            mbwd = data.mask_bwd[f, i, j]

        uv1 = run_mapping(params["mapping1"], specs.mapping1,
                          mapping_coords(j, i, f, ffwd, fbwd, gd_fg))

        # atlas queries: fg quadrant uv*0.5+0.5 (and bg uv*0.5-0.5 on dual),
        # for base / x+1 / y+1 (reference: src/stage1_neural_atlas.py:181,
        # loss_utils.py:157-160)
        atlas_in = [uv1[0] * 0.5 + 0.5, uv1[1] * 0.5 + 0.5, uv1[2] * 0.5 + 0.5]
        if dual:
            uv2 = run_mapping(params["mapping2"], specs.mapping2,
                              mapping_coords(j, i, f, ffwd, fbwd, gd_bg))
            atlas_in += [uv2[0] * 0.5 - 0.5, uv2[1] * 0.5 - 0.5, uv2[2] * 0.5 - 0.5]
        n_atlas = len(atlas_in)
        rgb_all = apply_mlp(params["atlas"],
                            jnp.concatenate(atlas_in, axis=0), specs.atlas)
        rgb_all = (rgb_all + 1.0) * 0.5
        rgb_all = rgb_all.reshape(n_atlas, B, 3)
        rgb1, rgb1_x, rgb1_y = rgb_all[0], rgb_all[1], rgb_all[2]

        aux: Dict[str, jax.Array] = {}
        if dual:
            rgb2, rgb2_x, rgb2_y = rgb_all[3], rgb_all[4], rgb_all[5]
            # alpha at base / x+1 / y+1 / fwd match / bwd match in one forward
            acoords = jnp.stack([
                norm(j, i, f), norm(j + 1, i, f), norm(j, i + 1, f),
                norm(j + ffwd[:, 0], i + ffwd[:, 1], f.astype(jnp.float32) + 1.0),
                norm(j + fbwd[:, 0], i + fbwd[:, 1], f.astype(jnp.float32) - 1.0),
            ], axis=0)
            a_all = _squash_alpha(apply_mlp(params["alpha"],
                                            acoords.reshape(5 * B, 3),
                                            specs.alpha).reshape(5, B, 1))
            a, a_x, a_y, a_fwd, a_bwd = (a_all[k] for k in range(5))

            rgb_pred = rgb1 * a + rgb2 * (1.0 - a)
            rgb_pred_x = rgb1_x * a_x + rgb2_x * (1.0 - a_x)
            rgb_pred_y = rgb1_y * a_y + rgb2_y * (1.0 - a_y)
        else:
            a = 1.0
            rgb_pred, rgb_pred_x, rgb_pred_y = rgb1, rgb1_x, rgb1_y

        l_rgb = rgb_loss(rgb_pred, rgb_gt)
        aux["rgb"] = l_rgb
        total = cfg.rgb_coeff * l_rgb

        if cfg.use_gradient_loss:
            l_grad = gradient_loss(rgb_pred, rgb_pred_x, rgb_pred_y, dx_gt, dy_gt)
            aux["gradient"] = l_grad
            total = total + cfg.gradient_loss_coeff * l_grad

        l_rig1 = rigidity_loss(uv1[0], uv1[3], uv1[4], d, L, cfg.uv_mapping_scale)
        aux["rigidity1"] = l_rig1
        total = total + cfg.rigidity_coeff * l_rig1
        if include_global:
            l_grig1 = rigidity_loss(uv1[0], uv1[7], uv1[8], gd_fg, L,
                                    cfg.uv_mapping_scale)
            aux["global_rigidity1"] = l_grig1
            total = total + cfg.global_rigidity_coeff_fg * l_grig1

        l_flow1 = flow_loss(uv1[0], uv1[5], uv1[6], mfwd, mbwd, L,
                            cfg.uv_mapping_scale, alpha=a)
        aux["flow1"] = l_flow1
        total = total + cfg.optical_flow_coeff * l_flow1

        if dual:
            l_rig2 = rigidity_loss(uv2[0], uv2[3], uv2[4], d, L,
                                   cfg.uv_mapping_scale)
            aux["rigidity2"] = l_rig2
            total = total + cfg.rigidity_coeff * l_rig2
            if include_global:
                l_grig2 = rigidity_loss(uv2[0], uv2[7], uv2[8], gd_bg, L,
                                        cfg.uv_mapping_scale)
                aux["global_rigidity2"] = l_grig2
                total = total + cfg.global_rigidity_coeff_bg * l_grig2

            l_flow2 = flow_loss(uv2[0], uv2[5], uv2[6], mfwd, mbwd, L,
                                cfg.uv_mapping_scale, alpha=1.0 - a)
            aux["flow2"] = l_flow2
            total = total + cfg.optical_flow_coeff * l_flow2

            l_sparse = sparsity_loss(rgb1, a)
            aux["sparsity"] = l_sparse
            total = total + cfg.sparsity_coeff * l_sparse

            l_aflow = alpha_flow_loss(a, a_fwd, a_bwd, mfwd, mbwd)
            aux["alpha_flow"] = l_aflow
            total = total + cfg.alpha_flow_factor * l_aflow

            if include_bootstrap:
                mask_gt = (g[:, 15] if data.packed is not None
                           else data.mask[f, i, j])
                l_boot = alpha_bootstrap_loss(a, mask_gt)
                aux["alpha_bootstrap"] = l_boot
                total = total + cfg.alpha_bootstrapping_factor * l_boot

        aux["total"] = total
        return total, aux

    return loss_fn


def make_scan_step(loss_fn: Callable, optimizer: optax.GradientTransformation,
                   batch: int, H: int, W: int, T: int,
                   mesh=None) -> Callable:
    """One optimizer step as a lax.scan body; carry = (params, opt_state, key).

    With a mesh, the sampled coordinate batch is annotated as sharded over
    the data axis: XLA SPMD partitions the gathers and fused MLP matmuls
    across devices and psums the loss/grad reductions over ICI — exact same
    numerics as single-device (global means, not per-shard means).
    """
    from ..parallel import shard_constraint

    grad_fn = jax.value_and_grad(loss_fn, has_aux=True)

    def step(carry, _, data):
        params, opt_state, key = carry
        key, kj, ki, kf = jax.random.split(key, 4)
        j = shard_constraint(jax.random.randint(kj, (batch,), 0, W), mesh)
        i = shard_constraint(jax.random.randint(ki, (batch,), 0, H), mesh)
        f = shard_constraint(jax.random.randint(kf, (batch,), 0, T), mesh)
        (_, aux), grads = grad_fn(params, data, j, i, f)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state, key), aux

    return step


@partial(jax.jit, static_argnames=("step_fn", "n_steps"), donate_argnums=(0,))
def _run_chunk(carry, data: VideoData, step_fn: Callable, n_steps: int):
    """`data` rides as a traced input (NOT a captured constant — see
    make_loss_fn) so one compile serves any video content of this shape."""
    body = lambda c, x: step_fn(c, x, data)
    carry, auxes = jax.lax.scan(body, carry, None, length=n_steps)
    # per-chunk mean of each logged scalar — tiny D2H transfer per chunk
    return carry, jax.tree_util.tree_map(jnp.mean, auxes)


@dataclasses.dataclass
class FitResult:
    params: Params
    opt_state: object
    iteration: int
    logs: List[Dict[str, float]]


def fit_atlas(params: Params, specs: AtlasSpecs, data: VideoData,
              cfg: AtlasConfig, key: jax.Array,
              start_iteration: int = 0,
              opt_state=None,
              eval_callback: Optional[Callable[[int, Params, object], None]] = None,
              log_callback: Optional[Callable[[int, Dict[str, float]], None]] = None,
              mesh=None) -> FitResult:
    """Run the stage-1 fit from `start_iteration` to `cfg.iters_num - 1`.

    Evaluation cadence replicates the reference: `eval_callback(i, ...)` fires
    when `i % evaluate_every == 0 and i > start_iteration`
    (src/stage1_neural_atlas.py:246-251) — with the default config that is
    exactly once, at iteration 10000.
    """
    T, (H, W) = data.num_frames, data.res
    # one-gather sampling; the scanned fit sees ONLY the pack (fit_view) —
    # the original tensors never enter (or re-upload into) fit HBM
    data = data.with_packed()
    data_fit = data.fit_view()
    optimizer = optax.adam(cfg.learning_rate)
    if opt_state is None:
        opt_state = optimizer.init(params)

    # schedule boundaries where the loss graph changes shape
    def phase_flags(i: int) -> Tuple[bool, bool]:
        include_global = cfg.include_global_rigidity_loss and i <= cfg.stop_global_rigidity
        include_boot = specs.dual and i <= cfg.stop_bootstrapping_iteration
        return include_global, include_boot

    boundaries = sorted({cfg.stop_global_rigidity + 1,
                         cfg.stop_bootstrapping_iteration + 1})
    eval_every = max(1, cfg.evaluate_every)

    step_fns: Dict[Tuple[bool, bool], Callable] = {}
    logs: List[Dict[str, float]] = []
    carry = (params, opt_state, key)

    i = start_iteration
    while i < cfg.iters_num:
        flags = phase_flags(i)
        # chunk end: next schedule boundary, next eval point, or fit end
        nxt = i + max(1, cfg.steps_per_call)
        for b in boundaries:
            if i < b < nxt:
                nxt = b
        next_eval = ((i // eval_every) + 1) * eval_every + 1  # run through i%e==0
        if i < next_eval < nxt:
            nxt = next_eval
        nxt = min(nxt, cfg.iters_num)
        n_steps = nxt - i

        if flags not in step_fns:
            loss_fn = make_loss_fn(specs, cfg, data, *flags)
            step_fns[flags] = make_scan_step(loss_fn, optimizer,
                                             cfg.samples_batch, H, W, T,
                                             mesh=mesh)
        carry, aux_mean = _run_chunk(carry, data_fit,
                                     step_fn=step_fns[flags],
                                     n_steps=n_steps)
        i = nxt
        rec = {k: float(v) for k, v in aux_mean.items()}
        if not np.isfinite(rec["total"]):
            # failure detection: dump a rescue checkpoint with the last
            # finite state and fail loudly (the reference would silently
            # produce garbage; SURVEY.md §5 failure-detection slot)
            from ..utils.checkpoint import save_checkpoint

            rescue = save_checkpoint("deflicker_rescue_checkpoint", {
                "params": carry[0], "opt_state": carry[1], "iteration": i})
            raise FloatingPointError(
                f"non-finite loss at iteration {i - 1}: {rec} "
                f"(state dumped to {rescue})")
        logs.append({"iteration": i - 1, **rec})
        if log_callback is not None:
            log_callback(i - 1, rec)

        last = i - 1
        if (eval_callback is not None and last % eval_every == 0
                and last > start_iteration):
            eval_callback(last, carry[0], carry[1])

    params, opt_state, _ = carry
    return FitResult(params, opt_state, i, logs)


def pretrain_mapping(params: list, spec: IMLPSpec, key: jax.Array,
                     num_frames: int, H: int, W: int,
                     uv_mapping_scale: float, pretrain_iters: int = 100,
                     batch: int = 10000, lr: float = 1e-4) -> list:
    """Identity-init pretraining: drive mapping(x, y, t) ≈ scale * (x, y).

    Same schedule as the reference (src/models/stage_1/unwrap_utils.py:176-198):
    `pretrain_iters` sweeps over all frames, 10k random pixels per frame-step,
    Adam(1e-4) on ||xy * scale - uv||, but run as one scanned device call
    instead of iters*T Python-loop steps.
    """
    L = max(H, W)
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)

    def loss_fn(p, xyt):
        from ..losses import safe_norm

        uv = imlp_apply(p, xyt, spec)
        return jnp.mean(safe_norm(xyt[:, :2] * uv_mapping_scale - uv))

    grad_fn = jax.value_and_grad(loss_fn)

    def step(carry, f):
        p, opt, k = carry
        k, ki, kj = jax.random.split(k, 3)
        i = jax.random.randint(ki, (batch,), 0, H)
        j = jax.random.randint(kj, (batch,), 0, W)
        xyt = normalize_xyt(j, i, jnp.full((batch,), f), L, num_frames)
        loss, grads = grad_fn(p, xyt)
        updates, opt = optimizer.update(grads, opt, p)
        p = optax.apply_updates(p, updates)
        return (p, opt, k), loss

    fs = jnp.tile(jnp.arange(num_frames), pretrain_iters)
    (params, _, _), _ = jax.lax.scan(jax.jit(step), (params, opt_state, key), fs)
    return params
