"""Stage-1 atlas losses as pure, static-shape jittable functions.

Numerically equivalent to the reference's loss library
(src/models/stage_1/loss_utils.py), with one structural change demanded by
XLA: the reference selects dynamic-size subsets of the batch for the flow
losses (boolean indexing); we keep static shapes and reduce with
multiply-by-mask, normalizing by the mask population — the same mean over
the same set of samples.

The engine (deflicker_tpu.atlas.engine) batches all coordinate variants into
a single fused MLP forward; these functions consume the already-evaluated
per-sample quantities.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def safe_norm(x: jax.Array, axis: int = -1) -> jax.Array:
    """L2 norm with a well-defined gradient at 0.

    `jnp.linalg.norm` has gradient 0/0 = NaN at exactly-zero vectors.  The
    reference never evaluates the norm there because it dynamically FILTERS
    samples before the norm (loss_utils.py:326-356); our static-shape
    multiply-by-mask formulation evaluates it for masked-out samples too —
    where flow is zero and nearby uv values can collide bitwise — and
    0 * NaN would poison the masked mean.  sqrt(max(ss, tiny)) has zero
    gradient at ss == 0 and is exact for ||x|| > 1e-12.
    """
    ss = jnp.sum(x * x, axis=axis)
    return jnp.sqrt(jnp.maximum(ss, 1e-24))


def masked_mean(values: jax.Array, mask: jax.Array) -> jax.Array:
    """sum(values * mask) / sum(mask), 0 when the mask is empty.

    `mean()` over a boolean-selected subset in the reference.
    """
    mask = mask.astype(values.dtype)
    denom = jnp.sum(mask)
    return jnp.where(denom > 0, jnp.sum(values * mask) / jnp.maximum(denom, 1.0), 0.0)


def rgb_loss(rgb_pred: jax.Array, rgb_gt: jax.Array) -> jax.Array:
    """mean ||pred - gt||^2 over the batch (reference:
    src/stage1_neural_atlas.py:194)."""
    return jnp.mean(jnp.sum((rgb_pred - rgb_gt) ** 2, axis=-1))


def gradient_loss(rgb_pred: jax.Array, rgb_xplus1: jax.Array, rgb_yplus1: jax.Array,
                  dx_gt: jax.Array, dy_gt: jax.Array) -> jax.Array:
    """Finite-difference color-gradient matching (paper Eq. 7; reference:
    src/models/stage_1/loss_utils.py:134-170).

    rgb_xplus1 / rgb_yplus1 are the reconstructed colors at (x+1, y, t) and
    (x, y+1, t); dx_gt/dy_gt the precomputed frame derivatives at the sample.
    """
    rgb_dx_out = rgb_xplus1 - rgb_pred
    rgb_dy_out = rgb_yplus1 - rgb_pred
    ex = jnp.sum((dx_gt - rgb_dx_out) ** 2, axis=-1)
    ey = jnp.sum((dy_gt - rgb_dy_out) ** 2, axis=-1)
    return jnp.mean(ex + ey)


def rigidity_loss(uv: jax.Array, uv_yminus: jax.Array, uv_xminus: jax.Array,
                  derivative_amount: float, larger_dim: int,
                  uv_mapping_scale: float = 1.0,
                  reduce: bool = True) -> jax.Array:
    """Jacobian rigidity loss (paper Eq. 9; reference:
    src/models/stage_1/loss_utils.py:227-278).

    uv          : mapping at (x, y, t)
    uv_yminus   : mapping at (x, y - d, t)
    uv_xminus   : mapping at (x - d, y, t)

    J = [[du/dx, du/dy], [dv/dx, dv/dy]] via one-sided differences scaled to
    uv units; loss = ||J^T J||_F + ||(J^T J)^-1||_F, where the inverse uses
    diagonally-regularized (a+1e-3, d+1e-3) entries — exactly the
    reference's regularization placement.
    """
    scale = (larger_dim / 2.0) / (uv_mapping_scale * derivative_amount)
    du_dx = (uv[..., 0] - uv_xminus[..., 0]) * scale
    du_dy = (uv[..., 0] - uv_yminus[..., 0]) * scale
    dv_dx = (uv[..., 1] - uv_xminus[..., 1]) * scale
    dv_dy = (uv[..., 1] - uv_yminus[..., 1]) * scale

    # JtJ entries
    a = du_dx * du_dx + dv_dx * dv_dx
    b = du_dx * du_dy + dv_dx * dv_dy
    c = b
    d = du_dy * du_dy + dv_dy * dv_dy

    ar = a + 0.001
    dr = d + 0.001
    det = ar * dr - b * c
    # the reference divides by the raw det (loss_utils.py:270-271); a det
    # crossing zero at a degenerate Jacobian turns the whole fit NaN — keep
    # a sign-preserving floor (exact away from |det| < 1e-12)
    det = jnp.where(det >= 0, jnp.maximum(det, 1e-12),
                    jnp.minimum(det, -1e-12))
    inv_a = dr / det
    inv_b = -b / det
    inv_c = -c / det
    inv_d = ar / det

    # sqrt at exactly 0 has an infinite gradient; a locally-saturated
    # mapping (tanh pinned at +-1) collapses all finite differences to 0 and
    # would NaN the fit — floor keeps the gradient finite (exact elsewhere)
    norm_jtj = jnp.sqrt(jnp.maximum(a * a + b * b + c * c + d * d, 1e-24))
    norm_inv = jnp.sqrt(jnp.maximum(
        inv_a ** 2 + inv_b ** 2 + inv_c ** 2 + inv_d ** 2, 1e-24))
    per_sample = norm_jtj + norm_inv
    return jnp.mean(per_sample) if reduce else per_sample


def flow_loss(uv: jax.Array, uv_match_fwd: jax.Array, uv_match_bwd: jax.Array,
              mask_fwd: jax.Array, mask_bwd: jax.Array,
              larger_dim: int, uv_mapping_scale: float,
              alpha: jax.Array | float = 1.0) -> jax.Array:
    """Optical-flow consistency loss (paper Eq. 11; reference:
    src/models/stage_1/loss_utils.py:299-322).

    uv_match_fwd/bwd: mapping evaluated at the flow-displaced coordinates
    (x + f_x, y + f_y, t +- 1).  mask_*: 1 where the flow sample passed the
    consistency check (and the displaced frame exists).  alpha weights each
    sample (per reference use_alpha=True); pass 1.0 for the single-atlas path
    where alpha is hardwired to one.

    Deliberate scope note: the reference's `get_corresponding_flow_matches`
    carries dormant multi-distance machinery (`mask_level > 0`,
    loss_utils.py:326-356) that is unreachable in its own pipeline — the
    flow tensors it loads are single-level, so only level 0 ever executes.
    This framework implements exactly that reachable level-0 semantics.
    """
    scale = larger_dim / (2.0 * uv_mapping_scale)
    err_fwd = safe_norm(uv_match_fwd - uv) * scale
    err_bwd = safe_norm(uv_match_bwd - uv) * scale
    if isinstance(alpha, (int, float)):
        alpha_w = jnp.asarray(alpha, err_fwd.dtype)
        a_fwd = err_fwd * alpha_w
        a_bwd = err_bwd * alpha_w
    else:
        a = jnp.squeeze(alpha, -1) if alpha.ndim == err_fwd.ndim + 1 else alpha
        a_fwd = err_fwd * a
        a_bwd = err_bwd * a
    return 0.5 * masked_mean(a_bwd, mask_bwd) + 0.5 * masked_mean(a_fwd, mask_fwd)


def sparsity_loss(rgb_fg: jax.Array, alpha: jax.Array) -> jax.Array:
    """mean ||rgb_fg * (1 - alpha)||^2 — discourages the foreground atlas
    from explaining background pixels (reference:
    src/stage1_neural_atlas_seg.py:244-248)."""
    resid = rgb_fg * (1.0 - alpha)
    return jnp.mean(jnp.sum(resid ** 2, axis=-1))


def alpha_bootstrap_loss(alpha: jax.Array, mask_gt: jax.Array) -> jax.Array:
    """BCE between predicted alpha (already squashed into (0, 1)) and the
    segmentation mask (reference: src/stage1_neural_atlas_seg.py:301-302)."""
    alpha = jnp.squeeze(alpha, -1) if alpha.ndim == mask_gt.ndim + 1 else alpha
    return jnp.mean(-mask_gt * jnp.log(alpha) - (1.0 - mask_gt) * jnp.log(1.0 - alpha))


def alpha_flow_loss(alpha: jax.Array, alpha_match_fwd: jax.Array,
                    alpha_match_bwd: jax.Array,
                    mask_fwd: jax.Array, mask_bwd: jax.Array) -> jax.Array:
    """L1 alpha consistency along flow (paper Eq. 12; reference:
    src/models/stage_1/loss_utils.py:385-408)."""
    sq = lambda v: jnp.squeeze(v, -1) if v.ndim == mask_fwd.ndim + 1 else v
    a, af, ab = sq(alpha), sq(alpha_match_fwd), sq(alpha_match_bwd)
    l_next = masked_mean(jnp.abs(a - af), mask_fwd)
    l_prev = masked_mean(jnp.abs(ab - a), mask_bwd)
    return 0.5 * (l_next + l_prev)
