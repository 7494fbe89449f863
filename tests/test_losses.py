"""Loss unit tests vs hand-computed values and torch-oracle formulas."""

import numpy as np
import jax.numpy as jnp

from deflicker_tpu.losses import (
    rgb_loss, gradient_loss, rigidity_loss, flow_loss,
    sparsity_loss, alpha_bootstrap_loss, alpha_flow_loss, masked_mean)


def test_masked_mean():
    v = jnp.array([1.0, 2.0, 3.0, 4.0])
    m = jnp.array([1.0, 0.0, 1.0, 0.0])
    assert float(masked_mean(v, m)) == 2.0
    assert float(masked_mean(v, jnp.zeros(4))) == 0.0


def test_rgb_loss_hand():
    pred = jnp.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    gt = jnp.array([[0.0, 1.0, 0.0], [1.0, 1.0, 0.0]])
    # ||.||^2 per row: 1, 1 -> mean 1
    assert np.isclose(float(rgb_loss(pred, gt)), 1.0)


def test_gradient_loss_hand():
    pred = jnp.zeros((2, 3))
    xp = jnp.full((2, 3), 0.1)
    yp = jnp.full((2, 3), 0.2)
    dx = jnp.full((2, 3), 0.1)
    dy = jnp.full((2, 3), 0.0)
    # dx matches exactly -> ex = 0; dy error = 0.2 per channel
    # ey = 3 * 0.2^2 = 0.12
    got = float(gradient_loss(pred, xp, yp, dx, dy))
    assert np.isclose(got, 0.12, atol=1e-6)


def _torch_rigidity(uv, uv_ym, uv_xm, d, L, scale):
    """Oracle: reference formula re-derived independently in numpy."""
    s = (L / 2.0) / (scale * d)
    du_dx = (uv[:, 0] - uv_xm[:, 0]) * s
    du_dy = (uv[:, 0] - uv_ym[:, 0]) * s
    dv_dx = (uv[:, 1] - uv_xm[:, 1]) * s
    dv_dy = (uv[:, 1] - uv_ym[:, 1]) * s
    out = []
    for k in range(uv.shape[0]):
        J = np.array([[du_dx[k], du_dy[k]], [dv_dx[k], dv_dy[k]]])
        JtJ = J.T @ J
        a, b = JtJ[0, 0] + 1e-3, JtJ[0, 1]
        c, dd = JtJ[1, 0], JtJ[1, 1] + 1e-3
        inv = np.array([[dd, -b], [-c, a]]) / (a * dd - b * c)
        out.append(np.sqrt((JtJ ** 2).sum()) + np.sqrt((inv ** 2).sum()))
    return np.mean(out)


def test_rigidity_loss_identity_mapping_is_minimal(rng):
    # A perfectly rigid (identity * scale) mapping: J = I, JtJ = I.
    L, d, scale = 64, 1, 0.8
    n = 16
    j = rng.integers(2, 50, n).astype(np.float64)
    i = rng.integers(2, 50, n).astype(np.float64)
    to_uv = lambda jj, ii: np.stack([jj / (L / 2) - 1, ii / (L / 2) - 1], -1) * scale
    uv = to_uv(j, i)
    uv_ym = to_uv(j, i - d)
    uv_xm = to_uv(j - d, i)
    got = float(rigidity_loss(jnp.asarray(uv), jnp.asarray(uv_ym),
                              jnp.asarray(uv_xm), d, L, scale))
    # JtJ = I -> ||I||_F + ||inv||_F ~= sqrt(2) + sqrt(2) (with the 1e-3 reg)
    assert np.isclose(got, np.sqrt(2) + np.sqrt(2.0) / (1.001), rtol=1e-2)


def test_rigidity_loss_matches_oracle(rng):
    uv = rng.standard_normal((8, 2))
    uv_ym = uv + 0.01 * rng.standard_normal((8, 2))
    uv_xm = uv + 0.01 * rng.standard_normal((8, 2))
    got = float(rigidity_loss(jnp.asarray(uv), jnp.asarray(uv_ym),
                              jnp.asarray(uv_xm), 1, 100, 0.8))
    want = _torch_rigidity(uv, uv_ym, uv_xm, 1, 100, 0.8)
    assert np.isclose(got, want, rtol=1e-5)


def test_flow_loss_masked_and_scaled():
    uv = jnp.zeros((4, 2))
    ufwd = jnp.array([[0.1, 0.0]] * 4)   # err 0.1 in uv units
    ubwd = jnp.array([[0.0, 0.2]] * 4)
    mfwd = jnp.array([1.0, 1.0, 0.0, 0.0])
    mbwd = jnp.array([1.0, 0.0, 0.0, 0.0])
    L, s = 100, 0.8
    got = float(flow_loss(uv, ufwd, ubwd, mfwd, mbwd, L, s))
    scale = L / (2 * s)
    want = 0.5 * (0.2 * scale) + 0.5 * (0.1 * scale)
    assert np.isclose(got, want, rtol=1e-6)


def test_flow_loss_alpha_weighting():
    uv = jnp.zeros((2, 2))
    ufwd = jnp.array([[0.1, 0.0]] * 2)
    ubwd = jnp.array([[0.1, 0.0]] * 2)
    m = jnp.array([1.0, 1.0])
    alpha = jnp.array([[1.0], [0.0]])
    got = float(flow_loss(uv, ufwd, ubwd, m, m, 100, 0.8, alpha=alpha))
    # alpha halves the mean (one sample weighted 0)
    full = float(flow_loss(uv, ufwd, ubwd, m, m, 100, 0.8))
    assert np.isclose(got, 0.5 * full, rtol=1e-6)


def test_sparsity_loss_hand():
    rgb = jnp.array([[1.0, 0.0, 0.0]])
    alpha = jnp.array([[0.5]])
    assert np.isclose(float(sparsity_loss(rgb, alpha)), 0.25)


def test_alpha_bootstrap_bce():
    alpha = jnp.array([[0.9], [0.1]])
    gt = jnp.array([1.0, 0.0])
    want = np.mean([-np.log(0.9), -np.log(0.9)])
    assert np.isclose(float(alpha_bootstrap_loss(alpha, gt)), want, rtol=1e-4)


def test_alpha_flow_loss_hand():
    a = jnp.array([[0.5], [0.5]])
    af = jnp.array([[0.7], [0.5]])
    ab = jnp.array([[0.5], [0.9]])
    m = jnp.array([1.0, 1.0])
    got = float(alpha_flow_loss(a, af, ab, m, m))
    want = 0.5 * (np.mean([0.2, 0.0]) + np.mean([0.0, 0.4]))
    assert np.isclose(got, want, rtol=1e-6)
