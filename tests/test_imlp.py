"""IMLP unit tests: positional encoding layout, forward math, skip/detach
semantics — verified against torch-built oracles (torch is used as a test
oracle only; the framework itself is torch-free)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from deflicker_tpu.models.imlp import (
    IMLPSpec, imlp_init, imlp_apply, positional_encoding)


def torch_positional_encoding(x_np, positional_dim):
    import torch
    x = torch.from_numpy(x_np)
    b = torch.tensor([(2 ** j) * np.pi for j in range(positional_dim)])
    proj = torch.einsum("ij, k -> ijk", x, b)
    mapped = torch.cat((torch.sin(proj), torch.cos(proj)), dim=1)
    return mapped.transpose(2, 1).contiguous().view(mapped.size(0), -1).numpy()


def test_positional_encoding_matches_reference_layout(rng):
    x = rng.standard_normal((7, 3)).astype(np.float32)
    got = np.asarray(positional_encoding(jnp.asarray(x), 5))
    want = torch_positional_encoding(x.astype(np.float64), 5)
    # float32 argument rounding is amplified by the 2^4*pi frequency
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=2e-4)


def _manual_forward(params, x, spec):
    """Numpy re-derivation of the IMLP forward for cross-checking."""
    if spec.use_positional:
        x = np.asarray(positional_encoding(jnp.asarray(x), spec.positional_dim))
    inp = x.copy()
    h = x
    for i, layer in enumerate(params):
        if i > 0:
            h = np.maximum(h, 0.0)
        if i in spec.skip_layers:
            h = np.concatenate([h, inp], axis=-1)
        h = h @ np.asarray(layer["w"]) + np.asarray(layer["b"])
    return np.tanh(h)


@pytest.mark.parametrize("spec", [
    IMLPSpec(3, 2, hidden_dim=32, use_positional=False, num_layers=6, skip_layers=()),
    IMLPSpec(2, 3, hidden_dim=32, use_positional=True, positional_dim=10,
             num_layers=8, skip_layers=(4, 7)),
    IMLPSpec(3, 1, hidden_dim=16, use_positional=True, positional_dim=5,
             num_layers=8, skip_layers=()),
])
def test_forward_matches_manual(spec, rng):
    params = imlp_init(jax.random.key(0), spec)
    x = rng.standard_normal((11, spec.input_dim)).astype(np.float32)
    got = np.asarray(imlp_apply(params, jnp.asarray(x), spec))
    want = _manual_forward(params, x, spec)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert got.shape == (11, spec.output_dim)
    assert np.all(np.abs(got) <= 1.0)


def test_skip_input_gradient_is_stopped():
    """Gradients must not flow through the skip concat (the reference
    detaches the encoded input copy: implicit_neural_networks.py:69)."""
    spec = IMLPSpec(2, 1, hidden_dim=8, use_positional=False,
                    num_layers=3, skip_layers=(1,), use_tanh=False)
    params = imlp_init(jax.random.key(1), spec)

    def out_sum(x):
        return jnp.sum(imlp_apply(params, x, spec))

    x = jnp.ones((4, 2))
    g = jax.grad(out_sum)(x)

    # Build the same net WITHOUT stop_gradient to show the difference.
    hi = jax.lax.Precision.HIGHEST

    def out_sum_nostop(x):
        h = x
        inp = x
        for i, layer in enumerate(params):
            if i > 0:
                h = jax.nn.relu(h)
            if i in spec.skip_layers:
                h = jnp.concatenate([h, inp], axis=-1)
            h = jnp.dot(h, layer["w"], precision=hi) + layer["b"]
        return jnp.sum(h)

    g_nostop = jax.grad(out_sum_nostop)(x)
    assert not np.allclose(np.asarray(g), np.asarray(g_nostop))

    # With stop_gradient the gradient equals the path that treats the skip
    # branch as a constant.
    def out_sum_const_skip(x):
        h = x
        inp = jax.lax.stop_gradient(x)
        for i, layer in enumerate(params):
            if i > 0:
                h = jax.nn.relu(h)
            if i in spec.skip_layers:
                h = jnp.concatenate([h, inp], axis=-1)
            h = jnp.dot(h, layer["w"], precision=hi) + layer["b"]
        return jnp.sum(h)

    g_const = jax.grad(out_sum_const_skip)(x)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_const), rtol=1e-6)


def test_init_statistics_match_torch_linear_default():
    spec = IMLPSpec(3, 2, hidden_dim=256, use_positional=False,
                    num_layers=6, skip_layers=())
    params = imlp_init(jax.random.key(2), spec)
    W = np.asarray(params[1]["w"])  # fan_in = 256
    bound = 1.0 / np.sqrt(256)
    assert np.abs(W).max() <= bound
    assert np.abs(W).max() > 0.9 * bound  # actually uses the range
