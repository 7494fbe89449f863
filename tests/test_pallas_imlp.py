"""Fused-IMLP Pallas kernel vs the XLA reference path (interpret mode on
CPU; the same kernel compiles with Mosaic on a real TPU)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflicker_tpu.models.imlp import (IMLPSpec, imlp_apply, imlp_init,
                                       positional_encoding)
from deflicker_tpu.ops.pallas.imlp_kernel import fused_imlp_linear_chain

SPECS = {
    "mapping": IMLPSpec(input_dim=3, output_dim=2, hidden_dim=64,
                        use_positional=False, num_layers=4, skip_layers=()),
    "atlas": IMLPSpec(input_dim=2, output_dim=3, hidden_dim=64,
                      use_positional=True, positional_dim=6,
                      num_layers=8, skip_layers=(4, 7)),
}


def _encoded(spec, x):
    return positional_encoding(x, spec.positional_dim) if spec.use_positional else x


@pytest.mark.parametrize("name", list(SPECS))
def test_forward_matches_xla(name):
    spec = SPECS[name]
    params = imlp_init(jax.random.key(0), spec)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.uniform(-1, 1, (300, spec.input_dim)).astype(np.float32))

    ref = imlp_apply(params, x, spec)
    xe = _encoded(spec, x)
    fused = fused_imlp_linear_chain(params, xe, spec, tile=128, interpret=True)
    np.testing.assert_allclose(np.asarray(jnp.tanh(fused)), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("name", list(SPECS))
def test_grads_match_xla(name):
    """Forward AND backward (params + input grads, incl. the stop-gradient
    skip semantics) agree with the XLA path."""
    spec = SPECS[name]
    params = imlp_init(jax.random.key(1), spec)
    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.uniform(-1, 1, (256, spec.input_dim)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (256, spec.output_dim)).astype(np.float32))

    def loss_ref(p, xx):
        return jnp.mean((imlp_apply(p, xx, spec) - tgt) ** 2)

    def loss_fused(p, xx):
        xe = _encoded(spec, xx)
        y = jnp.tanh(fused_imlp_linear_chain(p, xe, spec, tile=128,
                                             interpret=True))
        return jnp.mean((y - tgt) ** 2)

    (l_ref, g_ref) = jax.value_and_grad(loss_ref, argnums=(0, 1))(params, x)
    (l_f, g_f) = jax.value_and_grad(loss_fused, argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(l_f), float(l_ref), rtol=1e-5)
    flat_ref = jax.tree_util.tree_leaves(g_ref)
    flat_f = jax.tree_util.tree_leaves(g_f)
    assert len(flat_ref) == len(flat_f)
    for a, b in zip(flat_f, flat_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-5)


@pytest.mark.parametrize("name", list(SPECS))
def test_stash_bwd_matches_remat(name):
    """stash_bwd=True (HBM activation stash) must produce bit-identical
    forward AND gradients to the default remat backward — the stash holds
    exactly the cdt cast the remat recompute makes."""
    spec = SPECS[name]
    params = imlp_init(jax.random.key(3), spec)
    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.uniform(-1, 1, (256, spec.input_dim)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (256, spec.output_dim)).astype(np.float32))

    def loss(stash_bwd):
        def f(p, xx):
            xe = _encoded(spec, xx)
            y = jnp.tanh(fused_imlp_linear_chain(p, xe, spec, tile=128,
                                                 interpret=True,
                                                 stash_bwd=stash_bwd))
            return jnp.mean((y - tgt) ** 2)
        return f

    (l_r, g_r) = jax.value_and_grad(loss(False), argnums=(0, 1))(params, x)
    (l_s, g_s) = jax.value_and_grad(loss(True), argnums=(0, 1))(params, x)
    assert float(l_s) == float(l_r)
    for a, b in zip(jax.tree_util.tree_leaves(g_s),
                    jax.tree_util.tree_leaves(g_r)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name", list(SPECS))
def test_v2_matches_v1(name):
    """The v2 kernel bodies (native-contraction dot_generals, split-skip
    matmuls — no in-kernel transposes or concats) must match the v1 path's
    forward and gradients to float tolerance (the skip-layer forward split
    changes one partial-sum rounding; everything else is the same math)."""
    spec = SPECS[name]
    params = imlp_init(jax.random.key(4), spec)
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(-1, 1, (256, spec.input_dim)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (256, spec.output_dim)).astype(np.float32))

    def loss(v2):
        def f(p, xx):
            xe = _encoded(spec, xx)
            y = jnp.tanh(fused_imlp_linear_chain(p, xe, spec, tile=128,
                                                 interpret=True, v2=v2))
            return jnp.mean((y - tgt) ** 2)
        return f

    (l_1, g_1) = jax.value_and_grad(loss(False), argnums=(0, 1))(params, x)
    (l_2, g_2) = jax.value_and_grad(loss(True), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(l_2), float(l_1), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_2),
                    jax.tree_util.tree_leaves(g_1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


@pytest.mark.parametrize("name", list(SPECS))
def test_pipe_matches_default(name):
    """The software-pipelined half-tile bodies (pipe=True) must match the
    default full-tile kernel's forward and gradients to float tolerance —
    the only numeric change is dW/db partial-sum regrouping across the two
    halves."""
    spec = SPECS[name]
    params = imlp_init(jax.random.key(5), spec)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.uniform(-1, 1, (256, spec.input_dim)).astype(np.float32))
    tgt = jnp.asarray(rng.uniform(-1, 1, (256, spec.output_dim)).astype(np.float32))

    def loss(pipe):
        def f(p, xx):
            xe = _encoded(spec, xx)
            y = jnp.tanh(fused_imlp_linear_chain(p, xe, spec, tile=128,
                                                 interpret=True, v2=True,
                                                 pipe=pipe))
            return jnp.mean((y - tgt) ** 2)
        return f

    (l_0, g_0) = jax.value_and_grad(loss(False), argnums=(0, 1))(params, x)
    (l_p, g_p) = jax.value_and_grad(loss(True), argnums=(0, 1))(params, x)
    np.testing.assert_allclose(float(l_p), float(l_0), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_p),
                    jax.tree_util.tree_leaves(g_0)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=2e-4, atol=1e-6)


def test_batch_padding():
    spec = SPECS["mapping"]
    params = imlp_init(jax.random.key(2), spec)
    x = jnp.asarray(np.random.default_rng(2).uniform(
        -1, 1, (77, 3)).astype(np.float32))   # not a tile multiple
    ref = imlp_apply(params, x, spec)
    fused = jnp.tanh(fused_imlp_linear_chain(params, x, spec, tile=64,
                                             interpret=True))
    assert fused.shape == ref.shape
    np.testing.assert_allclose(np.asarray(fused), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)
