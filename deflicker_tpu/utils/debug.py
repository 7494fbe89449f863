"""Numerics sanitizer — the race-detector/sanitizer analog for a JAX
pipeline (SURVEY.md §5: the reference has no sanitizer story at all; the
designated analog here is JAX's NaN/Inf debugging machinery).

Two layers, both off by default:

  * `enable_numerics_debug()` / `DEFLICKER_DEBUG_NANS=1` — flips
    `jax_debug_nans` + `jax_debug_infs`: any jitted computation whose
    OUTPUT contains a NaN/Inf is automatically re-run op-by-op un-jitted
    and raises `FloatingPointError` at the exact primitive that produced
    it.  This is the "sanitizer build": ~order-of-magnitude slower (and
    on a remotely-attached TPU the eager re-run crosses the tunnel per
    op), so it is a debugging mode, not a production guard.  The
    production guard is the always-on finite-loss check + rescue
    checkpoint in `atlas/engine.fit_atlas` (which keeps the fit jitted
    and fails loudly with recoverable state).

  * `assert_all_finite(tree, name)` — a checkify-free, jit-compatible
    spot probe: folds a finiteness predicate over a pytree and raises
    host-side at the next readback via `jax.debug.callback` (works under
    `lax.scan`, where `jax_debug_nans` cannot re-run eagerly).  Used by
    tests and available to users instrumenting custom losses.
"""

from __future__ import annotations

import os

__all__ = ["enable_numerics_debug", "numerics_debug_enabled",
           "assert_all_finite"]

_ENABLED = False


def numerics_debug_enabled() -> bool:
    return _ENABLED


def enable_numerics_debug() -> None:
    """Turn on JAX's NaN/Inf sanitizer globally (jax_debug_nans +
    jax_debug_infs).  Idempotent.  Called at package import when
    DEFLICKER_DEBUG_NANS=1."""
    global _ENABLED
    if _ENABLED:
        return
    import jax

    jax.config.update("jax_debug_nans", True)
    jax.config.update("jax_debug_infs", True)
    _ENABLED = True


def assert_all_finite(tree, name: str = "value"):
    """Jit-compatible finiteness probe over a pytree of arrays.

    Returns the tree unchanged (so it can be threaded through a
    computation without breaking fusion); if any leaf contains a
    non-finite element, raises FloatingPointError on the host when the
    enclosing computation's results are consumed.  Unlike
    `jax_debug_nans` this works inside `lax.scan` bodies and costs one
    small all-reduce per call instead of a global eager re-run."""
    import jax
    import jax.numpy as jnp

    leaves = jax.tree_util.tree_leaves(tree)
    finite = jnp.array(True)
    for leaf in leaves:
        if jnp.issubdtype(jnp.asarray(leaf).dtype, jnp.floating):
            finite = jnp.logical_and(finite, jnp.all(jnp.isfinite(leaf)))

    def _raise(ok):
        if not bool(ok):
            raise FloatingPointError(
                f"non-finite values detected in {name!r} "
                "(DEFLICKER_DEBUG_NANS=1 re-runs the computation "
                "op-by-op to locate the producing primitive)")

    jax.debug.callback(_raise, finite)
    return tree


if os.environ.get("DEFLICKER_DEBUG_NANS") == "1":  # pragma: no cover
    enable_numerics_debug()
