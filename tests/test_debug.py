"""Numerics sanitizer (utils/debug.py) — the SURVEY.md §5 sanitizer
analog: jax_debug_nans as the "sanitizer build", assert_all_finite as
the scan-compatible spot probe."""

import os
import subprocess
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deflicker_tpu.utils.debug import assert_all_finite


def test_assert_all_finite_passthrough():
    tree = {"a": jnp.ones((4,)), "b": jnp.zeros((2, 2)),
            "i": jnp.arange(3)}          # int leaves are skipped
    out = jax.jit(lambda t: assert_all_finite(t, "tree"))(tree)
    jax.block_until_ready(out)
    np.testing.assert_array_equal(np.asarray(out["a"]), np.ones(4))


def test_assert_all_finite_raises_on_nan():
    x = jnp.array([1.0, np.nan])
    with pytest.raises(Exception, match="non-finite"):
        jax.block_until_ready(
            jax.jit(lambda v: assert_all_finite(v, "x"))(x))


def test_assert_all_finite_inside_scan():
    # the case jax_debug_nans cannot handle: a probe inside a scan body
    def body(c, _):
        c = assert_all_finite(c / 0.5, "carry")
        return c, None

    ok, _ = jax.lax.scan(body, jnp.ones(3), None, length=4)
    jax.block_until_ready(ok)

    def bad_body(c, _):
        c = assert_all_finite(c - c + jnp.log(-jnp.ones(3)), "carry")
        return c, None

    with pytest.raises(Exception, match="non-finite"):
        jax.block_until_ready(
            jax.jit(lambda x: jax.lax.scan(bad_body, x, None, length=2))(
                jnp.ones(3)))


def test_debug_nans_env_hook():
    """DEFLICKER_DEBUG_NANS=1 at import flips jax_debug_nans globally and
    a NaN-producing jit raises at the producing primitive.  Subprocess:
    the flag is global process state the rest of the suite must not see."""
    code = (
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "import deflicker_tpu\n"
        "assert jax.config.jax_debug_nans, 'env hook did not enable'\n"
        "import jax.numpy as jnp\n"
        "try:\n"
        "    jax.jit(lambda x: x / x)(jnp.zeros(2)).block_until_ready()\n"
        "except FloatingPointError:\n"
        "    print('SANITIZER_RAISED')\n"
    )
    env = dict(os.environ, DEFLICKER_DEBUG_NANS="1")
    out = subprocess.run([sys.executable, "-c", code], env=env,
                         capture_output=True, text=True, timeout=300)
    assert "SANITIZER_RAISED" in out.stdout, (out.stdout, out.stderr)
