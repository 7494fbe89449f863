"""deflicker_tpu — a TPU-native blind video deflickering framework.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
ChenyangLEI/All-In-One-Deflicker ("Blind Video Deflickering by Neural
Filtering with a Flawed Atlas", CVPR 2023):

  stage 0: video <-> frame I/O on host (`deflicker_tpu.io`)
  stage 0.5: RAFT optical flow, batched over frame pairs (`deflicker_tpu.flow`)
  stage 1: per-video test-time fit of a neural layered atlas
           (`deflicker_tpu.atlas`) — coordinate MLPs trained with
           rgb/flow/rigidity/gradient losses over sampled (x,y,t) pixels,
           fully on device via a scanned, fused train step
  stage 2: feed-forward neural filter (U-Net) + sequential local
           refinement (ConvLSTM net) (`deflicker_tpu.filter`)

Parallelism lives in `deflicker_tpu.parallel`: a single `jax.sharding.Mesh`
with batch-sharded atlas fitting, frame-sharded rendering/filtering and
pair-sharded flow, relying on XLA SPMD collectives over ICI.
"""

__version__ = "0.3.0"


def _enable_persistent_compile_cache() -> None:
    """Point XLA's persistent compilation cache at a per-user directory.

    The fit/flow/filter programs are large scanned jits (minutes to
    compile through a remote compile service); every pipeline process is
    short-lived, so without a disk cache each stage repays its compiles.
    Measured here: second-process jit cost drops from full compile to
    ~20 ms.  Respects an existing user configuration
    (JAX_COMPILATION_CACHE_DIR / jax.config) and is disabled by
    DEFLICKER_NO_COMPILE_CACHE=1."""
    import os

    if os.environ.get("DEFLICKER_NO_COMPILE_CACHE") == "1":
        return
    if os.environ.get("JAX_COMPILATION_CACHE_DIR"):
        return
    try:
        import jax

        if getattr(jax.config, "jax_compilation_cache_dir", None):
            return
        cache = os.path.join(os.path.expanduser("~"), ".cache",
                             "deflicker_tpu", "xla")
        os.makedirs(cache, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:          # cache is an optimization, never a failure
        pass


_enable_persistent_compile_cache()


def _enable_numerics_debug_from_env() -> None:
    """DEFLICKER_DEBUG_NANS=1: the sanitizer build (SURVEY.md §5) —
    jax_debug_nans/jax_debug_infs re-run any NaN/Inf-producing jit
    op-by-op and raise at the producing primitive.  Debug mode only;
    the always-on production guard is the finite-loss check + rescue
    checkpoint in atlas/engine.fit_atlas."""
    import os

    if os.environ.get("DEFLICKER_DEBUG_NANS") == "1":
        from .utils.debug import enable_numerics_debug

        enable_numerics_debug()


_enable_numerics_debug_from_env()


def __getattr__(name):
    # lazy: `from deflicker_tpu import Deflickerer` without importing the
    # full pipeline stack at package import
    if name == "Deflickerer":
        from .api import Deflickerer

        return Deflickerer
    raise AttributeError(f"module 'deflicker_tpu' has no attribute {name!r}")
