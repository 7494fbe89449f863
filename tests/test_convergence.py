"""Stage-1 convergence parity (CI-sized): torch reference fit vs ours.

The full trajectory study lives in bench_convergence.py / CONVERGENCE.md
(1000+ iterations on real video).  This test runs the same
identical-init / identical-sample-stream comparison at a size the suite
can afford and asserts the loss trajectories track statistically.
"""

import sys

import numpy as np
import pytest

import jax

from deflicker_tpu.atlas.engine import build_specs, init_models
from deflicker_tpu.config import AtlasConfig

import bench_convergence as bc

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

T, H, W = 4, 24, 36
ITERS = 150


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = AtlasConfig(
        fit_precision="highest", use_pallas_imlp=False,
        samples_batch=256, iters_num=ITERS,
        stop_global_rigidity=60,
        global_rigidity_derivative_amount_fg=8,
        global_rigidity_derivative_amount_bg=8,
        number_of_channels_mapping1=64, number_of_layers_mapping1=4,
        number_of_channels_atlas=64, number_of_layers_atlas=6,
        pretrain_iter_number=10)
    specs = build_specs(cfg, dual=False)
    params = jax.tree_util.tree_map(
        np.asarray, init_models(jax.random.key(0), specs))

    # real video + real (Farneback) flow: random-tensor data makes the
    # rigidity Jacobian ill-conditioned and the two fp32 implementations
    # diverge chaotically within ~5 iterations — on real data (the actual
    # workload, and the harness's 1000-iter finding) they track
    video = "/root/reference/data/test/Winter_Scenes_in_Holland.mp4"
    data = bc.build_data(video, T, H, W)
    rng = np.random.default_rng(1)
    fit_idx, pre_idx = bc.draw_indices(rng, ITERS, 256, 10, 256, T, H, W)
    return cfg, specs, params, data, fit_idx, pre_idx


def test_loss_trajectories_track(tiny_setup):
    pytest.importorskip("torch")
    cfg, specs, params, data, fit_idx, pre_idx = tiny_setup
    tres = bc.run_torch(params, data, fit_idx, pre_idx, cfg, specs,
                        psnr_every=ITERS)
    jres = bc.run_jax(params, data, fit_idx, pre_idx, cfg, specs,
                      psnr_every=ITERS)

    # identical sampling + fp32: iteration 0 (pre-update) must agree to
    # float noise — it proves init/pretrain/data/objective parity.  Later
    # iterations only track statistically: Adam's first steps are
    # ~±lr*sign(grad), so fp32 associativity noise flips near-zero-grad
    # signs and the trajectories separate chaotically while following the
    # same descent path.
    np.testing.assert_allclose(jres["loss"][0], tres["loss"][0], rtol=1e-4)
    # the windowed TOTAL loss at this tiny scale is reduction-order
    # sensitive (changing only XLA's host-device-count flag moves it ~20%),
    # and the reference ITSELF drifts run to run: the realistic-scale
    # null-band control measured torch-vs-torch final-window ratios up to
    # 1.60x (bench_convergence.py --control 3,
    # BENCH_CONVERGENCE_CONTROL.json).  Hold jax to the IN-SITU band: a
    # second torch fit with a different seed (what an unseeded reference
    # rerun redraws) gives the torch-vs-torch ratio at THIS scale; jax
    # must sit within max(that, the measured 1.60 control) plus headroom.
    win = ITERS // 5
    t_final = float(np.mean(tres["loss"][-win:]))
    j_final = float(np.mean(jres["loss"][-win:]))
    params_b = jax.tree_util.tree_map(
        np.asarray, init_models(jax.random.key(1), specs))
    fit_b, pre_b = bc.draw_indices(np.random.default_rng(2), ITERS, 256, 10,
                                   256, T, H, W)
    tres_b = bc.run_torch(params_b, data, fit_b, pre_b, cfg, specs,
                          psnr_every=ITERS)
    tb_final = float(np.mean(tres_b["loss"][-win:]))
    tt_ratio = max(t_final, tb_final) / min(t_final, tb_final)
    band = max(tt_ratio, 1.60) * 1.25
    ratio = max(j_final, t_final) / min(j_final, t_final)
    assert ratio < band, (t_final, tb_final, j_final, tt_ratio)
    # absolute backstop (advisor, round 4): the adaptive band above grows
    # with torch-vs-torch noise, so additionally pin jax to a FIXED
    # multiple of the better torch run — a genuine jax-side regression
    # can't hide inside an unlucky torch pair
    assert j_final < 3.0 * min(t_final, tb_final), (j_final, t_final,
                                                    tb_final)
    # both fits must actually be converging
    assert t_final < 0.5 * float(np.mean(tres["loss"][:win]))
    assert j_final < 0.5 * float(np.mean(jres["loss"][:win]))
    # reconstruction parity — the stable metric: PSNR within 1 dB
    tp, jp = tres["psnr"][ITERS], jres["psnr"][ITERS]
    assert abs(tp - jp) < 1.0, (tp, jp)
