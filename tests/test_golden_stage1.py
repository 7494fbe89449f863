"""Golden stage-1 parity: our fused loss composition vs the reference's.

Per-term tests (test_losses.py) verify each loss in isolation; this test
pins the full single-atlas TRAINING-ITERATION objective — the weighted
composition our `make_loss_fn` fuses into one graph — against the
reference's own modules (`IMLP` + `loss_utils`) evaluated on identical
weights, identical video/flow/mask tensors, and the identical sampled
(j, i, f) batch.  Catches coefficient wiring, coordinate-normalization,
flow-displacement and masked-normalization mistakes that no per-term test
can see (reference composition: src/stage1_neural_atlas.py:159-231).
"""

import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from deflicker_tpu.atlas.data import VideoData
from deflicker_tpu.atlas.engine import AtlasSpecs, make_loss_fn
from deflicker_tpu.config import AtlasConfig
from deflicker_tpu.models.imlp import IMLPSpec, imlp_init

REF = "/root/reference"
if REF not in sys.path:
    sys.path.insert(0, REF)

T, H, W = 6, 24, 36
BATCH = 256


def _specs():
    return AtlasSpecs(
        mapping1=IMLPSpec(3, 2, hidden_dim=64, use_positional=False,
                          num_layers=4, skip_layers=()),
        mapping2=None,
        alpha=None,
        atlas=IMLPSpec(2, 3, hidden_dim=64, use_positional=True,
                       positional_dim=10, num_layers=8, skip_layers=(4, 7)),
    )


def _to_torch_imlp(params, spec):
    """Our param list -> a reference IMLP with identical weights."""
    import torch
    from src.models.stage_1.implicit_neural_networks import IMLP

    net = IMLP(input_dim=spec.input_dim, output_dim=spec.output_dim,
               hidden_dim=spec.hidden_dim,
               use_positional=spec.use_positional,
               positional_dim=spec.positional_dim,
               num_layers=spec.num_layers,
               skip_layers=list(spec.skip_layers))
    sd = net.state_dict()
    keys = list(sd.keys())
    assert len(keys) == 2 * len(params)
    for li, layer in enumerate(params):
        sd[f"hidden.{li}.weight"] = torch.from_numpy(
            np.asarray(layer["w"]).T.copy())
        sd[f"hidden.{li}.bias"] = torch.from_numpy(
            np.asarray(layer["b"]).copy())
    net.load_state_dict(sd)
    return net.float()


def _data(rng):
    video = rng.uniform(0, 1, (T, H, W, 3)).astype(np.float32)
    dx = np.zeros_like(video)
    dy = np.zeros_like(video)
    dx[:, :, :-1] = video[:, :, 1:] - video[:, :, :-1]
    dy[:, :-1, :] = video[:, 1:, :] - video[:, :-1, :]
    flow_fwd = rng.uniform(-2, 2, (T, H, W, 2)).astype(np.float32)
    flow_bwd = rng.uniform(-2, 2, (T, H, W, 2)).astype(np.float32)
    mask_fwd = (rng.uniform(size=(T, H, W)) > 0.25).astype(np.float32)
    mask_bwd = (rng.uniform(size=(T, H, W)) > 0.25).astype(np.float32)
    j = jnp.asarray
    data = VideoData(j(video), j(dx), j(dy), j(np.zeros((T, H, W))),
                     j(flow_fwd), j(flow_bwd), j(mask_fwd), j(mask_bwd))
    return data, video, dx, dy, flow_fwd, flow_bwd, mask_fwd, mask_bwd


def _torch_iteration_losses(params, video, dx, dy, flow_fwd, flow_bwd,
                            mask_fwd, mask_bwd, jj, ii, ff, cfg, specs,
                            include_global):
    """The reference's single-atlas iteration, its own code, float32 CPU
    (src/stage1_neural_atlas.py:159-231)."""
    import torch
    from src.models.stage_1.loss_utils import (get_gradient_loss_single,
                                               get_optical_flow_loss,
                                               get_rigidity_loss)

    dev = torch.device("cpu")
    to_ref = lambda a: torch.from_numpy(
        np.transpose(a, (1, 2, 3, 0)).copy()).float()      # (H, W, C, T)
    video_t = to_ref(video)
    dx_t = to_ref(dx)
    dy_t = to_ref(dy)
    flows = torch.from_numpy(
        np.transpose(flow_fwd, (1, 2, 3, 0))[..., None].copy()).float()
    flows_r = torch.from_numpy(
        np.transpose(flow_bwd, (1, 2, 3, 0))[..., None].copy()).float()
    fmask = torch.from_numpy(
        np.transpose(mask_fwd, (1, 2, 0))[..., None].copy()).float()
    fmask_r = torch.from_numpy(
        np.transpose(mask_bwd, (1, 2, 0))[..., None].copy()).float()

    mapping1 = _to_torch_imlp(params["mapping1"], specs.mapping1)
    atlas = _to_torch_imlp(params["atlas"], specs.atlas)

    L = max(H, W)
    jt = torch.from_numpy(jj[:, None]).long()
    it = torch.from_numpy(ii[:, None]).long()
    ft = torch.from_numpy(ff[:, None]).long()
    jif_current = torch.stack([jt, it, ft])                   # (3, B, 1)
    rgb_current = video_t[it[:, 0], jt[:, 0], :, ft[:, 0]]
    xyt = torch.cat((jt.float() / (L / 2) - 1, it.float() / (L / 2) - 1,
                     ft.float() / (T / 2.0) - 1), dim=1)

    uv1 = mapping1(xyt)
    alpha = torch.ones(len(jj), 1)
    rgb_out = (atlas(uv1 * 0.5 + 0.5) + 1.0) * 0.5
    gradient = get_gradient_loss_single(dx_t, dy_t, jif_current, mapping1,
                                        atlas, rgb_out, dev, W, T)
    rgb = (torch.norm(rgb_out - rgb_current, dim=1) ** 2).mean()
    rigidity = get_rigidity_loss(jif_current, cfg.derivative_amount, L, T,
                                 mapping1, uv1, dev,
                                 uv_mapping_scale=cfg.uv_mapping_scale)
    out = {
        "rgb": float(rgb), "gradient": float(gradient),
        "rigidity1": float(rigidity),
    }
    if include_global:
        out["global_rigidity1"] = float(get_rigidity_loss(
            jif_current, cfg.global_rigidity_derivative_amount_fg, L, T,
            mapping1, uv1, dev, uv_mapping_scale=cfg.uv_mapping_scale))
    out["flow1"] = float(get_optical_flow_loss(
        jif_current, uv1, flows_r, fmask_r, L, T, mapping1, flows, fmask,
        cfg.uv_mapping_scale, dev, use_alpha=True, alpha=alpha))
    total = (cfg.rgb_coeff * out["rgb"]
             + cfg.gradient_loss_coeff * out["gradient"]
             + cfg.rigidity_coeff * out["rigidity1"]
             + cfg.optical_flow_coeff * out["flow1"])
    if include_global:
        total += cfg.global_rigidity_coeff_fg * out["global_rigidity1"]
    out["total"] = total
    return out


@pytest.mark.parametrize("include_global", [True, False])
def test_single_atlas_iteration_objective_matches_reference(include_global):
    rng = np.random.default_rng(7)
    cfg = AtlasConfig(fit_precision="highest", use_pallas_imlp=False)
    specs = _specs()
    params = {"mapping1": imlp_init(jax.random.key(0), specs.mapping1),
              "atlas": imlp_init(jax.random.key(1), specs.atlas)}

    data, *arrays = _data(rng)
    jj = rng.integers(0, W, BATCH).astype(np.int32)
    ii = rng.integers(0, H, BATCH).astype(np.int32)
    ff = rng.integers(0, T, BATCH).astype(np.int32)

    loss_fn = make_loss_fn(specs, cfg, data, include_global=include_global,
                           include_bootstrap=False)
    total, aux = loss_fn(params, data, jnp.asarray(jj), jnp.asarray(ii),
                         jnp.asarray(ff))
    ours = {k: float(v) for k, v in aux.items()}

    want = _torch_iteration_losses(params, *arrays, jj, ii, ff, cfg, specs,
                                   include_global)

    for k, v in want.items():
        assert ours[k] == pytest.approx(v, rel=2e-3, abs=1e-5), (
            k, ours[k], v)
