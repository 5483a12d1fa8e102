"""Full two-pass renderer oracle vs an independent torch reimplementation.

test_convert.py proves the *field forward* matches the reference; this file
proves the *renderer semantics* around it — stratified placement, coarse
compositing, the weight-endpoint drop at the importance resample
(render_class.py:325), deterministic inverse-CDF sampling
(models/model.py:314-357 incl. the 1e-5 pdf floor and denom clamp), the
union-sort fine pass (render_class.py:328), the 1e-10 transmittance eps and
1e10 terminal dist of raw2outputs (render_class.py:440-482), the disp
formula, and torch.std(unbiased=False) for z_std (render_class.py:345) —
by reimplementing the reference's det-mode render_rays in torch on random
weights and asserting every output map matches.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

import jax.numpy as jnp  # noqa: E402

from mofanerf_tpu.convert import convert_field  # noqa: E402
from mofanerf_tpu.models.field import FieldConfig, fold_conditioning  # noqa: E402
from mofanerf_tpu.render.renderer import (  # noqa: E402
    FrameCond,
    MoFaNeRF,
    RenderConfig,
    render_rays,
)
from mofanerf_tpu.ops.embed import fourier_embed  # noqa: E402
from tests.test_convert import make_field_sd, torch_field_forward  # noqa: E402

N_RAYS, N_COARSE, N_IMP = 7, 8, 8
NEAR, FAR = 8.0, 26.0
CFG_C = FieldConfig(depth=8, width=32, skip=4)
CFG_F = FieldConfig(depth=10, width=48, skip=4)


def torch_sample_pdf_det(bins, weights, n_samples):
    """Reference sample_pdf (models/model.py:314-357), det branch."""
    weights = weights + 1e-5
    pdf = weights / torch.sum(weights, -1, keepdim=True)
    cdf = torch.cumsum(pdf, -1)
    cdf = torch.cat([torch.zeros_like(cdf[..., :1]), cdf], -1)
    u = torch.linspace(0.0, 1.0, steps=n_samples)
    u = u.expand(list(cdf.shape[:-1]) + [n_samples]).contiguous()
    inds = torch.searchsorted(cdf, u, right=True)
    below = torch.max(torch.zeros_like(inds - 1), inds - 1)
    above = torch.min((cdf.shape[-1] - 1) * torch.ones_like(inds), inds)
    inds_g = torch.stack([below, above], -1)
    matched = [inds_g.shape[0], inds_g.shape[1], cdf.shape[-1]]
    cdf_g = torch.gather(cdf.unsqueeze(1).expand(matched), 2, inds_g)
    bins_g = torch.gather(bins.unsqueeze(1).expand(matched), 2, inds_g)
    denom = cdf_g[..., 1] - cdf_g[..., 0]
    denom = torch.where(denom < 1e-5, torch.ones_like(denom), denom)
    t = (u - cdf_g[..., 0]) / denom
    return bins_g[..., 0] + t * (bins_g[..., 1] - bins_g[..., 0])


def torch_raw2outputs(raw, z_vals, rays_d):
    """Reference raw2outputs (render_class.py:440-482), no noise, CPU."""
    dists = z_vals[..., 1:] - z_vals[..., :-1]
    dists = torch.cat(
        [dists, torch.tensor([1e10]).expand(dists[..., :1].shape)], -1
    )
    dists = dists * torch.norm(rays_d[..., None, :], dim=-1)
    rgb = torch.sigmoid(raw[..., :3])
    alpha = 1.0 - torch.exp(-F.relu(raw[..., 3]) * dists)
    weights = alpha * torch.cumprod(
        torch.cat([torch.ones((alpha.shape[0], 1)), 1.0 - alpha + 1e-10], -1), -1
    )[:, :-1]
    rgb_map = torch.sum(weights[..., None] * rgb, -2)
    depth_map = torch.sum(weights * z_vals, -1)
    disp_map = 1.0 / torch.max(
        1e-10 * torch.ones_like(depth_map), depth_map / torch.sum(weights, -1)
    )
    acc_map = torch.sum(weights, -1)
    return rgb_map, disp_map, acc_map, weights, depth_map


def _torch_raw(sd, cfg, pts, viewdirs, exp, shape, tex):
    """run_network equivalent: per-point field eval with per-ray dirs
    broadcast over samples (render_class.py:69-94). Returns [N, S, 4]."""
    n, s, _ = pts.shape
    pe = np.asarray(fourier_embed(jnp.asarray(pts.reshape(-1, 3)), cfg.multires))
    dirs = np.repeat(viewdirs, s, axis=0)
    de = np.asarray(fourier_embed(jnp.asarray(dirs), cfg.multires_views))
    rgb, alpha = torch_field_forward(
        sd, cfg,
        torch.from_numpy(pe.copy()),
        torch.from_numpy(exp[None].copy()),
        torch.from_numpy(shape[None].copy()),
        torch.from_numpy(tex[None].copy()),
        torch.from_numpy(de.copy()),
    )
    return torch.cat([rgb, alpha], dim=-1).reshape(n, s, 4)


def test_two_pass_renderer_matches_torch_oracle():
    g = torch.Generator().manual_seed(7)
    sd_c = make_field_sd(CFG_C, g)
    sd_f = make_field_sd(CFG_F, g)
    # moderate positive density so weights are non-trivial along the ray
    sd_c["alpha_linear.0.bias"] = sd_c["alpha_linear.0.bias"] + 2.0
    sd_f["alpha_linear.0.bias"] = sd_f["alpha_linear.0.bias"] + 2.0

    rng = np.random.default_rng(5)
    shape = (rng.standard_normal(50) * 0.3).astype(np.float32)
    exp = (rng.standard_normal(30) * 0.3).astype(np.float32)
    tex = (rng.standard_normal(256) * 0.3).astype(np.float32)

    # unnormalized directions exercise the norm(rays_d) dist scaling
    rays_o = np.zeros((N_RAYS, 3), np.float32)
    rays_d = rng.standard_normal((N_RAYS, 3)).astype(np.float32) * 1.7
    viewdirs = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)

    # --- JAX side
    params = {"coarse": convert_field(sd_c, CFG_C), "fine": convert_field(sd_f, CFG_F)}
    spec = MoFaNeRF(
        coarse=CFG_C, fine=CFG_F,
        render=RenderConfig(n_coarse=N_COARSE, n_importance=N_IMP,
                            near=NEAR, far=FAR),
    )
    cond = FrameCond(
        coarse=fold_conditioning(params["coarse"], jnp.asarray(shape),
                                 jnp.asarray(exp), jnp.asarray(tex)),
        fine=fold_conditioning(params["fine"], jnp.asarray(shape),
                               jnp.asarray(exp), jnp.asarray(tex)),
    )
    out = render_rays(params, spec, cond, jnp.asarray(rays_o), jnp.asarray(rays_d))

    # --- torch oracle (reference det-mode render_rays)
    t_vals = torch.linspace(0.0, 1.0, N_COARSE)
    z_vals = (NEAR * (1.0 - t_vals) + FAR * t_vals).expand(N_RAYS, N_COARSE)
    ro, rd = torch.from_numpy(rays_o), torch.from_numpy(rays_d)
    pts = (ro[..., None, :] + rd[..., None, :] * z_vals[..., :, None]).numpy()

    raw_c = _torch_raw(sd_c, CFG_C, pts, viewdirs, exp, shape, tex)
    rgb0, disp0, acc0, weights, _ = torch_raw2outputs(raw_c, z_vals, rd)

    z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
    z_samples = torch_sample_pdf_det(z_mid, weights[..., 1:-1], N_IMP).detach()
    z_all, _ = torch.sort(torch.cat([z_vals, z_samples], -1), -1)
    pts_f = (ro[..., None, :] + rd[..., None, :] * z_all[..., :, None]).numpy()
    raw_f = _torch_raw(sd_f, CFG_F, pts_f, viewdirs, exp, shape, tex)
    rgb1, disp1, acc1, _, _ = torch_raw2outputs(raw_f, z_all, rd)
    z_std = torch.std(z_samples, dim=-1, unbiased=False)

    tol = dict(rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(np.asarray(out["rgb0"]), rgb0.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out["acc0"]), acc0.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out["rgb"]), rgb1.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out["acc"]), acc1.numpy(), **tol)
    np.testing.assert_allclose(np.asarray(out["z_std"]), z_std.numpy(), **tol)

    # disp: identical on occupied rays; on empty rays the reference computes
    # 0/0 = NaN (render_class.py:477) while composite() deliberately returns
    # the finite background value 1e10 — assert both behaviors explicitly.
    occ = acc1.numpy() > 1e-2
    assert occ.any(), "scene unexpectedly empty — densify the oracle field"
    np.testing.assert_allclose(np.asarray(out["disp"])[occ], disp1.numpy()[occ], **tol)
    occ0 = acc0.numpy() > 1e-2
    np.testing.assert_allclose(np.asarray(out["disp0"])[occ0], disp0.numpy()[occ0], **tol)
    if (~occ).any():
        assert np.isnan(disp1.numpy()[~occ]).all()
        np.testing.assert_allclose(np.asarray(out["disp"])[~occ], 1e10)


def test_oracle_catches_endpoint_drop_drift():
    """Meta-test: the importance resample MUST use weights[..., 1:-1]
    (render_class.py:325). Feeding the oracle the full weight vector
    produces measurably different fine samples — i.e. this oracle would
    fail if our sample_pdf input semantics drifted."""
    w = torch.tensor([[0.8, 0.05, 0.05, 0.05, 0.05, 0.8]])
    bins = torch.linspace(8.0, 26.0, 5).expand(1, 5)
    correct = torch_sample_pdf_det(bins, w[..., 1:-1], 6)
    drifted = torch_sample_pdf_det(bins, w[..., :-2], 6)  # wrong weight window
    assert not torch.allclose(correct, drifted, atol=1e-3)
