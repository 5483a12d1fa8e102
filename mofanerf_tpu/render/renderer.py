"""Pure functional two-pass volume renderer.

Capability parity with the reference `myRenderer`
(models/render_class.py:40-352): chunked ray batching, stratified coarse
pass, `raw2outputs` compositing, inverse-CDF importance resampling, fine
pass, coarse+fine outputs. Re-designed TPU-first:

- The reference renderer is *stateful* (stashes rays/codes on `self`,
  models/render_class.py:180-186); here everything is explicit arguments
  threaded through jit — no hidden state, trivially shardable.
- The reference chunks rays in a Python loop (`batchify_rays`,
  models/render_class.py:111-123); here a full frame is a `lax.map` over
  fixed-shape ray packets inside ONE jit — no retraces, no host sync.
- Conditioning codes are folded once per frame (`prepare_conditioning`)
  into per-layer biases (see models/field.py); the reference re-broadcasts
  and re-concatenates codes per netchunk (models/render_class.py:74-91).
- Per-ray view-direction features are computed once per ray and broadcast
  over samples (the reference embeds dirs per point).

All sample counts are static (64 coarse + 64 importance per the shipped
config, configs/exp_mofanerf.txt:16-17), so the coarse->fine data
dependence stays inside one compiled program.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import (
    FieldConfig,
    init_field_params,
    fold_conditioning,
    apply_field_folded,
)
from mofanerf_tpu.models.ism import init_ism_params, modulate_expression
from mofanerf_tpu.models.tex_encoder import TextureEncoder
from mofanerf_tpu.ops.embed import fourier_embed
from mofanerf_tpu.ops.rays import get_rays
from mofanerf_tpu.ops.sampling import stratified_z_vals, sample_pdf
from mofanerf_tpu.ops.composite import composite

Params = Dict[str, Any]

N_EXPRESSIONS = 20  # FaceScape expression count (models/render_class.py:53-56)
N_EXP_SLOTS = 21    # +1 fitting slot (models/render_class.py:420-423)


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Rendering hyperparameters (defaults = configs/exp_mofanerf.txt +
    run_fit.py:142-151 canonical camera)."""

    n_coarse: int = 64
    n_importance: int = 64
    perturb: float = 1.0          # 0 for eval (tools/create_model_condition.py test kwargs)
    raw_noise_std: float = 0.0
    white_bkgd: bool = False
    near: float = 8.0
    far: float = 26.0
    lindisp: bool = False
    packet_size: int = 8192       # rays per lax.map packet for full frames
    sigma_activation: str = "relu"  # 'relu' (reference parity) or 'softplus'
                                  # (training-stability option — see
                                  # ops/composite.py docstring)
    fine_on_union: bool = True    # reference behavior: fine net sees coarse+importance
                                  # samples (models/render_class.py:328). False = fast
                                  # mode: fine sees only the importance samples, which
                                  # already concentrate where the coarse weight mass is
                                  # — ~1.9x fewer fine-net FLOPs per ray.


@dataclasses.dataclass(frozen=True)
class MoFaNeRF:
    """Static model spec: coarse + fine field configs + render config.

    Reference dims: coarse 8x256, fine 10x1024
    (tools/config_parser.py:17-24, not overridden by the shipped config).
    """

    coarse: FieldConfig = FieldConfig(depth=8, width=256)
    fine: FieldConfig = FieldConfig(depth=10, width=1024)
    render: RenderConfig = RenderConfig()
    shape_dim: int = 50
    exp_dim: int = 30
    tex_dim: int = 256
    uv_size: int = 512  # UV map side; >=128 (the encoder downsamples 2^7)


def init_model_params(key: jax.Array, spec: MoFaNeRF) -> Params:
    """Full trainable state: both fields, ISM, texture encoder, expression
    latent bank [N_EXP_SLOTS, exp_dim] (reference keeps 20 separate [1,30]
    tensors + a 21st appended during fitting; here one array slot-indexed
    by expression type)."""
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    enc = TextureEncoder(tex_dim=spec.tex_dim)
    tex_params = enc.init(k4, jnp.zeros((1, spec.uv_size, spec.uv_size, 3)))
    return {
        "coarse": init_field_params(k1, spec.coarse),
        "fine": init_field_params(k2, spec.fine),
        "ism": init_ism_params(k3, in_dim=spec.shape_dim, out_dim=spec.exp_dim),
        "tex_encoder": tex_params,
        "exp_codes": jax.random.uniform(k5, (N_EXP_SLOTS, spec.exp_dim)),
    }


def encode_texture(params: Params, spec: MoFaNeRF, uv_map: jnp.ndarray) -> jnp.ndarray:
    """uv_map [512,512,3] or [B,512,512,3] -> tex code [tex_dim] / [B,tex_dim]."""
    enc = TextureEncoder(tex_dim=spec.tex_dim)
    squeeze = uv_map.ndim == 3
    if squeeze:
        uv_map = uv_map[None]
    out = enc.apply(params["tex_encoder"], uv_map)
    return out[0] if squeeze else out


class FrameCond(NamedTuple):
    """Per-frame folded conditioning — compute ONCE per (identity,
    expression, texture) with `prepare_conditioning`, then render any number
    of rays/frames with it."""

    coarse: Params  # folded biases for the coarse field
    fine: Params    # folded biases for the fine field


def prepare_conditioning(
    params: Params,
    spec: MoFaNeRF,
    shape_code: jnp.ndarray,          # [shape_dim]
    exp_code: jnp.ndarray,            # [exp_dim] raw latent (pre-ISM)
    tex_code: jnp.ndarray,            # [tex_dim]
) -> FrameCond:
    """ISM-modulate the expression latent and fold all codes into per-layer
    biases for both fields. Differentiable w.r.t. all three codes (the
    fitting loop optimizes through this)."""
    exp_mod = modulate_expression(params["ism"], shape_code, exp_code)
    return FrameCond(
        coarse=fold_conditioning(params["coarse"], shape_code, exp_mod, tex_code),
        fine=fold_conditioning(params["fine"], shape_code, exp_mod, tex_code),
    )


def exp_code_for(params: Params, exp_type) -> jnp.ndarray:
    """Expression latent lookup by (possibly traced) expression index."""
    return jnp.take(params["exp_codes"], exp_type, axis=0)


def _run_field(params_field, cfg: FieldConfig, cond, pts, dir_feat_ray, n_samples):
    """pts: [N, S, 3]; dir_feat_ray: [N, W//2]. Returns ([N,S,3],[N,S])."""
    n_rays = pts.shape[0]
    pe = fourier_embed(pts.reshape(-1, 3), cfg.multires)  # [N*S, 63]
    raw_rgb, raw_sigma = apply_field_folded(
        params_field, cond, pe, dir_feat_ray, cfg, samples_per_ray=n_samples
    )
    return (
        raw_rgb.reshape(n_rays, n_samples, 3),
        raw_sigma.reshape(n_rays, n_samples),
    )


def render_rays(
    params: Params,
    spec: MoFaNeRF,
    cond: FrameCond,
    rays_o: jnp.ndarray,     # [N, 3]
    rays_d: jnp.ndarray,     # [N, 3]
    key: jax.Array | None = None,
    train: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Render a packet of rays. Deterministic when train=False (perturb=0,
    det importance sampling), matching the reference's test kwargs
    (tools/create_model_condition.py:104-106)."""
    rc = spec.render
    n = rays_o.shape[0]
    viewdirs = rays_d / jnp.linalg.norm(rays_d, axis=-1, keepdims=True)
    de = fourier_embed(viewdirs, spec.coarse.multires_views)  # [N, 27]
    # the fine field may use a different view-embedding bandwidth
    de_fine = (
        de if spec.fine.multires_views == spec.coarse.multires_views
        else fourier_embed(viewdirs, spec.fine.multires_views)
    )

    perturb = rc.perturb if train else 0.0
    noise_std = rc.raw_noise_std if train else 0.0
    if train:
        assert key is not None, "training render requires a PRNG key"
        k_strat, k_pdf, k_noise_c, k_noise_f = jax.random.split(key, 4)
    else:
        k_strat = k_pdf = k_noise_c = k_noise_f = None

    near = jnp.full((n, 1), rc.near)
    far = jnp.full((n, 1), rc.far)
    z_vals = stratified_z_vals(k_strat, near, far, rc.n_coarse, perturb, rc.lindisp)

    # --- coarse pass
    pts = rays_o[:, None, :] + rays_d[:, None, :] * z_vals[..., None]
    dirf_c = de @ params["coarse"]["view"]["w_dirs"]
    raw_rgb, raw_sigma = _run_field(
        params["coarse"], spec.coarse, cond.coarse, pts, dirf_c, rc.n_coarse
    )
    c = composite(raw_rgb, raw_sigma, z_vals, rays_d, noise_std, rc.white_bkgd,
                  k_noise_c, rc.sigma_activation)

    out = {}
    if rc.n_importance > 0:
        out["rgb0"], out["disp0"], out["acc0"] = c.rgb, c.disp, c.acc

        # --- importance resample (weights' endpoints dropped, reference
        # models/render_class.py:325)
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        z_samples = sample_pdf(
            k_pdf, z_mid, c.weights[..., 1:-1], rc.n_importance, det=(perturb == 0.0)
        )
        if rc.fine_on_union:
            z_all = jnp.sort(jnp.concatenate([z_vals, z_samples], axis=-1), axis=-1)
        else:
            z_all = jnp.sort(z_samples, axis=-1)
        n_fine = z_all.shape[-1]

        # --- fine pass
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z_all[..., None]
        dirf_f = de_fine @ params["fine"]["view"]["w_dirs"]
        f = _run_field(
            params["fine"], spec.fine, cond.fine, pts, dirf_f, n_fine,
        )
        cf = composite(f[0], f[1], z_all, rays_d, noise_std, rc.white_bkgd,
                       k_noise_f, rc.sigma_activation)
        out["rgb"], out["disp"], out["acc"] = cf.rgb, cf.disp, cf.acc
        out["depth"] = cf.depth
        # ddof=0 matches the reference's torch.std(..., unbiased=False)
        # (models/render_class.py:345)
        out["z_std"] = jnp.std(z_samples, axis=-1)
    else:
        out["rgb"], out["disp"], out["acc"] = c.rgb, c.disp, c.acc
        out["depth"] = c.depth
    return out


def render_frame(
    params: Params,
    spec: MoFaNeRF,
    cond: FrameCond,
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
) -> Dict[str, jnp.ndarray]:
    """Render a full HxW frame deterministically.

    Rays are padded to a multiple of `packet_size` and swept with `lax.map`
    — the TPU-native replacement for the reference's Python `chunk` loop:
    one compile, fixed shapes, sequential packets (bounded memory).
    Returns maps reshaped to [H, W, ...].
    """
    rays_o, rays_d = get_rays(H, W, K, c2w)
    n = H * W
    p = min(spec.render.packet_size, n)
    n_pad = (-n) % p
    ro = jnp.concatenate([rays_o.reshape(-1, 3), jnp.ones((n_pad, 3))], axis=0)
    rd = jnp.concatenate([rays_d.reshape(-1, 3), jnp.ones((n_pad, 3))], axis=0)
    ro = ro.reshape(-1, p, 3)
    rd = rd.reshape(-1, p, 3)

    def packet(args):
        o, d = args
        return render_rays(params, spec, cond, o, d, key=None, train=False)

    maps = jax.lax.map(packet, (ro, rd))
    out = {}
    for k, v in maps.items():
        flat = v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])[:n]
        out[k] = flat.reshape((H, W) + flat.shape[1:])
    return out


_SHARDED_FRAME_CACHE: dict = {}


def _sharded_frame_fn(spec: MoFaNeRF, mesh, p: int):
    """Cached jitted shard_map render — rebuilding the closure per call
    would defeat jit's identity-keyed cache and retrace every frame."""
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    # Mesh is hashable: equal-but-distinct Mesh objects hit the same entry
    # (keying by id() would recompile per rebuilt mesh and pin dead meshes).
    key = (spec, mesh, p)
    if key in _SHARDED_FRAME_CACHE:
        return _SHARDED_FRAME_CACHE[key]

    def per_device(params, cond, ro_local, rd_local):
        ro_p = ro_local.reshape(-1, p, 3)
        rd_p = rd_local.reshape(-1, p, 3)

        def packet(args):
            o, d = args
            return render_rays(params, spec, cond, o, d, key=None, train=False)

        return jax.lax.map(packet, (ro_p, rd_p))

    f = jax.jit(
        shard_map(
            per_device,
            mesh=mesh,
            in_specs=(P(), P(), P("data"), P("data")),
            out_specs=P("data"),
        )
    )
    _SHARDED_FRAME_CACHE[key] = f
    return f


def render_frame_sharded(
    params: Params,
    spec: MoFaNeRF,
    cond: FrameCond,
    H: int,
    W: int,
    K: jnp.ndarray,
    c2w: jnp.ndarray,
    mesh,
):
    """Multi-chip full-frame render: rays shard over the mesh's `data`
    axis via shard_map — every device runs its OWN sequential packet loop
    concurrently (render_frame's plain lax.map is single-device
    sequential). Params/conditioning are replicated; no collectives are
    needed (rays are independent). The multi-chip serving path.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P
    from jax import shard_map

    rays_o, rays_d = get_rays(H, W, K, c2w)
    n = H * W
    n_data = mesh.shape["data"]
    p = min(spec.render.packet_size, max(1, n // n_data))
    stride = p * n_data
    n_pad = (-n) % stride
    ro = jnp.concatenate([rays_o.reshape(-1, 3), jnp.ones((n_pad, 3))], axis=0)
    rd = jnp.concatenate([rays_d.reshape(-1, 3), jnp.ones((n_pad, 3))], axis=0)
    rs = NamedSharding(mesh, P("data"))

    f = _sharded_frame_fn(spec, mesh, p)
    maps = f(params, cond, jax.device_put(ro, rs), jax.device_put(rd, rs))
    out = {}
    for k, v in maps.items():
        flat = v.reshape((v.shape[0] * v.shape[1],) + v.shape[2:])[:n]
        out[k] = flat.reshape((H, W) + flat.shape[1:])
    return out


def render_path(
    params: Params,
    spec: MoFaNeRF,
    conds,                       # FrameCond or list of FrameCond (per pose)
    poses,                       # [N, 3, 4] or [N, 4, 4] c2w sequence
    hwf,                         # (H, W, focal)
    render_factor: int = 0,
):
    """Render a camera path — parity with `myRenderer.render_path`
    (models/render_class.py:199-237): optional `render_factor` downsampling
    for fast previews; returns (rgbs [N,H,W,3], disps [N,H,W]) as numpy.

    Each pose renders under the same compiled program (static H/W)."""
    import numpy as np

    H, W, focal = hwf
    if render_factor:
        H, W, focal = H // render_factor, W // render_factor, focal / render_factor
    K = jnp.asarray([[focal, 0, 0.5 * W], [0, focal, 0.5 * H], [0, 0, 1]])
    rgbs, disps = [], []
    per_pose = isinstance(conds, (list, tuple)) and not isinstance(conds, FrameCond)
    for i, c2w in enumerate(poses):
        cond = conds[i] if per_pose else conds
        out = render_frame(params, spec, cond, H, W, K, jnp.asarray(c2w)[:3])
        rgbs.append(np.asarray(out["rgb"]))
        disps.append(np.asarray(out["disp"]))
    return np.stack(rgbs), np.stack(disps)
