"""Benchmark: serving/training throughput of the TPU-native MoFaNeRF stack.

HEADLINE — production serving path (render/serve.py + the fused Pallas
kernel in ops/pallas_serve.py): per-avatar distilled student (4x128 MLP,
multires 8, bf16) rendered with 32 dense samples packed into each ray's
analytic AABB interval, the whole render VMEM-resident per ray block. No
gathers anywhere on the hot path; throughput is weight-independent (same
matmuls), and the quality
cost of serving a student instead of the full field is MEASURED, not
assumed — examples/distill_synthetic.py produces artifacts/
distill_quality.json (PSNR vs the teacher's two-pass renders on held-out
views of a trained scene), which this script surfaces next to the number.

EXTRAS keep the round-1 measurements honest and comparable:
- serve_S16 (the latency-mode config) and a full jitted 512^2 frame;
- the teacher paths: occupancy-culled keep-16/32 on a realistic thin-shell
  grid (~5% occupancy ellipsoid shell — the geometry a trained face grid
  has, unlike round 1's 10% uniform-random grid), and the reference's
  exact 64+128 two-pass budget with sustained TFLOP/s;
- training / fitting steps per second (flagship dims);
- RefineNet: 512^2 generator inference fps and full G+D adversarial train
  step rate (the stage the reference README calls "takes a long time",
  /root/reference/README.md:125).

Timing methodology: the iteration loop runs INSIDE one jit via
`lax.fori_loop` and a single scalar is read back. On this environment the
TPU is reached through a relay where `block_until_ready` returns before
execution finishes and every host readback costs ~200 ms — naive per-call
timing reports physically impossible numbers. Device-looped timing matches
the chip's achievable FLOP/s (~70% of bf16 peak on the reference path).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
from __future__ import annotations

import json
import os
import time

import jax
import jax.numpy as jnp

from mofanerf_tpu.models.field import FieldConfig
from mofanerf_tpu.models.student import StudentConfig, init_point_field
from mofanerf_tpu.ops.occupancy import OccupancyGrid, render_rays_occupancy
from mofanerf_tpu.render.serve import render_frame_serve, render_rays_bounded
from mofanerf_tpu.render.renderer import (
    MoFaNeRF,
    RenderConfig,
    init_model_params,
    prepare_conditioning,
    render_rays,
    exp_code_for,
)

BASELINE_RAYS_PER_SEC = 5e6
K_INNER = 16
NEAR, FAR = 8.0, 26.0
# tight face box (FaceScape head extents at world scale 1/50)
AABB_MIN, AABB_MAX = (-2.3, -3.0, -2.6), (2.3, 3.0, 2.6)
SERVE_CFG = StudentConfig(depth=4, width=128, multires=8)


def _unit_rays(key, n):
    d = jax.random.normal(key, (n, 3))
    return jnp.zeros((n, 3)), d / jnp.linalg.norm(d, axis=-1, keepdims=True)


def _timed(loop_fn, *args, k=K_INNER, reps=1):
    """Best-of-`reps` wall time per inner iteration. The relay adds a fixed
    ~0.2 s dispatch+readback cost per call and occasional scheduling noise;
    min-of-N measures the sustained device rate, which is what the
    rays/s headline claims. Only the HEADLINE uses reps=3 — round 4's
    best-of-3-everywhere blew the driver wall-clock budget (BENCH_r04
    rc=124) for marginal extra precision on secondary numbers."""
    float(loop_fn(*args))  # compile + warm
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter()
        float(loop_fn(*args))
        best = min(best, time.perf_counter() - t0)
    return best / k


def _ray_loop(render_one, k=K_INNER):
    @jax.jit
    def loop(o, d):
        def body(i, acc):
            return acc + jnp.sum(render_one(o + i * 1e-6, d))
        return jax.lax.fori_loop(0, k, body, 0.0)

    return loop


def shell_grid(G=64):
    """Face-like occupancy: a thin ellipsoid shell, ~5% occupied."""
    t = (jnp.arange(G) + 0.5) / G * 10.0 - 5.0
    X, Y, Z = jnp.meshgrid(t, t, t, indexing="ij")
    r = jnp.sqrt((X / 2.2) ** 2 + (Y / 3.0) ** 2 + (Z / 2.5) ** 2)
    return OccupancyGrid(jnp.abs(r - 1.0) < 0.12,
                         jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3))


def main() -> None:
    t_start = time.perf_counter()
    # Wall-clock budget: the driver runs bench.py under a hard timeout, and
    # round 4 learned the hard way (rc=124, no perf number recorded) that a
    # fresh remote-compile shape can cost 1-10 min. The headline ALWAYS
    # runs; every extra is (a) skipped if the remaining budget can't absorb
    # a worst-case warm-cache compile and (b) error-isolated so one bad
    # section can't take the JSON line down with it.
    budget = float(os.environ.get("BENCH_BUDGET_S", 480.0))
    skipped = []
    extras = {"device": str(jax.devices()[0])}

    def section(name, fn, est=40.0):
        if time.perf_counter() - t_start > budget - est:
            skipped.append(name)
            return
        try:
            fn()
        except Exception as e:  # record, keep benching
            extras[name + "_error"] = f"{type(e).__name__}: {e}"[:200]

    # ---------------- headline: distilled-student serving path, fused kernel
    from mofanerf_tpu.ops.pallas_serve import render_rays_bounded_fused

    sp, sc = init_point_field(jax.random.PRNGKey(0), SERVE_CFG)

    n64 = 65536
    K_HEAD = 64  # headline runs 64 renders per readback: the fixed ~0.2 s
    #              relay dispatch cost must not eat into a ~1 s measurement
    ro, rd = _unit_rays(jax.random.PRNGKey(1), n64)
    loop_f32 = _ray_loop(lambda o, d: render_rays_bounded_fused(
        sp, SERVE_CFG, o, d, NEAR, FAR, 32, AABB_MIN, AABB_MAX)["rgb"],
        k=K_HEAD)
    serve32 = n64 / _timed(loop_f32, ro, rd, k=K_HEAD, reps=3)
    extras["headline_sec_incl_compile"] = round(time.perf_counter() - t_start, 1)

    def sec_s16():
        loop_f16 = _ray_loop(lambda o, d: render_rays_bounded_fused(
            sp, SERVE_CFG, o, d, NEAR, FAR, 16, AABB_MIN, AABB_MAX)["rgb"])
        extras["serve_fused_S16_rays_per_sec"] = round(
            n64 / _timed(loop_f16, ro, rd), 1)

    section("serve_S16", sec_s16)

    # conditioned (whole-expression-bank) student: the code folds to biases
    # per frame, so serving throughput must equal the unconditioned
    # student's — measured, not asserted (same kernel, fold outside)
    def sec_cond():
        from mofanerf_tpu.models.student import fold_student_code

        ccfg = StudentConfig(depth=4, width=128, multires=8, cond_dim=30)
        cp, _ = init_point_field(jax.random.PRNGKey(4), ccfg)
        code = jnp.ones(30) * 0.1

        @jax.jit
        def loop_cond(o, d):
            def body(i, acc):
                fp = fold_student_code(cp, code + i * 1e-6)
                out = render_rays_bounded_fused(
                    fp, ccfg, o + i * 1e-6, d, NEAR, FAR, 32, AABB_MIN, AABB_MAX)
                return acc + jnp.sum(out["rgb"])
            return jax.lax.fori_loop(0, K_INNER, body, 0.0)

        extras["serve_cond_S32_rays_per_sec"] = round(
            n64 / _timed(loop_cond, ro, rd), 1)

    section("serve_cond", sec_cond)

    def sec_xla():
        n32 = 32768
        ro32, rd32 = _unit_rays(jax.random.PRNGKey(2), n32)
        loop_x32 = _ray_loop(lambda o, d: render_rays_bounded(
            sp, SERVE_CFG, sc, o, d, NEAR, FAR, 32, AABB_MIN, AABB_MAX)["rgb"])
        extras["serve_xla_S32_rays_per_sec"] = round(
            n32 / _timed(loop_x32, ro32, rd32), 1)

    section("serve_xla", sec_xla)

    # full jitted 512^2 frame (static 0.5 compaction budget: one program)
    def sec_frame():
        from mofanerf_tpu.ops.rays import pose_spherical

        Kc = jnp.asarray([[1200.0, 0, 256], [0, 1200.0, 256], [0, 0, 1]])
        c2w = jnp.asarray(pose_spherical(20.0, -10.0, 16.0))[:3]

        @jax.jit
        def frames(c2w):
            def body(i, acc):
                out = render_frame_serve(
                    sp, SERVE_CFG, sc, 512, 512, Kc, c2w + i * 1e-6,
                    n_samples=32, aabb_min=AABB_MIN, aabb_max=AABB_MAX,
                    hit_fraction=0.5, packet_size=16384, fused=True)
                return acc + jnp.sum(out["rgb"])
            return jax.lax.fori_loop(0, 8, body, 0.0)

        float(frames(c2w))
        t0 = time.perf_counter()
        float(frames(c2w))
        extras["serve_frame_512_sec"] = round((time.perf_counter() - t0) / 8, 4)

    section("serve_frame", sec_frame)

    # measured quality of serving a student instead of the field
    art = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "artifacts", "distill_quality.json")
    if os.path.exists(art):
        with open(art) as fh:
            q = json.load(fh)
        row = next((r for r in q["students"]
                    if r["student"] == "mlp_128x4_mr8" and r["samples"] == 32), None)
        if row:
            extras["serve_psnr_vs_teacher_db"] = row["psnr_vs_teacher_db"]
            extras["teacher_psnr_vs_gt_db"] = q["teacher_psnr_vs_gt_db"]
            extras["quality_provenance"] = q["scene"]
    cart = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "cond_student_quality.json")
    if os.path.exists(cart):
        with open(cart) as fh:
            cq = json.load(fh)
        extras["serve_cond_psnr_vs_teacher_db"] = [
            cq["per_expression"][e]["cond_psnr_vs_teacher_db"] for e in ("0", "1")
        ]
    aart = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "avatar_student_quality.json")
    if os.path.exists(aart):
        with open(aart) as fh:
            aq = json.load(fh)
        extras["serve_multiavatar_own_vs_cross_db"] = [
            [aq["per_identity"][i]["own_psnr_db"],
             aq["per_identity"][i]["cross_psnr_db"]] for i in ("0", "1")
        ]

    # ---------------- teacher paths (flagship dims)
    spec = MoFaNeRF(
        coarse=FieldConfig(depth=8, width=256, compute_dtype=jnp.bfloat16),
        fine=FieldConfig(depth=10, width=1024, compute_dtype=jnp.bfloat16),
        render=RenderConfig(n_coarse=64, n_importance=64),
    )
    params = init_model_params(jax.random.PRNGKey(0), spec)
    cond = prepare_conditioning(
        params, spec, jnp.zeros(spec.shape_dim), exp_code_for(params, 0),
        jnp.zeros(spec.tex_dim),
    )
    n = 8192
    ro8, rd8 = _unit_rays(jax.random.PRNGKey(3), n)

    def sec_ref_budget():
        loop_ref = _ray_loop(
            lambda o, d: render_rays(params, spec, cond, o, d)["rgb"])
        sec_ref = _timed(loop_ref, ro8, rd8)
        ref_flops = (n * 128 * (22 * 2 * 1024 * 1024)
                     + n * 64 * (22 * 2 * 256 * 256))
        extras["reference_budget_rays_per_sec"] = round(n / sec_ref, 1)
        extras["reference_budget_sec_per_frame"] = round(
            512 * 512 / (n / sec_ref), 2)
        extras["reference_budget_sustained_tflops"] = round(
            ref_flops / sec_ref / 1e12, 1)

    section("reference_budget", sec_ref_budget, est=60.0)

    # ---------------- training (flagship) and fitting
    def sec_train():
        from mofanerf_tpu.train.state import (
            Batch, create_train_state, make_optimizer, train_step)

        tstate = create_train_state(jax.random.PRNGKey(7), spec)
        ttx = make_optimizer()
        tbatch = Batch(
            rays_o=jnp.zeros((1024, 3)),
            rays_d=rd8[:1024],
            target_rgb=jax.random.uniform(jax.random.PRNGKey(8), (1024, 3)),
            shape_code=jnp.zeros(spec.shape_dim),
            exp_type=jnp.asarray(0, jnp.int32),
            uv_map=jax.random.uniform(jax.random.PRNGKey(9), (512, 512, 3)),
        )

        @jax.jit
        def loop_train(s, b):
            def body(i, carry):
                st, acc = carry
                st, m = train_step(
                    st, b, jax.random.fold_in(jax.random.PRNGKey(10), i),
                    spec, ttx)
                return st, acc + m["loss"]
            return jax.lax.fori_loop(0, K_INNER, body, (s, 0.0))

        ts, _ = loop_train(tstate, tbatch)
        jax.block_until_ready(ts)
        t0 = time.perf_counter()
        _, acc = loop_train(tstate, tbatch)
        float(acc)
        extras["train_steps_per_sec"] = round(
            K_INNER / (time.perf_counter() - t0), 2)

    section("train_step", sec_train, est=90.0)

    def sec_fit():
        from mofanerf_tpu.ops.rays import pose_spherical
        from mofanerf_tpu.train.fit import (
            FitConfig, fit_step, init_fit_state, make_fit_optimizer)

        fcfg = FitConfig(n_rand=1024)
        fstate = init_fit_state(jax.random.PRNGKey(4), fcfg,
                                pose_spherical(0, 0, 16.0))
        ftx = make_fit_optimizer(fcfg)
        coords = jax.random.uniform(jax.random.PRNGKey(5), (1024, 2)) * 511
        targets = jax.random.uniform(jax.random.PRNGKey(6), (1024, 3))
        Kmat = jnp.asarray([[1200.0, 0, 256], [0, 1200.0, 256], [0, 0, 1.0]])

        @jax.jit
        def loop_fit(s, c, t):
            def body(i, carry):
                st, acc = carry
                st, loss = fit_step(params, spec, ftx, st, c + i * 1e-6, t, Kmat)
                return st, acc + loss
            return jax.lax.fori_loop(0, K_INNER, body, (s, 0.0))

        fs, _ = loop_fit(fstate, coords, targets)
        jax.block_until_ready(fs)
        t0 = time.perf_counter()
        _, acc = loop_fit(fstate, coords, targets)
        float(acc)
        extras["fit_iters_per_sec"] = round(
            K_INNER / (time.perf_counter() - t0), 2)

    section("fit_step", sec_fit, est=90.0)

    def sec_occupancy():
        grid = shell_grid()
        for keep in (16, 32):
            loop_o = _ray_loop(lambda o, d, k=keep: render_rays_occupancy(
                params["fine"], spec.fine, cond.fine, grid, o, d,
                NEAR, FAR, 64, k)["rgb"])
            extras[f"occupancy_keep{keep}_rays_per_sec"] = round(
                n / _timed(loop_o, ro8, rd8), 1)

    section("occupancy", sec_occupancy, est=80.0)

    # ---------------- RefineNet: 512^2 G inference + G+D train step
    def sec_refine():
        from mofanerf_tpu.train.refine import (
            RefineConfig, build_models, init_refine_state,
            make_refine_optimizers, refine_train_step,
        )

        rcfg = RefineConfig(use_vgg=False)  # VGG weights: external artifact
        rstate = init_refine_state(jax.random.PRNGKey(11), rcfg, image_size=512)
        g, _ = build_models(rcfg)
        img = jax.random.uniform(jax.random.PRNGKey(12), (1, 512, 512, 3)) * 2 - 1

        @jax.jit
        def loop_g(x):
            def body(i, acc):
                return acc + jnp.sum(g.apply(rstate.g_params, x + i * 1e-6))
            return jax.lax.fori_loop(0, K_INNER, body, 0.0)

        sec_g = _timed(loop_g, img)
        extras["refine_infer_fps_512"] = round(1.0 / sec_g, 2)

        g_tx, d_tx = make_refine_optimizers(rcfg)

        @jax.jit
        def loop_gd(s, a, b):
            def body(i, carry):
                st, acc = carry
                st, m = refine_train_step(st, a + i * 1e-6, b, rcfg, g_tx, d_tx)
                return st, acc + m["loss_G"]
            return jax.lax.fori_loop(0, 4, body, (s, 0.0))

        real = jax.random.uniform(jax.random.PRNGKey(13), (1, 512, 512, 3)) * 2 - 1
        rs, _ = loop_gd(rstate, img, real)
        jax.block_until_ready(rs)
        t0 = time.perf_counter()
        _, acc = loop_gd(rstate, img, real)
        float(acc)
        extras["refine_steps_per_sec_512"] = round(
            4 / (time.perf_counter() - t0), 2)

    section("refine", sec_refine, est=120.0)

    rart = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "refine_quality.json")
    if os.path.exists(rart):
        with open(rart) as fh:
            rq = json.load(fh)
        extras["refine_heldout_psnr_gain_db"] = rq["psnr_gain_db"]
    nart = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "artifacts", "refine_nerf_quality.json")
    if os.path.exists(nart):
        with open(nart) as fh:
            nq = json.load(fh)
        extras["refine_nerf_heldout_psnr_gain_db"] = nq.get("psnr_gain_db")

    if skipped:
        extras["skipped_for_budget"] = skipped
    extras["bench_wall_sec"] = round(time.perf_counter() - t_start, 1)

    print(
        json.dumps(
            {
                "metric": "render_rays_per_sec_per_chip",
                "value": round(serve32, 1),
                "unit": "rays/s",
                "vs_baseline": round(serve32 / BASELINE_RAYS_PER_SEC, 4),
                "extra": {
                    "mode": "serving path: distilled student 4x128 mr8 bf16, "
                            "32 bounded samples/ray, fused Pallas kernel, "
                            "gather-free (quality vs teacher measured in "
                            "artifacts/)",
                    "sec_per_512x512_frame": round(512 * 512 / serve32, 3),
                    **extras,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
