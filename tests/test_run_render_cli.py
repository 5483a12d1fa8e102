"""run_render CLI smoke: the --distill_cond rig path (expression morphing
through the conditioned-student serving renderer) runs end-to-end from a
config + (untrained) checkpointless state and writes frames."""
import os

import numpy as np

from mofanerf_tpu.data.facescape import make_synthetic_dataset


def test_run_render_distill_cond_rig(tmp_path):
    from mofanerf_tpu.cli.run_render import main

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=1, n_train=1, n_test=1, hw=16)
    out = tmp_path / "rig"
    student = tmp_path / "student.npz"
    argv = [
        "--out_dir", str(out),
        "--n_views", "2",
        "--render_factor", "32",          # 16x16 frames
        "--distill_cond",
        "--distill_steps", "4",
        "--n_samples", "8",
        "--rig_expressions", "0,1",
        "--student_path", str(student),
        # config flags (tiny nets)
        "--expname", "smoke",
        "--basedir", str(tmp_path / "logs"),
        "--datadir", str(data_dir),
        "--uvdir", str(data_dir / "uv"),
        "--shape_codes_path", str(data_dir / "factors_id.npy"),
        "--netdepth", "2", "--netwidth", "8",
        "--netdepth_fine", "2", "--netwidth_fine", "8",
        "--N_samples", "4", "--N_importance", "4",
        "--compute_dtype", "float32",
    ]
    main(argv)
    frames = sorted(os.listdir(out))
    pngs = [f for f in frames if f.endswith(".png")]
    assert len(pngs) == 2, frames
    import imageio.v2 as imageio

    img = imageio.imread(out / pngs[0])
    assert img.shape[:2] == (16, 16)
    assert np.isfinite(img.astype(np.float32)).all()

    # the distillation saved a deployable artifact; a second run loads it
    # (no re-distill) and reproduces the frames
    assert student.exists()
    main(argv)
    img2 = imageio.imread(out / pngs[0])
    np.testing.assert_array_equal(img2, img)

    # the conditioned artifact also serves a single --expression orbit
    # through the plain --distill path (code comes from the flag)
    argv_single = [a for a in argv if a != "--distill_cond"]
    argv_single[argv_single.index("--out_dir") + 1] = str(tmp_path / "single")
    main(["--expression", "1"] + argv_single + ["--distill"])
    assert len(os.listdir(tmp_path / "single")) >= 2


def test_run_render_artifact_person_mismatch(tmp_path):
    """A saved artifact records its identity; serving it for a different
    --person errors instead of silently mixing identities (ADVICE r2)."""
    import pytest

    from mofanerf_tpu.cli.run_render import main

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=2, n_train=1, n_test=1, hw=16)
    student = tmp_path / "student.npz"
    argv_tail = [
        "--n_views", "1",
        "--render_factor", "32",
        "--distill",
        "--distill_steps", "2",
        "--n_samples", "8",
        "--student_path", str(student),
        "--expname", "smoke",
        "--basedir", str(tmp_path / "logs"),
        "--datadir", str(data_dir),
        "--uvdir", str(data_dir / "uv"),
        "--shape_codes_path", str(data_dir / "factors_id.npy"),
        "--netdepth", "2", "--netwidth", "8",
        "--netdepth_fine", "2", "--netwidth_fine", "8",
        "--N_samples", "4", "--N_importance", "4",
        "--compute_dtype", "float32",
    ]
    main(["--out_dir", str(tmp_path / "a"), "--person", "0"] + argv_tail)
    assert student.exists()
    with pytest.raises(SystemExit, match="person"):
        main(["--out_dir", str(tmp_path / "b"), "--person", "1"] + argv_tail)


def test_run_render_distill_avatars_morph(tmp_path):
    """--distill_avatars renders an identity-morphing orbit through one
    multi-avatar student."""
    from mofanerf_tpu.cli.run_render import main

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=2, n_train=1, n_test=1, hw=16)
    out = tmp_path / "morph"
    main([
        "--out_dir", str(out),
        "--n_views", "3",
        "--render_factor", "32",
        "--distill_avatars", "0,1",
        "--distill_steps", "4",
        "--n_samples", "8",
        "--expname", "smoke",
        "--basedir", str(tmp_path / "logs"),
        "--datadir", str(data_dir),
        "--uvdir", str(data_dir / "uv"),
        "--shape_codes_path", str(data_dir / "factors_id.npy"),
        "--netdepth", "2", "--netwidth", "8",
        "--netdepth_fine", "2", "--netwidth_fine", "8",
        "--N_samples", "4", "--N_importance", "4",
        "--compute_dtype", "float32",
    ])
    pngs = [f for f in sorted(os.listdir(out)) if f.endswith(".png")]
    assert len(pngs) == 3, pngs
    import imageio.v2 as imageio

    img = imageio.imread(out / pngs[0])
    assert img.shape[:2] == (16, 16)
    assert np.isfinite(img.astype(np.float32)).all()


def test_run_render_artifact_expression_mismatch(tmp_path):
    """A non-expression-conditioned artifact is only trained at the
    expression it was distilled for; requesting another errors instead of
    rendering untrained code regions."""
    import pytest

    from mofanerf_tpu.cli.run_render import main

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=1, n_train=1, n_test=1, hw=16)
    student = tmp_path / "student.npz"
    argv_tail = [
        "--n_views", "1",
        "--render_factor", "32",
        "--distill",
        "--distill_steps", "2",
        "--n_samples", "8",
        "--student_path", str(student),
        "--expname", "smoke",
        "--basedir", str(tmp_path / "logs"),
        "--datadir", str(data_dir),
        "--uvdir", str(data_dir / "uv"),
        "--shape_codes_path", str(data_dir / "factors_id.npy"),
        "--netdepth", "2", "--netwidth", "8",
        "--netdepth_fine", "2", "--netwidth_fine", "8",
        "--N_samples", "4", "--N_importance", "4",
        "--compute_dtype", "float32",
    ]
    main(["--out_dir", str(tmp_path / "a"), "--expression", "0"] + argv_tail)
    assert student.exists()
    with pytest.raises(SystemExit, match="expression"):
        main(["--out_dir", str(tmp_path / "b"), "--expression", "1"]
             + argv_tail)


def test_run_render_avatar_artifact_autofill(tmp_path):
    """An avatar artifact carries its covered ids: reloading it with plain
    --distill (no --distill_avatars) serves the recorded avatars instead of
    rejecting the cond_dim."""
    from mofanerf_tpu.cli.run_render import main

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=2, n_train=1, n_test=1, hw=16)
    student = tmp_path / "avatars.npz"
    argv_tail = [
        "--n_views", "2",
        "--render_factor", "32",
        "--distill_steps", "4",
        "--n_samples", "8",
        "--student_path", str(student),
        "--expname", "smoke",
        "--basedir", str(tmp_path / "logs"),
        "--datadir", str(data_dir),
        "--uvdir", str(data_dir / "uv"),
        "--shape_codes_path", str(data_dir / "factors_id.npy"),
        "--netdepth", "2", "--netwidth", "8",
        "--netdepth_fine", "2", "--netwidth_fine", "8",
        "--N_samples", "4", "--N_importance", "4",
        "--compute_dtype", "float32",
    ]
    main(["--out_dir", str(tmp_path / "a"), "--distill_avatars", "0,1"]
         + argv_tail)
    assert student.exists()
    out_b = tmp_path / "b"
    main(["--out_dir", str(out_b), "--distill"] + argv_tail)
    pngs = [f for f in sorted(os.listdir(out_b)) if f.endswith(".png")]
    assert len(pngs) == 2, pngs


def test_run_render_fast_rejects_saturated_grid(tmp_path, capsys):
    """A training-maintained grid from before the proposal-grid fix can be
    fine-probed and saturated (occ ~1.0) — the --fast path must re-probe
    the coarse field instead of rendering through it."""
    import jax.numpy as jnp
    from mofanerf_tpu.cli.run_render import main
    from mofanerf_tpu.ops.occupancy import OccupancyGrid, save_grid

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=1, n_train=1, n_test=1, hw=16)
    ckpt_dir = tmp_path / "logs" / "smoke" / "checkpoints"
    os.makedirs(ckpt_dir)
    sat = OccupancyGrid(jnp.ones((8, 8, 8), bool),
                        jnp.asarray([-5.0] * 3), jnp.asarray([5.0] * 3))
    save_grid(str(ckpt_dir / "occupancy_grid.npz"), sat)
    out = tmp_path / "orbit"
    main([
        "--out_dir", str(out),
        "--n_views", "2",
        "--render_factor", "32",          # 16x16 frames
        "--fast",
        "--expname", "smoke",
        "--basedir", str(tmp_path / "logs"),
        "--datadir", str(data_dir),
        "--uvdir", str(data_dir / "uv"),
        "--shape_codes_path", str(data_dir / "factors_id.npy"),
        "--netdepth", "2", "--netwidth", "8",
        "--netdepth_fine", "2", "--netwidth_fine", "8",
        "--N_samples", "4", "--N_importance", "4",
        "--compute_dtype", "float32", "--packet_size", "64",
    ])
    outtxt = capsys.readouterr().out
    assert "re-probing" in outtxt
    pngs = [f for f in os.listdir(out) if f.endswith(".png")]
    assert len(pngs) == 2
