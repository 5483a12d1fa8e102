"""End-to-end training driver test on the synthetic FaceScape fixture."""
import os

import numpy as np

from mofanerf_tpu.config import Config
from mofanerf_tpu.data.facescape import make_synthetic_dataset


def test_train_loop_e2e(tmp_path):
    from mofanerf_tpu.train.loop import train

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=2, n_train=2, n_test=1, hw=16)

    cfg = Config(
        expname="smoke",
        basedir=str(tmp_path / "logs"),
        datadir=str(data_dir),
        uvdir=str(data_dir / "uv"),
        shape_codes_path=str(data_dir / "factors_id.npy"),
        landmarks_path=str(data_dir / "landmarks.npy"),
        person_num=2,
        netdepth=8, netwidth=16, netdepth_fine=8, netwidth_fine=16,
        N_rand=16, N_samples=4, N_importance=4,
        precrop_iters=2,
        i_print=2, i_weights=4, i_testset=4,
        compute_dtype="float32",
        packet_size=64,
        testskip=1,
    )
    train(cfg, n_iters=5, seed=0)

    exp_dir = tmp_path / "logs" / "smoke"
    assert (exp_dir / "train_log.txt").exists()
    log = (exp_dir / "train_log.txt").read_text()
    assert "Iteration" in log
    ckpts = os.listdir(exp_dir / "checkpoints")
    assert any(c == "000004" for c in ckpts), ckpts  # interval ckpt
    assert any(c == "000005" for c in ckpts), ckpts  # final ckpt
    test_renders = list(exp_dir.glob("testset_*/**/*.png"))
    assert test_renders, "no held-out render written"


def test_train_loop_resume(tmp_path):
    from mofanerf_tpu.train.loop import train

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=1, n_train=2, n_test=1, hw=16)
    cfg = Config(
        expname="resume",
        basedir=str(tmp_path / "logs"),
        datadir=str(data_dir),
        uvdir=str(data_dir / "uv"),
        shape_codes_path=str(data_dir / "factors_id.npy"),
        landmarks_path=str(data_dir / "landmarks.npy"),
        person_num=1,
        netdepth=8, netwidth=16, netdepth_fine=8, netwidth_fine=16,
        N_rand=8, N_samples=4, N_importance=4,
        precrop_iters=0, i_print=100, i_weights=100, i_testset=100,
        compute_dtype="float32", packet_size=64, testskip=1,
    )
    train(cfg, n_iters=3)
    # second invocation resumes from the final step-3 checkpoint
    train(cfg, n_iters=5)
    log = (tmp_path / "logs" / "resume" / "train_log.txt").read_text()
    assert "resumed from checkpoint at step 3" in log


def test_train_loop_maintains_occupancy_grid(tmp_path):
    """i_grid maintenance fires during training and the grid sidecar is
    checkpointed beside the train state and resumed."""
    from mofanerf_tpu.train.loop import train
    from mofanerf_tpu.ops.occupancy import load_grid

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=1, n_train=2, n_test=1, hw=16)
    cfg = Config(
        expname="gridsmoke",
        basedir=str(tmp_path / "logs"),
        datadir=str(data_dir),
        uvdir=str(data_dir / "uv"),
        shape_codes_path=str(data_dir / "factors_id.npy"),
        landmarks_path=str(data_dir / "landmarks.npy"),
        person_num=1,
        netdepth=8, netwidth=16, netdepth_fine=8, netwidth_fine=16,
        N_rand=8, N_samples=4, N_importance=4,
        precrop_iters=0, i_print=100, i_weights=4, i_testset=100,
        compute_dtype="float32", packet_size=64, testskip=1,
        i_grid=2, grid_warmup=2, grid_resolution=8,
        grid_density_threshold=0.0,
    )
    train(cfg, n_iters=4)
    grid_path = tmp_path / "logs" / "gridsmoke" / "checkpoints" / "occupancy_grid.npz"
    assert grid_path.exists(), "grid sidecar not saved"
    grid, ema = load_grid(str(grid_path))
    assert grid.occ.shape == (8, 8, 8)
    assert ema is not None and ema.shape == (512,)
    # threshold 0 + a fresh random field: some density probes exceed it
    assert float(ema.max()) > 0.0

    # resume path reloads the sidecar
    train(cfg, n_iters=6)
    log = (tmp_path / "logs" / "gridsmoke" / "train_log.txt").read_text()
    assert "resumed occupancy grid" in log


def test_train_loop_writes_config_snapshot(tmp_path):
    """args.txt snapshot parity (reference run_train.py:213-224)."""
    from mofanerf_tpu.train.loop import train

    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=1, n_train=1, n_test=1, hw=16)
    cfg = Config(
        expname="snap", basedir=str(tmp_path / "logs"), datadir=str(data_dir),
        uvdir=str(data_dir / "uv"),
        shape_codes_path=str(data_dir / "factors_id.npy"),
        landmarks_path=str(data_dir / "landmarks.npy"), person_num=1,
        netdepth=8, netwidth=16, netdepth_fine=8, netwidth_fine=16,
        N_rand=8, N_samples=4, N_importance=4, precrop_iters=0,
        i_print=100, i_weights=100, i_testset=100,
        compute_dtype="float32", packet_size=64, testskip=1, i_grid=0,
    )
    train(cfg, n_iters=1)
    args_txt = (tmp_path / "logs" / "snap" / "args.txt").read_text()
    assert "netwidth_fine = 16" in args_txt
    assert "lrate = 5e-05" in args_txt
