"""RefineNet corpus workflow smoke: render_refine_trainset ->
prepare_refine_trainset on a tiny synthetic dataset produce a paired
(render, GT) tree ready for GAN training (reference workflow:
render_refine_trainSet.py:242-307 -> prepare_refineNet_trainSet.py:1-16)."""
import json
import os

import numpy as np

from mofanerf_tpu.data.facescape import make_synthetic_dataset

TINY_NET = [
    "--netdepth", "2", "--netwidth", "8",
    "--netdepth_fine", "2", "--netwidth_fine", "8",
    "--N_samples", "4", "--N_importance", "4",
    "--compute_dtype", "float32", "--packet_size", "256",
]


def _dataset(tmp_path, n_ids=2):
    data_dir = tmp_path / "data"
    make_synthetic_dataset(str(data_dir), n_ids=n_ids, n_train=3, n_test=1,
                           hw=16)
    return data_dir


def _cfg_flags(tmp_path, data_dir):
    return [
        "--expname", "smoke",
        "--basedir", str(tmp_path / "logs"),
        "--datadir", str(data_dir),
        "--uvdir", str(data_dir / "uv"),
        "--shape_codes_path", str(data_dir / "factors_id.npy"),
        "--person_num", "2",
    ] + TINY_NET


def test_refine_corpus_render_and_pairing(tmp_path):
    from mofanerf_tpu.cli.prepare_refine_trainset import main as prepare_main
    from mofanerf_tpu.cli.render_refine_trainset import main as render_main

    data_dir = _dataset(tmp_path)
    out = tmp_path / "corpus"
    render_main([
        "--out_dir", str(out),
        "--exp_num", "2", "--view_num", "2", "--res", "16",
    ] + _cfg_flags(tmp_path, data_dir))

    manifest = json.load(open(out / "gt_manifest.json"))
    assert len(manifest) >= 4  # 2 ids x >=1 exp x 2 views
    for rel, gt_src in manifest.items():
        assert (out / rel).exists(), rel
        assert os.path.exists(gt_src), gt_src

    import imageio.v2 as imageio

    first = sorted(manifest)[0]
    img = imageio.imread(out / first)
    assert img.shape[:2] == (16, 16)
    assert np.isfinite(np.asarray(img, np.float32)).all()

    gt_dir = tmp_path / "gt"
    prepare_main(["--renders_dir", str(out), "--out_dir", str(gt_dir)])
    # mirrored tree: every render has a same-relpath GT of the same size
    for rel in manifest:
        assert (gt_dir / rel).exists(), rel
        gt = imageio.imread(gt_dir / rel)
        assert gt.shape[:2] == (16, 16)

    # resumability: rerun skips existing identity dirs without error
    render_main([
        "--out_dir", str(out),
        "--exp_num", "2", "--view_num", "2", "--res", "16",
    ] + _cfg_flags(tmp_path, data_dir))


def test_refine_corpus_person_sharding(tmp_path):
    """--begin_person/--end_person shard the identity range
    (render_refine_trainSet.py:158-159, README.md:125)."""
    from mofanerf_tpu.cli.render_refine_trainset import main as render_main

    data_dir = _dataset(tmp_path)
    out = tmp_path / "corpus"
    render_main([
        "--out_dir", str(out),
        "--begin_person", "1", "--end_person", "2",
        "--exp_num", "1", "--view_num", "1", "--res", "16",
    ] + _cfg_flags(tmp_path, data_dir))
    assert not (out / "0").exists()
    assert (out / "1").exists()
