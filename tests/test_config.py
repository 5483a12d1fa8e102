import textwrap

from mofanerf_tpu.config import Config, load_config, parse_config_file


def test_defaults_match_reference():
    cfg = Config()
    assert cfg.netdepth == 8 and cfg.netwidth == 256
    assert cfg.netdepth_fine == 10 and cfg.netwidth_fine == 1024
    assert cfg.N_samples == 64 and cfg.N_importance == 64
    assert cfg.N_rand == 1024
    assert cfg.input_ch_shapeCodes == 50
    assert cfg.input_ch_expCodes == 30
    assert cfg.input_ch_textureCodes == 256


def test_parse_reference_config_format(tmp_path):
    p = tmp_path / "exp.txt"
    p.write_text(
        textwrap.dedent(
            """
            expname = mofanerf #_LMSample
            person_num = 300
            no_batching = True
            netchunk = 196608 #16384
            N_rand = 1024 #64
            lrate=5e-5  #5e-5
            """
        )
    )
    vals = parse_config_file(str(p))
    assert vals["expname"] == "mofanerf"
    assert vals["N_rand"] == "1024"

    cfg = load_config(["--config", str(p)])
    assert cfg.expname == "mofanerf"
    assert cfg.N_rand == 1024
    assert cfg.no_batching is True
    assert cfg.lrate == 5e-5


def test_cli_overrides_file(tmp_path):
    p = tmp_path / "exp.txt"
    p.write_text("N_rand = 1024\n")
    cfg = load_config(["--config", str(p), "--N_rand", "64", "--netwidth_fine", "128"])
    assert cfg.N_rand == 64
    assert cfg.netwidth_fine == 128


def test_model_spec_construction():
    spec = Config(netwidth_fine=128, N_samples=8, compute_dtype="float32").model_spec()
    assert spec.fine.width == 128
    assert spec.render.n_coarse == 8


def test_shipped_config_loads():
    import os
    cfg = load_config(["--config", os.path.join(os.path.dirname(__file__), "..", "configs", "exp_mofanerf.txt")])
    assert cfg.expname == "mofanerf"
    assert cfg.netwidth_fine == 1024 and cfg.netdepth_fine == 10
    assert cfg.N_rand == 1024 and cfg.lrate == 5e-5
    assert cfg.compute_dtype == "bfloat16"
    spec = cfg.model_spec()
    assert spec.fine.width == 1024
