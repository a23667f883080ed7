"""Config surface tests: @argfile/yaml invocation modes, defaults, derived
fields (reference src/config.py semantics)."""

from cfpnet_tpu.config import Config, parse_config


def test_defaults_match_reference():
    """Defaults mirror reference src/config.py:14-93."""
    c = Config()
    assert c.epochs == 25 and c.n_bins == 80 and c.lr == 3e-4 and c.wd == 0.1
    assert c.bs == 16 and c.norm == "linear"
    assert c.input_height == 416 and c.input_width == 544
    assert c.min_depth == 1e-3 and c.max_depth == 10
    assert c.zone_sample_num == 16 and c.train_zone_num == 8
    assert c.attention_layer == ["hist2image", "image", "hist2image", "image"]
    assert c.simu_max_distance == 4.0 and c.zone_type == "8x8"
    assert c.selected_epoch == "-1"
    # derived fields (reference :118-121)
    assert c.batch_size == c.bs and c.num_workers == c.workers


def test_argfile_mode(tmp_path):
    f = tmp_path / "cfg.txt"
    f.write_text(
        "--bs 4\n--n_bins 128\n--attention_layer hist2image combine1 image\n"
        "--change_embedding\n--disable_clip_grad\n--lr 0.001\n"
    )
    c = parse_config([f"@{f}"])
    assert c.bs == 4 and c.n_bins == 128 and c.lr == 0.001
    assert c.attention_layer == ["hist2image", "combine1", "image"]
    assert c.change_embedding and c.disable_clip_grad
    assert not c.hist_encoder_10x


def test_yaml_mode(tmp_path):
    f = tmp_path / "cfg.yaml"
    f.write_text("bs: 3\nn_bins: 32\nchange_embedding: true\nname: yamltest\n")
    c = parse_config([str(f)])
    assert c.bs == 3 and c.n_bins == 32 and c.change_embedding
    assert c.name == "yamltest"
    assert c.epochs == 25  # unset keys fall back to defaults


def test_production_config_parses():
    c = parse_config(["@configs/train_cfpnet_combine1.txt"])
    assert c.n_bins == 256 and c.epochs == 30 and c.train_zone_num == 6
    assert c.attention_layer == [
        "hist2image", "combine1", "image", "hist2image", "combine1", "image",
    ]
    assert c.sample_uniform and c.change_embedding and c.hist_encoder_10x
    assert c.drop_hist == 0.34 and c.noise_prob == 0.30
    assert c.do_random_rotate and c.disable_clip_grad


def test_alias_flags():
    c = parse_config(["--n-bins", "99", "--learning-rate", "0.01"])
    assert c.n_bins == 99 and c.lr == 0.01


def test_replace_immutability():
    c = Config()
    c2 = c.replace(bs=99)
    assert c.bs == 16 and c2.bs == 99
