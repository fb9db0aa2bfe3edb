"""CLI argument presets: the two-pass live_version dispatch and preset
defaults (reference models/arguments_live.py:31-54)."""

from videollm_online_tpu.core.arguments import parse_args


def test_live1_plus_defaults():
    a = parse_args(["--live_version", "live1+"])
    assert a.frame_num_tokens == 10
    assert a.frame_token_interval == ","
    assert a.frame_token_pooled == [3, 3]
    assert a.max_num_frames == 1200
    assert a.embed_mark == "2fps_384_1+3x3"
    cfg = a.to_live_config()
    assert cfg.frame_num_tokens == 10
    assert cfg.lora.r == 128 and cfg.lora.alpha == 256


def test_live1_defaults():
    a = parse_args(["--live_version", "live1"])
    assert a.frame_num_tokens == 1
    assert a.frame_token_interval == ""
    assert a.frame_token_pooled is None
    assert a.max_num_frames == 7200
    assert a.embed_mark == "2fps_384_1"
    cfg = a.to_live_config()
    assert cfg.frame_token_interval == ""
    assert cfg.frame_token_pooled is None


def test_overrides_win():
    a = parse_args(["--live_version", "live1+", "--learning_rate", "1e-4",
                    "--max_num_frames", "600", "--bf16", "false",
                    "--train_datasets", "coin_step_train", "robustness"])
    assert a.learning_rate == 1e-4
    assert a.max_num_frames == 600
    assert a.bf16 is False
    assert a.train_datasets == ["coin_step_train", "robustness"]
