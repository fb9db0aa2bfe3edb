"""Artifact-contract dry run of the real-weights path (docs/SERVING.md
"Real weights"): synthetic HF checkpoint -> convert_weights (int8 Orbax) ->
serve CLI, asserting each stage's artifact contract so the first
environment with hub egress can execute the same commands on the genuine
Llama-3-8B snapshot (reference README.md:47 re-downloads from the hub at
every launch; here conversion is one-time)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

pytest.importorskip("torch")
pytest.importorskip("safetensors")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(cmd):
    env = dict(os.environ, PYTHONPATH="", JAX_PLATFORMS="cpu")
    r = subprocess.run([sys.executable] + cmd, cwd=REPO, env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 0, r.stderr[-2000:]
    return r.stdout


@pytest.fixture(scope="module")
def hf_dir(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("hf"))
    out = _run(["tools/make_synthetic_checkpoint.py", "--family", "llama",
                "--size", "tiny", "--out", d])
    assert "synthetic llama (tiny) checkpoint" in out
    return d


def test_stage1_hub_snapshot_contract(hf_dir):
    """Stage 1 artifact = HF hub layout: sharded safetensors + an index
    whose weight_map covers every tensor convert_weights expects."""
    idx = json.load(open(os.path.join(hf_dir, "model.safetensors.index.json")))
    wm = idx["weight_map"]
    for f in set(wm.values()):
        assert os.path.exists(os.path.join(hf_dir, f))
    from videollm_online_tpu.core.config import LlamaConfig
    from videollm_online_tpu.models.builder import PROXY_SIZES
    cfg = LlamaConfig(**PROXY_SIZES["tiny"])
    need = {"model.embed_tokens.weight", "model.norm.weight",
            "lm_head.weight"}
    for i in range(cfg.num_layers):
        for n in ("self_attn.q_proj", "self_attn.k_proj", "self_attn.v_proj",
                  "self_attn.o_proj", "mlp.gate_proj", "mlp.up_proj",
                  "mlp.down_proj", "input_layernorm",
                  "post_attention_layernorm"):
            need.add(f"model.layers.{i}.{n}.weight")
    assert need <= set(wm), need - set(wm)


@pytest.fixture(scope="module")
def orbax_dir(hf_dir, tmp_path_factory):
    d = str(tmp_path_factory.mktemp("jax")) + "/ckpt"
    out = _run(["tools/convert_weights.py", "--src", hf_dir, "--dst", d,
                "--family", "llama", "--size", "tiny", "--int8"])
    assert "converted" in out
    return d


def test_stage2_orbax_contract(orbax_dir):
    """Stage 2 artifact = an Orbax tree the trainer/server loads directly:
    int8 decoder mats as {q8, scale} dicts, norms unquantized."""
    from videollm_online_tpu.train.checkpoints import restore_params
    params = restore_params(orbax_dir)
    layers = params["layers"]
    for n in ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down"):
        assert "q8" in layers[n] and "scale" in layers[n], n
        assert layers[n]["q8"].dtype == np.int8
    assert not isinstance(layers["attn_norm"], dict)
    assert "embed" in params and "lm_head" in params


def test_stage3_served_from_converted_checkpoint(orbax_dir, tmp_path):
    """Stage 3 = the serve CLI consumes the stage-2 artifact and produces a
    dialogue history JSON with FPS accounting (reference demo/cli.py:42-49)."""
    from videollm_online_tpu.core.config import live1_plus_config
    cfg = live1_plus_config()
    feats = (np.random.RandomState(0)
             .randn(12, cfg.frame_num_tokens, cfg.vision_hidden_size)
             .astype(np.float32))
    video = str(tmp_path / "feats.npy")
    np.save(video, feats)
    hist = str(tmp_path / "hist.json")
    from videollm_online_tpu.serve.cli import main
    main(["--video", video, "--checkpoint", orbax_dir,
          "--model_size", "tiny", "--dtype", "float32",
          "--num_ticks", "12", "--output", hist])
    h = json.load(open(hist))
    msgs = h if isinstance(h, list) else h.get("messages", h)
    assert len(msgs) >= 1
    flat = json.dumps(h)
    assert "fps" in flat.lower()
