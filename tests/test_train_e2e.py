"""End-to-end training: tiny model + synthetic COIN -> loss decreases, the
adapter checkpoint round-trips, and evaluation produces metrics through the
evaluator dispatch (reference train.py / evaluate.py driver behavior)."""

import json
import os

import numpy as np
import pytest

from videollm_online_tpu.core.arguments import parse_args
from videollm_online_tpu.data.registry import _REGISTRY
from videollm_online_tpu.models.builder import build_model_and_tokenizer


@pytest.fixture(scope="module")
def coin_root(tmp_path_factory):
    from _synthetic import make_coin_root
    return make_coin_root(str(tmp_path_factory.mktemp("coin")))


def _args(coin_root, out, extra=()):
    return parse_args([
        "--live_version", "live1+",
        "--model_size", "tiny",
        "--bf16", "false",
        "--vision_hidden_size", "32",
        "--train_datasets", "coin_step_train",
        "--eval_datasets", "coin_step_test",
        "--max_steps", "6",
        "--gradient_accumulation_steps", "1",
        "--learning_rate", "1e-3",
        "--logging_steps", "1",
        "--dataloader_num_workers", "0",
        "--pad_to_multiple", "16",
        "--output_dir", out,
        *extra,
    ])


def test_train_and_evaluate(coin_root, tmp_path, monkeypatch):
    monkeypatch.setenv("COIN_ROOT", coin_root)
    monkeypatch.setattr(
        "videollm_online_tpu.data.coin.base.COIN.root", coin_root)
    out = str(tmp_path / "run")
    from videollm_online_tpu.train_entry import train
    import sys
    sys.argv = ["train"]
    trainer = train([
        "--live_version", "live1+", "--model_size", "tiny",
        "--bf16", "false", "--vision_hidden_size", "32",
        "--train_datasets", "coin_step_train",
        "--eval_datasets", "coin_step_test",
        "--max_steps", "6", "--gradient_accumulation_steps", "1",
        "--learning_rate", "1e-3", "--logging_steps", "1",
        "--dataloader_num_workers", "0", "--pad_to_multiple", "16",
        "--output_dir", out,
    ])
    # loss decreased over training
    losses = [json.loads(l)["loss"]
              for l in open(os.path.join(out, "metrics.jsonl"))
              if "loss" in json.loads(l)]
    assert len(losses) >= 5
    assert losses[-1] < losses[0]
    # adapter checkpoint exists
    assert os.path.isdir(os.path.join(out, "adapter"))
    # eval results written with accuracy metric
    results = json.load(open(os.path.join(out, "eval_results.json")))
    assert "coin_step_test" in results
    assert "accuracy" in results["coin_step_test"]


def test_adapter_roundtrip(coin_root, tmp_path, monkeypatch):
    monkeypatch.setattr(
        "videollm_online_tpu.data.coin.base.COIN.root", coin_root)
    out = str(tmp_path / "run2")
    args = _args(coin_root, out)
    params, tok, cfg = build_model_and_tokenizer(args)
    from videollm_online_tpu.train.checkpoints import (load_adapter_into,
                                                       save_adapter)
    import jax
    bumped = dict(params)
    bumped["connector"] = jax.tree.map(lambda x: x + 1.0, params["connector"])
    save_adapter(os.path.join(out, "adapter"), bumped)
    restored = load_adapter_into(params, os.path.join(out, "adapter"))
    np.testing.assert_allclose(
        np.asarray(restored["connector"]["fc1"]["b"]),
        np.asarray(params["connector"]["fc1"]["b"]) + 1.0)


def test_quantize_base_qlora_loss_trace_parity(coin_root, tmp_path,
                                               monkeypatch):
    """--quantize_base int8 (QLoRA-analog, VERDICT r3 #4): the frozen base
    decoder is weight-only int8 while LoRA+connector train in full
    precision. The loss trace must track the bf16/fp32-base run within
    quantization noise, still decrease, and the adapter must save — the
    configuration that makes flagship-8B training fit one chip."""
    monkeypatch.setenv("COIN_ROOT", coin_root)
    monkeypatch.setattr(
        "videollm_online_tpu.data.coin.base.COIN.root", coin_root)
    from videollm_online_tpu.train_entry import train

    def losses_of(out, extra=()):
        train([
            "--live_version", "live1+", "--model_size", "tiny",
            "--bf16", "false", "--vision_hidden_size", "32",
            "--train_datasets", "coin_step_train",
            "--max_steps", "6", "--gradient_accumulation_steps", "1",
            "--learning_rate", "1e-3", "--logging_steps", "1",
            "--dataloader_num_workers", "0", "--pad_to_multiple", "16",
            "--output_dir", out, *extra,
        ])
        return [json.loads(l)["loss"]
                for l in open(os.path.join(out, "metrics.jsonl"))
                if "loss" in json.loads(l)]

    base = losses_of(str(tmp_path / "fp"))
    quant = losses_of(str(tmp_path / "q8"), ("--quantize_base", "int8"))
    assert len(quant) == len(base) >= 5
    assert quant[-1] < quant[0]  # training still learns
    for s, (a, b) in enumerate(zip(base, quant)):
        assert abs(a - b) / max(abs(a), 1e-9) < 0.08, (
            f"step {s}: fp-base {a} vs int8-base {b} diverged beyond "
            "quant noise")
    # the int8 base really is int8 on the training path
    from videollm_online_tpu.core.arguments import parse_args as pa
    args = pa(["--live_version", "live1+", "--model_size", "tiny",
               "--bf16", "false", "--vision_hidden_size", "32",
               "--quantize_base", "int8",
               "--output_dir", str(tmp_path / "chk")])
    params, _, _ = build_model_and_tokenizer(args)
    import jax.numpy as jnp
    assert params["llama"]["layers"]["w_gate"]["q8"].dtype == jnp.int8
    assert "lora" in params
