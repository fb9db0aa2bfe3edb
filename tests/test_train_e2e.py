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
