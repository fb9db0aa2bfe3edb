"""The PUBLIC LiveTrainer driver on a multi-device mesh: train() must put
batches on the mesh (data axis actually splits work) and produce the same
loss trace as the single-device run; evaluate() must stride samples per
process and still cover the dataset (reference HF eval-loop gather,
engine/trainer_with_gen2eval.py:20-21)."""

import json
import os

import pytest


@pytest.fixture(scope="module")
def coin_root(tmp_path_factory):
    from _synthetic import make_coin_root
    return make_coin_root(str(tmp_path_factory.mktemp("coin")))


def _run(coin_root, out, extra=(), with_eval=False):
    import sys
    sys.argv = ["train"]
    from videollm_online_tpu.train_entry import train
    # the end-of-train evaluate() pass (train_entry) costs more than the 4
    # train steps on the 1-core CI host; only the strides test needs it
    ev = (["--eval_datasets", "coin_step_test"] if with_eval else [])
    return train([
        "--live_version", "live1+", "--model_size", "tiny",
        "--bf16", "false", "--vision_hidden_size", "32",
        "--train_datasets", "coin_step_train", *ev,
        "--max_steps", "4", "--gradient_accumulation_steps", "1",
        "--per_device_train_batch_size", "4",
        "--learning_rate", "1e-3", "--logging_steps", "1",
        "--dataloader_num_workers", "0", "--pad_to_multiple", "16",
        "--output_dir", out, *extra,
    ])


def _losses(out):
    return [json.loads(l)["loss"]
            for l in open(os.path.join(out, "metrics.jsonl"))
            if "loss" in json.loads(l)]


@pytest.fixture(scope="module")
def single_losses(coin_root, tmp_path_factory):
    """Single-device baseline loss trace, shared by the mesh and both SP
    equality tests (one run instead of three on the 1-core CI host)."""
    import unittest.mock
    out = str(tmp_path_factory.mktemp("single"))
    with unittest.mock.patch(
            "videollm_online_tpu.data.coin.base.COIN.root", coin_root):
        _run(coin_root, out)
    return _losses(out)


def test_trainer_train_on_mesh_matches_single(coin_root, single_losses,
                                              tmp_path, monkeypatch):
    monkeypatch.setattr(
        "videollm_online_tpu.data.coin.base.COIN.root", coin_root)
    out_b = str(tmp_path / "mesh")
    trainer = _run(coin_root, out_b, extra=["--mesh_model_axis", "2"])
    assert trainer.mesh is not None
    # the batch really landed on the mesh: trainable state is sharded
    import jax
    leaf = jax.tree_util.tree_leaves(trainer.state.trainable)[0]
    assert len(leaf.sharding.device_set) > 1
    la, lb = single_losses, _losses(out_b)
    assert len(la) == len(lb) == 4
    for a, b in zip(la, lb):
        assert abs(a - b) <= 1e-4 * max(abs(a), 1.0), (la, lb)


def test_evaluate_strides_by_process(coin_root, tmp_path, monkeypatch):
    monkeypatch.setattr(
        "videollm_online_tpu.data.coin.base.COIN.root", coin_root)
    out = str(tmp_path / "ev")
    trainer = _run(coin_root, out, with_eval=True)

    name = "coin_step_test"
    ds = trainer.eval_dataset_dict[name]
    accessed = []

    class Recorder:
        def __len__(self):
            return len(ds)

        def __getitem__(self, i):
            accessed.append(i)
            return ds[i]

        compute_metrics = staticmethod(ds.compute_metrics)

    trainer.eval_dataset_dict[name] = Recorder()
    trainer.evaluate(name, process_index=0, process_count=2)
    half0 = list(accessed)
    accessed.clear()
    trainer.evaluate(name, process_index=1, process_count=2)
    half1 = list(accessed)
    assert half0 == list(range(0, len(ds), 2))
    assert half1 == list(range(1, len(ds), 2))
    assert sorted(half0 + half1) == list(range(len(ds)))


@pytest.mark.parametrize("impl", ["sp_ring", "sp_ulysses"])
def test_trainer_train_with_sequence_parallel_attention(coin_root,
                                                        single_losses,
                                                        tmp_path,
                                                        monkeypatch, impl):
    """attn_implementation=sp_ring/sp_ulysses: the public trainer binds the
    SP attention to its model axis and the loss trace matches the
    single-device run (generation inside evaluate routes its cache-decode
    shapes back to the auto dispatch)."""
    monkeypatch.setattr(
        "videollm_online_tpu.data.coin.base.COIN.root", coin_root)
    out_b = str(tmp_path / impl)
    trainer = _run(coin_root, out_b,
                   extra=["--mesh_model_axis", "2",
                          "--attn_implementation", impl])
    assert callable(trainer.attn_impl)
    la, lb = single_losses, _losses(out_b)
    assert len(la) == len(lb) == 4
    for a, b in zip(la, lb):
        assert abs(a - b) <= 5e-4 * max(abs(a), 1.0), (la, lb)
