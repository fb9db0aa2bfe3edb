"""Golden tests: our chat template / learn-range logic vs the executed
reference implementation (fixtures from tests/golden/gen_golden.py)."""

import json
import os

import numpy as np
import pytest

from videollm_online_tpu.core.config import live1_config, live1_plus_config
from videollm_online_tpu.tokenizer.chat import (
    ChatFormat, get_learn_ranges, render_conversation)
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
from videollm_online_tpu.data.collator import collate

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "chat_golden.json")
FMT = ChatFormat(bos_token="<bos>", eos_token="<eos>")


def _cfg(preset):
    return live1_plus_config() if preset == "live1plus" else live1_config()


@pytest.fixture(scope="module")
def cases():
    with open(GOLDEN) as f:
        return json.load(f)


def test_render_matches_reference(cases):
    for case in cases:
        cfg = _cfg(case["preset"])
        flags = case.get("flags") or {}
        text = render_conversation(case["conversation"], cfg, FMT, **flags)
        assert text == case["text"], case


def test_learn_ranges_match_reference(cases):
    for case in cases:
        if case["learn_ranges"] is None:
            continue
        cfg = _cfg(case["preset"])
        got = get_learn_ranges(case["conversation"], cfg, FMT)
        assert [[r.start, r.stop] for r in got] == case["learn_ranges"], case


def test_learn_ranges_point_at_expected_chars(cases):
    """Each live1+ stream learn-range must cover ',' (or ']\\n' for the final
    frame of a turn); assistant ranges must cover 'Assistant: ...<eos>'."""
    for case in cases:
        if case["learn_ranges"] is None or case["preset"] != "live1plus":
            continue
        text = case["text"]
        for start, stop in case["learn_ranges"]:
            span = text[start:stop]
            assert span in (",", "]\n") or (
                span.startswith("Assistant: ") and span.endswith("<eos>")), span


@pytest.mark.parametrize("preset", ["live1plus", "live1"])
def test_collator_labels(preset, cases):
    cfg = _cfg(preset)
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg
    conv = [
        {"role": "system", "content": "s."},
        {"role": "stream", "num_frames": 2, "learn": True},
        {"role": "assistant", "content": "hi", "learn": True},
    ]
    text = tok.apply_chat_template(conv)
    ranges = tok.get_learn_ranges(conv)
    batch = collate([(text, None, ranges, 0, None)], tokenizer=tok)
    ids, labels = batch["input_ids"][0], batch["labels"][0]

    v_id, eos_id = cfg.v_placeholder_id, cfg.eos_token_id
    v_positions = np.nonzero(ids == v_id)[0]
    per_frame = cfg.frame_num_tokens
    assert len(v_positions) == 2 * per_frame
    # label at the last <v> of frame 1: interval token (live1+) / EOS (live1)
    last_v_f1 = v_positions[per_frame - 1]
    if cfg.frame_token_interval:
        assert labels[last_v_f1] == cfg.frame_token_interval_id
    else:
        assert labels[last_v_f1] == eos_id
    # the assistant response must be supervised and terminate with EOS
    sup = np.nonzero(labels != -100)[0]
    assert labels[sup[-1]] == eos_id
    # decoded supervised span contains the response text
    resp_label_ids = [l for l in labels[sup] if l < 256]
    assert "hi" in bytes([int(x) for x in resp_label_ids]).decode()
    # nothing outside learn ranges is supervised on the text side
    assert labels[0] == -100


def test_collator_v_targets_remap_to_eos():
    """live1: per-frame targets are <v> ids in the raw ranges and must be
    remapped to EOS (data_collator.py:23)."""
    cfg = live1_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    conv = [
        {"role": "system", "content": "s."},
        {"role": "stream", "num_frames": 3, "learn": True},
        {"role": "assistant", "content": "ok", "learn": True},
    ]
    batch = collate([(tok.apply_chat_template(conv), None,
                      tok.get_learn_ranges(conv), 0, None)], tokenizer=tok)
    assert (batch["labels"] < tok.cfg.v_placeholder_id).all()


@pytest.mark.parametrize("preset", ["live1plus", "live1"])
def test_collator_pad_region_labels_are_ignore(preset):
    """Right padding + a learn range ending at the final EOS must NOT spill
    eos (==pad) labels into the pad region (advisor finding r1-high): the
    reference's fallback stop=len(input_ids) assumes LEFT padding
    (data_collator.py:18)."""
    cfg = _cfg(preset)
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg
    conv = [
        {"role": "system", "content": "s."},
        {"role": "stream", "num_frames": 2, "learn": True},
        {"role": "assistant", "content": "hi", "learn": True},
    ]
    sample = (tok.apply_chat_template(conv), None,
              tok.get_learn_ranges(conv), 0, None)
    batch = collate([sample], tokenizer=tok, pad_to_multiple=256)
    ids, labels, am = (batch["input_ids"][0], batch["labels"][0],
                       batch["attention_mask"][0])
    n_real = int(am.sum())
    assert n_real < ids.shape[0], "test needs actual padding"
    assert (labels[n_real:] == -100).all(), "labels spilled into pad region"
    # the final eos of the real sequence is still supervised
    assert labels[n_real - 2] == cfg.eos_token_id
    # padded and unpadded collation agree on the real region
    ref = collate([sample], tokenizer=tok)
    assert (ref["labels"][0] == labels[:ref["labels"].shape[1]]).all()


def test_batch_padding_sides():
    cfg = live1_plus_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    conv_short = [{"role": "system", "content": "a"},
                  {"role": "stream", "num_frames": 1, "learn": True}]
    conv_long = [{"role": "system", "content": "a much longer system prompt"},
                 {"role": "stream", "num_frames": 3, "learn": True}]
    samples = [
        (tok.apply_chat_template(conv_short), None, tok.get_learn_ranges(conv_short), 0, None),
        (tok.apply_chat_template(conv_long), None, tok.get_learn_ranges(conv_long), 1, None),
    ]
    # default: right padding (causal mask hides pads on the TPU fast path)
    batch = collate(samples, tokenizer=tok)
    am = batch["attention_mask"]
    assert am[0, 0] == 1 and am[0, -1] == 0
    assert am[1].all()
    # left padding still available for HF-style batched generation
    enc = tok.batch_encode([samples[0][0], samples[1][0]],
                           padding_side="left")
    assert enc["attention_mask"][0, 0] == 0
    assert enc["attention_mask"][0, -1] == 1
