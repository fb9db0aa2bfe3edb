"""Threaded pipeline: overlapped producer/consumer yields exactly the
sequential engine's transcript (no races, no lost/duplicated events)."""

import numpy as np
import pytest

import jax

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live
from videollm_online_tpu.serve.engine import LiveInferEngine
from videollm_online_tpu.serve.pipeline import StreamingPipeline
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer


def _make(seed=0):
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(max_response_tokens=12)
    params = live.init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, tok, params


def test_pipeline_matches_sequential():
    cfg, tok, params = _make()
    n_frames = 6
    feats = np.random.RandomState(0).randn(
        n_frames, cfg.frame_num_tokens,
        cfg.vision_hidden_size).astype(np.float32)
    duration = (n_frames - 1) / cfg.frame_fps

    # sequential reference
    seq = LiveInferEngine(params, tok, cfg, kv_capacity=512)
    seq.load_video(feats)
    seq_events = []
    t = 0.0
    while t <= duration:
        seq.input_video_stream(t)
        while True:
            q, r = seq()
            if r is None:
                break
            seq_events.append((q, r))
        t += 1.0 / cfg.frame_fps

    # threaded pipeline
    eng = LiveInferEngine(params, tok, cfg, kv_capacity=512)
    eng.load_video(feats)
    pipe = StreamingPipeline(eng, realtime=False)
    pipe.start_video(duration)
    events = pipe.drain()
    pipe.stop()

    assert events == seq_events
    assert len(events) >= 1
