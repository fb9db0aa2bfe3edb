"""Engine extras: raw-pixel input path (set_vision_inside equivalent),
runtime threshold adjustment without recompiles, capacity guard."""

import numpy as np
import pytest

import jax

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live, siglip
from videollm_online_tpu.serve.engine import LiveInferEngine
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer


def _setup(threshold=0.725):
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(frame_token_interval_threshold=threshold,
                          max_response_tokens=8)
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, tok, params


def test_raw_pixel_video_path():
    """uint8 frames -> on-the-fly SigLIP encode -> streaming (the reference's
    set_vision_inside in-the-wild mode, modeling_live.py:12-16)."""
    cfg, tok, params = _setup()
    vparams = siglip.init_params(jax.random.PRNGKey(1), cfg.vision)
    engine = LiveInferEngine(params, tok, cfg, vision_params=vparams,
                             kv_capacity=512)
    video = np.random.RandomState(0).randint(
        0, 255, (4, 3, cfg.vision.image_size, cfg.vision.image_size),
        np.uint8)
    engine.load_video(video)
    engine.input_video_stream(0.5)
    q, r = engine()
    assert r is not None and "Assistant:" in r


def test_runtime_threshold_change_changes_behavior():
    cfg, tok, params = _setup(threshold=0.9999)
    feats = np.random.RandomState(0).randn(
        4, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)

    # threshold ~1.0: interval prob always below it -> fires every frame
    e1 = LiveInferEngine(params, tok, cfg, kv_capacity=512)
    e1.load_video(feats)
    e1.input_video_stream(0.0)
    _, r1 = e1()
    assert r1 is not None

    # drop threshold to 0 at runtime: gate fires only if argmax != interval
    e2 = LiveInferEngine(params, tok, cfg, kv_capacity=512)
    e2.set_threshold(0.0)
    assert e2.cfg.frame_token_interval_threshold == 0.0
    e2.load_video(feats)
    e2.input_video_stream(0.0)
    q2, r2 = e2()  # may or may not fire; must not recompile or crash
    # same jitted program served both thresholds (traced arg, not constant)
    assert e2._ingest is not None


def test_capacity_guard_raises():
    cfg, tok, params = _setup()
    engine = LiveInferEngine(params, tok, cfg, kv_capacity=64)
    feats = np.random.RandomState(0).randn(
        8, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    engine.load_video(feats)
    engine.input_video_stream(3.5)
    with pytest.raises(RuntimeError, match="capacity"):
        for _ in range(16):
            engine()


def test_stream_window_compaction_matches_uncompacted():
    """Infinite-stream mode (VERDICT r1 item 6): an engine with a small ring
    + stream_window must produce transcripts EXACTLY equal to an engine with
    a huge ring and the same window — compaction shifts the retained window
    to the ring front with pos_base keeping absolute positions (RoPE)
    intact, and windowed attention sees identical content either way."""
    import numpy as np
    import jax
    from videollm_online_tpu.core.config import tiny_live_config
    from videollm_online_tpu.models import live
    from videollm_online_tpu.serve.engine import LiveInferEngine
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer

    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(frame_token_interval_threshold=0.725,
                          max_response_tokens=12)
    params = live.init_params(jax.random.PRNGKey(5), cfg)
    W = 64
    n_frames = 48  # 48*(4+10) tokens + responses >> the small ring

    feats = np.random.RandomState(3).randn(
        n_frames, cfg.frame_num_tokens,
        cfg.vision_hidden_size).astype(np.float32)

    def run(capacity):
        eng = LiveInferEngine(params, tok, cfg, kv_capacity=capacity,
                              stream_window=W)
        eng.load_video(feats)
        eng.input_query_stream("what is happening?", video_time=4.0)
        out = []
        for i in range(n_frames):
            eng.input_video_stream(i / eng.frame_fps)
            while True:
                q, r = eng()
                if r is None:
                    break
                out.append((q, r))
        return out, eng

    big_out, big_eng = run(8192)          # never compacts
    small_out, small_eng = run(640)       # must compact repeatedly
    assert int(np.asarray(big_eng.cache.pos_base)[0]) == 0
    assert int(np.asarray(small_eng.cache.pos_base)[0]) > 0, \
        "compaction never triggered — test is vacuous"
    assert small_eng._host_offset <= 640
    assert small_out == big_out
    assert len(small_out) > 0


def test_engine_stats_snapshot():
    """stats() reflects cache occupancy and queue depths from host state
    (no device readback needed)."""
    cfg, tok, params = _setup()
    engine = LiveInferEngine(params, tok, cfg, kv_capacity=512)
    st0 = engine.stats()
    assert st0["offset"] == 0 and st0["kv_capacity"] == 512
    feats = np.random.RandomState(0).randn(
        4, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    engine.load_video(feats)
    engine.input_query_stream("what now?", video_time=0.5)
    engine.input_video_stream(1.0)
    engine()
    st = engine.stats()
    assert st["offset"] > 0
    assert st["queued_queries"] == 0  # consumed by the tick
    assert st["video_time"] >= 0.5


def test_swap_params_no_recompile():
    """Hot adapter swap: identical-structure weights serve the next
    dispatch with ZERO new compilations, and transcripts equal a fresh
    engine built with the new weights; mismatched trees are rejected."""
    import jax
    from videollm_online_tpu.models import live as live_mod

    cfg, tok, params = _setup()
    params2 = live_mod.init_params(jax.random.PRNGKey(7), cfg)
    feats = np.random.RandomState(0).randn(
        4, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)

    def drive(engine):
        engine.load_video(feats)
        engine.input_query_stream("what now?", video_time=0.5)
        out = []
        for i in range(4):
            engine.input_video_stream(i / engine.frame_fps)
            while True:
                q, r = engine()
                if r is None:
                    break
                out.append((q, r))
        return out

    e = LiveInferEngine(params, tok, cfg, kv_capacity=512)
    drive(e)
    sizes = {n: getattr(e, n)._cache_size()
             for n in ("_ingest_stream", "_prefill", "_respond")}
    e.reset()
    e.swap_params(params2)
    swapped_out = drive(e)
    for n, s in sizes.items():
        assert getattr(e, n)._cache_size() == s, f"{n} recompiled"

    fresh = LiveInferEngine(params2, tok, cfg, kv_capacity=512)
    assert drive(fresh) == swapped_out

    import pytest as _pytest
    bad = dict(params2)
    bad.pop("connector")
    with _pytest.raises(ValueError, match="structure"):
        e.swap_params(bad)
