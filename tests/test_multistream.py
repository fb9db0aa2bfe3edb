"""Batched multi-stream serving must reproduce, per stream, exactly what N
independent single-stream engines produce (which are themselves
oracle-validated in test_serve_engine.py)."""

import numpy as np
import pytest

import jax

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live
from videollm_online_tpu.serve.engine import LiveInferEngine
from videollm_online_tpu.serve.multistream import MultiStreamEngine
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer


def _setup(threshold=0.725, seed=0):
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(frame_token_interval_threshold=threshold,
                          max_response_tokens=16)
    params = live.init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, tok, params


def test_multistream_matches_single_stream():
    cfg, tok, params = _setup()
    N = 3
    n_frames = 4
    rng = np.random.RandomState(0)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    queries = {1: (0.9, "what now?")}

    # reference: independent single-stream engines
    singles = []
    for i in range(N):
        e = LiveInferEngine(params, tok, cfg, kv_capacity=512)
        e.load_video(feats[i])
        singles.append(e)
    single_out = [[] for _ in range(N)]
    for t in [0.0, 0.5, 1.0, 1.5]:
        for i in range(N):
            if i in queries and queries[i][0] <= t and queries[i] is not None:
                singles[i].input_query_stream(queries[i][1],
                                              video_time=queries[i][0])
                queries[i + 100] = queries.pop(i)  # feed once
            singles[i].input_video_stream(t)
            while True:
                q, r = singles[i]()
                if r is None:
                    break
                single_out[i].append((q, r))

    # batched engine
    queries = {1: (0.9, "what now?")}
    ms = MultiStreamEngine(params, tok, cfg, num_streams=N, kv_capacity=512)
    multi_out = [[] for _ in range(N)]
    fed = [0] * N
    for t in [0.0, 0.5, 1.0, 1.5]:
        for i in range(N):
            if i in queries and queries[i][0] <= t:
                ms.input_query(i, queries[i][1], video_time=queries[i][0])
                queries[i + 100] = queries.pop(i)
            fidx = min(int(t * cfg.frame_fps), n_frames - 1)
            if fidx >= fed[i]:
                ms.input_frames(i, fed[i] / cfg.frame_fps,
                                feats[i][fed[i]:fidx + 1])
                fed[i] = fidx + 1
        # drain: tick until nothing new happens
        for _ in range(16):
            results = ms.step()
            got = False
            for i, res in enumerate(results):
                if res is not None:
                    multi_out[i].append(res)
                    got = True
            if not got and not any(ms.frame_queues[j] for j in range(N)):
                break

    for i in range(N):
        assert multi_out[i] == single_out[i], (
            f"stream {i}:\nmulti={multi_out[i]}\nsingle={single_out[i]}")


def test_multistream_isolation():
    """A stream with no input stays silent and its cache offset untouched."""
    cfg, tok, params = _setup(seed=1)
    # 256 was actually over the edge: prefill slab + 2 frame steps + a
    # 128-bucket response + 16 decode tokens > 256, silently clamped before
    # the capacity guard existed
    ms = MultiStreamEngine(params, tok, cfg, num_streams=2, kv_capacity=512)
    feats = np.random.RandomState(0).randn(
        2, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    ms.input_frames(0, 0.0, feats)
    for _ in range(6):
        ms.step()
    offsets = np.asarray(ms.cache.offset)
    assert offsets[0] > 0
    assert offsets[1] == 0
    assert ms.transcripts[1] == []


def test_multistream_chunked_catchup_matches_single_stream():
    """Feed ALL frames at once (catch-up burst > 1) so the batched chunked
    ingest path runs, and require per-stream transcript equality with
    single-stream engines given the same late burst."""
    cfg, tok, params = _setup(threshold=0.725, seed=2)
    N, n_frames = 2, 10
    rng = np.random.RandomState(7)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]

    single_out = [[] for _ in range(N)]
    for i in range(N):
        e = LiveInferEngine(params, tok, cfg, kv_capacity=1024)
        e.load_video(feats[i])
        e.input_query_stream("what now?", video_time=1.2)
        e.input_video_stream((n_frames - 1) / cfg.frame_fps)  # all at once
        while True:
            q, r = e()
            if r is None:
                break
            single_out[i].append((q, r))

    ms = MultiStreamEngine(params, tok, cfg, num_streams=N, kv_capacity=1024,
                           chunk_frames=4)
    multi_out = [[] for _ in range(N)]
    for i in range(N):
        ms.input_query(i, "what now?", video_time=1.2)
        ms.input_frames(i, 0.0, feats[i])
    for _ in range(64):
        results = ms.step()
        for i, res in enumerate(results):
            if res is not None:
                multi_out[i].append(res)
        if not ms.pending() and all(r is None for r in results):
            break

    for i in range(N):
        assert multi_out[i] == single_out[i], (
            f"stream {i}:\nmulti={multi_out[i]}\nsingle={single_out[i]}")


def test_multistream_stream_window_compaction():
    """Batched infinite-stream mode: small-ring engines with stream_window
    must produce per-stream transcripts exactly equal to a huge-ring engine
    with the same window, with compaction actually triggering."""
    import dataclasses
    cfg, tok, params = _setup(threshold=0.725, seed=3)
    cfg = cfg.replace(max_response_tokens=12,
                      gate_logit_bias=0.0)
    W = 64
    N, n_frames = 2, 40
    rng = np.random.RandomState(11)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]

    def run(capacity):
        ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                               kv_capacity=capacity, chunk_frames=4,
                               stream_window=W)
        out = [[] for _ in range(N)]
        for i in range(N):
            ms.input_frames(i, 0.0, feats[i])
            ms.input_query(i, "what now?", video_time=3.0)
        for _ in range(256):
            results = ms.step()
            for i, r in enumerate(results):
                if r is not None:
                    out[i].append(r)
            if not ms.pending() and all(r is None for r in results):
                break
        return out, ms

    big_out, big_ms = run(8192)
    small_out, small_ms = run(448)
    assert int(np.asarray(big_ms.cache.pos_base).max()) == 0
    assert int(np.asarray(small_ms.cache.pos_base).max()) > 0, \
        "compaction never triggered"
    for i in range(N):
        assert small_out[i] == big_out[i], f"stream {i}"
