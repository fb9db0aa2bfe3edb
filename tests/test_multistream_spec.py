"""Batched n-gram speculative decoding (MultiStreamEngine spec_decode)
must produce byte-identical per-stream transcripts to the greedy engine
across every dispatch path — speculation is verified per stream, so output
never depends on draft quality."""

import numpy as np

import jax

from videollm_online_tpu.serve.multistream import MultiStreamEngine

from test_multistream import _drive, _setup


def _mk(params, tok, cfg, N, **kw):
    return MultiStreamEngine(params, tok, cfg, num_streams=N,
                             kv_capacity=4096, chunk_frames=4, **kw)


def test_multistream_spec_equals_greedy_all_paths():
    cfg, tok, params = _setup(threshold=0.725, seed=7)
    N, n_frames = 3, 12
    rng = np.random.RandomState(23)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    queries = {0: (1.2, "what now?"), 2: (0.75, "anything?")}
    schedule = [0.0, 1.0, 2.0, 3.5, 5.5]

    ref = _mk(params, tok, cfg, N, fused=True)
    ref_out = _drive(ref, feats, queries, schedule, cfg.frame_fps)
    assert sum(len(o) for o in ref_out) >= 2  # responses actually happen

    for kw in (dict(fused=True), dict(fused=False),
               dict(fused=True, pipelined=True, pipeline_depth=2)):
        ms = _mk(params, tok, cfg, N, spec_decode=True, **kw)
        got = _drive(ms, feats, queries, schedule, cfg.frame_fps)
        for i in range(N):
            assert got[i] == ref_out[i], (
                f"stream {i} ({kw}):\nspec={got[i]}\ngreedy={ref_out[i]}")
        steps, emitted = (int(x) for x in ms.spec_stats())
        assert steps > 0 and emitted >= steps  # >=1 token per verify step


def test_multistream_spec_slot_overflow_fallback():
    """threshold=1.0 fires every frame -> stop_fire host fallback (the
    standalone respond dispatch) with spec_decode on; transcripts must
    still equal the greedy unfused path's."""
    cfg, tok, params = _setup(threshold=1.0, seed=5)
    N, n_frames = 2, 6
    rng = np.random.RandomState(17)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    schedule = [0.0, 2.5]

    ref = _mk(params, tok, cfg, N, fused=False)
    ref_out = _drive(ref, feats, {}, schedule, cfg.frame_fps)

    ms = _mk(params, tok, cfg, N, fused=True, spec_decode=True)
    got = _drive(ms, feats, {}, schedule, cfg.frame_fps)
    for i in range(N):
        assert got[i] == ref_out[i], (
            f"stream {i}:\nspec={got[i]}\ngreedy={ref_out[i]}")
