"""Batched token-streaming responses (MultiStreamEngine stream_tokens=S):
segmented continuation ticks must reproduce the unsegmented engine's
per-stream transcripts byte-for-byte, while surfacing partial text via
on_delta after every S decoded tokens (the reference surfaces nothing
until a response completes — modeling_live.py:173-182 — and its demo
waits out whole turns, demo/app.py:85-91)."""

import numpy as np
import pytest

import jax

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live
from videollm_online_tpu.serve.multistream import MultiStreamEngine
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer

from test_multistream import _drive


def _setup(threshold=0.725, seed=3, max_resp=16):
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(frame_token_interval_threshold=threshold,
                          max_response_tokens=max_resp)
    params = live.init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, tok, params


def _scenario(cfg, n_streams=3, n_frames=12, rng_seed=11):
    rng = np.random.RandomState(rng_seed)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(n_streams)]
    queries = {0: (1.2, "what now?"), 2: (0.75, "anything?")}
    schedule = [0.0, 1.0, 2.0, 3.5, 5.5]
    return feats, queries, schedule


class _DeltaLog:
    """Per-stream delta accumulator: reassembles each response's text from
    its on_delta segments (the user-visible streaming surface)."""

    def __init__(self, n):
        self.cur = [""] * n
        self.texts = [[] for _ in range(n)]
        self.segments = [[] for _ in range(n)]
        self._nseg = [0] * n

    def __call__(self, i, delta, done):
        self.cur[i] += delta
        self._nseg[i] += 1
        if done:
            self.texts[i].append(self.cur[i])
            self.segments[i].append(self._nseg[i])
            self.cur[i] = ""
            self._nseg[i] = 0


def _check_deltas(log, out, n):
    """Every response's on_delta reassembly equals its transcript text, in
    order; no segment left dangling."""
    for i in range(n):
        assert log.cur[i] == "", f"stream {i}: dangling open delta"
        want = [r.split("Assistant:", 1)[1] for _, r in out[i]]
        assert log.texts[i] == want, (
            f"stream {i}:\ndeltas={log.texts[i]}\ntranscript={want}")


@pytest.mark.parametrize("fused", [True, False])
def test_ms_stream_tokens_matches_unsegmented(fused):
    cfg, tok, params = _setup()
    N = 3
    feats, queries, schedule = _scenario(cfg, n_streams=N)

    ref = MultiStreamEngine(params, tok, cfg, num_streams=N,
                            kv_capacity=2048, chunk_frames=4, fused=fused)
    ref_out = _drive(ref, feats, queries, schedule, cfg.frame_fps)
    assert any(ref_out[i] for i in range(N)), "no responses; test vacuous"

    log = _DeltaLog(N)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=2048, chunk_frames=4, fused=fused,
                           stream_tokens=4, on_delta=log)
    got_out = _drive(ms, feats, queries, schedule, cfg.frame_fps)

    for i in range(N):
        assert got_out[i] == ref_out[i], (
            f"stream {i}:\nsegmented={got_out[i]}\nref={ref_out[i]}")
    _check_deltas(log, got_out, N)
    # at least one response actually spanned multiple segments (otherwise
    # the continuation machinery was never exercised)
    assert max((s for segs in log.segments for s in segs), default=0) >= 2
    assert ms.stats()["open_responses"] == 0


def test_ms_stream_tokens_composes_with_spec_decode():
    """stream_tokens + spec_decode at N streams: each segment dispatch runs
    the batched n-gram verify loop; transcripts stay byte-equal and the
    spec stats advance."""
    cfg, tok, params = _setup()
    N = 3
    feats, queries, schedule = _scenario(cfg, n_streams=N)

    ref = MultiStreamEngine(params, tok, cfg, num_streams=N,
                            kv_capacity=2048, chunk_frames=4)
    ref_out = _drive(ref, feats, queries, schedule, cfg.frame_fps)

    log = _DeltaLog(N)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=2048, chunk_frames=4,
                           spec_decode=True, stream_tokens=4, on_delta=log)
    assert ms.spec_draft == 3  # draft sized to the segment budget (S-1)
    got_out = _drive(ms, feats, queries, schedule, cfg.frame_fps)

    for i in range(N):
        assert got_out[i] == ref_out[i], (
            f"stream {i}:\nspec+seg={got_out[i]}\nref={ref_out[i]}")
    _check_deltas(log, got_out, N)
    steps, emitted = (int(x) for x in ms.spec_stats())
    assert steps > 0 and emitted > 0


def test_ms_stream_tokens_ttft_stats_and_pending():
    """The first segment records arrival->first-text ("ttft") separately
    from completion latency; open responses keep pending() true and drain
    via flush()."""
    cfg, tok, params = _setup(threshold=1.0, seed=5)  # fire every frame
    N = 2
    rng = np.random.RandomState(7)
    feats = [rng.randn(4, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]

    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=2048, chunk_frames=4,
                           stream_tokens=4, on_delta=_DeltaLog(N))
    for i in range(N):
        ms.input_frames(i, 0.0, feats[i])
    # step just enough that at least one response OPENS, then abandon the
    # normal drive: flush() must complete the continuations
    opened = False
    for _ in range(12):
        ms.step()
        if any(o is not None for o in ms._open):
            opened = True
            break
    assert opened, "no response spanned a segment boundary; vacuous"
    assert ms.pending()
    ms.flush()
    assert ms.stats()["open_responses"] == 0
    lat = ms.stats()["response_latency"]
    assert "ttft" in lat and lat["ttft"]["count"] >= 1
    assert "response" in lat
    # per-stream keys exist for at least one stream
    assert any(k.startswith("ttft_s") for k in lat)


def test_ms_stream_tokens_slot_overflow_fallback():
    """threshold=1.0 fires at every frame -> more fires per tick than
    R_TICK slots: the host fallback respond must route through the same
    open/continuation machinery (transcripts equal the unsegmented
    engine's)."""
    cfg, tok, params = _setup(threshold=1.0, seed=5)
    N = 2
    rng = np.random.RandomState(9)
    feats = [rng.randn(10, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    schedule = [0.0, 2.0, 4.5]

    ref = MultiStreamEngine(params, tok, cfg, num_streams=N,
                            kv_capacity=4096, chunk_frames=4)
    ref_out = _drive(ref, feats, {}, schedule, cfg.frame_fps)
    assert all(len(o) >= 8 for o in ref_out), "expected a fire per frame"

    log = _DeltaLog(N)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=4096, chunk_frames=4,
                           stream_tokens=4, on_delta=log)
    got_out = _drive(ms, feats, {}, schedule, cfg.frame_fps)
    for i in range(N):
        assert got_out[i] == ref_out[i], (
            f"stream {i}:\nsegmented={got_out[i]}\nref={ref_out[i]}")
    _check_deltas(log, got_out, N)


def test_ms_stream_tokens_close_stream_drains_open():
    """close_stream on a stream with an OPEN response finishes the
    continuation first: the returned transcript carries the completed
    entry, and the slot is immediately reusable."""
    cfg, tok, params = _setup(threshold=1.0, seed=5)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=2,
                           kv_capacity=2048, chunk_frames=4,
                           stream_tokens=4)
    feats = np.random.RandomState(3).randn(
        4, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    ms.input_frames(0, 0.0, feats)
    for _ in range(12):
        ms.step()
        if ms._open[0] is not None:
            break
    assert ms._open[0] is not None, "no open response; vacuous"
    n_before = len(ms.transcripts[0])
    out = ms.close_stream(0)
    assert len(out) > n_before, "open response missing from transcript"
    assert ms._open[0] is None
    assert int(ms._host_offsets[0]) == 0


def test_ms_stream_tokens_paged_and_kv_quant():
    """Token streaming composes with the paged pool + int8 KV (the
    BASELINE batched-serving configuration): transcripts equal the
    unsegmented paged engine's."""
    cfg, tok, params = _setup()
    N = 2
    feats, queries, schedule = _scenario(cfg, n_streams=N, rng_seed=21)
    queries = {1: (1.2, "status?")}

    common = dict(num_streams=N, kv_capacity=2048, chunk_frames=4,
                  paged=True, page_size=256, kv_quant="int8")
    ref = MultiStreamEngine(params, tok, cfg, **common)
    ref_out = _drive(ref, feats, queries, schedule, cfg.frame_fps)

    log = _DeltaLog(N)
    ms = MultiStreamEngine(params, tok, cfg, stream_tokens=4, on_delta=log,
                           **common)
    got_out = _drive(ms, feats, queries, schedule, cfg.frame_fps)
    for i in range(N):
        assert got_out[i] == ref_out[i], (
            f"stream {i}:\nsegmented={got_out[i]}\nref={ref_out[i]}")
    _check_deltas(log, got_out, N)


def test_ms_stream_tokens_rejects_pipelined():
    cfg, tok, params = _setup()
    with pytest.raises(AssertionError):
        MultiStreamEngine(params, tok, cfg, num_streams=2,
                          kv_capacity=2048, pipelined=True, stream_tokens=4)
    with pytest.raises(AssertionError):
        MultiStreamEngine(params, tok, cfg, num_streams=2,
                          kv_capacity=2048, stream_tokens=5)  # 16 % 5 != 0
