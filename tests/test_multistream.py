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


def _drive(ms, feats, queries, schedule, fps):
    """Shared randomized drive: feed frames/queries per the schedule, tick
    until drained, return per-stream transcript lists."""
    N = len(feats)
    fed = [0] * N
    out = [[] for _ in range(N)]
    qdone = set()
    for t in schedule:
        for i in range(N):
            if i in queries and queries[i][0] <= t and i not in qdone:
                ms.input_query(i, queries[i][1], video_time=queries[i][0])
                qdone.add(i)
            fidx = min(int(t * fps), feats[i].shape[0] - 1)
            if fidx >= fed[i]:
                ms.input_frames(i, fed[i] / fps, feats[i][fed[i]:fidx + 1])
                fed[i] = fidx + 1
        for _ in range(32):
            results = ms.step()
            got = any(r is not None for r in results)
            for i, res in enumerate(results):
                if res is not None:
                    out[i].append(res)
            if not got and not any(ms.frame_queues[j] for j in range(N)):
                break
    if hasattr(ms, "flush"):
        for i, entries in enumerate(ms.flush()):
            out[i].extend(entries)
    # surface anything still queued
    for _ in range(32):
        if not ms.pending():
            break
        results = ms.step()
        for i, res in enumerate(results):
            if res is not None:
                out[i].append(res)
    return out


def test_multistream_fused_equals_unfused():
    """The fused single-dispatch tick must produce EXACTLY the 2-dispatch
    path's per-stream transcripts over a randomized multi-burst drive with
    queries (including a mid-burst query boundary)."""
    cfg, tok, params = _setup(threshold=0.725, seed=3)
    N, n_frames = 3, 12
    rng = np.random.RandomState(11)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    queries = {0: (1.2, "what now?"), 2: (0.75, "anything?")}
    schedule = [0.0, 1.0, 2.0, 3.5, 5.5]

    ref = MultiStreamEngine(params, tok, cfg, num_streams=N,
                            kv_capacity=2048, chunk_frames=4, fused=False)
    ref_out = _drive(ref, feats, queries, schedule, cfg.frame_fps)

    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=2048, chunk_frames=4, fused=True)
    got_out = _drive(ms, feats, queries, schedule, cfg.frame_fps)

    for i in range(N):
        assert got_out[i] == ref_out[i], (
            f"stream {i}:\nfused={got_out[i]}\nunfused={ref_out[i]}")


def test_multistream_pipelined_equals_blocking():
    """Pipelined dispatch chaining (device-resident prepend, speculative
    consumption) must not change any stream's transcript."""
    cfg, tok, params = _setup(threshold=0.725, seed=4)
    N, n_frames = 2, 16
    rng = np.random.RandomState(13)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    queries = {1: (1.6, "status?")}
    schedule = [0.0, 1.5, 3.0, 5.0, 7.5]

    ref = MultiStreamEngine(params, tok, cfg, num_streams=N,
                            kv_capacity=2048, chunk_frames=4, fused=True)
    ref_out = _drive(ref, feats, queries, schedule, cfg.frame_fps)

    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=2048, chunk_frames=4, fused=True,
                           pipelined=True, pipeline_depth=2)
    got_out = _drive(ms, feats, queries, schedule, cfg.frame_fps)

    for i in range(N):
        assert got_out[i] == ref_out[i], (
            f"stream {i}:\npipelined={got_out[i]}\nblocking={ref_out[i]}")


def test_multistream_fused_slot_overflow():
    """threshold=1.0 fires the gate at EVERY frame: more fires per chunk
    than R_TICK slots, driving the stop_fire host-fallback path (and, in
    pipelined mode, rollback). Transcripts must still equal the unfused
    path's."""
    cfg, tok, params = _setup(threshold=1.0, seed=5)
    N, n_frames = 2, 6
    rng = np.random.RandomState(17)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    schedule = [0.0, 2.5]

    ref = MultiStreamEngine(params, tok, cfg, num_streams=N,
                            kv_capacity=4096, chunk_frames=4, fused=False)
    ref_out = _drive(ref, feats, {}, schedule, cfg.frame_fps)
    assert sum(len(o) for o in ref_out) >= 2 * n_frames - 2  # fires happen

    for pipe in (False, True):
        ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                               kv_capacity=4096, chunk_frames=4,
                               fused=True, pipelined=pipe)
        got_out = _drive(ms, feats, {}, schedule, cfg.frame_fps)
        for i in range(N):
            assert got_out[i] == ref_out[i], (
                f"pipe={pipe} stream {i}:\nfused={got_out[i]}\n"
                f"unfused={ref_out[i]}")


def test_multistream_query_at_fired_frame_slot_exhausted():
    """A query at EXACTLY a fired frame's timestamp outranks the gate fire
    — the fire is DROPPED and only the query answers (single-stream
    _stream_until_trigger; reference demo/inference.py:72-74 precedes
    :76-81). This must hold in the fused tick EVEN when earlier fires in
    the same burst exhausted the R_TICK response slots: the slot-starved
    query turn defers to the next tick (round-5 fix: it previously routed
    through the gen fallback, fabricating a gen response the semantics
    drop)."""
    from videollm_online_tpu.serve.engine import LiveInferEngine

    cfg, tok, params = _setup(threshold=1.0, seed=5)  # fire EVERY frame
    n_frames = 4
    feats = np.random.RandomState(23).randn(
        n_frames, cfg.frame_num_tokens,
        cfg.vision_hidden_size).astype(np.float32)
    qt = 2 / cfg.frame_fps  # exactly the 3rd frame's timestamp

    eng = LiveInferEngine(params, tok, cfg, kv_capacity=4096)
    eng.load_video(feats)
    eng.input_query_stream("what now?", video_time=qt)
    oracle = []
    for i in range(n_frames):
        eng.input_video_stream(i / cfg.frame_fps)
        while True:
            q, r = eng()
            if r is None:
                break
            oracle.append((q, r))
    # the fire at qt was dropped: exactly one entry at qt, the query's
    at_qt = [e for e in oracle if f"= {qt}s" in e[1]]
    assert len(at_qt) == 1 and at_qt[0][0] is not None, oracle

    queries = {0: (qt, "what now?")}
    # one burst covering all frames -> fires at frames 0,1 fill both
    # R_TICK slots before the query turn at frame 2
    for fused in (True, False):
        ms = MultiStreamEngine(params, tok, cfg, num_streams=1,
                               kv_capacity=4096, chunk_frames=4,
                               fused=fused)
        out = _drive(ms, [feats], queries, [0.0, 2.5], cfg.frame_fps)
        assert out[0] == oracle, (
            f"fused={fused}:\nmulti={out[0]}\noracle={oracle}")


def test_close_stream_reuses_slot():
    """close_stream (continuous batching): ending a dialogue returns its
    transcript, frees its pages (paged mode), and the slot serves a NEW
    dialogue whose transcript exactly equals the same dialogue driven in
    a fresh engine — while the sibling stream's state is untouched."""
    cfg, tok, params = _setup(threshold=0.725, seed=9)
    rng = np.random.RandomState(41)

    def mk(n):
        return rng.randn(n, cfg.frame_num_tokens,
                         cfg.vision_hidden_size).astype(np.float32)

    A, B, C = mk(8), mk(8), mk(8)
    none = np.zeros((0, cfg.frame_num_tokens, cfg.vision_hidden_size),
                    np.float32)
    schedule = [0.0, 1.5, 3.0, 5.0]
    for kw in (dict(paged=False),
               dict(paged=True, page_size=64),
               dict(paged=True, page_size=64, pipelined=True,
                    pipeline_depth=2, kv_quant="int8")):
        ms = MultiStreamEngine(params, tok, cfg, num_streams=2,
                               kv_capacity=1024, chunk_frames=4, **kw)
        # phase 1: dialogue A on slot 0, dialogue B on slot 1
        out1 = _drive(ms, [A, B], {0: (1.2, "what now?")}, schedule,
                      cfg.frame_fps)
        assert len(out1[0]) >= 1
        tA = ms.close_stream(0)
        assert tA == out1[0], f"returned transcript mismatch ({kw})"
        assert ms.transcripts[0] == [] and not ms.pending()
        if kw.get("paged"):
            assert ms._pages_alloc[0] == 0, "pages not freed at close"
            assert ms._pages_alloc[1] > 0, "sibling pages must survive"
        assert int(np.asarray(ms.cache.offset)[0]) == 0
        assert int(np.asarray(ms.cache.offset)[1]) > 0

        # phase 2: NEW dialogue C in the reused slot 0; slot 1 idle
        out2 = _drive(ms, [C, none], {0: (0.9, "anything?")}, schedule,
                      cfg.frame_fps)
        assert out2[1] == []

        # oracle: C in a fresh engine's slot 0 produces the same transcript
        fresh = MultiStreamEngine(params, tok, cfg, num_streams=2,
                                  kv_capacity=1024, chunk_frames=4, **kw)
        ref = _drive(fresh, [C, none], {0: (0.9, "anything?")}, schedule,
                     cfg.frame_fps)
        assert out2[0] == ref[0], (
            f"reused-slot transcript diverged ({kw}):\n"
            f"reused={out2[0]}\nfresh={ref[0]}")
        assert len(out2[0]) >= 1


def test_fork_stream_branches_dialogue():
    """fork_stream: slot dst continues src's exact context via shared
    (refcounted) full pages + a copied tail page. Oracle: each branch's
    transcript equals an unforked engine driven with prefix+that
    continuation. Closing src afterwards must not disturb dst (shared
    pages survive via refcounts)."""
    cfg, tok, params = _setup(threshold=0.725, seed=9)
    rng = np.random.RandomState(43)

    def mk(n):
        return rng.randn(n, cfg.frame_num_tokens,
                         cfg.vision_hidden_size).astype(np.float32)

    prefix, contA, contB, tail = mk(8), mk(6), mk(6), mk(4)

    def drive_until_idle(ms, n=96):
        for _ in range(n):
            ms.step()
            if not ms.pending():
                break
        assert not ms.pending()

    for kw in (dict(paged=True, page_size=64),
               dict(paged=True, page_size=64, kv_quant="int8",
                    pipelined=True, pipeline_depth=2)):
        # prefix_cache off: this test's refcount arithmetic assumes fork
        # refs only (the template's own aliases would shift the counts);
        # prefix-cache accounting is covered in test_prefix_cache_*
        eng = dict(num_streams=3, kv_capacity=2048, chunk_frames=4,
                   prefix_cache=False, **kw)
        ms = MultiStreamEngine(params, tok, cfg, **eng)
        ms.input_frames(0, 0.0, prefix)
        ms.input_query(0, "what now?", video_time=1.2)
        drive_until_idle(ms)
        ms.fork_stream(0, 1)
        # shared full pages are counted twice; tail copy is private
        shared = int(ms._host_offsets[0]) // ms.page_size
        assert shared >= 1
        assert np.sum(ms._page_refs == 2) == shared
        assert ms._host_offsets[1] == ms._host_offsets[0]
        assert ms.transcripts[1] == ms.transcripts[0]
        ms.input_frames(0, 4.0, contA)
        ms.input_query(0, "continue a?", video_time=4.5)
        ms.input_frames(1, 4.0, contB)
        ms.input_query(1, "continue b?", video_time=4.5)
        drive_until_idle(ms)

        for cont, q, slot in ((contA, "continue a?", 0),
                              (contB, "continue b?", 1)):
            ref = MultiStreamEngine(params, tok, cfg, **eng)
            ref.input_frames(0, 0.0, prefix)
            ref.input_query(0, "what now?", video_time=1.2)
            drive_until_idle(ref)
            ref.input_frames(0, 4.0, cont)
            ref.input_query(0, q, video_time=4.5)
            drive_until_idle(ref)
            assert ms.transcripts[slot] == ref.transcripts[0], (
                f"branch {slot} ({kw}):\nforked={ms.transcripts[slot]}\n"
                f"fresh={ref.transcripts[0]}")

        # close src: shared pages must survive for dst; dst keeps serving
        before = ms.transcripts[1][:]
        ms.close_stream(0)
        assert np.sum(ms._page_refs == 2) == 0  # dst now sole owner
        assert np.all(ms._page_refs >= 0)
        ms.input_frames(1, 8.0, tail)
        drive_until_idle(ms)
        assert ms.transcripts[1][:len(before)] == before
        # full accounting: free list + live refs cover the whole pool
        live = int(np.sum(ms._page_refs > 0))
        assert len(ms._free_pages) == ms.pool_pages - 1 - live


def test_multistream_raw_pixel_input_matches_features():
    """uint8 frames into MultiStreamEngine (vision_params set) must produce
    exactly the transcripts of the same engine fed the equivalent
    pre-extracted features (BASELINE config #5 at N streams)."""
    from videollm_online_tpu.models import siglip

    cfg, tok, params = _setup(threshold=0.725, seed=9)
    vparams = siglip.init_params(jax.random.PRNGKey(1), cfg.vision)
    rng = np.random.RandomState(47)
    N = 2
    videos = [rng.randint(0, 255, (6, 3, cfg.vision.image_size,
                                   cfg.vision.image_size), dtype=np.uint8)
              for _ in range(N)]
    feats = [np.asarray(siglip.frame_features(
        vparams, siglip.preprocess(jax.numpy.asarray(v), cfg.vision),
        cfg.vision, cfg)) for v in videos]

    def drive(inputs, vp):
        ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                               kv_capacity=1024, chunk_frames=4,
                               vision_params=vp)
        for i in range(N):
            ms.input_frames(i, 0.0, inputs[i])
        ms.input_query(0, "what now?", video_time=1.2)
        for _ in range(48):
            ms.step()
            if not ms.pending():
                break
        return ms.transcripts

    got = drive(videos, vparams)
    ref = drive(feats, None)
    for i in range(N):
        assert got[i] == ref[i], (
            f"stream {i}:\npixels={got[i]}\nfeatures={ref[i]}")
    assert sum(len(t) for t in got) >= 1


def test_max_lag_backpressure_and_stats():
    """max_lag_frames sheds the oldest queued frames before each tick
    (realtime live semantics — the reference's queue grows unboundedly);
    stats() reports occupancy, drops, pool accounting, and tick latency
    without any device readback."""
    cfg, tok, params = _setup(threshold=0.725, seed=9)
    rng = np.random.RandomState(51)
    feats = rng.randn(32, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=2,
                           kv_capacity=1024, chunk_frames=4,
                           max_lag_frames=8)
    ms.input_frames(0, 0.0, feats)
    ms.step()  # shed happens before the tick consumes anything
    assert ms._dropped[0] == 24
    assert len(ms.frame_queues[0]) <= 8
    for _ in range(32):
        ms.step()
        if not ms.pending():
            break
    st = ms.stats()
    assert st["streams"][0]["dropped_frames"] == 24
    assert st["streams"][1]["dropped_frames"] == 0
    assert st["streams"][0]["offset"] > 0
    assert st["streams"][0]["queued_frames"] == 0
    assert st["ticks"]["count"] >= 1 and st["ticks"]["p50_ms"] > 0
    # paged accounting consistency (auto default is paged at this capacity)
    assert ms.paged
    # free + stream-mapped + prefix-template-owned pages cover the pool
    # (no stream shares pages here: no fork, no re-admission)
    assert st["pool"]["pages_free"] + sum(st["pool"]["pages_per_stream"]) \
        + st["pool"]["prefix_tail_pages"] == st["pool"]["pages_total"]
    # engine still serves after shedding: frames 24..31 were ingested
    assert int(ms._host_offsets[0]) >= 8 * cfg.frame_num_tokens


def test_response_latency_stats():
    """stats()['response_latency'] (VERDICT r3 #6): every surfaced
    response records one arrival->surface sample — pooled under
    'response' and per stream under 'response_s<i>' — and close_stream
    drops the closed dialogue's pending arrival keys without breaking
    later recording."""
    cfg, tok, params = _setup(threshold=0.725, seed=3)
    rng = np.random.RandomState(7)
    feats = rng.randn(16, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=2,
                           kv_capacity=2048, chunk_frames=4)
    for i in range(2):
        ms.input_frames(i, 0.0, feats)
        ms.input_query(i, "what now?", 2.0)
        ms.input_query(i, "and then?", 6.0)
    for _ in range(64):
        ms.step()
        if not ms.pending():
            break
    ms.flush()
    total = sum(len(t) for t in ms.transcripts)
    assert total >= 4  # both queries per stream answered at minimum
    lat = ms.stats()["response_latency"]
    assert lat["response"]["count"] == total
    assert lat["response"]["p50_ms"] > 0
    per_stream = [k for k in lat if k.startswith("response_s")]
    assert set(per_stream) == {"response_s0", "response_s1"}
    assert sum(lat[k]["count"] for k in per_stream) == total

    # close + re-admit: arrival map cleared, recording still works
    before = lat["response"]["count"]
    ms.close_stream(0)
    assert not ms._arrival[0]
    ms.input_frames(0, 0.0, feats[:8])
    ms.input_query(0, "again?", 1.0)
    for _ in range(64):
        ms.step()
        if not ms.pending():
            break
    lat2 = ms.stats()["response_latency"]
    assert lat2["response"]["count"] > before


def test_fork_pool_exhaustion_leaves_allocator_clean():
    """When no free page exists for the tail copy, fork_stream must raise
    BEFORE touching refcounts/tables — a partial fork would leak the
    aliased pages' +1 refs forever."""
    cfg, tok, params = _setup(threshold=1.0, seed=9)  # gate never fires
    rng = np.random.RandomState(53)
    feats = rng.randn(8, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=2,
                           kv_capacity=1024, chunk_frames=4, paged=True,
                           page_size=64)
    ms.input_frames(0, 0.0, feats)
    for _ in range(16):
        ms.step()
        if not ms.pending():
            break
    assert int(ms._host_offsets[0]) % ms.page_size > 0  # tail copy needed
    ms._free_pages.clear()  # simulate a fully-loaded pool at fork time
    refs_before = ms._page_refs.copy()
    table_before = ms._table_host.copy()
    import pytest as _pytest
    with _pytest.raises(RuntimeError, match="exhausted"):
        ms.fork_stream(0, 1)
    assert np.array_equal(ms._page_refs, refs_before)
    assert np.array_equal(ms._table_host, table_before)
    assert ms._pages_alloc[1] == 0


def test_fork_then_window_compaction_refcounts():
    """fork_stream composed with stream_window page-granular compaction:
    after forking, each branch compacts independently — freed SHARED
    pages only return to the pool when BOTH branches drop them, and both
    branches' transcripts equal unforked oracles driven with the same
    prefix + continuation."""
    cfg, tok, params = _setup(threshold=1.0, seed=9)  # gate-forced output
    rng = np.random.RandomState(57)

    def mk(n):
        return rng.randn(n, cfg.frame_num_tokens,
                         cfg.vision_hidden_size).astype(np.float32)

    prefix, contA, contB = mk(10), mk(10), mk(10)
    W = 128
    eng = dict(num_streams=3, kv_capacity=1024, chunk_frames=4, paged=True,
               page_size=64, stream_window=W)

    def drive_until_idle(ms, n=128):
        for _ in range(n):
            ms.step()
            if not ms.pending():
                break
        assert not ms.pending()

    ms = MultiStreamEngine(params, tok, cfg, **eng)
    ms.input_frames(0, 0.0, prefix)
    drive_until_idle(ms)
    ms.fork_stream(0, 1)
    shared = int(np.sum(ms._page_refs == 2))
    assert shared >= 1
    ms.input_frames(0, 6.0, contA)
    ms.input_frames(1, 6.0, contB)
    drive_until_idle(ms)
    # both branches ran far past the window: compaction freed old pages,
    # including previously-shared ones (each branch dropped its ref)
    assert ms._pos_base_host[0] > 0 and ms._pos_base_host[1] > 0
    live = int(np.sum(ms._page_refs > 0))
    assert len(ms._free_pages) == ms.pool_pages - 1 - live
    assert np.all(ms._page_refs >= 0)

    for cont, slot in ((contA, 0), (contB, 1)):
        ref = MultiStreamEngine(params, tok, cfg, **eng)
        ref.input_frames(0, 0.0, prefix)
        drive_until_idle(ref)
        ref.input_frames(0, 6.0, cont)
        drive_until_idle(ref)
        assert ms.transcripts[slot] == ref.transcripts[0], f"branch {slot}"


def test_prefix_cache_admission_matches_prefill():
    """Automatic prefix caching (paged mode): re-admitting a NEW dialogue
    into a closed slot aliases the cached system-prompt KV pages (one
    tail-page copy) instead of re-running the prefill forward. The whole
    churn drive must produce byte-identical transcripts with the cache on
    and off, hits must be counted, and the page accounting must stay
    exact — including when the re-admitted dialogue is then forked (the
    template's aliases compose with fork's refcounts)."""
    cfg, tok, params = _setup(threshold=0.725, seed=9)
    rng = np.random.RandomState(61)

    def mk(n):
        return rng.randn(n, cfg.frame_num_tokens,
                         cfg.vision_hidden_size).astype(np.float32)

    A, B, C = mk(8), mk(8), mk(8)
    none = np.zeros((0, cfg.frame_num_tokens, cfg.vision_hidden_size),
                    np.float32)
    schedule = [0.0, 1.5, 3.0, 5.0]
    for kw in (dict(),
               dict(pipelined=True, pipeline_depth=2, kv_quant="int8")):
        outs = {}
        for pc in (True, False):
            ms = MultiStreamEngine(params, tok, cfg, num_streams=3,
                                   kv_capacity=1024, chunk_frames=4,
                                   paged=True, page_size=64,
                                   prefix_cache=pc, **kw)
            out1 = _drive(ms, [A, B, none], {0: (1.2, "what now?")},
                          schedule, cfg.frame_fps)
            t0 = ms.close_stream(0)
            out2 = _drive(ms, [C, none, none], {0: (0.9, "anything?")},
                          schedule, cfg.frame_fps)
            outs[pc] = (out1, t0, out2)
            if pc:
                assert ms._prefix_hits >= 1, "re-admission must hit"
                assert len(ms._prefix_entries) == 1
                # fork composes: slot 0's table mixes template-aliased
                # prefix pages with private ones; refcounts stay exact
                ms.fork_stream(0, 2)
                ms.close_stream(0)
                ms.close_stream(2)
            else:
                assert ms._prefix_hits == 0
                assert not ms._prefix_entries
            # full accounting after everything: free list + live refs
            # (incl. the template's) cover the whole pool
            ms.close_stream(1)
            live = int(np.sum(ms._page_refs > 0))
            assert len(ms._free_pages) == ms.pool_pages - 1 - live
            assert np.all(ms._page_refs >= 0)
        assert outs[True] == outs[False], (
            f"prefix-cache transcripts diverged ({kw}):\n"
            f"on={outs[True]}\noff={outs[False]}")


def test_prefix_cache_swap_params_invalidates():
    """swap_params must drop cached prefix KV (it was computed under the
    old weights): after a hot swap, a re-admitted dialogue's transcript
    must equal a FRESH engine built with the new weights."""
    cfg, tok, params = _setup(threshold=0.725, seed=9)
    params2 = live.init_params(jax.random.PRNGKey(123), cfg)
    rng = np.random.RandomState(67)

    def mk(n):
        return rng.randn(n, cfg.frame_num_tokens,
                         cfg.vision_hidden_size).astype(np.float32)

    A, C = mk(8), mk(8)
    none = np.zeros((0, cfg.frame_num_tokens, cfg.vision_hidden_size),
                    np.float32)
    schedule = [0.0, 1.5, 3.0, 5.0]
    eng = dict(num_streams=2, kv_capacity=1024, chunk_frames=4,
               paged=True, page_size=64)
    ms = MultiStreamEngine(params, tok, cfg, **eng)
    _drive(ms, [A, none], {}, schedule, cfg.frame_fps)
    assert len(ms._prefix_entries) == 1
    ms.close_stream(0)
    ms.swap_params(params2)
    assert not ms._prefix_entries, "stale prefix KV survived the swap"
    out = _drive(ms, [C, none], {0: (0.9, "anything?")}, schedule,
                 cfg.frame_fps)
    fresh = MultiStreamEngine(params2, tok, cfg, **eng)
    ref = _drive(fresh, [C, none], {0: (0.9, "anything?")}, schedule,
                 cfg.frame_fps)
    assert out[0] == ref[0]
    # page accounting stayed exact through evict + re-cache
    live_refs = int(np.sum(ms._page_refs > 0))
    assert len(ms._free_pages) == ms.pool_pages - 1 - live_refs


def test_prefix_cache_evicts_under_pool_pressure():
    """The prefix cache must never cause an allocation failure a cacheless
    engine would not hit: when _paged_admit cannot find free pages, it
    evicts the template (freeing its privately-owned tail page) and
    retries. Only template-owned pages can actually free — stream tables
    never reference them — so in-flight dispatches are unaffected."""
    cfg, tok, params = _setup(threshold=1.0, seed=9)
    rng = np.random.RandomState(71)
    feats = rng.randn(4, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=1,
                           kv_capacity=2048, chunk_frames=4, paged=True,
                           page_size=64)
    ms.input_frames(0, 0.0, feats)
    for _ in range(16):
        ms.step()
        if not ms.pending():
            break
    assert len(ms._prefix_entries) == 1
    tail = ms._prefix_entries[tuple(ms._start_ids)]["tail_page"]
    assert tail is not None and ms._page_refs[tail] == 1
    # drain the free list so the next page allocation must evict
    drained = list(ms._free_pages)
    ms._free_pages.clear()
    budget = (ms._pages_alloc[0] * ms.page_size
              - int(ms._host_offsets[0]) + 1)  # forces one more page
    assert ms._paged_admit([0], budget), "eviction should satisfy this"
    assert not ms._prefix_entries
    assert ms._table_host[0, ms._pages_alloc[0] - 1] == tail, (
        "the freed template page should serve the new allocation")
    ms._free_pages.extend(drained)
    # the engine keeps serving after eviction
    ms.input_frames(0, 2.0, feats)
    for _ in range(16):
        ms.step()
        if not ms.pending():
            break
    assert not ms.pending()
