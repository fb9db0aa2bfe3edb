"""int8 KV cache: quantize-at-append / dequantize-at-read.

Layers of evidence (CPU):
  * quantize_kv roundtrip error is within the symmetric-int8 bound;
  * the Pallas ring-decode kernels (interpret mode) on int8 codes + scales
    match the XLA reference attention on the dequantized arrays exactly
    (same quantized math, different code path);
  * llama.forward with a quantized cache tracks the bf16-cache forward
    within quantization tolerance, through appends, compaction and trim;
  * the serving engine with kv_quant="int8" is content-identical across its
    fused/unfused dispatch modes (the oracle-equality discipline applied
    within quantized numerics) and works with stream_window compaction.

The reference has no KV quantization (its torch cache grows in model dtype,
demo/inference.py:64-68) — this is a TPU-serving capacity feature: KV memory
and attention KV HBM reads halve.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_live_config, tiny_llama_config
from videollm_online_tpu.models import live, llama
from videollm_online_tpu.ops.decode_attention import (
    ring_decode_attention, ring_decode_attention_layered)
from videollm_online_tpu.serve.engine import LiveInferEngine
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer


def _rand(shape, seed, scale=1.0):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32) * scale)


def test_quantize_kv_roundtrip_bound():
    x = _rand((2, 3, 17, 16), 0, scale=3.0)
    codes, scale = llama.quantize_kv(x)
    assert codes.dtype == jnp.int8
    deq = codes.astype(jnp.float32) * scale[..., None]
    # max abs error per vector <= scale/2 (round-to-nearest on codes)
    err = jnp.max(jnp.abs(deq - x), axis=-1)
    assert np.all(np.asarray(err) <= np.asarray(scale) * 0.5 + 1e-7)
    # zero vectors stay exactly zero
    z, zs = llama.quantize_kv(jnp.zeros((1, 1, 1, 8)))
    assert np.all(np.asarray(z) == 0) and np.all(np.asarray(zs) == 0)


@pytest.mark.parametrize("window", [None, 700])
def test_ring_decode_quantized_matches_dequant_xla(window):
    B, Hq, Hkv, S, d, C = 2, 4, 2, 8, 64, 1024
    q = _rand((B, Hq, S, d), 1)
    k = _rand((B, Hkv, C, d), 2)
    v = _rand((B, Hkv, C, d), 3)
    kq, ks = llama.quantize_kv(k)
    vq, vs = llama.quantize_kv(v)
    q_pos = jnp.asarray([[900 + i for i in range(S)],
                         [300 + i for i in range(S)]], jnp.int32)
    k_deq = kq.astype(jnp.float32) * ks[..., None]
    v_deq = vq.astype(jnp.float32) * vs[..., None]
    ref = llama._attention(q, k_deq, v_deq, q_pos, None,
                           num_groups=Hq // Hkv, sliding_window=window)
    got = ring_decode_attention(q, kq, vq, q_pos, window=window,
                                k_scale=ks, v_scale=vs, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_ring_decode_layered_quantized_matches_dequant_xla():
    L, B, Hq, Hkv, S, d, C = 3, 2, 4, 2, 4, 64, 1024
    q = _rand((B, Hq, S, d), 4)
    k = _rand((L, B, Hkv, C, d), 5)
    v = _rand((L, B, Hkv, C, d), 6)
    kq, ks = llama.quantize_kv(k)
    vq, vs = llama.quantize_kv(v)
    q_pos = jnp.asarray([[800 + i for i in range(S)],
                         [200 + i for i in range(S)]], jnp.int32)
    for layer in (0, 2):
        k_deq = kq[layer].astype(jnp.float32) * ks[layer][..., None]
        v_deq = vq[layer].astype(jnp.float32) * vs[layer][..., None]
        ref = llama._attention(q, k_deq, v_deq, q_pos, None,
                               num_groups=Hq // Hkv)
        got = ring_decode_attention_layered(
            q, kq, vq, q_pos, jnp.asarray(layer, jnp.int32),
            k_scale=ks, v_scale=vs, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-4)


def _forward_appends(params, cfg, cache, chunks):
    logits = []
    for ids in chunks:
        out, cache = llama.forward(params, cfg=cfg,
                                   input_ids=jnp.asarray([ids], jnp.int32),
                                   kv_cache=cache)
        logits.append(np.asarray(out, np.float32))
    return logits, cache


def test_forward_quantized_cache_tracks_bf16():
    cfg = tiny_llama_config()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(7)
    chunks = [list(rng.randint(0, cfg.vocab_size, n)) for n in (7, 1, 5, 1)]

    base_cache = llama.init_kv_cache(cfg, batch=1, capacity=64)
    q_cache = llama.init_kv_cache(cfg, batch=1, capacity=64, quant="int8")
    assert q_cache.quantized and not base_cache.quantized

    ref, _ = _forward_appends(params["llama"] if "llama" in params else params,
                              cfg, base_cache, chunks)
    got, qc = _forward_appends(params["llama"] if "llama" in params else params,
                               cfg, q_cache, chunks)
    assert qc.k.dtype == jnp.int8
    for r, g in zip(ref, got):
        # int8 KV noise on a tiny random model: logits track closely
        assert np.max(np.abs(r - g)) < 0.15
        # top-1 agreement on every position
        np.testing.assert_array_equal(r.argmax(-1), g.argmax(-1))


def test_quantized_compact_and_trim_consistency():
    """Compaction must move codes and scales in lockstep: forward after
    compact(keep) equals forward on an uncompacted quantized cache (the
    compaction-equivalence contract, quantized edition)."""
    cfg = tiny_llama_config()
    params = llama.init_params(jax.random.PRNGKey(1), cfg)
    p = params["llama"] if "llama" in params else params
    rng = np.random.RandomState(3)
    warm = list(rng.randint(0, cfg.vocab_size, 12))
    probe = list(rng.randint(0, cfg.vocab_size, 3))

    cache_a = llama.init_kv_cache(cfg, batch=1, capacity=64, quant="int8")
    _, cache_a = llama.forward(p, cfg=cfg,
                               input_ids=jnp.asarray([warm], jnp.int32),
                               kv_cache=cache_a)
    cache_b = llama.compact_kv_cache(cache_a, keep=jnp.asarray(8, jnp.int32))
    assert cache_b.k_scale is not None
    # window=8 attention sees identical content either way
    import dataclasses
    wcfg = dataclasses.replace(cfg, sliding_window=8)
    out_a, _ = llama.forward(p, cfg=wcfg,
                             input_ids=jnp.asarray([probe], jnp.int32),
                             kv_cache=cache_a)
    out_b, _ = llama.forward(p, cfg=wcfg,
                             input_ids=jnp.asarray([probe], jnp.int32),
                             kv_cache=cache_b)
    np.testing.assert_allclose(np.asarray(out_a, np.float32),
                               np.asarray(out_b, np.float32),
                               atol=1e-5, rtol=1e-5)
    # trim keeps scales attached
    trimmed = llama.trim_kv_cache(cache_b, 4)
    assert trimmed.k_scale is not None and int(trimmed.offset[0]) == 4


def _setup_engine(threshold=0.725, seed=0):
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(frame_token_interval_threshold=threshold,
                          max_response_tokens=20)
    params = live.init_params(jax.random.PRNGKey(seed), cfg)
    return cfg, tok, params


def _drive(engine, cfg, feats, frame_times, queries):
    engine.load_video(feats)
    transcripts = []
    qi = 0
    for t in frame_times:
        while qi < len(queries) and queries[qi][0] <= t:
            engine.input_query_stream(queries[qi][1],
                                      video_time=queries[qi][0])
            qi += 1
        engine.input_video_stream(t)
        while True:
            q, r = engine()
            if r is None:
                break
            transcripts.append((q, r))
    return transcripts


@pytest.mark.parametrize("queries", [[], [(0.5, "q1?"), (3.0, "q2?")]])
def test_engine_int8_kv_fused_equals_unfused(queries):
    cfg, tok, params = _setup_engine()
    rng = np.random.RandomState(0)
    feats = rng.randn(12, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    times = [i / cfg.frame_fps for i in range(12)]
    a = LiveInferEngine(params, tok, cfg, kv_capacity=4096, kv_quant="int8",
                        fused_respond=True)
    b = LiveInferEngine(params, tok, cfg, kv_capacity=4096, kv_quant="int8",
                        fused_respond=False, multi_respond=False)
    ta = _drive(a, cfg, feats, times, queries)
    tb = _drive(b, cfg, feats, times, queries)
    assert ta == tb
    assert len(ta) > 0  # the gate actually fired under quantized numerics
    assert a.cache.k.dtype == jnp.int8


def test_engine_int8_kv_with_stream_window():
    cfg, tok, params = _setup_engine()
    rng = np.random.RandomState(1)
    feats = rng.randn(24, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    times = [i / cfg.frame_fps for i in range(24)]
    win = LiveInferEngine(params, tok, cfg, kv_capacity=1024,
                          kv_quant="int8", stream_window=256)
    ref = LiveInferEngine(params, tok, cfg, kv_capacity=4096,
                          kv_quant="int8", stream_window=256)
    tw = _drive(win, cfg, feats, times, [])
    tr = _drive(ref, cfg, feats, times, [])
    assert tw == tr


def test_multistream_int8_kv_fused_equals_unfused():
    """Batched engine with kv_quant="int8": fused vs 2-dispatch ticks are
    content-identical within quantized numerics."""
    from videollm_online_tpu.serve.multistream import MultiStreamEngine
    from tests.test_multistream import _setup as ms_setup, _drive

    cfg, tok, params = ms_setup(threshold=0.725, seed=3)
    N, n_frames = 2, 8
    rng = np.random.RandomState(11)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    queries = {0: (1.2, "what now?")}
    schedule = [0.0, 1.0, 2.0, 3.5]

    ref = MultiStreamEngine(params, tok, cfg, num_streams=N,
                            kv_capacity=2048, chunk_frames=4, fused=False,
                            kv_quant="int8")
    ref_out = _drive(ref, feats, queries, schedule, cfg.frame_fps)
    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=2048, chunk_frames=4, fused=True,
                           kv_quant="int8")
    got_out = _drive(ms, feats, queries, schedule, cfg.frame_fps)
    assert ref.cache.k.dtype == jnp.int8
    for i in range(N):
        assert got_out[i] == ref_out[i]


@pytest.mark.parametrize("mode", ["speculative", "pipelined"])
def test_engine_int8_kv_rollback_modes(mode):
    """Speculative/pipelined dispatch rewinds ring offsets past
    already-written int8 codes+scales — stale quantized slots must never
    leak into transcripts (content equality vs the blocking int8 engine)."""
    cfg, tok, params = _setup_engine()
    rng = np.random.RandomState(2)
    feats = rng.randn(12, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    times = [i / cfg.frame_fps for i in range(12)]
    queries = [(0.5, "q1?"), (3.0, "q2?")]
    kw = {mode: True}
    a = LiveInferEngine(params, tok, cfg, kv_capacity=4096,
                        kv_quant="int8", **kw)
    b = LiveInferEngine(params, tok, cfg, kv_capacity=4096, kv_quant="int8")
    ta = _drive(a, cfg, feats, times, queries)
    ta += [(q, r) for q, r in a.flush() if r]
    tb = _drive(b, cfg, feats, times, queries)
    # speculative/pipelined may surface a response a call later; content
    # equality is the contract (same discipline as the bf16 mode tests)
    assert [m for m in ta] == [m for m in tb] or sorted(ta) == sorted(tb)
    assert len(tb) > 0
