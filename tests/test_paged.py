"""Paged KV cache (models/llama.PagedKVCache + ops/paged_attention):
BASELINE config #4's "paged KV cache". Correctness bar: byte-identical
behavior to the static ring cache at every step — the page pool is a
memory-layout change, never a semantics change."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live, llama
from videollm_online_tpu.ops.paged_attention import (
    paged_attention_reference, paged_decode_attention)


def _identity_table(B, maxp, trash=False):
    # pages laid out stream-major: stream b's logical page j -> 1 + b*maxp + j
    base = 1 + np.arange(B)[:, None] * maxp + np.arange(maxp)[None]
    return jnp.asarray(base, jnp.int32)


def test_paged_kernel_matches_reference():
    """Interpret-mode Pallas kernel vs the XLA gather reference on shuffled
    page tables and ragged per-stream lengths."""
    rng = np.random.RandomState(0)
    B, Hq, Hkv, S, d, page, maxp = 2, 4, 2, 3, 16, 32, 4
    P = 1 + B * maxp
    q = jnp.asarray(rng.randn(B, Hq, S, d), jnp.float32)
    pool_k = jnp.asarray(rng.randn(2, P, Hkv, page, d), jnp.float32)
    pool_v = jnp.asarray(rng.randn(2, P, Hkv, page, d), jnp.float32)
    # shuffled physical pages (the whole point of the table)
    perm = rng.permutation(P - 1) + 1
    table = jnp.asarray(perm[:B * maxp].reshape(B, maxp), jnp.int32)
    # stream 0 is long (crosses pages), stream 1 short
    q_pos = jnp.asarray([[70, 71, 72], [5, 6, 7]], jnp.int32)
    for layer in (0, 1):
        for window in (None, 40):
            ref = paged_attention_reference(q, pool_k, pool_v, table,
                                            q_pos, layer, window=window)
            got = paged_decode_attention(q, pool_k, pool_v, table, q_pos,
                                         layer, window=window,
                                         interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-4)


def _forward_pair(cfg, params, page, maxp):
    B = 2
    ring = llama.init_kv_cache(cfg.llama, batch=B, capacity=page * maxp)
    paged = llama.init_paged_kv_cache(
        cfg.llama, batch=B, pool_pages=1 + B * maxp, pages_per_stream=maxp,
        page_size=page, dtype=jnp.float32)
    paged = paged._replace(table=_identity_table(B, maxp))
    return ring, paged


def test_paged_forward_matches_ring_across_appends():
    """The full decoder with a PagedKVCache must produce the ring cache's
    exact logits across prefill, page-boundary-crossing multi-token
    appends, and 1-token decode steps (the S==1 fast path)."""
    cfg = tiny_live_config()
    params = live.init_params(jax.random.PRNGKey(0), cfg)["llama"]
    page, maxp = 32, 6
    ring, paged = _forward_pair(cfg, params, page, maxp)
    rng = np.random.RandomState(1)
    # appends sized to land on/cross boundaries: 24+24 crosses at 32,
    # then 11-token frame steps, then 1-token decodes
    for S in (24, 24, 11, 11, 1, 1, 30, 1):
        ids = rng.randint(0, cfg.llama.vocab_size, (2, S))
        nv = jnp.asarray([S, max(S - 2, 1)], jnp.int32)  # ragged validity
        la, ring = llama.forward(params, cfg=cfg.llama,
                                 input_ids=jnp.asarray(ids),
                                 kv_cache=ring, num_valid=nv)
        lb, paged = llama.forward(params, cfg=cfg.llama,
                                  input_ids=jnp.asarray(ids),
                                  kv_cache=paged, num_valid=nv)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   atol=3e-5, rtol=3e-4,
                                   err_msg=f"append S={S}")
        assert np.array_equal(np.asarray(ring.offset),
                              np.asarray(paged.offset))


def test_paged_junk_crossing_lands_in_trash():
    """A bucket-padded append whose PADDING crosses into an unmapped
    logical page must write the spill to the shared trash page (table
    entry 0), never to a foreign stream's page."""
    cfg = tiny_live_config()
    params = live.init_params(jax.random.PRNGKey(0), cfg)["llama"]
    page, maxp = 32, 4
    B = 2
    paged = llama.init_paged_kv_cache(
        cfg.llama, batch=B, pool_pages=1 + B * maxp, pages_per_stream=maxp,
        page_size=page, dtype=jnp.float32)
    # stream 0 owns only logical page 0; stream 1 owns pages 2,3
    table = np.zeros((B, maxp), np.int32)
    table[0, 0] = 1
    table[1, :2] = [2, 3]
    paged = paged._replace(table=jnp.asarray(table))
    rng = np.random.RandomState(2)
    # fill stream 1's pages with known tokens, snapshot them
    ids1 = rng.randint(0, cfg.llama.vocab_size, (B, 40))
    _, paged = llama.forward(params, cfg=cfg.llama,
                             input_ids=jnp.asarray(ids1),
                             kv_cache=paged,
                             num_valid=jnp.asarray([20, 40], jnp.int32))
    # stream 1 holds 40 valid slots: page 2 fully + page 3 rows [:8]
    snap2 = np.asarray(paged.k[:, 2]), np.asarray(paged.k[:, 3, :, :8])
    # stream 0 appends a 24-token bucket with only 8 valid: the padding
    # crosses its page-0 boundary (20+24 > 32) into unmapped page 1 ->
    # trash page 0. Stream 1 appends 0 valid (its own junk lands past its
    # offset inside its own page 3 — legal, overwritten later).
    ids2 = rng.randint(0, cfg.llama.vocab_size, (B, 24))
    _, paged = llama.forward(params, cfg=cfg.llama,
                             input_ids=jnp.asarray(ids2),
                             kv_cache=paged,
                             num_valid=jnp.asarray([8, 0], jnp.int32))
    assert np.array_equal(np.asarray(paged.k[:, 2]), snap2[0])
    assert np.array_equal(np.asarray(paged.k[:, 3, :, :8]), snap2[1])


def _drive_pair(paged_kwargs, ring_kwargs=None, threshold=0.725, seed=9,
                n_frames=16, window=None):
    from videollm_online_tpu.serve.multistream import MultiStreamEngine

    from test_multistream import _drive, _setup
    cfg, tok, params = _setup(threshold=threshold, seed=seed)
    N = 2
    rng = np.random.RandomState(31)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    queries = {0: (1.2, "what now?")}
    schedule = [0.0, 1.5, 3.0, 5.0, 8.0]
    common = dict(num_streams=N, chunk_frames=4, stream_window=window)
    ref = MultiStreamEngine(params, tok, cfg, kv_capacity=2048, paged=False,
                            **common, **(ring_kwargs or {}))
    ref_out = _drive(ref, feats, queries, schedule, cfg.frame_fps)
    ms = MultiStreamEngine(params, tok, cfg, paged=True, **common,
                           **paged_kwargs)
    got = _drive(ms, feats, queries, schedule, cfg.frame_fps)
    return ref_out, got, ms


def test_multistream_paged_equals_ring():
    """Paged multistream serving (64-slot pages to force many boundary
    crossings) must reproduce the ring engine's transcripts — fused,
    unfused, and pipelined."""
    for kw in (dict(fused=True), dict(fused=False),
               dict(fused=True, pipelined=True, pipeline_depth=2)):
        ref_out, got, ms = _drive_pair(
            dict(kv_capacity=2048, page_size=64, **kw))
        assert sum(len(o) for o in ref_out) >= 2
        for i in range(len(ref_out)):
            assert got[i] == ref_out[i], (
                f"stream {i} ({kw}):\npaged={got[i]}\nring={ref_out[i]}")
        assert max(ms._pages_alloc) >= 3  # multiple pages actually in play


def test_multistream_paged_window_frees_pages():
    """stream_window in paged mode: transcripts equal the ring engine's
    windowed run, and compaction FREES pages (the allocator's free list
    recovers) instead of rolling the ring."""
    ref_out, got, ms = _drive_pair(
        dict(kv_capacity=1024, page_size=64, fused=True),
        ring_kwargs=dict(fused=True), threshold=1.0, n_frames=24,
        window=256)
    for i in range(len(ref_out)):
        assert got[i] == ref_out[i], (
            f"stream {i}:\npaged={got[i]}\nring={ref_out[i]}")
    # every stream generated far more than window tokens -> pages freed
    assert ms._pos_base_host.max() > 0
    # conservation: free + uniquely-referenced == pool. With prefix_cache
    # on by default, template-held pages are referenced but in no stream
    # table, and prefix-admitted streams ALIAS pages — so count unique
    # referenced pages via the refcounts, not sum(_pages_alloc).
    pool = ms.stats()["pool"]  # stats() asserts the invariant internally
    assert pool["pages_free"] == pool["pages_total"] - pool["pages_in_use"]
    assert len(ms._free_pages) == \
        ms.pool_pages - 1 - int(np.count_nonzero(ms._page_refs[1:]))
    # compaction ran past the prefix: the template is now sole owner of
    # (at least) its copied tail page
    assert pool["prefix_owned_pages"] >= pool["prefix_tail_pages"]


def test_paged_kernel_quantized_matches_reference():
    """int8 paged KV: the interpret-mode kernel on code pools + paged
    scale pools must match (a) the gather reference on the same quantized
    operands and (b) a dense dequantized attention."""
    rng = np.random.RandomState(7)
    B, Hq, Hkv, S, d, page, maxp = 2, 4, 2, 3, 16, 32, 4
    P = 1 + B * maxp
    q = jnp.asarray(rng.randn(B, Hq, S, d), jnp.float32)
    pool_k = jnp.asarray(rng.randn(2, P, Hkv, page, d), jnp.float32)
    pool_v = jnp.asarray(rng.randn(2, P, Hkv, page, d), jnp.float32)
    kq, ks = llama.quantize_kv(pool_k)
    vq, vs = llama.quantize_kv(pool_v)
    perm = rng.permutation(P - 1) + 1
    table = jnp.asarray(perm[:B * maxp].reshape(B, maxp), jnp.int32)
    q_pos = jnp.asarray([[70, 71, 72], [5, 6, 7]], jnp.int32)
    for layer in (0, 1):
        for window in (None, 40):
            ref = paged_attention_reference(
                q, kq, vq, table, q_pos, layer, window=window,
                k_scale=ks, v_scale=vs)
            got = paged_decode_attention(
                q, kq, vq, table, q_pos, layer, window=window,
                k_scale=ks, v_scale=vs, interpret=True)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       atol=2e-5, rtol=2e-4)
            # dense dequant oracle
            dense = paged_attention_reference(
                q, kq.astype(jnp.float32) * ks[..., None],
                vq.astype(jnp.float32) * vs[..., None],
                table, q_pos, layer, window=window)
            np.testing.assert_allclose(np.asarray(got), np.asarray(dense),
                                       atol=2e-5, rtol=2e-4)


def test_paged_quantized_forward_matches_ring_quantized():
    """llama.forward with a quantized PAGED cache tracks the quantized
    RING cache exactly (same quantize-at-append math, different layout)
    through boundary-crossing appends and 1-token decodes."""
    cfg = tiny_live_config()
    params = live.init_params(jax.random.PRNGKey(0), cfg)["llama"]
    page, maxp = 32, 6
    B = 2
    ring = llama.init_kv_cache(cfg.llama, batch=B, capacity=page * maxp,
                               quant="int8")
    paged = llama.init_paged_kv_cache(
        cfg.llama, batch=B, pool_pages=1 + B * maxp, pages_per_stream=maxp,
        page_size=page, quant="int8")
    paged = paged._replace(table=_identity_table(B, maxp))
    assert paged.quantized and paged.k.dtype == jnp.int8
    rng = np.random.RandomState(5)
    for S in (24, 24, 11, 1, 1, 30, 1):
        ids = rng.randint(0, cfg.llama.vocab_size, (2, S))
        nv = jnp.asarray([S, max(S - 2, 1)], jnp.int32)
        la, ring = llama.forward(params, cfg=cfg.llama,
                                 input_ids=jnp.asarray(ids),
                                 kv_cache=ring, num_valid=nv)
        lb, paged = llama.forward(params, cfg=cfg.llama,
                                  input_ids=jnp.asarray(ids),
                                  kv_cache=paged, num_valid=nv)
        np.testing.assert_allclose(np.asarray(lb), np.asarray(la),
                                   atol=3e-5, rtol=3e-4,
                                   err_msg=f"append S={S}")


def test_multistream_paged_quantized_equals_ring_quantized():
    """Paged + kv_quant="int8" multistream serving must reproduce the
    int8-ring engine's transcripts (the oracle-equality discipline within
    quantized numerics), fused and pipelined, and still free pages under
    a stream window."""
    for kw in (dict(fused=True),
               dict(fused=True, pipelined=True, pipeline_depth=2)):
        ref_out, got, ms = _drive_pair(
            dict(kv_capacity=2048, page_size=64, kv_quant="int8", **kw),
            ring_kwargs=dict(kv_quant="int8", **kw))
        assert sum(len(o) for o in ref_out) >= 2
        assert ms.cache.quantized and ms.cache.k.dtype == jnp.int8
        for i in range(len(ref_out)):
            assert got[i] == ref_out[i], (
                f"stream {i} ({kw}):\npaged={got[i]}\nring={ref_out[i]}")


def test_multistream_paged_quantized_window_frees_pages():
    ref_out, got, ms = _drive_pair(
        dict(kv_capacity=1024, page_size=64, fused=True, kv_quant="int8"),
        ring_kwargs=dict(fused=True, kv_quant="int8"), threshold=1.0,
        n_frames=24, window=256)
    for i in range(len(ref_out)):
        assert got[i] == ref_out[i]
    assert ms._pos_base_host.max() > 0
    pool = ms.stats()["pool"]  # stats() asserts conservation internally
    assert pool["pages_free"] == pool["pages_total"] - pool["pages_in_use"]
    assert len(ms._free_pages) == \
        ms.pool_pages - 1 - int(np.count_nonzero(ms._page_refs[1:]))


def test_multistream_paged_pool_sharing():
    """The paged win: a pool SMALLER than N x per-stream capacity serves
    heterogeneous streams (one long, one nearly idle) that the same-size
    ring allocation could not hold."""
    from videollm_online_tpu.serve.multistream import MultiStreamEngine

    from test_multistream import _drive, _setup
    cfg, tok, params = _setup(threshold=0.725, seed=9)
    N, page = 2, 64
    rng = np.random.RandomState(33)
    long_feats = rng.randn(24, cfg.frame_num_tokens,
                           cfg.vision_hidden_size).astype(np.float32)
    short_feats = rng.randn(2, cfg.frame_num_tokens,
                            cfg.vision_hidden_size).astype(np.float32)
    # per-stream logical capacity 2048 (32 pages) but the pool holds only
    # 40 pages + trash — far less than the ring's 2 x 32
    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=2048, chunk_frames=4, paged=True,
                           page_size=page, pool_pages=41)
    out = _drive(ms, [long_feats, short_feats], {}, [0.0, 4.0, 12.0],
                 cfg.frame_fps)
    assert int(ms._host_offsets[0]) > 1000  # the long stream really ran
    assert ms._pages_alloc[0] > 2 * ms._pages_alloc[1]
    assert sum(ms._pages_alloc) <= 40


def test_paged_pool_conservation_invariant_through_lifecycle():
    """stats() asserts the refcount allocator's conservation invariant
    (free XOR referenced; every ref owned by a table entry or a prefix
    template) — drive the full page lifecycle and check it at every
    quiescent point: prefill + template build, prefix-cache re-admission
    (page aliasing), window compaction past the prefix (template becomes
    sole owner of full prefix pages), close_stream, cache eviction. Any
    future leak in any of these paths trips the in-stats() asserts."""
    from videollm_online_tpu.serve.multistream import MultiStreamEngine

    from test_multistream import _drive, _setup
    cfg, tok, params = _setup(threshold=1.0, seed=9)  # gate never fires
    N = 3
    rng = np.random.RandomState(77)
    feats = [rng.randn(24, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]
    ms = MultiStreamEngine(params, tok, cfg, num_streams=N,
                           kv_capacity=1024, chunk_frames=4, paged=True,
                           page_size=64, stream_window=256,
                           prefix_cache=True)

    def check():
        pool = ms.stats()["pool"]  # internal asserts run here
        assert pool["pages_free"] + pool["pages_in_use"] \
            == pool["pages_total"]
        return pool

    # long drive: prefill (template built), window compaction fires
    _drive(ms, feats, {0: (1.2, "what now?")}, [0.0, 3.0, 6.0, 12.0],
           cfg.frame_fps)
    pool = check()
    assert ms._pos_base_host.max() > 0, "compaction must have run"
    assert pool["prefix_entries"] == 1
    # compaction ran past the prefix on every stream: the template is the
    # sole owner of all its pages (full + tail)
    S = len(ms._start_ids)
    assert pool["prefix_owned_pages"] == -(-S // ms.page_size)

    # close a stream, re-admit from the prefix template (aliasing path)
    ms.close_stream(0)
    check()
    ms.input_frames(0, 0.0, feats[0][:4])
    ms.step()
    pool = check()
    assert pool["prefix_hits"] >= 1
    # drain + close everything; evict the cache -> the ENTIRE pool is free
    while ms.pending():
        ms.step()
    for i in range(N):
        ms.close_stream(i)
    check()
    ms._clear_prefix_cache()
    pool = check()
    assert pool["pages_free"] == pool["pages_total"]
    assert pool["pages_in_use"] == 0
