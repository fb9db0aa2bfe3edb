"""N-gram (prompt-lookup) speculative decoding — models/generate.py.

Contract: `ngram_speculative_generate` emits the BYTE-IDENTICAL token
stream to `greedy_generate` (verification discards wrong drafts), with the
same length/EOS/budget semantics and the same cache-offset invariant,
while taking fewer decode steps whenever the history contains the
continuation. The reference has no speculative path at all — its decode
is one host dispatch per token (modeling_live.py:173-182)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import generate as gen
from videollm_online_tpu.models import live, llama
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_live_config()
    cfg = LiveTokenizer(ByteTokenizer(), cfg).cfg
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, params


def _emb(params, cfg, ids):
    return llama.embed_tokens(params["llama"], jnp.asarray([ids], jnp.int32),
                              cfg.llama)


def _fresh_hist(n=gen.SPEC_HIST):
    return jnp.zeros((n,), jnp.int32), jnp.asarray(0, jnp.int32)


def _greedy(params, cfg, ids, max_new, capacity=256):
    cache = llama.init_kv_cache(cfg.llama, batch=1, capacity=capacity)
    out, length, cache = gen.greedy_generate(
        params, cfg, cache, _emb(params, cfg, ids),
        jnp.asarray([len(ids)], jnp.int32), max_new_tokens=max_new)
    return np.asarray(out)[0], int(length[0]), int(cache.offset[0])


def _spec(params, cfg, ids, max_new, hist=None, hc=None, capacity=256):
    cache = llama.init_kv_cache(cfg.llama, batch=1, capacity=capacity)
    if hist is None:
        hist, hc = _fresh_hist()
    out, length, cache, hist, hc, stats = gen.ngram_speculative_generate(
        params, cfg, cache, _emb(params, cfg, ids),
        jnp.asarray([len(ids)], jnp.int32), hist, hc,
        prompt_ids=jnp.asarray(ids, jnp.int32),
        prompt_n=jnp.asarray(len(ids), jnp.int32),
        max_new_tokens=max_new)
    return (np.asarray(out)[0], int(length[0]), int(cache.offset[0]),
            hist, hc, np.asarray(stats))


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_spec_equals_greedy_cold_history(setup, seed):
    cfg, params = setup
    rng = np.random.RandomState(seed)
    ids = list(rng.randint(0, cfg.llama.vocab_size, 9))
    g_out, g_len, g_off = _greedy(params, cfg, ids, 24)
    s_out, s_len, s_off, _, _, stats = _spec(params, cfg, ids, 24)
    assert s_len == g_len
    np.testing.assert_array_equal(s_out[:s_len], g_out[:g_len])
    assert s_off == g_off
    assert stats[1] == s_len


def test_spec_accepts_on_primed_history(setup):
    """Prime the history with a previous identical turn (prompt + its
    greedy output): the rerun must lock onto the n-gram continuation and
    finish in strictly fewer verify steps than tokens emitted."""
    cfg, params = setup
    rng = np.random.RandomState(3)
    ids = list(rng.randint(0, cfg.llama.vocab_size, 9))
    g_out, g_len, _ = _greedy(params, cfg, ids, 32)

    hist, hc = _fresh_hist()
    hist, hc = gen.hist_append_ids(hist, hc, jnp.asarray(ids, jnp.int32),
                                   jnp.asarray(len(ids), jnp.int32))
    hist, hc = gen.hist_append_ids(hist, hc,
                                   jnp.asarray(g_out[:g_len], jnp.int32),
                                   jnp.asarray(g_len, jnp.int32))
    s_out, s_len, _, _, _, stats = _spec(params, cfg, ids, 32, hist, hc)
    assert s_len == g_len
    np.testing.assert_array_equal(s_out[:s_len], g_out[:g_len])
    steps, emitted = int(stats[0]), int(stats[1])
    assert emitted == s_len
    assert steps < s_len, (steps, s_len)  # speculation actually accepted


def test_spec_budget_clip(setup):
    cfg, params = setup
    rng = np.random.RandomState(4)
    ids = list(rng.randint(0, cfg.llama.vocab_size, 7))
    for max_new in (1, 3, 5):
        g_out, g_len, g_off = _greedy(params, cfg, ids, max_new)
        s_out, s_len, s_off, _, _, _ = _spec(params, cfg, ids, max_new)
        assert s_len == g_len <= max_new
        np.testing.assert_array_equal(s_out[:s_len], g_out[:g_len])
        assert s_off == g_off


def test_spec_eos_semantics(setup):
    """Make EOS a token the model actually emits mid-stream (pick it from
    a greedy run), then both paths must stop right there."""
    cfg, params = setup
    rng = np.random.RandomState(5)
    ids = list(rng.randint(0, cfg.llama.vocab_size, 8))
    g_out, g_len, _ = _greedy(params, cfg, ids, 24)
    assert g_len >= 4
    eos_tok = int(g_out[3])
    cfg2 = cfg.replace(eos_token_id=eos_tok)
    g2_out, g2_len, g2_off = _greedy(params, cfg2, ids, 24)
    assert g2_len <= 4 or eos_tok not in g2_out[:g2_len - 1]
    # prime history with the full stream so drafts CONTAIN the EOS token —
    # exercises the emit-truncation-at-EOS branch
    hist, hc = _fresh_hist()
    hist, hc = gen.hist_append_ids(hist, hc, jnp.asarray(ids, jnp.int32),
                                   jnp.asarray(len(ids), jnp.int32))
    hist, hc = gen.hist_append_ids(hist, hc, jnp.asarray(g_out[:g_len]),
                                   jnp.asarray(g_len, jnp.int32))
    s_out, s_len, s_off, _, _, _ = _spec(params, cfg2, ids, 24, hist, hc)
    assert s_len == g2_len
    np.testing.assert_array_equal(s_out[:s_len], g2_out[:g2_len])
    assert s_off == g2_off


def test_hist_ring_wraparound():
    hist = jnp.zeros((8,), jnp.int32)
    hc = jnp.asarray(0, jnp.int32)
    hist, hc = gen.hist_append_ids(hist, hc, jnp.asarray([1, 2, 3, 4, 5]),
                                   jnp.asarray(5, jnp.int32))
    hist, hc = gen.hist_append_ids(
        hist, hc, jnp.asarray([6, 7, 8, 9, 0, 0]), jnp.asarray(4, jnp.int32))
    assert int(hc) == 9
    # ring: slot i holds global token i%8; global 8 (value 9) overwrote slot 0
    np.testing.assert_array_equal(np.asarray(hist),
                                  [9, 2, 3, 4, 5, 6, 7, 8])


def test_ngram_draft_prefers_trigram():
    """History: ... A B C X ... A B C Y [suffix A B C] — the trigram match
    (most recent: C->Y) must win over any bigram-only match."""
    hist = jnp.zeros((64,), jnp.int32)
    hc = jnp.asarray(0, jnp.int32)
    seq = [10, 11, 12, 77, 5, 10, 11, 12, 88, 99, 6, 10, 11, 12]
    hist, hc = gen.hist_append_ids(hist, hc, jnp.asarray(seq, jnp.int32),
                                   jnp.asarray(len(seq), jnp.int32))
    drafts = np.asarray(gen._ngram_draft(hist, hc, 3))
    assert drafts[0] == 88 and drafts[1] == 99 and drafts[2] == 6


def test_ngram_draft_bigram_fallback():
    hist = jnp.zeros((64,), jnp.int32)
    hc = jnp.asarray(0, jnp.int32)
    seq = [1, 20, 21, 42, 43, 9, 20, 21]  # trigram (9,20,21) never repeats
    hist, hc = gen.hist_append_ids(hist, hc, jnp.asarray(seq, jnp.int32),
                                   jnp.asarray(len(seq), jnp.int32))
    drafts = np.asarray(gen._ngram_draft(hist, hc, 2))
    assert drafts[0] == 42 and drafts[1] == 43


def test_ngram_draft_no_match():
    hist = jnp.zeros((64,), jnp.int32)
    hc = jnp.asarray(0, jnp.int32)
    seq = [1, 2, 3, 4, 5, 6]
    hist, hc = gen.hist_append_ids(hist, hc, jnp.asarray(seq, jnp.int32),
                                   jnp.asarray(len(seq), jnp.int32))
    drafts = np.asarray(gen._ngram_draft(hist, hc, 4))
    np.testing.assert_array_equal(drafts, [0, 0, 0, 0])


# ---------------------------------------------------------------------------
# Engine integration: spec_decode=True must be transcript-invisible
# ---------------------------------------------------------------------------

from videollm_online_tpu.serve.engine import LiveInferEngine  # noqa: E402
from tests.test_serve_engine import _run_engine, _setup  # noqa: E402


@pytest.mark.parametrize("queries,fused,multi", [
    ([], True, True),                          # multi-response device loop
    ([(0.5, "q1?"), (3.0, "q2?")], True, False),  # fused single-response
    ([(1.0, "q?")], False, False),             # two-dispatch host path
])
def test_engine_spec_decode_equals_greedy(queries, fused, multi):
    """LiveInferEngine(spec_decode=True) must emit EXACTLY the greedy
    engine's transcripts, final ring offset, and pending prepend across
    all three dispatch paths, while spec_stats() shows real verify
    activity."""
    cfg, tok, params = _setup(threshold=0.725, seed=2)
    n_frames = 24
    rng = np.random.RandomState(3)
    feats = rng.randn(n_frames, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    frame_times = [5.5, 11.5]
    kw = dict(kv_capacity=4096, fused_respond=fused, multi_respond=multi)
    a = LiveInferEngine(params, tok, cfg, spec_decode=True, **kw)
    b = LiveInferEngine(params, tok, cfg, **kw)
    ta = _run_engine(a, cfg, feats, frame_times, queries)
    tb = _run_engine(b, cfg, feats, frame_times, queries)
    assert ta == tb
    assert len(ta) >= 1
    assert int(a.cache.offset[0]) == int(b.cache.offset[0])
    assert a._pending_prepend == b._pending_prepend
    steps, emitted = (int(x) for x in a.spec_stats())
    assert steps >= 1 and emitted >= steps  # verify loop actually ran


def test_engine_spec_decode_accepts_across_turns():
    """Identical repeated turns prime the history ring: later responses
    must take fewer verify steps than tokens (speculation accepting) while
    transcripts stay byte-identical to greedy."""
    cfg, tok, params = _setup(threshold=0.725, seed=2)
    n_frames = 12
    feats = np.zeros((n_frames, cfg.frame_num_tokens,
                      cfg.vision_hidden_size), np.float32)  # same frames
    frame_times = [i * 0.5 for i in range(n_frames)]
    queries = [(t, "describe?") for t in (0.5, 2.5, 4.5)]  # same query 3x
    kw = dict(kv_capacity=4096, fused_respond=False)
    a = LiveInferEngine(params, tok, cfg, spec_decode=True, **kw)
    b = LiveInferEngine(params, tok, cfg, **kw)
    ta = _run_engine(a, cfg, feats, frame_times, queries)
    tb = _run_engine(b, cfg, feats, frame_times, queries)
    assert ta == tb
    assert len(ta) >= 3  # identical frames/queries -> repeated turns
    steps, emitted = (int(x) for x in a.spec_stats())
    assert steps < emitted, (steps, emitted)  # drafts accepted overall


def test_engine_spec_draft_override_exact():
    """A non-default draft length must keep transcripts byte-identical to
    greedy (verification guarantees it regardless of K)."""
    cfg, tok, params = _setup(threshold=0.725, seed=2)
    rng = np.random.RandomState(3)
    feats = rng.randn(12, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)
    frame_times = [5.5]
    queries = [(1.0, "what now?")]

    ref = _run_engine(LiveInferEngine(params, tok, cfg, kv_capacity=2048),
                      cfg, feats, frame_times, queries)
    for k in (3, 12):
        e = LiveInferEngine(params, tok, cfg, kv_capacity=2048,
                            spec_decode=True, spec_draft=k)
        got = _run_engine(e, cfg, feats, frame_times, queries)
        assert got == ref, f"K={k}"
        assert e.spec_draft == k
    assert len(ref) >= 1


def test_spec_adversarial_zero_drafts_worst_case(setup):
    """draft_mode="zero" pins the adversarial lower bound (VERDICT r3 #3):
    constant-zero drafts are (almost) never the greedy continuation, so
    every verify step emits exactly ONE token — the same forward count as
    plain greedy, each forward merely K+1 positions wide — and the output
    stream is still byte-identical to greedy (verification)."""
    cfg, params = setup
    ids = [5, 9, 200, 31, 7, 77]
    max_new = 24
    g_out, g_len, g_off = _greedy(params, cfg, ids, max_new)
    cache = llama.init_kv_cache(cfg.llama, batch=1, capacity=256)
    hist, hc = _fresh_hist()
    out, length, cache, hist, hc, stats = gen.ngram_speculative_generate(
        params, cfg, cache, _emb(params, cfg, ids),
        jnp.asarray([len(ids)], jnp.int32), hist, hc,
        prompt_ids=jnp.asarray(ids, jnp.int32),
        prompt_n=jnp.asarray(len(ids), jnp.int32),
        max_new_tokens=max_new, draft_mode="zero")
    out, length = np.asarray(out)[0], int(length[0])
    assert length == g_len
    assert list(out[:length]) == list(g_out[:g_len])
    assert int(cache.offset[0]) == g_off
    steps, emitted = (int(x) for x in np.asarray(stats))
    assert emitted == length
    # worst case == greedy forward count: token 0 may legitimately be the
    # greedy continuation at a step (then it's accepted — that's correct
    # verification, not a bound violation), so steps >= emitted - slack,
    # and never MORE steps than tokens (each step emits >= 1)
    assert steps <= emitted
    assert steps >= emitted - 2


def test_spec_adversarial_engine_transcripts_exact(setup):
    """The engine built with spec_draft_mode="zero" serves the exact
    greedy-engine transcripts (worst-case acceptance never corrupts
    output) and its spec_stats() show ~zero accepted drafts."""
    from videollm_online_tpu.serve.engine import LiveInferEngine

    cfg, params = setup
    tokz = LiveTokenizer(ByteTokenizer(), cfg)
    rng = np.random.RandomState(3)
    feats = rng.randn(12, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)

    def drive(**kw):
        eng = LiveInferEngine(params, tokz, cfg, kv_capacity=2048, **kw)
        eng.load_video(feats)
        eng.input_query_stream("what is happening?", video_time=0.0)
        hist = []
        for i in range(12):
            eng.input_video_stream(i / cfg.frame_fps)
            while True:
                q, r = eng()
                if r is None:
                    break
                hist.append((q, r))
        hist.extend(eng.flush())
        return eng, hist

    g_eng, g_hist = drive(spec_decode=False)
    z_eng, z_hist = drive(spec_decode=True, spec_draft_mode="zero")
    assert z_hist == g_hist
    steps, emitted = (int(x) for x in z_eng.spec_stats())
    assert steps > 0 and emitted > 0
    # acceptance ~0: tokens/step stays within noise of 1.0 (a zero draft
    # can occasionally match the true greedy token)
    assert emitted / steps < 1.35


def test_spec_auto_backoff_switches_to_greedy(setup):
    """maybe_backoff_spec: under adversarial acceptance the engine backs
    off to plain greedy (spec_decode False), keeps serving, and the full
    transcript (before + after the switch) still equals the pure-greedy
    engine's."""
    from videollm_online_tpu.serve.engine import LiveInferEngine

    cfg, params = setup
    tokz = LiveTokenizer(ByteTokenizer(), cfg)
    rng = np.random.RandomState(4)
    feats = rng.randn(16, cfg.frame_num_tokens,
                      cfg.vision_hidden_size).astype(np.float32)

    def drive(eng, backoff_at=None):
        eng.load_video(feats)
        eng.input_query_stream("what is happening?", video_time=0.0)
        eng.input_query_stream("and now?", video_time=4.0)
        hist = []
        for i in range(16):
            eng.input_video_stream(i / cfg.frame_fps)
            while True:
                q, r = eng()
                if r is None:
                    break
                hist.append((q, r))
            if backoff_at is not None and i == backoff_at:
                backed, drained = eng.maybe_backoff_spec(min_steps=1)
                hist.extend(drained)
                assert backed and not eng.spec_decode
        hist.extend(eng.flush())
        return hist

    g_hist = drive(LiveInferEngine(params, tokz, cfg, kv_capacity=4096,
                                   spec_decode=False))
    z_eng = LiveInferEngine(params, tokz, cfg, kv_capacity=4096,
                            spec_decode=True, spec_draft_mode="zero")
    z_hist = drive(z_eng, backoff_at=8)
    assert z_hist == g_hist
    # below-threshold acceptance never re-arms; a second call is a no-op
    assert z_eng.maybe_backoff_spec() == (False, [])


def test_spec_auto_backoff_multistream(setup):
    """MultiStreamEngine.maybe_backoff_spec: adversarial acceptance across
    the batch switches the whole engine to greedy programs mid-run
    (in-flight pipelined ticks resolved first); per-stream transcripts
    before + after the switch equal the pure-greedy engine's."""
    from videollm_online_tpu.serve.multistream import MultiStreamEngine

    cfg, params = setup
    tokz = LiveTokenizer(ByteTokenizer(), cfg)
    rng = np.random.RandomState(11)
    N, n_frames = 2, 16
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]

    def drive(ms, backoff_at=None):
        for i in range(N):
            ms.input_frames(i, 0.0, feats[i])
            ms.input_query(i, "what now?", video_time=1.5)
            ms.input_query(i, "and then?", video_time=5.0)
        for t in range(64):
            ms.step()
            if backoff_at is not None and t == backoff_at:
                assert ms.maybe_backoff_spec(min_steps=1)
                assert not ms.spec_decode
            if not ms.pending():
                break
        ms.flush()
        return ms.transcripts

    g = drive(MultiStreamEngine(params, tokz, cfg, num_streams=N,
                                kv_capacity=4096, chunk_frames=4,
                                pipelined=True, pipeline_depth=2,
                                spec_decode=False))
    z_ms = MultiStreamEngine(params, tokz, cfg, num_streams=N,
                             kv_capacity=4096, chunk_frames=4,
                             pipelined=True, pipeline_depth=2,
                             spec_decode=True, spec_draft_mode="zero")
    z = drive(z_ms, backoff_at=3)
    assert z == g
    assert sum(len(t) for t in g) >= 4
    # a second call is a no-op once backed off
    assert z_ms.maybe_backoff_spec() is False


def test_spec_forced_replay_emits_script(setup):
    """forced_ids replay (models/generate.py): the emitted stream IS the
    script (up to its first EOS), regardless of what the model would
    argmax; stats still count real verify steps; acceptance reflects how
    well n-gram drafting predicts the SCRIPT."""
    cfg, params = setup
    eos = cfg.eos_token_id
    max_new = 16
    script = np.full((max_new,), eos, np.int32)
    body = [72, 101, 32, 72, 101, 32, 72, 101, 32, 72]  # "He He He H"-ish
    script[:len(body)] = body
    cache = llama.init_kv_cache(cfg.llama, batch=1, capacity=256)
    hist, hc = _fresh_hist()
    ids = [5, 6, 7]
    out, length, cache, hist, hc, stats = gen.ngram_speculative_generate(
        params, cfg, cache, _emb(params, cfg, ids),
        jnp.asarray([len(ids)], jnp.int32), hist, hc,
        prompt_ids=jnp.asarray(ids, jnp.int32),
        prompt_n=jnp.asarray(len(ids), jnp.int32),
        max_new_tokens=max_new,
        forced_ids=jnp.asarray(script, jnp.int32))
    out, n = np.asarray(out)[0], int(length[0])
    # emitted = script truncated at (and including) its first EOS
    want = list(body) + [eos]
    assert n == len(want)
    np.testing.assert_array_equal(out[:n], want)
    steps, emitted = int(stats[0]), int(stats[1])
    assert emitted == n and steps >= 1
    # the repeated "He " trigrams must draft-accept: fewer steps than tokens
    assert steps < emitted, (steps, emitted)
    # cache invariant: prompt + emitted-1 entries (same as greedy)
    assert int(cache.offset[0]) == len(ids) + n - 1


def test_engine_spec_forced_script_transcripts(setup):
    """LiveInferEngine(spec_forced_script=...): every response turn emits
    the next script row verbatim (cycling), across the fused multi-respond
    AND pipelined dispatch paths (the bench headline configuration); the
    device-side cursor (sstats[2]) needs no host sync."""
    cfg, tok, params = _setup(threshold=0.725, seed=2)
    cfg = cfg.replace(gate_logit_bias=30.0, max_response_tokens=24)
    eos = cfg.eos_token_id
    texts = ["You look around.", "You pick up the knife.",
             "You stir the bowl."]
    script = np.full((3, 24), eos, np.int32)
    for r, s in enumerate(texts):
        ids = list(tok.encode(s))[:23]
        script[r, :len(ids)] = ids
    n_frames = 24
    feats = np.random.RandomState(3).randn(
        n_frames, cfg.frame_num_tokens,
        cfg.vision_hidden_size).astype(np.float32)
    queries = [(t, "narrate?") for t in (0.5, 3.5, 6.5, 9.5)]
    for pipelined in (False, True):
        eng = LiveInferEngine(params, tok, cfg, kv_capacity=4096,
                              spec_decode=True, spec_forced_script=script,
                              pipelined=pipelined)
        transcript = _run_engine(eng, cfg, feats,
                                 [i * 0.5 for i in range(n_frames)], queries)
        resps = [r.split("Assistant:", 1)[1] for _, r in transcript]
        assert len(resps) >= 4
        for k, r in enumerate(resps):
            assert r == texts[k % 3], (pipelined, k, r)
        steps, emitted = (int(x) for x in eng.spec_stats())
        assert steps >= 1 and emitted >= len(resps)
        assert int(np.asarray(eng._sstats)[2]) == len(resps)
