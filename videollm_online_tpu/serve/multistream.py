"""Batched multi-stream serving: N concurrent video dialogues, one model.

BASELINE.json config #4 ("8B batched serving: 8 concurrent streams with
paged KV cache"). The reference engine is strictly single-stream
(demo/inference.py); here the static KV ring already carries per-stream
offsets, so batching is native:

  * ``frame_step``: one jitted dispatch appends [prepend, frame tokens] for
    every ACTIVE stream simultaneously (inactive streams append 0 valid
    tokens — their ring offsets don't advance and stale writes are
    overwritten later), then evaluates every gate;
  * ``respond``: one jitted greedy while_loop decodes all fired streams in
    parallel with a per-stream done mask; non-fired streams are inert.

Per-stream conversation state (queues, prepends, transcripts) lives on host;
device work is always batch-(N) shaped."""

from __future__ import annotations

import collections
import functools
import time as _time
from typing import Any, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import LiveConfig
from ..models import generate as gen_mod
from ..models import llama, live
from ..tokenizer.live_tokenizer import LiveTokenizer
from .engine import _FrameRef, _contiguous_ref_run, _frame_row

TEXT_BUCKET = 4
PROMPT_BUCKET = 128


CHUNK_FRAMES = 8

# response turns per stream per fused tick (gen fires + the end-of-burst
# query share these slots; a fire beyond them stops the stream's tick and
# the host fallback path finishes it). 2 covers the realistic profile of
# <= 1 gate fire per 8-frame chunk plus one query.
R_TICK = 2


@functools.partial(jax.jit, static_argnums=(2,))
def _gather_k(srcs, starts, K: int):
    """(N, T+K, fnt, D) K-zero-padded sources (input_frames pads once at
    enqueue — re-padding the whole source set here would copy ~T/K times
    the bytes actually gathered) + per-stream starts -> (N, K, fnt, D)
    f32. The pad guarantees the slice never clamps for starts <= T (a
    clamped dynamic_slice would silently misalign the burst)."""
    def one(src, i0):
        return jax.lax.dynamic_slice(
            src, (i0, 0, 0), (K,) + src.shape[1:])

    return jax.vmap(one)(srcs, starts).astype(jnp.float32)


class MultiStreamEngine:
    def __init__(self, params, tokenizer: LiveTokenizer,
                 cfg: Optional[LiveConfig] = None, *, num_streams: int = 8,
                 kv_capacity: int = 8192, frame_fps: Optional[float] = None,
                 max_new_tokens: Optional[int] = None, attn_impl=None,
                 chunk_frames: int = CHUNK_FRAMES,
                 stream_window: Optional[int] = None,
                 fused: bool = True, pipelined: bool = False,
                 pipeline_depth: int = 2,
                 kv_quant: Optional[str] = None,
                 spec_decode: bool = False,
                 spec_draft: Optional[int] = None,
                 spec_draft_mode: str = "ngram",
                 stream_tokens: Optional[int] = None,
                 on_delta=None,
                 paged=None, page_size: int = 512,
                 pool_pages: Optional[int] = None,
                 prefix_cache: bool = True,
                 vision_params=None,
                 max_lag_frames: Optional[int] = None):
        # fused: whole tick (ingest + inline responses) as one dispatch;
        # pipelined: additionally chain tick i+1 through the device-resident
        # prepend before reading tick i (speculative full consumption,
        # rolled back on a response-slot overflow or deferred query)
        # kv_quant="int8": int8 KV ring (see LiveInferEngine) — at batched
        # capacity 8192 x N streams this halves the dominant HBM allocation
        # spec_decode: n-gram speculative decoding inside every response
        # turn (models/generate.py, batched): per-stream token-history
        # rings draft K tokens each; ONE verify forward emits 1+accepted
        # greedy-exact tokens per stream per weight-streaming pass.
        # Transcripts are byte-identical to greedy by construction.
        # paged: shared KV page pool + per-stream page tables
        # (models/llama.PagedKVCache, BASELINE config #4). kv_capacity
        # stays the PER-STREAM logical capacity; pool_pages bounds the
        # PHYSICAL pool (default: full parity with the ring, i.e.
        # N * ceil(capacity/page) + trash). Passing fewer pool pages is
        # the point: streams share physical memory by actual usage, and
        # stream_window compaction FREES pages host-side instead of
        # rolling the ring on device.
        # kv_quant composes with paged: int8 code pools + paged fp32 scale
        # pools (models/llama.PagedKVCache quantized mode) — the memory
        # win multiplies (pool sized by usage AND half-byte slots).
        #
        # paged=None (default) resolves automatically: paged is ALSO the
        # fast layout at B>1 — the batched ring's per-stream
        # dynamic_update_slice append chain on (L, B, Hkv, C, hd) stops
        # aliasing in place past a capacity threshold (measured on v5e at
        # 8B/B=8: +58 ms per 44-token forward at C=2560 vs +3 ms at
        # C=1024 over the 34.6 ms compute floor; paged stays at +10 —
        # benchmarks/ring_vs_paged_fwd.py), worth +37% aggregate FPS in
        # the fused tick at identical tick counts. The ring remains the
        # right layout when page-granular window compaction cannot keep up
        # (tight capacity: ring compaction is slot-granular), so auto
        # picks paged iff capacity fits >= 2 pages beyond any window.
        assert kv_quant in (None, "int8"), kv_quant
        self.kv_quant = kv_quant
        self.spec_decode = spec_decode
        # K = response budget - 1 capped at 19 (single-stream K study,
        # BENCH_NOTES.md): one verify forward can emit a whole predicted
        # response; past the budget drafts can never emit
        self.spec_draft = int(
            spec_draft
            or max(1, min((max_new_tokens
                           or (cfg or tokenizer.cfg).max_response_tokens)
                          - 1, 19)))
        # "zero": constant-zero drafts — the adversarial acceptance~0
        # lower bound (see LiveInferEngine / models/generate.py)
        assert spec_draft_mode in ("ngram", "zero"), spec_draft_mode
        self.spec_draft_mode = spec_draft_mode
        # prefix_cache (paged mode): automatic prefix caching for stream
        # admission — the FIRST system-prompt prefill snapshots its KV
        # pages as a refcounted template (full pages aliased, the partial
        # tail page copied once into a template-owned page); every later
        # admission with the same start ids aliases the template's full
        # pages and copies ONE tail page instead of re-running the prefill
        # forward. vLLM-style; the reference re-prefills per dialogue
        # (demo/inference.py:84 reset + a fresh torch cache). Invalidated
        # by swap_params (cached KV depends on the weights).
        if paged is None:
            need = 2 * page_size + (stream_window or 0)
            paged = kv_capacity >= need
        self.paged = paged
        self.prefix_cache = bool(prefix_cache) and self.paged
        self.page_size = page_size
        self._maxp = -(-kv_capacity // page_size)
        self.pool_pages = (pool_pages if pool_pages is not None
                           else num_streams * self._maxp + 1)
        self.fused = fused
        self.pipelined = pipelined
        self.pipeline_depth = max(1, pipeline_depth)
        self.params = params
        self.tokenizer = tokenizer
        self.cfg = cfg or tokenizer.cfg
        # infinite-stream batched serving: same contract as the
        # single-stream engine's stream_window (windowed attention + ring
        # compaction via pos_base); each stream compacts independently
        self.stream_window = stream_window
        if stream_window is not None:
            import dataclasses
            need = (stream_window + TEXT_BUCKET
                    + chunk_frames * (self.cfg.frame_num_tokens + 1)
                    + PROMPT_BUCKET
                    + (max_new_tokens or self.cfg.max_response_tokens))
            assert kv_capacity >= need, (
                f"kv_capacity {kv_capacity} too small for stream_window "
                f"{stream_window}: needs >= {need}")
            self.cfg = self.cfg.replace(llama=dataclasses.replace(
                self.cfg.llama, sliding_window=stream_window))
        # max_lag_frames: realtime backpressure — a stream whose pending
        # frame queue exceeds this sheds its OLDEST frames at the next
        # tick (live semantics: a viewer that falls behind skips forward;
        # the reference's queue grows without bound,
        # demo/inference.py:118-119). None = never drop; minimum 1 (a 0
        # would shed every frame before the tick could consume any and
        # livelock pending()-driven loops).
        assert max_lag_frames is None or max_lag_frames >= 1, max_lag_frames
        self.max_lag_frames = max_lag_frames
        self.N = num_streams
        self.kv_capacity = kv_capacity
        self.frame_fps = frame_fps or self.cfg.frame_fps
        self.fnt = self.cfg.frame_num_tokens
        self.hidden = self.cfg.llama.hidden_size
        self.max_new = max_new_tokens or self.cfg.max_response_tokens
        # stream_tokens=S: TOKEN-STREAMING batched responses (the latency
        # serving mode at N streams — the reference surfaces nothing until
        # a response completes, modeling_live.py:173-182, and its demo
        # waits out whole turns, demo/app.py:85-91). Device respond
        # budgets shrink to S tokens; a response that fills its segment
        # without EOS leaves the stream OPEN: the stream stops ingesting,
        # and each subsequent step() starts with ONE batched continuation
        # dispatch over ALL open streams (1-token prompt = the previous
        # segment's last sampled token — exactly what the unsegmented
        # decode loop feeds; spec history rings see hist_valid=0 so the
        # token is not double-logged). Partial text surfaces via
        # on_delta(stream, delta, done) after every segment; concatenated
        # segments equal the unsegmented greedy response byte-for-byte
        # (continuation exactness + spec-decode verification), so
        # transcripts and step() results are unchanged — only the latency
        # shape: first text after ~S tokens instead of the full budget,
        # and other streams' ingest interleaves between segments.
        # Blocking drivers only: pipelined dispatches speculate across
        # tick boundaries and would reorder partial surfacing.
        self.resp_budget = self.max_new
        self.stream_tokens = stream_tokens
        self.on_delta = on_delta
        if stream_tokens is not None:
            assert stream_tokens > 0, stream_tokens
            assert not pipelined, (
                "stream_tokens is a blocking-mode feature (no pipelined)")
            assert self.resp_budget % stream_tokens == 0, (
                "the response budget must be a multiple of stream_tokens "
                "for exact budget equality with the unsegmented engine")
            self.max_new = stream_tokens
            if spec_decode and spec_draft is None:
                # draft to the segment budget (K = S-1): one verify step
                # can complete a segment; drafting past it is clipped work
                self.spec_draft = (max(1, min(self.spec_draft,
                                              stream_tokens - 1))
                                   if stream_tokens > 1 else 1)
        self.chunk_frames = max(1, chunk_frames)
        if attn_impl is None:
            from ..ops.auto import auto_attention
            attn_impl = auto_attention
        self.attn_impl = attn_impl

        tok = tokenizer
        self._start_ids = list(tok.apply_chat_template(
            [{"role": "system", "content": self.cfg.system_prompt}],
            tokenize=True, add_stream_prompt=True))
        self._stream_prompt_ids = list(tok.encode("\n["))
        self._gen_prompt_ids = list(tok.encode("]\nAssistant:"))
        self._build_jitted()
        # raw-pixel ingest (BASELINE config #5 at N streams): uint8 frames
        # passed to input_frames encode through the vision tower + the
        # connector on-device, then flow into the same lazy-ref burst path
        # as pre-extracted features (single-stream engine's _embed_chunk)
        self.vision_params = vision_params
        if vision_params is not None:
            from ..models import live as live_mod
            cfg_ = self.cfg
            self._encode_bucket = jax.jit(functools.partial(
                live_mod.pixels_to_embeds, cfg=cfg_))
        self.reset()

    # ------------------------------------------------------------------ jit
    def _build_jitted(self):
        cfg = self.cfg
        lora = self.params.get("lora")
        scaling = cfg.lora.scaling if (cfg.lora is not None and lora is not None) else 1.0
        interval_id = cfg.frame_token_interval_id
        gate_id = interval_id if interval_id is not None else cfg.eos_token_id
        thr = cfg.frame_token_interval_threshold
        gate_bias = cfg.gate_logit_bias
        fnt, N = self.fnt, self.N
        max_new = self.max_new
        eos = cfg.eos_token_id

        def fwd(params, embeds, cache, num_valid, gather_pos=None):
            return llama.forward(
                params["llama"], cfg=cfg.llama, inputs_embeds=embeds,
                kv_cache=cache, num_valid=num_valid,
                lora=params.get("lora"), lora_scaling=scaling,
                attn_impl=self.attn_impl,
                logit_gather_positions=gather_pos)

        def frame_step(params, cache, text_ids, n_text, frames, active):
            """text_ids (N, TEXT_BUCKET) right-aligned; frames (N, fnt, D);
            active (N,) bool. Returns (cache, fire, next_id)."""
            t_emb = llama.embed_tokens(params["llama"], text_ids, cfg.llama)
            embeds = jnp.concatenate(
                [t_emb, frames.astype(t_emb.dtype)], axis=1)
            # roll valid-first per stream
            def roll_one(e, n):
                return jnp.roll(e, -(TEXT_BUCKET - n), axis=0)
            embeds = jax.vmap(roll_one)(embeds, n_text)
            num_valid = jnp.where(active, n_text + fnt, 0)
            gather = jnp.clip(num_valid - 1, 0, None)
            logits, cache = fwd(params, embeds, cache, num_valid, gather)
            rows = logits[:, 0].astype(jnp.float32)
            if gate_bias:
                rows = rows.at[:, gate_id].add(gate_bias)
            probs = jax.nn.softmax(rows, axis=-1)
            p_gate = probs[:, gate_id]
            masked = jnp.where((p_gate < thr)[:, None],
                               probs.at[:, gate_id].set(0.0), probs)
            next_id = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            fire = jnp.logical_and(active, next_id != gate_id)
            # one packed (3, N) readback: fire / next_id / offset
            packed = jnp.stack([fire.astype(jnp.int32), next_id,
                                cache.offset])
            return cache, packed

        use_interval = interval_id is not None
        itv = 1 if use_interval else 0
        per = fnt + itv

        def chunk_step(params, cache, text_ids, n_text, frames, n_frames,
                       active):
            """Batched catch-up ingest (same layout as the single-stream
            ingest_chunk, serve/engine.py): per ACTIVE stream, feed
            [prepend] f0 , f1 , ... (up to K frames) in ONE forward, gate at
            every frame's last token, and rewind each stream's ring offset to
            the end of its first fired frame. frames (N, K, fnt, D),
            n_frames (N,) in [0, K]. Returns (cache, consumed, fire,
            next_id) all (N,)-shaped."""
            K = frames.shape[1]
            t_emb = llama.embed_tokens(params["llama"], text_ids, cfg.llama)
            f_emb = frames.astype(t_emb.dtype)          # (N, K, fnt, D)
            D = t_emb.shape[-1]
            if use_interval:
                iv_emb = llama.embed_tokens(
                    params["llama"], jnp.asarray([[interval_id]], jnp.int32),
                    cfg.llama)[0]                        # (1, D)
                unit = jnp.concatenate(
                    [jnp.broadcast_to(iv_emb[None, None], (N, K, 1, D)),
                     f_emb], axis=2)                     # (N, K, 1+fnt, D)
                body = jnp.concatenate(
                    [f_emb[:, 0], unit[:, 1:].reshape(N, -1, D)], axis=1)
            else:
                body = f_emb.reshape(N, -1, D)
            embeds = jnp.concatenate([t_emb, body], axis=1)

            def roll_one(e, n):
                return jnp.roll(e, -(TEXT_BUCKET - n), axis=0)
            embeds = jax.vmap(roll_one)(embeds, n_text)
            valid = jnp.where(
                active,
                n_text + n_frames * fnt + jnp.maximum(n_frames - 1, 0) * itv,
                0)
            ends = (n_text[:, None] + fnt - 1
                    + jnp.arange(K, dtype=jnp.int32)[None] * per)  # (N, K)
            logits, cache = fwd(params, embeds, cache, valid,
                                gather_pos=ends)
            rows = logits.astype(jnp.float32)
            if gate_bias:
                rows = rows.at[..., gate_id].add(gate_bias)
            probs = jax.nn.softmax(rows, axis=-1)
            p_gate = probs[..., gate_id]                 # (N, K)
            masked = jnp.where((p_gate < thr)[..., None],
                               probs.at[..., gate_id].set(0.0), probs)
            next_ids = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            in_range = jnp.arange(K)[None] < n_frames[:, None]
            fires = jnp.logical_and(
                jnp.logical_and(next_ids != gate_id, in_range),
                active[:, None])
            any_fire = fires.any(axis=1)
            first_fire = jnp.argmax(fires, axis=1)       # 0 when none
            consumed = jnp.where(any_fire, first_fire + 1, n_frames)
            consumed = jnp.where(active, consumed, 0)
            consumed_tokens = jnp.where(
                active,
                n_text + consumed * fnt + jnp.maximum(consumed - 1, 0) * itv,
                0)
            base = cache.offset - valid                  # offsets pre-append
            cache = cache._replace(offset=base + consumed_tokens)
            last = jnp.clip(consumed - 1, 0, K - 1)
            # one packed (4, N) readback
            packed = jnp.stack([consumed, any_fire.astype(jnp.int32),
                                next_ids[jnp.arange(N), last], cache.offset])
            return cache, packed

        sp_ids = self._stream_prompt_ids
        R = R_TICK
        streaming = self.stream_tokens is not None

        def _respond_core(params, cache, prompt_ids, num_valid, active):
            """Batched greedy decode body shared by the standalone respond
            dispatch and the fused tick. Returns (out, lengths, cache)."""
            p_emb = llama.embed_tokens(params["llama"], prompt_ids,
                                       cfg.llama)

            def roll_one(e, n):
                return jnp.roll(e, -(prompt_ids.shape[1] - n), axis=0)

            p_emb = jax.vmap(roll_one)(p_emb, num_valid)
            nv = jnp.where(active, num_valid, 0)
            gather = jnp.clip(nv - 1, 0, None)
            logits, cache = fwd(params, p_emb, cache, nv, gather)
            first = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            out = jnp.zeros((N, max_new), jnp.int32).at[:, 0].set(first)
            done = jnp.logical_or(jnp.logical_not(active), first == eos)
            lengths = jnp.where(active, 1, 0)

            def rcond(st):
                i, _, _, done, _ = st
                return jnp.logical_and(i < max_new,
                                       jnp.logical_not(done.all()))

            def rbody(st):
                i, out, cache, done, lengths = st
                tok = out[jnp.arange(N), i - 1]
                emb = llama.embed_tokens(params["llama"], tok[:, None],
                                         cfg.llama)
                feed = jnp.logical_not(done).astype(jnp.int32)
                logits, cache = fwd(params, emb, cache, feed,
                                    jnp.zeros((N,), jnp.int32))
                nxt = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
                nxt = jnp.where(done, eos, nxt)
                out = out.at[:, i].set(nxt)
                lengths = jnp.where(done, lengths, i + 1)
                done = jnp.logical_or(done, nxt == eos)
                return i + 1, out, cache, done, lengths

            _, out, cache, _, lengths = jax.lax.while_loop(
                rcond, rbody, (jnp.asarray(1), out, cache, done, lengths))
            return out, lengths, cache

        spec_on = self.spec_decode
        Ksp = self.spec_draft

        def _respond_core_spec(params, cache, prompt_ids, num_valid, active,
                               hist, hcount, stats, hist_nv=None):
            """Batched n-gram speculative decode: the greedy core's exact
            output token streams (per-stream verification), up to
            ``Ksp + 1`` tokens per stream per forward. hist (N, H) /
            hcount (N,) are the per-stream history rings; stats (2,)
            accumulates [verify_steps, emitted] across all streams.
            ``hist_nv`` ((N,), traced) overrides how many prompt tokens
            feed the history rings — 0 for token-streaming continuation
            segments, whose 1-token prompt is already in the ring as the
            previous segment's last emitted token."""
            P = prompt_ids.shape[1]
            p_emb = llama.embed_tokens(params["llama"], prompt_ids,
                                       cfg.llama)

            def roll_one(e, n):
                return jnp.roll(e, -(P - n), axis=0)

            p_emb = jax.vmap(roll_one)(p_emb, num_valid)
            nv = jnp.where(active, num_valid, 0)
            # prompt ids feed the history rings (valid-first per row)
            ids_vf = jax.vmap(lambda row, n: jnp.roll(row, -(P - n)))(
                prompt_ids, num_valid)
            hn = nv if hist_nv is None else jnp.where(active, hist_nv, 0)
            hist, hcount = jax.vmap(gen_mod.hist_append_ids)(
                hist, hcount, ids_vf, hn)
            gather = jnp.clip(nv - 1, 0, None)
            logits, cache = fwd(params, p_emb, cache, nv, gather)
            first = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)
            out = jnp.zeros((N, max_new), jnp.int32).at[:, 0].set(first)
            done = jnp.logical_or(jnp.logical_not(active), first == eos)
            lengths = jnp.where(active, 1, 0)
            hist, hcount = jax.vmap(gen_mod.hist_append_ids)(
                hist, hcount, first[:, None],
                jnp.where(active, 1, 0).astype(jnp.int32))
            nact = active.sum().astype(jnp.int32)
            stats = stats + jnp.stack([nact, nact])
            rows = jnp.arange(N)
            i_n = jnp.where(active, 1, 0)

            def rcond(st):
                done = st[3]
                return jnp.logical_not(done.all())

            def rbody(st):
                (i_n, out, cache, done, lengths, hist, hcount, stats) = st
                prev = out[rows, jnp.clip(i_n - 1, 0, max_new - 1)]
                if self.spec_draft_mode == "zero":
                    drafts = jnp.zeros((N, Ksp), jnp.int32)
                else:
                    drafts = jax.vmap(
                        lambda h, c: gen_mod._ngram_draft(h, c, Ksp))(
                        hist, hcount)                    # (N, Ksp)
                toks = jnp.concatenate([prev[:, None], drafts], axis=1)
                emb = llama.embed_tokens(params["llama"], toks, cfg.llama)
                off0 = cache.offset
                feed = jnp.where(done, 0, Ksp + 1).astype(jnp.int32)
                gpos = jnp.broadcast_to(
                    jnp.arange(Ksp + 1, dtype=jnp.int32)[None],
                    (N, Ksp + 1))
                logits, cache = fwd(params, emb, cache, feed, gpos)
                preds = jnp.argmax(logits, axis=-1).astype(jnp.int32)
                karr = jnp.arange(Ksp, dtype=jnp.int32)
                mism = preds[:, :Ksp] != drafts
                a = jnp.min(jnp.where(mism, karr[None], Ksp), axis=1)
                emit = a + 1                             # accepted + 1
                kk = jnp.arange(Ksp + 1, dtype=jnp.int32)
                is_eos = jnp.logical_and(preds == eos,
                                         kk[None] < emit[:, None])
                e_idx = jnp.min(jnp.where(is_eos, kk[None], Ksp + 1),
                                axis=1)
                hit_eos = e_idx <= Ksp
                emit = jnp.where(hit_eos, e_idx + 1, emit)
                emit = jnp.minimum(emit, max_new - i_n)  # budget clip
                emit = jnp.where(done, 0, emit)
                # conflict-free gather/select write of each stream's
                # [i_n, i_n+emit) window (scatter order is unspecified)
                idx = jnp.arange(max_new, dtype=jnp.int32)[None]
                rel = idx - i_n[:, None]
                inwin = jnp.logical_and(rel >= 0, rel < emit[:, None])
                vals = jnp.take_along_axis(preds, jnp.clip(rel, 0, Ksp),
                                           axis=1)
                out = jnp.where(inwin, vals, out)
                hist, hcount = jax.vmap(gen_mod.hist_append_ids)(
                    hist, hcount, preds, emit)
                # rewind: keep `emit` KV entries per stream (the newest
                # emitted token's KV stays out of the cache — same
                # invariant as the greedy core)
                cache = cache._replace(offset=off0 + emit)
                lengths = jnp.where(done, lengths, i_n + emit)
                stats = stats + jnp.stack([
                    jnp.logical_not(done).sum().astype(jnp.int32),
                    emit.sum().astype(jnp.int32)])
                done = jnp.logical_or(done, jnp.logical_or(
                    hit_eos, i_n + emit >= max_new))
                return (i_n + emit, out, cache, done, lengths, hist,
                        hcount, stats)

            (_, out, cache, _, lengths, hist, hcount, stats) = \
                jax.lax.while_loop(
                    rcond, rbody,
                    (i_n, out, cache, done, lengths, hist, hcount, stats))
            return out, lengths, cache, hist, hcount, stats

        def _respond_any(params, cache, prompt_ids, num_valid, active,
                         hist, hcount, stats, hist_nv=None):
            """Greedy or speculative batched respond; the spec state is a
            pass-through when spec_decode is off (trace-time switch)."""
            if spec_on:
                return _respond_core_spec(params, cache, prompt_ids,
                                          num_valid, active, hist, hcount,
                                          stats, hist_nv)
            out, lengths, cache = _respond_core(params, cache, prompt_ids,
                                                num_valid, active)
            return out, lengths, cache, hist, hcount, stats

        def respond(params, cache, prompt_ids, num_valid, active,
                    hist, hcount, stats, hist_valid):
            """Batched decode for the ACTIVE streams (standalone dispatch:
            the unfused path, the stop_fire fallback, and token-streaming
            continuation segments — the latter pass ``hist_valid`` = 0 so
            the 1-token continuation prompt is not double-logged in the
            spec history rings). One packed (N, 2 + max_new) readback:
            [len, offset, ids...]."""
            out, lengths, cache, hist, hcount, stats = _respond_any(
                params, cache, prompt_ids, num_valid, active, hist, hcount,
                stats, hist_valid)
            packed = jnp.concatenate(
                [lengths[:, None], cache.offset[:, None], out], axis=1)
            return packed, cache, hist, hcount, stats

        def _chunk_core(params, cache, pre_text, pre_n, frames, starts,
                        k_i):
            """One gated chunk pass over per-stream frame windows
            [starts, starts+k_i) of the padded operand. Returns (cache,
            fired, first_fire, next_at_last, adv)."""
            K = self.chunk_frames
            win = jax.vmap(lambda src, i0: jax.lax.dynamic_slice(
                src, (i0, 0, 0), (K,) + src.shape[1:]))(frames, starts)
            t_emb = llama.embed_tokens(params["llama"], pre_text, cfg.llama)
            f_emb = win.astype(t_emb.dtype)
            D = t_emb.shape[-1]
            if use_interval:
                iv_emb = llama.embed_tokens(
                    params["llama"], jnp.asarray([[interval_id]], jnp.int32),
                    cfg.llama)[0]
                unit = jnp.concatenate(
                    [jnp.broadcast_to(iv_emb[None, None], (N, K, 1, D)),
                     f_emb], axis=2)
                body = jnp.concatenate(
                    [f_emb[:, 0], unit[:, 1:].reshape(N, -1, D)], axis=1)
            else:
                body = f_emb.reshape(N, -1, D)
            embeds = jnp.concatenate([t_emb, body], axis=1)

            def roll_one(e, n):
                return jnp.roll(e, -(TEXT_BUCKET - n), axis=0)

            embeds = jax.vmap(roll_one)(embeds, pre_n)
            valid = jnp.where(
                k_i > 0,
                pre_n + k_i * fnt + jnp.maximum(k_i - 1, 0) * itv, 0)
            ends = (pre_n[:, None] + fnt - 1
                    + jnp.arange(K, dtype=jnp.int32)[None] * per)
            logits, cache = fwd(params, embeds, cache, valid,
                                gather_pos=ends)
            rows = logits.astype(jnp.float32)
            if gate_bias:
                rows = rows.at[..., gate_id].add(gate_bias)
            probs = jax.nn.softmax(rows, axis=-1)
            p_gate = probs[..., gate_id]
            masked = jnp.where((p_gate < thr)[..., None],
                               probs.at[..., gate_id].set(0.0), probs)
            next_ids = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            in_range = jnp.arange(K)[None] < k_i[:, None]
            fires = jnp.logical_and(next_ids != gate_id, in_range)
            any_fire = fires.any(axis=1)
            first_fire = jnp.argmax(fires, axis=1)
            adv = jnp.where(any_fire, first_fire + 1, k_i)
            adv_tokens = jnp.where(
                k_i > 0,
                pre_n + adv * fnt + jnp.maximum(adv - 1, 0) * itv, 0)
            base = cache.offset - valid
            cache = cache._replace(offset=base + adv_tokens)
            last = jnp.clip(adv - 1, 0, K - 1)
            next_at_last = next_ids[jnp.arange(N), last]
            return cache, any_fire, first_fire, next_at_last, adv

        def tick(params, cache, text_ids, n_text, frames, meta,
                 q_ids, q_nv, g_ids, g_nv, hist, hcount, stats):
            """FUSED tick: the whole scheduler tick — gated chunk ingest,
            up to R_TICK inline response turns per stream (gate fires use
            the gen prompt; the end-of-burst query uses the per-stream
            query prompt), and the post-response / post-gate prepend
            carried in device registers — as ONE dispatch with ONE packed
            readback. The batched analog of the single-stream
            ingest_stream (serve/engine.py). A gate fire with no response
            slot left sets stop_fire and freezes that stream (host
            fallback resolves it); consumption then < n_frames and the
            driver re-queues (blocking) or rolls back (pipelined).

            Query arbitration mirrors the blocking host rules exactly:
            ``qae_ge`` = the burst's last frame reaches the query time
            (query OUTRANKS a gate fire at that frame); ``qae_after`` =
            the query falls strictly between this burst and the next
            queued frame (answered after catch-up UNLESS the gate fired
            at the final frame, in which case the gen response wins and
            the query defers to the next tick); ``force`` = respond-only
            stream (its next frame lies beyond the query).

            ``meta`` (N, 5) i32 packs [n_frames, active, qae_ge,
            qae_after, force] — ONE host->device upload per tick instead
            of five (each ~10-26 ms dispatch latency on the tunnel).

            Readback layout per stream (i32):
              [consumed, offset, pre_n, pre_text*TB, n_resp, stop_fire,
               answered, (kind, fidx, len)*R, ids*R*max_new]"""
            K = self.chunk_frames
            n_frames = meta[:, 0]
            active = meta[:, 1] > 0
            qae_ge = meta[:, 2] > 0
            qae_after = meta[:, 3] > 0
            force = meta[:, 4] > 0

            def prep_after(pre_text, pre_n, out_row, length):
                """Post-response prepend: [eos]+stream_prompt on EOS, else
                the last sampled token (host lines in step())."""
                last_tok = out_row[jnp.clip(length - 1, 0, max_new - 1)]
                pt_eos = jnp.zeros((TEXT_BUCKET,), jnp.int32)
                ids_eos = [eos] + sp_ids
                for o, tokv in enumerate(ids_eos):
                    pt_eos = pt_eos.at[TEXT_BUCKET - len(ids_eos) + o].set(
                        tokv)
                pt_last = jnp.zeros((TEXT_BUCKET,), jnp.int32) \
                    .at[TEXT_BUCKET - 1].set(last_tok)
                is_eos = last_tok == eos
                pt = jnp.where(is_eos, pt_eos, pt_last)
                pn = jnp.where(is_eos, len(ids_eos), 1)
                return pt, pn

            def pend_q_of(answered, stop, defer_q):
                return jnp.logical_and(
                    jnp.logical_or(jnp.logical_or(qae_ge, qae_after),
                                   force),
                    jnp.logical_and(
                        jnp.logical_not(answered),
                        jnp.logical_and(jnp.logical_not(stop),
                                        jnp.logical_not(defer_q))))

            def body(st):
                (cache, consumed, n_resp, answered, stop, defer_q,
                 pre_text, pre_n, stop_fire, out, olen, okind,
                 ofidx, hist, hcount, stats) = st
                k_i = jnp.clip(n_frames - consumed, 0, K)
                k_i = jnp.where(jnp.logical_or(stop, ~active), 0, k_i)
                # skip the whole-weights chunk pass when no stream has
                # frames this iteration (the final query-respond iteration)
                cache, fired, _ff, next_id, adv = jax.lax.cond(
                    (k_i > 0).any(),
                    lambda c: _chunk_core(params, c, pre_text, pre_n,
                                          frames, consumed, k_i),
                    lambda c: (c, jnp.zeros((N,), bool),
                               jnp.zeros((N,), jnp.int32),
                               jnp.zeros((N,), jnp.int32),
                               jnp.zeros((N,), jnp.int32)),
                    cache)
                consumed = consumed + adv
                at_end = consumed >= n_frames
                # gate-held prepend (overwritten below on a response)
                held = jnp.logical_and(adv > 0, jnp.logical_not(fired))
                if use_interval:
                    pt_gate = jnp.zeros((N, TEXT_BUCKET), jnp.int32) \
                        .at[:, TEXT_BUCKET - 1].set(next_id)
                    pre_text = jnp.where(held[:, None], pt_gate, pre_text)
                    pre_n = jnp.where(held, 1, pre_n)
                else:
                    pre_text = jnp.where(held[:, None], 0, pre_text)
                    pre_n = jnp.where(held, 0, pre_n)
                pre_n = jnp.where(jnp.logical_and(adv > 0, fired), 0, pre_n)

                # a gate fire at the FINAL frame wins over a strictly-later
                # query (qae_after): the query defers to the next tick
                defer_q = jnp.logical_or(defer_q, jnp.logical_and(
                    jnp.logical_and(fired, at_end),
                    jnp.logical_and(qae_after,
                                    jnp.logical_not(qae_ge))))
                slots = n_resp < R
                want_q = jnp.logical_and(
                    pend_q_of(answered, stop, defer_q), at_end)
                do_gen = jnp.logical_and(fired, jnp.logical_not(want_q))
                do_resp = jnp.logical_and(jnp.logical_or(do_gen, want_q),
                                          jnp.logical_and(slots, ~stop))
                # out of slots: a pure gate fire needs the host's gen
                # fallback (stop_fire); a slot-starved QUERY turn instead
                # just freezes the stream — the query stays unanswered and
                # answers on the NEXT tick (force/qae path). Routing want_q
                # through the gen fallback would fabricate a gen response
                # the single-stream semantics DROP when a query sits at the
                # fired frame's time (engine._stream_until_trigger,
                # reference demo/inference.py:72-74 before :76-81).
                new_stop_fire = jnp.logical_and(do_gen,
                                                jnp.logical_not(slots))
                new_stop_q = jnp.logical_and(want_q, jnp.logical_not(slots))
                stop_fire = jnp.logical_or(stop_fire, new_stop_fire)
                stop = jnp.logical_or(
                    stop, jnp.logical_or(new_stop_fire, new_stop_q))

                use_q = jnp.logical_and(do_resp, want_q)
                sel_ids = jnp.where(use_q[:, None], q_ids, g_ids)
                sel_nv = jnp.where(use_q, q_nv, g_nv)
                # respond only when some stream actually fires/catches up
                rout, rlen, cache, hist, hcount, stats = jax.lax.cond(
                    do_resp.any(),
                    lambda op: _respond_any(params, op[0], sel_ids, sel_nv,
                                            do_resp, op[1], op[2], op[3]),
                    lambda op: (jnp.zeros((N, max_new), jnp.int32),
                                jnp.zeros((N,), jnp.int32), op[0], op[1],
                                op[2], op[3]),
                    (cache, hist, hcount, stats))
                answered = jnp.logical_or(answered, use_q)

                slot = jnp.clip(n_resp, 0, R - 1)
                rows = jnp.arange(N)
                out = out.at[rows, slot].set(
                    jnp.where(do_resp[:, None], rout, out[rows, slot]))
                olen = olen.at[rows, slot].set(
                    jnp.where(do_resp, rlen, olen[rows, slot]))
                okind = okind.at[rows, slot].set(
                    jnp.where(do_resp, use_q.astype(jnp.int32),
                              okind[rows, slot]))
                ofidx = ofidx.at[rows, slot].set(
                    jnp.where(do_resp, jnp.clip(consumed - 1, 0, None),
                              ofidx[rows, slot]))
                n_resp = n_resp + do_resp.astype(jnp.int32)

                pt_r, pn_r = jax.vmap(prep_after)(
                    pre_text, pre_n, rout, rlen)
                pre_text = jnp.where(do_resp[:, None], pt_r, pre_text)
                pre_n = jnp.where(do_resp, pn_r, pre_n)
                if streaming:
                    # token streaming: a response that filled its S-token
                    # segment without EOS is UNFINISHED — freeze the
                    # stream's tick (no further ingest; unconsumed frames
                    # re-queue via the short path) so the host can chain
                    # continuation segments. prep_after already installed
                    # [last_tok] — exactly the continuation prompt.
                    last_r = rout[rows, jnp.clip(rlen - 1, 0, max_new - 1)]
                    unfin = jnp.logical_and(do_resp, jnp.logical_and(
                        rlen == max_new, last_r != eos))
                    stop = jnp.logical_or(stop, unfin)
                return (cache, consumed, n_resp, answered, stop, defer_q,
                        pre_text, pre_n, stop_fire, out, olen, okind,
                        ofidx, hist, hcount, stats)

            def cond_full(st):
                (cache, consumed, n_resp, answered, stop, defer_q,
                 *_r) = st
                live = jnp.logical_and(consumed < n_frames,
                                       jnp.logical_not(stop))
                live = jnp.logical_and(live, active)
                return jnp.logical_or(
                    live.any(), pend_q_of(answered, stop, defer_q).any())

            stop0 = jnp.logical_and(jnp.logical_not(active),
                                    jnp.logical_not(force))
            st0 = (cache, jnp.zeros((N,), jnp.int32),
                   jnp.zeros((N,), jnp.int32), jnp.zeros((N,), bool),
                   stop0, jnp.zeros((N,), bool), text_ids, n_text,
                   jnp.zeros((N,), bool),
                   jnp.zeros((N, R, max_new), jnp.int32),
                   jnp.zeros((N, R), jnp.int32),
                   jnp.zeros((N, R), jnp.int32),
                   jnp.zeros((N, R), jnp.int32), hist, hcount, stats)
            (cache, consumed, n_resp, answered, _stop, _defer, pre_text,
             pre_n, stop_fire, out, olen, okind,
             ofidx, hist, hcount, stats) = jax.lax.while_loop(
                 cond_full, body, st0)
            packed = jnp.concatenate([
                consumed[:, None], cache.offset[:, None], pre_n[:, None],
                pre_text, n_resp[:, None],
                stop_fire.astype(jnp.int32)[:, None],
                answered.astype(jnp.int32)[:, None],
                okind.reshape(N, R), ofidx.reshape(N, R),
                olen.reshape(N, R), out.reshape(N, R * max_new)], axis=1)
            return cache, packed, pre_text, pre_n, hist, hcount, stats

        def prefill(params, cache, ids, nv, active):
            embeds = llama.embed_tokens(params["llama"], ids, cfg.llama)
            def roll_one(e, n):
                return jnp.roll(e, -(ids.shape[1] - n), axis=0)
            embeds = jax.vmap(roll_one)(embeds, nv)
            num_valid = jnp.where(active, nv, 0)
            _, cache = fwd(params, embeds, cache, num_valid,
                           jnp.clip(num_valid - 1, 0, None))
            return cache

        self._frame_step = jax.jit(frame_step, donate_argnums=(1,))
        self._chunk_step = jax.jit(chunk_step, donate_argnums=(1,))
        self._tick = jax.jit(tick, donate_argnums=(1,))
        self._set_offsets = jax.jit(
            lambda cache, off: cache._replace(offset=off),
            donate_argnums=(0,))

        def copy_page(cache, p_new, p_old):
            # fork_stream's tail-page copy: donated, so the pools update
            # in place and only one page of HBM traffic moves
            def cp(pool):
                page = jax.lax.dynamic_slice_in_dim(pool, p_old, 1, axis=1)
                return jax.lax.dynamic_update_slice_in_dim(
                    pool, page, p_new, axis=1)
            upd = {"k": cp(cache.k), "v": cp(cache.v)}
            if cache.k_scale is not None:
                upd["k_scale"] = cp(cache.k_scale)
                upd["v_scale"] = cp(cache.v_scale)
            return cache._replace(**upd)

        self._copy_page = jax.jit(copy_page, donate_argnums=(0,))

        def copy_page_multi(cache, p_src, dsts):
            # prefix-cache admission: scatter ONE source page into M
            # destination pages (M static by dsts' shape; padding dsts
            # with the trash page 0 is junk-safe). Donated: only M pages
            # of HBM traffic move, the pools update in place.
            def cp(pool):
                page = jax.lax.dynamic_slice_in_dim(pool, p_src, 1, axis=1)

                def body(j, pl):
                    return jax.lax.dynamic_update_slice_in_dim(
                        pl, page, dsts[j], axis=1)

                return jax.lax.fori_loop(0, dsts.shape[0], body, pool)

            upd = {"k": cp(cache.k), "v": cp(cache.v)}
            if cache.k_scale is not None:
                upd["k_scale"] = cp(cache.k_scale)
                upd["v_scale"] = cp(cache.v_scale)
            return cache._replace(**upd)

        self._copy_page_multi = jax.jit(copy_page_multi, donate_argnums=(0,))

        def mask_set_offsets(cache, mask, vals):
            # per-stream offset/pos_base install for prefix-cache
            # admissions: ONLY the masked (fresh) slots change, so this is
            # safe while pipelined dispatches are in flight for sibling
            # streams (their device offsets are ahead of the host mirror —
            # the wholesale _set_offsets would clobber them)
            return cache._replace(
                offset=jnp.where(mask, vals, cache.offset),
                pos_base=jnp.where(mask, 0, cache.pos_base))

        self._mask_set_offsets = jax.jit(mask_set_offsets,
                                         donate_argnums=(0,))
        self._compact_jit = jax.jit(llama.compact_kv_cache,
                                    donate_argnums=(0,))
        self._respond = jax.jit(respond, donate_argnums=(1,))
        self._prefill = jax.jit(prefill, donate_argnums=(1,))
        self._project = jax.jit(
            lambda p, feats: live.visual_embed(p, feats, cfg))

        K = self.chunk_frames

        def project_padded(p, feats):
            flat = live.visual_embed(p, feats, cfg)
            flat = flat.reshape(-1, self.fnt, self.hidden)
            pad = jnp.zeros((K,) + flat.shape[1:], flat.dtype)
            return jnp.concatenate([flat, pad], axis=0)

        self._project_padded = jax.jit(project_padded)
        # K trailing zero rows so the fused tick's per-iteration
        # dynamic_slice (start = consumed in [0, K], length K) never clamps
        self._pad_frames = jax.jit(
            lambda f: jnp.pad(f, ((0, 0), (0, K), (0, 0), (0, 0))))

    # ---------------------------------------------------------------- state
    def reset(self):
        if self.paged:
            self.cache = llama.init_paged_kv_cache(
                self.cfg.llama, batch=self.N, pool_pages=self.pool_pages,
                pages_per_stream=self._maxp, page_size=self.page_size,
                dtype=jnp.dtype(self.cfg.llama.dtype), quant=self.kv_quant)
            # host-owned page allocator: pool page 0 is the TRASH page
            # (unallocated table entries map there, so bucket-padding junk
            # written past a stream's last real page never corrupts a
            # foreign page); pages hand out lazily in _ensure_pages.
            # _page_refs: per-physical-page refcount — fork_stream aliases
            # a dialogue's FULL pages into another slot's table, so a page
            # returns to the free list only when its last owner drops it.
            self._free_pages = list(range(self.pool_pages - 1, 0, -1))
            self._table_host = np.zeros((self.N, self._maxp), np.int32)
            self._pages_alloc = [0] * self.N
            self._pos_base_host = np.zeros((self.N,), np.int64)
            self._page_refs = np.zeros((self.pool_pages,), np.int32)
        else:
            self.cache = llama.init_kv_cache(
                self.cfg.llama, batch=self.N, capacity=self.kv_capacity,
                dtype=jnp.dtype(self.cfg.llama.dtype), quant=self.kv_quant)
        # prefix cache: start-ids tuple -> {pages, tail_page, length};
        # entries hold their own page refs (the allocator above was just
        # reinitialized, so clearing the dict leaks nothing here)
        self._prefix_entries: Dict[tuple, Dict[str, Any]] = {}
        self._prefix_hits = 0
        self.frame_queues = [collections.deque() for _ in range(self.N)]
        self.query_queues = [collections.deque() for _ in range(self.N)]
        self.prepends: List[List[int]] = [[] for _ in range(self.N)]
        self._needs_prefill = [True] * self.N
        self.transcripts: List[List[Tuple]] = [[] for _ in range(self.N)]
        # host mirror of cache.offset (guards without a tunnel readback)
        self._host_offsets = np.zeros((self.N,), np.int64)
        # fused-tick surfacing queues (step() returns one response per
        # stream per call; extras queue here FIFO)
        self._resp_out = [collections.deque() for _ in range(self.N)]
        # token-streaming: per-stream OPEN (unfinished) response state —
        # {"toks", "kind", "t", "q", "surfaced", "ttft_done"}. A stream
        # with an open response ingests nothing until its continuation
        # segments complete (exactly the unsegmented ordering: the full
        # response's KV precedes any later frame).
        self._open: List[Optional[Dict[str, Any]]] = [None] * self.N
        # pipelined mode: unresolved tick dispatches + the device-resident
        # prepend chaining the next dispatch
        self._pipe: collections.deque = collections.deque()
        self._carry = None
        self._dev_cache: Dict = {}
        # spec_decode state: per-stream token-history rings + counts +
        # accumulated [verify_steps, emitted]. Threaded through every
        # jitted program (pass-through when off), never read back on the
        # hot path. Rolled-back pipelined ticks may leave phantom tokens
        # in a ring — that only perturbs draft quality, never output
        # (verification makes transcripts greedy-exact).
        self._hist = jnp.zeros((self.N, gen_mod.SPEC_HIST), jnp.int32)
        self._hcount = jnp.zeros((self.N,), jnp.int32)
        self._sstats = jnp.zeros((2,), jnp.int32)
        from ..utils.profiling import LatencyHistogram
        self._tick_hist = LatencyHistogram(max_samples=4096)
        self._dropped = [0] * self.N
        # response-latency SLO accounting (VERDICT r3 #6): wall-clock from
        # the ARRIVAL of a response's trigger (the gate-firing frame's
        # input_frames call / the query's input_query call) to the moment
        # the response surfaces in _resp_out. Keys: ("f", video_time) /
        # ("q", video_time) — the same floats the response bookkeeping
        # reads back, so lookups are exact. Host-only; zero device work.
        self._resp_hist = LatencyHistogram(max_samples=4096)
        self._arrival: List[collections.OrderedDict] = [
            collections.OrderedDict() for _ in range(self.N)]

    # ------------------------------------------------------------------ I/O
    def input_frames(self, stream: int, video_time: float,
                     features: np.ndarray):
        """Enqueue frames for one stream, timestamped from ``video_time``
        on the fps grid. Accepts pre-extracted features
        ((T, fnt, vision_hidden)) or, when the engine was built with
        ``vision_params``, raw uint8 pixels ((T, 3, H, W)) which encode
        through the vision tower + connector on-device."""
        feats = jnp.asarray(features)
        if feats.dtype == jnp.uint8:
            assert self.vision_params is not None, (
                "raw pixel input needs vision_params")
            # encode in fixed-size buckets (one compile; the last bucket
            # zero-pads) — an unbounded whole-clip batch through the ViT
            # would OOM on a minutes-long input
            ENC = 32
            T = feats.shape[0]
            chunks = []
            for i0 in range(0, T, ENC):
                px = feats[i0:i0 + ENC]
                if px.shape[0] < ENC:
                    px = jnp.pad(px, ((0, ENC - px.shape[0]),) +
                                 ((0, 0),) * (px.ndim - 1))
                chunks.append(self._encode_bucket(
                    self.vision_params, self.params, px))
            embeds = jnp.concatenate(chunks, axis=0)[:T]
            embeds = jnp.concatenate(
                [embeds, jnp.zeros((self.chunk_frames,) + embeds.shape[1:],
                                   embeds.dtype)], axis=0)
        else:
            if feats.ndim == 2:
                feats = feats[:, None, :]
            # project AND zero-pad by chunk_frames rows in ONE dispatch:
            # the per-tick gather slices [i0, i0+K) of each source without
            # re-padding (engine.project_padded pattern)
            embeds = self._project_padded(self.params, feats)
        T = embeds.shape[0] - self.chunk_frames
        # lazy refs (engine._FrameRef): enqueueing dispatches nothing, and
        # a whole-chunk burst assembles into the (N, K, fnt, D) operand
        # with ONE stack + ONE vmapped slice in step()
        now = _time.perf_counter()
        for i in range(T):
            t = video_time + i / self.frame_fps
            self.frame_queues[stream].append((t, _FrameRef(embeds, i)))
            self._note_arrival(stream, ("f", t), now)

    def input_query(self, stream: int, query: str, video_time: float):
        self.query_queues[stream].append((video_time, query))
        self._note_arrival(stream, ("q", video_time),
                           _time.perf_counter())

    def _note_arrival(self, i: int, key, now: float):
        d = self._arrival[i]
        d[key] = now
        if len(d) > 8192:          # bound host memory on long streams
            d.popitem(last=False)

    def _record_response_latency(self, i: int, kind: str, t):
        """One response surfaced for stream ``i``, triggered by the frame
        ("f") or query ("q") at video_time ``t``: record arrival->surface
        wall latency (the per-stream SLO number, BASELINE <100 ms p50)."""
        arr = self._arrival[i].pop((kind, t), None)
        if arr is not None:
            dt = _time.perf_counter() - arr
            self._resp_hist.add("response", dt)
            self._resp_hist.add(f"response_s{i}", dt)

    # --------------------------------------------- token-streaming segments
    def _begin_open(self, i: int, kind: str, t, q: Optional[str]):
        """Open a token-streaming response for stream ``i``: the first
        segment's tokens follow via _extend_open. While open, the stream
        ingests nothing (collection skips it) — exactly the unsegmented
        ordering, where the full response's KV precedes any later frame."""
        assert self._open[i] is None, f"stream {i} already open"
        self._open[i] = {"toks": [], "kind": kind, "t": t, "q": q,
                         "surfaced": "", "ttft_done": False}
        # prepends stay UNTOUCHED: a response that completes in this very
        # absorb keeps its path's prepend handling (the fused-tick readback
        # prepend accounts for ingest PAST the response inside the same
        # dispatch); while a response stays open nothing reads prepends
        # (the stream is excluded from collection), and _finish_open
        # installs the post-response prepend when a continuation ends it.

    def _extend_open(self, i: int, toks: np.ndarray,
                     set_prepends: bool = True) -> bool:
        """Absorb one decoded segment into stream ``i``'s open response:
        surface the text delta, and finish when the segment ended short
        (EOS), hit EOS at the boundary, or exhausted the response budget
        (the single-stream _finish_or_continue predicate). Returns True
        when the response completed. ``set_prepends=False`` for fused-tick
        segments — a response COMPLETED inside the tick already had its
        prepend installed device-side (prep_after), and ingest may have
        continued past it within that very dispatch."""
        o = self._open[i]
        o["toks"].extend(int(x) for x in np.asarray(toks).tolist())
        done = (toks.size == 0
                or len(o["toks"]) >= self.resp_budget
                or int(toks.size) < self.max_new
                or int(toks[-1]) == self.cfg.eos_token_id)
        self._emit_delta(i, done)
        if done:
            self._finish_open(i, set_prepends)
        return done

    def _emit_delta(self, i: int, done: bool):
        """One segment surfaced: decode the ACCUMULATED ids and emit the
        text suffix (token-boundary-safe: a multi-token grapheme surfaces
        once complete). Fires even when the delta is empty — segments mark
        progress, and the FIRST call is the TTFT sample."""
        o = self._open[i]
        text = self.tokenizer.decode(
            np.asarray(o["toks"], np.int32), skip_special_tokens=True)
        delta = text[len(o["surfaced"]):]
        o["surfaced"] = text
        if not o["ttft_done"]:
            o["ttft_done"] = True
            # arrival->first-text (PEEK the arrival — completion pops it):
            # the per-stream TTFT SLO, keys "ttft"/"ttft_s<i>" in stats()
            arr = self._arrival[i].get((o["kind"], o["t"]))
            if arr is not None:
                dt = _time.perf_counter() - arr
                self._resp_hist.add("ttft", dt)
                self._resp_hist.add(f"ttft_s{i}", dt)
        if self.on_delta is not None:
            self.on_delta(i, delta, done)

    def _finish_open(self, i: int, set_prepends: bool):
        """Close stream ``i``'s open response: install the post-response
        prepend (standalone-respond segments only), queue the transcript
        entry (byte-identical to the unsegmented engine's), and record the
        completion latency."""
        o = self._open[i]
        self._open[i] = None
        toks = o["toks"]
        if set_prepends:
            if toks and toks[-1] == self.cfg.eos_token_id:
                self.prepends[i] = [toks[-1]] + self._stream_prompt_ids
            elif toks:
                self.prepends[i] = [toks[-1]]
        t = o["t"]
        if o["kind"] == "q":
            entry = (f"(Video Time = {t}s) User: {o['q']}",
                     f"(Video Time = {t}s) Assistant:{o['surfaced']}")
        else:
            entry = (None, f"(Video Time = {t}s) Assistant:{o['surfaced']}")
        self._record_response_latency(i, o["kind"], t)
        self._resp_out[i].append(entry)
        self.transcripts[i].append(entry)

    def _respond_segments(self):
        """ONE batched continuation dispatch over every OPEN response: the
        1-token prompt row is each stream's previous segment's last sampled
        token (exactly what the unsegmented decode loop feeds), with
        hist_valid=0 so spec history rings don't double-log it. Capacity
        for the whole response budget was reserved by each response's
        originating tick, so no guard runs here. One segment per step():
        other streams' ingest interleaves between segments."""
        mask = np.array([o is not None for o in self._open], bool)
        if not mask.any():
            return
        P = TEXT_BUCKET
        ids = np.zeros((self.N, P), np.int32)
        nv = np.zeros((self.N,), np.int32)
        for i in range(self.N):
            if self._open[i] is not None:
                ids[i, P - 1] = self._open[i]["toks"][-1]
                nv[i] = 1
        ids_d, nv_d, mask_d = self._dev_cached(
            ("cont", ids.tobytes(), mask.tobytes()),
            lambda: (jnp.asarray(ids), jnp.asarray(nv), jnp.asarray(mask)))
        hv0 = self._dev_cached(
            "hv0", lambda: jnp.zeros((self.N,), jnp.int32))
        (packed, self.cache, self._hist, self._hcount,
         self._sstats) = self._respond(
            self.params, self.cache, ids_d, nv_d, mask_d,
            self._hist, self._hcount, self._sstats, hv0)
        packed = np.asarray(packed)  # ONE readback
        for i in range(self.N):
            if self._open[i] is None:
                continue
            self._host_offsets[i] = int(packed[i, 1])
            toks = packed[i, 2:2 + int(packed[i, 0])].astype(np.int32)
            self._extend_open(i, toks)

    def spec_stats(self) -> np.ndarray:
        """[verify_steps, emitted_tokens] accumulated across all streams'
        spec_decode responses (one device readback; call off the hot
        path). Mean accepted drafts per step = tokens/steps - 1."""
        return np.asarray(self._sstats)

    def maybe_backoff_spec(self, *, min_tokens_per_step: float = 1.15,
                           min_steps: int = 64):
        """Spec-decode auto-backoff for the batched engine (see
        LiveInferEngine.maybe_backoff_spec): when measured acceptance
        across all streams makes drafting a net loss, resolve in-flight
        ticks and rebuild the programs greedy. Responses drained by the
        resolution stay queued in _resp_out and surface on later step()
        calls. Returns True when it backed off."""
        if not self.spec_decode:
            return False
        steps, emitted = (int(x) for x in self.spec_stats())
        if steps < min_steps or emitted >= min_tokens_per_step * steps:
            return False
        while self._pipe:
            self._pipe_resolve()
        self._carry = None
        self.spec_decode = False
        self._build_jitted()
        return True

    def swap_params(self, params):
        """Hot-swap model weights for ALL streams without recompiling
        (params are traced arguments of every tick program; see
        LiveInferEngine.swap_params). Resolve in-flight pipelined work
        first so no dispatch mixes two weight sets."""
        from .engine import _check_same_tree
        _check_same_tree(self.params, params)
        while self._pipe:
            self._pipe_resolve()
        self._carry = None
        # finish open token-streaming responses under the OLD weights (a
        # mid-response weight swap would split one response across two
        # models — the unsegmented engine can never be mid-response here)
        while any(o is not None for o in self._open):
            self._respond_segments()
        # cached prefix KV was computed under the OLD weights
        self._clear_prefix_cache()
        self.params = params

    def _shed_lag(self):
        """Realtime backpressure: drop each lagging stream's OLDEST queued
        frames down to ``max_lag_frames`` (host-only; never touches device
        state or frames already consumed by in-flight dispatches)."""
        lag = self.max_lag_frames
        if lag is None:
            return
        for i in range(self.N):
            q = self.frame_queues[i]
            while len(q) > lag:
                q.popleft()
                self._dropped[i] += 1

    def stats(self) -> Dict[str, Any]:
        """Serving observability snapshot (host state only — zero device
        readbacks): per-stream queue/cache occupancy + drop counts, pool
        accounting (paged), and tick-latency percentiles."""
        out = {
            "streams": [{
                "offset": int(self._host_offsets[i]),
                "queued_frames": len(self.frame_queues[i]),
                "queued_queries": len(self.query_queues[i]),
                "pending_responses": len(self._resp_out[i]),
                "transcript_len": len(self.transcripts[i]),
                "dropped_frames": self._dropped[i],
            } for i in range(self.N)],
            "ticks": self._tick_hist.summary().get("tick", {}),
            # arrival->surface wall latency per response: "response" =
            # all streams pooled, "response_s<i>" = per stream (the
            # p50/p99 SLO numbers; see _record_response_latency). With
            # stream_tokens, "ttft"/"ttft_s<i>" = arrival->FIRST-text.
            "response_latency": self._resp_hist.summary(),
            "inflight_dispatches": len(self._pipe),
            "open_responses": sum(o is not None for o in self._open),
        }
        if self.paged:
            tmpl_refs = self._template_refs()
            # unique physical pages with >=1 ref (stream table entries AND
            # template holds both count; an aliased page counts ONCE here)
            in_use = int(np.count_nonzero(self._page_refs[1:]))
            # pages whose ONLY remaining refs are template refs — after a
            # donor window-compacts (or closes) past the prefix these are
            # FULL prefix pages, not just the copied tail
            prefix_owned = int(np.count_nonzero(
                (self._page_refs > 0)
                & (self._page_refs == tmpl_refs)))
            # conservation invariants of the refcounted allocator — these
            # hold at every quiescent point, so stats() doubles as a leak
            # detector (VERDICT r3 #1). (1) a page is free XOR referenced;
            # (2) every ref is owned by exactly one table entry or one
            # template entry.
            free_set = set(self._free_pages)
            assert len(free_set) == len(self._free_pages), \
                "free list holds duplicates"
            assert in_use + len(free_set) == self.pool_pages - 1, (
                f"page leak: {in_use} in use + {len(free_set)} free "
                f"!= {self.pool_pages - 1} pool pages")
            for p in free_set:
                assert self._page_refs[p] == 0, \
                    f"page {p} free with refcount {self._page_refs[p]}"
            assert int(self._page_refs.sum()) == \
                sum(self._pages_alloc) + int(tmpl_refs.sum()), (
                "dangling refs: refcounts != table entries + template refs")
            out["pool"] = {
                "pages_total": self.pool_pages - 1,
                "pages_free": len(self._free_pages),
                "pages_in_use": in_use,
                "pages_per_stream": list(self._pages_alloc),
                "page_size": self.page_size,
                "prefix_entries": len(self._prefix_entries),
                "prefix_hits": self._prefix_hits,
                # pages the prefix templates are the SOLE owner of (copied
                # tails always; full prefix pages once no stream aliases
                # them anymore) — clearing the cache returns exactly these
                "prefix_owned_pages": prefix_owned,
                # template-OWNED tail pages (the copied partial tails)
                "prefix_tail_pages": sum(
                    1 for e in self._prefix_entries.values()
                    if e["tail_page"] is not None),
            }
        return out

    def _template_refs(self) -> np.ndarray:
        """Per-physical-page count of refs held by prefix templates (each
        entry holds one ref per full page + one on its copied tail)."""
        refs = np.zeros((self.pool_pages,), np.int32)
        for e in self._prefix_entries.values():
            for p in e["pages"]:
                refs[p] += 1
            if e["tail_page"] is not None:
                refs[e["tail_page"]] += 1
        return refs

    def _gather_chunks(self, bursts, active, K: int) -> jax.Array:
        """(N, K, fnt, D) chunk operand. Fast path: every active burst is a
        contiguous run of refs into one equally-shaped source chunk — ONE
        stack + ONE vmapped gather dispatch total, instead of N*K eager
        slices + N+1 stacks (each a tunnel dispatch). Rows gathered past a
        burst's n_frames are never valid tokens, so over-reads within the
        padded source are harmless. Fallback: per-frame materialize+stack."""
        srcs, starts = [], []
        shape = None
        fast = True
        for i in range(self.N):
            if not active[i]:
                srcs.append(None)
                starts.append(0)
                continue
            run = _contiguous_ref_run([e for _, e in bursts[i]])
            if run is None:
                fast = False
                break
            src, i0 = run
            if shape is None:
                shape = src.shape
            elif src.shape != shape:
                fast = False
                break
            srcs.append(src)
            starts.append(i0)
        if fast and shape is not None:
            dt = next(s.dtype for s in srcs if s is not None)
            zero_chunk = jnp.zeros(shape, dt)
            stacked = jnp.stack([(s if s is not None else zero_chunk)
                                 for s in srcs])
            return _gather_k(stacked, jnp.asarray(starts, jnp.int32), K)
        zero_frame = jnp.zeros((self.fnt, self.hidden), jnp.float32)
        rows = []
        for i in range(self.N):
            embs = [_frame_row(e) for _, e in bursts[i]]
            embs += [zero_frame] * (K - len(embs))
            rows.append(jnp.stack(embs))
        return jnp.stack(rows).astype(jnp.float32)

    # -------------------------------------------------------- page allocator
    def _ensure_pages(self, idxs, budget: int) -> bool:
        """Map enough pool pages that each stream in ``idxs`` can append
        ``budget`` more tokens. Uploads the table once when it changed.
        Returns False when the pool is exhausted (caller compacts or
        falls back); never touches pages of in-flight dispatches."""
        if not self.paged:
            return True
        changed = False
        for i in idxs:
            need = min(self._maxp,
                       -(-(int(self._host_offsets[i]) + budget)
                         // self.page_size))
            while self._pages_alloc[i] < need:
                if not self._free_pages:
                    if changed:
                        self.cache = self.cache._replace(
                            table=jnp.asarray(self._table_host))
                    return False
                p = self._free_pages.pop()
                self._page_refs[p] = 1
                self._table_host[i, self._pages_alloc[i]] = p
                self._pages_alloc[i] += 1
                changed = True
        if changed:
            self.cache = self.cache._replace(
                table=jnp.asarray(self._table_host))
        return True

    def _compact_paged(self):
        """Page-granular window compaction: FREE every page fully outside
        the attention window (the window MASK defines semantics — ring
        compaction keeps exactly `window` slots, paged keeps up to
        page-1 extra masked slots; transcripts are identical). Zero
        device data movement: only the table/offset/pos_base scalars
        change. Caller must have no in-flight pipelined dispatches (they
        append through the OLD table; freeing could reallocate their
        pages mid-flight)."""
        assert not self._pipe, "compact with in-flight paged dispatches"
        w = self.stream_window
        if w is None:
            return
        changed = False
        for i in range(self.N):
            off = int(self._host_offsets[i])
            d = (off - w) // self.page_size if off > w else 0
            d = min(d, self._pages_alloc[i])
            if d <= 0:
                continue
            for j in range(d):
                self._unref_page(int(self._table_host[i, j]))
            na = self._pages_alloc[i]
            self._table_host[i, :na - d] = self._table_host[i, d:na]
            self._table_host[i, na - d:] = 0
            self._pages_alloc[i] = na - d
            self._host_offsets[i] -= d * self.page_size
            self._pos_base_host[i] += d * self.page_size
            changed = True
        if changed:
            self.cache = self.cache._replace(
                table=jnp.asarray(self._table_host),
                offset=jnp.asarray(self._host_offsets.astype(np.int32)),
                pos_base=jnp.asarray(self._pos_base_host.astype(np.int32)))

    def _paged_admit(self, idxs, budget: int) -> bool:
        """Capacity pipeline for one dispatch in paged mode: per-stream
        logical guard -> page-granular compact -> page allocation.
        Returns False when the dispatch cannot proceed (caller falls
        back / raises)."""
        if not self.paged:
            return True
        over = [i for i in idxs
                if int(self._host_offsets[i]) + budget > self.kv_capacity]
        if (over or not self._ensure_pages(idxs, budget)) \
                and not self._pipe:
            self._compact_paged()
        over = [i for i in idxs
                if int(self._host_offsets[i]) + budget > self.kv_capacity]
        if not over and not self._ensure_pages(idxs, budget) \
                and self._prefix_entries:
            # pool pressure evicts the prefix cache before failing a
            # dispatch: this frees every page whose SOLE remaining owner
            # is a template — always the copied tail page (streams hold
            # private copies of it), and also full prefix pages once no
            # stream aliases them anymore (the donor compacted or closed
            # past them). No stream table references any freed page, so
            # in-flight dispatches are unaffected; pages still aliased by
            # a live stream merely drop a refcount.
            self._clear_prefix_cache()
        return not over and self._ensure_pages(idxs, budget)

    # ------------------------------------------------------------------ tick
    def _prefill_starts(self):
        """System-prompt prefill for streams that still need it, batched.

        With ``prefix_cache`` (paged mode), the first admission prefills
        normally and snapshots the resulting KV pages as a template; every
        later admission with the same start ids aliases the template's
        full pages (refcounted, zero data movement — the fork_stream
        invariant: appends only write at slots >= offset, so a shared
        full page is never rewritten) and copies one tail page, skipping
        the prefill forward entirely."""
        todo = [i for i in range(self.N) if self._needs_prefill[i]
                and self.frame_queues[i]]
        if not todo:
            return
        key = tuple(self._start_ids)
        if self.prefix_cache:
            ent = self._prefix_entries.get(key)
            if ent is not None and self._admit_from_prefix(todo, ent):
                self._prefix_hits += len(todo)
                return
        P = -(-len(self._start_ids) // PROMPT_BUCKET) * PROMPT_BUCKET
        ids = np.zeros((self.N, P), np.int32)
        nv = np.zeros((self.N,), np.int32)
        for i in todo:
            s = self._start_ids
            ids[i, P - len(s):] = s
            nv[i] = len(s)
            self._needs_prefill[i] = False
            self.prepends[i] = []
            self._host_offsets[i] += len(s)
        active = np.zeros((self.N,), bool)
        active[todo] = True
        # host offsets were already advanced above: budget 0 covers the
        # prefill tokens themselves
        if not self._paged_admit(todo, 0):
            raise RuntimeError("paged KV pool exhausted during prefill; "
                               "raise pool_pages")
        self.cache = self._prefill(self.params, self.cache, jnp.asarray(ids),
                                   jnp.asarray(nv), jnp.asarray(active))
        if self.prefix_cache and key not in self._prefix_entries:
            self._build_prefix_template(todo[0], key)

    def _build_prefix_template(self, donor: int, key: tuple) -> None:
        """Snapshot the just-prefilled ``donor``'s KV pages as the prefix
        template. Full pages are aliased (the donor's own appends never
        rewrite them); the partial tail page is copied into a
        template-owned page NOW, before the donor's first append writes
        into it. Skipped (silently) when the pool has no spare page —
        admissions then keep prefilling normally."""
        S = len(self._start_ids)
        full, r = divmod(S, self.page_size)
        tail = None
        if r:
            if not self._free_pages:
                return
            tail = self._free_pages.pop()
            self._page_refs[tail] = 1
            self.cache = self._copy_page(
                self.cache, jnp.asarray(tail, jnp.int32),
                jnp.asarray(int(self._table_host[donor, full]), jnp.int32))
        pages = [int(self._table_host[donor, j]) for j in range(full)]
        for p in pages:
            self._page_refs[p] += 1
        self._prefix_entries[key] = {
            "pages": pages, "tail_page": tail, "length": S}

    def _admit_from_prefix(self, todo, ent) -> bool:
        """Admit ``todo`` fresh slots by aliasing the cached prefix pages:
        refcount-bump the template's full pages into each slot's table,
        give each slot a private copy of the template's partial tail page
        (one batched jitted scatter — M pages of HBM traffic instead of a
        weight-streaming prefill forward), and install offsets with a
        masked update (safe with in-flight pipelined dispatches: only the
        fresh slots' rows change, and no in-flight dispatch involves a
        slot that still needed prefill). Returns False to fall back to a
        normal prefill when the pool cannot cover the tail pages."""
        S = ent["length"]
        if ent["tail_page"] is not None \
                and len(self._free_pages) < len(todo):
            if not self._pipe:
                self._compact_paged()
            if len(self._free_pages) < len(todo):
                return False
        dsts = []
        for i in todo:
            for j, p in enumerate(ent["pages"]):
                self._page_refs[p] += 1
                self._table_host[i, j] = p
            alloc = len(ent["pages"])
            if ent["tail_page"] is not None:
                p_new = self._free_pages.pop()
                self._page_refs[p_new] = 1
                self._table_host[i, alloc] = p_new
                dsts.append(p_new)
                alloc += 1
            self._pages_alloc[i] = alloc
            self._host_offsets[i] = S
            self._pos_base_host[i] = 0
            self._needs_prefill[i] = False
            self.prepends[i] = []
        self.cache = self.cache._replace(table=jnp.asarray(self._table_host))
        if dsts:
            # bucket M to a power of two (one compile per bucket, N <= 16
            # buckets total); padding scatters into the trash page, which
            # holds junk by design
            M = 1
            while M < len(dsts):
                M *= 2
            pad = dsts + [0] * (M - len(dsts))
            self.cache = self._copy_page_multi(
                self.cache, jnp.asarray(ent["tail_page"], jnp.int32),
                jnp.asarray(pad, jnp.int32))
        mask = np.zeros((self.N,), bool)
        mask[todo] = True
        self.cache = self._mask_set_offsets(
            self.cache, jnp.asarray(mask),
            jnp.asarray(np.full((self.N,), S, np.int32)))
        return True

    def _clear_prefix_cache(self):
        for ent in self._prefix_entries.values():
            for p in ent["pages"]:
                self._unref_page(p)
            if ent["tail_page"] is not None:
                self._unref_page(ent["tail_page"])
        self._prefix_entries = {}

    def step(self) -> List[Optional[Tuple[Optional[str], str]]]:
        """One scheduler tick. Default (``fused=True``): the whole tick —
        chunked gated ingest + inline responses — is ONE device dispatch
        with ONE packed readback (the ``tick`` program); with
        ``pipelined=True`` tick i+1 is dispatched through the
        device-resident prepend before tick i's readback is consumed.
        Returns per-stream (query, response) or None; responses beyond one
        per stream per call surface on subsequent calls (FIFO)."""
        self._shed_lag()
        t0 = _time.perf_counter()
        try:
            return self._step_inner()
        finally:
            self._tick_hist.add("tick", _time.perf_counter() - t0)

    def _step_inner(self) -> List[Optional[Tuple[Optional[str], str]]]:
        if self.pipelined:
            return self._step_pipe()
        if self.stream_tokens and any(o is not None for o in self._open):
            # token streaming: ONE continuation segment per step for every
            # open response, BEFORE ingest — partial text keeps flowing at
            # tick cadence while the other streams' frames proceed
            self._respond_segments()
        if not self.fused:
            return self._step_unfused()
        self._prefill_starts()
        coll = self._collect_tick()
        if coll == "fallback":
            return self._step_unfused()
        if coll is not None:
            self.cache, packed, _pt, _pn = self._dispatch_tick(
                coll, jnp.asarray(coll["text_ids"]),
                jnp.asarray(coll["n_text"]))
            self._absorb_tick(np.asarray(packed), coll, frames_popped=False)
        return self._drain_out()

    def _drain_out(self):
        return [self._resp_out[i].popleft() if self._resp_out[i] else None
                for i in range(self.N)]

    def _step_unfused(self) -> List[Optional[Tuple[Optional[str], str]]]:
        """One scheduler tick, 2-dispatch form: feed up to ``chunk_frames``
        queued frames per stream in one dispatch (catch-up bursts amortize
        one weight-streaming pass over the whole chunk, same as the
        single-stream chunked ingest), gate at every frame, respond for
        fired streams in a second dispatch. The fused tick is
        oracle-tested against this path. Returns per-stream
        (query, response) or None."""
        self._prefill_starts()
        K = self.chunk_frames
        text_ids = np.zeros((self.N, TEXT_BUCKET), np.int32)
        n_text = np.zeros((self.N,), np.int32)
        bursts: List[List[Tuple[float, jnp.ndarray]]] = [[] for _ in range(self.N)]
        active = np.zeros((self.N,), bool)
        frame_times = [None] * self.N
        for i in range(self.N):
            if (not self.frame_queues[i] or self._needs_prefill[i]
                    or self._open[i] is not None):
                continue
            # a queued query earlier than the next frame answers first
            qq = self.query_queues[i]
            if qq and self.frame_queues[i][0][0] > qq[0][0]:
                continue
            qt = qq[0][0] if qq else None
            for t, emb in self.frame_queues[i]:
                if len(bursts[i]) >= K or (qt is not None and t > qt):
                    break
                bursts[i].append((t, emb))
            if not bursts[i]:
                continue
            pre = self.prepends[i][-TEXT_BUCKET:]
            if pre:
                text_ids[i, TEXT_BUCKET - len(pre):] = pre
            n_text[i] = len(pre)
            self.prepends[i] = []
            active[i] = True

        max_burst = max((len(b) for b in bursts), default=0)
        itv = 1 if self.cfg.frame_token_interval_id is not None else 0
        if active.any():
            # capacity guard: the chunk write is a full static-size slab per
            # stream; an overflow would silently clamp the ring write
            write_len = (TEXT_BUCKET + self.fnt if max_burst <= 1 else
                         TEXT_BUCKET + K * self.fnt + (K - 1) * itv)
            # resp_budget (not max_new): with token streaming the WHOLE
            # response budget is reserved by the originating tick, so
            # continuation segments need no guard of their own (the
            # single-stream engine's invariant, engine._respond_continue)
            budget = write_len + PROMPT_BUCKET + self.resp_budget
            if self.paged:
                idxs = [i for i in range(self.N) if active[i]]
                if not self._paged_admit(idxs, budget):
                    for i in idxs:
                        raise RuntimeError(
                            f"stream {i}: paged KV pool/logical capacity "
                            f"exceeded (offset "
                            f"{int(self._host_offsets[i])}, budget "
                            f"{budget}); raise kv_capacity/pool_pages or "
                            f"set stream_window")
            over = [] if self.paged else [
                i for i in range(self.N) if active[i]
                and int(self._host_offsets[i]) + budget > self.kv_capacity]
            if over and self.stream_window is not None:
                # compact every stream past its window (streams at or under
                # the window are untouched: keep=min(window, offset))
                self.cache = self._compact_jit(
                    self.cache, jnp.asarray(self.stream_window, jnp.int32))
                self._host_offsets = np.minimum(self._host_offsets,
                                                self.stream_window)
                over = [i for i in over
                        if int(self._host_offsets[i]) + budget
                        > self.kv_capacity]
            for i in over:
                raise RuntimeError(
                    f"stream {i}: KV ring capacity {self.kv_capacity} "
                    f"would be exceeded "
                    f"(offset {int(self._host_offsets[i])}); raise "
                    f"kv_capacity or set stream_window")

        fire = np.zeros((self.N,), bool)
        next_id = np.zeros((self.N,), np.int32)
        consumed = np.zeros((self.N,), np.int64)
        zero_frame = jnp.zeros((self.fnt, self.hidden), jnp.float32)
        if active.any():
            if max_burst <= 1:
                # keep frame embeds ON DEVICE: np.asarray per frame would be
                # a device->host readback each (a full RTT on tunneled TPUs)
                frames = jnp.stack([
                    _frame_row(bursts[i][0][1]) if active[i] else zero_frame
                    for i in range(self.N)])
                self.cache, packed = self._frame_step(
                    self.params, self.cache, jnp.asarray(text_ids),
                    jnp.asarray(n_text), frames.astype(jnp.float32),
                    jnp.asarray(active))
                packed = np.asarray(packed)  # ONE readback
                fire = packed[0].astype(bool)
                next_id = packed[1]
                self._host_offsets[:] = packed[2]
                consumed = active.astype(np.int64)
            else:
                n_frames = np.zeros((self.N,), np.int32)
                for i in range(self.N):
                    n_frames[i] = len(bursts[i])
                frames = self._gather_chunks(bursts, active, K)
                self.cache, packed = self._chunk_step(
                    self.params, self.cache, jnp.asarray(text_ids),
                    jnp.asarray(n_text), frames,
                    jnp.asarray(n_frames), jnp.asarray(active))
                packed = np.asarray(packed)  # ONE readback
                consumed = packed[0].astype(np.int64)
                fire = packed[1].astype(bool)
                next_id = packed[2]
                self._host_offsets[:] = packed[3]

        # pop consumed frames; record each stream's last processed time
        for i in range(self.N):
            c = int(consumed[i])
            for _ in range(c):
                self.frame_queues[i].popleft()
            if c:
                frame_times[i] = bursts[i][c - 1][0]

        # bookkeeping + response scheduling
        respond_mask = np.zeros((self.N,), bool)
        respond_query: List[Optional[Tuple[float, str]]] = [None] * self.N
        for i in range(self.N):
            if active[i] and consumed[i] and not fire[i]:
                if self.cfg.frame_token_interval_id is not None:
                    self.prepends[i] = [int(next_id[i])]
            if fire[i]:
                # a query at the fired frame's timestamp outranks the gate
                # (reference checks the query before the gate per frame)
                qq = self.query_queues[i]
                if qq and frame_times[i] is not None \
                        and frame_times[i] >= qq[0][0]:
                    respond_query[i] = qq.popleft()
                respond_mask[i] = True
                self.prepends[i] = []
            # answer a query once the stream has caught up to it: either the
            # frame just processed reaches the query time, or the next queued
            # frame is strictly later (reference inference.py:57-59,72-74).
            # Fired streams already responded this tick — their query (if
            # any) waits for the next tick, like the single-stream engine's
            # immediate return on fire.
            qq = self.query_queues[i]
            if not fire[i] and qq and not self._needs_prefill[i] \
                    and self._open[i] is None and (
                    (frame_times[i] is not None and frame_times[i] >= qq[0][0])
                    or (self.frame_queues[i]
                        and self.frame_queues[i][0][0] > qq[0][0])):
                respond_query[i] = qq.popleft()
                respond_mask[i] = True

        results: List[Optional[Tuple[Optional[str], str]]] = [None] * self.N
        if respond_mask.any():
            prompts: Dict[int, List[int]] = {}
            for i in range(self.N):
                if not respond_mask[i]:
                    continue
                if respond_query[i] is not None:
                    prompts[i] = list(self.tokenizer.apply_chat_template(
                        [{"role": "user", "content": respond_query[i][1]}],
                        tokenize=True, add_stream_query_prompt=True,
                        add_generation_prompt=True))
                    self.prepends[i] = []
                else:
                    prompts[i] = self._gen_prompt_ids
            longest = max(len(p) for p in prompts.values())
            P = -(-max(longest, 1) // PROMPT_BUCKET) * PROMPT_BUCKET
            ids = np.zeros((self.N, P), np.int32)
            nv = np.zeros((self.N,), np.int32)
            for i, prompt in prompts.items():
                ids[i, P - len(prompt):] = prompt
                nv[i] = len(prompt)
            nv_dev = jnp.asarray(nv)
            (packed, self.cache, self._hist, self._hcount,
             self._sstats) = self._respond(
                self.params, self.cache, jnp.asarray(ids), nv_dev,
                jnp.asarray(respond_mask), self._hist, self._hcount,
                self._sstats, nv_dev)
            packed = np.asarray(packed)  # ONE readback
            lengths = packed[:, 0]
            self._host_offsets[:] = packed[:, 1]
            out = packed[:, 2:]
            for i in range(self.N):
                if not respond_mask[i]:
                    continue
                toks = out[i, :lengths[i]]
                t = (respond_query[i][0] if respond_query[i] is not None
                     else frame_times[i])
                if self.stream_tokens:
                    # token streaming: route through the open-response
                    # machinery (first segment surfaces via on_delta; a
                    # completed response lands in _resp_out and merges
                    # into results below — same-tick surfacing)
                    self._begin_open(
                        i, "q" if respond_query[i] is not None else "f",
                        t, respond_query[i][1]
                        if respond_query[i] is not None else None)
                    self._extend_open(i, toks.astype(np.int32))
                    continue
                if toks.size and toks[-1] == self.cfg.eos_token_id:
                    self.prepends[i] = ([int(toks[-1])]
                                        + self._stream_prompt_ids)
                elif toks.size:
                    self.prepends[i] = [int(toks[-1])]
                resp = self.tokenizer.decode(toks, skip_special_tokens=True)
                q_str = (f"(Video Time = {t}s) User: {respond_query[i][1]}"
                         if respond_query[i] is not None else None)
                results[i] = (q_str, f"(Video Time = {t}s) Assistant:{resp}")
                self._record_response_latency(
                    i, "q" if respond_query[i] is not None else "f", t)
                self.transcripts[i].append(results[i])
        # surface queued entries FIFO (fused-tick leftovers + completed
        # token-streaming responses); this tick's direct result queues
        # behind older entries
        for i in range(self.N):
            if self._resp_out[i]:
                if results[i] is not None:
                    self._resp_out[i].append(results[i])
                results[i] = self._resp_out[i].popleft()
        return results

    # ------------------------------------------------------- fused tick I/O
    def _collect_tick(self):
        """Host prologue of one fused tick: per-stream burst/query
        collection, arbitration flags and prompt operands. Returns None
        when there is no work, the string "fallback" when this tick must
        run the unfused path (tight ring, oversized query prompt), else a
        dict of operands + bookkeeping."""
        N, K = self.N, self.chunk_frames
        active = np.zeros((N,), bool)
        force = np.zeros((N,), bool)
        qae_ge = np.zeros((N,), bool)
        qae_after = np.zeros((N,), bool)
        n_frames = np.zeros((N,), np.int32)
        bursts: List[List[Tuple[float, object]]] = [[] for _ in range(N)]
        queries: List[Optional[Tuple[float, str]]] = [None] * N
        q_ids = np.zeros((N, PROMPT_BUCKET), np.int32)
        q_nv = np.zeros((N,), np.int32)
        any_work = False
        for i in range(N):
            # a stream with an OPEN token-streaming response ingests
            # nothing until its continuation segments complete
            if self._needs_prefill[i] or self._open[i] is not None:
                continue
            fq, qq = self.frame_queues[i], self.query_queues[i]
            qt = qq[0][0] if qq else None
            if fq and qt is not None and fq[0][0] > qt:
                force[i] = True
                queries[i] = qq[0]
                any_work = True
                continue
            if not fq:
                continue
            for t, emb in fq:
                if len(bursts[i]) >= K or (qt is not None and t > qt):
                    break
                bursts[i].append((t, emb))
            if not bursts[i]:
                continue
            active[i] = True
            any_work = True
            n_frames[i] = len(bursts[i])
            if qt is not None:
                if bursts[i][-1][0] >= qt:
                    qae_ge[i] = True
                elif (len(fq) > len(bursts[i])
                      and fq[len(bursts[i])][0] > qt):
                    qae_after[i] = True
                if qae_ge[i] or qae_after[i]:
                    queries[i] = qq[0]
        if not any_work:
            return None

        for i in range(N):
            if queries[i] is None:
                continue
            prompt = list(self.tokenizer.apply_chat_template(
                [{"role": "user", "content": queries[i][1]}],
                tokenize=True, add_stream_query_prompt=True,
                add_generation_prompt=True))
            if len(prompt) > PROMPT_BUCKET:
                return "fallback"
            q_ids[i, PROMPT_BUCKET - len(prompt):] = prompt
            q_nv[i] = len(prompt)

        itv = 1 if self.cfg.frame_token_interval_id is not None else 0
        # resp_budget (not max_new): token-streaming continuation segments
        # draw on the originating tick's reservation (no guard of their own)
        budget = (TEXT_BUCKET + K * self.fnt + (K - 1) * itv
                  + R_TICK * (PROMPT_BUCKET + self.resp_budget))
        if self.paged:
            idxs = [i for i in range(N) if active[i] or force[i]]
            if not self._paged_admit(idxs, budget):
                return "fallback"
        over = [] if self.paged else [
            i for i in range(N) if (active[i] or force[i])
            and int(self._host_offsets[i]) + budget > self.kv_capacity]
        if over and self.stream_window is not None:
            self.cache = self._compact_jit(
                self.cache, jnp.asarray(self.stream_window, jnp.int32))
            self._host_offsets = np.minimum(self._host_offsets,
                                            self.stream_window)
            over = [i for i in over if int(self._host_offsets[i]) + budget
                    > self.kv_capacity]
        if over:
            return "fallback"

        gen = self._gen_prompt_ids
        g_ids = np.zeros((N, PROMPT_BUCKET), np.int32)
        g_ids[:, PROMPT_BUCKET - len(gen):] = gen
        g_nv = np.full((N,), len(gen), np.int32)

        text_ids = np.zeros((N, TEXT_BUCKET), np.int32)
        n_text = np.zeros((N,), np.int32)
        for i in range(N):
            if not active[i]:
                continue
            pre = self.prepends[i][-TEXT_BUCKET:]
            if pre:
                text_ids[i, TEXT_BUCKET - len(pre):] = pre
            n_text[i] = len(pre)
            self.prepends[i] = []
        return {
            "active": active, "force": force, "qae_ge": qae_ge,
            "qae_after": qae_after, "n_frames": n_frames,
            "bursts": bursts, "queries": queries, "q_ids": q_ids,
            "q_nv": q_nv, "g_ids": g_ids, "g_nv": g_nv,
            "text_ids": text_ids, "n_text": n_text, "budget": budget,
        }

    def _dev_cached(self, key, build, lru_cap: int = 64):
        """Small keyed device-constant cache (the tunnel makes every
        jnp.asarray a ~10-26 ms host->device upload; prompts and the gen
        operands repeat across ticks)."""
        cache = self._dev_cache
        hit = cache.get(key)
        if hit is None:
            if len(cache) >= lru_cap:
                cache.pop(next(iter(cache)))
            hit = cache[key] = build()
        else:
            cache[key] = cache.pop(key)  # LRU refresh
        return hit

    def _dispatch_tick(self, coll, text_ids, n_text):
        K = self.chunk_frames
        frames = self._gather_chunks(coll["bursts"], coll["active"], K)
        frames = self._pad_frames(frames)
        q_ids, q_nv = self._dev_cached(
            ("q", coll["q_ids"].tobytes()),
            lambda: (jnp.asarray(coll["q_ids"]), jnp.asarray(coll["q_nv"])))
        g_ids, g_nv = self._dev_cached(
            "g", lambda: (jnp.asarray(coll["g_ids"]),
                          jnp.asarray(coll["g_nv"])))
        meta = np.stack([
            coll["n_frames"].astype(np.int32),
            coll["active"].astype(np.int32),
            coll["qae_ge"].astype(np.int32),
            coll["qae_after"].astype(np.int32),
            coll["force"].astype(np.int32)], axis=1)
        (cache, packed, pre_t, pre_n, self._hist, self._hcount,
         self._sstats) = self._tick(
            self.params, self.cache, text_ids, n_text, frames,
            jnp.asarray(meta), q_ids, q_nv, g_ids, g_nv,
            self._hist, self._hcount, self._sstats)
        return cache, packed, pre_t, pre_n

    def _absorb_tick(self, packed: np.ndarray, coll,
                     frames_popped: bool) -> Dict[int, int]:
        """Digest one fused-tick readback: queues, host mirrors,
        transcripts. Returns {stream: consumed} for streams that
        under-consumed (stop_fire / deferred query) — callers re-queue or
        roll back. ``frames_popped``: pipelined fill already popped the
        burst frames (speculative full consumption)."""
        N, TB, R = self.N, TEXT_BUCKET, R_TICK
        max_new = self.max_new
        short: Dict[int, int] = {}
        stop_fire = np.zeros((N,), bool)
        for i in range(N):
            if not (coll["active"][i] or coll["force"][i]):
                continue
            row = packed[i]
            consumed = int(row[0])
            self._host_offsets[i] = int(row[1])
            pre_n = int(row[2])
            self.prepends[i] = ([int(v) for v in row[3 + TB - pre_n:3 + TB]]
                                if pre_n else [])
            n_resp = int(row[3 + TB])
            stop_fire[i] = bool(row[4 + TB])
            answered = bool(row[5 + TB])
            okind = row[6 + TB:6 + TB + R]
            ofidx = row[6 + TB + R:6 + TB + 2 * R]
            olen = row[6 + TB + 2 * R:6 + TB + 3 * R]
            oids = row[6 + TB + 3 * R:].reshape(R, max_new)
            if not frames_popped:
                for _ in range(consumed):
                    self.frame_queues[i].popleft()
            times = [t for t, _ in coll["bursts"][i]]
            for r in range(n_resp):
                toks = oids[r, :int(olen[r])].astype(np.int32)
                if okind[r]:
                    kind, t, q = "q", coll["queries"][i][0], \
                        coll["queries"][i][1]
                else:
                    kind, t, q = "f", times[int(ofidx[r])], None
                if self.stream_tokens:
                    # token streaming: an in-tick response is the FIRST
                    # segment. A full non-EOS segment froze the stream's
                    # tick (device `unfin` stop) and stays open for
                    # continuation dispatches; prep_after's device-side
                    # prepend already handled COMPLETED responses, so
                    # set_prepends=False (ingest may have continued past
                    # them inside this very tick).
                    self._begin_open(i, kind, t, q)
                    self._extend_open(i, toks, set_prepends=False)
                    continue
                resp = self.tokenizer.decode(toks, skip_special_tokens=True)
                if kind == "q":
                    entry = (f"(Video Time = {t}s) User: {q}",
                             f"(Video Time = {t}s) Assistant:{resp}")
                else:
                    entry = (None, f"(Video Time = {t}s) Assistant:{resp}")
                self._record_response_latency(i, kind, t)
                self._resp_out[i].append(entry)
                self.transcripts[i].append(entry)
            if coll["queries"][i] is not None and answered \
                    and not frames_popped:
                # blocking driver only peeks queries at collect; an
                # answered one is consumed here. The pipelined fill pops
                # eagerly; unanswered ones re-queue in _pipe_resolve AFTER
                # the newer-dispatch rollback (FIFO order).
                self.query_queues[i].popleft()
            if consumed < int(coll["n_frames"][i]) or stop_fire[i]:
                short[i] = consumed
        if stop_fire.any() and not frames_popped:
            # blocking driver: no newer dispatches in flight, respond now.
            # The pipelined resolver defers this until AFTER the rollback
            # rewinds the ring offsets (else the fallback would append at
            # the speculatively-advanced offsets).
            self._fallback_respond(stop_fire, coll, packed)
        return short, stop_fire

    def _fallback_respond(self, mask: np.ndarray, coll,
                          packed: np.ndarray):
        """Host-path gen response for streams whose fused tick ran out of
        response slots mid-fire (stop_fire): the fire consumed through its
        frame; finish its response with the standalone respond dispatch."""
        N = self.N
        gen = self._gen_prompt_ids
        P = PROMPT_BUCKET
        ids = np.zeros((N, P), np.int32)
        nv = np.zeros((N,), np.int32)
        for i in range(N):
            if mask[i]:
                ids[i, P - len(gen):] = gen
                nv[i] = len(gen)
        # pages for the fallback response (a subset of the admitted tick
        # budget after the stop_fire rewind, so this cannot fail)
        self._ensure_pages([i for i in range(N) if mask[i]],
                           P + self.resp_budget)
        nv_dev = jnp.asarray(nv)
        (rp, self.cache, self._hist, self._hcount,
         self._sstats) = self._respond(
            self.params, self.cache, jnp.asarray(ids), nv_dev,
            jnp.asarray(mask), self._hist, self._hcount, self._sstats,
            nv_dev)
        rp = np.asarray(rp)
        for i in range(N):
            if not mask[i]:
                continue
            lengths = int(rp[i, 0])
            self._host_offsets[i] = int(rp[i, 1])
            toks = rp[i, 2:2 + lengths].astype(np.int32)
            consumed = int(packed[i][0])
            t = [tt for tt, _ in coll["bursts"][i]][consumed - 1]
            if self.stream_tokens:
                # token streaming: the fallback response is a first
                # segment like any other standalone respond
                self._begin_open(i, "f", t, None)
                self._extend_open(i, toks)
                continue
            if toks.size and toks[-1] == self.cfg.eos_token_id:
                self.prepends[i] = [int(toks[-1])] + self._stream_prompt_ids
            elif toks.size:
                self.prepends[i] = [int(toks[-1])]
            resp = self.tokenizer.decode(toks, skip_special_tokens=True)
            entry = (None, f"(Video Time = {t}s) Assistant:{resp}")
            self._record_response_latency(i, "f", t)
            self._resp_out[i].append(entry)
            self.transcripts[i].append(entry)

    # ------------------------------------------------------ pipelined mode
    def _step_pipe(self) -> List[Optional[Tuple[Optional[str], str]]]:
        self._prefill_starts()
        while len(self._pipe) >= self.pipeline_depth:
            self._pipe_resolve()
        blocked = self._pipe_fill()
        if blocked:
            # resolve in-flight work, then run one blocking tick so
            # progress is guaranteed even against a tight ring
            while self._pipe:
                self._pipe_resolve()
            self._carry = None
            coll = self._collect_tick()
            if coll == "fallback":
                return self._step_unfused()
            if coll is not None:
                self.cache, packed, _pt, _pn = self._dispatch_tick(
                    coll, jnp.asarray(coll["text_ids"]),
                    jnp.asarray(coll["n_text"]))
                self._absorb_tick(np.asarray(packed), coll,
                                  frames_popped=False)
        elif self._pipe and not any(self.frame_queues[i]
                                    for i in range(self.N)):
            # idle input: resolve one so responses keep surfacing
            self._pipe_resolve()
        return self._drain_out()

    def _pipe_fill(self) -> bool:
        """Dispatch collected ticks up to the pipeline depth, chaining the
        device-resident prepend; pops frames/queries eagerly (full
        consumption is the speculation). Returns True when the capacity
        guard blocked a dispatch."""
        while len(self._pipe) < self.pipeline_depth:
            coll = self._collect_tick()
            if coll is None:
                return False
            if coll == "fallback":
                return True
            inflight = sum(e["coll"]["budget"] for e in self._pipe)
            worst = int(self._host_offsets.max()) + inflight \
                + coll["budget"]
            if worst > self.kv_capacity:
                return True
            if self.paged:
                # in-flight dispatches append through the CURRENT table:
                # pages must cover the worst case before dispatching more
                # (no compaction here — _paged_admit skips it while
                # dispatches are in flight; the blocked path resolves
                # everything first)
                idxs = [i for i in range(self.N)
                        if coll["active"][i] or coll["force"][i]]
                if not self._paged_admit(idxs, inflight + coll["budget"]):
                    return True
            if self._pipe and self._carry is not None:
                text_ids, n_text = self._carry
            else:
                text_ids = jnp.asarray(coll["text_ids"])
                n_text = jnp.asarray(coll["n_text"])
            self.cache, packed, pre_t, pre_n = self._dispatch_tick(
                coll, text_ids, n_text)
            try:
                packed.copy_to_host_async()
            except Exception:
                pass
            self._carry = (pre_t, pre_n)
            for i in range(self.N):
                for _ in range(int(coll["n_frames"][i])):
                    self.frame_queues[i].popleft()
                if coll["queries"][i] is not None:
                    self.query_queues[i].popleft()
            self._pipe.append({"coll": coll, "packed": packed})
        return False

    def _pipe_resolve(self):
        """Resolve the oldest in-flight tick. On under-consumption
        (stop_fire) or a deferred query, newer dispatches ingested the
        wrong continuation: re-queue their inputs, rewind the ring offsets
        to this tick's resolved values, and break the prepend chain."""
        e = self._pipe.popleft()
        coll = e["coll"]
        packed = np.asarray(e["packed"])
        short, stop_fire = self._absorb_tick(packed, coll,
                                             frames_popped=True)
        deferred_q = [
            i for i in range(self.N)
            if coll["queries"][i] is not None
            and not bool(packed[i][5 + TEXT_BUCKET])]
        if not short and not deferred_q:
            return
        # roll back every newer dispatch (reverse order)
        while self._pipe:
            newer = self._pipe.pop()
            nc = newer["coll"]
            for i in range(self.N):
                for t, emb in reversed(nc["bursts"][i]):
                    self.frame_queues[i].appendleft((t, emb))
                if nc["queries"][i] is not None:
                    self.query_queues[i].appendleft(nc["queries"][i])
        self._carry = None
        # re-queue this tick's unconsumed frames and unanswered queries
        # (AFTER the newer rollback so queue order stays chronological)
        for i, consumed in short.items():
            for t, emb in reversed(coll["bursts"][i][consumed:]):
                self.frame_queues[i].appendleft((t, emb))
        for i in deferred_q:
            self.query_queues[i].appendleft(coll["queries"][i])
        # rewind device offsets to the resolved values (stale KV beyond
        # the offset is never attended)
        self.cache = self._set_offsets(
            self.cache, jnp.asarray(self._host_offsets.astype(np.int32)))
        if stop_fire.any():
            # deferred host fallback: append at the REWOUND offsets
            self._fallback_respond(stop_fire, coll, packed)

    def flush(self) -> List[List[Tuple[Optional[str], str]]]:
        """Resolve every in-flight pipelined tick and drain all queued
        responses; returns the per-stream drained entries."""
        while self._pipe:
            self._pipe_resolve()
        self._carry = None
        # drain token-streaming continuations to completion
        while any(o is not None for o in self._open):
            self._respond_segments()
        out = [list(self._resp_out[i]) for i in range(self.N)]
        for i in range(self.N):
            self._resp_out[i].clear()
        return out

    def pending(self) -> bool:
        return (any(q for q in self.frame_queues)
                or any(q for q in self.query_queues)
                or any(q for q in self._resp_out)
                or any(o is not None for o in self._open)
                or bool(self._pipe))

    def close_stream(self, i: int) -> List[Tuple[Optional[str], str]]:
        """End stream ``i``'s dialogue and return its transcript. The slot
        becomes immediately reusable for a NEW dialogue (continuous
        batching — the reference serves exactly one dialogue per process,
        demo/inference.py:84 ``reset``): the next ``input_frames(i, ...)``
        re-prefills the system prompt, and sibling streams' caches are
        never touched. In paged mode the stream's pages return to the
        shared pool at close, so a finished dialogue's memory immediately
        serves the live ones. Off the hot path: one small device readback
        + one upload."""
        # in-flight pipelined ticks append through the current
        # table/offsets; resolve them before mutating slot state
        while self._pipe:
            self._pipe_resolve()
        self._carry = None
        # an open token-streaming response must complete before its slot
        # can be reused (its transcript entry belongs to THIS dialogue)
        while self._open[i] is not None:
            self._respond_segments()
        out = self.transcripts[i]
        self.transcripts[i] = []
        self.frame_queues[i].clear()
        self.query_queues[i].clear()
        self.prepends[i] = []
        self._resp_out[i].clear()
        self._needs_prefill[i] = True
        self._host_offsets[i] = 0
        if self.paged:
            for j in range(self._pages_alloc[i]):
                self._unref_page(int(self._table_host[i, j]))
            self._table_host[i] = 0
            self._pages_alloc[i] = 0
            self._pos_base_host[i] = 0
            self.cache = self.cache._replace(
                table=jnp.asarray(self._table_host))
        off = np.asarray(self.cache.offset).copy()
        pb = np.asarray(self.cache.pos_base).copy()
        off[i] = 0
        pb[i] = 0
        self.cache = self.cache._replace(offset=jnp.asarray(off),
                                         pos_base=jnp.asarray(pb))
        # spec-decode history and drop stats are per-dialogue
        self._hist = self._hist.at[i].set(0)
        self._hcount = self._hcount.at[i].set(0)
        self._dropped[i] = 0
        self._arrival[i].clear()
        return out

    def _unref_page(self, p: int):
        self._page_refs[p] -= 1
        assert self._page_refs[p] >= 0, f"page {p} over-freed"
        if self._page_refs[p] == 0:
            self._free_pages.append(p)

    def fork_stream(self, src: int, dst: int):
        """Fork dialogue ``src`` into slot ``dst`` (paged mode only):
        ``dst`` continues from the exact same context — full pages are
        SHARED via table aliasing (refcounted; zero data movement) and
        only the partial tail page is copied (copy-on-write boundary:
        appends only ever write at slots >= offset, which lie in the
        private tail page or beyond, so a shared full page is never
        written). Enables A/B continuations and multi-user serving over
        one ingested stream — the reference cannot fork a dialogue at all
        (one process, one growing torch cache, demo/inference.py:84).
        ``dst`` must be a fresh/closed slot."""
        assert self.paged, "fork_stream requires the paged KV layout"
        assert src != dst
        assert (self._pages_alloc[dst] == 0 and not self.frame_queues[dst]
                and not self.query_queues[dst] and not self._resp_out[dst]
                and int(self._host_offsets[dst]) == 0), \
            "fork target must be a fresh or closed slot"
        # in-flight pipelined ticks may rewind offsets; fork after resolve
        while self._pipe:
            self._pipe_resolve()
        self._carry = None
        # fork from a quiescent source: finish its open response first
        while self._open[src] is not None:
            self._respond_segments()
        off = int(self._host_offsets[src])
        full = off // self.page_size
        r = off % self.page_size
        # preflight the tail-page allocation BEFORE any refcount mutation:
        # raising mid-alias would leak the bumped refs forever
        if r > 0 and not self._free_pages:
            raise RuntimeError("paged KV pool exhausted in fork_stream")
        for j in range(full):
            p = int(self._table_host[src, j])
            self._page_refs[p] += 1
            self._table_host[dst, j] = p
        alloc = full
        if r > 0:
            # private copy of the partial tail page (k/v/scale pools
            # alike), via the DONATED jitted copier — in place on device,
            # one page of traffic (eager .at[].set would materialize a
            # full copy of every ~GB pool)
            p_new = self._free_pages.pop()
            self._page_refs[p_new] = 1
            p_old = int(self._table_host[src, full])
            self.cache = self._copy_page(
                self.cache, jnp.asarray(p_new, jnp.int32),
                jnp.asarray(p_old, jnp.int32))
            self._table_host[dst, full] = p_new
            alloc = full + 1
        self._pages_alloc[dst] = alloc
        self._host_offsets[dst] = off
        self._pos_base_host[dst] = self._pos_base_host[src]
        self._dropped[dst] = 0
        offs = np.asarray(self.cache.offset).copy()
        pbs = np.asarray(self.cache.pos_base).copy()
        offs[dst] = offs[src]
        pbs[dst] = pbs[src]
        self.cache = self.cache._replace(
            table=jnp.asarray(self._table_host),
            offset=jnp.asarray(offs), pos_base=jnp.asarray(pbs))
        # conversation continuation state rides along; queues stay empty
        self._needs_prefill[dst] = self._needs_prefill[src]
        self.prepends[dst] = list(self.prepends[src])
        self.transcripts[dst] = list(self.transcripts[src])
        self._hist = self._hist.at[dst].set(self._hist[src])
        self._hcount = self._hcount.at[dst].set(self._hcount[src])
