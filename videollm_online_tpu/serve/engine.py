"""LiveInferEngine — the real-time streaming serving loop, TPU-native.

Public API mirrors the reference ``LiveInfer`` (demo/inference.py:12-124):
``load_video`` / ``input_video_stream`` / ``input_query_stream`` /
``__call__`` / ``reset``. The internals are redesigned for XLA:

  * the KV cache is the static ring from models/llama.py — no growing torch
    tensors (reference demo/inference.py:64-68);
  * frame ingestion is a **device-side while_loop over a frame burst**
    (`ingest_burst`): each step appends [prev-token(s), 10 frame tokens] to
    the cache, evaluates the response gate (P(interval) < 0.725 →
    zero-out + argmax, demo/inference.py:76-81), and early-exits on fire —
    ONE dispatch per burst instead of one forward per frame;
  * responses run as a single on-device greedy while_loop
    (models/generate.py) with the reference's 100-token budget;
  * text prepends are bucket-padded; valid tokens pack contiguously via a
    right-align + circular-roll trick so the ring stays dense.

Host/device sync points per burst: one 4-scalar readback (frames consumed,
fire flag, next token, cache offset) — the reference syncs every frame AND
every generated token.
"""

from __future__ import annotations

import collections
import functools
from typing import Any, Callable, Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import LiveConfig
from ..models import generate as gen_mod
from ..models import llama, live
from ..tokenizer.live_tokenizer import LiveTokenizer

TEXT_BUCKET = 4        # in-burst prepend: '' | ',' | eos + '\n['
PROMPT_BUCKETS = (32, 64, 128, 256)  # prefill / query-response prompts
CHUNK_FRAMES = 8       # frames per chunked-ingest dispatch (catch-up bursts)
BURST_BUCKETS = (32, 64)  # whole-burst device loop: frames per dispatch
R_STREAM = 4   # max response turns inside one ingest_stream dispatch


class _FrameRef:
    """Lazy handle to row ``idx`` of a device frame chunk (T, fnt, D).

    Enqueueing frames must not dispatch device work: eager per-row slices
    at enqueue plus a per-burst jnp.stack cost one tunnel dispatch EACH.
    Refs defer everything; a contiguous run from one chunk assembles into
    the burst operand with a single dynamic_slice+pad dispatch."""
    __slots__ = ("src", "idx")

    def __init__(self, src: jax.Array, idx: int):
        self.src = src
        self.idx = idx

    def materialize(self) -> jax.Array:
        return self.src[self.idx]


def _frame_row(e) -> jax.Array:
    return e.materialize() if isinstance(e, _FrameRef) else e


def _contiguous_ref_run(group) -> Optional[Tuple[jax.Array, int]]:
    """(src, start) when ``group`` is a contiguous run of _FrameRefs into
    one source chunk (the shared fast-path predicate for burst assembly —
    engine and multistream must agree on it), else None."""
    if not group:
        return None
    first = group[0]
    if (isinstance(first, _FrameRef)
            and all(isinstance(e, _FrameRef) and e.src is first.src
                    and e.idx == first.idx + i
                    for i, e in enumerate(group))
            and first.idx + len(group) <= first.src.shape[0]):
        return first.src, first.idx
    return None


@functools.partial(jax.jit, static_argnames=("k", "out_len"))
def _slice_pad_frames(src, i0, k: int, out_len: int):
    seg = jax.lax.dynamic_slice(src, (i0, 0, 0), (k,) + src.shape[1:])
    if out_len == k:
        return seg
    pad = jnp.zeros((out_len - k,) + src.shape[1:], src.dtype)
    return jnp.concatenate([seg, pad], axis=0)


def _pack_valid_first(embeds: jax.Array, bucket: int, num_valid: jax.Array
                      ) -> jax.Array:
    """Right-aligned valid rows -> valid-first rows (circular left roll)."""
    return jnp.roll(embeds, -(bucket - num_valid), axis=1)


def _check_same_tree(old, new):
    """swap_params guard: identical pytree structure + leaf shapes/dtypes
    (anything else would silently recompile every serving program)."""
    old_leaves, old_def = jax.tree_util.tree_flatten(old)
    new_leaves, new_def = jax.tree_util.tree_flatten(new)
    if old_def != new_def:
        raise ValueError(
            f"swap_params: tree structure changed ({new_def} != {old_def})")
    for o, n in zip(old_leaves, new_leaves):
        os = (getattr(o, "shape", None), getattr(o, "dtype", None))
        ns = (getattr(n, "shape", None), getattr(n, "dtype", None))
        if os != ns:
            raise ValueError(
                f"swap_params: leaf shape/dtype changed ({ns} != {os})")


class LiveInferEngine:
    def __init__(
        self,
        params: Dict[str, Any],
        tokenizer: LiveTokenizer,
        cfg: Optional[LiveConfig] = None,
        *,
        vision_params: Optional[Dict[str, Any]] = None,
        kv_capacity: int = 16384,
        frame_fps: Optional[float] = None,
        attn_impl=None,
        encoder_device=None,
        stream_window: Optional[int] = None,
        fused_respond: bool = True,
        speculative: bool = False,
        multi_respond: bool = True,
        pipelined: bool = False,
        kv_quant: Optional[str] = None,
        spec_decode: bool = False,
        spec_draft: Optional[int] = None,
        spec_draft_mode: str = "ngram",
        spec_forced_script=None,
        stream_tokens: Optional[int] = None,
        on_delta: Optional[Callable[[str, bool], None]] = None,
    ):
        # spec_decode: n-gram (prompt-lookup) speculative decoding inside
        # every response generation (models/generate.py). Decode is
        # weight-streaming-bound (~11 of 13.4 ms/token at 8B int8), so
        # verifying K drafted tokens in ONE forward emits 1+accepted
        # greedy-exact tokens per weight pass; drafts come from a device
        # token-history ring of previous prompts/responses (live narration
        # repeats heavily). Output transcripts are identical to greedy by
        # construction (verification); .spec_stats() reports
        # [verify_steps, emitted_tokens]. Opt-in.
        self.spec_decode = spec_decode
        # drafted tokens per verify step. Decode is weight-streaming-bound
        # so a bigger K is nearly free compute-wise; past the response
        # budget it drafts tokens that can never emit. Measured knee
        # (BENCH_NOTES.md K study, 8B): K = budget-1 wins — one forward
        # can verify a whole predicted response — with a cap for long
        # budgets where acceptance runs are shorter than the budget.
        self.spec_draft = int(
            spec_draft
            or max(1, min((cfg or tokenizer.cfg).max_response_tokens - 1,
                          19)))
        # "zero": constant-zero drafts (the no-match fallback program) —
        # the measured adversarial lower bound; acceptance ~0, transcripts
        # still greedy-exact (verification). Bench/diagnostic knob.
        assert spec_draft_mode in ("ngram", "zero"), spec_draft_mode
        self.spec_draft_mode = spec_draft_mode
        # spec_forced_script ((n_rows, max_response_tokens) i32): FORCED-
        # RESPONSE REPLAY — response turn r emits row r%n_rows verbatim
        # instead of the model's argmax, while every forward / lm_head /
        # acceptance comparison runs identically (models/generate.py
        # forced_ids). Random weights emit self-similar cycling text (the
        # OPTIMISTIC acceptance bound); replaying reference-distribution
        # narration text through the verify path pins the REALISTIC
        # tokens/verify-step + FPS a trained checkpoint would see, with no
        # trained weights (text shape per reference data/ego4d/
        # narration.py:117-130). Pad rows with EOS to end responses early.
        # Bench/diagnostic knob; requires spec_decode.
        self._forced_script = None
        if spec_forced_script is not None:
            assert spec_decode, "spec_forced_script requires spec_decode"
            assert stream_tokens is None, (
                "forced replay + stream_tokens unsupported (bench knob)")
            script = np.asarray(spec_forced_script, np.int32)
            budget = (cfg or tokenizer.cfg).max_response_tokens
            assert script.ndim == 2 and script.shape[1] == budget, (
                f"script must be (n_rows, {budget}); got {script.shape}")
            self._forced_script = script
        # kv_quant="int8": per-token-per-head symmetric int8 KV cache —
        # halves KV memory (2x stream capacity at a given kv_capacity) and
        # halves attention's KV HBM reads; the Pallas decode kernels
        # dequantize in-kernel. Transcripts may differ slightly from bf16
        # (quantization noise on attention logits). None = bf16 (default).
        assert kv_quant in (None, "int8"), kv_quant
        self.kv_quant = kv_quant
        # pipelined: sustained-mode dispatch pipelining — burst i+1 is
        # dispatched BEFORE burst i's packed result is read, chained through
        # the device-resident prepend that ingest_stream returns (no host
        # readback sits between dispatches, so the per-burst readback RTT
        # overlaps the next burst's compute). Frame consumption is the only
        # speculation (a dispatch that exhausts its R_STREAM response slots
        # mid-burst consumes fewer frames than assumed — detected at
        # resolution and rolled back by an offset rewind, like the realtime
        # speculative mode). Transcripts are content-identical; responses
        # can surface one __call__ later. Opt-in.
        self.pipelined = pipelined
        # depth 2 = one unresolved dispatch in flight. Measured: depth 3
        # changes nothing (20.35 vs 20.34 FPS on the 8B headline) — the
        # cycle is device-compute-bound once one dispatch of overlap hides
        # the readback+dispatch overhead — so keep the lower response
        # latency of depth 2.
        self.pipeline_depth = 2
        assert not (pipelined and speculative), \
            "pipelined (sustained) and speculative (realtime) are exclusive"
        # multi_respond: the sustained path dispatches ONE device program
        # per burst that ingests frames AND runs up to R_STREAM response
        # turns inline (ingest_stream) — a response-heavy cycle costs one
        # dispatch + one packed readback for SEVERAL responses instead of
        # one pair each. Responses surface one per __call__ from a host
        # buffer, transcript-identical to the fused path (oracle-tested).
        self.multi_respond = multi_respond
        # fused_respond: run response arbitration + generation INSIDE the
        # ingest dispatch (one dispatch + one packed readback per streaming
        # step, vs ingest-readback-respond-readback). Transcripts are
        # test-proven identical to the two-dispatch path; False keeps the
        # two-dispatch path (A/B + oracle tests).
        self.fused_respond = fused_respond
        # speculative: pipeline per-frame realtime ingest — dispatch frame
        # i+1 (assuming frame i's gate holds: the non-fire continuation is
        # BY DEFINITION the interval token) before reading frame i's packed
        # result, and start its host transfer asynchronously. On a fire the
        # speculative dispatch is rolled back by rewinding the ring offset
        # (its stale KV is beyond the offset: never attended, overwritten).
        # Hides the per-frame readback latency on high-RTT links (the axon
        # tunnel); transcripts are content-identical, but a response may
        # surface one engine() call later than the blocking engine. Opt-in.
        self.speculative = speculative
        # encoder_device: place the vision tower on a different chip so
        # frame encoding genuinely overlaps decoder work (the paper claims
        # this parallelism; the released reference time-multiplexes one GPU,
        # SURVEY.md §2.3). None = same device as the decoder.
        self.encoder_device = encoder_device
        self.params = params
        self.tokenizer = tokenizer
        self.cfg = cfg or tokenizer.cfg
        # stream_tokens=S: TOKEN-STREAMING responses — each respond
        # dispatch decodes at most S tokens; the host surfaces the partial
        # text via ``on_delta(delta, done)`` and chains continuation
        # dispatches (1-token prompt = the last sampled token, which the
        # unsegmented engine would feed exactly the same way) until EOS or
        # the response budget. Segment concatenation is greedy-EXACT equal
        # to the unsegmented response (tests/test_stream_tokens.py): greedy
        # continuation from the same KV state is the same sequence. This is
        # the latency configuration — first text surfaces after S tokens
        # instead of the full budget (the reference streams nothing: its
        # fast_greedy_generate returns only the complete response,
        # modeling_live.py:173-182). COMPOSES with spec_decode: each
        # segment dispatch runs the n-gram verify loop with budget S, so
        # the first S tokens surface after ~ceil(S/(K+1)) verify forwards
        # while decode keeps the multi-token-per-forward rate — users no
        # longer choose between TTFT and throughput. Continuation
        # segments skip re-appending their 1-token prompt to the history
        # ring (it is already there as the previous segment's last emitted
        # token); transcripts stay greedy-exact either way (verification).
        # Pipelined / realtime-speculative stay excluded: those drivers
        # speculate across dispatch boundaries and would reorder partial
        # surfacing. Opt-in.
        self.stream_tokens = stream_tokens
        self.on_delta = on_delta
        if stream_tokens is not None:
            assert stream_tokens > 0, stream_tokens
            assert not (pipelined or speculative), (
                "stream_tokens is a blocking-engine mode (no pipelined/"
                "speculative)")
            assert self.cfg.max_response_tokens % stream_tokens == 0, (
                "max_response_tokens must be a multiple of stream_tokens "
                "for exact budget equality with the unsegmented engine")
            # multi_respond fuses whole response turns INSIDE one ingest
            # dispatch (nothing can surface mid-dispatch) — force the
            # single-respond fused path instead
            self.multi_respond = False
            if spec_decode and spec_draft is None:
                # default draft length sized to the SEGMENT budget: after
                # the prompt forward's token, S-1 remain, so K = S-1 lets
                # one verify step complete a segment; drafting past the
                # segment is clipped work every step
                self.spec_draft = max(1, min(self.spec_draft,
                                             stream_tokens - 1) if
                                      stream_tokens > 1 else 1)
        self.max_new = stream_tokens or self.cfg.max_response_tokens
        # infinite-stream serving: attention restricted to the last
        # ``stream_window`` tokens and the ring COMPACTED (newest window
        # shifted to the front, pos_base advanced) when full — streams of
        # any length run in bounded memory with transcripts exactly equal
        # to an uncompacted engine using the same window. None (default) =
        # reference-faithful full attention; the ring then fails loudly at
        # capacity (the reference instead grows its KV until GPU OOM,
        # demo/inference.py:64-68).
        self.stream_window = stream_window
        if stream_window is not None:
            import dataclasses
            need = (stream_window + TEXT_BUCKET
                    + CHUNK_FRAMES * (self.cfg.frame_num_tokens + 1)
                    + max(PROMPT_BUCKETS) + self.cfg.max_response_tokens)
            assert kv_capacity >= need, (
                f"kv_capacity {kv_capacity} too small for stream_window "
                f"{stream_window}: needs >= {need} (window + one chunk + "
                f"one response turn)")
            self.cfg = self.cfg.replace(llama=dataclasses.replace(
                self.cfg.llama, sliding_window=stream_window))
        assert self.cfg.v_placeholder_id is not None, "config missing token ids"
        self.vision_params = vision_params
        self.kv_capacity = kv_capacity
        self.frame_fps = frame_fps or self.cfg.frame_fps
        self.frame_num_tokens = self.cfg.frame_num_tokens
        if attn_impl is None:
            from ..ops.auto import auto_attention
            attn_impl = auto_attention
        self.attn_impl = attn_impl
        self.hidden = self.cfg.llama.hidden_size

        tok = tokenizer
        self._start_ids = np.asarray(tok.apply_chat_template(
            [{"role": "system", "content": self.cfg.system_prompt}],
            tokenize=True, add_stream_prompt=True), np.int32)
        self._stream_prompt_ids = np.asarray(
            tok.encode("\n["), np.int32)  # after-EOS reopen (inference.py:65)
        self._gen_prompt_text = "]\nAssistant:"  # add_stream_generation_prompt
        self._gen_prompt_ids = list(tok.encode(self._gen_prompt_text))
        n_gen = len(self._gen_prompt_ids)
        self._gen_prompt_bucket = next(
            (b for b in PROMPT_BUCKETS if b >= n_gen), n_gen)

        # device-constant cache: every jnp.asarray of host data is a
        # host->device transfer — ~10-26 ms of tunnel latency EACH on
        # remote-attached TPUs. The streaming loop's small operands
        # (threshold, prompt buckets, prepend buckets, scalar counts) repeat
        # across cycles; uploading them once turns ~8 transfers per
        # response cycle into zero.
        self._dev_cache: Dict[Any, jax.Array] = {}
        # user-content keys (query prompts, pasted text) are unbounded over
        # a long-lived session — those live in a capped LRU so HBM/host
        # memory can't grow without limit; static scalars stay permanent
        self._dev_lru: "collections.OrderedDict[Any, jax.Array]" = (
            collections.OrderedDict())
        self._dev_lru_cap = 256
        self._build_jitted()
        self.reset()

    def _dev(self, key, build, lru: bool = False):
        if lru:
            hit = self._dev_lru.get(key)
            if hit is not None:
                self._dev_lru.move_to_end(key)
                return hit
            hit = jax.device_put(build())
            self._dev_lru[key] = hit
            while len(self._dev_lru) > self._dev_lru_cap:
                self._dev_lru.popitem(last=False)
            return hit
        hit = self._dev_cache.get(key)
        if hit is None:
            hit = jax.device_put(build())
            self._dev_cache[key] = hit
        return hit

    def _dev_i32(self, v: int) -> jax.Array:
        return self._dev(("i32", v), lambda: jnp.asarray(v, jnp.int32))

    def _dev_bool(self, v: bool) -> jax.Array:
        return self._dev(("b", v), lambda: jnp.asarray(bool(v)))

    def _dev_thr(self) -> jax.Array:
        t = float(self.cfg.frame_token_interval_threshold)
        return self._dev(("thr", t), lambda: jnp.asarray(t, jnp.float32))

    def _dev_prompt(self, ids, bucket: int) -> jax.Array:
        """(1, bucket) right-aligned prompt ids as a cached device const."""
        key = ("prompt", bucket, tuple(int(i) for i in ids))
        def build():
            buf = np.zeros((1, bucket), np.int32)
            if len(ids):
                buf[0, bucket - len(ids):] = ids
            return buf
        return self._dev(key, build, lru=True)

    def _dev_text(self, ids) -> jax.Array:
        """(TEXT_BUCKET,) right-aligned prepend ids, cached."""
        key = ("text", tuple(int(i) for i in ids))
        def build():
            buf = np.zeros((TEXT_BUCKET,), np.int32)
            if len(ids):
                buf[-len(ids):] = ids
            return buf
        return self._dev(key, build, lru=True)

    # ------------------------------------------------------------------ jit
    def _build_jitted(self):
        cfg = self.cfg
        lora = self.params.get("lora")
        scaling = cfg.lora.scaling if (cfg.lora is not None and lora is not None) else 1.0
        interval_id = cfg.frame_token_interval_id
        use_interval = interval_id is not None
        gate_ref_id = interval_id if use_interval else cfg.eos_token_id
        fnt = self.frame_num_tokens

        def fwd(params, embeds, cache, num_valid):
            return llama.forward(
                params["llama"], cfg=cfg.llama, inputs_embeds=embeds,
                kv_cache=cache, num_valid=num_valid, lora=params.get("lora"),
                lora_scaling=scaling, attn_impl=self.attn_impl)

        def prefill(params, cache, ids, num_valid):
            embeds = llama.embed_tokens(params["llama"], ids, cfg.llama)
            embeds = _pack_valid_first(embeds, ids.shape[1], num_valid)
            _, cache = fwd(params, embeds, cache, num_valid)
            return cache

        gate_bias = cfg.gate_logit_bias

        def gate(logits_row, threshold):
            logits_row = logits_row.astype(jnp.float32)
            if gate_bias:
                logits_row = logits_row.at[gate_ref_id].add(gate_bias)
            probs = jax.nn.softmax(logits_row)
            p_int = probs[gate_ref_id]
            masked = jnp.where(p_int < threshold, probs.at[gate_ref_id].set(0.0),
                               probs)
            next_id = jnp.argmax(masked).astype(jnp.int32)
            fire = next_id != gate_ref_id
            return fire, next_id

        def _burst_core(params, cache, first_text, first_n, frames, n_frames,
                        threshold):
            """frames: (K, fnt, hidden) connector outputs, one forward per
            frame in a device-side while_loop; early-exits on gate fire.
            Returns (cache, consumed, fire, next_id)."""
            interval_text = jnp.zeros((TEXT_BUCKET,), jnp.int32)
            interval_text = interval_text.at[-1].set(
                gate_ref_id if use_interval else 0)
            interval_n = jnp.asarray(1 if use_interval else 0, jnp.int32)

            def cond(st):
                i, _, fire, _ = st
                return jnp.logical_and(i < n_frames, jnp.logical_not(fire))

            def body(st):
                i, cache, _, _ = st
                text = jnp.where(i == 0, first_text, interval_text)
                n_text = jnp.where(i == 0, first_n, interval_n)
                t_emb = llama.embed_tokens(params["llama"], text[None], cfg.llama)
                f_emb = jax.lax.dynamic_slice(
                    frames, (i, 0, 0), (1, fnt, self.hidden)).astype(t_emb.dtype)
                embeds = jnp.concatenate([t_emb, f_emb], axis=1)
                num_valid = (n_text + fnt)[None]
                embeds = jnp.roll(embeds, -(TEXT_BUCKET - n_text), axis=1)
                logits, cache = llama.forward(
                    params["llama"], cfg=cfg.llama, inputs_embeds=embeds,
                    kv_cache=cache, num_valid=num_valid,
                    lora=params.get("lora"), lora_scaling=scaling,
                    attn_impl=self.attn_impl,
                    logit_gather_positions=num_valid - 1)
                fire, next_id = gate(logits[0, 0], threshold)
                return i + 1, cache, fire, next_id

            i, cache, fire, next_id = jax.lax.while_loop(
                cond, body, (jnp.asarray(0, jnp.int32), cache,
                             jnp.asarray(False), jnp.asarray(0, jnp.int32)))
            return cache, i, fire, next_id

        def ingest_burst(params, cache, first_text, first_n, frames, n_frames,
                         threshold):
            cache, i, fire, next_id = _burst_core(
                params, cache, first_text, first_n, frames, n_frames,
                threshold)
            # ONE packed int32 readback (consumed, fire, next_id, offset):
            # through the tunnel every host readback is a full RTT
            packed = jnp.stack([i, fire.astype(jnp.int32), next_id,
                                cache.offset[0]])
            return cache, packed

        def _chunk_core(params, cache, first_text, first_n, frames, n_frames,
                        threshold):
            """Process up to CHUNK_FRAMES frames in ONE forward: tokens are
            laid out exactly as the sequential loop would have fed them in
            the non-fired steady state ([prepend] f0 , f1 , f2 ...), gates
            are read at every frame's last token, and on a fire at frame i
            the ring offset is set to the end of frame i — the tokens
            written past it are exactly what trim_past_key_values would have
            dropped (never attended, overwritten later). One weight-streaming
            pass amortizes over the whole chunk (~CHUNK x less HBM traffic
            than per-frame steps on memory-bound models).
            Returns (cache, consumed, any_fire, next_id)."""
            K = frames.shape[0]  # static CHUNK_FRAMES
            itv = 1 if use_interval else 0
            per = fnt + itv

            t_emb = llama.embed_tokens(params["llama"], first_text[None],
                                       cfg.llama)[0]  # (TEXT_BUCKET, D)
            f_emb = frames.astype(t_emb.dtype)        # (K, fnt, D)
            if use_interval:
                iv_emb = llama.embed_tokens(
                    params["llama"],
                    jnp.asarray([[interval_id]], jnp.int32),
                    cfg.llama)[0]                     # (1, D)
                unit = jnp.concatenate(
                    [jnp.broadcast_to(iv_emb[None], (K, 1, t_emb.shape[-1])),
                     f_emb], axis=1)                  # (K, 1+fnt, D)
                body = jnp.concatenate(
                    [f_emb[0], unit[1:].reshape(-1, t_emb.shape[-1])], axis=0)
            else:
                body = f_emb.reshape(-1, t_emb.shape[-1])
            embeds = jnp.concatenate([t_emb, body], axis=0)[None]
            # pack prepend valid-first
            embeds = jnp.roll(embeds, -(TEXT_BUCKET - first_n), axis=1)
            valid_tokens = first_n + n_frames * fnt + jnp.maximum(
                n_frames - 1, 0) * itv
            # gates at each frame's last token (chunk-local indices); the
            # lm_head runs only on these K rows, not the whole chunk
            ends = (first_n + fnt - 1
                    + jnp.arange(K, dtype=jnp.int32) * per)
            logits, cache = llama.forward(
                params["llama"], cfg=cfg.llama, inputs_embeds=embeds,
                kv_cache=cache, num_valid=valid_tokens[None],
                lora=params.get("lora"), lora_scaling=scaling,
                attn_impl=self.attn_impl,
                logit_gather_positions=ends[None])
            rows = logits[0].astype(jnp.float32)             # (K, V)
            if gate_bias:
                rows = rows.at[:, gate_ref_id].add(gate_bias)
            probs = jax.nn.softmax(rows, axis=-1)
            p_int = probs[:, gate_ref_id]
            masked = jnp.where((p_int < threshold)[:, None],
                               probs.at[:, gate_ref_id].set(0.0), probs)
            next_ids = jnp.argmax(masked, axis=-1).astype(jnp.int32)
            fires = jnp.logical_and(next_ids != gate_ref_id,
                                    jnp.arange(K) < n_frames)
            any_fire = fires.any()
            first_fire = jnp.argmax(fires)  # 0 if none; guarded by any_fire
            consumed = jnp.where(any_fire, first_fire + 1, n_frames)
            consumed_tokens = (first_n + consumed * fnt
                               + jnp.maximum(consumed - 1, 0) * itv)
            # rewind the ring to the last consumed frame's end (trim)
            base = cache.offset - valid_tokens  # offset before this append
            cache = cache._replace(offset=base + consumed_tokens)
            last_idx = jnp.clip(consumed - 1, 0, K - 1)
            return cache, consumed, any_fire, next_ids[last_idx]

        def ingest_chunk(params, cache, first_text, first_n, frames, n_frames,
                         threshold):
            cache, consumed, any_fire, next_id = _chunk_core(
                params, cache, first_text, first_n, frames, n_frames,
                threshold)
            packed = jnp.stack([consumed, any_fire.astype(jnp.int32),
                                next_id, cache.offset[0]])
            return cache, packed

        max_new = self.max_new  # = stream_tokens when token-streaming
        spec_on = self.spec_decode

        def _generate(params, cache, sel_ids, sel_n, hist, hcount, stats,
                      hist_n=None):
            """One response generation: greedy, or n-gram speculative when
            the engine was built with spec_decode (byte-identical output;
            the history ring threads through every jitted program so
            pipelined dispatches chain it device-side like the prepend).
            ``hist_n`` (traced) overrides how many prompt tokens enter the
            history ring — 0 for token-streaming continuation segments,
            whose 1-token prompt is already in the ring as the previous
            segment's last emitted token. Returns (cache, length,
            out_ids_row, hist, hcount, stats)."""
            embeds = llama.embed_tokens(params["llama"], sel_ids, cfg.llama)
            embeds = _pack_valid_first(embeds, sel_ids.shape[1], sel_n)
            if spec_on:
                rolled = jnp.roll(sel_ids, -(sel_ids.shape[1] - sel_n),
                                  axis=1)
                forced = None
                if self._forced_script is not None:
                    # tiny (n_rows, budget) i32 constant (~KBs — safe to
                    # close over); stats[2] counts response turns and
                    # doubles as the device-side script cursor, so
                    # pipelined dispatches index it without a host sync
                    script = jnp.asarray(self._forced_script)
                    forced = script[stats[2] % script.shape[0]]
                out_ids, length, cache, hist, hcount, st = (
                    gen_mod.ngram_speculative_generate(
                        params, cfg, cache, embeds, sel_n[None], hist,
                        hcount, prompt_ids=rolled[0],
                        prompt_n=sel_n if hist_n is None else hist_n,
                        max_new_tokens=max_new, draft_len=self.spec_draft,
                        draft_mode=self.spec_draft_mode,
                        attn_impl=self.attn_impl, forced_ids=forced))
                if self._forced_script is not None:
                    stats = stats.at[:2].add(st).at[2].add(1)
                else:
                    stats = stats + st
            else:
                out_ids, length, cache = gen_mod.greedy_generate(
                    params, cfg, cache, embeds, sel_n[None],
                    max_new_tokens=max_new, attn_impl=self.attn_impl)
            return cache, length[0], out_ids[0], hist, hcount, stats

        def _respond_tail(params, cache, consumed, n_frames, any_fire,
                          next_id, query_ids, query_n, gen_ids, gen_n,
                          query_at_end, hist, hcount, stats):
            """Device-side response arbitration + generation, fused behind
            an ingest step. Mirrors the host logic of
            _stream_until_trigger/_respond_at exactly:
              * burst completed AND a query waits at/before the last frame's
                time -> QUERY response (this also covers the reference's
                query-priority rule when the gate fires at the query's exact
                frame, demo/inference.py:72-81);
              * gate fired earlier in the burst -> gate response with the
                static ']\\nAssistant:' prompt (demo/inference.py:43-45);
              * otherwise no response.
            Both prompts ride in the SAME bucket; selection is on device so
            the whole decision costs zero extra host round-trips."""
            full = consumed == n_frames
            query_triggers = jnp.logical_and(full, query_at_end)
            use_gen = jnp.logical_and(any_fire,
                                      jnp.logical_not(query_triggers))
            do_respond = jnp.logical_or(any_fire, query_triggers)
            sel_ids = jnp.where(use_gen, gen_ids, query_ids)
            sel_n = jnp.where(use_gen, gen_n, query_n)

            def respond_branch(op):
                cache, hist, hcount, stats = op
                cache, length, out, hist, hcount, stats = _generate(
                    params, cache, sel_ids, sel_n, hist, hcount, stats)
                return cache, length, out, hist, hcount, stats

            def no_respond(op):
                cache, hist, hcount, stats = op
                return (cache, jnp.asarray(0, jnp.int32),
                        jnp.zeros((max_new,), jnp.int32), hist, hcount,
                        stats)

            cache, length, out_ids, hist, hcount, stats = jax.lax.cond(
                do_respond, respond_branch, no_respond,
                (cache, hist, hcount, stats))
            # ONE packed readback for the whole step:
            # [consumed, fire, next_id, responded, used_gen, resp_len,
            #  offset, resp ids...]
            packed = jnp.concatenate([
                jnp.stack([consumed, any_fire.astype(jnp.int32), next_id,
                           do_respond.astype(jnp.int32),
                           use_gen.astype(jnp.int32), length,
                           cache.offset[0]]),
                out_ids])
            return cache, packed, hist, hcount, stats

        def ingest_chunk_respond(params, cache, first_text, first_n, frames,
                                 n_frames, threshold, query_ids, query_n,
                                 gen_ids, gen_n, query_at_end, hist, hcount,
                                 stats):
            cache, consumed, any_fire, next_id = _chunk_core(
                params, cache, first_text, first_n, frames, n_frames,
                threshold)
            return _respond_tail(params, cache, consumed, n_frames, any_fire,
                                 next_id, query_ids, query_n, gen_ids, gen_n,
                                 query_at_end, hist, hcount, stats)

        def _multichunk_core(params, cache, first_text, first_n, frames,
                             n_frames, threshold):
            """Whole-burst ingest: a device-side while_loop over CHUNK_FRAMES
            chunk steps — a catch-up burst of up to frames.shape[0] frames
            runs in ONE dispatch, early-exiting at the first gate fire. A
            non-fired chunk's predicted continuation IS the interval token
            (fire is defined as next_id != interval), so feeding the static
            interval prepend between chunks is exactly the sequential
            engine's behavior."""
            M = frames.shape[0]  # static burst bucket, multiple of CHUNK
            interval_text = jnp.zeros((TEXT_BUCKET,), jnp.int32)
            interval_text = interval_text.at[-1].set(
                gate_ref_id if use_interval else 0)
            interval_n = jnp.asarray(1 if use_interval else 0, jnp.int32)

            def cond(st):
                c, _, consumed, fire, _ = st
                return jnp.logical_and(consumed < n_frames,
                                       jnp.logical_not(fire))

            def body(st):
                c, cache, consumed, _, _ = st
                base = c * CHUNK_FRAMES
                chunk = jax.lax.dynamic_slice(
                    frames, (base, 0, 0), (CHUNK_FRAMES, fnt, self.hidden))
                k = jnp.minimum(n_frames - base, CHUNK_FRAMES)
                text = jnp.where(c == 0, first_text, interval_text)
                ntext = jnp.where(c == 0, first_n, interval_n)
                cache, cons, fire, nid = _chunk_core(
                    params, cache, text, ntext, chunk, k, threshold)
                return c + 1, cache, consumed + cons, fire, nid

            _, cache, consumed, fire, next_id = jax.lax.while_loop(
                cond, body,
                (jnp.asarray(0, jnp.int32), cache,
                 jnp.asarray(0, jnp.int32), jnp.asarray(False),
                 jnp.asarray(0, jnp.int32)))
            return cache, consumed, fire, next_id

        def ingest_burstloop_respond(params, cache, first_text, first_n,
                                     frames, n_frames, threshold, query_ids,
                                     query_n, gen_ids, gen_n, query_at_end,
                                     hist, hcount, stats):
            cache, consumed, any_fire, next_id = _multichunk_core(
                params, cache, first_text, first_n, frames, n_frames,
                threshold)
            return _respond_tail(params, cache, consumed, n_frames, any_fire,
                                 next_id, query_ids, query_n, gen_ids, gen_n,
                                 query_at_end, hist, hcount, stats)

        def ingest_burst_respond(params, cache, first_text, first_n, frames,
                                 n_frames, threshold, query_ids, query_n,
                                 gen_ids, gen_n, query_at_end, hist, hcount,
                                 stats):
            cache, consumed, any_fire, next_id = _burst_core(
                params, cache, first_text, first_n, frames, n_frames,
                threshold)
            return _respond_tail(params, cache, consumed, n_frames, any_fire,
                                 next_id, query_ids, query_n, gen_ids, gen_n,
                                 query_at_end, hist, hcount, stats)

        reopen = [int(i) for i in self._stream_prompt_ids]
        n_eos_pre = 1 + len(reopen)
        assert n_eos_pre <= TEXT_BUCKET, (reopen, TEXT_BUCKET)
        eos_id = cfg.eos_token_id

        def _post_response_prepend(out_ids, length):
            """The prepend the host's _finish_response would queue after a
            response: [last] (+ the '\\n[' stream-reopen ids when last is
            EOS, reference demo/inference.py:64-66), right-aligned in the
            TEXT_BUCKET. length==0 -> empty prepend."""
            last = out_ids[jnp.clip(length - 1, 0, max_new - 1)]
            eos_buf = jnp.zeros((TEXT_BUCKET,), jnp.int32)
            if reopen:
                eos_buf = eos_buf.at[TEXT_BUCKET - len(reopen):].set(
                    jnp.asarray(reopen, jnp.int32))
            eos_buf = eos_buf.at[TEXT_BUCKET - n_eos_pre].set(last)
            plain_buf = jnp.zeros((TEXT_BUCKET,), jnp.int32).at[-1].set(last)
            is_eos = last == eos_id
            text = jnp.where(is_eos, eos_buf, plain_buf)
            n = jnp.where(is_eos, n_eos_pre, 1)
            empty = length == 0
            return (jnp.where(empty, jnp.zeros_like(text), text),
                    jnp.where(empty, 0, n).astype(jnp.int32))

        def ingest_stream(params, cache, first_text, first_n, frames,
                          n_frames, threshold, query_ids, query_n, gen_ids,
                          gen_n, query_at_end, hist, hcount, stats):
            """The whole streaming cycle as ONE device program: a while_loop
            over chunk steps that, on each gate fire, runs the full response
            turn (prompt prefill + greedy generation) INLINE and continues
            ingesting with the post-response prepend — up to R_STREAM
            responses per dispatch. The host's only work per dispatch is
            queue bookkeeping off one packed readback; sequential-engine
            semantics (arbitration, query priority, prepends) are exactly
            those of _stream_until_trigger/_respond_at (oracle-tested).

            Packed layout (int32): [consumed, n_resp, next_id,
            last_was_resp, offset, resp_len*R, resp_used_gen*R,
            resp_fidx*R, resp_ids*(R*max_new)]."""
            interval_text = jnp.zeros((TEXT_BUCKET,), jnp.int32)
            interval_text = interval_text.at[-1].set(
                gate_ref_id if use_interval else 0)
            interval_n = jnp.asarray(1 if use_interval else 0, jnp.int32)

            def cond(st):
                consumed, n_resp = st[1], st[2]
                return jnp.logical_and(consumed < n_frames,
                                       n_resp < R_STREAM)

            def respond_branch(op, sel_ids, sel_n):
                cache, hist, hcount, stats = op
                return _generate(params, cache, sel_ids, sel_n, hist,
                                 hcount, stats)

            def record(do, n_resp, slot_arrays, out, length, use_gen,
                       consumed):
                r_ids, r_len, r_gen, r_fidx = slot_arrays
                slot = jnp.where(do, n_resp, R_STREAM - 1)
                r_ids = jax.lax.cond(
                    do,
                    lambda b: jax.lax.dynamic_update_slice(
                        b, out[None], (slot, 0)),
                    lambda b: b, r_ids)
                r_len = jnp.where(do, r_len.at[slot].set(length), r_len)
                r_gen = jnp.where(
                    do, r_gen.at[slot].set(use_gen.astype(jnp.int32)), r_gen)
                r_fidx = jnp.where(do, r_fidx.at[slot].set(consumed - 1),
                                   r_fidx)
                return (r_ids, r_len, r_gen, r_fidx,
                        n_resp + do.astype(jnp.int32))

            def body(st):
                (cache, consumed, n_resp, pre_text, pre_n, _next_id,
                 _lwr, _tail, _tgen, r_ids, r_len, r_gen, r_fidx,
                 hist, hcount, stats) = st
                chunk = jax.lax.dynamic_slice(
                    frames, (consumed, 0, 0),
                    (CHUNK_FRAMES, fnt, self.hidden))
                k = jnp.minimum(n_frames - consumed, CHUNK_FRAMES)
                cache, cons, fire, nid = _chunk_core(
                    params, cache, pre_text, pre_n, chunk, k, threshold)
                consumed = consumed + cons
                full = consumed == n_frames
                query_triggers = jnp.logical_and(full, query_at_end)
                use_gen = jnp.logical_and(fire,
                                          jnp.logical_not(query_triggers))
                do_respond = jnp.logical_or(fire, query_triggers)
                # a respond at the burst END (the common case: one query
                # turn per burst) hoists OUT of this while_loop — XLA
                # schedules the post-loop decode measurably faster than
                # the same while_loop nested here (~1.5-3 ms/token)
                do_inline = jnp.logical_and(do_respond,
                                            jnp.logical_not(full))
                sel_ids = jnp.where(use_gen, gen_ids, query_ids)
                sel_n = jnp.where(use_gen, gen_n, query_n)

                cache, length, out, hist, hcount, stats = jax.lax.cond(
                    do_inline,
                    lambda op: respond_branch(op, sel_ids, sel_n),
                    lambda op: (op[0], jnp.asarray(0, jnp.int32),
                                jnp.zeros((max_new,), jnp.int32),
                                op[1], op[2], op[3]),
                    (cache, hist, hcount, stats))
                r_ids, r_len, r_gen, r_fidx, n_resp = record(
                    do_inline, n_resp, (r_ids, r_len, r_gen, r_fidx), out,
                    length, use_gen, consumed)
                rp_text, rp_n = _post_response_prepend(out, length)
                pre_text = jnp.where(do_inline, rp_text, interval_text)
                pre_n = jnp.where(do_inline, rp_n, interval_n)
                tail = jnp.logical_and(do_respond, full)
                return (cache, consumed, n_resp, pre_text, pre_n, nid,
                        do_inline, tail, use_gen, r_ids, r_len, r_gen,
                        r_fidx, hist, hcount, stats)

            init = (cache, jnp.asarray(0, jnp.int32),
                    jnp.asarray(0, jnp.int32), first_text, first_n,
                    jnp.asarray(0, jnp.int32), jnp.asarray(False),
                    jnp.asarray(False), jnp.asarray(False),
                    jnp.zeros((R_STREAM, max_new), jnp.int32),
                    jnp.zeros((R_STREAM,), jnp.int32),
                    jnp.zeros((R_STREAM,), jnp.int32),
                    jnp.zeros((R_STREAM,), jnp.int32), hist, hcount, stats)
            (cache, consumed, n_resp, pre_text, pre_n, next_id, lwr, tail,
             tail_gen, r_ids, r_len, r_gen,
             r_fidx, hist, hcount, stats) = jax.lax.while_loop(
                 cond, body, init)

            # burst-end response turn, hoisted out of the loop
            t_ids = jnp.where(tail_gen, gen_ids, query_ids)
            t_n = jnp.where(tail_gen, gen_n, query_n)
            cache, t_len, t_out, hist, hcount, stats = jax.lax.cond(
                tail,
                lambda op: respond_branch(op, t_ids, t_n),
                lambda op: (op[0], jnp.asarray(0, jnp.int32),
                            jnp.zeros((max_new,), jnp.int32),
                            op[1], op[2], op[3]),
                (cache, hist, hcount, stats))
            r_ids, r_len, r_gen, r_fidx, n_resp = record(
                tail, n_resp, (r_ids, r_len, r_gen, r_fidx), t_out, t_len,
                tail_gen, consumed)
            t_text, t_pre_n = _post_response_prepend(t_out, t_len)
            pre_text = jnp.where(tail, t_text, pre_text)
            pre_n = jnp.where(tail, t_pre_n, pre_n)
            lwr = jnp.logical_or(lwr, tail)

            packed = jnp.concatenate([
                jnp.stack([consumed, n_resp, next_id,
                           lwr.astype(jnp.int32), cache.offset[0]]),
                r_len, r_gen, r_fidx, r_ids.reshape(-1)])
            # (pre_text, pre_n) = the NEXT dispatch's prepend, still on
            # device: the pipelined driver chains dispatches through them
            # with no host readback in between (hist/stats chain the same
            # way — the history ring never needs a host readback)
            return cache, packed, pre_text, pre_n, hist, hcount, stats

        def respond(params, cache, prompt_ids, num_valid, start_offset,
                    hist, hcount, stats, hist_valid):
            """start_offset rewinds the ring before the prompt append — the
            host mirror in the normal path; the ROLLBACK point when a
            speculative frame dispatch must be discarded (its stale KV
            beyond start_offset is overwritten by the prompt/response and
            never attended, the trim-on-fire mechanism). ``hist_valid``
            (1,) = prompt tokens to record in the spec-decode history ring
            (0 for continuation segments, == num_valid otherwise)."""
            cache = cache._replace(offset=start_offset)
            cache, length, out_row, hist, hcount, stats = _generate(
                params, cache, prompt_ids, num_valid[0], hist, hcount,
                stats, hist_n=hist_valid[0])
            # single packed readback: [length, new_offset, token ids...]
            packed = jnp.concatenate([
                length.reshape(1).astype(jnp.int32),
                cache.offset[:1].astype(jnp.int32),
                out_row.astype(jnp.int32)])
            return packed, cache, hist, hcount, stats

        self._compact_jit = jax.jit(llama.compact_kv_cache,
                                    donate_argnums=(0,))
        self._set_offset_jit = jax.jit(
            lambda c, o: c._replace(offset=o), donate_argnums=(0,))
        self._prefill = jax.jit(prefill, donate_argnums=(1,))
        self._ingest = jax.jit(ingest_burst, donate_argnums=(1,))
        self._ingest_chunk = jax.jit(ingest_chunk, donate_argnums=(1,))
        _don = ("cache", "hist", "hcount", "stats")
        self._ingest_chunk_respond = jax.jit(ingest_chunk_respond,
                                             donate_argnames=_don)
        self._ingest_burst_respond = jax.jit(ingest_burst_respond,
                                             donate_argnames=_don)
        self._ingest_burstloop_respond = jax.jit(ingest_burstloop_respond,
                                                 donate_argnames=_don)
        self._ingest_stream = jax.jit(ingest_stream, donate_argnames=_don)
        self._respond = jax.jit(respond, donate_argnames=_don)
        self._project = jax.jit(
            lambda p, feats: live.visual_embed(p, feats, cfg))

        def project_padded(p, feats, out_len: int):
            """Project AND zero-pad to the burst-operand length in one
            dispatch: when a burst is one whole input feed (the sustained
            steady state), the padded projector output IS the ingest
            operand — no assembly dispatch at all."""
            flat = live.visual_embed(p, feats, cfg)
            flat = flat.reshape(-1, fnt, self.hidden)
            pad = jnp.zeros((out_len - flat.shape[0], fnt, self.hidden),
                            flat.dtype)
            return jnp.concatenate([flat, pad], axis=0)

        self._project_padded = jax.jit(project_padded, static_argnums=(2,))

        if self.vision_params is not None:
            def encode_frames(vparams, cparams, pixels):
                # shared vision-tower + connector composition
                # (models/live.pixels_to_embeds; multistream uses the same)
                return live.pixels_to_embeds(vparams, cparams, pixels, cfg)

            if self.encoder_device is not None:
                self.vision_params = jax.device_put(self.vision_params,
                                                    self.encoder_device)
                self._enc_connector = jax.device_put(
                    self.params["connector"], self.encoder_device)
                # placement follows the committed inputs (vision params,
                # connector and pixels are device_put onto encoder_device
                # above/below) — the jit(device=...) kwarg is deprecated
                enc = jax.jit(encode_frames)
                decoder_dev = jax.devices()[0]

                def encode_then_move(vp, _params, pixels):
                    pixels = jax.device_put(pixels, self.encoder_device)
                    out = enc(vp, {"connector": self._enc_connector}, pixels)
                    # async transfer to the decoder chip; dispatch returns
                    # immediately so encode(t+1) overlaps decode(t)
                    return jax.device_put(out, decoder_dev)

                self._encode_frames = encode_then_move
            else:
                self._encode_frames = jax.jit(encode_frames)

    # ---------------------------------------------------------------- state
    def reset(self):
        self.query_queue = collections.deque()
        self.frame_embeds_queue = collections.deque()
        self.video_time = 0.0
        self.last_frame_idx = -1
        self.video_tensor = None
        self.num_video_frames = 0
        self.cache = llama.init_kv_cache(
            self.cfg.llama, batch=1, capacity=self.kv_capacity,
            dtype=jnp.dtype(self.cfg.llama.dtype), quant=self.kv_quant)
        # host mirror of cache.offset[0]: guards consult it without a
        # device readback (every readback is a tunnel RTT); kept exact from
        # the packed results of each dispatch
        self._host_offset = 0
        self._started = False
        # pending text prepend (token ids) to feed before the next frame
        self._pending_prepend: List[int] = []
        # speculative pipeline: unresolved single-frame dispatches, oldest
        # first; each entry = {time, embed, packed, tokens}
        self._spec_queue: collections.deque = collections.deque()
        # responses already produced by a multi-response ingest_stream
        # dispatch, surfaced one per __call__
        self._resp_out: collections.deque = collections.deque()
        # pipelined sustained mode: unresolved ingest_stream dispatches,
        # oldest first; each = {k, times, embeds, qae, query, packed, worst}
        self._pipe: collections.deque = collections.deque()
        self._pipe_blocked = False
        # device-resident prepend chaining the next pipelined dispatch
        # (valid while _pipe is non-empty; host mirror takes over after)
        self._carry = None
        # spec_decode state: token-history ring + total count + accumulated
        # [verify_steps, emitted_tokens]. Threaded through every jitted
        # program (pass-through when spec_decode is off), never read back
        # on the hot path. Rolled-back pipelined dispatches may leave
        # phantom tokens in the ring — that only perturbs draft quality,
        # never output (verification).
        self._hist = jnp.zeros((gen_mod.SPEC_HIST,), jnp.int32)
        self._hcount = jnp.zeros((), jnp.int32)
        # forced replay carries a third element: response-turn count =
        # the device-side script cursor (see _generate)
        self._sstats = jnp.zeros(
            (3 if self._forced_script is not None else 2,), jnp.int32)

    # ------------------------------------------------------------------ I/O
    def load_video(self, video: Any):
        """Accepts (T, 3, H, W) uint8 frames, (T, vision_hidden) /
        (T, fnt, vision_hidden) pre-extracted features, or a path loadable by
        data.video_io. Mirrors demo/inference.py:111-115."""
        if isinstance(video, str):
            from ..data.video_io import read_video_frames
            video = read_video_frames(video, fps=self.frame_fps,
                                      resolution=self.cfg.frame_resolution)
        video = np.asarray(video)
        self.video_tensor = video
        self.num_video_frames = video.shape[0]
        self.video_duration = video.shape[0] / self.frame_fps

    def spec_stats(self) -> np.ndarray:
        """[verify_steps, emitted_tokens] accumulated by spec_decode
        responses (one device readback; call off the hot path). Mean
        accepted drafts per step = tokens/steps - 1."""
        return np.asarray(self._sstats)[:2]

    def stats(self) -> Dict[str, Any]:
        """Serving observability snapshot (host state only — zero device
        readbacks): cache occupancy, queue depths, in-flight speculative
        and pipelined dispatches (MultiStreamEngine.stats's single-stream
        sibling)."""
        return {
            "offset": int(self._host_offset),
            "kv_capacity": self.kv_capacity,
            "queued_frames": len(self.frame_embeds_queue),
            "queued_queries": len(self.query_queue),
            "pending_responses": len(self._resp_out),
            "inflight_speculative": len(self._spec_queue),
            "inflight_pipelined": len(self._pipe),
            "video_time": float(self.video_time),
        }

    def swap_params(self, params):
        """Hot-swap model weights (e.g., a freshly trained LoRA adapter)
        without recompiling: params are traced ARGUMENTS of every jitted
        program, so an identical-structure tree serves the very next
        dispatch — the reference must rebuild its whole PEFT model to
        change adapters (modeling_live.py:203-216). The new tree must
        match the old one's structure/shapes/dtypes; a silent mismatch
        would recompile 5-10 min remote programs, so it raises instead."""
        _check_same_tree(self.params, params)
        self.params = params
        if self.vision_params is not None and self.encoder_device is not None:
            self._enc_connector = jax.device_put(params["connector"],
                                                 self.encoder_device)

    def maybe_backoff_spec(self, *, min_tokens_per_step: float = 1.15,
                           min_steps: int = 64):
        """Spec-decode auto-backoff (adversarial-text guard, VERDICT r3
        #3): when measured acceptance is so low that drafting is a net
        loss (8B adversarial row runs ~3% below plain greedy at
        acceptance 1.00 tokens/step, BENCH_NOTES r4), switch this engine
        to plain greedy decoding. One device readback + one program
        rebuild (persistent compile cache makes repeat switches instant);
        in-flight dispatches are resolved first via flush(). Call OFF the
        hot path — e.g. every few responses. Returns (backed_off,
        responses_drained_by_flush)."""
        if not self.spec_decode:
            return False, []
        steps, emitted = (int(x) for x in self.spec_stats())
        if steps < min_steps or emitted >= min_tokens_per_step * steps:
            return False, []
        drained = self.flush()
        self.spec_decode = False
        self._build_jitted()
        return True, drained

    def set_threshold(self, threshold: float):
        """Adjust the streaming gate threshold at runtime without a
        recompile (the Gradio slider, reference demo/app.py:54-57) — the
        threshold is a traced argument of the jitted burst step."""
        self.cfg = self.cfg.replace(frame_token_interval_threshold=float(threshold))

    def input_query_stream(self, query: str, video_time: Optional[float] = None):
        """Queue a user query; returns the user-facing NOTE string the
        reference shows in the chat box (demo/inference.py:93-100)."""
        t = self.video_time if video_time is None else video_time
        self.query_queue.append((t, query))
        if not self._started:
            return (f'(NOTE: No video stream here. Please select or upload '
                    f'a video. Then the assistant will answer "{query} (at '
                    f'{self.video_time}s)" in the video stream)')
        return (f'(NOTE: Received "{query}" (at {self.video_time}s). Please '
                f'wait until previous frames have been processed)')

    def input_video_stream(self, video_time: float):
        """Encode/enqueue all frames up to ``video_time``
        (demo/inference.py:102-109)."""
        frame_idx = int(video_time * self.frame_fps)
        frame_idx = min(frame_idx, self.num_video_frames - 1)
        if frame_idx > self.last_frame_idx:
            rng = range(self.last_frame_idx + 1, frame_idx + 1)
            chunk = self.video_tensor[rng.start:rng.stop]
            embeds = self._embed_chunk(chunk)
            for off, r in enumerate(rng):
                self.frame_embeds_queue.append(
                    (r / self.frame_fps, _FrameRef(embeds, off)))
            self.last_frame_idx = frame_idx
        self.video_time = video_time

    def _embed_chunk(self, chunk: np.ndarray) -> jax.Array:
        """(T, ...) raw frames or features -> (T, fnt, hidden) device array."""
        if chunk.dtype == np.uint8:
            assert self.vision_params is not None, (
                "raw pixel input needs vision_params (set_vision_inside "
                "equivalent, modeling_live.py:12)")
            return self._encode_frames(self.vision_params, self.params,
                                       jnp.asarray(chunk))
        feats = jnp.asarray(chunk)
        if feats.ndim == 2:  # (T, vision_hidden) = live1 layout
            feats = feats[:, None, :]
        T = feats.shape[0]
        fb = next((b for b in BURST_BUCKETS if b >= T), None)
        if fb is not None:
            # pad to the burst bucket inside the projector dispatch — a
            # whole-feed burst then reuses this array as its operand
            return self._project_padded(self.params, feats,
                                        fb + CHUNK_FRAMES)
        flat = self._project(self.params, feats)
        return flat.reshape(-1, self.frame_num_tokens, self.hidden)

    def _frames_operand(self, group, out_len: int) -> jax.Array:
        """(out_len, fnt, D) burst operand from queue entries. A contiguous
        run of refs into one source chunk assembles with a single
        dynamic_slice+pad dispatch (the common case: each input feed is one
        chunk); anything else stacks materialized rows. Pad rows are zeros —
        they sit after the valid sequence (causal mask) and their ring
        writes land beyond the consumed offset (trimmed), so values are
        never observed."""
        k = len(group)
        run = _contiguous_ref_run(group)
        if run is not None:
            src, i0 = run
            if i0 == 0 and src.shape[0] == out_len:
                # whole-feed burst over a bucket-padded projector output:
                # the stored chunk IS the operand — zero dispatches
                return src
            return _slice_pad_frames(src, i0, k=k, out_len=out_len)
        rows = jnp.stack([_frame_row(e) for e in group])
        if out_len == k:
            return rows
        pad = jnp.zeros((out_len - k,) + rows.shape[1:], rows.dtype)
        return jnp.concatenate([rows, pad], axis=0)

    # ------------------------------------------------------------- main loop
    def __call__(self) -> Tuple[Optional[str], Optional[str]]:
        """One streaming step: ingest queued frames until the model decides
        to respond or a query interleaves; then generate the response.
        Returns (query, response) like demo/inference.py:117-124."""
        if self._resp_out:
            return self._resp_out.popleft()
        if self.speculative:
            return self._call_spec()
        if self.pipelined:
            return self._call_pipe()
        if not self.frame_embeds_queue:
            return None, None
        if self.fused_respond:
            if self.multi_respond:
                return self._call_stream()
            return self._call_fused()
        video_time, query = self._stream_until_trigger()
        if video_time is None:
            return None, None
        return self._respond_at(video_time, query)

    # -------------------------------------------------- speculative pipeline
    def _spec_offset(self) -> int:
        """Worst-case ring occupancy assuming every in-flight speculative
        dispatch lands (exact when none fires — fires rewind)."""
        return self._host_offset + sum(e["tokens"] for e in self._spec_queue)

    def _spec_fill(self):
        """Dispatch queued frames one at a time up to pipeline depth 2,
        never crossing a query boundary. The assumed prepend for each next
        frame is the interval token — exactly what a non-fired gate
        predicts (fire is DEFINED as next_id != interval)."""
        iv = self.cfg.frame_token_interval_id
        thr = self._dev_thr()
        while len(self._spec_queue) < 2 and self.frame_embeds_queue:
            t, emb = self.frame_embeds_queue[0]
            if self.query_queue and t > self.query_queue[0][0]:
                break  # the query must be answered before this frame
            worst = (self._spec_offset() + TEXT_BUCKET + self.frame_num_tokens
                     + self._gen_prompt_bucket + self.cfg.max_response_tokens)
            if worst > self.kv_capacity:
                if self._spec_queue:
                    break  # resolve in-flight work first, then compact
                worst = self._maybe_compact(worst)
                if worst > self.kv_capacity:
                    raise RuntimeError(
                        f"KV ring capacity {self.kv_capacity} would be "
                        f"exceeded (offset {self._host_offset}); raise "
                        f"kv_capacity, set stream_window, or reset()")
            first_text, first_n, n_pre = self._take_prepend()
            self.cache, packed = self._ingest(
                self.params, self.cache, first_text, first_n,
                self._frames_operand([emb], 1), self._dev_i32(1), thr)
            try:
                packed.copy_to_host_async()  # overlap transfer with compute
            except Exception:
                pass
            self.frame_embeds_queue.popleft()
            self._spec_queue.append({
                "time": t, "embed": emb, "packed": packed,
                "tokens": n_pre + self.frame_num_tokens})
            # assumed continuation if this frame's gate holds
            self._pending_prepend = [iv] if iv is not None else []

    def _spec_discard_newer(self):
        """Roll back newer in-flight dispatches: re-queue their frames (the
        ring offset rewind happens in the respond dispatch that follows)."""
        while self._spec_queue:
            newer = self._spec_queue.pop()
            self.frame_embeds_queue.appendleft((newer["time"],
                                                newer["embed"]))

    def _call_spec(self, force_resolve: bool = False
                   ) -> Tuple[Optional[str], Optional[str]]:
        # multi-frame backlog with an idle pipeline: the chunked fused path
        # beats per-frame pipelining
        if not self._spec_queue and len(self.frame_embeds_queue) > 1:
            return self._call_fused()
        self._spec_fill()
        # the pipelining contract: leave the newest dispatch unresolved so
        # its readback overlaps the NEXT frame's dispatch+compute — resolve
        # only when a newer dispatch is already in flight, a query might be
        # due, or the caller is draining (flush)
        resolve = force_resolve or len(self._spec_queue) >= 2 \
            or bool(self.query_queue)
        if self._spec_queue and resolve:
            e = self._spec_queue.popleft()
            packed = np.asarray(e["packed"])  # overlapped by async copy
            fire = bool(packed[1])
            next_id = int(packed[2])
            offset = int(packed[3])
            self.video_time_processed = e["time"]
            self._host_offset = offset
            if fire:
                self._spec_discard_newer()
                self._pending_prepend = []
                if self.query_queue and e["time"] >= self.query_queue[0][0]:
                    # reference checks the query before the gate per frame
                    t, q = self.query_queue.popleft()
                    return self._respond_at(t, q)
                return self._respond_at(e["time"], None)
            # not fired: the already-dispatched successor assumed exactly
            # this continuation; only a due query interrupts the pipeline
            if self.query_queue and e["time"] >= self.query_queue[0][0]:
                self._spec_discard_newer()
                t, q = self.query_queue.popleft()
                self._pending_prepend = []
                return self._respond_at(t, q)
            return None, None
        # idle pipeline: a query strictly earlier than the next frame
        # answers now (the blocking engine never answers queries while the
        # frame queue is empty — reference __call__ gates on frames)
        if self.query_queue and self.frame_embeds_queue \
                and self.frame_embeds_queue[0][0] > self.query_queue[0][0]:
            t, q = self.query_queue.popleft()
            self._pending_prepend = []
            return self._respond_at(t, q)
        return None, None

    def flush(self) -> List[Tuple[Optional[str], str]]:
        """Resolve every in-flight speculative/pipelined dispatch (and any
        still-queued frames/queries they unblock), returning the responses
        produced. No-op on the blocking engine modes."""
        out = []
        while self._spec_queue or (self.speculative
                                   and self.frame_embeds_queue):
            q, r = self._call_spec(force_resolve=True)
            if r is not None:
                out.append((q, r))
            elif not self._spec_queue and not self.frame_embeds_queue:
                break
        while self._pipe or self._resp_out or (
                self.pipelined and self.frame_embeds_queue):
            q, r = self._call_pipe(force_resolve=True)
            if r is not None:
                out.append((q, r))
            elif not self._pipe and not self._resp_out \
                    and not self.frame_embeds_queue:
                break
        return out

    def _call_fused(self) -> Tuple[Optional[str], Optional[str]]:
        """The fused streaming step: each device dispatch ingests a frame
        burst AND (when the gate fires or a queued query comes due) generates
        the response in the same program — one packed readback carries
        [consumed, fire, next_id, responded, used_gen, resp_len, offset,
        response ids]. Control flow and transcripts are identical to
        _stream_until_trigger + _respond_at (oracle-equality tested)."""
        while self.frame_embeds_queue:
            # 1. query strictly earlier than the next frame -> answer now
            #    (no frames to ingest first; standalone respond dispatch)
            if self.query_queue and \
                    self.frame_embeds_queue[0][0] > self.query_queue[0][0]:
                t, q = self.query_queue.popleft()
                self._pending_prepend = []
                return self._respond_at(t, q)
            qt = self.query_queue[0][0] if self.query_queue else None
            burst_times, burst_embeds = [], []
            for t, e in self.frame_embeds_queue:
                if qt is not None and t > qt:
                    break
                burst_times.append(t)
                burst_embeds.append(e)
            if not burst_times:
                t, q = self.query_queue.popleft()
                self._pending_prepend = []
                return self._respond_at(t, q)
            query_at_end = qt is not None and burst_times[-1] >= qt

            # prompts for the fused response tail (device selects which)
            gen_prompt = self._gen_prompt_ids
            if query_at_end:
                query_prompt = self.tokenizer.apply_chat_template(
                    [{"role": "user", "content": self.query_queue[0][1]}],
                    tokenize=True, add_stream_query_prompt=True,
                    add_generation_prompt=True)
            else:
                query_prompt = gen_prompt
            n_max = max(len(gen_prompt), len(query_prompt))
            bucket = next((b for b in PROMPT_BUCKETS if b >= n_max), n_max)

            # capacity guard: burst + the worst prompt bucket + response
            worst = (self._host_offset + len(burst_times)
                     * (TEXT_BUCKET + self.frame_num_tokens)
                     + bucket + self.cfg.max_response_tokens)
            worst = self._maybe_compact(worst)
            if worst > self.kv_capacity:
                raise RuntimeError(
                    f"KV ring capacity {self.kv_capacity} would be exceeded "
                    f"(offset {self._host_offset}); raise "
                    f"kv_capacity, set stream_window, or reset() the stream")

            first_text, first_n, _ = self._take_prepend()
            thr = self._dev_thr()
            jq = self._dev_prompt(query_prompt, bucket)
            jg = self._dev_prompt(gen_prompt, bucket)
            jqn = self._dev_i32(len(query_prompt))
            jgn = self._dev_i32(len(gen_prompt))

            n = len(burst_embeds)
            iv = self.cfg.frame_token_interval_id
            cont_ids = [iv] if iv is not None else []
            cont_n = len(cont_ids)

            i = 0
            text, ntext = first_text, first_n
            while i < n:
                rem = n - i
                if rem > CHUNK_FRAMES:
                    # whole-burst device loop: up to BURST_BUCKETS[-1]
                    # frames in ONE dispatch (while_loop over chunk steps)
                    bucket = next((b for b in BURST_BUCKETS if b >= rem),
                                  BURST_BUCKETS[-1])
                    group = burst_embeds[i:i + bucket]
                    k = len(group)
                    last_chunk = (i + k) >= n
                    qae = self._dev_bool(query_at_end and last_chunk)
                    frames = self._frames_operand(group, bucket)
                    (self.cache, packed, self._hist, self._hcount,
                     self._sstats) = self._ingest_burstloop_respond(
                        self.params, self.cache, text, ntext, frames,
                        self._dev_i32(k), thr, jq, jqn, jg, jgn, qae,
                        self._hist, self._hcount, self._sstats)
                elif n >= 2:
                    group = burst_embeds[i:i + CHUNK_FRAMES]
                    k = len(group)
                    last_chunk = (i + k) >= n
                    qae = self._dev_bool(query_at_end and last_chunk)
                    frames = self._frames_operand(group, CHUNK_FRAMES)
                    (self.cache, packed, self._hist, self._hcount,
                     self._sstats) = self._ingest_chunk_respond(
                        self.params, self.cache, text, ntext, frames,
                        self._dev_i32(k), thr, jq, jqn, jg, jgn, qae,
                        self._hist, self._hcount, self._sstats)
                else:
                    group = burst_embeds[i:i + CHUNK_FRAMES]
                    k = len(group)
                    last_chunk = (i + k) >= n
                    qae = self._dev_bool(query_at_end and last_chunk)
                    frames = self._frames_operand(group, k)
                    (self.cache, packed, self._hist, self._hcount,
                     self._sstats) = self._ingest_burst_respond(
                        self.params, self.cache, text, ntext, frames,
                        self._dev_i32(k), thr, jq, jqn, jg, jgn, qae,
                        self._hist, self._hcount, self._sstats)
                packed = np.asarray(packed)  # the step's ONE readback
                consumed = int(packed[0])
                fire = bool(packed[1])
                next_id = int(packed[2])
                responded = bool(packed[3])
                used_gen = bool(packed[4])
                resp_len = int(packed[5])
                self._host_offset = int(packed[6])
                for _ in range(consumed):
                    self.frame_embeds_queue.popleft()
                if consumed:
                    self.video_time_processed = burst_times[i + consumed - 1]
                if responded:
                    out = packed[7:7 + resp_len]
                    if used_gen:
                        video_time = burst_times[i + consumed - 1]
                        query = None
                    else:
                        video_time, query = self.query_queue.popleft()
                    return self._finish_or_continue(out, video_time, query)
                if consumed:
                    self._pending_prepend = [next_id] if iv is not None else []
                text = self._dev_text(cont_ids)
                ntext = self._dev_i32(cont_n)
                i += consumed
        return None, None

    def _collect_burst(self) -> Optional[Dict[str, Any]]:
        """Burst-assembly prologue shared by the multi-response and
        pipelined drivers: frames up to the next query boundary, response
        prompts + bucket, the burst bucket, and the dispatch's R_STREAM
        worst-case token budget. Returns None when no frames precede the
        next query (callers take the host respond path)."""
        qt = self.query_queue[0][0] if self.query_queue else None
        burst_times, burst_embeds = [], []
        for t, e in self.frame_embeds_queue:
            if qt is not None and t > qt:
                break
            burst_times.append(t)
            burst_embeds.append(e)
        if not burst_times:
            return None
        query_at_end = qt is not None and burst_times[-1] >= qt
        gen_prompt = self._gen_prompt_ids
        if query_at_end:
            query_prompt = self.tokenizer.apply_chat_template(
                [{"role": "user", "content": self.query_queue[0][1]}],
                tokenize=True, add_stream_query_prompt=True,
                add_generation_prompt=True)
        else:
            query_prompt = gen_prompt
        n_max = max(len(gen_prompt), len(query_prompt))
        bucket = next((b for b in PROMPT_BUCKETS if b >= n_max), n_max)
        n = len(burst_times)
        fb = next((b for b in BURST_BUCKETS if b >= n), BURST_BUCKETS[-1])
        group = burst_embeds[:fb]
        k = len(group)
        worst = (k * (TEXT_BUCKET + self.frame_num_tokens)
                 + R_STREAM * (bucket + self.cfg.max_response_tokens))
        return {"times": burst_times, "group": group, "k": k, "fb": fb,
                "qae": query_at_end and k == n, "bucket": bucket,
                "query_prompt": query_prompt, "gen_prompt": gen_prompt,
                "worst": worst}

    def _dispatch_stream(self, b: Dict[str, Any], first_text, first_n):
        """One ingest_stream dispatch for a collected burst."""
        jq = self._dev_prompt(b["query_prompt"], b["bucket"])
        jg = self._dev_prompt(b["gen_prompt"], b["bucket"])
        # CHUNK_FRAMES slack keeps the device loop's dynamic_slice
        # in-bounds at every consumed offset
        frames = self._frames_operand(b["group"], b["fb"] + CHUNK_FRAMES)
        (cache, packed, pre_text, pre_n, self._hist, self._hcount,
         self._sstats) = self._ingest_stream(
            self.params, self.cache, first_text, first_n, frames,
            self._dev_i32(b["k"]), self._dev_thr(), jq,
            self._dev_i32(len(b["query_prompt"])), jg,
            self._dev_i32(len(b["gen_prompt"])), self._dev_bool(b["qae"]),
            self._hist, self._hcount, self._sstats)
        return cache, packed, pre_text, pre_n

    def _call_stream(self) -> Tuple[Optional[str], Optional[str]]:
        """Multi-response streaming step: one ingest_stream dispatch covers
        a whole burst INCLUDING up to R_STREAM inline response turns; the
        packed readback carries every response. Later responses queue in
        _resp_out (surfaced by subsequent __call__s), keeping the public
        one-response-per-call contract."""
        if self._resp_out:
            return self._resp_out.popleft()
        while self.frame_embeds_queue:
            if self.query_queue and \
                    self.frame_embeds_queue[0][0] > self.query_queue[0][0]:
                t, q = self.query_queue.popleft()
                self._pending_prepend = []
                return self._respond_at(t, q)
            b = self._collect_burst()
            if b is None:
                t, q = self.query_queue.popleft()
                self._pending_prepend = []
                return self._respond_at(t, q)
            if self._host_offset + b["worst"] > self.kv_capacity:
                # tight ring: the per-response-guarded fused path (it
                # compacts or fails loudly by its own single-turn rules
                # rather than this dispatch's R_STREAM-inflated budget)
                return self._call_fused()

            first_text, first_n, _ = self._take_prepend()
            self.cache, packed, _pt, _pn = self._dispatch_stream(
                b, first_text, first_n)
            consumed = self._absorb_stream_packed(
                np.asarray(packed), b["times"], query_src=None)
            for _ in range(consumed):
                self.frame_embeds_queue.popleft()
            if self._resp_out:
                return self._resp_out.popleft()
        return None, None

    def _absorb_stream_packed(self, packed: np.ndarray, burst_times,
                              query_src) -> int:
        """Digest one ingest_stream packed readback: update the offset
        mirror, queue response transcripts in _resp_out, and set the host
        prepend mirror. query_src: None = pop answered queries from
        query_queue (blocking driver); else the (t, query) the pipelined
        driver popped eagerly at dispatch. Returns frames consumed."""
        max_new = self.max_new
        iv = self.cfg.frame_token_interval_id
        consumed = int(packed[0])
        n_resp = int(packed[1])
        next_id = int(packed[2])
        last_was_resp = bool(packed[3])
        self._host_offset = int(packed[4])
        r_len = packed[5:5 + R_STREAM]
        r_gen = packed[5 + R_STREAM:5 + 2 * R_STREAM]
        r_fidx = packed[5 + 2 * R_STREAM:5 + 3 * R_STREAM]
        r_ids = packed[5 + 3 * R_STREAM:].reshape(R_STREAM, max_new)

        if consumed:
            self.video_time_processed = burst_times[consumed - 1]
        for r in range(n_resp):
            out = r_ids[r, :int(r_len[r])]
            if int(r_gen[r]):
                video_time, query = burst_times[int(r_fidx[r])], None
            elif query_src is not None:
                video_time, query = query_src
            else:
                video_time, query = self.query_queue.popleft()
            if r == n_resp - 1 and last_was_resp:
                # the final response's prepend was not consumed by the
                # device loop; _finish_response queues it host-side
                self._resp_out.append(
                    self._finish_response(out, video_time, query))
            else:
                resp = self.tokenizer.decode(np.asarray(out, np.int32),
                                             skip_special_tokens=True)
                q_str = (f"(Video Time = {video_time}s) User: {query}"
                         if query else None)
                self._resp_out.append(
                    (q_str, f"(Video Time = {video_time}s) Assistant:{resp}"))
        if consumed and not last_was_resp:
            self._pending_prepend = [next_id] if iv is not None else []
        return consumed

    # ---------------------------------------------- pipelined sustained mode
    def _pipe_worst(self) -> int:
        """Worst-case ring occupancy with every in-flight dispatch landing
        at its full response budget."""
        return self._host_offset + sum(e["worst"] for e in self._pipe)

    def _pipe_fill(self):
        """Dispatch queued bursts up to the pipeline depth. Dispatches
        chain through the device-resident prepend (ingest_stream's
        pre_text/pre_n outputs), so no host readback sits between them;
        queries at a burst end are popped eagerly (the device WILL answer
        them — guaranteed unless R_STREAM exhausts mid-burst, which
        resolution rolls back). Sets _pipe_blocked when the capacity guard
        stops a dispatch — _call_pipe then resolves in-flight work (or
        falls back to the blocking fused step) so progress is guaranteed."""
        self._pipe_blocked = False
        while len(self._pipe) < self.pipeline_depth \
                and self.frame_embeds_queue:
            if self.query_queue and \
                    self.frame_embeds_queue[0][0] > self.query_queue[0][0]:
                break  # standalone query turn: host respond path, pipe empty
            b = self._collect_burst()
            if b is None:
                break
            if self._pipe_worst() + b["worst"] > self.kv_capacity:
                self._pipe_blocked = True
                break
            entry_query = (self.query_queue.popleft() if b["qae"] else None)
            if self._pipe and self._carry is not None:
                first_text, first_n = self._carry
            else:
                first_text, first_n, _ = self._take_prepend()
            self.cache, packed, pre_text, pre_n = self._dispatch_stream(
                b, first_text, first_n)
            try:
                packed.copy_to_host_async()  # overlap transfer with compute
            except Exception:
                pass
            for _ in range(b["k"]):
                self.frame_embeds_queue.popleft()
            self._carry = (pre_text, pre_n)
            self._pipe.append({
                "k": b["k"], "times": b["times"][:b["k"]],
                "embeds": b["group"], "qae": b["qae"],
                "query": entry_query, "packed": packed,
                "worst": b["worst"]})

    def _pipe_resolve(self):
        """Read the oldest in-flight dispatch's packed result. The only
        speculation to check: a dispatch that filled all R_STREAM response
        slots mid-burst consumed fewer frames than the fill assumed — newer
        dispatches then ingested the wrong continuation and are rolled back
        (frames re-queued, ring offset rewound; their stale KV is beyond
        the offset, never attended)."""
        e = self._pipe.popleft()
        packed = np.asarray(e["packed"])
        consumed = self._absorb_stream_packed(packed, e["times"],
                                              query_src=e["query"])
        if consumed < e["k"]:
            while self._pipe:
                newer = self._pipe.pop()
                for t, emb in zip(reversed(newer["times"]),
                                  reversed(newer["embeds"])):
                    self.frame_embeds_queue.appendleft((t, emb))
                if newer["query"] is not None:
                    self.query_queue.appendleft(newer["query"])
            for t, emb in zip(reversed(e["times"][consumed:]),
                              reversed(e["embeds"][consumed:])):
                self.frame_embeds_queue.appendleft((t, emb))
            if e["query"] is not None:
                # consumed < k means the burst never completed, so the
                # query turn cannot have run — restore it
                self.query_queue.appendleft(e["query"])
            self._carry = None
            self.cache = self._set_offset_jit(
                self.cache, jnp.asarray([self._host_offset], jnp.int32))
        if not self._pipe:
            self._carry = None

    def _call_pipe(self, force_resolve: bool = False
                   ) -> Tuple[Optional[str], Optional[str]]:
        if self._resp_out:
            return self._resp_out.popleft()
        self._pipe_fill()
        # standalone query (strictly before the next queued frame): needs
        # the host respond path with nothing in flight
        blocked_query = (self.query_queue and self.frame_embeds_queue
                         and self.frame_embeds_queue[0][0]
                         > self.query_queue[0][0])
        if blocked_query and not self._pipe:
            t, q = self.query_queue.popleft()
            self._pending_prepend = []
            return self._respond_at(t, q)
        if self._pipe and (force_resolve
                           or len(self._pipe) >= self.pipeline_depth
                           or blocked_query or self._pipe_blocked):
            self._pipe_resolve()
            if self._resp_out:
                return self._resp_out.popleft()
        if self._pipe_blocked and not self._pipe:
            # ring too tight even with nothing in flight: one blocking
            # fused step (its per-turn guard compacts or fails loudly) —
            # guarantees forward progress instead of a silent livelock
            return self._call_fused()
        return None, None

    def _finish_response(self, out_ids: np.ndarray, video_time, query
                         ) -> Tuple[Optional[str], str]:
        """Shared transcript/prepend bookkeeping after a response (fused or
        standalone): the final token (EOS or budget-limited last) is NOT in
        the cache — it is fed with the next frame append, after the stream
        reopen ids when it is EOS (reference demo/inference.py:64-66)."""
        out = np.asarray(out_ids, np.int32)
        if out.size and out[-1] == self.cfg.eos_token_id:
            self._pending_prepend = [int(out[-1])] + list(
                self._stream_prompt_ids)
        elif out.size:
            self._pending_prepend = [int(out[-1])]
        response = self.tokenizer.decode(out, skip_special_tokens=True)
        q_str = (f"(Video Time = {video_time}s) User: {query}"
                 if query else None)
        return q_str, f"(Video Time = {video_time}s) Assistant:{response}"

    def _finish_or_continue(self, out_ids, video_time, query):
        """Token-streaming continuation: when stream_tokens=S is set, a
        respond dispatch stopped after S tokens — surface the partial text
        via on_delta and keep decoding in S-token dispatches (the 1-token
        continuation prompt is the last sampled token, exactly what the
        unsegmented engine feeds) until EOS or the response budget.
        Concatenated output == the unsegmented greedy response, so the
        returned transcript is byte-identical either way."""
        out = np.asarray(out_ids, np.int32)
        S = self.stream_tokens
        if not S:
            return self._finish_response(out, video_time, query)
        budget = self.cfg.max_response_tokens
        parts = [out]
        total = int(out.size)
        surfaced = ""

        def emit(done: bool):
            # called once per decoded segment — even when the delta text is
            # empty (ids a tokenizer maps to nothing still mark progress;
            # TTFT = the first call)
            nonlocal surfaced
            text = self.tokenizer.decode(
                np.concatenate(parts) if len(parts) > 1 else parts[0],
                skip_special_tokens=True)
            delta = text[len(surfaced):]
            surfaced = text
            if self.on_delta is not None:
                self.on_delta(delta, done)

        while (total < budget and out.size == S
               and int(out[-1]) != self.cfg.eos_token_id):
            emit(False)
            out = self._respond_continue(int(out[-1]))
            parts.append(out)
            total += int(out.size)
        emit(True)
        full = np.concatenate(parts) if len(parts) > 1 else parts[0]
        return self._finish_response(full, video_time, query)

    def _respond_continue(self, last_tok: int) -> np.ndarray:
        """One S-token continuation dispatch. Capacity for the WHOLE
        response budget was reserved by the first segment's guard, so no
        compaction/guard runs here. The 1-token prompt rides the prompt
        LRU (repeat tokens upload once)."""
        bucket = PROMPT_BUCKETS[0]
        (packed, self.cache, self._hist, self._hcount,
         self._sstats) = self._respond(
            self.params, self.cache, self._dev_prompt([last_tok], bucket),
            self._dev(("nv", 1), lambda: jnp.asarray([1], jnp.int32)),
            jnp.asarray([self._host_offset], jnp.int32),
            self._hist, self._hcount, self._sstats,
            # the continuation token is already in the history ring (it was
            # the previous segment's last emitted token) — don't double-log
            self._dev(("nv", 0), lambda: jnp.asarray([0], jnp.int32)))
        packed = np.asarray(packed)
        self._host_offset = int(packed[1])
        return packed[2:2 + int(packed[0])].astype(np.int32)

    # -- reference _call_for_streaming (demo/inference.py:54-82)
    def _stream_until_trigger(self):
        while self.frame_embeds_queue:
            # 1. query strictly earlier than the next frame -> answer now
            if self.query_queue and self.frame_embeds_queue[0][0] > self.query_queue[0][0]:
                return self.query_queue.popleft()
            # burst = frames up to (and incl.) the next query time
            qt = self.query_queue[0][0] if self.query_queue else None
            burst_times, burst_embeds = [], []
            for t, e in self.frame_embeds_queue:
                if qt is not None and t > qt:
                    break
                burst_times.append(t)
                burst_embeds.append(e)
            if not burst_times:
                return self.query_queue.popleft()

            # capacity guard: the reference grows its KV unbounded until GPU
            # OOM (demo/inference.py); the static ring fails loudly instead.
            # Budget covers the burst PLUS the gate-fire response turn that
            # may follow (']\nAssistant:' bucket + generation); query-prompt
            # turns (buckets up to 256) are guarded in _respond_at with the
            # actual bucket, since their paths can bypass this guard.
            worst = (self._host_offset + len(burst_times)
                     * (TEXT_BUCKET + self.frame_num_tokens)
                     + self._gen_prompt_bucket + self.cfg.max_response_tokens)
            worst = self._maybe_compact(worst)
            if worst > self.kv_capacity:
                raise RuntimeError(
                    f"KV ring capacity {self.kv_capacity} would be exceeded "
                    f"(offset {self._host_offset}); raise "
                    f"kv_capacity, set stream_window, or reset() the stream")
            first_text, first_n, _ = self._take_prepend()
            thr = self._dev_thr()
            n_burst = len(burst_times)
            if n_burst >= 2:
                consumed, fire, next_id = self._ingest_chunks(
                    burst_embeds, first_text, first_n, thr)
            else:
                frames = self._frames_operand(burst_embeds, len(burst_embeds))
                self.cache, packed = self._ingest(
                    self.params, self.cache, first_text, first_n, frames,
                    self._dev_i32(n_burst), thr)
                packed = np.asarray(packed)  # ONE readback
                consumed = int(packed[0])
                fire = bool(packed[1])
                next_id = int(packed[2])
                self._host_offset = int(packed[3])
            for _ in range(consumed):
                self.frame_embeds_queue.popleft()
            if consumed:
                self.video_time_processed = burst_times[consumed - 1]
            if fire:
                # reference checks the query BEFORE the gate per frame
                # (demo/inference.py:72-74 precedes :76-81): a query at the
                # fired frame's timestamp takes priority over the gate fire.
                if (self.query_queue and consumed
                        and burst_times[consumed - 1] >= self.query_queue[0][0]):
                    self._pending_prepend = []
                    return self.query_queue.popleft()
                # model decided to respond at this frame (gate fired); the
                # predicted token is dropped, ']\nAssistant:' is fed instead
                # (demo/inference.py:43-45)
                self._pending_prepend = []
                return burst_times[consumed - 1], None
            # not fired: prepend for the next step is the predicted interval
            if consumed:
                self._pending_prepend = [next_id] if self.cfg.frame_token_interval_id is not None else []
            # 2. a query at/earlier than the last processed frame time
            if self.query_queue and consumed and burst_times[consumed - 1] >= self.query_queue[0][0]:
                return self.query_queue.popleft()
        return None, None

    def _ingest_chunks(self, burst_embeds, first_text, first_n, thr):
        """Drive the chunked ingest over a burst: CHUNK_FRAMES per dispatch,
        stop at the first fire (offset already rewound on device)."""
        total_consumed = 0
        fire = False
        next_id = 0
        i = 0
        n = len(burst_embeds)
        iv = self.cfg.frame_token_interval_id
        cont_ids = [iv] if iv is not None else []
        cont_n = len(cont_ids)
        while i < n and not fire:
            group = burst_embeds[i:i + CHUNK_FRAMES]
            k = len(group)
            frames = self._frames_operand(group, CHUNK_FRAMES)
            text = first_text if i == 0 else self._dev_text(cont_ids)
            ntext = first_n if i == 0 else self._dev_i32(cont_n)
            self.cache, packed = self._ingest_chunk(
                self.params, self.cache, text, ntext, frames,
                self._dev_i32(k), thr)
            packed = np.asarray(packed)  # ONE readback per chunk
            consumed = int(packed[0])
            fire = bool(packed[1])
            next_id = int(packed[2])
            self._host_offset = int(packed[3])
            total_consumed += consumed
            i += consumed
        return total_consumed, fire, next_id

    def _maybe_compact(self, worst: int) -> int:
        """If the upcoming write would overflow and a stream_window is set,
        evict everything older than the window by shifting it to the ring's
        front (absolute positions preserved via pos_base). Returns the
        post-compaction worst-case occupancy."""
        if worst <= self.kv_capacity or self.stream_window is None \
                or self._host_offset <= self.stream_window:
            return worst
        if self.speculative:
            # discarded speculative dispatches can leave the DEVICE offset
            # ahead of the resolved host mirror; compaction copies relative
            # to the device offset, so rewind it first (tiny dispatch;
            # compaction is rare)
            self.cache = self._set_offset_jit(
                self.cache, jnp.asarray([self._host_offset], jnp.int32))
        keep = self.stream_window
        freed = self._host_offset - keep
        self.cache = self._compact_jit(self.cache,
                                       jnp.asarray(keep, jnp.int32))
        self._host_offset = keep
        return worst - freed

    def _take_prepend(self) -> Tuple[jax.Array, jax.Array, int]:
        """Pending text tokens for the next frame step, right-aligned in the
        TEXT_BUCKET. First-ever step prefills the system prompt separately.
        Returns (ids_buf, n_device, n_host)."""
        if not self._started:
            self._prefill_ids(self._start_ids)
            self._started = True
            self._pending_prepend = []
        ids = self._pending_prepend[-TEXT_BUCKET:]
        self._pending_prepend = []
        return self._dev_text(ids), self._dev_i32(len(ids)), len(ids)

    def _prefill_ids(self, ids: np.ndarray):
        n = len(ids)
        bucket = next((b for b in PROMPT_BUCKETS if b >= n), None)
        if bucket is None:
            # long prompt: feed exact-size (one extra compile) — rare
            bucket = n
        self.cache = self._prefill(
            self.params, self.cache, self._dev_prompt(ids, bucket),
            self._dev(("nv", n), lambda: jnp.asarray([n], jnp.int32)))
        self._host_offset += n

    # -- reference _call_for_response (demo/inference.py:40-52)
    def _respond_at(self, video_time, query):
        if query is not None:
            # the pending predicted token is REPLACED by the query prompt
            # (reference sets last_ids = query ids, inference.py:41-42)
            self._pending_prepend = []
            prompt = self.tokenizer.apply_chat_template(
                [{"role": "user", "content": query}], tokenize=True,
                add_stream_query_prompt=True, add_generation_prompt=True)
        else:
            prompt = self._gen_prompt_ids
        self._started = True  # any cache write counts (ref checks emptiness)
        n = len(prompt)
        bucket = next((b for b in PROMPT_BUCKETS if b >= n), n)
        # capacity guard for the response turn itself: the query-before-frame
        # paths reach here without passing the burst guard, and an unchecked
        # overflow would silently clamp the ring write (cache corruption)
        worst = self._host_offset + bucket + self.cfg.max_response_tokens
        worst = self._maybe_compact(worst)
        if worst > self.kv_capacity:
            raise RuntimeError(
                f"KV ring capacity {self.kv_capacity} would be exceeded by "
                f"the response turn (offset {self._host_offset}, "
                f"prompt bucket {bucket}); raise kv_capacity, set "
                f"stream_window, or reset()")
        nv = self._dev(("nv", n), lambda: jnp.asarray([n], jnp.int32))
        (packed, self.cache, self._hist, self._hcount,
         self._sstats) = self._respond(
            self.params, self.cache, self._dev_prompt(prompt, bucket),
            nv, jnp.asarray([self._host_offset], jnp.int32),
            self._hist, self._hcount, self._sstats, nv)
        packed = np.asarray(packed)  # ONE readback: [len, offset, ids...]
        self._host_offset = int(packed[1])
        out = packed[2:2 + int(packed[0])]
        return self._finish_or_continue(out, video_time, query)
