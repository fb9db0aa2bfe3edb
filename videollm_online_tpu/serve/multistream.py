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
from typing import Dict, List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import LiveConfig
from ..models import llama, live
from ..tokenizer.live_tokenizer import LiveTokenizer
from .engine import _FrameRef, _contiguous_ref_run, _frame_row

TEXT_BUCKET = 4
PROMPT_BUCKET = 128


CHUNK_FRAMES = 8


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
                 stream_window: Optional[int] = None):
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
        self.N = num_streams
        self.kv_capacity = kv_capacity
        self.frame_fps = frame_fps or self.cfg.frame_fps
        self.fnt = self.cfg.frame_num_tokens
        self.hidden = self.cfg.llama.hidden_size
        self.max_new = max_new_tokens or self.cfg.max_response_tokens
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

        def respond(params, cache, prompt_ids, num_valid, active):
            """Batched greedy decode for the ACTIVE streams."""
            p_emb = llama.embed_tokens(params["llama"], prompt_ids, cfg.llama)
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

            def cond(st):
                i, _, _, done, _ = st
                return jnp.logical_and(i < max_new,
                                       jnp.logical_not(done.all()))

            def body(st):
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
                cond, body, (jnp.asarray(1), out, cache, done, lengths))
            # one packed (N, 2 + max_new) readback: [len, offset, ids...]
            packed = jnp.concatenate(
                [lengths[:, None], cache.offset[:, None], out], axis=1)
            return packed, cache

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

    # ---------------------------------------------------------------- state
    def reset(self):
        self.cache = llama.init_kv_cache(
            self.cfg.llama, batch=self.N, capacity=self.kv_capacity,
            dtype=jnp.dtype(self.cfg.llama.dtype))
        self.frame_queues = [collections.deque() for _ in range(self.N)]
        self.query_queues = [collections.deque() for _ in range(self.N)]
        self.prepends: List[List[int]] = [[] for _ in range(self.N)]
        self._needs_prefill = [True] * self.N
        self.transcripts: List[List[Tuple]] = [[] for _ in range(self.N)]
        # host mirror of cache.offset (guards without a tunnel readback)
        self._host_offsets = np.zeros((self.N,), np.int64)

    # ------------------------------------------------------------------ I/O
    def input_frames(self, stream: int, video_time: float,
                     features: np.ndarray):
        """Enqueue pre-extracted features ((T, fnt, vision_hidden)) for one
        stream, timestamped from ``video_time`` on the fps grid."""
        feats = jnp.asarray(features)
        if feats.ndim == 2:
            feats = feats[:, None, :]
        # project AND zero-pad by chunk_frames rows in ONE dispatch: the
        # per-tick gather slices [i0, i0+K) of each source without
        # re-padding (engine.project_padded pattern)
        embeds = self._project_padded(self.params, feats)
        T = embeds.shape[0] - self.chunk_frames
        # lazy refs (engine._FrameRef): enqueueing dispatches nothing, and
        # a whole-chunk burst assembles into the (N, K, fnt, D) operand
        # with ONE stack + ONE vmapped slice in step()
        for i in range(T):
            self.frame_queues[stream].append(
                (video_time + i / self.frame_fps, _FrameRef(embeds, i)))

    def input_query(self, stream: int, query: str, video_time: float):
        self.query_queues[stream].append((video_time, query))

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

    # ------------------------------------------------------------------ tick
    def _prefill_starts(self):
        """System-prompt prefill for streams that still need it, batched."""
        todo = [i for i in range(self.N) if self._needs_prefill[i]
                and self.frame_queues[i]]
        if not todo:
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
        self.cache = self._prefill(self.params, self.cache, jnp.asarray(ids),
                                   jnp.asarray(nv), jnp.asarray(active))

    def step(self) -> List[Optional[Tuple[Optional[str], str]]]:
        """One scheduler tick: feed up to ``chunk_frames`` queued frames per
        stream in one dispatch (catch-up bursts amortize one weight-streaming
        pass over the whole chunk, same as the single-stream chunked ingest),
        gate at every frame, respond for fired streams. Returns per-stream
        (query, response) or None."""
        self._prefill_starts()
        K = self.chunk_frames
        text_ids = np.zeros((self.N, TEXT_BUCKET), np.int32)
        n_text = np.zeros((self.N,), np.int32)
        bursts: List[List[Tuple[float, jnp.ndarray]]] = [[] for _ in range(self.N)]
        active = np.zeros((self.N,), bool)
        frame_times = [None] * self.N
        for i in range(self.N):
            if not self.frame_queues[i] or self._needs_prefill[i]:
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
            budget = write_len + PROMPT_BUCKET + self.max_new
            over = [i for i in range(self.N) if active[i]
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
            if not fire[i] and qq and not self._needs_prefill[i] and (
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
            packed, self.cache = self._respond(
                self.params, self.cache, jnp.asarray(ids), jnp.asarray(nv),
                jnp.asarray(respond_mask))
            packed = np.asarray(packed)  # ONE readback
            lengths = packed[:, 0]
            self._host_offsets[:] = packed[:, 1]
            out = packed[:, 2:]
            for i in range(self.N):
                if not respond_mask[i]:
                    continue
                toks = out[i, :lengths[i]]
                if toks.size and toks[-1] == self.cfg.eos_token_id:
                    self.prepends[i] = ([int(toks[-1])]
                                        + self._stream_prompt_ids)
                elif toks.size:
                    self.prepends[i] = [int(toks[-1])]
                t = (respond_query[i][0] if respond_query[i] is not None
                     else frame_times[i])
                resp = self.tokenizer.decode(toks, skip_special_tokens=True)
                q_str = (f"(Video Time = {t}s) User: {respond_query[i][1]}"
                         if respond_query[i] is not None else None)
                results[i] = (q_str, f"(Video Time = {t}s) Assistant:{resp}")
                self.transcripts[i].append(results[i])
        return results

    def pending(self) -> bool:
        return any(q for q in self.frame_queues) or any(
            q for q in self.query_queues)
