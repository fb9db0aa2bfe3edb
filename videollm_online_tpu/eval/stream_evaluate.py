"""Streaming evaluation: LM-PPL, frame_diff, fluency, LM-correctness.

Behavioral equivalent of the reference's ``LiveMixin.stream_evaluate``
(models/modeling_live.py:44-168), restructured for XLA: ONE jitted
full-sequence forward produces four per-token device vectors (NLL at the
label, argmax id, argmax-excluding-interval id, P(interval)); the turn scan
runs on host over those small vectors (the reference's GPU indexing loop has
the same data flow). The rollforward branch (model never fired inside the
turn, modeling_live.py:116-148) appends future frames with placeholder ids
onto a COPY of the KV ring trimmed (offset-rewound) to the turn boundary —
the static-shape equivalent of trim_past_key_values."""

from __future__ import annotations

from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import LiveConfig
from ..models import live, llama, quant

IGNORE = -100


# lm_head/softmax chunk length: stats reduce each position to 4 scalars,
# so the (T, V) logits never need to exist at once — at 8B/128256-vocab a
# 10-minute live1+ sample (T ~ 13k) would be ~6.7 GB of f32 logits + the
# log_softmax temporary, which cannot sit next to the 8 GB int8 base on a
# 16 GiB chip. lax.map over LM_CHUNK-position chunks caps the live logits
# at LM_CHUNK x V f32 (~1 GB at 2048) with zero numerics change (each
# position's softmax is independent).
LM_CHUNK = 2048


def _prefill_attn(q, k, v, q_pos, kv_valid_upto, *, num_groups,
                  sliding_window=None, k_scale=None, v_scale=None):
    """Whole-video fresh-cache prefill attention for the eval forward.

    `_per_token_stats` runs ONE full-sequence forward into a fresh ring
    (offset 0), so the ring's first T rows ARE the chunk's own K/V — the
    default cache-resident XLA path would materialize (Hq, T, capacity)
    f32 scores, 50 GB at a 10-minute 8B video (the measured eval_bench
    OOM: f32[32,19832,19931]). Slice the ring to the query length and run
    the Pallas flash kernel instead (T is padded to a 128 multiple by
    StreamEvaluator.__call__). CPU tests keep the reference XLA path."""
    T = q.shape[2]
    if (jax.default_backend() == "tpu" and k_scale is None
            and T % 128 == 0 and q.shape[3] in (64, 128, 256)):
        from ..ops.flash_attention import flash_attention
        return flash_attention(q, k[:, :, :T], v[:, :, :T],
                               1.0 / q.shape[3] ** 0.5, True, 0,
                               window=sliding_window)
    from ..models.llama import _attention as xla_attention
    return xla_attention(q, k, v, q_pos, kv_valid_upto,
                         num_groups=num_groups,
                         sliding_window=sliding_window,
                         k_scale=k_scale, v_scale=v_scale)


def _per_token_stats(params, cfg: LiveConfig, input_ids, labels, frames,
                     interval_id: int, kv_cache):
    """Jit body: full decoder forward (hidden states only) + a chunked
    lm_head producing the four per-token vectors."""
    embeds = live.joint_embed(params, cfg, input_ids, frames)
    lora = params.get("lora")
    scaling = (cfg.lora.scaling
               if (cfg.lora is not None and lora is not None) else 1.0)
    hidden, cache = llama.forward(
        params["llama"], cfg=cfg.llama, inputs_embeds=embeds,
        kv_cache=kv_cache, lora=lora, lora_scaling=scaling,
        return_hidden=True, attn_impl=_prefill_attn)
    h = hidden[0]                                           # (T, H)
    T = h.shape[0]
    lab = jnp.clip(labels[0], 0, cfg.llama.vocab_size - 1)
    C = min(LM_CHUNK, T)
    pad = (-T) % C
    h_c = jnp.pad(h, ((0, pad), (0, 0))).reshape(-1, C, h.shape[1])
    lab_c = jnp.pad(lab, (0, pad)).reshape(-1, C)

    # column-tile an int8 head inside the map (quant.quantized_matmul_tiled)
    tile_cols = quant.head_tile_cols(cfg.llama.vocab_size)

    def chunk_stats(args):
        hc, lc = args
        lg = llama.lm_head(params["llama"], hc, cfg.llama, lora=lora,
                           lora_scaling=scaling,
                           tile_cols=tile_cols).astype(jnp.float32)
        # stats need only 4 scalars/position: reduce lg with logsumexp
        # instead of materializing a second (C, V) f32 log_softmax temp
        # (identical max-shifted math, ~1 GB saved at V=128256), and fold
        # the interval-column exclusion into the argmax reduce via a
        # broadcast select instead of an .at[].set copy of lg.
        lse = jax.scipy.special.logsumexp(lg, axis=-1)
        nll = lse - jnp.take_along_axis(lg, lc[:, None], axis=-1)[:, 0]
        argmax = jnp.argmax(lg, axis=-1)
        col = jnp.arange(lg.shape[-1])[None, :] == interval_id
        argmax_excl = jnp.argmax(jnp.where(col, -jnp.inf, lg), axis=-1)
        return nll, argmax, argmax_excl, jnp.exp(lg[:, interval_id] - lse)

    nll, argmax, argmax_excl, p_interval = jax.lax.map(
        chunk_stats, (h_c, lab_c))
    return (nll.reshape(-1)[:T], argmax.reshape(-1)[:T],
            argmax_excl.reshape(-1)[:T], p_interval.reshape(-1)[:T], cache)


def _rollforward_stats(params, cfg: LiveConfig, cache, append_ids,
                       append_frames, interval_id: int):
    """Jit body for the rollforward forward (modeling_live.py:128-141) —
    same chunked lm_head as _per_token_stats (a single huge turn's
    rollforward can append thousands of frame units)."""
    embeds = live.joint_embed(params, cfg, append_ids, append_frames)
    lora = params.get("lora")
    scaling = (cfg.lora.scaling
               if (cfg.lora is not None and lora is not None) else 1.0)
    hidden, cache = llama.forward(
        params["llama"], cfg=cfg.llama, inputs_embeds=embeds,
        kv_cache=cache, lora=lora, lora_scaling=scaling,
        return_hidden=True)
    h = hidden[0]                                           # (T, H)
    T = h.shape[0]
    C = min(LM_CHUNK, T)
    pad = (-T) % C
    h_c = jnp.pad(h, ((0, pad), (0, 0))).reshape(-1, C, h.shape[1])

    tile_cols = quant.head_tile_cols(cfg.llama.vocab_size)

    def chunk_stats(hc):
        lg = llama.lm_head(params["llama"], hc, cfg.llama, lora=lora,
                           lora_scaling=scaling,
                           tile_cols=tile_cols).astype(jnp.float32)
        lse = jax.scipy.special.logsumexp(lg, axis=-1)
        argmax = jnp.argmax(lg, axis=-1)
        col = jnp.arange(lg.shape[-1])[None, :] == interval_id
        argmax_excl = jnp.argmax(jnp.where(col, -jnp.inf, lg), axis=-1)
        return argmax, argmax_excl, jnp.exp(lg[:, interval_id] - lse)

    argmax, argmax_excl, p_interval = jax.lax.map(chunk_stats, h_c)
    # return the (discarded) cache so the donated input ring has an output
    # buffer to alias into — without it XLA keeps input + updated rings
    # live simultaneously (the "donated buffers were not usable" warning
    # and the rollforward OOM next to the 8.2 GiB int8 base)
    return (argmax.reshape(-1)[:T], argmax_excl.reshape(-1)[:T],
            p_interval.reshape(-1)[:T], cache)


class StreamEvaluator:
    """Caches jitted closures across samples (shapes bucket by padding)."""

    def __init__(self, params, cfg: LiveConfig, attn_impl=None):
        self.params = params
        self.cfg = cfg
        use_interval = cfg.frame_token_interval_id is not None
        self.interval_id = (cfg.frame_token_interval_id if use_interval
                            else cfg.eos_token_id)
        self.use_interval = use_interval
        # donate the ring: un-donated, the jit holds input + output copies
        # of the (L, 1, Hkv, capacity, D) K/V — 2 x 2.6 GB at an 8B
        # 10-minute video, which (next to the 8.2 GiB int8 base + the
        # chunked-head temps) is exactly the eval_bench OOM margin
        self._stats = jax.jit(
            lambda params, ids, labels, frames, kv_cache: _per_token_stats(
                params, cfg, ids, labels, frames, self.interval_id, kv_cache),
            donate_argnums=(4,))
        self._roll = jax.jit(
            lambda params, cache, ids, frames: _rollforward_stats(
                params, cfg, cache, ids, frames, self.interval_id),
            donate_argnums=(1,))

    def _gate_fire_index(self, argmax, argmax_excl, p_int, threshold):
        """First index whose gate prediction is not the interval token.
        Reference zeroes P(interval) below the threshold then argmaxes
        (modeling_live.py:107-113)."""
        if threshold > 0:
            pred = np.where(p_int < threshold, argmax_excl, argmax)
        else:
            pred = argmax
        fire = pred != self.interval_id
        idx = np.nonzero(fire)[0]
        return int(idx[0]) if idx.size else None

    def __call__(self, input_ids: np.ndarray, labels: np.ndarray,
                 frames: Optional[np.ndarray],
                 frame_token_interval_threshold: float = 0.0) -> np.ndarray:
        """input_ids/labels: (1, T); frames: flattened frame features.
        Returns [lm_ppl, frame_diff, fluency, lm_correctness]."""
        cfg = self.cfg
        assert input_ids.shape[0] == 1
        input_id = np.asarray(input_ids[0])
        label = np.asarray(labels[0])
        T = len(input_id)
        fnt = cfg.frame_num_tokens

        # turn boundaries: eos positions (modeling_live.py:60-62)
        stops = (np.nonzero(input_id == cfg.eos_token_id)[0] + 1).tolist()
        starts = [0] + stops[:-1]
        num_turns = len(starts)

        v_mask_all = input_id == cfg.v_placeholder_id

        # capacity with rollforward headroom: the rollforward appends at most
        # min(next turn's frames, this turn's frames - 1) frame units beyond
        # T (see _rollforward call below) — bound it exactly from the sample
        # instead of a guessed constant that a large live1 turn could exceed
        per_frame_append = fnt + (1 if self.use_interval else 0)
        turn_frames = [int(v_mask_all[ts:te].sum()) // fnt
                       for ts, te in zip(starts, stops)]
        max_roll = max(
            (min(turn_frames[r + 1], turn_frames[r] - 1)
             for r in range(num_turns - 1)), default=0)
        capacity = T + max(max_roll, 0) * per_frame_append
        # pad the prefill to a 128 multiple so _prefill_attn can take the
        # flash path (pad ids are eos — never <v> — labels IGNORE; causal
        # attention means positions < T are bit-unaffected, and the turn
        # scan below only ever indexes real positions)
        T_pad = -(-T // 128) * 128
        if T_pad != T:
            input_ids = np.pad(input_ids, ((0, 0), (0, T_pad - T)),
                               constant_values=cfg.eos_token_id)
            labels = np.pad(labels, ((0, 0), (0, T_pad - T)),
                            constant_values=IGNORE)
        capacity = max(capacity, T_pad)
        cache = llama.init_kv_cache(cfg.llama, batch=1, capacity=capacity,
                                    dtype=jnp.dtype(cfg.llama.dtype))
        jframes = jnp.asarray(frames) if frames is not None and np.size(frames) else None
        nll, argmax, argmax_excl, p_int, cache = self._stats(
            self.params, jnp.asarray(input_ids), jnp.asarray(labels),
            jframes, cache)
        nll = np.asarray(nll)
        argmax = np.asarray(argmax)
        argmax_excl = np.asarray(argmax_excl)
        p_int = np.asarray(p_int)
        learn_mask_all = label != IGNORE

        lm_ppls, frame_diffs, fluencies, lm_corrects = [], [], [], []
        past_num_frames = 0
        for r, (ts, te) in enumerate(zip(starts, stops)):
            turn_lab = label[ts:te]
            turn_learn = learn_mask_all[ts:te]
            if not turn_learn.any():
                continue
            turn_v = v_mask_all[ts:te]
            turn_num_frames = int(turn_v.sum()) // fnt
            turn_stream = turn_v & turn_learn
            turn_lm = turn_learn & ~turn_stream

            num_lm_correct = 0
            lm_count = 0
            if turn_lm.any():
                idxs = np.nonzero(turn_lm)[0] + ts
                lm_ppls.append(float(np.exp(nll[idxs].mean())))
                wrong = argmax[idxs] != label[idxs]
                if wrong.any():
                    num_lm_correct = int(np.nonzero(wrong)[0][0])
                else:
                    num_lm_correct = int(len(idxs))
                lm_count = len(idxs)
                lm_corrects.append(num_lm_correct / lm_count)

            frame_diff = None
            if turn_stream.any():
                sidx = np.nonzero(turn_stream)[0] + ts
                fire = self._gate_fire_index(
                    argmax[sidx], argmax_excl[sidx], p_int[sidx],
                    frame_token_interval_threshold)
                if fire is not None:
                    frame_diff = int(turn_stream.sum()) - fire - 1
                else:
                    # rollforward: assume the 'Assistant: ...' never happened
                    # and keep feeding future frames (modeling_live.py:116-148)
                    last_stream_idx = int(sidx[-1])
                    if r == num_turns - 1:
                        frame_diff = 0
                    else:
                        nts, nte = starts[r + 1], stops[r + 1]
                        next_frames = int(
                            v_mask_all[nts:nte].sum()) // fnt
                        to_append = min(next_frames, turn_num_frames - 1)
                        if to_append <= 0:
                            frame_diff = 0
                        else:
                            frame_diff = self._rollforward(
                                cache, last_stream_idx + 1, frames,
                                past_num_frames + turn_num_frames, to_append,
                                frame_token_interval_threshold)
                frame_diffs.append(abs(frame_diff))

            if turn_lm.any() and turn_stream.any():
                n_v = int(turn_stream.sum())
                n_valid = lm_count + n_v
                if frame_diff == 0:
                    fluency = (n_v + num_lm_correct) / n_valid
                elif frame_diff > 0:
                    fluency = (n_v - frame_diff) / n_valid
                else:
                    fluency = (n_v - 1) / n_valid
                fluencies.append(fluency)
            past_num_frames += turn_num_frames

        return np.array([
            np.mean(lm_ppls) if lm_ppls else 1.0,
            np.mean(frame_diffs) if frame_diffs else 0.0,
            np.mean(fluencies) if fluencies else 1.0,
            np.mean(lm_corrects) if lm_corrects else 1.0,
        ], np.float32)

    def _rollforward(self, cache, trim_to: int, frames, start_frame: int,
                     to_append: int, threshold: float) -> int:
        """Append future frames after rewinding the ring to ``trim_to``.
        Negative return = model fires late (modeling_live.py:128-148)."""
        cfg = self.cfg
        fnt = cfg.frame_num_tokens
        unit = ([self.interval_id] if self.use_interval else []) + \
            [cfg.v_placeholder_id] * fnt
        append_ids = np.tile(unit, to_append)[None]
        append_frames = np.asarray(frames)[start_frame:start_frame + to_append]
        # copy so later turns still see the original ring contents
        # copy EVERY leaf (pos_base included): _roll donates its cache arg,
        # so any leaf passed by reference would be deleted for later turns
        roll_cache = llama.KVCache(
            k=jnp.copy(cache.k), v=jnp.copy(cache.v),
            offset=jnp.full_like(cache.offset, trim_to),
            pos_base=jnp.copy(cache.pos_base),
            k_scale=None if cache.k_scale is None else jnp.copy(cache.k_scale),
            v_scale=None if cache.v_scale is None else jnp.copy(cache.v_scale))
        argmax, argmax_excl, p_int, _ = self._roll(
            self.params, roll_cache, jnp.asarray(append_ids),
            jnp.asarray(append_frames))
        # gate only at the last token of each frame unit
        idxs = np.arange(len(unit) - 1, append_ids.shape[1], len(unit))
        fire = self._gate_fire_index(
            np.asarray(argmax)[idxs], np.asarray(argmax_excl)[idxs],
            np.asarray(p_int)[idxs], threshold)
        if fire is not None:
            return -(fire + 1)
        return -to_append
