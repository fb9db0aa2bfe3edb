"""Response generation over the static KV ring.

The reference's ``fast_greedy_generate`` (models/modeling_live.py:173-182) is
a host loop of 1-token forwards (one device dispatch per token). Here the
whole decode runs **on device** in a single jitted ``lax.while_loop``: the
prompt chunk is appended (bucket-padded), the gate logits are read at the
last valid position, and up to ``max_new_tokens`` greedy tokens stream into a
preallocated output buffer (the ``inplace_output_ids`` equivalent,
demo/inference.py:30), breaking on EOS.

Semantics match the reference exactly: generated tokens are fed back during
decode except the final one (EOS or the budget-limited last token); the final
token's KV is NOT in the cache — the serving loop feeds it with the next
frame append (demo/inference.py:64-66).
"""

from __future__ import annotations

import functools
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LiveConfig
from . import llama
from .llama import KVCache

Params = Dict[str, Any]


def greedy_generate(
    params: Params,
    cfg: LiveConfig,
    cache: KVCache,
    prompt_embeds: jax.Array,
    num_valid: jax.Array,
    *,
    max_new_tokens: Optional[int] = None,
    attn_impl=None,
) -> Tuple[jax.Array, jax.Array, KVCache]:
    """Append ``prompt_embeds`` (B=1, S, D; ``num_valid`` real tokens) and
    greedy-decode. Returns (output_ids (1, max_new), length (1,), cache)."""
    max_new = max_new_tokens or cfg.max_response_tokens
    lora = params.get("lora")
    scaling = cfg.lora.scaling if (cfg.lora is not None and lora is not None) else 1.0
    fwd = functools.partial(
        llama.forward, params["llama"], cfg=cfg.llama, lora=lora,
        lora_scaling=scaling, attn_impl=attn_impl)

    logits, cache = fwd(inputs_embeds=prompt_embeds, kv_cache=cache,
                        num_valid=num_valid,
                        logit_gather_positions=jnp.clip(num_valid - 1, 0, None))
    first = jnp.argmax(logits[:, 0], axis=-1)  # (B,)

    out = jnp.zeros((1, max_new), jnp.int32)
    out = out.at[:, 0].set(first.astype(jnp.int32))
    eos = jnp.asarray(cfg.eos_token_id, jnp.int32)

    def cond(state):
        i, _, _, done = state
        return jnp.logical_and(i < max_new, jnp.logical_not(done))

    def body(state):
        i, out, cache, _ = state
        tok = out[:, i - 1]
        emb = llama.embed_tokens(params["llama"], tok[:, None], cfg.llama)
        logits, cache = fwd(inputs_embeds=emb, kv_cache=cache)
        nxt = jnp.argmax(logits[:, -1], axis=-1).astype(jnp.int32)
        out = out.at[:, i].set(nxt)
        return i + 1, out, cache, (nxt[0] == eos)

    # step 0 already produced `first`; stop immediately if it is EOS
    i, out, cache, done = jax.lax.while_loop(
        cond, body, (jnp.asarray(1), out, cache, first[0] == eos))
    return out, jnp.asarray(i)[None], cache


def make_jitted_greedy(params_treedef_hint=None, **jit_kw):
    return jax.jit(greedy_generate,
                   static_argnames=("cfg", "max_new_tokens", "attn_impl"),
                   donate_argnames=("cache",), **jit_kw)


# ---------------------------------------------------------------------------
# N-gram (prompt-lookup) speculative decoding
# ---------------------------------------------------------------------------
#
# Decode is weight-streaming-bound (~11 of the 13.4 ms/token at 8B int8 is
# the weight+lm_head HBM read, BENCH_NOTES.md round 3); a forward over
# K+1 tokens streams the SAME bytes. Drafting K continuation tokens by
# n-gram lookup over recently generated text and verifying them in one
# forward therefore emits (1 + accepted) greedy-exact tokens per
# weight-streaming pass — the only remaining single-chip lever past the
# measured 677 GB/s roof. Live narration is highly repetitive across
# turns ("You look around…"), which is exactly where suffix lookup
# accepts. Verification makes the output token stream identical to
# `greedy_generate` regardless of draft quality (a wrong draft costs only
# the already-paid forward). The reference has no analog — its decode is
# one host-dispatched 1-token forward per token (modeling_live.py:173-182).

SPEC_HIST = 2048   # token-history ring length (device, int32)
SPEC_DRAFT = 7     # drafted tokens per verify step (forward = 8 tokens)


def hist_append_ids(hist: jax.Array, count: jax.Array, ids: jax.Array,
                    n: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Append the first ``n`` of ``ids`` (1-D, valid-first) into the history
    ring. Pure / jit-safe; O(len(ids)) masked scatter."""
    H = hist.shape[0]
    L = ids.shape[0]
    k = jnp.arange(L, dtype=jnp.int32)
    slots = (count + k) % H
    mask = k < n
    # scatter only the valid prefix: invalid lanes write their own current
    # value back (gather-then-scatter keeps this a single fused op)
    cur = hist[slots]
    hist = hist.at[slots].set(jnp.where(mask, ids.astype(jnp.int32), cur))
    return hist, count + n.astype(jnp.int32)


def _ngram_draft(hist: jax.Array, count: jax.Array, draft_len: int
                 ) -> jax.Array:
    """Draft ``draft_len`` tokens: find the most recent earlier occurrence
    of the current 3-gram suffix (2-gram fallback) in the history ring and
    propose what followed it. No match -> zeros (verification rejects them
    at no extra cost). Vectorized over the whole ring (VPU-cheap vs the
    13 ms weight-streaming step it piggybacks on)."""
    H = hist.shape[0]
    c = count
    s0 = hist[(c - 1) % H]
    s1 = hist[(c - 2) % H]
    s2 = hist[(c - 3) % H]
    age = jnp.arange(1, H + 1, dtype=jnp.int32)   # candidate end g = c-1-age
    g = c - 1 - age
    lo = jnp.maximum(c - H, 0)                    # oldest retained global idx
    v0 = hist[g % H]
    v1 = hist[(g - 1) % H]
    v2 = hist[(g - 2) % H]
    ok2 = (g - 1 >= lo) & (v0 == s0) & (v1 == s1) & (c >= 2)
    ok3 = ok2 & (g - 2 >= lo) & (v2 == s2) & (c >= 3)
    big = jnp.asarray(H + 1, jnp.int32)
    a3 = jnp.min(jnp.where(ok3, age, big))
    a2 = jnp.min(jnp.where(ok2, age, big))
    a_sel = jnp.where(a3 <= H, a3, a2)
    found = a_sel <= H
    g_sel = c - 1 - a_sel
    k = jnp.arange(draft_len, dtype=jnp.int32)
    src = g_sel + 1 + k
    drafts = hist[src % H]
    valid = found & (src <= c - 1) & (src >= lo)
    return jnp.where(valid, drafts, 0).astype(jnp.int32)


def ngram_speculative_generate(
    params: Params,
    cfg: LiveConfig,
    cache: KVCache,
    prompt_embeds: jax.Array,
    num_valid: jax.Array,
    hist: jax.Array,
    hist_count: jax.Array,
    *,
    prompt_ids: Optional[jax.Array] = None,
    prompt_n: Optional[jax.Array] = None,
    max_new_tokens: Optional[int] = None,
    draft_len: int = SPEC_DRAFT,
    draft_mode: str = "ngram",
    attn_impl=None,
    forced_ids: Optional[jax.Array] = None,
) -> Tuple[jax.Array, jax.Array, KVCache, jax.Array, jax.Array, jax.Array]:
    """`greedy_generate` with n-gram speculative verification.

    Emits the byte-identical greedy token stream (same EOS/budget
    semantics, same cache invariant: the final emitted token's KV is NOT
    in the cache) while decoding up to ``draft_len + 1`` tokens per
    forward. ``hist``/``hist_count`` is the caller-owned token-history
    ring (prompt ids are appended here when given, then every emitted
    token). Returns (output_ids (1, max_new), length (1,), cache, hist,
    hist_count, stats) where stats = [decode_steps, emitted_tokens]
    (acceptance rate = emitted/steps - 1).

    ``draft_mode="zero"`` replaces the n-gram lookup with constant-zero
    drafts — the exact program the no-match fallback runs — pinning the
    ADVERSARIAL worst case: acceptance ~0, one emitted token per
    verify forward (same forward count as plain greedy, each over K+1
    positions instead of 1). Used to bound the headline from below.

    ``forced_ids`` ((max_new,) i32): FORCED-RESPONSE REPLAY — the emitted
    token at index i is ``forced_ids[i]`` instead of the verify forward's
    argmax (the argmax is still computed and data-flows into the result so
    nothing is DCE'd: every forward, lm_head gather, and acceptance
    comparison runs identically). Acceptance is a property of the emitted
    token stream, so replaying reference-distribution narration text
    through the verify path measures the REALISTIC tokens/verify-step a
    trained checkpoint would see — without trained weights (random weights
    emit self-similar cycling text, the optimistic bound). Pad the row
    with EOS to end the response at the script's length."""
    assert draft_mode in ("ngram", "zero"), draft_mode
    max_new = max_new_tokens or cfg.max_response_tokens
    K = draft_len
    lora = params.get("lora")
    scaling = cfg.lora.scaling if (cfg.lora is not None and lora is not None) else 1.0
    fwd = functools.partial(
        llama.forward, params["llama"], cfg=cfg.llama, lora=lora,
        lora_scaling=scaling, attn_impl=attn_impl)

    if prompt_ids is not None:
        pn = prompt_n if prompt_n is not None else jnp.asarray(
            prompt_ids.shape[-1], jnp.int32)
        hist, hist_count = hist_append_ids(
            hist, hist_count, prompt_ids.reshape(-1), pn.reshape(()))

    logits, cache = fwd(inputs_embeds=prompt_embeds, kv_cache=cache,
                        num_valid=num_valid,
                        logit_gather_positions=jnp.clip(num_valid - 1, 0, None))
    first = jnp.argmax(logits[:, 0], axis=-1).astype(jnp.int32)  # (B,)
    if forced_ids is not None:
        # replay: override the token, keep the argmax live in the graph
        first = forced_ids[0][None] + 0 * first

    out = jnp.zeros((1, max_new), jnp.int32)
    out = out.at[:, 0].set(first)
    eos = jnp.asarray(cfg.eos_token_id, jnp.int32)
    hist, hist_count = hist_append_ids(
        hist, hist_count, first, jnp.asarray(1, jnp.int32))

    def cond(state):
        i, done = state[0], state[3]
        return jnp.logical_and(i < max_new, jnp.logical_not(done))

    def body(state):
        i, out, cache, _, hist, hcount, steps = state
        prev = out[0, i - 1]
        if draft_mode == "zero":
            drafts = jnp.zeros((K,), jnp.int32)
        else:
            drafts = _ngram_draft(hist, hcount, K)       # (K,)
        toks = jnp.concatenate([prev[None], drafts])     # (K+1,)
        emb = llama.embed_tokens(params["llama"], toks[None], cfg.llama)
        off0 = cache.offset
        logits, cache = fwd(
            inputs_embeds=emb, kv_cache=cache,
            num_valid=jnp.full((1,), K + 1, jnp.int32),
            logit_gather_positions=jnp.arange(K + 1, dtype=jnp.int32)[None])
        preds = jnp.argmax(logits[0], axis=-1).astype(jnp.int32)  # (K+1,)
        if forced_ids is not None:
            # replay: the model "would emit" the scripted tokens — the
            # argmax chain stays live (+0*preds) so the verify forward's
            # full cost is measured, only the token SOURCE changes
            pos = jnp.clip(i + jnp.arange(K + 1, dtype=jnp.int32),
                           0, max_new - 1)
            preds = forced_ids[pos] + 0 * preds
        k = jnp.arange(K, dtype=jnp.int32)
        mism = preds[:K] != drafts
        a = jnp.min(jnp.where(mism, k, K))               # accepted drafts
        emit = a + 1                                      # preds[0..a]
        # truncate at the first EOS among the emitted prefix
        is_eos = (preds == eos) & (jnp.arange(K + 1) < emit)
        e_idx = jnp.min(jnp.where(is_eos, jnp.arange(K + 1), K + 1))
        done = e_idx <= K
        emit = jnp.where(done, e_idx + 1, emit)
        emit = jnp.minimum(emit, max_new - i)             # budget clip
        # write emitted tokens: conflict-free gather/select over the whole
        # row (a masked scatter can pair a clamped no-op lane with the last
        # real write at the same index — scatter order is unspecified)
        idx = jnp.arange(max_new, dtype=jnp.int32)
        rel = idx - i
        inwin = (rel >= 0) & (rel < emit)
        out = jnp.where(inwin[None, :],
                        preds[jnp.clip(rel, 0, K)][None, :], out)
        hist, hcount = hist_append_ids(hist, hcount, preds, emit)
        # rewind: keep KV for [prev, d0..d_{emit-2}] = emit entries; the
        # newest emitted token's KV stays out of the cache (invariant)
        cache = cache._replace(offset=off0 + emit)
        return (i + emit, out, cache, done, hist, hcount, steps + 1)

    i, out, cache, done, hist, hist_count, steps = jax.lax.while_loop(
        cond, body, (jnp.asarray(1, jnp.int32), out, cache,
                     first[0] == eos, hist, hist_count,
                     jnp.asarray(1, jnp.int32)))
    stats = jnp.stack([steps, i])
    return out, jnp.asarray(i)[None], cache, hist, hist_count, stats
