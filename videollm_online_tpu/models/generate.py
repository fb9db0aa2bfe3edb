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
