"""Pure-functional Llama-3 decoder for TPU.

TPU-first design, not a torch translation:
  * layer parameters are **stacked** on a leading layer axis and the forward
    is a single ``lax.scan`` over layers — one compiled layer body instead of
    32 unrolled ones (fast compiles, friendly to ``jax.checkpoint``);
  * the KV cache is a **static-shape ring buffer** ``(L, B, Hkv, C, hd)``
    with per-stream integer offsets; appends are `dynamic_update_slice`s and
    attention masks by absolute position, so the same jitted program serves
    prefill, streaming frame-appends and token-by-token decode (the reference
    instead grows torch KV tensors dynamically, demo/inference.py:64-68);
  * numerics: params/activations in the config dtype (bf16 on TPU), RMSNorm /
    softmax / rope in fp32 — matches HF `LlamaForCausalLM` semantics so the
    fp32 CPU parity tests are bit-meaningful.

Functional parity target: the reference's base LLM, i.e. HF Llama-3 used by
models/modeling_live.py:184-222 (from_pretrained + LoRA). LoRA (r/alpha from
models/arguments_live.py:17-18) is a parameter-tree overlay applied inside
each projection: ``y = x W + (alpha/r) * (x A^T) B^T``.
"""

from __future__ import annotations

import functools
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LlamaConfig, LoraConfig

Params = Dict[str, Any]


# ---------------------------------------------------------------------------
# init


def _dense_init(key, in_dim, out_dim, dtype, scale=0.02):
    return (jax.random.normal(key, (in_dim, out_dim)) * scale).astype(dtype)


def init_params(key: jax.Array, cfg: LlamaConfig) -> Params:
    dtype = jnp.dtype(cfg.dtype)
    keys = jax.random.split(key, 12)
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size

    def stack(k, in_dim, out_dim):
        ks = jax.random.split(k, L)
        return jnp.stack([_dense_init(ks[i], in_dim, out_dim, dtype) for i in range(L)])

    params = {
        "embed": (jax.random.normal(keys[0], (cfg.vocab_size, D)) * 0.02).astype(dtype),
        "layers": {
            "attn_norm": jnp.ones((L, D), dtype),
            "mlp_norm": jnp.ones((L, D), dtype),
            "wq": stack(keys[1], D, cfg.q_dim),
            "wk": stack(keys[2], D, cfg.kv_dim),
            "wv": stack(keys[3], D, cfg.kv_dim),
            "wo": stack(keys[4], cfg.q_dim, D),
            "w_gate": stack(keys[5], D, F),
            "w_up": stack(keys[6], D, F),
            "w_down": stack(keys[7], F, D),
        },
        "final_norm": jnp.ones((D,), dtype),
    }
    if cfg.attention_bias:  # Qwen2 family: bias on q/k/v only
        params["layers"]["bq"] = jnp.zeros((L, cfg.q_dim), dtype)
        params["layers"]["bk"] = jnp.zeros((L, cfg.kv_dim), dtype)
        params["layers"]["bv"] = jnp.zeros((L, cfg.kv_dim), dtype)
    if not cfg.tie_word_embeddings:
        params["lm_head"] = _dense_init(keys[8], D, cfg.vocab_size, dtype)
    return params


def init_lora_params(key: jax.Array, cfg: LlamaConfig, lora: LoraConfig) -> Params:
    """LoRA overlay pytree. A ~ N(0, 1/r), B = 0 (standard init)."""
    dtype = jnp.dtype(cfg.dtype)
    L, D, F, r = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size, lora.r
    dims = {
        "wq": (D, cfg.q_dim), "wk": (D, cfg.kv_dim), "wv": (D, cfg.kv_dim),
        "wo": (cfg.q_dim, D),
        "w_gate": (D, F), "w_up": (D, F), "w_down": (F, D),
    }
    name_map = {
        "q_proj": "wq", "k_proj": "wk", "v_proj": "wv", "o_proj": "wo",
        "gate_proj": "w_gate", "up_proj": "w_up", "down_proj": "w_down",
    }
    keys = jax.random.split(key, len(dims) + 1)
    out = {"layers": {}}
    targets = {name_map[t] for t in lora.target_modules if t in name_map}
    for i, (name, (din, dout)) in enumerate(dims.items()):
        if name not in targets:
            continue
        a = (jax.random.normal(keys[i], (L, r, din)) / jnp.sqrt(r)).astype(dtype)
        b = jnp.zeros((L, dout, r), dtype)
        out["layers"][name] = {"lora_a": a, "lora_b": b}
    if "lm_head" in lora.target_modules:
        a = (jax.random.normal(keys[-1], (r, D)) / jnp.sqrt(r)).astype(dtype)
        out["lm_head"] = {"lora_a": a, "lora_b": jnp.zeros((cfg.vocab_size, r), dtype)}
    return out


# ---------------------------------------------------------------------------
# building blocks


def rms_norm(x: jax.Array, weight: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    xf = xf * jax.lax.rsqrt(jnp.mean(xf * xf, axis=-1, keepdims=True) + eps)
    return (xf.astype(x.dtype)) * weight


def dense(x: jax.Array, w, lora: Optional[Dict] = None,
          scaling: float = 1.0, drop_rng: Optional[jax.Array] = None,
          drop_rate: float = 0.0,
          tile_cols: Optional[int] = None) -> jax.Array:
    if isinstance(w, dict):  # weight-only int8 (models/quant.py)
        from .quant import QUANT_KEY, quantized_matmul, quantized_matmul_tiled
        if tile_cols is not None and QUANT_KEY in w:
            # column-tiled path for huge-V matmuls inside loops (defeats
            # XLA's hoist of the dequant; see quantized_matmul_tiled)
            y = quantized_matmul_tiled(x, w, tile_cols)
        else:
            y = quantized_matmul(x, w)
    else:
        y = x @ w
    if lora is not None:
        xl = x
        if drop_rng is not None and drop_rate > 0.0:
            # PEFT applies nn.Dropout(lora_dropout) to the LoRA-branch input
            # only (reference trains with lora_dropout=0.05,
            # modeling_live.py:207); inference passes no rng -> deterministic
            keep = jax.random.bernoulli(drop_rng, 1.0 - drop_rate, x.shape)
            xl = jnp.where(keep, x / (1.0 - drop_rate), 0.0).astype(x.dtype)
        y = y + scaling * ((xl @ lora["lora_a"].swapaxes(-1, -2))
                           @ lora["lora_b"].swapaxes(-1, -2))
    return y


def rope_cos_sin(positions: jax.Array, head_dim: int, theta: float
                 ) -> Tuple[jax.Array, jax.Array]:
    """positions (..., T) int32 -> cos/sin (..., T, head_dim) fp32.

    Same layout as HF: angles for the first half duplicated to the second.
    """
    inv_freq = 1.0 / (theta ** (jnp.arange(0, head_dim, 2, dtype=jnp.float32) / head_dim))
    angles = positions.astype(jnp.float32)[..., None] * inv_freq  # (..., T, hd/2)
    angles = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(angles), jnp.sin(angles)


def apply_rope(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """x: (B, H, T, hd); cos/sin: (B, T, hd)."""
    c = cos[:, None, :, :].astype(x.dtype)
    s = sin[:, None, :, :].astype(x.dtype)
    half = x.shape[-1] // 2
    rotated = jnp.concatenate([-x[..., half:], x[..., :half]], axis=-1)
    return x * c + rotated * s


class KVCache(NamedTuple):
    """Static-shape KV ring: k/v (L, B, Hkv, C, hd), offset (B,) int32.

    ``offset[b]`` = number of valid SLOTS already written for stream ``b``.
    ``pos_base[b]`` = absolute position of slot 0 (0 until a compaction
    shifts the retained window to the front — then slot j holds absolute
    position ``pos_base + j`` and the next token's absolute position is
    ``pos_base + offset``). RoPE always uses absolute positions; attention
    masks use slot-relative positions (``abs - pos_base``).

    Appends pack valid tokens first; bucket padding is written past the end
    and overwritten by the next append (never attended: the causal mask is
    ``slot <= q_position`` and padding slots sit after every valid query).

    Quantized (int8) mode: k/v hold int8 codes and ``k_scale``/``v_scale``
    (L, B, Hkv, C) fp32 hold per-token-per-head symmetric scales
    (``x ≈ code * scale``). Appends quantize at write; attention kernels
    dequantize at read (in-kernel on the Pallas serving path) — KV HBM
    traffic and cache memory halve vs bf16. The reference has no KV-cache
    quantization at all (its torch cache grows in model dtype,
    demo/inference.py:64-68); this is a TPU-serving capacity/bandwidth
    feature. None scales = unquantized (the default)."""
    k: jax.Array
    v: jax.Array
    offset: jax.Array
    pos_base: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def capacity(self) -> int:
        return self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_kv_cache(cfg: LlamaConfig, batch: int, capacity: int,
                  dtype=None, quant: Optional[str] = None) -> KVCache:
    dtype = dtype or jnp.dtype(cfg.dtype)
    shape = (cfg.num_layers, batch, cfg.num_kv_heads, capacity, cfg.head_dim)
    if quant is not None:
        assert quant == "int8", f"unsupported kv quant {quant!r}"
        return KVCache(
            k=jnp.zeros(shape, jnp.int8),
            v=jnp.zeros(shape, jnp.int8),
            offset=jnp.zeros((batch,), jnp.int32),
            pos_base=jnp.zeros((batch,), jnp.int32),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32),
        )
    return KVCache(
        k=jnp.zeros(shape, dtype),
        v=jnp.zeros(shape, dtype),
        offset=jnp.zeros((batch,), jnp.int32),
        pos_base=jnp.zeros((batch,), jnp.int32),
    )


class PagedKVCache(NamedTuple):
    """Paged KV: a shared physical page pool + per-stream page tables
    (BASELINE config #4's "paged KV cache"; ops/paged_attention.py).

    k/v: (L, P, Hkv, page, hd) pool shared by all streams; ``table``
    (B, MAXP) int32 maps stream b's logical page j to a physical pool
    page; ``offset``/``pos_base`` have the ring cache's exact semantics
    (models/llama.KVCache) — logical slot i of stream b lives at
    pool[l, table[b, i // page], :, i % page]. Streams with heterogeneous
    lengths share the pool (sum-of-usage, not N x max), and window
    compaction frees whole pages host-side with ZERO device data movement
    (compact_kv_cache rolls the entire ring instead). The host owns page
    allocation; appends only ever touch pages the table maps, and the
    caller must keep one lookahead page mapped whenever a multi-token
    append may cross a page boundary (serve/multistream.py allocator).

    Quantized (int8) mode composes the ring cache's KV quantization with
    paging: k/v hold int8 codes and ``k_scale``/``v_scale``
    (L, P, Hkv, page) fp32 pools hold the per-token-per-head symmetric
    scales, paged exactly like the codes. Appends quantize at write; the
    paged Pallas kernel dequantizes at read (scales fold into
    logits/probs rows) — pool memory AND KV HBM reads halve on top of
    the paging memory win."""
    k: jax.Array
    v: jax.Array
    table: jax.Array
    offset: jax.Array
    pos_base: jax.Array
    k_scale: Optional[jax.Array] = None
    v_scale: Optional[jax.Array] = None

    @property
    def page_size(self) -> int:
        return self.k.shape[3]

    @property
    def capacity(self) -> int:  # per-stream logical capacity
        return self.table.shape[1] * self.k.shape[3]

    @property
    def quantized(self) -> bool:
        return self.k_scale is not None


def init_paged_kv_cache(cfg: LlamaConfig, batch: int, *, pool_pages: int,
                        pages_per_stream: int, page_size: int = 512,
                        dtype=None, quant: Optional[str] = None
                        ) -> PagedKVCache:
    dtype = dtype or jnp.dtype(cfg.dtype)
    shape = (cfg.num_layers, pool_pages, cfg.num_kv_heads, page_size,
             cfg.head_dim)
    table = jnp.zeros((batch, pages_per_stream), jnp.int32)
    if quant is not None:
        assert quant == "int8", f"unsupported kv quant {quant!r}"
        return PagedKVCache(
            k=jnp.zeros(shape, jnp.int8), v=jnp.zeros(shape, jnp.int8),
            table=table,
            offset=jnp.zeros((batch,), jnp.int32),
            pos_base=jnp.zeros((batch,), jnp.int32),
            k_scale=jnp.zeros(shape[:-1], jnp.float32),
            v_scale=jnp.zeros(shape[:-1], jnp.float32))
    return PagedKVCache(
        k=jnp.zeros(shape, dtype), v=jnp.zeros(shape, dtype),
        table=table,
        offset=jnp.zeros((batch,), jnp.int32),
        pos_base=jnp.zeros((batch,), jnp.int32))


def _paged_append(pool: jax.Array, l_idx, table, offset, store) -> jax.Array:
    """Write ``store`` (B, Hkv, S, hd) at logical slots [offset[b],
    offset[b]+S) of each stream's paged space. S == 1 is a single-row
    update (the decode hot path, no read-modify-write); multi-token
    slabs read-modify-write the n consecutive logical pages they can
    span, skipping the write-back of any page the slab does not actually
    reach — so an unmapped lookahead entry (the trash page) is only ever
    written with padding junk, never read back over a foreign page.

    Also handles the rank-4 SCALE pools of the quantized paged cache
    (pool (L, P, Hkv, page) + store (B, Hkv, S)) — same slot addressing,
    one fewer trailing dim."""
    B, Hkv, S = store.shape[:3]
    page = pool.shape[3]
    MAXP = table.shape[1]
    tail = (0,) * (pool.ndim - 4)                     # () for scale pools
    slab_sizes = (1, 1, Hkv, page) + pool.shape[4:]
    npages = (S - 1) // page + 2  # worst-case span incl. boundary offset
    for b in range(B):
        o = offset[b]
        p_log = o // page
        r = o % page
        slab = store[b][None, None]                   # (1, 1, Hkv, S[, hd])
        if S == 1:
            pA = table[b, jnp.clip(p_log, 0, MAXP - 1)]
            pool = jax.lax.dynamic_update_slice(
                pool, slab, (l_idx, pA, 0, r) + tail)
            continue
        phys = [table[b, jnp.clip(p_log + j, 0, MAXP - 1)]
                for j in range(npages)]
        bufs = [jax.lax.dynamic_slice(
            pool, (l_idx, phys[j], 0, 0) + tail, slab_sizes)
            for j in range(npages)]
        buf = jnp.concatenate(bufs, axis=3)           # (.., npages*page[, hd])
        buf = jax.lax.dynamic_update_slice(buf, slab, (0, 0, 0, r) + tail)
        for j in range(npages):
            part = buf[:, :, :, j * page:(j + 1) * page]
            if j == 0:
                pool = jax.lax.dynamic_update_slice(
                    pool, part, (l_idx, phys[0], 0, 0) + tail)
            else:
                pool = jax.lax.cond(
                    r + S > j * page,
                    lambda p, pt=part, ph=phys[j]:
                        jax.lax.dynamic_update_slice(
                            p, pt, (l_idx, ph, 0, 0) + tail),
                    lambda p: p, pool)
    return pool


def quantize_kv(x: jax.Array) -> Tuple[jax.Array, jax.Array]:
    """Per-(head, token) symmetric int8: x (..., hd) -> codes int8 (..., hd)
    + scale fp32 (...,) with ``x ≈ codes * scale``."""
    xf = x.astype(jnp.float32)
    scale = jnp.max(jnp.abs(xf), axis=-1) / 127.0
    safe = jnp.maximum(scale, 1e-12)
    codes = jnp.clip(jnp.round(xf / safe[..., None]), -127, 127)
    return codes.astype(jnp.int8), scale


def compact_kv_cache(cache: KVCache, keep: jax.Array) -> KVCache:
    """Shift each stream's newest ``keep`` slots to the front of the ring and
    advance ``pos_base`` so absolute positions are unchanged — the stored
    K/V vectors are position-encoded at write time, so the move is a pure
    copy. Evicts everything older; callers must ensure the attention window
    (sliding_window) fits inside ``keep`` for exact-window semantics.
    ``keep``: (B,) or scalar int32."""
    B = cache.k.shape[1]
    keep = jnp.broadcast_to(jnp.asarray(keep, jnp.int32), (B,))
    keep = jnp.minimum(keep, cache.offset)
    shift = cache.offset - keep  # slots dropped from the front

    def roll_stream(kb, s):  # kb: (L, Hkv, C, hd) or (L, Hkv, C) scales
        return jnp.roll(kb, -s, axis=2)

    roll = jax.vmap(roll_stream, in_axes=(1, 0), out_axes=1)
    return KVCache(
        k=roll(cache.k, shift), v=roll(cache.v, shift),
        offset=keep, pos_base=cache.pos_base + shift,
        k_scale=None if cache.k_scale is None else roll(cache.k_scale, shift),
        v_scale=None if cache.v_scale is None else roll(cache.v_scale, shift))


def trim_kv_cache(cache: KVCache, new_offset: jax.Array) -> KVCache:
    """Rewind the cache to ``new_offset`` valid tokens (the static-shape
    equivalent of the reference's trim_past_key_values slicing,
    models/modeling_live.py:170-171 — no data movement needed, stale slots
    are simply overwritten/never attended)."""
    return cache._replace(offset=jnp.broadcast_to(jnp.asarray(new_offset, jnp.int32),
                                                  cache.offset.shape))


def _attention(q, k, v, q_pos, kv_valid_upto, *, num_groups,
               sliding_window: Optional[int] = None,
               k_scale=None, v_scale=None):
    """Masked multi-head attention (XLA reference path).

    q: (B, Hq, S, hd); k/v: (B, Hkv, C, hd)
    q_pos: (B, S) absolute positions of the queries
    kv_valid_upto: unused placeholder for future per-slot masks.
    mask: slot j attends iff j <= q_pos (and j > q_pos - sliding_window for
    Mistral-style windowed attention).
    k_scale/v_scale: (B, Hkv, C) fp32 — int8 KV codes are dequantized here
    (the quantized-cache reference path; the Pallas serving kernel instead
    dequantizes in-kernel so only int8 bytes cross HBM).
    """
    B, Hq, S, hd = q.shape
    C = k.shape[2]
    if k_scale is not None:
        k = (k.astype(jnp.float32) * k_scale[..., None]).astype(q.dtype)
        v = (v.astype(jnp.float32) * v_scale[..., None]).astype(q.dtype)
    if num_groups > 1:
        k = jnp.repeat(k, num_groups, axis=1)
        v = jnp.repeat(v, num_groups, axis=1)
    scale = 1.0 / jnp.sqrt(hd).astype(jnp.float32)
    logits = jnp.einsum("bhsd,bhcd->bhsc", q, k,
                        preferred_element_type=jnp.float32) * scale
    slot = jnp.arange(C, dtype=jnp.int32)
    mask = slot[None, None, None, :] <= q_pos[:, None, :, None]
    if sliding_window is not None:
        mask = jnp.logical_and(
            mask,
            slot[None, None, None, :] > (q_pos[:, None, :, None]
                                         - sliding_window))
    logits = jnp.where(mask, logits, jnp.finfo(jnp.float32).min)
    probs = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhsc,bhcd->bhsd", probs, v)


def _windowed(impl, window: int):
    """Bind a sliding window into an attention impl, preserving its
    cache-resident ``.layered`` variant if present."""
    def wrapped(q, k, v, q_pos, kv_valid_upto, *, num_groups, **kw):
        return impl(q, k, v, q_pos, kv_valid_upto, num_groups=num_groups,
                    sliding_window=window, **kw)
    layered = getattr(impl, "layered", None)
    if layered is not None:
        def wrapped_layered(q, k_all, v_all, q_pos, layer, *, num_groups,
                            **kw):
            return layered(q, k_all, v_all, q_pos, layer,
                           num_groups=num_groups, sliding_window=window, **kw)
        wrapped.layered = wrapped_layered
    return wrapped


def _layer(h, layer_params, layer_lora, cos, sin, q_pos, kv_ctx, cfg,
           lora_scaling, attn_impl, layer_rng=None, lora_dropout=0.0):
    """One transformer block.

    kv_ctx: (k_all, v_all, offset, layer_idx) with the FULL stacked cache
    (L, B, Hkv, C, hd) threaded through the layer scan's carry, or None.
    Writes are per-batch dynamic_update_slices into this layer's ring (XLA
    keeps carry updates in place); attention either reads blocks straight
    from the stacked cache (attn_impl.layered — O(valid) HBM traffic) or
    falls back to slicing out this layer's ring. Round-2 fix: the previous
    design returned per-layer rings as scan OUTPUTS, which stacked a full
    COPY of the entire cache every forward — +13 ms/token at 15k capacity
    on 8B."""
    B, S, D = h.shape
    Hq, Hkv, hd = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim

    def lget(name):
        return None if layer_lora is None else layer_lora.get(name)

    rngs = {}
    if layer_rng is not None and lora_dropout > 0.0:
        names = ("wq", "wk", "wv", "wo", "w_gate", "w_up", "w_down")
        keys = jax.random.split(layer_rng, len(names))
        rngs = dict(zip(names, keys))

    def rng(name):
        return rngs.get(name)

    def dns(x, name):
        return dense(x, layer_params[name], lget(name), lora_scaling,
                     drop_rng=rng(name), drop_rate=lora_dropout)

    x = rms_norm(h, layer_params["attn_norm"], cfg.rms_norm_eps)
    q = dns(x, "wq")
    k = dns(x, "wk")
    v = dns(x, "wv")
    if cfg.attention_bias:  # Qwen2 family
        q = q + layer_params["bq"]
        k = k + layer_params["bk"]
        v = v + layer_params["bv"]
    q = q.reshape(B, S, Hq, hd).transpose(0, 2, 1, 3)
    k = k.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
    v = v.reshape(B, S, Hkv, hd).transpose(0, 2, 1, 3)
    q = apply_rope(q, cos, sin)
    k = apply_rope(k, cos, sin)

    if isinstance(kv_ctx, dict):  # paged pool (PagedKVCache)
        pk, pv = kv_ctx["pk"], kv_ctx["pv"]
        pks, pvs = kv_ctx.get("pks"), kv_ctx.get("pvs")
        table, offset, l_idx = (kv_ctx["table"], kv_ctx["offset"],
                                kv_ctx["l_idx"])
        if pks is not None:  # int8 paged KV: quantize at append
            k, k_sc = quantize_kv(k)
            v, v_sc = quantize_kv(v)
            pks = _paged_append(pks, l_idx, table, offset, k_sc)
            pvs = _paged_append(pvs, l_idx, table, offset, v_sc)
        pk = _paged_append(pk, l_idx, table, offset, k)
        pv = _paged_append(pv, l_idx, table, offset, v)
        from ..ops.paged_attention import paged_attention
        attn_out = paged_attention(q, pk, pv, table, q_pos, l_idx,
                                   window=cfg.sliding_window,
                                   k_scale=pks, v_scale=pvs)
        attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, S, Hq * hd)
        h = h + dns(attn_out, "wo")
        x = rms_norm(h, layer_params["mlp_norm"], cfg.rms_norm_eps)
        from ..ops import fused_mlp
        fused = fused_mlp.maybe_fused(x, layer_params, layer_lora)
        if fused is not None:
            h = h + fused.astype(h.dtype)
        else:
            gate = dns(x, "w_gate")
            up = dns(x, "w_up")
            h = h + dns(jax.nn.silu(gate) * up, "w_down")
        return h, (pk, pv, pks, pvs)
    if kv_ctx is not None:
        # (L, B, Hkv, C, hd) x2, (L, B, Hkv, C) fp32 scales x2 (or None
        # when the cache is unquantized), (B,), ()
        k_all, v_all, ks_all, vs_all, offset, l_idx = kv_ctx
        quantized = ks_all is not None
        if quantized:
            k_store, k_sc = quantize_kv(k)   # (B, Hkv, S, hd) i8 / (B,Hkv,S)
            v_store, v_sc = quantize_kv(v)
        else:
            k_store, v_store = k, v
        # per-batch in-place append at each stream's offset (B is static
        # and small; unrolled scalar-start updates alias the scan carry)
        for b in range(B):
            k_all = jax.lax.dynamic_update_slice(
                k_all, k_store[b][None, None], (l_idx, b, 0, offset[b], 0))
            v_all = jax.lax.dynamic_update_slice(
                v_all, v_store[b][None, None], (l_idx, b, 0, offset[b], 0))
            if quantized:
                ks_all = jax.lax.dynamic_update_slice(
                    ks_all, k_sc[b][None, None], (l_idx, b, 0, offset[b]))
                vs_all = jax.lax.dynamic_update_slice(
                    vs_all, v_sc[b][None, None], (l_idx, b, 0, offset[b]))
        scale_kw = ({"k_scale": ks_all, "v_scale": vs_all} if quantized
                    else {})
        layered = getattr(attn_impl, "layered", None)
        if layered is not None:
            attn_out = layered(q, k_all, v_all, q_pos, l_idx,
                               num_groups=Hq // Hkv, **scale_kw)
        else:
            k_l = jax.lax.dynamic_index_in_dim(k_all, l_idx, 0,
                                               keepdims=False)
            v_l = jax.lax.dynamic_index_in_dim(v_all, l_idx, 0,
                                               keepdims=False)
            if quantized:
                scale_kw = {
                    "k_scale": jax.lax.dynamic_index_in_dim(
                        ks_all, l_idx, 0, keepdims=False),
                    "v_scale": jax.lax.dynamic_index_in_dim(
                        vs_all, l_idx, 0, keepdims=False)}
            attn_out = attn_impl(q, k_l, v_l, q_pos, None,
                                 num_groups=Hq // Hkv, **scale_kw)
        new_kv = (k_all, v_all, ks_all, vs_all)
    else:
        attn_out = attn_impl(q, k, v, q_pos, None, num_groups=Hq // Hkv)
        new_kv = None

    attn_out = attn_out.transpose(0, 2, 1, 3).reshape(B, S, Hq * hd)
    h = h + dns(attn_out, "wo")

    x = rms_norm(h, layer_params["mlp_norm"], cfg.rms_norm_eps)
    from ..ops import fused_mlp
    fused = fused_mlp.maybe_fused(x, layer_params, layer_lora)
    if fused is not None:
        # whole-MLP Pallas kernel: all three quantized matrices stream
        # through VMEM once per call, gate/up intermediates never touch HBM
        # (the per-matmul XLA path pays 3 weight streams' fusion boundaries;
        # int4 additionally dequantizes nibbles in-registers, which XLA
        # cannot fuse — it materializes the unpacked operand)
        h = h + fused.astype(h.dtype)
    elif (cfg.mlp_chunk and S > cfg.mlp_chunk
          and S % cfg.mlp_chunk == 0):
        h = h + _mlp_seq_chunked(x, layer_params, lget, lora_scaling,
                                 rngs, lora_dropout, cfg.mlp_chunk)
    else:
        gate = dns(x, "w_gate")
        up = dns(x, "w_up")
        h = h + dns(jax.nn.silu(gate) * up, "w_down")
    return h, new_kv


def _mlp_seq_chunked(x, layer_params, lget, lora_scaling, rngs,
                     lora_dropout, chunk: int):
    """SwiGLU MLP over (B, chunk, D) sequence slices (cfg.mlp_chunk).

    Exact for the math — the MLP mixes only the feature axis — but caps
    the training backward's working set at ONE chunk's (chunk,
    intermediate) temps instead of ~6 full (S, intermediate) buffers
    (336M each at 8B T=12288; the allocation dump behind the fit). Each
    slice body is checkpointed so the outer lax.map's backward saves only
    the (S, D) input. With LoRA dropout on, mask draws are per-chunk
    (split per slice) — a different realization than the unchunked single
    draw, same distribution (same documented divergence as the chunked
    CE loss, live._stream_ce_loss_chunked)."""
    B, S, D = x.shape
    n = S // chunk
    names = ("w_gate", "w_up", "w_down")
    use_drop = lora_dropout > 0.0 and any(rngs.get(nm) is not None
                                          for nm in names)
    if use_drop:
        chunk_rngs = jnp.stack(
            [jnp.stack(jax.random.split(rngs[nm], n)) for nm in names],
            axis=1)  # (n, 3, key)
    else:
        chunk_rngs = jnp.zeros((n, 0), jnp.uint32)

    @jax.checkpoint
    def slice_body(args):
        xc, rngs_c = args

        def dnsl(xx, nm, i):
            return dense(xx, layer_params[nm], lget(nm), lora_scaling,
                         drop_rng=rngs_c[i] if use_drop else None,
                         drop_rate=lora_dropout if use_drop else 0.0)

        gate = dnsl(xc, "w_gate", 0)
        up = dnsl(xc, "w_up", 1)
        return dnsl(jax.nn.silu(gate) * up, "w_down", 2)

    x_c = x.reshape(B, n, chunk, D).transpose(1, 0, 2, 3)
    out = jax.lax.map(slice_body, (x_c, chunk_rngs))
    return out.transpose(1, 0, 2, 3).reshape(B, S, D)


def forward(
    params: Params,
    *,
    cfg: LlamaConfig,
    input_ids: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    positions: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    num_valid: Optional[jax.Array] = None,
    lora: Optional[Params] = None,
    lora_scaling: float = 1.0,
    remat: bool = False,
    attn_impl=None,
    return_hidden: bool = False,
    last_logit_only: bool = False,
    logit_gather_positions: Optional[jax.Array] = None,
    lora_dropout_rng: Optional[jax.Array] = None,
    lora_dropout: float = 0.0,
    remat_group: int = 1,
) -> Tuple[jax.Array, Optional[KVCache]]:
    """Run the decoder.

    Without a cache: full causal forward over (B, S).
    With a cache: appends the (B, S) chunk at ``kv_cache.offset`` per stream
    (``num_valid`` (B,) of the S tokens are real; the rest is bucket padding)
    and attends over the whole ring. Returns (logits, updated cache).
    """
    attn_impl = attn_impl or _attention
    if cfg.sliding_window is not None:
        # windowed attention (Mistral family): thread the window through the
        # caller's impl — flash/ring Pallas kernels carry banded masks with
        # dead-block DMA skip on both sides (round 2; previously this
        # silently overrode attn_impl with the XLA path)
        attn_impl = _windowed(attn_impl, cfg.sliding_window)
    if inputs_embeds is None:
        inputs_embeds = embed_tokens(params, input_ids, cfg)
    h = inputs_embeds
    B, S, D = h.shape

    if positions is None:
        # absolute positions: slots-used + compaction base (RoPE is always
        # absolute; attention masks use slot-relative positions below)
        base = (kv_cache.pos_base + kv_cache.offset if kv_cache is not None
                else jnp.zeros((B,), jnp.int32))
        positions = base[:, None] + jnp.arange(S, dtype=jnp.int32)[None, :]
    cos, sin = rope_cos_sin(positions, cfg.head_dim, cfg.rope_theta)
    attn_pos = (positions - kv_cache.pos_base[:, None]
                if kv_cache is not None else positions)

    layer_lora = (lora or {}).get("layers") or None

    use_dropout = (lora_dropout_rng is not None and lora_dropout > 0.0
                   and layer_lora is not None)
    if use_dropout:
        layer_rngs = jax.random.split(lora_dropout_rng, cfg.num_layers + 1)
        head_rng = layer_rngs[-1]
        layer_rngs = layer_rngs[:-1]
    else:
        layer_rngs = jnp.zeros((cfg.num_layers, 0))
        head_rng = None

    if isinstance(kv_cache, PagedKVCache):
        layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

        def body_paged(carry, xs):
            h, pk, pv, pks, pvs = carry
            layer_params, layer_lora_x, rng_l, l_idx = xs
            h, (pk, pv, pks, pvs) = _layer(
                h, layer_params, layer_lora_x, cos, sin, attn_pos,
                {"pk": pk, "pv": pv, "pks": pks, "pvs": pvs,
                 "table": kv_cache.table,
                 "offset": kv_cache.offset, "l_idx": l_idx},
                cfg, lora_scaling, attn_impl,
                layer_rng=rng_l if use_dropout else None,
                lora_dropout=lora_dropout if use_dropout else 0.0)
            return (h, pk, pv, pks, pvs), None

        if remat:
            body_paged = jax.checkpoint(body_paged)
        (h, new_pk, new_pv, new_pks, new_pvs), _ = jax.lax.scan(
            body_paged,
            (h, kv_cache.k, kv_cache.v, kv_cache.k_scale, kv_cache.v_scale),
            (params["layers"], layer_lora, layer_rngs, layer_ids))
        new_kvs = (new_pk, new_pv, new_pks, new_pvs)
    elif kv_cache is not None:
        layer_ids = jnp.arange(cfg.num_layers, dtype=jnp.int32)

        def body_kv(carry, xs):
            h, k_all, v_all, ks_all, vs_all = carry
            layer_params, layer_lora_x, rng_l, l_idx = xs
            h, (k_all, v_all, ks_all, vs_all) = _layer(
                h, layer_params, layer_lora_x, cos, sin, attn_pos,
                (k_all, v_all, ks_all, vs_all, kv_cache.offset, l_idx),
                cfg, lora_scaling, attn_impl,
                layer_rng=rng_l if use_dropout else None,
                lora_dropout=lora_dropout if use_dropout else 0.0)
            return (h, k_all, v_all, ks_all, vs_all), None

        if remat:
            body_kv = jax.checkpoint(body_kv)
        (h, new_k, new_v, new_ks, new_vs), _ = jax.lax.scan(
            body_kv,
            (h, kv_cache.k, kv_cache.v, kv_cache.k_scale, kv_cache.v_scale),
            (params["layers"], layer_lora, layer_rngs, layer_ids))
        new_kvs = (new_k, new_v, new_ks, new_vs)
    else:
        def body(h, xs):
            layer_params, layer_lora_x, rng_l = xs
            h, _ = _layer(h, layer_params, layer_lora_x, cos, sin, positions,
                          None, cfg, lora_scaling, attn_impl,
                          layer_rng=rng_l if use_dropout else None,
                          lora_dropout=lora_dropout if use_dropout else 0.0)
            return h, None

        if remat and remat_group > 1 and cfg.num_layers % remat_group == 0:
            # Nested grouped remat: an outer scan over layer GROUPS whose
            # checkpointed body scans over the group's layers (each layer
            # itself checkpointed). Program-lifetime residuals drop from
            # num_layers x (B,S,D) to (num_layers/remat_group) x (B,S,D) —
            # the dominant training-memory term at long T (measured: the
            # bf16[32,1,12288,4096] saved-h buffer is 3.00 GiB of the
            # 15.80G OOM at 8B T=12288) — for one extra forward recompute
            # in the backward (fwd runs 3x total instead of 2x).
            G = remat_group
            grouped = jax.tree.map(
                lambda x: x.reshape((cfg.num_layers // G, G) + x.shape[1:]),
                (params["layers"], layer_lora, layer_rngs))
            inner = jax.checkpoint(body)

            @jax.checkpoint
            def group_body(h, xs):
                h, _ = jax.lax.scan(inner, h, xs)
                return h, None

            h, _ = jax.lax.scan(group_body, h, grouped)
        else:
            if remat:
                body = jax.checkpoint(body)
            h, _ = jax.lax.scan(body, h,
                                (params["layers"], layer_lora, layer_rngs))
        new_kvs = None

    if logit_gather_positions is not None:
        # (B,) or (B, G) positions within the chunk (e.g. last *valid* slot
        # of a bucket-padded append, or every frame-end of a chunked ingest)
        # — avoids the full-vocab lm_head on padding/non-gate tokens
        if logit_gather_positions.ndim == 2:
            h = jnp.take_along_axis(
                h, logit_gather_positions[..., None], axis=1)
        else:
            h = h[jnp.arange(h.shape[0]), logit_gather_positions][:, None]
    elif last_logit_only:
        h = h[:, -1:]
    h = rms_norm(h, params["final_norm"], cfg.rms_norm_eps)
    if return_hidden:
        logits = h
    else:
        logits = lm_head(params, h, cfg, lora=lora, lora_scaling=lora_scaling,
                         drop_rng=head_rng, drop_rate=lora_dropout)

    new_cache = None
    if isinstance(kv_cache, PagedKVCache):
        nv = num_valid if num_valid is not None else jnp.full((B,), S, jnp.int32)
        new_cache = PagedKVCache(k=new_kvs[0], v=new_kvs[1],
                                 table=kv_cache.table,
                                 offset=kv_cache.offset + nv,
                                 pos_base=kv_cache.pos_base,
                                 k_scale=new_kvs[2], v_scale=new_kvs[3])
    elif kv_cache is not None:
        nv = num_valid if num_valid is not None else jnp.full((B,), S, jnp.int32)
        new_cache = KVCache(k=new_kvs[0], v=new_kvs[1],
                            offset=kv_cache.offset + nv,
                            pos_base=kv_cache.pos_base,
                            k_scale=new_kvs[2], v_scale=new_kvs[3])
    return logits, new_cache


def embed_tokens(params: Params, input_ids: jax.Array, cfg: LlamaConfig) -> jax.Array:
    """Token embedding; ids are clamped into the vocab so the out-of-vocab
    ``<v>`` placeholder id is safe (reference modeling_live.py:38)."""
    ids = jnp.clip(input_ids, 0, cfg.vocab_size - 1)
    embed = params["embed"]
    if isinstance(embed, dict):  # int8 rows with per-row scales
        dtype = jnp.dtype(cfg.dtype)
        rows = embed["q8"][ids].astype(dtype)
        return rows * embed["scale"][ids][..., None].astype(dtype)
    return embed[ids]


def lm_head(params: Params, h: jax.Array, cfg: LlamaConfig, *,
            lora: Optional[Params] = None, lora_scaling: float = 1.0,
            drop_rng: Optional[jax.Array] = None,
            drop_rate: float = 0.0,
            tile_cols: Optional[int] = None) -> jax.Array:
    """``tile_cols``: when the head is applied INSIDE a lax.map/scan body
    (the chunked CE loss, the eval chunked stats), pass
    ``quant.head_tile_cols(V)`` so an int8 head's dequant is column-tiled
    — otherwise XLA's LICM hoists the full (D, V) bf16 dequantized weight
    out of the loop (measured 1002M at 8B; quant.quantized_matmul_tiled
    has the full finding). Bit-identical output; no-op for bf16 heads."""
    if cfg.tie_word_embeddings:
        assert not isinstance(params["embed"], dict), (
            "tied embeddings are not supported with int8 weights")
        w = params["embed"].T
    else:
        w = params["lm_head"]
    head_lora = (lora or {}).get("lm_head")
    return dense(h, w, head_lora, lora_scaling, drop_rng=drop_rng,
                 drop_rate=drop_rate, tile_cols=tile_cols)
