"""Weight-only int8 / int4 quantization for serving.

The 8B decoder in bf16 (16 GB) exceeds a single v5e chip's 15.75 GB HBM;
per-channel symmetric int8 weights halve that (8 GB) and also halve the
weight-streaming HBM traffic that dominates batch-1 decode. int4 halves it
again (AWQ/GPTQ-style group-wise symmetric scales, default group=128 along
the reduction dim) — batch-1 decode is weight-bandwidth-bound, so weight
bytes translate ~directly into tokens/s. Computation stays bf16 on the MXU:
quantized blocks are converted on the fly and the scales fold into the
matmul's weight operand (XLA fuses the dequant into its weight streaming).

Quantized leaves are dicts the model code dispatches on
(models.llama.dense/embed_tokens/lm_head accept them transparently):

  int8: ``{"q8": int8 (in, out), "scale": (out,) f32}`` — per-out-channel
  int4: ``{"q4p": int8 (in/2, out), "scale": (in/group, out) f32}`` —
        group-wise scales; values NIBBLE-PACKED two-per-byte along the
        reduction dim: byte i holds row ``i`` in its low nibble and row
        ``i + in/2`` in its high nibble, so unpacking is two arithmetic
        shifts + one concatenation (NO interleave — the halves land in
        original row order). Native ``jnp.int4`` is deliberately NOT used
        for storage: s4 arrays cannot cross the jit boundary on the axon
        tunnel platform (RecursionError in jit dispatch), and packed int8
        is portable everywhere with identical HBM traffic.

The connector, norms and LoRA adapters stay in bf16 (tiny); the embedding
table stays int8 even under int4 (it is read by GATHER — a handful of rows
per step, not a streaming bottleneck — and nibble-gathers lower poorly)."""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

QUANT_KEY = "q8"
QUANT4_KEY = "q4p"
QUANT4C_KEY = "q4c"
INT4_GROUP = 128  # reduction-dim group size for int4 scales


def is_quantized(leaf) -> bool:
    return isinstance(leaf, dict) and (QUANT_KEY in leaf or QUANT4_KEY in leaf
                                       or QUANT4C_KEY in leaf)


def quantize_weight(w: jax.Array, axis: int = 0) -> Dict[str, jax.Array]:
    """Symmetric per-channel int8 over the reduction ``axis`` (scales have
    the shape of the non-reduced dims)."""
    wf = w.astype(jnp.float32)
    amax = jnp.max(jnp.abs(wf), axis=axis, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 127.0)
    q = jnp.clip(jnp.round(wf / scale), -127, 127).astype(jnp.int8)
    return {QUANT_KEY: q, "scale": jnp.squeeze(scale, axis=axis)}


def dequantize_weight(qw: Dict[str, jax.Array], axis: int = 0,
                      dtype=jnp.bfloat16) -> jax.Array:
    if QUANT4C_KEY in qw:
        return _dequantize_int4c(qw, jnp.float32).astype(dtype)
    if QUANT4_KEY in qw:
        return _dequantize_int4(qw, jnp.float32).astype(dtype)
    scale = jnp.expand_dims(qw["scale"], axis)
    return (qw[QUANT_KEY].astype(jnp.float32) * scale).astype(dtype)


def quantize_weight_int4(w: jax.Array, group: int = INT4_GROUP
                         ) -> Dict[str, jax.Array]:
    """Symmetric group-wise int4 over the reduction dim, which must be the
    SECOND-TO-LAST axis (``(..., in, out)`` — the layout of every stacked
    decoder matrix and the lm_head). Values live in [-7, 7] (symmetric, the
    -8 code unused) and are nibble-packed two rows per byte: byte ``i``
    holds row ``i`` (low nibble) and row ``i + in/2`` (high nibble).
    Scales are f32 ``(..., in/group, out)`` over the ORIGINAL row order."""
    *lead, d_in, d_out = w.shape
    group = min(group, d_in)  # small (test-size) matrices: one group
    assert d_in % group == 0, (d_in, group)
    assert d_in % 2 == 0, d_in
    wf = w.astype(jnp.float32).reshape(*lead, d_in // group, group, d_out)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(wf / scale), -7, 7)
    q = q.reshape(*lead, d_in, d_out).astype(jnp.int8)
    packed = _pack_nibbles(q)
    return {QUANT4_KEY: packed, "scale": jnp.squeeze(scale, -2)}


def _pack_nibbles(q: jax.Array) -> jax.Array:
    """int8 values in [-7,7] (..., in, out) -> (..., in/2, out) packed."""
    d_in = q.shape[-2]
    lo = q[..., : d_in // 2, :]
    hi = q[..., d_in // 2:, :]
    return ((lo & 0x0F) | (hi << 4)).astype(jnp.int8)


def _unpack_nibbles(p: jax.Array, dtype) -> jax.Array:
    """(..., in/2, out) packed int8 -> (..., in, out) values in ``dtype``.
    Two arithmetic shifts sign-extend the nibbles; the concat restores the
    original row order (lows were rows [0, in/2), highs [in/2, in))."""
    lo = jnp.right_shift(jnp.left_shift(p, 4), 4)
    hi = jnp.right_shift(p, 4)
    return jnp.concatenate([lo, hi], axis=-2).astype(dtype)


def quantize_weight_int4c(w: jax.Array, group: int = INT4_GROUP
                          ) -> Dict[str, jax.Array]:
    """COLUMN-packed symmetric group-wise int4 ("v2", round 3).

    Same group-wise quantization as :func:`quantize_weight_int4` but packed
    along the OUTPUT axis: byte ``(k, j)`` holds output column ``j + out/2``
    as a SIGNED high nibble and column ``j`` as a BIASED (+8) low nibble:

        byte = 16 * q[k, j + out/2] + (q[k, j] + 8)          (int8-exact)

    This layout exists for the fused kernels' partial-sum dequant trick
    (ops/fused_mlp.py): because the two nibbles of a byte belong to the SAME
    contraction row, ``x @ byte_matrix = 16 * (x @ hi) + x @ lo_biased`` —
    the kernel recovers both output-column halves from ONE matmul against
    the raw bytes plus one against the floor-extracted high nibble, with
    scales and the +8 bias applied to (B, block) PARTIALS per contraction
    group. VPU cost falls from ~11 ops/packed-byte (the q4p row-packed
    unpack + per-element scales) to ~5."""
    *lead, d_in, d_out = w.shape
    group = min(group, d_in)
    assert d_in % group == 0, (d_in, group)
    assert d_out % 2 == 0, d_out
    wf = w.astype(jnp.float32).reshape(*lead, d_in // group, group, d_out)
    amax = jnp.max(jnp.abs(wf), axis=-2, keepdims=True)
    scale = jnp.where(amax == 0, 1.0, amax / 7.0)
    q = jnp.clip(jnp.round(wf / scale), -7, 7)
    q = q.reshape(*lead, d_in, d_out).astype(jnp.int8)
    lo = q[..., :, : d_out // 2] + 8                 # biased [1, 15]
    hi = q[..., :, d_out // 2:]                      # signed [-7, 7]
    packed = (16 * hi + lo).astype(jnp.int8)
    return {QUANT4C_KEY: packed, "scale": jnp.squeeze(scale, -2)}


def _dequantize_int4c(qw: Dict[str, jax.Array], dtype) -> jax.Array:
    p = qw[QUANT4C_KEY]
    # hi = floor(byte / 16) holds because the low half is biased to [0, 15]
    hi = jnp.floor_divide(p.astype(jnp.int32), 16)
    lo = p.astype(jnp.int32) - 16 * hi - 8
    q = jnp.concatenate([lo, hi], axis=-1).astype(dtype)
    scale = qw["scale"]
    *lead, d_in, d_out = q.shape
    n_groups = scale.shape[-2]
    wf = q.reshape(*lead, n_groups, d_in // n_groups, d_out)
    wf = wf * scale[..., :, None, :].astype(dtype)
    return wf.reshape(*lead, d_in, d_out)


def _dequantize_int4(qw: Dict[str, jax.Array], dtype) -> jax.Array:
    q = _unpack_nibbles(qw[QUANT4_KEY], dtype)
    scale = qw["scale"]
    *lead, d_in, d_out = q.shape
    n_groups = scale.shape[-2]
    wf = q.reshape(*lead, n_groups, d_in // n_groups, d_out)
    wf = wf * scale[..., :, None, :].astype(dtype)
    return wf.reshape(*lead, d_in, d_out)


def quantized_matmul(x: jax.Array, qw: Dict[str, jax.Array]) -> jax.Array:
    """x (.., in) @ q8 (in, out) * scale (out,) in x.dtype — XLA path.

    SETTLED (round 2, v5e, RTT-corrected measurements): XLA's fused
    convert-matmul streams int8 weights at ~700-770 GB/s effective (round
    1's "371 GB/s" was a tunnel-latency artifact). A tuned Pallas dequant
    kernel beat it in STANDALONE microbenchmarks (885 vs 700 GB/s at
    4096x4096 with >=2KB DMA row segments) but LOST the full decode step by
    +4.9 ms/token (19.5 vs 14.6): each pallas_call is a fusion barrier that
    forfeits XLA's cross-op weight-prefetch overlap, ~22 us x 224 calls per
    token. A per-matmul kernel cannot win the decode path; the winning shape
    would be one fused whole-layer kernel. The kernel was deleted (see git
    history / BENCH_NOTES.md)."""
    if QUANT4C_KEY in qw:
        # serving decode dispatches the fused Pallas matmul (in-register
        # partial-sum dequant); everywhere else (CPU tests, prefill) the
        # XLA dequant fallback is correct if slower
        from ..ops.fused_mlp import maybe_matmul_int4c
        y = maybe_matmul_int4c(x, qw)
        if y is not None:
            return y.astype(x.dtype)
        return x @ _dequantize_int4c(qw, x.dtype)
    if QUANT4_KEY in qw:
        # group-wise scales cannot fold into the epilogue; dequantize into
        # the matmul's weight operand (XLA fuses convert+mul into its weight
        # streaming — the HBM read stays int4-sized)
        return x @ _dequantize_int4(qw, x.dtype)
    w = qw[QUANT_KEY].astype(x.dtype)
    y = x @ w
    return y * qw["scale"].astype(x.dtype)


def head_tile_cols(v: int, max_tile: int = 32768) -> Optional[int]:
    """Largest lane-aligned (multiple-of-128) divisor of ``v`` that is
    <= ``max_tile`` — the column-tile width for :func:`quantized_matmul`'s
    ``tile_cols`` path (None if ``v`` itself already fits). For Llama-3's
    V=128256 this is 21376 (6 tiles)."""
    if v <= max_tile:
        return None
    best = None
    for d in range(128, max_tile + 1, 128):
        if v % d == 0:
            best = d
    return best


def quantized_matmul_tiled(x: jax.Array, qw: Dict[str, jax.Array],
                           tile_cols: int) -> jax.Array:
    """int8 ``quantized_matmul`` as a scan over output-column tiles.

    Inside a ``lax.map``/``lax.scan``/``while_loop`` body the plain int8
    path's loop-invariant s8->bf16 dequant gets hoisted by XLA's LICM and
    the FULL dequantized weight stays live for the loop's lifetime —
    measured 1002M for the 8B (4096, 128256) lm_head in the T=12288
    training OOM dump (and ``jax.lax.optimization_barrier`` does NOT
    block the hoist — measured: identical 15.99G OOM with the weight
    pinned). Slicing the weight by a loop-carried column index makes the
    convert operand loop-VARIANT — the same reason the per-layer scan
    never hoists its weights — so peak extra memory is ONE (in, tile)
    bf16 tile and the HBM read stays int8-sized. Column tiling does not
    change the contraction: each output column still reduces over the
    full ``in`` axis, so results are bit-identical to the untiled path.
    """
    w8, scale = qw[QUANT_KEY], qw["scale"]
    v = w8.shape[-1]
    assert v % tile_cols == 0, (v, tile_cols)

    def tile(i):
        wt = jax.lax.dynamic_slice_in_dim(w8, i * tile_cols, tile_cols, -1)
        st = jax.lax.dynamic_slice_in_dim(scale, i * tile_cols, tile_cols,
                                          -1)
        return (x @ wt.astype(x.dtype)) * st.astype(x.dtype)

    tiles = jax.lax.map(tile, jnp.arange(v // tile_cols))  # (n, ..., tile)
    return jnp.moveaxis(tiles, 0, -2).reshape(*x.shape[:-1], v)


# int4 serving layout (round 3, measured): column-packed int4 (q4c) for the
# matrices the fused kernels cover — the MLP (75% of layer bytes, whole-MLP
# kernel = ONE pallas_call per layer) and the lm_head (one call per token).
# qkv/o STAY int8: four extra pallas_call fusion barriers per layer
# (~22us each, BENCH_NOTES.md) would cost more than the 0.67 GB they save,
# and XLA's int4 path materializes the unpacked operand in HBM.
_INT4C_MATS = ("w_gate", "w_up", "w_down")


def quantize_llama_params(params: Dict[str, Any], bits: int = 8
                          ) -> Dict[str, Any]:
    """Quantize all big decoder matrices; everything else passes through.
    ``bits`` = 8 (per-channel int8) or 4 (the mixed int4 serving layout:
    MLP + lm_head column-packed group-wise int4, attention + embedding
    int8 — see _INT4C_MATS note)."""
    assert bits in (8, 4), bits
    int8_mat = lambda w: quantize_weight(w, axis=-2)  # noqa: E731
    quant_for = (lambda name: (quantize_weight_int4c
                               if bits == 4 and name in _INT4C_MATS
                               else int8_mat))
    out = {}
    out["embed"] = quantize_weight(params["embed"], axis=1)  # per-row
    out["final_norm"] = params["final_norm"]
    layers = {}
    for name, w in params["layers"].items():
        if name in ("attn_norm", "mlp_norm", "bq", "bk", "bv"):
            layers[name] = w  # norms + Qwen2 qkv biases stay unquantized
        else:
            layers[name] = quant_for(name)(w)  # stacked (L, in, out)
    out["layers"] = layers
    if "lm_head" in params:
        out["lm_head"] = (quantize_weight_int4c(params["lm_head"])
                          if bits == 4 else int8_mat(params["lm_head"]))
    return out


def quantize_live_params(params: Dict[str, Any], bits: int = 8
                         ) -> Dict[str, Any]:
    out = dict(params)
    out["llama"] = quantize_llama_params(params["llama"], bits=bits)
    return out


def param_bytes(tree) -> int:
    return sum(x.size * x.dtype.itemsize for x in jax.tree.leaves(tree))


def random_quantized_llama_params(key: jax.Array, cfg, bits: int = 8
                                  ) -> Dict[str, Any]:
    """Build an int8/int4-quantized decoder DIRECTLY (no bf16 staging copy)
    — random init for serving benchmarks of models whose bf16 form would not
    fit HBM (8B on one 16 GiB v5e)."""
    import numpy as np

    assert bits in (8, 4), bits
    L, D, F = cfg.num_layers, cfg.hidden_size, cfg.intermediate_size

    def qrand8(k, shape, fan_in):
        q = jax.random.randint(k, shape, -127, 128, jnp.int8)
        scale = jnp.full(shape[:-2] + (shape[-1],),
                         0.02 / 127.0 / np.sqrt(fan_in / D), jnp.float32)
        return {QUANT_KEY: q, "scale": scale}

    def qrand4c(k, shape, fan_in):
        # column-packed layout (see quantize_weight_int4c): ANY int8 byte
        # decodes consistently (hi = floor(b/16), lo = b - 16*hi - 8), so
        # random bytes are valid packed data — no full-width staging copy
        packed = jax.random.randint(
            k, shape[:-1] + (shape[-1] // 2,), -128, 128, jnp.int8)
        n_groups = max(shape[-2] // INT4_GROUP, 1)
        scale = jnp.full(shape[:-2] + (n_groups, shape[-1]),
                         0.02 / 7.0 / np.sqrt(fan_in / D), jnp.float32)
        return {QUANT4C_KEY: packed, "scale": scale}

    def qrand(k, shape, fan_in, name=""):
        if bits == 4 and (name in _INT4C_MATS or name == "lm_head"):
            return qrand4c(k, shape, fan_in)
        return qrand8(k, shape, fan_in)

    keys = jax.random.split(key, 10)
    dims = {
        "wq": (D, cfg.q_dim), "wk": (D, cfg.kv_dim), "wv": (D, cfg.kv_dim),
        "wo": (cfg.q_dim, D), "w_gate": (D, F), "w_up": (D, F),
        "w_down": (F, D),
    }
    layers = {
        "attn_norm": jnp.ones((L, D), jnp.bfloat16),
        "mlp_norm": jnp.ones((L, D), jnp.bfloat16),
    }
    for i, (name, (din, dout)) in enumerate(dims.items()):
        layers[name] = qrand(keys[i], (L, din, dout), din, name=name)
    if getattr(cfg, "attention_bias", False):  # Qwen2 family
        layers["bq"] = jnp.zeros((L, cfg.q_dim), jnp.bfloat16)
        layers["bk"] = jnp.zeros((L, cfg.kv_dim), jnp.bfloat16)
        layers["bv"] = jnp.zeros((L, cfg.kv_dim), jnp.bfloat16)
    V = cfg.vocab_size
    return {
        "embed": {QUANT_KEY: jax.random.randint(keys[7], (V, D), -127, 128,
                                                jnp.int8),
                  "scale": jnp.full((V,), 0.02 / 127.0, jnp.float32)},
        "layers": layers,
        "final_norm": jnp.ones((D,), jnp.bfloat16),
        "lm_head": qrand(keys[8], (D, V), D, name="lm_head"),
    }
