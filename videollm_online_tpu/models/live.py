"""LiveLlama: the streaming video-dialogue model.

Functional equivalent of the reference's ``LiveMixin`` +
``LiveLlamaForCausalLM`` (models/modeling_live.py:11-42,
models/live_llama/modeling_live_llama.py:12-70), redesigned for XLA:

  * ``joint_embed`` replaces the boolean-mask scatter
    (``inputs_embeds[v_mask] = visual``) with a static-shape cumsum gather —
    the i-th ``<v>`` position in flattened batch order takes the i-th
    projected frame token, matching the reference's in-order semantics;
  * the weighted streaming CE loss mirrors modeling_live_llama.py:56-61:
    per-token weight = ``stream_loss_weight`` on ``<v>`` positions, 1
    elsewhere, normalized by the count of supervised labels.
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp

from ..core.config import LiveConfig
from . import llama
from . import quant as quant_mod
from .llama import KVCache

Params = Dict[str, Any]

IGNORE_INDEX = -100


# ---------------------------------------------------------------------------
# connector (reference modeling_live_llama.py:18-22: Linear -> GELU -> Linear)


def init_connector(key: jax.Array, cfg: LiveConfig) -> Params:
    dtype = jnp.dtype(cfg.llama.dtype)
    k1, k2 = jax.random.split(key)
    vh, d = cfg.vision_hidden_size, cfg.llama.hidden_size
    s1 = 1.0 / jnp.sqrt(vh)
    s2 = 1.0 / jnp.sqrt(d)
    return {
        "fc1": {"w": (jax.random.uniform(k1, (vh, d), minval=-s1, maxval=s1)).astype(dtype),
                "b": jnp.zeros((d,), dtype)},
        "fc2": {"w": (jax.random.uniform(k2, (d, d), minval=-s2, maxval=s2)).astype(dtype),
                "b": jnp.zeros((d,), dtype)},
    }


def apply_connector(connector: Params, features: jax.Array) -> jax.Array:
    """(N, vision_hidden) -> (N, hidden). GELU matches HF GELUActivation
    (erf-based, not tanh-approx)."""
    h = features @ connector["fc1"]["w"] + connector["fc1"]["b"]
    h = jax.nn.gelu(h, approximate=False)
    return h @ connector["fc2"]["w"] + connector["fc2"]["b"]


# ---------------------------------------------------------------------------
# model params


def init_params(key: jax.Array, cfg: LiveConfig) -> Params:
    k1, k2, k3 = jax.random.split(key, 3)
    params = {
        "llama": llama.init_params(k1, cfg.llama),
        "connector": init_connector(k2, cfg),
    }
    if cfg.lora is not None:
        params["lora"] = llama.init_lora_params(k3, cfg.llama, cfg.lora)
    return params


def visual_embed(params: Params, frames: jax.Array, cfg: LiveConfig) -> jax.Array:
    """Project pre-extracted frame features through the connector and flatten
    to (num_frames * tokens_per_frame, hidden). Reference modeling_live.py:21-27.

    ``frames``: (N, tokens_per_frame, vision_hidden) or (N*, vision_hidden).
    """
    out = apply_connector(params["connector"], frames.astype(params["connector"]["fc1"]["w"].dtype))
    return out.reshape(-1, out.shape[-1])


def pixels_to_embeds(vision_params: Params, params: Params,
                     pixels: jax.Array, cfg: LiveConfig) -> jax.Array:
    """Raw uint8 frames (T, 3, H, W) -> per-frame LLM embeddings
    (T, frame_num_tokens, hidden): vision tower + connector (the
    reference's set_vision_inside path, modeling_live.py:12-27). Shared
    by both serving engines' raw-pixel ingest."""
    from . import siglip
    feats = siglip.frame_features(
        vision_params, siglip.preprocess(pixels, cfg.vision), cfg.vision,
        cfg)
    flat = visual_embed(params, feats, cfg)
    return flat.reshape(-1, cfg.frame_num_tokens, flat.shape[-1])


def joint_embed(
    params: Params,
    cfg: LiveConfig,
    input_ids: jax.Array,
    frames: Optional[jax.Array] = None,
) -> jax.Array:
    """Text embeddings with frame embeddings scattered into ``<v>`` slots.

    Static-shape XLA formulation of modeling_live.py:29-42: the k-th ``<v>``
    token in flattened (batch-major) order receives the k-th row of the
    flattened visual embedding matrix.
    """
    embeds = llama.embed_tokens(params["llama"], input_ids, cfg.llama)
    if frames is None or frames.size == 0:
        return embeds
    visual = visual_embed(params, frames, cfg)  # (Nv, D)
    B, T = input_ids.shape
    flat_ids = input_ids.reshape(-1)
    v_mask = flat_ids == cfg.v_placeholder_id
    # index of each <v> into the visual matrix; non-<v> positions get garbage
    # indices but are masked out below. clip for safety when the text has
    # more <v> slots than frames provided.
    v_idx = jnp.clip(jnp.cumsum(v_mask) - 1, 0, visual.shape[0] - 1)
    gathered = visual[v_idx].reshape(B, T, -1).astype(embeds.dtype)
    return jnp.where(v_mask.reshape(B, T)[..., None], gathered, embeds)


def forward(
    params: Params,
    cfg: LiveConfig,
    input_ids: Optional[jax.Array] = None,
    frames: Optional[jax.Array] = None,
    inputs_embeds: Optional[jax.Array] = None,
    labels: Optional[jax.Array] = None,
    kv_cache: Optional[KVCache] = None,
    num_valid: Optional[jax.Array] = None,
    remat: bool = False,
    attn_impl=None,
    dropout_rng: Optional[jax.Array] = None,
    chunked_loss: bool = False,
    loss_chunk: Optional[int] = None,
    remat_group: int = 1,
) -> Tuple[Optional[jax.Array], Optional[jax.Array], Optional[KVCache]]:
    """Returns (logits, loss or None, updated cache or None).

    Loss = weighted CE per modeling_live_llama.py:56-61 (labels arrive
    pre-shifted from the collator, so logits[t] is scored against labels[t]).

    ``chunked_loss=True`` (requires labels): the training-memory path —
    the decoder returns final-norm HIDDEN states and the weighted CE
    streams through LOSS_CHUNK-position lm_head chunks under
    ``jax.checkpoint`` (backward recomputes each chunk's head matmul), so
    the (T, vocab) f32 logits + log_softmax temporaries never exist at
    once. At 8B/128256-vocab they are 3.9 + 2.0 GB for the reference's
    T=8192 live1+ sequences — the difference between OOM and fitting on
    one 16 GiB chip. Returns (None, loss, cache): per-position math is
    identical (f32), only the reduction associativity differs.
    """
    if inputs_embeds is None:
        inputs_embeds = joint_embed(params, cfg, input_ids, frames)
    lora = params.get("lora")
    scaling = cfg.lora.scaling if (cfg.lora is not None and lora is not None) else 1.0
    lora_dropout = (cfg.lora.dropout if (cfg.lora is not None
                                         and lora is not None) else 0.0)
    if chunked_loss:
        assert labels is not None, "chunked_loss requires labels"
        hidden, new_cache = llama.forward(
            params["llama"], cfg=cfg.llama, inputs_embeds=inputs_embeds,
            kv_cache=kv_cache, num_valid=num_valid, lora=lora,
            lora_scaling=scaling, remat=remat, attn_impl=attn_impl,
            lora_dropout_rng=dropout_rng, lora_dropout=lora_dropout,
            return_hidden=True, remat_group=remat_group,
        )
        loss = _stream_ce_loss_chunked(
            params, cfg, hidden, labels, input_ids, lora=lora,
            scaling=scaling, dropout_rng=dropout_rng,
            drop_rate=lora_dropout, loss_chunk=loss_chunk)
        return None, loss, new_cache
    logits, new_cache = llama.forward(
        params["llama"], cfg=cfg.llama, inputs_embeds=inputs_embeds,
        kv_cache=kv_cache, num_valid=num_valid, lora=lora,
        lora_scaling=scaling, remat=remat, attn_impl=attn_impl,
        lora_dropout_rng=dropout_rng, lora_dropout=lora_dropout,
        remat_group=remat_group,
    )
    loss = None
    if labels is not None:
        loss = stream_ce_loss(logits, labels, input_ids, cfg)
    return logits, loss, new_cache


# Chunk size (positions) for the streamed lm_head + CE. Peak live loss
# memory ≈ 2 x LOSS_CHUNK x vocab f32 (logits + their cotangent during the
# recompute) ≈ 1.0 GiB at 1024 x 128256 — vs 5.9 GiB unchunked at T=8192.
LOSS_CHUNK = 1024


def _stream_ce_loss_chunked(params: Params, cfg: LiveConfig,
                            hidden: jax.Array, labels: jax.Array,
                            input_ids: jax.Array, *,
                            lora: Optional[Params] = None,
                            scaling: float = 1.0,
                            dropout_rng: Optional[jax.Array] = None,
                            drop_rate: float = 0.0,
                            loss_chunk: Optional[int] = None) -> jax.Array:
    """stream_ce_loss streamed through LOSS_CHUNK-position lm_head chunks.

    ``hidden`` is the decoder's final-norm output (B, T, D). Each chunk's
    head matmul + log_softmax + weighted NLL runs under ``jax.checkpoint``
    inside a ``lax.map``, so neither forward nor backward ever holds more
    than one chunk's (C, V) logits. Per-position math is identical f32 to
    :func:`stream_ce_loss`; only the reduction associativity differs.

    lm_head LoRA dropout (when configured) draws the same head key the
    unchunked path derives in ``llama.forward`` (split(num_layers+1)[-1])
    and splits it per chunk — the realized mask differs from the unchunked
    path's single (B, T, D) draw, which is fine for a stochastic
    regularizer but means chunked-vs-unchunked equality tests must run
    with dropout off.
    """
    assert input_ids is not None, "chunked loss requires input_ids"
    B, T, D = hidden.shape
    flat_h = hidden.reshape(-1, D)
    flat_labels = labels.reshape(-1)
    flat_ids = input_ids.reshape(-1)
    valid = flat_labels != IGNORE_INDEX
    weight = jnp.where(flat_ids == cfg.v_placeholder_id,
                       cfg.stream_loss_weight, 1.0)
    weight = jnp.where(valid, weight, 0.0).astype(jnp.float32)
    safe_labels = jnp.where(valid, flat_labels, 0)

    N = B * T
    C = min(loss_chunk or LOSS_CHUNK, N)
    pad = (-N) % C
    h_c = jnp.pad(flat_h, ((0, pad), (0, 0))).reshape(-1, C, D)
    lab_c = jnp.pad(safe_labels, (0, pad)).reshape(-1, C)
    w_c = jnp.pad(weight, (0, pad)).reshape(-1, C)  # pad weight 0 -> no-op
    n_chunks = h_c.shape[0]

    head_lora = (lora or {}).get("lm_head")
    use_drop = (dropout_rng is not None and drop_rate > 0.0
                and head_lora is not None)

    # column-tile an int8 head so its dequant stays inside the map (the
    # hoisted full bf16 head was 1002M at 8B — quant.quantized_matmul_tiled)
    tile_cols = quant_mod.head_tile_cols(cfg.llama.vocab_size)

    def chunk_weighted_nll(hc, lc, wc, rng):
        lg = llama.lm_head(params["llama"], hc, cfg.llama, lora=lora,
                           lora_scaling=scaling, drop_rng=rng,
                           drop_rate=drop_rate if rng is not None else 0.0,
                           tile_cols=tile_cols)
        logp = jax.nn.log_softmax(lg.astype(jnp.float32), axis=-1)
        nll = -jnp.take_along_axis(logp, lc[:, None], axis=-1)[:, 0]
        return (nll * wc).sum()

    if use_drop:
        head_rng = jax.random.split(dropout_rng,
                                    cfg.llama.num_layers + 1)[-1]
        chunk_rngs = jax.random.split(head_rng, n_chunks)
        body = jax.checkpoint(lambda xs: chunk_weighted_nll(*xs))
        sums = jax.lax.map(body, (h_c, lab_c, w_c, chunk_rngs))
    else:
        body = jax.checkpoint(
            lambda xs: chunk_weighted_nll(xs[0], xs[1], xs[2], None))
        sums = jax.lax.map(body, (h_c, lab_c, w_c))
    return sums.sum() / jnp.maximum(valid.sum(), 1)


def stream_ce_loss(logits: jax.Array, labels: jax.Array,
                   input_ids: jax.Array, cfg: LiveConfig) -> jax.Array:
    """Weighted cross entropy (reference modeling_live_llama.py:56-61).

    weight = stream_loss_weight on ``<v>`` positions, 1 elsewhere; the sum of
    weighted per-token losses is divided by the number of supervised tokens.
    Unsupervised positions (label == -100) contribute 0.
    """
    V = logits.shape[-1]
    flat_logits = logits.reshape(-1, V).astype(jnp.float32)
    flat_labels = labels.reshape(-1)
    flat_ids = input_ids.reshape(-1)
    valid = flat_labels != IGNORE_INDEX
    safe_labels = jnp.where(valid, flat_labels, 0)
    logp = jax.nn.log_softmax(flat_logits, axis=-1)
    nll = -jnp.take_along_axis(logp, safe_labels[:, None], axis=-1)[:, 0]
    v_mask = flat_ids == cfg.v_placeholder_id
    weight = jnp.where(v_mask, cfg.stream_loss_weight, 1.0)
    nll = jnp.where(valid, nll * weight, 0.0)
    return nll.sum() / jnp.maximum(valid.sum(), 1)
