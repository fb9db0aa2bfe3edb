"""Qwen2 family: q/k/v projection bias parity vs HF Qwen2ForCausalLM on
shared tiny weights (third LLM family behind Llama and Mistral — the
reference documents swapping the LLM parent as the extension point,
README.md:108)."""

import numpy as np
import pytest

import jax.numpy as jnp

from videollm_online_tpu.core.config import LlamaConfig, qwen2_7b_config
from videollm_online_tpu.models import llama
from videollm_online_tpu.models.convert import llama_params_from_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def _tiny_cfg():
    return LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=1e6, rms_norm_eps=1e-6, attention_bias=True,
        dtype="float32")


def _hf_model(cfg):
    hf_cfg = transformers.Qwen2Config(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    return transformers.Qwen2ForCausalLM(hf_cfg).eval()


def test_qwen2_logits_match_hf():
    cfg = _tiny_cfg()
    hf = _hf_model(cfg)
    # HF initializes the qkv biases to zero; give them real values so the
    # bias path is actually exercised
    with torch.no_grad():
        for lyr in hf.model.layers:
            for proj in (lyr.self_attn.q_proj, lyr.self_attn.k_proj,
                         lyr.self_attn.v_proj):
                proj.bias.uniform_(-0.5, 0.5)
    params = llama_params_from_state_dict(hf.state_dict(), cfg,
                                          dtype="float32")
    assert "bq" in params["layers"]
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 17))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    got, _ = llama.forward(params, cfg=cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-3)
    # sanity: zeroing the bias changes the logits (the bias path is live)
    p0 = dict(params)
    p0["layers"] = {k: (jnp.zeros_like(v) if k in ("bq", "bk", "bv") else v)
                    for k, v in params["layers"].items()}
    got0, _ = llama.forward(p0, cfg=cfg, input_ids=jnp.asarray(ids))
    assert not np.allclose(np.asarray(got), np.asarray(got0), atol=1e-3)


def test_qwen2_incremental_decode_matches_full():
    """KV-cache decode path (the serving form) with attention bias."""
    import jax

    cfg = _tiny_cfg()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    # init gives zero biases; randomize so the cache path sees them
    params["layers"]["bq"] = 0.3 * jax.random.normal(
        jax.random.PRNGKey(1), params["layers"]["bq"].shape)
    params["layers"]["bk"] = 0.3 * jax.random.normal(
        jax.random.PRNGKey(2), params["layers"]["bk"].shape)
    params["layers"]["bv"] = 0.3 * jax.random.normal(
        jax.random.PRNGKey(3), params["layers"]["bv"].shape)
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (1, 12))
    full, _ = llama.forward(params, cfg=cfg, input_ids=jnp.asarray(ids))
    cache = llama.init_kv_cache(cfg, batch=1, capacity=32)
    outs = []
    for t in range(ids.shape[1]):
        step, cache = llama.forward(params, cfg=cfg,
                                    input_ids=jnp.asarray(ids[:, t:t + 1]),
                                    kv_cache=cache)
        outs.append(np.asarray(step[:, -1]))
    np.testing.assert_allclose(np.stack(outs, axis=1), np.asarray(full),
                               atol=2e-4, rtol=2e-3)


def test_qwen2_7b_preset_shapes():
    cfg = qwen2_7b_config()
    assert cfg.attention_bias and cfg.vocab_size == 152064
    assert cfg.q_dim == 28 * 128 and cfg.kv_dim == 4 * 128
