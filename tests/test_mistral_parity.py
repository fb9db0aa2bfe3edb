"""Mistral family: sliding-window attention parity vs HF
MistralForCausalLM on shared tiny weights (the reference's documented
second-LLM extension point, README.md:108)."""

import numpy as np
import pytest

import jax.numpy as jnp

from videollm_online_tpu.core.config import LlamaConfig
from videollm_online_tpu.models import llama
from videollm_online_tpu.models.convert import llama_params_from_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


def test_mistral_sliding_window_matches_hf():
    cfg = LlamaConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_layers=2, num_heads=4, num_kv_heads=2, head_dim=16,
        rope_theta=10000.0, sliding_window=8, dtype="float32")
    hf_cfg = transformers.MistralConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        sliding_window=cfg.sliding_window,
        tie_word_embeddings=False,
        attn_implementation="eager",
    )
    torch.manual_seed(0)
    hf = transformers.MistralForCausalLM(hf_cfg).eval()
    params = llama_params_from_state_dict(hf.state_dict(), cfg,
                                          dtype="float32")
    # T > window so the sliding mask actually matters
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 24))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    got, _ = llama.forward(params, cfg=cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-3)
    # sanity: with the window disabled the logits DIFFER (mask is live)
    cfg_full = LlamaConfig(**{**cfg.__dict__, "sliding_window": None})
    got_full, _ = llama.forward(params, cfg=cfg_full,
                                input_ids=jnp.asarray(ids))
    assert not np.allclose(np.asarray(got), np.asarray(got_full), atol=1e-3)
