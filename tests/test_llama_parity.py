"""Numerical parity of the functional Llama vs HF torch LlamaForCausalLM.

This is the "same weights, same logits" guarantee the BASELINE demands
(bit-fidelity of per-frame token outputs requires the decoder to match the
reference's base LLM numerics; SURVEY.md §7 hard part 4).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_llama_config
from videollm_online_tpu.models import llama
from videollm_online_tpu.models.convert import llama_params_from_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = tiny_llama_config()
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads,
        head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta,
        rms_norm_eps=cfg.rms_norm_eps,
        max_position_embeddings=cfg.max_position_embeddings,
        attention_bias=False,
        mlp_bias=False,
        tie_word_embeddings=False,
    )
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    params = llama_params_from_state_dict(hf.state_dict(), cfg, dtype="float32")
    return cfg, hf, params


def test_full_forward_matches_hf(tiny_pair):
    cfg, hf, params = tiny_pair
    rng = np.random.RandomState(0)
    ids = rng.randint(0, cfg.vocab_size, size=(2, 17))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    got, _ = llama.forward(params, cfg=cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_prefill_then_decode_matches_full(tiny_pair):
    cfg, _, params = tiny_pair
    rng = np.random.RandomState(1)
    T = 13
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(1, T)))

    full, _ = llama.forward(params, cfg=cfg, input_ids=ids)

    cache = llama.init_kv_cache(cfg, batch=1, capacity=32, dtype=jnp.float32)
    pre, cache = llama.forward(params, cfg=cfg, input_ids=ids[:, :7],
                               kv_cache=cache)
    np.testing.assert_allclose(np.asarray(pre), np.asarray(full[:, :7]),
                               atol=1e-4, rtol=1e-3)
    # token-by-token decode for the rest
    for t in range(7, T):
        step, cache = llama.forward(params, cfg=cfg, input_ids=ids[:, t:t + 1],
                                    kv_cache=cache)
        np.testing.assert_allclose(np.asarray(step[0, 0]),
                                   np.asarray(full[0, t]),
                                   atol=1e-4, rtol=1e-3)
    assert int(cache.offset[0]) == T


def test_bucket_padded_append_matches_full(tiny_pair):
    """Appending a chunk padded to a bucket size must equal the unpadded run
    (the serving loop pads frame/prompt appends to fixed buckets)."""
    cfg, _, params = tiny_pair
    rng = np.random.RandomState(2)
    ids = jnp.asarray(rng.randint(0, cfg.vocab_size, size=(1, 10)))
    full, _ = llama.forward(params, cfg=cfg, input_ids=ids)

    cache = llama.init_kv_cache(cfg, batch=1, capacity=64, dtype=jnp.float32)
    # append first 6 valid tokens inside a bucket of 8 (2 garbage tokens)
    bucket = jnp.concatenate([ids[:, :6], jnp.zeros((1, 2), jnp.int32)], axis=1)
    out, cache = llama.forward(params, cfg=cfg, input_ids=bucket,
                               kv_cache=cache,
                               num_valid=jnp.array([6], jnp.int32))
    np.testing.assert_allclose(np.asarray(out[:, :6]), np.asarray(full[:, :6]),
                               atol=1e-4, rtol=1e-3)
    assert int(cache.offset[0]) == 6
    # next append overwrites the stale padding region
    out, cache = llama.forward(params, cfg=cfg, input_ids=ids[:, 6:],
                               kv_cache=cache)
    np.testing.assert_allclose(np.asarray(out), np.asarray(full[:, 6:]),
                               atol=1e-4, rtol=1e-3)


def test_lora_zero_b_is_identity(tiny_pair):
    cfg, _, params = tiny_pair
    from videollm_online_tpu.core.config import LoraConfig
    lcfg = LoraConfig(r=4, alpha=8)
    lora = llama.init_lora_params(jax.random.PRNGKey(0),
                                  cfg.__class__(**{**cfg.__dict__}), lcfg)
    ids = jnp.asarray(np.random.RandomState(3).randint(0, cfg.vocab_size, (1, 9)))
    base, _ = llama.forward(params, cfg=cfg, input_ids=ids)
    with_lora, _ = llama.forward(params, cfg=cfg, input_ids=ids, lora=lora,
                                 lora_scaling=lcfg.scaling)
    np.testing.assert_allclose(np.asarray(base), np.asarray(with_lora),
                               atol=1e-5)


def test_lora_nonzero_changes_targets_only(tiny_pair):
    cfg, _, params = tiny_pair
    from videollm_online_tpu.core.config import LoraConfig
    lcfg = LoraConfig(r=4, alpha=8)
    lora = llama.init_lora_params(jax.random.PRNGKey(0), cfg, lcfg)
    # make B nonzero
    lora = jax.tree.map(lambda x: x + 0.01, lora)
    ids = jnp.asarray(np.random.RandomState(4).randint(0, cfg.vocab_size, (1, 9)))
    base, _ = llama.forward(params, cfg=cfg, input_ids=ids)
    with_lora, _ = llama.forward(params, cfg=cfg, input_ids=ids, lora=lora,
                                 lora_scaling=lcfg.scaling)
    assert not np.allclose(np.asarray(base), np.asarray(with_lora), atol=1e-5)
