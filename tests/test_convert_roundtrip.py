"""Weight conversion: HF safetensors file -> our pytree -> logits parity,
for both single-file and sharded-directory layouts (the real Llama-3
checkpoint format), plus the int8 conversion path of tools/convert_weights."""

import os

import numpy as np
import pytest

import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_llama_config
from videollm_online_tpu.models import llama
from videollm_online_tpu.models.convert import (
    llama_params_from_state_dict, load_safetensors_state_dict)

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")
safetensors = pytest.importorskip("safetensors")


@pytest.fixture(scope="module")
def hf_and_files(tmp_path_factory):
    from safetensors.torch import save_file

    cfg = tiny_llama_config()
    hf_cfg = transformers.LlamaConfig(
        vocab_size=cfg.vocab_size, hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        num_key_value_heads=cfg.num_kv_heads, head_dim=cfg.head_dim,
        rope_theta=cfg.rope_theta, rms_norm_eps=cfg.rms_norm_eps,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False)
    torch.manual_seed(0)
    hf = transformers.LlamaForCausalLM(hf_cfg).eval()
    sd = {k: v.contiguous() for k, v in hf.state_dict().items()}

    single = tmp_path_factory.mktemp("st") / "model.safetensors"
    save_file(sd, str(single))

    sharded = tmp_path_factory.mktemp("st_shards")
    keys = sorted(sd)
    half = len(keys) // 2
    save_file({k: sd[k] for k in keys[:half]},
              str(sharded / "model-00001-of-00002.safetensors"))
    save_file({k: sd[k] for k in keys[half:]},
              str(sharded / "model-00002-of-00002.safetensors"))
    return cfg, hf, str(single), str(sharded)


@pytest.mark.parametrize("which", ["single", "sharded"])
def test_safetensors_to_logits_parity(hf_and_files, which):
    cfg, hf, single, sharded = hf_and_files
    path = single if which == "single" else sharded
    sd = load_safetensors_state_dict(path)
    params = llama_params_from_state_dict(sd, cfg, dtype="float32")
    ids = np.random.RandomState(0).randint(0, cfg.vocab_size, (1, 12))
    with torch.no_grad():
        ref = hf(input_ids=torch.tensor(ids)).logits.numpy()
    got, _ = llama.forward(params, cfg=cfg, input_ids=jnp.asarray(ids))
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_int8_conversion_close(hf_and_files):
    from videollm_online_tpu.models import quant
    cfg, hf, single, _ = hf_and_files
    sd = load_safetensors_state_dict(single)
    params = llama_params_from_state_dict(sd, cfg, dtype="float32")
    qparams = quant.quantize_llama_params(params)
    ids = np.random.RandomState(1).randint(0, cfg.vocab_size, (1, 12))
    ref, _ = llama.forward(params, cfg=cfg, input_ids=jnp.asarray(ids))
    got, _ = llama.forward(qparams, cfg=cfg, input_ids=jnp.asarray(ids))
    a = np.asarray(ref)[0, -1]
    b = np.asarray(got)[0, -1]
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999
