"""Weight-only int8: memory halves, logits stay close, greedy decode is
stable on a tiny model."""

import numpy as np

import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live, quant


def _setup():
    cfg = tiny_live_config()
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, tok, params


def test_roundtrip_error_small():
    cfg, _, params = _setup()
    w = params["llama"]["layers"]["wq"]
    qw = quant.quantize_weight(w, axis=1)
    back = quant.dequantize_weight(qw, axis=1, dtype=jnp.float32)
    rel = float(jnp.max(jnp.abs(back - w)) / jnp.max(jnp.abs(w)))
    assert rel < 0.02


def test_memory_halves():
    cfg, _, params = _setup()
    qparams = quant.quantize_live_params(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), params))
    orig = quant.param_bytes(params["llama"])
    q = quant.param_bytes(qparams["llama"])
    assert q < orig * 0.6


def test_quantized_forward_close():
    cfg, tok, params = _setup()
    qparams = quant.quantize_live_params(params)
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.llama.vocab_size, (1, 24)))
    ref, _, _ = live.forward(params, cfg, input_ids=ids)
    got, _, _ = live.forward(qparams, cfg, input_ids=ids)
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    # cosine similarity of the final-position logits
    a, b = ref[0, -1], got[0, -1]
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999
    # greedy argmax path mostly unchanged
    agree = (ref.argmax(-1) == got.argmax(-1)).mean()
    assert agree > 0.9
