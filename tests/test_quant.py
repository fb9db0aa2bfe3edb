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


# ------------------------------------------------------------------- int4

def test_int4_roundtrip_error_small():
    """Group-wise int4 dequant error stays within the 4-bit grid step."""
    cfg, _, params = _setup()
    w = params["llama"]["layers"]["wq"]  # (L, D, q_dim)
    qw = quant.quantize_weight_int4(w, group=w.shape[1] // 2)
    assert qw["q4p"].dtype == jnp.int8
    assert qw["q4p"].shape == (w.shape[0], w.shape[1] // 2, w.shape[2])
    assert qw["scale"].shape == (w.shape[0], 2, w.shape[2])
    back = quant.dequantize_weight(qw, dtype=jnp.float32)
    # max error <= scale/2 per group
    err = jnp.abs(back - w.astype(jnp.float32))
    bound = jnp.repeat(qw["scale"] / 2 + 1e-8, w.shape[1] // 2, axis=1)
    assert bool(jnp.all(err <= bound))


def test_int4_matmul_matches_dequantized():
    """quantized_matmul's fused dequant == explicit dequantize + matmul."""
    cfg, _, params = _setup()
    w = params["llama"]["layers"]["w_up"][0]  # (D, F)
    qw = quant.quantize_weight_int4(w, group=32)
    x = jax.random.normal(jax.random.PRNGKey(3), (5, w.shape[0]),
                          jnp.bfloat16)
    fused = quant.quantized_matmul(x, qw)
    explicit = x @ quant.dequantize_weight(qw, dtype=jnp.bfloat16)
    np.testing.assert_allclose(np.asarray(fused, np.float32),
                               np.asarray(explicit, np.float32),
                               rtol=2e-2, atol=2e-2)


def test_int4_forward_close():
    cfg, tok, params = _setup()
    # tiny config hidden dims are small; use a small group so there are
    # multiple groups per matrix
    qparams = dict(params)
    qparams["llama"] = quant.quantize_llama_params(params["llama"], bits=4)
    # mixed serving layout (round 3): embedding + attention stay int8,
    # MLP goes column-packed int4
    assert "q8" in qparams["llama"]["embed"]
    assert "q8" in qparams["llama"]["layers"]["wq"]
    assert "q4c" in qparams["llama"]["layers"]["w_gate"]
    ids = jnp.asarray(np.random.RandomState(0).randint(
        0, cfg.llama.vocab_size, (1, 24)))
    ref, _, _ = live.forward(params, cfg, input_ids=ids)
    got, _, _ = live.forward(qparams, cfg, input_ids=ids)
    a = np.asarray(ref, np.float32)[0, -1]
    b = np.asarray(got, np.float32)[0, -1]
    cos = (a @ b) / (np.linalg.norm(a) * np.linalg.norm(b))
    # tiny random 4-layer net amplifies 4-bit noise; real checkpoints with
    # group-128 scales sit much closer (this is a mechanics test)
    assert cos > 0.98


def test_int4_memory_quarter():
    cfg, _, params = _setup()
    q4 = quant.quantize_llama_params(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)["llama"],
        bits=4)
    q8 = quant.quantize_llama_params(
        jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)["llama"],
        bits=8)
    # layer matrices: the mixed layout halves the MLP (75% of layer bytes);
    # attention stays int8 (see quant._INT4C_MATS note) -> ~0.64x total
    b4 = quant.param_bytes(q4["layers"])
    b8 = quant.param_bytes(q8["layers"])
    assert b4 < b8 * 0.72


def test_int4_engine_serves():
    """The serving engine runs end-to-end on int4 weights."""
    from videollm_online_tpu.serve.engine import LiveInferEngine
    cfg, tok, params = _setup()
    qparams = dict(params)
    qparams["llama"] = quant.quantize_llama_params(params["llama"], bits=4)
    eng = LiveInferEngine(qparams, tok, cfg, kv_capacity=2048)
    feats = np.random.RandomState(1).randn(
        8, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    eng.load_video(feats)
    eng.input_query_stream("hi", video_time=0.0)
    eng.input_video_stream(8 / cfg.frame_fps)
    got_response = False
    for _ in range(16):
        q, r = eng()
        if r is not None:
            got_response = True
        if not eng.frame_embeds_queue:
            break
    assert got_response


def test_int4c_pack_roundtrip_exact():
    """Column-packed int4: dequantize(quantize(w)) == the row-packed q4p
    dequant of the same values (identical grids), and the packed byte
    decomposition byte = 16*hi + (lo+8) is exact."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from videollm_online_tpu.models import quant

    w = jax.random.normal(jax.random.PRNGKey(0), (256, 512),
                          jnp.float32) * 0.05
    qc = quant.quantize_weight_int4c(w)
    qp = quant.quantize_weight_int4(w)
    np.testing.assert_allclose(
        np.asarray(quant._dequantize_int4c(qc, jnp.float32)),
        np.asarray(quant._dequantize_int4(qp, jnp.float32)), rtol=0, atol=0)
    # bytes decompose exactly
    p = np.asarray(qc["q4c"], np.int32)
    hi = np.floor_divide(p, 16)
    lo = p - 16 * hi - 8
    assert hi.min() >= -7 and hi.max() <= 7
    assert lo.min() >= -7 and lo.max() <= 7


def test_int4_mixed_layout_quantizer():
    """bits=4 produces the mixed serving layout: MLP + lm_head q4c,
    attention + embedding int8 (quant._INT4C_MATS)."""
    import jax
    from videollm_online_tpu.core.config import tiny_llama_config
    from videollm_online_tpu.models import llama, quant

    cfg = tiny_llama_config()
    params = llama.init_params(jax.random.PRNGKey(0), cfg)
    q = quant.quantize_llama_params(params, bits=4)
    for n in ("w_gate", "w_up", "w_down"):
        assert "q4c" in q["layers"][n], n
    for n in ("wq", "wk", "wv", "wo"):
        assert "q8" in q["layers"][n], n
    assert "q4c" in q["lm_head"]
    assert "q8" in q["embed"]


def test_int4c_forward_close():
    """Tiny decoder forward with the mixed int4c layout stays close to the
    bf16 forward (same tolerance as the q4p path)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from videollm_online_tpu.core.config import tiny_llama_config
    from videollm_online_tpu.models import llama, quant

    cfg = tiny_llama_config()
    params = llama.init_params(jax.random.PRNGKey(1), cfg)
    qparams = quant.quantize_llama_params(params, bits=4)
    ids = jax.random.randint(jax.random.PRNGKey(2), (1, 16), 0,
                             cfg.vocab_size)
    ref, _ = llama.forward(params, cfg=cfg, input_ids=ids)
    got, _ = llama.forward(qparams, cfg=cfg, input_ids=ids)
    ref = np.asarray(ref, np.float32)
    got = np.asarray(got, np.float32)
    assert np.argmax(ref[0, -1]) == np.argmax(got[0, -1]) or \
        np.corrcoef(ref[0, -1], got[0, -1])[0, 1] > 0.98


def test_tiled_matmul_bit_identical():
    """Column-tiled int8 matmul == untiled, bitwise: tiling over OUTPUT
    columns never reassociates the contraction. (The tiled path exists to
    defeat XLA's LICM hoisting the dequantized head out of lax.map loops
    — 1002M at 8B; quant.quantized_matmul_tiled docstring.)"""
    rng = np.random.RandomState(0)
    w = rng.randn(64, 512).astype(np.float32)
    qw = quant.quantize_weight(jnp.asarray(w))
    x = jnp.asarray(rng.randn(8, 64).astype(np.float32)).astype(jnp.bfloat16)
    ref = quant.quantized_matmul(x, qw)
    for tile in (128, 256):
        out = quant.quantized_matmul_tiled(x, qw, tile)
        np.testing.assert_array_equal(np.asarray(out, np.float32),
                                      np.asarray(ref, np.float32))


def test_head_tile_cols():
    assert quant.head_tile_cols(128256) == 21376       # Llama-3 vocab
    assert 128256 % quant.head_tile_cols(128256) == 0
    assert quant.head_tile_cols(1024) is None          # already small
    v = quant.head_tile_cols(151936)                   # Qwen2 vocab
    assert v is not None and 151936 % v == 0 and v % 128 == 0


def test_lm_head_tiled_matches_untiled():
    """llama.lm_head(tile_cols=...) == untiled on a quantized tiny model,
    including the LoRA branch."""
    from videollm_online_tpu.models import llama
    cfg, tok, params = _setup()
    qllama = quant.quantize_llama_params(params["llama"])
    lora = llama.init_lora_params(jax.random.PRNGKey(3), cfg.llama, cfg.lora)
    h = jnp.asarray(np.random.RandomState(1).randn(
        4, cfg.llama.hidden_size).astype(np.float32)).astype(jnp.bfloat16)
    ref = llama.lm_head(qllama, h, cfg.llama, lora=lora,
                        lora_scaling=cfg.lora.scaling)
    V = cfg.llama.vocab_size
    tile = V // 2 if V % 2 == 0 else None
    if tile is None or tile % 128:
        tile = 128  # fall back: any divisor works for the equality check
        if V % tile:
            import pytest
            pytest.skip("tiny vocab not 128-divisible")
    out = llama.lm_head(qllama, h, cfg.llama, lora=lora,
                        lora_scaling=cfg.lora.scaling, tile_cols=tile)
    np.testing.assert_array_equal(np.asarray(out, np.float32),
                                  np.asarray(ref, np.float32))
