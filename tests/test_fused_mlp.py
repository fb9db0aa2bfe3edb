"""Fused SwiGLU-MLP kernel (ops/fused_mlp.py) vs the XLA int8 path of
models/llama._layer (silu(dense(x, w_gate)) * dense(x, w_up) @ w_down)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.models import quant
from videollm_online_tpu.models.llama import dense
from videollm_online_tpu.ops import fused_mlp


def _xla_mlp(x, wg, wu, wd):
    gate = dense(x, wg)
    up = dense(x, wu)
    return dense(jax.nn.silu(gate) * up, wd)


@pytest.mark.parametrize("B,D,F", [(1, 256, 512), (8, 256, 1024)])
def test_fused_mlp_matches_xla(B, D, F):
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 4)
    wg = quant.quantize_weight(
        jax.random.normal(ks[0], (D, F), jnp.float32) * 0.05, axis=-2)
    wu = quant.quantize_weight(
        jax.random.normal(ks[1], (D, F), jnp.float32) * 0.05, axis=-2)
    wd = quant.quantize_weight(
        jax.random.normal(ks[2], (F, D), jnp.float32) * 0.05, axis=-2)
    x = jax.random.normal(ks[3], (B, D), jnp.bfloat16)

    got = fused_mlp.fused_mlp_int8(
        x, wg["q8"], wg["scale"], wu["q8"], wu["scale"], wd["q8"],
        wd["scale"], block_f=256, interpret=True)
    ref = _xla_mlp(x, wg, wu, wd)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)
    # tighter check against an f32 ground truth: the kernel's f32
    # accumulation should be at least as close as the bf16 XLA path
    f32 = _xla_mlp(x.astype(jnp.float32),
                   {"q8": wg["q8"], "scale": wg["scale"]},
                   {"q8": wu["q8"], "scale": wu["scale"]},
                   {"q8": wd["q8"], "scale": wd["scale"]})
    err_kernel = float(jnp.mean(jnp.abs(got.astype(jnp.float32) - f32)))
    err_xla = float(jnp.mean(jnp.abs(ref.astype(jnp.float32) - f32)))
    assert err_kernel <= err_xla * 1.5 + 1e-6


@pytest.mark.parametrize("B,D,F,block_f", [(1, 256, 1024, 256),
                                           (4, 256, 1024, 128),
                                           (8, 512, 512, 128)])
def test_fused_mlp_int4_matches_xla(B, D, F, block_f):
    """Kernel == the XLA int4 path (x @ _dequantize_int4(w)) numerics:
    bf16 weight products, f32 accumulation."""
    key = jax.random.PRNGKey(2)
    ks = jax.random.split(key, 4)
    wg = quant.quantize_weight_int4(
        jax.random.normal(ks[0], (D, F), jnp.float32) * 0.05)
    wu = quant.quantize_weight_int4(
        jax.random.normal(ks[1], (D, F), jnp.float32) * 0.05)
    wd = quant.quantize_weight_int4(
        jax.random.normal(ks[2], (F, D), jnp.float32) * 0.05)
    x = jax.random.normal(ks[3], (B, D), jnp.bfloat16)

    got = fused_mlp.fused_mlp_int4(
        x, wg["q4p"], wg["scale"], wu["q4p"], wu["scale"], wd["q4p"],
        wd["scale"], block_f=block_f, interpret=True)
    ref = _xla_mlp(x, wg, wu, wd)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)
    f32 = _xla_mlp(x.astype(jnp.float32), wg, wu, wd)
    err_kernel = float(jnp.mean(jnp.abs(got.astype(jnp.float32) - f32)))
    err_xla = float(jnp.mean(jnp.abs(ref.astype(jnp.float32) - f32)))
    assert err_kernel <= err_xla * 1.5 + 1e-6


def test_fused_mlp_wrapper_shapes():
    D, F, L = 256, 512, 2
    key = jax.random.PRNGKey(1)
    layer = {
        "w_gate": quant.quantize_weight(
            jax.random.normal(key, (D, F), jnp.float32) * 0.05, axis=-2),
        "w_up": quant.quantize_weight(
            jax.random.normal(key, (D, F), jnp.float32) * 0.05, axis=-2),
        "w_down": quant.quantize_weight(
            jax.random.normal(key, (F, D), jnp.float32) * 0.05, axis=-2),
    }
    x = jax.random.normal(key, (1, 3, D), jnp.bfloat16)
    y = fused_mlp.mlp_int8(x, layer, block_f=256, interpret=True)
    assert y.shape == (1, 3, D) and y.dtype == x.dtype


@pytest.mark.parametrize("B,D,F,block_f", [(1, 256, 1024, 256),
                                           (4, 256, 1024, 128),
                                           (8, 512, 512, 128)])
def test_fused_mlp_int4c_matches_xla(B, D, F, block_f):
    """Column-packed int4 v2 kernel (partial-sum dequant) == the XLA
    dequant path numerics."""
    key = jax.random.PRNGKey(3)
    ks = jax.random.split(key, 4)
    wg = quant.quantize_weight_int4c(
        jax.random.normal(ks[0], (D, F), jnp.float32) * 0.05)
    wu = quant.quantize_weight_int4c(
        jax.random.normal(ks[1], (D, F), jnp.float32) * 0.05)
    wd = quant.quantize_weight_int4c(
        jax.random.normal(ks[2], (F, D), jnp.float32) * 0.05)
    x = jax.random.normal(ks[3], (B, D), jnp.bfloat16)

    got = fused_mlp.fused_mlp_int4c(
        x, wg["q4c"], wg["scale"], wu["q4c"], wu["scale"], wd["q4c"],
        wd["scale"], block_f=block_f, interpret=True)
    ref = _xla_mlp(x, wg, wu, wd)
    np.testing.assert_allclose(
        np.asarray(got, np.float32), np.asarray(ref, np.float32),
        rtol=5e-2, atol=5e-2)
    f32 = _xla_mlp(x.astype(jnp.float32), wg, wu, wd)
    err_kernel = float(jnp.mean(jnp.abs(got.astype(jnp.float32) - f32)))
    err_xla = float(jnp.mean(jnp.abs(ref.astype(jnp.float32) - f32)))
    assert err_kernel <= err_xla * 1.5 + 1e-6


def test_matmul_int4c_exact_integers():
    """The partial-sum identity x@bytes = 16*(x@hi) + x@(lo+8) is EXACT for
    integer inputs within f32 range: with small-integer activations the
    kernel must reproduce the dequantized matmul bit-for-bit (scale 1)."""
    rng = np.random.RandomState(0)
    K, N = 256, 512
    q = rng.randint(-7, 8, (K, N)).astype(np.float32)
    lo = q[:, : N // 2] + 8
    hi = q[:, N // 2:]
    packed = jnp.asarray((16 * hi + lo).astype(np.int8))
    scale = jnp.ones((K // 128, N), jnp.float32)
    x = jnp.asarray(rng.randint(-4, 5, (2, K)).astype(np.float32),
                    jnp.bfloat16)
    got = fused_mlp.matmul_int4c(x, packed, scale, block_n=128,
                                 interpret=True)
    ref = np.asarray(x, np.float32) @ q
    np.testing.assert_array_equal(np.asarray(got), ref)


def test_matmul_int4c_matches_dequant():
    key = jax.random.PRNGKey(5)
    K, N = 256, 768
    w = jax.random.normal(key, (K, N), jnp.float32) * 0.05
    qw = quant.quantize_weight_int4c(w)
    x = jax.random.normal(jax.random.fold_in(key, 1), (3, K), jnp.bfloat16)
    got = fused_mlp.matmul_int4c(x, qw["q4c"], qw["scale"], block_n=128,
                                 interpret=True)
    ref = x.astype(jnp.float32) @ quant._dequantize_int4c(qw, jnp.float32)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-2, atol=2e-2)


def test_maybe_fused_dispatches_int4c(monkeypatch):
    """maybe_fused must route q4c layers to the v2 kernel on TPU and both
    guards must derive from the same constants (ADVICE r2)."""
    calls = {}

    def fake_mlp_int4c(x, lp, **kw):
        calls["v2"] = True
        return x

    monkeypatch.setattr(fused_mlp, "mlp_int4c", fake_mlp_int4c)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    D, F = 256, 2048  # (F//2) % 512 == 0, group 128 -> Gf=16 even
    key = jax.random.PRNGKey(0)
    lp = {
        "w_gate": quant.quantize_weight_int4c(
            jax.random.normal(key, (D, F)) * 0.05),
        "w_up": quant.quantize_weight_int4c(
            jax.random.normal(key, (D, F)) * 0.05),
        "w_down": quant.quantize_weight_int4c(
            jax.random.normal(key, (F, D)) * 0.05),
    }
    x = jnp.ones((1, 1, D), jnp.bfloat16)
    out = fused_mlp.maybe_fused(x, lp, None)
    assert calls.get("v2") and out is not None
