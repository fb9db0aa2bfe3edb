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
