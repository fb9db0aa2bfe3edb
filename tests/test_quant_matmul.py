"""Pallas int8 dequant-matmul vs the XLA reference (interpret mode)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.ops.quant_matmul import quant_matmul, quant_matmul_p


@pytest.mark.parametrize("rows,K,N", [(1, 256, 512), (11, 512, 384),
                                      (16, 128, 128)])
def test_kernel_matches_xla(rows, K, N):
    rng = np.random.RandomState(0)
    x = jnp.asarray(rng.randn(rows, K).astype(np.float32))
    w = jnp.asarray(rng.randint(-127, 128, (K, N)), jnp.int8)
    scale = jnp.asarray(rng.rand(N).astype(np.float32) * 0.01)
    ref = (x @ w.astype(x.dtype)) * scale
    got = quant_matmul_p(x, w, scale, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)


def test_wrapper_multidim():
    rng = np.random.RandomState(1)
    x = jnp.asarray(rng.randn(2, 3, 128).astype(np.float32))
    w = jnp.asarray(rng.randint(-127, 128, (128, 256)), jnp.int8)
    scale = jnp.ones((256,), jnp.float32)
    got = quant_matmul(x, w, scale)
    ref = x @ w.astype(x.dtype)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=1e-3, rtol=1e-3)
