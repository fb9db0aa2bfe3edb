"""Pallas kernels vs the XLA reference attention (interpret mode on CPU):
flash attention fwd/bwd (causal, GQA, cache-append offsets) and ring decode
attention (per-batch lengths, block skipping)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.models.llama import _attention as xla_attention
from videollm_online_tpu.ops.decode_attention import ring_decode_attention
from videollm_online_tpu.ops.flash_attention import flash_attention


def _rand(shape, seed):
    return jnp.asarray(np.random.RandomState(seed).randn(*shape)
                       .astype(np.float32))


def _xla_ref(q, k, v, q_pos, num_groups):
    return xla_attention(q, k, v, q_pos, None, num_groups=num_groups)


@pytest.mark.parametrize("B,Hq,Hkv,T,d", [(1, 4, 2, 256, 64),
                                          (2, 4, 4, 128, 128)])
def test_flash_forward_matches_xla(B, Hq, Hkv, T, d):
    q = _rand((B, Hq, T, d), 0)
    k = _rand((B, Hkv, T, d), 1)
    v = _rand((B, Hkv, T, d), 2)
    q_pos = jnp.broadcast_to(jnp.arange(T)[None], (B, T))
    ref = _xla_ref(q, k, v, q_pos, Hq // Hkv)
    got = flash_attention(q, k, v, 1.0 / d ** 0.5, True, 0)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_flash_with_offset_matches_xla():
    """Cache-append pattern: 128 queries at absolute offset 128 attending a
    384-slot prefix."""
    B, Hq, Hkv, T, S, d, off = 1, 4, 2, 128, 384, 64, 128
    q = _rand((B, Hq, T, d), 3)
    k = _rand((B, Hkv, S, d), 4)
    v = _rand((B, Hkv, S, d), 5)
    q_pos = (off + jnp.arange(T))[None]
    ref = _xla_ref(q, k, v, q_pos, Hq // Hkv)
    got = flash_attention(q, k, v, 1.0 / d ** 0.5, True, off)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_flash_backward_matches_xla():
    B, Hq, Hkv, T, d = 1, 4, 2, 256, 64
    q = _rand((B, Hq, T, d), 6)
    k = _rand((B, Hkv, T, d), 7)
    v = _rand((B, Hkv, T, d), 8)
    q_pos = jnp.arange(T)[None]

    def loss_flash(q, k, v):
        return jnp.sum(flash_attention(q, k, v, 1.0 / d ** 0.5, True, 0) ** 2)

    def loss_ref(q, k, v):
        return jnp.sum(_xla_ref(q, k, v, q_pos, Hq // Hkv) ** 2)

    g_flash = jax.grad(loss_flash, argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    for gf, gr, name in zip(g_flash, g_ref, "qkv"):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr),
                                   atol=5e-4, rtol=5e-3, err_msg=name)


@pytest.mark.parametrize("S", [1, 11])
def test_decode_attention_matches_xla(S):
    B, Hq, Hkv, C, d = 2, 8, 4, 1024, 64
    q = _rand((B, Hq, S, d), 9)
    k = _rand((B, Hkv, C, d), 10)
    v = _rand((B, Hkv, C, d), 11)
    # per-stream offsets: stream 0 short, stream 1 long
    offs = np.array([37, 700])
    q_pos = jnp.asarray(offs[:, None] + np.arange(S)[None])
    ref = _xla_ref(q, k, v, q_pos, Hq // Hkv)
    got = ring_decode_attention(q, k, v, q_pos)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-4)


def test_decode_attention_ignores_stale_slots():
    """Slots beyond q_pos must not affect the output (ring staleness)."""
    B, Hq, Hkv, C, d, S = 1, 2, 2, 512, 64, 1
    q = _rand((B, Hq, S, d), 12)
    k = _rand((B, Hkv, C, d), 13)
    v = _rand((B, Hkv, C, d), 14)
    q_pos = jnp.asarray([[100]])
    out1 = ring_decode_attention(q, k, v, q_pos)
    k2 = k.at[:, :, 101:].set(999.0)
    v2 = v.at[:, :, 101:].set(-999.0)
    out2 = ring_decode_attention(q, k2, v2, q_pos)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-6)


def test_flash_window_matches_xla():
    """Sliding-window flash (fwd + grads, interpret mode) vs the XLA
    reference masked attention with the same window (Mistral family,
    VERDICT r1 item 5)."""
    import jax
    import jax.numpy as jnp
    from videollm_online_tpu.models.llama import _attention
    from videollm_online_tpu.ops.flash_attention import flash_attention

    B, Hq, Hkv, T, d = 1, 4, 2, 256, 64
    W = 64
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, Hq, T, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, Hkv, T, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, Hkv, T, d),
                          jnp.float32)
    q_pos = jnp.arange(T, dtype=jnp.int32)[None]

    def ref(q, k, v):
        return _attention(q, k, v, q_pos, None, num_groups=Hq // Hkv,
                          sliding_window=W).astype(jnp.float32).sum()

    def got(q, k, v):
        return flash_attention(q, k, v, 1.0 / d ** 0.5, True, 0,
                               128, 128, W).astype(jnp.float32).sum()

    o_ref = _attention(q, k, v, q_pos, None, num_groups=Hq // Hkv,
                       sliding_window=W)
    o_got = flash_attention(q, k, v, 1.0 / d ** 0.5, True, 0, 128, 128, W)
    np.testing.assert_allclose(np.asarray(o_got), np.asarray(o_ref),
                               atol=2e-5, rtol=2e-5)
    g_ref = jax.grad(ref, argnums=(0, 1, 2))(q, k, v)
    g_got = jax.grad(got, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_got, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=3e-4, rtol=3e-4)


def test_ring_decode_window_matches_xla():
    """Windowed ring decode attention (plain + layered) vs XLA with the
    same banded mask."""
    import jax
    import jax.numpy as jnp
    from videollm_online_tpu.models.llama import _attention
    from videollm_online_tpu.ops.decode_attention import (
        ring_decode_attention, ring_decode_attention_layered)

    B, Hq, Hkv, S, C, d, L = 2, 4, 2, 8, 512, 64, 3
    W = 96
    key = jax.random.PRNGKey(1)
    q = jax.random.normal(key, (B, Hq, S, d), jnp.float32)
    k_all = jax.random.normal(jax.random.fold_in(key, 1),
                              (L, B, Hkv, C, d), jnp.float32)
    v_all = jax.random.normal(jax.random.fold_in(key, 2),
                              (L, B, Hkv, C, d), jnp.float32)
    # valid histories beyond the window, different per stream
    q_pos = jnp.asarray([[300 + i for i in range(S)],
                         [143 + i for i in range(S)]], jnp.int32)
    for layer in range(L):
        ref = _attention(q, k_all[layer], v_all[layer], q_pos, None,
                         num_groups=Hq // Hkv, sliding_window=W)
        got = ring_decode_attention(q, k_all[layer], v_all[layer], q_pos,
                                    window=W, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
        got_l = ring_decode_attention_layered(
            q, k_all, v_all, q_pos, jnp.asarray(layer, jnp.int32),
            window=W, interpret=True)
        np.testing.assert_allclose(np.asarray(got_l), np.asarray(ref),
                                   atol=2e-5, rtol=2e-5)
