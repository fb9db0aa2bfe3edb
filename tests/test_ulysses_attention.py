"""Ulysses sequence parallelism (all-to-all head/sequence repartition) vs
single-device full attention — forward and gradients, causal and full, plus
the full-decoder adapter — on the 8-virtual-device CPU mesh (SURVEY §2.3 SP
row; the reference ecosystem's DeepSpeed-Ulysses analog)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from videollm_online_tpu.ops.ring_attention import shard_sequence
from videollm_online_tpu.ops.ulysses_attention import (make_ulysses_attn,
                                                       ulysses_attention)

B, H, T, d = 2, 8, 256, 32


@pytest.fixture(scope="module")
def mesh():
    devs = np.array(jax.devices()[:8])
    return Mesh(devs, ("sp",))


def _ref_attention(q, k, v, causal):
    scale = 1.0 / d ** 0.5
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        rows = jax.lax.broadcasted_iota(jnp.int32, (T, T), 0)
        cols = jax.lax.broadcasted_iota(jnp.int32, (T, T), 1)
        s = jnp.where((cols <= rows)[None, None], s, -1e30)
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(q.dtype), v)


@pytest.mark.parametrize("causal", [True, False])
def test_ulysses_matches_full(mesh, causal):
    key = jax.random.PRNGKey(0)
    q = jax.random.normal(key, (B, H, T, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, T, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, T, d),
                          jnp.float32)
    ref = _ref_attention(q, k, v, causal)
    qs = shard_sequence(q, mesh, "sp")
    ks = shard_sequence(k, mesh, "sp")
    vs = shard_sequence(v, mesh, "sp")
    got = ulysses_attention(qs, ks, vs, mesh=mesh, axis_name="sp",
                            causal=causal)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_ulysses_gradients_match_full(mesh):
    key = jax.random.PRNGKey(3)
    q = jax.random.normal(key, (B, H, T, d), jnp.float32)
    k = jax.random.normal(jax.random.fold_in(key, 1), (B, H, T, d),
                          jnp.float32)
    v = jax.random.normal(jax.random.fold_in(key, 2), (B, H, T, d),
                          jnp.float32)
    w = jax.random.normal(jax.random.fold_in(key, 3), (B, H, T, d),
                          jnp.float32)

    def loss_ref(q, k, v):
        return jnp.sum(_ref_attention(q, k, v, True).astype(jnp.float32) * w)

    def loss_sp(q, k, v):
        o = ulysses_attention(q, k, v, mesh=mesh, axis_name="sp",
                              causal=True)
        return jnp.sum(o.astype(jnp.float32) * w)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    qs = shard_sequence(q, mesh, "sp")
    ks = shard_sequence(k, mesh, "sp")
    vs = shard_sequence(v, mesh, "sp")
    g_sp = jax.grad(loss_sp, argnums=(0, 1, 2))(qs, ks, vs)
    for a, b in zip(g_sp, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-5, rtol=5e-5)


def test_ulysses_output_stays_sequence_sharded(mesh):
    """In and out are sequence-sharded — the full sequence only ever exists
    head-sliced inside the shard_map body."""
    key = jax.random.PRNGKey(4)
    q = shard_sequence(jax.random.normal(key, (B, H, T, d), jnp.float32),
                       mesh, "sp")
    o = ulysses_attention(q, q, q, mesh=mesh, axis_name="sp", causal=True)
    assert o.sharding.spec == q.sharding.spec


def test_ulysses_rejects_head_poor_shapes(mesh):
    q = jnp.zeros((1, 4, 256, 32))  # 4 heads < 8 devices
    with pytest.raises(AssertionError, match="divisible"):
        ulysses_attention(q, q, q, mesh=mesh, axis_name="sp")


def test_llama_forward_with_ulysses_attention():
    """Full decoder forward + stream CE loss with Ulysses attention matches
    the single-device forward (GQA expanded in the adapter). 4-way axis:
    the tiny config has 4 query heads and Ulysses needs H >= N."""
    mesh = Mesh(np.array(jax.devices()[:4]), ("sp",))
    from videollm_online_tpu.core.config import tiny_live_config
    from videollm_online_tpu.models import live
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
    from videollm_online_tpu.data.collator import collate

    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    conv = [
        {"role": "system", "content": "s."},
        {"role": "stream", "num_frames": 8, "learn": True},
        {"role": "assistant", "content": "you wash the pan now.",
         "learn": True},
    ]
    frames = np.random.RandomState(0).randn(
        8, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    batch = collate([(tok.apply_chat_template(conv), frames,
                      tok.get_learn_ranges(conv), 0, None)], tokenizer=tok,
                    pad_to_multiple=8 * 8)  # T divisible by the 8-way axis

    ids = jnp.asarray(batch["input_ids"])
    fr = jnp.asarray(batch["frames"])
    lab = jnp.asarray(batch["labels"])
    logits_ref, loss_ref, _ = live.forward(params, cfg, input_ids=ids,
                                           frames=fr, labels=lab)

    sp_impl = make_ulysses_attn(mesh, "sp")
    with mesh:
        logits_sp, loss_sp, _ = jax.jit(
            lambda p, i, f, l: live.forward(p, cfg, input_ids=i, frames=f,
                                            labels=l, attn_impl=sp_impl)
        )(params, ids, fr, lab)
    np.testing.assert_allclose(float(loss_sp), float(loss_ref), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(logits_sp), np.asarray(logits_ref),
                               atol=3e-4, rtol=3e-4)
