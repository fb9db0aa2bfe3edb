"""Ring attention over the ICI mesh: context/sequence parallelism.

SURVEY §2.3 marks CP/ring attention absent from the reference (long context
is handled there by truncation, max_num_frames, models/arguments_live.py);
§5 names it the stretch goal for >1 h live1 streams. This is the TPU-native
construction: shard the SEQUENCE axis of q/k/v across a mesh axis, then
rotate the k/v shards around the ring with ``lax.ppermute`` while each
device accumulates blockwise online-softmax attention for its local
queries — n_devices steps, each overlapping one ICI hop with one block of
compute, never materializing the full sequence on any chip.

Causality across shards: query shard ``i`` (global rows i*T_loc..) attends
kv shard ``j`` fully when j < i, causally when j == i, not at all when
j > i — the skipped steps still rotate (the permute schedule is fixed) but
do no FLOPs. Gradients flow through ``jax.grad`` (the transpose of a
ppermute is the reverse ppermute), giving the standard ring backward.

Validated on the 8-virtual-device CPU mesh against single-device full
attention (tests/test_ring_attention.py); the same program lowers to ICI
collectives on a real multi-chip slice.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

NEG_INF = -1e30


def _block_attn(q, k, v, scale, causal, q_off, k_off):
    """One (local-q x one-kv-shard) block with fp32 online-softmax stats.

    q: (B, H, Tq, d); k/v: (B, H, Tk, d); q_off/k_off are the shards'
    GLOBAL row/col offsets — one causal comparison covers every shard
    relation (earlier shard: all visible; same: triangular; later: all
    masked). Returns (unnormalized acc (B,H,Tq,d) f32, m, l (B,H,Tq,1) f32).
    """
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * scale
    if causal:
        Tq, Tk = q.shape[2], k.shape[2]
        rows = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 0) + q_off
        cols = jax.lax.broadcasted_iota(jnp.int32, (Tq, Tk), 1) + k_off
        s = jnp.where(cols[None, None] <= rows[None, None], s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    l = jnp.sum(p, axis=-1, keepdims=True)
    acc = jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v,
                     preferred_element_type=jnp.float32)
    return acc, m, l


def _merge(acc1, m1, l1, acc2, m2, l2):
    """Combine two online-softmax partial results."""
    m = jnp.maximum(m1, m2)
    a1 = jnp.exp(m1 - m)
    a2 = jnp.exp(m2 - m)
    return acc1 * a1 + acc2 * a2, m, l1 * a1 + l2 * a2


def _ring_local(q, k, v, *, axis_name, scale, causal):
    """shard_map body: local q/k/v shards (B, H, T_loc, d)."""
    n = jax.lax.psum(1, axis_name)
    idx = jax.lax.axis_index(axis_name)
    B, H, T_loc, d = q.shape

    perm = [(i, (i + 1) % n) for i in range(n)]

    acc0 = jnp.zeros((B, H, T_loc, d), jnp.float32)
    m0 = jnp.full((B, H, T_loc, 1), NEG_INF, jnp.float32)
    l0 = jnp.zeros((B, H, T_loc, 1), jnp.float32)
    # constants are replicated-typed; the loop carry becomes device-varying
    # after one step, so tag the initial values (shard_map vma typing)
    if hasattr(jax.lax, "pvary"):
        acc0, m0, l0 = (jax.lax.pvary(x, axis_name) for x in (acc0, m0, l0))

    def step(s, carry):
        acc, m, l, k_cur, v_cur = carry
        src = (idx - s) % n  # which shard's kv we currently hold
        q_off = idx * T_loc
        k_off = src * T_loc

        # fully-future shards fall out via the global causal mask (all
        # NEG_INF -> l=0 contribution); a lax.cond skip would save their
        # FLOPs but the new shard_map types replicated vs device-varying
        # branch outputs differently — revisit with jax.lax.pvary
        a_s, m_s, l_s = _block_attn(q, k_cur, v_cur, scale, causal,
                                    q_off, k_off)
        acc, m, l = _merge(acc, m, l, a_s, m_s, l_s)
        # rotate kv around the ring (ICI hop overlapping the next block)
        k_nxt = jax.lax.ppermute(k_cur, axis_name, perm)
        v_nxt = jax.lax.ppermute(v_cur, axis_name, perm)
        return acc, m, l, k_nxt, v_nxt

    acc, m, l, _, _ = jax.lax.fori_loop(0, n, step, (acc0, m0, l0, k, v))
    safe_l = jnp.where(l == 0.0, 1.0, l)
    return (acc / safe_l).astype(q.dtype)


def ring_attention(q, k, v, *, mesh: Mesh, axis_name: str,
                   scale: Optional[float] = None, causal: bool = True,
                   batch_axis: Optional[str] = None):
    """Context-parallel attention: q/k/v (B, H, T, d) with T sharded over
    ``axis_name`` of ``mesh`` (and optionally B over ``batch_axis``).
    Returns (B, H, T, d) sharded the same way.

    T must divide evenly by the axis size. Gradients supported (autodiff
    through the ppermute ring)."""
    if scale is None:
        scale = 1.0 / (q.shape[-1] ** 0.5)
    n = mesh.shape[axis_name]
    assert q.shape[2] % n == 0, (q.shape, n)
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    spec = P(batch_axis, None, axis_name, None)
    fn = shard_map(
        functools.partial(_ring_local, axis_name=axis_name, scale=scale,
                          causal=causal),
        mesh=mesh, in_specs=(spec, spec, spec), out_specs=spec)
    return fn(q, k, v)


def make_ring_attn(mesh: Mesh, axis_name: str,
                   batch_axis: Optional[str] = None):
    """attn_impl adapter for llama.forward's full-causal TRAINING path:
    sequence(context)-parallel attention over ``axis_name``. The decoder's
    other matmuls stay under GSPMD; only attention drops into the shard_map
    ring. GQA is expanded to full heads first (each ring step is per-head).

    Use for sequences too long for one chip's activations — e.g. hour-long
    live1 streams (7200 frames) beyond the reference's truncation."""
    def impl(q, k, v, q_pos, kv_valid_upto, *, num_groups,
             sliding_window=None):
        assert sliding_window is None, (
            "ring attention: sliding window not supported")
        if q.shape[2] != k.shape[2]:
            # cache-decode shapes (generation inside the trainer's eval):
            # SP applies to the full-causal training forward only — route
            # small-query-vs-ring calls to the single-device dispatch
            from .auto import auto_attention
            return auto_attention(q, k, v, q_pos, kv_valid_upto,
                                  num_groups=num_groups,
                                  sliding_window=sliding_window)
        if num_groups > 1:
            k = jnp.repeat(k, num_groups, axis=1)
            v = jnp.repeat(v, num_groups, axis=1)
        return ring_attention(q, k, v, mesh=mesh, axis_name=axis_name,
                              causal=True, batch_axis=batch_axis)
    return impl


def shard_sequence(x, mesh: Mesh, axis_name: str, axis: int = 2):
    """device_put helper: shard one array's sequence axis over the mesh."""
    spec = [None] * x.ndim
    spec[axis] = axis_name
    return jax.device_put(x, NamedSharding(mesh, P(*spec)))
