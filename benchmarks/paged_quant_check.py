"""Real-TPU check: quantized paged decode kernel vs dequantized reference.

Mosaic legality (scale-pool BlockSpec (1,1,Hkv,page)) is NOT covered by
interpret mode — this drives the actual kernel on the chip at 8B-like
shapes (Hkv=8, d=128, page=512).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from videollm_online_tpu.models import llama
from videollm_online_tpu.ops.paged_attention import (
    paged_attention_reference, paged_decode_attention)

print("backend:", jax.default_backend())
rng = np.random.RandomState(0)
B, Hq, Hkv, S, d, page, maxp = 2, 32, 8, 4, 128, 512, 6
L, P = 2, 1 + B * maxp
q = jnp.asarray(rng.randn(B, Hq, S, d), jnp.bfloat16)
pool_k = jnp.asarray(rng.randn(L, P, Hkv, page, d), jnp.float32)
pool_v = jnp.asarray(rng.randn(L, P, Hkv, page, d), jnp.float32)
kq, ks = llama.quantize_kv(pool_k)
vq, vs = llama.quantize_kv(pool_v)
perm = rng.permutation(P - 1) + 1
table = jnp.asarray(perm[:B * maxp].reshape(B, maxp), jnp.int32)
q_pos = jnp.asarray([[2000 + i for i in range(S)],
                     [700 + i for i in range(S)]], jnp.int32)

for window in (None, 1024):
    got = paged_decode_attention(q, kq, vq, table, q_pos, 1, window=window,
                                 k_scale=ks, v_scale=vs, interpret=False)
    ref = paged_attention_reference(
        q.astype(jnp.float32),
        kq.astype(jnp.float32) * ks[..., None],
        vq.astype(jnp.float32) * vs[..., None],
        table, q_pos, 1, window=window)
    g = np.asarray(got, np.float32)
    r = np.asarray(ref, np.float32)
    err = np.max(np.abs(g - r))
    # fence with a host scalar readback
    print(f"window={window}: max_abs_err={err:.4f} (bf16 q tolerance)")
    assert err < 0.05, err
print("TPU paged int8 kernel OK")
