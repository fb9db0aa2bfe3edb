"""LiveLlama layer: joint_embed scatter semantics and the weighted
streaming CE loss (reference modeling_live.py:29-42,
modeling_live_llama.py:56-61)."""

import numpy as np
import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer


def make_cfg():
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    return tok.cfg, tok


def test_joint_embed_scatters_in_order():
    cfg, tok = make_cfg()
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    v = cfg.v_placeholder_id
    ids = jnp.asarray([[5, v, 6, v, v, 7]])
    frames = jnp.asarray(np.random.RandomState(0).randn(3, cfg.vision_hidden_size),
                         jnp.float32)
    embeds = live.joint_embed(params, cfg, ids, frames)
    visual = live.visual_embed(params, frames, cfg)
    text = params["llama"]["embed"]
    np.testing.assert_allclose(embeds[0, 0], text[5], atol=1e-6)
    np.testing.assert_allclose(embeds[0, 1], visual[0], atol=1e-6)
    np.testing.assert_allclose(embeds[0, 2], text[6], atol=1e-6)
    np.testing.assert_allclose(embeds[0, 3], visual[1], atol=1e-6)
    np.testing.assert_allclose(embeds[0, 4], visual[2], atol=1e-6)
    np.testing.assert_allclose(embeds[0, 5], text[7], atol=1e-6)


def test_joint_embed_batch_order():
    """Frames are consumed in flattened batch-major order (the collator
    concatenates frames across samples)."""
    cfg, _ = make_cfg()
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    v = cfg.v_placeholder_id
    ids = jnp.asarray([[v, 1, v], [2, v, 3]])
    frames = jnp.asarray(np.random.RandomState(1).randn(3, cfg.vision_hidden_size),
                         jnp.float32)
    embeds = live.joint_embed(params, cfg, ids, frames)
    visual = live.visual_embed(params, frames, cfg)
    np.testing.assert_allclose(embeds[0, 0], visual[0], atol=1e-6)
    np.testing.assert_allclose(embeds[0, 2], visual[1], atol=1e-6)
    np.testing.assert_allclose(embeds[1, 1], visual[2], atol=1e-6)


def test_stream_ce_loss_matches_numpy():
    cfg, _ = make_cfg()
    cfg = cfg.replace(stream_loss_weight=3.0)
    rng = np.random.RandomState(0)
    B, T, V = 2, 8, 32
    logits = rng.randn(B, T, V).astype(np.float32)
    labels = rng.randint(0, V, (B, T))
    labels[0, :3] = -100
    labels[1, 5:] = -100
    input_ids = rng.randint(0, V, (B, T))
    input_ids[0, 4] = cfg.v_placeholder_id
    input_ids[1, 2] = cfg.v_placeholder_id

    got = live.stream_ce_loss(jnp.asarray(logits), jnp.asarray(labels),
                              jnp.asarray(input_ids), cfg)

    # numpy reference of modeling_live_llama.py:56-61
    def logsoftmax(x):
        x = x - x.max(-1, keepdims=True)
        return x - np.log(np.exp(x).sum(-1, keepdims=True))

    lp = logsoftmax(logits.reshape(-1, V))
    lab = labels.reshape(-1)
    iid = input_ids.reshape(-1)
    total, count = 0.0, 0
    for i in range(B * T):
        if lab[i] == -100:
            continue
        w = cfg.stream_loss_weight if iid[i] == cfg.v_placeholder_id else 1.0
        total += -lp[i, lab[i]] * w
        count += 1
    np.testing.assert_allclose(float(got), total / count, rtol=1e-5)


def test_forward_loss_and_cache_paths():
    cfg, tok = make_cfg()
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    conv = [
        {"role": "system", "content": "s."},
        {"role": "stream", "num_frames": 2, "learn": True},
        {"role": "assistant", "content": "hi", "learn": True},
    ]
    from videollm_online_tpu.data.collator import collate
    frames = np.random.RandomState(0).randn(
        2, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    batch = collate([(tok.apply_chat_template(conv), frames,
                      tok.get_learn_ranges(conv), 0, None)], tokenizer=tok)
    logits, loss, _ = live.forward(
        params, cfg,
        input_ids=jnp.asarray(batch["input_ids"]),
        frames=jnp.asarray(batch["frames"]),
        labels=jnp.asarray(batch["labels"]))
    assert np.isfinite(float(loss))
    assert logits.shape[:2] == batch["input_ids"].shape


def _loss_batch(cfg, tok):
    from videollm_online_tpu.data.collator import collate
    conv = [
        {"role": "system", "content": "sys."},
        {"role": "stream", "num_frames": 3, "learn": True},
        {"role": "assistant", "content": "hello there", "learn": True},
        {"role": "stream", "num_frames": 2, "learn": True},
        {"role": "assistant", "content": "bye", "learn": True},
    ]
    frames = np.random.RandomState(0).randn(
        5, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    return collate([(tok.apply_chat_template(conv), frames,
                     tok.get_learn_ranges(conv), 0, None)], tokenizer=tok)


def test_chunked_loss_matches_unchunked(monkeypatch):
    """chunked_loss=True streams the weighted CE through LOSS_CHUNK-position
    lm_head chunks (training-memory path for 8B x T=8-12k on one chip) —
    the loss VALUE must equal the unchunked stream_ce_loss path bit-for-
    float32 (per-position math identical; only reduction associativity
    differs). Chunk size forced below T to exercise multi-chunk + padding."""
    cfg, tok = make_cfg()
    cfg = cfg.replace(stream_loss_weight=2.5)
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    batch = _loss_batch(cfg, tok)
    ids = jnp.asarray(batch["input_ids"])
    frames = jnp.asarray(batch["frames"])
    labels = jnp.asarray(batch["labels"])
    from videollm_online_tpu.models import live as live_mod
    monkeypatch.setattr(live_mod, "LOSS_CHUNK", 7)   # T % 7 != 0 -> padding

    logits, ref_loss, _ = live.forward(params, cfg, input_ids=ids,
                                       frames=frames, labels=labels)
    none_logits, chunk_loss, _ = live.forward(params, cfg, input_ids=ids,
                                              frames=frames, labels=labels,
                                              chunked_loss=True)
    assert none_logits is None
    np.testing.assert_allclose(float(chunk_loss), float(ref_loss),
                               rtol=2e-6)


def test_chunked_loss_gradients_match(monkeypatch):
    """LoRA/connector gradients through the chunked path equal the
    unchunked path's (dropout off) — the jax.checkpoint + lax.map
    restructuring must not change the math, only the memory profile."""
    from videollm_online_tpu.models import live as live_mod
    from videollm_online_tpu.train import optim, step as step_mod
    cfg, tok = make_cfg()
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    # make LoRA contribute so its grads are nonzero
    params["lora"] = jax.tree.map(lambda x: x + 0.05, params["lora"])
    batch_np = _loss_batch(cfg, tok)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("input_ids", "frames", "labels")}
    trainable, frozen = optim.split_trainable(params)
    monkeypatch.setattr(live_mod, "LOSS_CHUNK", 5)

    def grads(chunked):
        return jax.value_and_grad(step_mod.loss_fn)(
            trainable, frozen, cfg, batch, remat=False,
            chunked_loss=chunked)

    loss_ref, g_ref = grads(False)
    loss_chk, g_chk = grads(True)
    np.testing.assert_allclose(float(loss_chk), float(loss_ref), rtol=2e-6)
    flat_ref = jax.tree.leaves(g_ref)
    flat_chk = jax.tree.leaves(g_chk)
    assert len(flat_ref) == len(flat_chk)
    for a, b in zip(flat_ref, flat_chk):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=3e-5, atol=3e-6)


def test_remat_group_matches_per_layer_remat():
    """Nested grouped remat (checkpoint every N layers, models/llama.py
    forward) must not change the math — loss and LoRA/connector grads
    equal the per-layer-remat path bitwise-close. The tiny config has 2
    layers, so remat_group=2 exercises one full group."""
    from videollm_online_tpu.train import optim, step as step_mod
    cfg, tok = make_cfg()
    assert cfg.llama.num_layers % 2 == 0
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    params["lora"] = jax.tree.map(lambda x: x + 0.05, params["lora"])
    batch_np = _loss_batch(cfg, tok)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("input_ids", "frames", "labels")}
    trainable, frozen = optim.split_trainable(params)

    def grads(rg):
        return jax.value_and_grad(step_mod.loss_fn)(
            trainable, frozen, cfg, batch, remat=True, remat_group=rg)

    loss_ref, g_ref = grads(1)
    loss_grp, g_grp = grads(2)
    np.testing.assert_allclose(float(loss_grp), float(loss_ref), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_grp)):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=3e-5, atol=3e-6)


def test_remat_group_with_dropout_deterministic():
    """Per-layer dropout rngs must land on the SAME layers after the
    group reshape: remat_group=2 with a dropout rng reproduces
    remat_group=1 with the same rng exactly (same threefry splits, just
    scanned in (G, inner) order)."""
    cfg, tok = make_cfg()
    assert cfg.lora.dropout > 0.0
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    params["lora"] = jax.tree.map(lambda x: x + 0.05, params["lora"])
    batch = _loss_batch(cfg, tok)
    ids = jnp.asarray(batch["input_ids"])
    frames = jnp.asarray(batch["frames"])
    labels = jnp.asarray(batch["labels"])
    rng = jax.random.PRNGKey(7)

    def loss(rg):
        _, l, _ = live.forward(params, cfg, input_ids=ids, frames=frames,
                               labels=labels, remat=True, dropout_rng=rng,
                               remat_group=rg)
        return float(l)

    assert loss(2) == loss(1)


def test_chunked_loss_with_dropout_finite_and_reproducible(monkeypatch):
    """With LoRA dropout on, the chunked path draws per-chunk head masks
    (documented divergence from the unchunked single draw): the loss is
    finite, rng-reproducible, and differs across rngs."""
    from videollm_online_tpu.models import live as live_mod
    cfg, tok = make_cfg()
    assert cfg.lora.dropout > 0.0
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    params["lora"] = jax.tree.map(lambda x: x + 0.05, params["lora"])
    batch = _loss_batch(cfg, tok)
    ids = jnp.asarray(batch["input_ids"])
    frames = jnp.asarray(batch["frames"])
    labels = jnp.asarray(batch["labels"])
    monkeypatch.setattr(live_mod, "LOSS_CHUNK", 6)

    def loss(rng):
        _, l, _ = live.forward(params, cfg, input_ids=ids, frames=frames,
                               labels=labels, dropout_rng=rng,
                               chunked_loss=True)
        return float(l)

    l1 = loss(jax.random.PRNGKey(1))
    l1b = loss(jax.random.PRNGKey(1))
    l2 = loss(jax.random.PRNGKey(2))
    assert np.isfinite(l1) and np.isfinite(l2)
    assert l1 == l1b
    assert l1 != l2


def test_lora_dropout_applied_in_training_only():
    """With a dropout rng, the LoRA branch input is dropped (PEFT
    lora_dropout=0.05, reference modeling_live.py:207); without an rng the
    forward is deterministic and dropout-free (inference/eval semantics)."""
    cfg, tok = make_cfg()
    assert cfg.lora.dropout > 0.0
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    # make LoRA actually contribute: B is zero-init, so perturb it
    def bump(t):
        return jax.tree.map(
            lambda x: x + 0.05 if x.ndim >= 2 else x, t)
    params["lora"] = jax.tree.map(lambda x: x + 0.05, params["lora"])
    ids = jnp.asarray([[5, 6, 7, 8, 9, 10, 11, 12]])
    base1, _, _ = live.forward(params, cfg, input_ids=ids)
    base2, _, _ = live.forward(params, cfg, input_ids=ids)
    np.testing.assert_array_equal(np.asarray(base1), np.asarray(base2))
    d1, _, _ = live.forward(params, cfg, input_ids=ids,
                            dropout_rng=jax.random.PRNGKey(1))
    d2, _, _ = live.forward(params, cfg, input_ids=ids,
                            dropout_rng=jax.random.PRNGKey(2))
    # different masks -> different logits; and both differ from no-dropout
    assert not np.allclose(np.asarray(d1), np.asarray(d2))
    assert not np.allclose(np.asarray(d1), np.asarray(base1))
    # same rng -> reproducible
    d1b, _, _ = live.forward(params, cfg, input_ids=ids,
                             dropout_rng=jax.random.PRNGKey(1))
    np.testing.assert_array_equal(np.asarray(d1), np.asarray(d1b))


def test_mlp_chunk_matches_unchunked():
    """cfg.llama.mlp_chunk (sequence-sliced SwiGLU) must be exact: loss
    and trainable grads equal the unchunked path bitwise-close (the MLP
    mixes only the feature axis, so slicing positions reassociates
    nothing). Dropout off — with dropout on the chunked path draws
    per-slice masks (documented divergence, llama._mlp_seq_chunked)."""
    import dataclasses
    from videollm_online_tpu.train import optim, step as step_mod
    cfg, tok = make_cfg()
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    params["lora"] = jax.tree.map(lambda x: x + 0.05, params["lora"])
    batch_np = _loss_batch(cfg, tok)
    batch = {k: jnp.asarray(v) for k, v in batch_np.items()
             if k in ("input_ids", "frames", "labels")}
    trainable, frozen = optim.split_trainable(params)
    T = batch["input_ids"].shape[1]
    chunk = next(d for d in range(T // 2, 0, -1) if T % d == 0)

    def grads(c):
        cl = dataclasses.replace(cfg.llama, mlp_chunk=c)
        return jax.value_and_grad(step_mod.loss_fn)(
            trainable, frozen, dataclasses.replace(cfg, llama=cl), batch)

    loss_ref, g_ref = grads(0)
    loss_chk, g_chk = grads(chunk)
    np.testing.assert_allclose(float(loss_chk), float(loss_ref), rtol=1e-6)
    for a, b in zip(jax.tree.leaves(g_ref), jax.tree.leaves(g_chk)):
        np.testing.assert_allclose(np.asarray(b, np.float32),
                                   np.asarray(a, np.float32),
                                   rtol=3e-5, atol=3e-6)


def test_mlp_chunk_with_dropout_runs():
    """mlp_chunk + LoRA dropout: per-slice mask draws must produce a
    finite, reproducible loss (same rng -> same loss)."""
    import dataclasses
    cfg, tok = make_cfg()
    assert cfg.lora.dropout > 0.0
    cl = dataclasses.replace(cfg.llama, mlp_chunk=2)
    cfgc = dataclasses.replace(cfg, llama=cl)
    params = live.init_params(jax.random.PRNGKey(0), cfgc)
    batch = _loss_batch(cfg, tok)
    ids = jnp.asarray(batch["input_ids"])
    frames = jnp.asarray(batch["frames"])
    labels = jnp.asarray(batch["labels"])
    rng = jax.random.PRNGKey(11)

    def loss():
        _, l, _ = live.forward(params, cfgc, input_ids=ids, frames=frames,
                               labels=labels, remat=True, dropout_rng=rng)
        return float(l)

    l1, l2 = loss(), loss()
    assert np.isfinite(l1) and l1 == l2
