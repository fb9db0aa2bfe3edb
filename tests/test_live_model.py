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
