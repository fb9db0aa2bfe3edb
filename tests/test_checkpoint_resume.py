"""Full train-state checkpoint/resume: optimizer moments and step survive a
round trip and training continues identically."""

import numpy as np

import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
from videollm_online_tpu.train import checkpoints, optim, step as step_mod


def _batch(cfg, tok, seed=0):
    from videollm_online_tpu.data.collator import collate
    conv = [{"role": "system", "content": "s."},
            {"role": "stream", "num_frames": 2, "learn": True},
            {"role": "assistant", "content": "hi", "learn": True}]
    frames = np.random.RandomState(seed).randn(
        2, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    b = collate([(tok.apply_chat_template(conv), frames,
                  tok.get_learn_ranges(conv), 0, None)], tokenizer=tok)
    return {k: jnp.asarray(v) for k, v in b.items()
            if k in ("input_ids", "labels", "frames")}


def test_train_state_roundtrip(tmp_path):
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    tx = optim.make_optimizer(optim.OptimConfig(total_steps=10,
                                                learning_rate=1e-3))
    state, frozen = step_mod.init_train_state(params, tx)
    jitted = step_mod.make_jitted_train_step(cfg, tx)

    batch = _batch(cfg, tok)
    state, _ = jitted(state, frozen, batch)
    state, _ = jitted(state, frozen, batch)

    path = str(tmp_path / "trainstate")
    checkpoints.save_train_state(path, state)

    # fresh state, restore, continue — must equal continuing the original
    fresh, _ = step_mod.init_train_state(params, tx)
    restored = checkpoints.restore_train_state(path, fresh)
    assert int(restored.step) == 2

    batch2 = _batch(cfg, tok, seed=1)
    cont_a, ma = jitted(state, frozen, batch2)
    cont_b, mb = jitted(restored, frozen, batch2)
    np.testing.assert_allclose(float(ma["loss"]), float(mb["loss"]),
                               rtol=1e-6)
    la = jax.tree.leaves(cont_a.trainable)
    lb = jax.tree.leaves(cont_b.trainable)
    for a, b in zip(la, lb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-7)
