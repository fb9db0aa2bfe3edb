"""Host-offloaded optimizer state (train/offload.py — the ZeRO-2
CPU-offload analog, reference configs/deepspeed/zero2offload.json) must
train bit-identically to the on-device step, with the Adam moments
resident in pinned_host memory between steps."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live
from videollm_online_tpu.train import offload, optim, step as step_mod


def _setup(seed=0):
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer

    cfg = LiveTokenizer(ByteTokenizer(), tiny_live_config()).cfg
    params = live.init_params(jax.random.PRNGKey(seed), cfg)
    tx = optim.make_optimizer(optim.OptimConfig(total_steps=10))
    rng = np.random.RandomState(0)
    T, F = 32, 3
    batch = {
        "input_ids": jnp.asarray(rng.randint(
            0, cfg.llama.vocab_size, (1, T)), jnp.int32),
        "labels": jnp.asarray(rng.randint(
            0, cfg.llama.vocab_size, (1, T)), jnp.int32),
        "frames": jnp.asarray(rng.randn(
            F, cfg.frame_num_tokens, cfg.vision_hidden_size), jnp.float32),
    }
    return cfg, params, tx, batch


def test_offload_probe_is_honest():
    """The in-step probe must agree with the backend: the CPU test backend
    has no annotate_device_placement custom-call."""
    assert offload.supports_in_step_offload() is False


def test_offload_step_matches_plain():
    """3 offloaded steps == 3 plain steps, bit-for-bit (params + loss),
    and the moments sit in pinned_host between steps."""
    cfg, params, tx, batch = _setup()

    state_a, frozen = step_mod.init_train_state(params, tx)
    plain = step_mod.make_jitted_train_step(cfg, tx)

    # fresh copies: the jitted step donates state.trainable, so the two
    # states must not alias the same buffers
    state_b, _ = step_mod.init_train_state(
        jax.tree.map(jnp.copy, params), tx)
    state_b = offload.offload_state(state_b)
    for leaf in jax.tree.leaves(state_b.opt_state):
        if leaf.ndim:
            assert leaf.sharding.memory_kind == "pinned_host"
    off = offload.make_offload_train_step(cfg, tx)

    losses_a, losses_b = [], []
    for _ in range(3):
        state_a, ma = plain(state_a, frozen, batch)
        state_b, mb = off(state_b, frozen, batch)
        losses_a.append(float(ma["loss"]))
        losses_b.append(float(mb["loss"]))
        for leaf in jax.tree.leaves(state_b.opt_state):
            if leaf.ndim:
                assert leaf.sharding.memory_kind == "pinned_host"
    assert losses_a == losses_b
    for a, b in zip(jax.tree.leaves(state_a.trainable),
                    jax.tree.leaves(state_b.trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_offload_step_sharded_mesh():
    """Offload composes with the fsdp_tp mesh: moments inherit the param
    shardings' specs with the pinned_host memory kind, and the sharded
    offloaded run matches the single-device plain run."""
    from videollm_online_tpu.parallel.mesh import make_mesh

    cfg, params, tx, batch = _setup(seed=1)
    state_ref, frozen = step_mod.init_train_state(
        jax.tree.map(jnp.copy, params), tx)
    plain = step_mod.make_jitted_train_step(cfg, tx)
    state_ref, m_ref = plain(state_ref, frozen, batch)

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sparams = step_mod.shard_params(params, mesh, "fsdp_tp")
        state, sfrozen = step_mod.init_train_state(sparams, tx)
        state = offload.offload_state(state)
        off = offload.make_offload_train_step(cfg, tx)
        sbatch = step_mod.shard_batch(batch, mesh)
        state, m = off(state, sfrozen, sbatch)
    assert np.allclose(float(m["loss"]), float(m_ref["loss"]),
                       rtol=2e-5, atol=2e-5)
    for leaf in jax.tree.leaves(state.opt_state):
        if leaf.ndim:
            assert leaf.sharding.memory_kind == "pinned_host"


def test_trainer_offload_flag():
    """LiveTrainer(args.offload_optimizer=True) trains to the same loss as
    the default trainer on the same tiny dataset."""
    from videollm_online_tpu.core.arguments import LiveTrainingArguments
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
    from videollm_online_tpu.train.trainer import LiveTrainer

    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg
    params = live.init_params(jax.random.PRNGKey(2), cfg)
    rng = np.random.RandomState(3)

    class DS:
        def __len__(self):
            return 4

        def __getitem__(self, i):
            r = np.random.RandomState(i)
            return {
                "input_ids": r.randint(0, cfg.llama.vocab_size, (24,)),
                "labels": r.randint(0, cfg.llama.vocab_size, (24,)),
                "frames": r.randn(2, cfg.frame_num_tokens,
                                  cfg.vision_hidden_size).astype(np.float32),
            }

    def collate(items):
        return {
            "input_ids": np.stack([x["input_ids"] for x in items]),
            "labels": np.stack([x["labels"] for x in items]),
            "frames": np.concatenate([x["frames"] for x in items]),
        }

    states = {}
    for off_flag in (False, True):
        args = LiveTrainingArguments(
            output_dir="/tmp/vlo_test_offload", max_steps=2,
            gradient_accumulation_steps=1, dataloader_num_workers=0,
            offload_optimizer=off_flag, logging_steps=1)
        tr = LiveTrainer(params=jax.tree.map(jnp.copy, params), cfg=cfg,
                         tokenizer=tok, args=args, train_dataset=DS(),
                         collate_fn=collate)
        states[off_flag] = tr.train()
    for a, b in zip(jax.tree.leaves(states[False].trainable),
                    jax.tree.leaves(states[True].trainable)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    for leaf in jax.tree.leaves(states[True].opt_state):
        if leaf.ndim:
            assert leaf.sharding.memory_kind == "pinned_host"
