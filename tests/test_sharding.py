"""Multi-device sharding correctness: the fsdp+tp sharded forward/loss on an
8-device mesh must equal the single-device result (GSPMD inserts collectives;
numerics must not change)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from videollm_online_tpu.core.config import LiveConfig, LlamaConfig, LoraConfig, tiny_vision_config
from videollm_online_tpu.models import live
from videollm_online_tpu.parallel.mesh import make_mesh
from videollm_online_tpu.parallel import sharding as shd
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
from videollm_online_tpu.train import optim, step as step_mod


@pytest.fixture(scope="module")
def setup():
    # dims divisible by the model axis (2) and data axis (4)
    cfg = LiveConfig(
        llama=LlamaConfig(vocab_size=512, hidden_size=64,
                          intermediate_size=128, num_layers=2, num_heads=4,
                          num_kv_heads=2, head_dim=16, dtype="float32"),
        vision=tiny_vision_config(), lora=LoraConfig(r=4, alpha=8),
        vision_hidden_size=32, max_num_frames=64)
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    rng = np.random.RandomState(0)
    B, T = 4, 32
    ids = rng.randint(0, cfg.llama.vocab_size, (B, T))
    labels = np.where(rng.rand(B, T) < 0.5, ids, -100)
    return cfg, params, ids, labels


def test_sharded_loss_matches_single(setup):
    cfg, params, ids, labels = setup
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)}

    _, loss_single, _ = live.forward(params, cfg,
                                     input_ids=batch["input_ids"],
                                     labels=batch["labels"])

    mesh = make_mesh(data=4, model=2)
    with mesh:
        sharded_params = step_mod.shard_params(params, mesh, "fsdp_tp")
        sharded_batch = step_mod.shard_batch(batch, mesh)

        @jax.jit
        def loss_fn(p, b):
            _, loss, _ = live.forward(p, cfg, input_ids=b["input_ids"],
                                      labels=b["labels"])
            return loss

        loss_sharded = loss_fn(sharded_params, sharded_batch)
    np.testing.assert_allclose(float(loss_single), float(loss_sharded),
                               rtol=1e-5)


def test_sharded_train_step_matches_single(setup):
    cfg, params, ids, labels = setup
    batch = {"input_ids": jnp.asarray(ids), "labels": jnp.asarray(labels)}
    tx = optim.make_optimizer(optim.OptimConfig(total_steps=10,
                                                learning_rate=1e-3))

    # the jitted step donates its state; use an independent param copy per
    # branch (same PRNG key -> identical values)
    params_a = live.init_params(jax.random.PRNGKey(0), cfg)
    state, frozen = step_mod.init_train_state(params_a, tx)
    jitted = step_mod.make_jitted_train_step(cfg, tx)
    _, m_single = jitted(state, frozen, dict(batch))

    mesh = make_mesh(data=4, model=2)
    params_b = live.init_params(jax.random.PRNGKey(0), cfg)
    with mesh:
        sp = step_mod.shard_params(params_b, mesh, "fsdp_tp")
        state2, frozen2 = step_mod.init_train_state(sp, tx)
        sb = step_mod.shard_batch(dict(batch), mesh)
        jitted2 = step_mod.make_jitted_train_step(cfg, tx)
        _, m_sharded = jitted2(state2, frozen2, sb)
    np.testing.assert_allclose(float(m_single["loss"]),
                               float(m_sharded["loss"]), rtol=1e-5)
    np.testing.assert_allclose(float(m_single["grad_norm"]),
                               float(m_sharded["grad_norm"]), rtol=1e-4)


def test_param_specs_shapes(setup):
    cfg, params, _, _ = setup
    specs = shd.param_specs(params, "fsdp_tp")
    flat = dict(jax.tree_util.tree_flatten_with_path(specs)[0][:0])
    # spot-check a few rules
    assert specs["llama"]["layers"]["wq"] == P(None, "data", "model")
    assert specs["llama"]["layers"]["wo"] == P(None, "model", "data")
    assert specs["llama"]["embed"] == P("data", "model")
    assert specs["llama"]["final_norm"] == P()
    assert specs["connector"]["fc1"]["w"] == P()

def test_tp_sharded_serving_matches_single_device():
    """SERVING under tensor parallelism: the public engine driven with
    params sharded over the model axis must reproduce the single-device
    transcripts exactly (SURVEY §2.3 TP row: 'needed to serve 8B
    comfortably'; here validated on the simulated mesh)."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from videollm_online_tpu.core.config import tiny_live_config
    from videollm_online_tpu.models import live
    from videollm_online_tpu.parallel.mesh import make_mesh
    from videollm_online_tpu.serve.engine import LiveInferEngine
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
    from videollm_online_tpu.train import step as step_mod

    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(frame_token_interval_threshold=0.725,
                          max_response_tokens=12)
    params = live.init_params(jax.random.PRNGKey(9), cfg)
    n_frames = 6
    feats = np.random.RandomState(2).randn(
        n_frames, cfg.frame_num_tokens,
        cfg.vision_hidden_size).astype(np.float32)

    def run(p, ctx=None):
        eng = LiveInferEngine(p, tok, cfg, kv_capacity=1024)
        eng.load_video(feats)
        eng.input_query_stream("what now?", video_time=1.0)
        out = []
        for i in range(n_frames):
            eng.input_video_stream(i / eng.frame_fps)
            while True:
                q, r = eng()
                if r is None:
                    break
                out.append((q, r))
        return out

    ref = run(params)

    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    sharded = step_mod.shard_params(params, mesh, policy="tp")
    with mesh:
        got = run(sharded)
    assert got == ref
    assert len(ref) >= 1


def test_tp_sharded_multistream_matches_single_device():
    """TP-sharded MULTISTREAM serving: N concurrent dialogues with params
    sharded over the model axis reproduce the single-device transcripts
    exactly — the multi-chip serving configuration (tp over the model x
    batched streams) validated end to end on the simulated mesh,
    including the paged KV pool and fused+pipelined dispatch."""
    import numpy as np
    import jax
    from videollm_online_tpu.core.config import tiny_live_config
    from videollm_online_tpu.models import live
    from videollm_online_tpu.parallel.mesh import make_mesh
    from videollm_online_tpu.serve.multistream import MultiStreamEngine
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer
    from videollm_online_tpu.train import step as step_mod

    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(frame_token_interval_threshold=0.725,
                          max_response_tokens=12)
    params = live.init_params(jax.random.PRNGKey(9), cfg)
    N, n_frames = 2, 8
    rng = np.random.RandomState(5)
    feats = [rng.randn(n_frames, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
             for _ in range(N)]

    def run(p, **kw):
        ms = MultiStreamEngine(p, tok, cfg, num_streams=N,
                               kv_capacity=1024, chunk_frames=4, **kw)
        for i in range(N):
            ms.input_frames(i, 0.0, feats[i])
        ms.input_query(0, "what now?", video_time=1.2)
        for _ in range(64):
            ms.step()
            if not ms.pending():
                break
        return ms.transcripts

    ref = run(params)

    mesh = make_mesh(data=1, model=4, devices=jax.devices()[:4])
    sharded = step_mod.shard_params(params, mesh, policy="tp")
    with mesh:
        got = run(sharded, pipelined=True, pipeline_depth=2)
    assert got == ref
    assert sum(len(t) for t in ref) >= 1
