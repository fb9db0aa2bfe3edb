"""Golden test: our StreamEvaluator vs the REFERENCE stream_evaluate
(models/modeling_live.py:44-168) executed in torch on identical tiny weights.
The reference module is imported from /root/reference at test time (never
copied); a stub vision_live avoids its torchvision dependency."""

import importlib.util
import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.data.collator import collate
from videollm_online_tpu.eval.stream_evaluate import StreamEvaluator
from videollm_online_tpu.models import live
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer

torch = pytest.importorskip("torch")
pytest.importorskip("peft")
transformers = pytest.importorskip("transformers")

REF = "/root/reference"


def _load_reference_livemixin():
    pkg = types.ModuleType("refmodels")
    pkg.__path__ = [os.path.join(REF, "models")]
    sys.modules["refmodels"] = pkg
    # stub the torchvision-dependent module before modeling_live imports it
    stub = types.ModuleType("refmodels.vision_live")
    stub.build_live_vision = lambda cfg: (None, None)
    sys.modules["refmodels.vision_live"] = stub

    def load(name):
        spec = importlib.util.spec_from_file_location(
            f"refmodels.{name}", os.path.join(REF, "models", f"{name}.py"))
        mod = importlib.util.module_from_spec(spec)
        sys.modules[f"refmodels.{name}"] = mod
        spec.loader.exec_module(mod)
        return mod

    load("configuration_live")
    load("tokenization_live")
    return load("modeling_live")


def _torch_live_model(cfg, params):
    """Reference-style torch model (LlamaForCausalLM + LiveMixin +
    connector) initialized from OUR jax params."""
    ref = _load_reference_livemixin()
    cfg_live = sys.modules["refmodels.configuration_live"].LiveConfigMixin

    class RefLiveConfig(transformers.LlamaConfig, cfg_live):
        pass

    class RefLiveLlama(transformers.LlamaForCausalLM, ref.LiveMixin):
        config_class = RefLiveConfig

        def __init__(self, config):
            super().__init__(config)
            self.connector = torch.nn.Sequential(
                torch.nn.Linear(config.vision_hidden_size,
                                config.hidden_size, bias=True),
                torch.nn.GELU(),
                torch.nn.Linear(config.hidden_size, config.hidden_size,
                                bias=True),
            )

        def forward(self, input_ids=None, frames=None, **kw):
            if kw.get("inputs_embeds") is None and input_ids is not None:
                kw["inputs_embeds"] = self.joint_embed(input_ids, frames)
            kw.pop("frames", None)
            return super().forward(**kw)

    hf_cfg = RefLiveConfig(
        vocab_size=cfg.llama.vocab_size,
        hidden_size=cfg.llama.hidden_size,
        intermediate_size=cfg.llama.intermediate_size,
        num_hidden_layers=cfg.llama.num_layers,
        num_attention_heads=cfg.llama.num_heads,
        num_key_value_heads=cfg.llama.num_kv_heads,
        head_dim=cfg.llama.head_dim,
        rope_theta=cfg.llama.rope_theta,
        rms_norm_eps=cfg.llama.rms_norm_eps,
        attention_bias=False, mlp_bias=False, tie_word_embeddings=False,
        attn_implementation="eager",
        vision_hidden_size=cfg.vision_hidden_size,
        frame_token_cls=cfg.frame_token_cls,
        frame_token_pooled=(list(cfg.frame_token_pooled)
                            if cfg.frame_token_pooled else None),
        frame_num_tokens=cfg.frame_num_tokens,
        v_placeholder_id=cfg.v_placeholder_id,
        frame_token_interval_id=cfg.frame_token_interval_id,
        eos_token_id=cfg.eos_token_id,
    )
    model = RefLiveLlama(hf_cfg).eval()
    # our params -> torch state dict
    sd = {}
    p = params["llama"]
    sd["model.embed_tokens.weight"] = torch.tensor(np.asarray(p["embed"]))
    L = cfg.llama.num_layers
    name_map = {
        "wq": "self_attn.q_proj", "wk": "self_attn.k_proj",
        "wv": "self_attn.v_proj", "wo": "self_attn.o_proj",
        "w_gate": "mlp.gate_proj", "w_up": "mlp.up_proj",
        "w_down": "mlp.down_proj",
    }
    for i in range(L):
        for ours, theirs in name_map.items():
            sd[f"model.layers.{i}.{theirs}.weight"] = torch.tensor(
                np.asarray(p["layers"][ours][i]).T)
        sd[f"model.layers.{i}.input_layernorm.weight"] = torch.tensor(
            np.asarray(p["layers"]["attn_norm"][i]))
        sd[f"model.layers.{i}.post_attention_layernorm.weight"] = torch.tensor(
            np.asarray(p["layers"]["mlp_norm"][i]))
    sd["model.norm.weight"] = torch.tensor(np.asarray(p["final_norm"]))
    sd["lm_head.weight"] = torch.tensor(np.asarray(p["lm_head"]).T)
    c = params["connector"]
    sd["connector.0.weight"] = torch.tensor(np.asarray(c["fc1"]["w"]).T)
    sd["connector.0.bias"] = torch.tensor(np.asarray(c["fc1"]["b"]))
    sd["connector.2.weight"] = torch.tensor(np.asarray(c["fc2"]["w"]).T)
    sd["connector.2.bias"] = torch.tensor(np.asarray(c["fc2"]["b"]))
    missing, unexpected = model.load_state_dict(sd, strict=False)
    assert not unexpected, unexpected
    model.vocab_size = cfg.llama.vocab_size
    return model


def _make_batch(tok, cfg, n_frames_turns, seed=0):
    conv = []
    rng = np.random.RandomState(seed)
    for i, nf in enumerate(n_frames_turns):
        conv.append({"role": "stream", "num_frames": nf, "learn": True})
        conv.append({"role": "assistant", "content": f"event {i} happens.",
                     "learn": True})
    conv = [{"role": "system", "content": "sys."}] + conv
    total = sum(n_frames_turns)
    frames = rng.randn(total, cfg.frame_num_tokens,
                       cfg.vision_hidden_size).astype(np.float32)
    text = tok.apply_chat_template(conv)
    ranges = tok.get_learn_ranges(conv)
    return collate([(text, frames, ranges, 0, None)], tokenizer=tok)


def _compare(cfg, tok, params, batch, threshold):
    ref_model = _torch_live_model(cfg, params)
    with torch.no_grad():
        ref = ref_model.stream_evaluate(
            input_ids=torch.tensor(batch["input_ids"]),
            labels=torch.tensor(batch["labels"]),
            frames=torch.tensor(batch["frames"]),
            frame_token_interval_threshold=threshold,
        ).numpy()
    ours = StreamEvaluator(params, cfg)(
        batch["input_ids"], batch["labels"], batch["frames"],
        frame_token_interval_threshold=threshold)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)
    return ours


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    return cfg, tok, params


def test_stream_evaluate_matches_reference(setup):
    cfg, tok, params = setup
    batch = _make_batch(tok, cfg, [3, 4, 2])
    ours = _compare(cfg, tok, params, batch, threshold=0.0)
    assert np.isfinite(ours).all()


def test_stream_evaluate_with_threshold(setup):
    cfg, tok, params = setup
    batch = _make_batch(tok, cfg, [2, 5], seed=1)
    _compare(cfg, tok, params, batch, threshold=0.5)


def test_stream_evaluate_rollforward_branch(setup):
    """Pin interval_id to the model's argmax so the gate never fires inside
    a turn -> the KV-trim rollforward executes (modeling_live.py:116-148)."""
    cfg, tok, params = setup
    batch = _make_batch(tok, cfg, [3, 3], seed=2)
    ev = StreamEvaluator(params, cfg)
    # find the favourite prediction at the first supervised stream position
    ids = batch["input_ids"]
    import jax.numpy as jnp
    from videollm_online_tpu.models import live as live_mod
    logits, _, _ = live_mod.forward(params, cfg,
                                    input_ids=jnp.asarray(ids),
                                    frames=jnp.asarray(batch["frames"]))
    v_pos = np.nonzero((ids[0] == cfg.v_placeholder_id)
                       & (batch["labels"][0] != -100))[0]
    fav = int(np.asarray(logits)[0, v_pos[0]].argmax())
    if fav == cfg.eos_token_id:
        pytest.skip("degenerate favourite token")
    cfg2 = cfg.replace(frame_token_interval_id=fav)
    batch2 = _make_batch(tok, cfg2, [3, 3], seed=2)
    _compare(cfg2, tok, params, batch2, threshold=0.0)
