"""CLIP vision tower parity vs HF CLIPVisionModel + the reference's CLIP
frame-feature layout (vision_live.py:32-52)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from videollm_online_tpu.core.config import VisionConfig, live1_plus_config
from videollm_online_tpu.models import clip

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = clip.clip_vision_config(image_size=48, patch_size=8, hidden_size=64,
                                  intermediate_size=128, num_layers=2,
                                  num_heads=4, dtype="float32")
    hf_cfg = transformers.CLIPVisionConfig(
        hidden_size=cfg.hidden_size, intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers, num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size, patch_size=cfg.patch_size,
        layer_norm_eps=cfg.layer_norm_eps, hidden_act="quick_gelu")
    torch.manual_seed(0)
    hf = transformers.CLIPVisionModel(hf_cfg).eval()
    params = clip.params_from_state_dict(hf.state_dict(), cfg,
                                         dtype="float32")
    return cfg, hf, params


def test_encode_matches_hf(tiny_pair):
    cfg, hf, params = tiny_pair
    pixels = np.random.RandomState(0).randn(
        2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(pixels))
    hidden, pooled = clip.encode(params, jnp.asarray(pixels), cfg)
    np.testing.assert_allclose(np.asarray(hidden),
                               out.last_hidden_state.numpy(),
                               atol=3e-4, rtol=3e-3)
    np.testing.assert_allclose(np.asarray(pooled), out.pooler_output.numpy(),
                               atol=3e-4, rtol=3e-3)


def test_clip_frame_features_match_reference_epilogue(tiny_pair):
    cfg, hf, params = tiny_pair
    live_cfg = live1_plus_config(vision=cfg, vision_hidden_size=cfg.hidden_size)
    pixels = np.random.RandomState(1).randn(
        1, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        lh = hf(pixel_values=torch.tensor(pixels)).last_hidden_state
        s = int(math.isqrt(lh.shape[1] - 1))
        spatial = torch.nn.functional.adaptive_avg_pool2d(
            lh[:, 1:].reshape(1, s, s, -1).permute(0, 3, 1, 2),
            (3, 3)).flatten(2, 3).permute(0, 2, 1)
        ref = torch.cat([lh[:, :1], spatial], dim=1).numpy()
    got = clip.frame_features(params, jnp.asarray(pixels), cfg, live_cfg)
    np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4, rtol=3e-3)
