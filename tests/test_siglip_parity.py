"""SigLIP encoder parity vs HF torch SiglipVisionModel (tiny random config),
and the CLS + 3x3 pooled frame-feature layout vs a torch re-computation of
the reference epilogue (vision_live.py:10-30)."""

import math

import numpy as np
import pytest

import jax.numpy as jnp

from videollm_online_tpu.core.config import VisionConfig, live1_plus_config
from videollm_online_tpu.models import siglip
from videollm_online_tpu.models.convert import siglip_params_from_state_dict

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def tiny_pair():
    cfg = VisionConfig(image_size=48, patch_size=8, hidden_size=64,
                       intermediate_size=128, num_layers=2, num_heads=4,
                       dtype="float32")
    hf_cfg = transformers.SiglipVisionConfig(
        hidden_size=cfg.hidden_size,
        intermediate_size=cfg.intermediate_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        image_size=cfg.image_size,
        patch_size=cfg.patch_size,
        layer_norm_eps=cfg.layer_norm_eps,
    )
    torch.manual_seed(0)
    hf = transformers.SiglipVisionModel(hf_cfg).eval()
    params = siglip_params_from_state_dict(hf.state_dict(), cfg, dtype="float32")
    return cfg, hf, params


def test_encode_matches_hf(tiny_pair):
    cfg, hf, params = tiny_pair
    rng = np.random.RandomState(0)
    pixels = rng.randn(2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(pixels), interpolate_pos_encoding=False)
    got_hidden, got_pooled = siglip.encode(params, jnp.asarray(pixels), cfg)
    np.testing.assert_allclose(np.asarray(got_hidden),
                               out.last_hidden_state.numpy(),
                               atol=2e-4, rtol=2e-3)
    np.testing.assert_allclose(np.asarray(got_pooled),
                               out.pooler_output.numpy(),
                               atol=2e-4, rtol=2e-3)


def test_frame_features_cls_plus_pool(tiny_pair):
    """CLS + 3x3 adaptive-avg-pool layout matches a torch recomputation of
    the reference epilogue on the HF outputs."""
    cfg, hf, params = tiny_pair
    live_cfg = live1_plus_config(vision=cfg, vision_hidden_size=cfg.hidden_size)
    rng = np.random.RandomState(1)
    pixels = rng.randn(2, 3, cfg.image_size, cfg.image_size).astype(np.float32)
    with torch.no_grad():
        out = hf(pixel_values=torch.tensor(pixels))
        lh = out.last_hidden_state
        s = int(math.isqrt(lh.shape[1]))
        spatial = torch.nn.functional.adaptive_avg_pool2d(
            lh.reshape(lh.shape[0], s, s, lh.shape[-1]).permute(0, 3, 1, 2),
            (3, 3)).flatten(2, 3).permute(0, 2, 1)
        ref = torch.cat([out.pooler_output[:, None], spatial], dim=1).numpy()

    got = siglip.frame_features(params, jnp.asarray(pixels), cfg, live_cfg)
    assert got.shape == (2, 10, cfg.hidden_size)
    np.testing.assert_allclose(np.asarray(got), ref, atol=2e-4, rtol=2e-3)


def test_frame_features_cls_only(tiny_pair):
    from videollm_online_tpu.core.config import live1_config
    cfg, hf, params = tiny_pair
    live_cfg = live1_config(vision=cfg, vision_hidden_size=cfg.hidden_size)
    pixels = np.random.RandomState(2).randn(1, 3, cfg.image_size,
                                            cfg.image_size).astype(np.float32)
    got = siglip.frame_features(params, jnp.asarray(pixels), cfg, live_cfg)
    assert got.shape == (1, 1, cfg.hidden_size)
    with torch.no_grad():
        ref = hf(pixel_values=torch.tensor(pixels)).pooler_output.numpy()
    np.testing.assert_allclose(np.asarray(got[:, 0]), ref, atol=2e-4, rtol=2e-3)


def test_preprocess_matches_reference_normalization():
    cfg = VisionConfig(dtype="float32")
    frames = np.random.RandomState(0).randint(0, 256, (2, 3, 8, 8)).astype(np.uint8)
    got = siglip.preprocess(jnp.asarray(frames), cfg)
    ref = (frames.astype(np.float32) / 255.0 - 0.5) / 0.5
    np.testing.assert_allclose(np.asarray(got), ref, atol=1e-6)
