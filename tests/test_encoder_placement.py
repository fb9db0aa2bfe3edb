"""Encoder-on-separate-device placement: same transcript as single-device,
and the vision params actually live on the other device."""

import numpy as np
import pytest

import jax

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live, siglip
from videollm_online_tpu.serve.engine import LiveInferEngine
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer


@pytest.mark.skipif(len(jax.devices()) < 2, reason="needs 2+ devices")
def test_encoder_device_placement_matches_single():
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(max_response_tokens=8)
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    vparams = siglip.init_params(jax.random.PRNGKey(1), cfg.vision)
    video = np.random.RandomState(0).randint(
        0, 255, (4, 3, cfg.vision.image_size, cfg.vision.image_size),
        np.uint8)

    def run(encoder_device):
        e = LiveInferEngine(params, tok, cfg, vision_params=vparams,
                            kv_capacity=512, encoder_device=encoder_device)
        e.load_video(video)
        events = []
        for t in [0.0, 0.5, 1.0, 1.5]:
            e.input_video_stream(t)
            while True:
                q, r = e()
                if r is None:
                    break
                events.append((q, r))
        return e, events

    e1, ev_single = run(None)
    e2, ev_placed = run(jax.devices()[1])
    assert ev_placed == ev_single
    # vision params really live on the second device
    leaf = jax.tree.leaves(e2.vision_params)[0]
    assert jax.devices()[1] in leaf.devices()
