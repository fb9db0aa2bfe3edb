"""Gradio app smoke test with a mocked gradio module (gradio isn't bundled
in this image): verifies the UI wiring of serve/app.py — upload handler,
wall-clock time driver, query box, threshold slider — against a real tiny
engine (reference demo/app.py:21-91)."""

import sys
import types

import numpy as np
import pytest

import jax

from videollm_online_tpu.core.config import tiny_live_config
from videollm_online_tpu.models import live
from videollm_online_tpu.serve.engine import LiveInferEngine
from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
from videollm_online_tpu.tokenizer.tiny import ByteTokenizer

_REGISTRY = []


class _Component:
    def __init__(self, *a, **kw):
        self.kw = kw
        self.handlers = {}
        _REGISTRY.append(self)

    def change(self, fn, inputs, outputs):
        self.handlers["change"] = fn

    def submit(self, fn, inputs, outputs):
        self.handlers["submit"] = fn


class _Blocks(_Component):
    def __init__(self, *a, **kw):
        super().__init__(*a, **kw)
        self.load_calls = []

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False

    def load(self, fn, inputs, outputs, js=None, every=None):
        self.load_calls.append({"js": js, "every": every})


def _fake_gradio():
    gr = types.ModuleType("gradio")
    gr.Blocks = _Blocks
    gr.Row = _Blocks
    gr.Column = _Blocks
    for name in ("Video", "Slider", "Number", "Chatbot", "Textbox",
                 "Markdown"):
        setattr(gr, name, _Component)
    return gr


@pytest.fixture
def engine():
    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(frame_token_interval_threshold=0.725,
                          max_response_tokens=12)
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    eng = LiveInferEngine(params, tok, cfg, kv_capacity=2048)
    feats = np.random.RandomState(0).randn(
        8, cfg.frame_num_tokens, cfg.vision_hidden_size).astype(np.float32)
    eng.load_video(feats)
    return eng


def test_app_wiring_drives_engine(engine, monkeypatch):
    monkeypatch.setitem(sys.modules, "gradio", _fake_gradio())
    _REGISTRY.clear()
    from videollm_online_tpu.serve import app as app_mod

    app = app_mod.build_app(engine, frame_fps=engine.frame_fps,
                            resolution=engine.cfg.frame_resolution)
    # the wall-clock JS driver is installed with the right polling rate
    assert app.load_calls and app.load_calls[0]["every"] == pytest.approx(
        0.5 / engine.frame_fps)
    assert "currentTime" in app.load_calls[0]["js"]

    # wired callbacks: the hidden Number's change -> on_time; the Textbox's
    # submit -> on_query; the Video's change -> on_video
    on_time = next(c.handlers["change"] for c in _REGISTRY
                   if "change" in c.handlers and c.kw.get("visible") is False)
    on_query = next(c.handlers["submit"] for c in _REGISTRY
                    if "submit" in c.handlers)
    on_video = next(c.handlers["change"] for c in _REGISTRY
                    if "change" in c.handlers and c.kw.get("elem_id") == "gr_video")

    # no upload: handler is a no-op returning an empty chat
    assert on_video(None) == []
    # type a query, then tick video time forward: the engine must answer
    assert on_query("what is happening?") == ""
    history = []
    for i in range(1, 9):
        history = on_time(i / engine.frame_fps, 0.725)
    assert any(r is not None for _, r in history), history
    # the query was surfaced into the chat as well
    assert any(q is not None for q, _ in history), history
    # threshold slider path: set_threshold ran without recompiling
    assert engine.cfg.frame_token_interval_threshold == pytest.approx(0.725)
