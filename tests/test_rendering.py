"""Renderer: composited frames have the chat board and visible-message
timing; no ffmpeg -> .npy fallback."""

import numpy as np
import pytest

pytest.importorskip("PIL")

from videollm_online_tpu.serve.rendering import (compose_frame,
                                                 render_conversation_video)


def test_compose_frame_dimensions_and_content():
    frame = np.random.RandomState(0).randint(0, 255, (3, 128, 160), np.uint8)
    msgs = [{"role": "user", "content": "what is happening?", "time": 1.0},
            {"role": "assistant", "content": "you are pouring water",
             "time": 1.5}]
    out = compose_frame(frame, msgs)
    assert out.shape == (128, 160 + 512, 3)
    board = out[:, 160:]
    assert board.std() > 0  # text drawn


def test_render_fallback_avi(tmp_path, monkeypatch):
    """Without ffmpeg the renderer muxes a REAL playable MJPEG AVI via the
    first-party container writer (data/avi.py) instead of skipping."""
    from videollm_online_tpu.data import avi, video_io
    monkeypatch.setattr(video_io, "_FFMPEG", "")
    frames = np.zeros((4, 3, 64, 64), np.uint8)
    conv = [{"role": "assistant", "content": "hello", "time": 0.5}]
    out = render_conversation_video(frames, conv,
                                    str(tmp_path / "demo.mp4"), fps=2.0)
    assert out.endswith(".avi")
    data = avi.read_avi(out)
    assert data.fps == 2.0
    video = data.frames
    assert video.shape[0] == 4
    # message becomes visible from frame 1 (t=0.5): boards differ
    board0, board2 = video[0][:, 64:], video[2][:, 64:]
    assert not np.array_equal(board0, board2)
    assert board2.std() > board0.std()  # text drawn on later board


def test_formant_tts_backend():
    """Offline TTS backend contract (reference render.py:12-29: per-message
    synthesis with fixed speaker seeds): deterministic per seed, different
    speakers per seed, audible output whose length tracks the text."""
    from videollm_online_tpu.serve.tts import FormantTTS

    tts = FormantTTS(seed=2)
    sr, w1 = tts("Hello there, I can see you cooking.")
    assert sr == 16000
    assert w1.dtype == np.float32
    assert np.max(np.abs(w1)) > 0.3          # audible
    assert np.max(np.abs(w1)) <= 1.0         # normalized
    sr2, w1b = FormantTTS(seed=2)("Hello there, I can see you cooking.")
    np.testing.assert_array_equal(w1, w1b)   # deterministic speaker
    _, w2 = FormantTTS(seed=5)("Hello there, I can see you cooking.")
    assert w1.shape != w2.shape or not np.allclose(w1, w2)
    _, short = tts("Hi.")
    assert len(short) < len(w1)              # duration tracks text


def test_render_with_tts_muxes_audio_avi(tmp_path, monkeypatch):
    """End-to-end render + TTS mux through the first-party AVI path: the
    output container carries an audible audio stream placed at the
    assistant message's timestamp (reference render.py:141-156)."""
    from videollm_online_tpu.data import avi, video_io
    from videollm_online_tpu.serve import rendering
    from videollm_online_tpu.serve.tts import default_tts_fn

    monkeypatch.setattr(video_io, "_FFMPEG", "")
    video = np.zeros((8, 3, 64, 64), np.uint8)
    conv = [
        {"role": "user", "content": "what now?", "time": 0.5},
        {"role": "assistant", "content": "You wash the pan.", "time": 1.0},
    ]
    out = rendering.render_conversation_video(video, conv,
                                              str(tmp_path / "demo.avi"),
                                              fps=2, tts_fn=default_tts_fn())
    data = avi.read_avi(out, with_audio=True)
    assert data.frames.shape[0] == 8
    assert data.audio is not None and data.sample_rate == 16000
    # speech starts at t=1.0s: silence before, energy after
    sr = data.sample_rate
    assert np.abs(data.audio[: int(0.9 * sr)]).max() == 0
    assert np.abs(data.audio[sr: 2 * sr]).max() > 1000


def test_render_with_tts_muxes_audio_ffmpeg(tmp_path):
    """Same mux through a real ffmpeg when one exists (deployment path)."""
    import shutil
    import subprocess
    from videollm_online_tpu.serve import rendering
    from videollm_online_tpu.serve.tts import default_tts_fn

    if shutil.which("ffmpeg") is None:
        import pytest
        pytest.skip("ffmpeg not available")
    video = np.zeros((8, 64, 64, 3), np.uint8)
    conv = [
        {"role": "user", "content": "what now?", "time": 0.5},
        {"role": "assistant", "content": "You wash the pan.", "time": 1.0},
    ]
    out = str(tmp_path / "demo.mp4")
    rendering.render_conversation_video(video, conv, out, fps=2,
                                        tts_fn=default_tts_fn())
    probe = subprocess.run(
        ["ffprobe", "-v", "error", "-select_streams", "a",
         "-show_entries", "stream=codec_type", "-of", "csv=p=0", out],
        capture_output=True, text=True)
    assert "audio" in probe.stdout, probe.stderr
