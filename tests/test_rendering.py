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


def test_render_fallback_npy(tmp_path):
    frames = np.zeros((4, 3, 64, 64), np.uint8)
    conv = [{"role": "assistant", "content": "hello", "time": 0.5}]
    out = render_conversation_video(frames, conv,
                                    str(tmp_path / "demo.mp4"), fps=2.0)
    assert out.endswith("_frames.npy")
    video = np.load(out)
    assert video.shape[0] == 4
    # message becomes visible from frame 1 (t=0.5): boards differ
    board0, board2 = video[0][:, 64:], video[2][:, 64:]
    assert not np.array_equal(board0, board2)
    assert board2.std() > board0.std()  # text drawn on later board
