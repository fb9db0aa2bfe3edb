"""Video IO: filter strings, array round-trips, error messages."""

import numpy as np
import pytest

from videollm_online_tpu.data import video_io


def test_scale_pad_filter_matches_reference_semantics():
    f = video_io._scale_pad_filter(384)
    assert "force_original_aspect_ratio=decrease" in f
    assert "pad=384:384:(ow-iw)/2:(oh-ih)/2" in f


def test_array_roundtrip_npy(tmp_path):
    arr = np.random.RandomState(0).randn(5, 10, 32).astype(np.float32)
    p = str(tmp_path / "x.npy")
    video_io.save_array(p, arr)
    back = video_io.load_array(p)
    np.testing.assert_array_equal(arr, back)


def test_array_roundtrip_pt(tmp_path):
    pytest.importorskip("torch")
    arr = np.random.RandomState(1).randn(3, 4).astype(np.float32)
    p = str(tmp_path / "x.pt")
    video_io.save_array(p, arr)
    back = video_io.load_array(p)
    np.testing.assert_allclose(arr, back, atol=1e-6)


def test_read_video_frames_passthrough(tmp_path):
    arr = np.zeros((2, 3, 8, 8), np.uint8)
    p = str(tmp_path / "feats.npy")
    np.save(p, arr)
    out = video_io.read_video_frames(p)
    assert out.shape == arr.shape


def test_decode_without_ffmpeg_clear_error(monkeypatch):
    monkeypatch.setattr(video_io, "_FFMPEG", "")
    with pytest.raises(RuntimeError, match="pre-extracted features"):
        video_io.read_video_frames("/tmp/nope.mp4")


def test_feature_store_bf16_pt(tmp_path):
    pytest.importorskip("torch")
    import torch
    from videollm_online_tpu.data.feature_store import (feature_len,
                                                        load_feature_range)
    t = torch.randn(7, 10, 16, dtype=torch.bfloat16)
    p = str(tmp_path / "v.pt")
    torch.save(t, p)
    assert feature_len(p) == 7
    sl = load_feature_range(p, range(2, 5))
    assert sl.shape == (3, 10, 16)
    np.testing.assert_allclose(sl, t[2:5].float().numpy(), atol=1e-6)
