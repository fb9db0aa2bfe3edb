"""First-party AVI container IO (data/avi.py) + the no-ffmpeg video path.

The reference's container layer is entirely external (static ffmpeg binary,
reference data/utils.py:51-66; torchvision C++ video_reader,
data/utils.py:106-113) and was untestable here without those binaries.
These tests drive a REAL container end-to-end: RIFF write -> parse ->
fps resample -> scale/pad -> (smoke) the serving engine's pixel path."""

import numpy as np
import pytest

from videollm_online_tpu.data import avi, video_io


def _gradient_frames(n, h, w):
    """Smooth frames (JPEG-friendly), distinct per index."""
    y = np.linspace(0, 255, h, dtype=np.float32)[:, None]
    x = np.linspace(0, 255, w, dtype=np.float32)[None, :]
    out = np.zeros((n, h, w, 3), np.uint8)
    for i in range(n):
        out[i, :, :, 0] = ((y + 7 * i) % 256).astype(np.uint8)
        out[i, :, :, 1] = ((x + 13 * i) % 256).astype(np.uint8)
        out[i, :, :, 2] = np.uint8(40 * i % 256)
    return out


def test_rawvideo_roundtrip_exact(tmp_path):
    frames = np.random.RandomState(0).randint(
        0, 255, (5, 36, 50, 3), np.uint8)  # width*3 not 4-aligned (50*3=150)
    p = str(tmp_path / "v.avi")
    avi.write_avi(p, frames, fps=2.0)
    data = avi.read_avi(p)
    np.testing.assert_array_equal(data.frames, frames)
    assert data.fps == 2.0
    assert data.duration == 2.5


def test_mjpeg_roundtrip_close(tmp_path):
    frames = _gradient_frames(4, 64, 80)
    p = str(tmp_path / "v.avi")
    avi.write_avi(p, frames, fps=30.0, codec="mjpeg")
    data = avi.read_avi(p)
    assert data.frames.shape == frames.shape
    mse = np.mean((data.frames.astype(np.float32) - frames) ** 2)
    psnr = 10 * np.log10(255.0 ** 2 / max(mse, 1e-9))
    assert psnr > 30, f"MJPEG round-trip too lossy: {psnr:.1f} dB"


def test_audio_interleave_roundtrip(tmp_path):
    frames = np.zeros((6, 16, 16, 3), np.uint8)
    sr = 8000
    wav = (np.sin(np.arange(3 * sr) * 0.05) * 0.5).astype(np.float32)
    p = str(tmp_path / "av.avi")
    avi.write_avi(p, frames, fps=2.0, audio=(sr, wav))
    data = avi.read_avi(p, with_audio=True)
    assert data.sample_rate == sr
    expect = (np.clip(wav, -1, 1) * 32767).astype(np.int16)
    np.testing.assert_array_equal(data.audio, expect)


def test_probe_header_only(tmp_path):
    frames = np.zeros((7, 24, 32, 3), np.uint8)
    p = str(tmp_path / "v.avi")
    avi.write_avi(p, frames, fps=2.0, audio=(16000, np.zeros(8000)))
    info = avi.probe_avi(p)
    assert info == {"n_frames": 7, "fps": 2.0, "width": 32, "height": 24,
                    "duration": 3.5, "has_audio": True}
    assert video_io.probe_duration(p) == 3.5 or video_io.find_ffmpeg()


def test_bad_magic_rejected(tmp_path):
    p = tmp_path / "x.avi"
    p.write_bytes(b"RIFF\x10\x00\x00\x00WAVEjunkjunkjunk")
    with pytest.raises(ValueError, match="not an AVI"):
        avi.read_avi(str(p))


def test_resample_indices_fps_grid():
    """ffmpeg fps-filter semantics: nearest input frame per output slot."""
    idx = video_io.resample_frame_indices(60, src_fps=30, dst_fps=2)
    np.testing.assert_array_equal(idx, [0, 15, 30, 45])
    # upsample duplicates
    idx = video_io.resample_frame_indices(4, src_fps=2, dst_fps=4)
    np.testing.assert_array_equal(idx, [0, 1, 1, 2, 2, 3, 3, 4 - 1])
    # identity
    idx = video_io.resample_frame_indices(5, src_fps=2, dst_fps=2)
    np.testing.assert_array_equal(idx, [0, 1, 2, 3, 4])


def test_read_video_frames_avi_no_ffmpeg(tmp_path, monkeypatch):
    """Full no-binary decode path: container -> resample -> scale/pad CHW."""
    monkeypatch.setattr(video_io, "_FFMPEG", "")
    frames = _gradient_frames(30, 48, 96)  # 10s at 3fps, wide aspect
    p = str(tmp_path / "v.avi")
    avi.write_avi(p, frames, fps=3.0)
    out = video_io.read_video_frames(p, fps=1.0, resolution=64)
    assert out.shape == (10, 3, 64, 64) and out.dtype == np.uint8
    # wide input -> vertical black bars from center padding
    assert np.all(out[:, :, :15, :] == 0) and np.all(out[:, :, -15:, :] == 0)
    assert out[:, :, 20:44, :].std() > 0
    # resample picked distinct source frames (blue channel encodes index)
    blues = [int(f[2, 32, 32]) for f in out]
    assert len(set(blues)) == len(blues)


def test_ffmpeg_once_avi_fallback(tmp_path, monkeypatch):
    """Preprocess-once path (reference data/utils.py:51-66) without ffmpeg:
    fps resample + scale/pad written back to a playable AVI."""
    monkeypatch.setattr(video_io, "_FFMPEG", "")
    src = str(tmp_path / "raw.avi")
    dst = str(tmp_path / "proc" / "out.avi")
    avi.write_avi(src, _gradient_frames(20, 30, 60), fps=10.0)
    video_io.ffmpeg_once(src, dst, fps=2.0, resolution=32)
    data = avi.read_avi(dst)
    assert data.frames.shape == (4, 32, 32, 3)
    assert data.fps == 2.0


def test_mp4_without_ffmpeg_still_clear_error(tmp_path, monkeypatch):
    """The reference corpus is H.264 mp4 (reference data/utils.py:106-113);
    without a decoder binary the failure must name the codec problem and
    the three fixes (FFMPEG_BINARY, transcode-to-mjpeg-avi, features)."""
    monkeypatch.setattr(video_io, "_FFMPEG", "")
    with pytest.raises(RuntimeError, match="H.264") as ei:
        video_io.read_video_frames("/tmp/nope.mp4")
    msg = str(ei.value)
    assert "FFMPEG_BINARY" in msg and "-c:v mjpeg" in msg and ".npy" in msg
    # content sniffing: a misnamed ISO-BMFF file gets the same diagnosis
    p = tmp_path / "disguised.bin"
    p.write_bytes(bytes.fromhex("00000018") + b"ftypisom" + bytes(8))
    with pytest.raises(RuntimeError, match="ISO-BMFF"):
        video_io.read_video_frames(str(p))
    # ffmpeg_once on an mp4 source fails with the same actionable message
    with pytest.raises(RuntimeError, match="transcode"):
        video_io.ffmpeg_once("/tmp/nope.mp4", str(tmp_path / "out.avi"))


def _strip_dht(jpeg: bytes) -> bytes:
    """Remove every DHT segment from a baseline JPEG (AVI1 table-less form)."""
    out, pos = bytearray(jpeg[:2]), 2
    while pos + 4 <= len(jpeg):
        marker = jpeg[pos + 1]
        if marker == 0xDA:
            out += jpeg[pos:]
            return bytes(out)
        import struct
        (seglen,) = struct.unpack_from(">H", jpeg, pos + 2)
        if marker != 0xC4:
            out += jpeg[pos:pos + 2 + seglen]
        pos += 2 + seglen
    return bytes(out)


def test_tableless_avi1_mjpeg_decodes(tmp_path, monkeypatch):
    """Some MJPEG encoders emit table-less AVI1 JPEGs (no DHT segment —
    decoder is expected to use the JPEG Annex-K defaults, which is also what
    ffmpeg's MJPEG decoder splices). The reader must splice the default
    tables explicitly (older libjpegs hard-fail on a missing DHT). Since
    PIL/libjpeg *encodes* with those same default tables,
    stripped-then-spliced must decode bit-identically."""
    frames = _gradient_frames(3, 48, 64)
    p = str(tmp_path / "t.avi")
    orig_enc = avi._encode_mjpeg
    monkeypatch.setattr(avi, "_encode_mjpeg",
                        lambda f, q: _strip_dht(orig_enc(f, q)))
    avi.write_avi(p, frames, fps=2.0, codec="mjpeg")
    # fixture sanity: the payloads really are table-less, and the splice
    # reinstates a DHT segment before SOS
    stripped = avi._encode_mjpeg(frames[0], 90)
    assert b"\xff\xc4" not in stripped.rsplit(b"\xff\xda", 1)[0]
    spliced = avi._splice_dht(stripped, avi._default_dht_segment())
    assert b"\xff\xc4" in spliced.rsplit(b"\xff\xda", 1)[0]
    data = avi.read_avi(p)
    reference = avi._decode_jpeg(orig_enc(frames[0], 90))
    np.testing.assert_array_equal(data.frames[0], reference)
    assert data.frames.shape == frames.shape


def test_dht_splice_no_op_when_tables_present():
    """Frames that already carry DHT must pass through byte-identical."""
    jpeg = avi._encode_mjpeg(_gradient_frames(1, 32, 32)[0], 90)
    assert avi._splice_dht(jpeg, avi._default_dht_segment()) == jpeg
    assert avi._splice_dht(b"\x00bogus", avi._default_dht_segment()) == b"\x00bogus"


def test_extradata_dht_preferred():
    """AVI1 files may ship their Huffman tables in strf extradata (bytes
    past the 40-byte BITMAPINFOHEADER); the reader forwards those tables
    to table-less frames, framing bare payloads as a DHT segment."""
    import struct
    dht = avi._default_dht_segment()
    # marker-framed extradata passes through verbatim
    assert avi._extradata_dht(b"\x00" * 40 + dht) == dht
    # bare (marker-less) extradata is framed into a DHT segment
    framed = avi._extradata_dht(b"\x00" * 40 + dht[4:])
    assert framed == b"\xff\xc4" + struct.pack(">H", len(dht[4:]) + 2) + dht[4:]
    # no extradata -> None (reader falls back to the Annex-K defaults)
    assert avi._extradata_dht(b"\x00" * 40) is None


def test_avi_feeds_engine_pixel_path(tmp_path, monkeypatch):
    """End-to-end demo/cli.py flow with a REAL container and no ffmpeg:
    load_video(path) -> first-party AVI decode + resample + scale/pad ->
    SigLIP pixel ingest -> streamed transcript. Matches the reference's
    ffmpeg_once -> load_video -> input_video_stream loop
    (demo/cli.py:17-31) with every native dependency owned."""
    monkeypatch.setattr(video_io, "_FFMPEG", "")
    import jax
    from videollm_online_tpu.core.config import tiny_live_config
    from videollm_online_tpu.models import live, siglip
    from videollm_online_tpu.serve.engine import LiveInferEngine
    from videollm_online_tpu.tokenizer.live_tokenizer import LiveTokenizer
    from videollm_online_tpu.tokenizer.tiny import ByteTokenizer

    cfg = tiny_live_config()
    tok = LiveTokenizer(ByteTokenizer(), cfg)
    cfg = tok.cfg.replace(max_response_tokens=8,
                          frame_resolution=tok.cfg.vision.image_size)
    params = live.init_params(jax.random.PRNGKey(0), cfg)
    vparams = siglip.init_params(jax.random.PRNGKey(1), cfg.vision)
    eng = LiveInferEngine(params, tok, cfg, vision_params=vparams,
                          kv_capacity=512)

    p = str(tmp_path / "clip.avi")
    avi.write_avi(p, _gradient_frames(12, 40, 56), fps=4.0)  # 3s at 4fps
    eng.load_video(p)  # decodes at frame_fps with scale/pad
    assert eng.num_video_frames == int(3 * eng.frame_fps)
    assert eng.video_tensor.shape[1:] == (3, cfg.frame_resolution,
                                          cfg.frame_resolution)
    eng.input_query_stream("what is happening?", 0.0)
    events = []
    for i in range(eng.num_video_frames):
        eng.input_video_stream(i / eng.frame_fps)
        while True:
            q, r = eng()
            if r is None:
                break
            events.append((q, r))
    # the transcript machinery ran over real decoded frames
    assert eng.stats()["offset"] > 0
