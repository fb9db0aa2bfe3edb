"""ffmpeg de-risking without an ffmpeg binary in the image: a fake-ffmpeg
executable captures the exact argv (golden-checked against the reference's
command semantics, data/utils.py:51-66) and exercises read_video_frames's
rawvideo pipe parsing and the renderer's mux invocation end-to-end, so a
real binary in deployment can't surprise us."""

import json
import os
import stat
import sys

import numpy as np
import pytest

from videollm_online_tpu.data import video_io

STUB = r'''#!/usr/bin/env python3
import json, os, re, sys

here = os.path.dirname(os.path.abspath(__file__))
with open(os.path.join(here, "argv.json"), "a") as f:
    f.write(json.dumps(sys.argv[1:]) + "\n")
args = sys.argv[1:]

if args and args[-1] == "pipe:1":
    # decode-to-pipe mode: emit 5 deterministic rgb24 frames (+ a truncated
    # partial frame to prove the reader floors to whole frames)
    vf = args[args.index("-vf") + 1]
    m = re.search(r"pad=(\d+):(\d+)", vf)
    w = h = int(m.group(1))
    out = sys.stdout.buffer
    for t in range(5):
        frame = bytearray()
        px = bytes([(10 * t + 1) % 256, (10 * t + 2) % 256,
                    (10 * t + 3) % 256])
        out.write(px * (w * h))
    out.write(b"\x00" * 17)  # trailing partial frame
    sys.exit(0)

if "pipe:0" in args:
    # mux mode: consume the rawvideo stdin fully, record its length, write dst
    data = sys.stdin.buffer.read()
    with open(os.path.join(here, "stdin_len.txt"), "w") as f:
        f.write(str(len(data)))
    with open(args[-1], "wb") as f:
        f.write(b"MUXED")
    sys.exit(0)

# transcode mode (ffmpeg_once): just create dst
with open(args[-1], "wb") as f:
    f.write(b"TRANSCODED")
'''


@pytest.fixture()
def fake_ffmpeg(tmp_path, monkeypatch):
    stub = tmp_path / "ffmpeg"
    stub.write_text(STUB)
    stub.chmod(stub.stat().st_mode | stat.S_IXUSR)
    monkeypatch.setattr(video_io, "_FFMPEG", str(stub))

    def argvs():
        lines = (tmp_path / "argv.json").read_text().splitlines()
        return [json.loads(l) for l in lines]

    return str(stub), argvs, tmp_path


def test_ffmpeg_once_argv_golden(fake_ffmpeg, tmp_path):
    stub, argvs, d = fake_ffmpeg
    src = str(tmp_path / "in.mp4")
    dst = str(tmp_path / "out.mp4")
    open(src, "wb").close()
    video_io.ffmpeg_once(src, dst, fps=2, resolution=384)
    assert os.path.exists(dst)
    # exact command the reference's preprocessing implies
    # (data/utils.py:51-66: fps resample, aspect-preserving scale,
    # center zero-pad to square)
    assert argvs()[-1] == [
        "-y", "-loglevel", "error", "-i", src, "-vf",
        "fps=2,scale=w=384:h=384:force_original_aspect_ratio=decrease,"
        "pad=384:384:(ow-iw)/2:(oh-ih)/2:color=black",
        dst,
    ]


def test_read_video_frames_pipe_parsing(fake_ffmpeg, tmp_path):
    stub, argvs, d = fake_ffmpeg
    src = str(tmp_path / "clip.mp4")
    open(src, "wb").close()
    frames = video_io.read_video_frames(src, fps=2, resolution=64)
    assert argvs()[-1] == [
        "-loglevel", "error", "-i", src, "-vf",
        "fps=2,scale=w=64:h=64:force_original_aspect_ratio=decrease,"
        "pad=64:64:(ow-iw)/2:(oh-ih)/2:color=black",
        "-f", "rawvideo", "-pix_fmt", "rgb24", "pipe:1",
    ]
    # 5 whole frames; the 17 trailing bytes are floored away
    assert frames.shape == (5, 3, 64, 64)
    for t in range(5):
        # HWC rgb24 -> CHW with channels in R,G,B order
        assert int(frames[t, 0, 0, 0]) == (10 * t + 1) % 256
        assert int(frames[t, 1, 0, 0]) == (10 * t + 2) % 256
        assert int(frames[t, 2, 0, 0]) == (10 * t + 3) % 256
        assert (frames[t, 0] == frames[t, 0, 0, 0]).all()


def test_render_mux_argv_and_pipe(fake_ffmpeg, tmp_path):
    pytest.importorskip("PIL")
    from videollm_online_tpu.serve import rendering
    from videollm_online_tpu.serve.tts import default_tts_fn

    stub, argvs, d = fake_ffmpeg
    video = np.zeros((4, 3, 64, 64), np.uint8)
    conv = [
        {"role": "user", "content": "what now?", "time": 0.5},
        {"role": "assistant", "content": "You wash the pan.", "time": 1.0},
    ]
    out = str(tmp_path / "demo.mp4")
    got = rendering.render_conversation_video(video, conv, out, fps=2,
                                              tts_fn=default_tts_fn())
    assert got == out and open(out, "rb").read() == b"MUXED"
    cmd = argvs()[-1]
    # rawvideo header matches the composited stack geometry
    assert cmd[:4] == ["-y", "-loglevel", "error", "-f"]
    assert "rawvideo" in cmd and "rgb24" in cmd
    s = cmd[cmd.index("-s") + 1]
    W, H = (int(x) for x in s.split("x"))
    assert (H, W) == (64, 64 + 512)  # frame + chat board
    assert cmd[cmd.index("-r") + 1] == "2"
    # audio input present and the wav exists on disk
    wav = cmd[cmd.index("-c:a") - 1]
    assert wav.endswith(".wav") and os.path.exists(wav)
    assert cmd[cmd.index("-c:a") + 1] == "aac" and "-shortest" in cmd
    assert cmd[-3:] == ["-pix_fmt", "yuv420p", out]
    # the full rawvideo stream crossed the pipe
    stdin_len = int((d / "stdin_len.txt").read_text())
    assert stdin_len == 4 * H * W * 3
