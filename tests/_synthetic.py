"""Shared synthetic dataset trees for tests."""

import json
import os

import numpy as np

FPS = 2
EMBED_MARK = "2fps_384_1+3x3"
VISION = "google/siglip-large-patch16-384"


def write_feats(dirpath, uid, num_frames, dim=32, tokens=10, seed=0):
    os.makedirs(dirpath, exist_ok=True)
    np.save(os.path.join(dirpath, f"{uid}.npy"),
            np.random.RandomState(seed).randn(
                num_frames, tokens, dim).astype(np.float32))


def make_coin_root(root, dim=32):
    embed_dir = os.path.join(
        root, f"videos_{EMBED_MARK}_{VISION.replace('/', '--')}")
    for uid in ("cv1", "cv2"):
        write_feats(embed_dir, uid, 81, dim=dim)
    database = {
        "cv1": {"class": "MakeCoffee", "subset": "training",
                "start": 0.0, "end": 30.0,
                "annotation": [
                    {"segment": [1.0, 5.0], "label": "grind beans"},
                    {"segment": [6.0, 12.0], "label": "boil water"},
                    {"segment": [13.0, 20.0], "label": "pour water"},
                ]},
        "cv2": {"class": "ChangeTire", "subset": "training testing",
                "start": 0.0, "end": 35.0,
                "annotation": [
                    {"segment": [2.0, 8.0], "label": "lift car"},
                    {"segment": [9.0, 18.0], "label": "remove wheel"},
                ]},
    }
    with open(os.path.join(root, "coin.json"), "w") as f:
        json.dump({"database": database}, f)
    return root


def common_data_kwargs(tok, root):
    return dict(vision_pretrained=VISION, embed_mark=EMBED_MARK,
                frame_fps=FPS, root=root, tokenizer=tok,
                system_prompt="sys.", augmentation=False,
                max_num_frames=1200)
