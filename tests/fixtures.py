"""Synthetic mini-SSv2 fixture matching the reference's on-disk formats
(``ssv2.py:447-473``, ``ssv2_frames.py:474-529``): frame JPEG dirs +
bbox_jsons + split/label JSONs."""

import json
import os

import numpy as np
from PIL import Image


def make_ssv2_fixture(root, num_videos=4, num_frames=12, size=(80, 64),
                      num_classes=5, seed=0):
    """Create a standard-split SSv2 tree under ``root``; returns video ids."""
    rng = np.random.RandomState(seed)
    os.makedirs(f"{root}/sm/annotations", exist_ok=True)
    os.makedirs(f"{root}/json_files", exist_ok=True)
    os.makedirs(f"{root}/bbox_jsons", exist_ok=True)

    templates = [f"Doing thing {i}" for i in range(num_classes)]
    labels = {t: str(i) for i, t in enumerate(templates)}
    with open(f"{root}/sm/annotations/something-something-v2-labels.json", "w") as f:
        json.dump(labels, f)

    vids = [str(100 + i) for i in range(num_videos)]
    entries = [
        {"id": v, "template": templates[i % num_classes]}
        for i, v in enumerate(vids)
    ]
    for split in ("train", "validation"):
        with open(f"{root}/json_files/something-something-v2-{split}.json", "w") as f:
            json.dump(entries, f)

    W, H = size
    for v in vids:
        os.makedirs(f"{root}/frames/{v}", exist_ok=True)
        frame_entries = []
        for t in range(num_frames):
            img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
            name = "%04d.jpg" % (t + 1)
            Image.fromarray(img).save(f"{root}/frames/{v}/{name}")
            # two hands + one object with plausible boxes
            lab = []
            for k, cat in enumerate(["hand", "hand", "object"]):
                x1 = float(rng.uniform(0, W * 0.5))
                y1 = float(rng.uniform(0, H * 0.5))
                lab.append(
                    {
                        "standard_category": cat,
                        "box2d": {
                            "x1": x1, "y1": y1,
                            "x2": x1 + float(rng.uniform(8, W * 0.4)),
                            "y2": y1 + float(rng.uniform(8, H * 0.4)),
                        },
                    }
                )
            frame_entries.append({"name": f"frames/{v}/{name}", "labels": lab})
        with open(f"{root}/bbox_jsons/{int(v)}.json", "w") as f:
            json.dump(frame_entries, f)
    return vids


def make_doh_fixture(root, num_frames=6, size=(96, 72), seed=1):
    rng = np.random.RandomState(seed)
    os.makedirs(f"{root}/file", exist_ok=True)
    names = []
    for i in range(num_frames):
        cat = ["food", "diy"][i % 2]
        rel = f"x/{cat}/frame_{i:04d}.jpg"
        names.append(rel)
        path = f"{root}/raw_256/{os.path.dirname(rel)}"
        os.makedirs(path, exist_ok=True)
        W, H = size
        img = rng.randint(0, 255, (H, W, 3), dtype=np.uint8)
        Image.fromarray(img).save(f"{root}/raw_256/{rel}")
    annots = {}
    for i, rel in enumerate(names):
        hand = {
            "x1": 0.1, "y1": 0.2, "x2": 0.4, "y2": 0.6,
            "contact_state": int(i % 5), "hand_side": "r",
            "obj_bbox": {"x1": 0.35, "y1": 0.2, "x2": 0.7, "y2": 0.5},
        }
        annots[rel] = [hand]
    for split in ("train", "val"):
        with open(f"{root}/file/{split}.json", "w") as f:
            json.dump(annots, f)
    return names
