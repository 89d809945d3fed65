#!/usr/bin/env python
"""Offline dataset fixtures in the EXACT reference on-disk formats.

Generates concept-grounded images (the synthetic dataset's color/shape/
background concepts, so retrieval has real learnable signal) wrapped in
the reference's own annotation containers:

* ``coco``: Karpathy-split JSONs exactly as the BLIP bucket ships them
  (``/root/reference/data/coco_dataset.py:29-151``): train =
  ``[{"image", "caption": <str>, "image_id"}]`` with multiple caption
  rows per image_id; val/test = ``[{"image", "caption": [<5 strs>]}]``;
  images under a ``val2014/``-style subdirectory referenced by relative
  path inside the JSON.
* ``roco``: ROCOv2 CSV with ``id,name,caption`` columns
  (``/root/reference/rocov2Radiology_dataset.py:30-42``) + a flat image
  dir.  Includes one MISSING file row and one CORRUPT (truncated) JPEG
  so the black-image fallback path (``:60-68``) is exercised by any
  run over the fixture — matching the reference's defensive behavior.

Usage::

    python tools/make_fixtures.py coco  <out_dir> [n_train] [n_test]
    python tools/make_fixtures.py roco  <out_dir> [n_rows]

Used by tools/quality_coco.sh / tools/quality_roco.sh (BASELINE
configs #3/#4 rehearsals) and the corresponding tests.
"""

import csv
import json
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from multimodal_dataset_distillation_tpu.data.datasets import (  # noqa: E402
    _caption_for,
    _draw_fake_image,
    _sample_concept,
)

IMG_SIZE = 64


def _concept_images(n, seed):
    rng = np.random.RandomState(seed)
    out = []
    for i in range(n):
        color, shape, bg = _sample_concept(rng)
        img = _draw_fake_image(rng, IMG_SIZE, color, shape, bg)
        caps = [_caption_for(rng, color, shape, bg) for _ in range(5)]
        out.append((img, caps))
    return out


def make_coco(out_dir, n_train=64, n_test=16):
    img_dir = os.path.join(out_dir, "images", "val2014")
    ann_dir = os.path.join(out_dir, "ann")
    os.makedirs(img_dir, exist_ok=True)
    os.makedirs(ann_dir, exist_ok=True)

    train = []
    for i, (img, caps) in enumerate(_concept_images(n_train, seed=0)):
        name = f"val2014/COCO_val2014_{i:012d}.jpg"
        img.save(os.path.join(out_dir, "images", name), quality=92)
        # Karpathy train JSON: one row per caption, repeated image_id
        for cap in caps[:2]:
            train.append({"image": name, "caption": cap,
                          "image_id": str(i)})
    with open(os.path.join(ann_dir, "coco_karpathy_train.json"), "w") as f:
        json.dump(train, f)

    for split, seed in (("val", 1), ("test", 2)):
        ev = []
        for i, (img, caps) in enumerate(_concept_images(n_test, seed=seed)):
            name = f"val2014/COCO_{split}_{i:012d}.jpg"
            img.save(os.path.join(out_dir, "images", name), quality=92)
            ev.append({"image": name, "caption": caps})
        with open(os.path.join(ann_dir, f"coco_karpathy_{split}.json"),
                  "w") as f:
            json.dump(ev, f)
    print(f"coco fixture: {len(train)} train rows, {n_test} eval images "
          f"x 5 captions -> {out_dir}")


def make_roco(out_dir, n_rows=64):
    img_dir = os.path.join(out_dir, "images")
    os.makedirs(img_dir, exist_ok=True)
    rows = []
    for i, (img, caps) in enumerate(_concept_images(n_rows, seed=3)):
        name = f"ROCOv2_2023_{i:06d}.jpg"
        path = os.path.join(img_dir, name)
        img.save(path, quality=92)
        if i == 1:
            # deliberately CORRUPT: truncate mid-stream so PIL raises
            # (reference fallback: black image, :60-68)
            with open(path, "r+b") as f:
                f.truncate(40)
        if i == 2:
            os.remove(path)  # missing-file row (same fallback)
        rows.append({"id": f"R{i:05d}", "name": name, "caption": caps[0]})
    csv_path = os.path.join(out_dir, "radiologytraindata.csv")
    with open(csv_path, "w", newline="") as f:
        w = csv.DictWriter(f, fieldnames=["id", "name", "caption"])
        w.writeheader()
        w.writerows(rows)
    print(f"roco fixture: {len(rows)} CSV rows (row 1 corrupt jpeg, "
          f"row 2 missing file) -> {csv_path}")


def main():
    kind = sys.argv[1]
    out = sys.argv[2]
    if kind == "coco":
        make_coco(out, *(int(a) for a in sys.argv[3:]))
    elif kind == "roco":
        make_roco(out, *(int(a) for a in sys.argv[3:]))
    else:
        raise SystemExit(f"unknown fixture kind: {kind}")


if __name__ == "__main__":
    main()
