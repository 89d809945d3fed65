#!/usr/bin/env python
"""Input-pipeline throughput: loader img/s alongside the step img/s.

VERDICT r1 weak-point 5: the expert-phase 1834 img/s device throughput
was recorded without the feeding loader's throughput, so an input-bound
expert phase on a few-core host would go unnoticed.  This measures the
host loader end-to-end (JPEG bytes -> decoded, RandAugmented, CLIP-
normalized NHWC float batch) on generated JPEGs, for both decode paths:

  * native:  C++ fastimage pool (GIL-free decode+resize, --native_decode)
  * pil:     PIL fallback

Prints one JSON line per path.  Run CPU-only: PYTHONPATH= python ...
"""

import io
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def make_jpegs(root: str, n: int = 96, size=(320, 240)) -> list:
    from PIL import Image

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        arr = rng.randint(0, 255, (size[1], size[0], 3), dtype=np.uint8)
        p = os.path.join(root, f"img_{i}.jpg")
        Image.fromarray(arr).save(p, quality=85)
        paths.append(p)
    return paths


class _BytesTrainDS:
    """Minimal VLTrainDataset shim over files + fixed captions."""

    def __init__(self, paths, transform):
        self.paths = paths
        self.transform = transform

    def __len__(self):
        return len(self.paths)

    def __getitem__(self, index):
        from multimodal_dataset_distillation_tpu.data.datasets import _load_image

        img = _load_image(self.paths[index], self.transform)
        return img, f"caption {index}", index


def bench_path(native: bool, paths, image_size=224, epochs=4,
               batch_size=32, num_workers=4):
    from multimodal_dataset_distillation_tpu.data.pipeline import Loader
    from multimodal_dataset_distillation_tpu.data import transforms as T

    if native == "raw":
        # --device_augment path: host does decode+crop+flip only;
        # RandAugment + CLIP normalization run inside the jitted step
        tf = T.make_train_transform_raw(image_size)
    elif native:
        tf = T.make_train_transform_native(image_size)
    else:
        tf = T.make_train_transform(image_size)
    ds = _BytesTrainDS(paths, tf)
    loader = Loader(ds, batch_size=batch_size, shuffle=True, drop_last=False,
                    num_workers=num_workers, seed=0)
    n = 0
    # warm epoch (thread pool spin-up, caches)
    for batch in loader:
        pass
    t0 = time.perf_counter()
    for _ in range(epochs):
        for batch in loader:
            n += batch[0].shape[0]
    dt = time.perf_counter() - t0
    return n / dt


def main():
    tmp = tempfile.mkdtemp(prefix="bench_loader_")
    paths = make_jpegs(tmp)
    for name, native in (("native_fastimage", True), ("pil_fallback", False),
                         ("raw_device_augment", "raw")):
        ips = bench_path(native, paths)
        print(json.dumps({"metric": f"loader_img_per_sec_{name}",
                          "value": round(ips, 1), "unit": "img/s (224px)",
                          "host_cores": os.cpu_count()}))


if __name__ == "__main__":
    main()
