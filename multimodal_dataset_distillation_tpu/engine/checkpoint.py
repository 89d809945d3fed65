"""Mid-run checkpoint/resume for the outer distillation loop.

The reference has NO resume of the distillation loop — its only distilled
artifacts are PNG grids and wandb uploads (the ``images_{it}.pt`` saves
are commented out upstream, ``distill_original.py:292-296``), so a 50k-
iteration run that dies loses everything (SURVEY.md §5.4).  Here the full
:class:`~.distill.DistillState` — synthetic pixels/embeddings, both
learnable inner LRs, and all three outer optimizer (momentum) states —
plus the host-side RNG and expert-cycler cursor serialize to a single
msgpack file via ``flax.serialization``.

Format: ``distill_ckpt_{it}.msgpack`` + sidecar ``.meta.npz`` with host
cursor state.  Resume restores bit-identical outer-loop state.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional, Tuple

import flax.serialization
import jax
import numpy as np


def save_distill_checkpoint(path: str, distiller, it: int,
                            cycler=None, host_rng=None) -> str:
    """Serialize distiller state (+ cursor/rng) to ``path`` (.msgpack)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    blob = flax.serialization.to_bytes(distiller.state)
    with open(path, "wb") as f:
        f.write(blob)
    meta: Dict[str, Any] = {
        "it": it,
        "jax_rng": np.asarray(distiller.rng),
    }
    if host_rng is not None:
        st = host_rng.get_state()
        meta["np_rng_keys"] = st[1]
        meta["np_rng_pos"] = np.array([st[2], st[3]], np.int64)
        meta["np_rng_gauss"] = np.array([st[4]], np.float64)
    if cycler is not None:
        meta["file_idx"] = cycler.file_idx
        meta["expert_idx"] = cycler.expert_idx
        meta["img_files"] = np.array(cycler.img_files)
        meta["txt_files"] = np.array(cycler.txt_files)
        cst = cycler.rng.get_state()
        meta["cy_rng_keys"] = cst[1]
        meta["cy_rng_pos"] = np.array([cst[2], cst[3]], np.int64)
        meta["cy_rng_gauss"] = np.array([cst[4]], np.float64)
    np.savez(path + ".meta.npz", **meta)
    return path


def load_distill_checkpoint(path: str, distiller, cycler=None,
                            host_rng=None) -> int:
    """Restore distiller (and optionally cycler/host rng); returns ``it``."""
    with open(path, "rb") as f:
        blob = f.read()
    distiller.state = flax.serialization.from_bytes(distiller.state, blob)
    meta = dict(np.load(path + ".meta.npz", allow_pickle=False))
    distiller.rng = jax.numpy.asarray(meta["jax_rng"])
    if host_rng is not None and "np_rng_keys" in meta:
        host_rng.set_state((
            "MT19937", meta["np_rng_keys"], int(meta["np_rng_pos"][0]),
            int(meta["np_rng_pos"][1]), float(meta["np_rng_gauss"][0])))
    if cycler is not None and "file_idx" in meta:
        cycler.img_files = [str(x) for x in meta["img_files"]]
        cycler.txt_files = [str(x) for x in meta["txt_files"]]
        cycler.file_idx = int(meta["file_idx"])
        cycler.expert_idx = int(meta["expert_idx"])
        cycler.rng.set_state((
            "MT19937", meta["cy_rng_keys"], int(meta["cy_rng_pos"][0]),
            int(meta["cy_rng_pos"][1]), float(meta["cy_rng_gauss"][0])))
        cycler._load_current()
    return int(meta["it"])
