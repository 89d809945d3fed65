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
        # logical query count: state.image_syn may carry mesh-dependent
        # padding rows (shard_syn pad-and-mask); recorded so resume onto
        # a different mesh can strip/re-pad instead of silently carrying
        # stale pad rows or failing with an opaque sharding error
        "n_queries": int(distiller.n_queries),
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


def _repad_syn_rows(distiller, state):
    """Reconcile mesh-dependent padding rows between checkpoint and run.

    ``state.image_syn``/``text_syn`` (and their momentum buffers) carry
    ``n_queries + pad`` rows where ``pad`` depends on the mesh the run was
    sharded over (``Distiller._syn_pad``).  ``flax.serialization.from_bytes``
    restores whatever shapes the blob holds with no validation, so a
    checkpoint written on an 8-device mesh (pad 4 for nq=100) resumed on a
    single device would silently carry stale pad rows, and the reverse
    would fail later with an opaque non-divisible-sharding error at step
    time (ADVICE r4).  Strip the saved pad and re-pad with inert zero rows
    to the current distiller's padded shape; pad rows are never indexed
    and receive zero meta-gradient, so this is exact.
    """
    n = distiller.n_queries
    rows_saved = int(np.shape(state.image_syn)[0])
    pad_saved = rows_saved - n
    if pad_saved < 0:
        raise ValueError(
            f"checkpoint synthetic set has {rows_saved} rows but this run "
            f"is configured for num_queries={n} — wrong checkpoint?")
    pad_now = getattr(distiller, "_syn_pad", 0)
    if pad_saved == pad_now:
        return state

    def repad(x):
        if (getattr(x, "ndim", 0) >= 1
                and np.shape(x)[0] == rows_saved):
            x = np.asarray(x)[:n]
            if pad_now:
                x = np.concatenate(
                    [x, np.zeros((pad_now,) + x.shape[1:], x.dtype)])
        return x

    return jax.tree_util.tree_map(repad, state)


def load_distill_checkpoint(path: str, distiller, cycler=None,
                            host_rng=None) -> int:
    """Restore distiller (and optionally cycler/host rng); returns ``it``."""
    with open(path, "rb") as f:
        blob = f.read()
    state = flax.serialization.from_bytes(distiller.state, blob)
    meta = dict(np.load(path + ".meta.npz", allow_pickle=False))
    if "n_queries" in meta and int(meta["n_queries"]) != distiller.n_queries:
        raise ValueError(
            f"checkpoint was written with num_queries="
            f"{int(meta['n_queries'])} but this run is configured for "
            f"num_queries={distiller.n_queries}")
    state = _repad_syn_rows(distiller, state)
    if getattr(distiller, "_syn_shardings", None) is not None:
        sh_img, sh_txt = distiller._syn_shardings
        rows = distiller.n_queries + getattr(distiller, "_syn_pad", 0)

        def place(x):
            shp = np.shape(x)
            if len(shp) >= 1 and shp[0] == rows:
                return jax.device_put(
                    x, sh_img if len(shp) == 4 else sh_txt)
            return x

        state = jax.tree_util.tree_map(place, state)
    distiller.state = state
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
