"""Expert-trajectory buffer I/O (reference format + fast native format).

Reference format (``buffer.py:104-115``): ``img_replay_buffer_{n}.pt`` /
``txt_replay_buffer_{n}.pt`` = ``torch.save`` of a *list of trajectories*
(length 1 at HEAD, the list is cleared after each save); a trajectory is a
list of ``train_epochs+1`` snapshots; a snapshot is a list of per-parameter
CPU tensors **in ``module.parameters()`` registration order with torch
layouts** (``buffer.py:94-95``), consumed flat by straight concatenation
(``distill.py:471-476``).  Write-side collision avoidance scans for the
next free index (``buffer.py:106-108``).

This module preserves that container format bit-for-bit at the pickle
level (torch CPU is available on TPU hosts).  With a
:class:`~..models.torch_order.TorchOrderCodec` (built from the student's
parameter template), ``.pt`` files are written in **reference order**
(torch layouts, registration order) so the actual torch reference can
load them, and reads auto-detect whether a file holds reference-order or
native ravel-order snapshots by its per-tensor shape signature —
converting layouts per tensor, never blindly concatenating.  Without a
codec, writes fall back to native ravel order (still a valid container
for this framework's own round trip).

Additionally a native ``.npz`` holds the stacked flat trajectory
``(epochs+1, P)`` — mmap-friendly, 1 array instead of thousands of
tensors, what the distiller actually consumes.
"""

from __future__ import annotations

import os
from typing import Any, Callable, List, Optional, Sequence, Tuple

import jax
import numpy as np


def _leaves(snapshot: Any) -> List[np.ndarray]:
    return [np.asarray(x) for x in jax.tree_util.tree_leaves(snapshot)]


def flatten_snapshot(snapshot: Any) -> np.ndarray:
    """Snapshot pytree (or list of arrays) -> flat float32 vector."""
    return np.concatenate([x.reshape(-1).astype(np.float32)
                           for x in _leaves(snapshot)])


def stack_trajectory(trajectory: Sequence[Any]) -> np.ndarray:
    """List of snapshots -> (epochs+1, P) float32."""
    return np.stack([flatten_snapshot(s) for s in trajectory])


# ---------------------------------------------------------------------------
# native npz format
# ---------------------------------------------------------------------------

def save_trajectory_npz(path: str, trajectory: Sequence[Any]) -> None:
    np.savez(path, trajectory=stack_trajectory(trajectory))


def load_trajectory_npz(path: str) -> np.ndarray:
    with np.load(path) as z:
        return z["trajectory"]


# ---------------------------------------------------------------------------
# torch .pt interop format
# ---------------------------------------------------------------------------

def save_trajectories_pt(path: str, trajectories: Sequence[Sequence[Any]],
                         codec=None) -> None:
    """torch.save a list of trajectories of per-param tensor lists.

    With ``codec`` (a :class:`TorchOrderCodec`), snapshots are written in
    the reference's ``module.parameters()`` order and torch layouts —
    loadable by ``/root/reference/distill.py:471-476`` as-is.  Without
    one, snapshots are the native ravel-order leaf list.
    """
    import torch

    if codec is not None:
        # np.array (not ascontiguousarray, which promotes 0-d scalars
        # like skipinit_gain to 1-d and would corrupt the reference's
        # shape signature)
        payload = [[[torch.from_numpy(np.array(t, copy=True))
                     for t in codec.torch_from_flat(flatten_snapshot(snap))]
                    for snap in traj] for traj in trajectories]
    else:
        # np.array, not ascontiguousarray: the latter promotes 0-d
        # leaves (e.g. skipinit_gain) to (1,), corrupting the shape
        # signature identify() checks on read (ADVICE r4)
        payload = [[[torch.from_numpy(np.array(x, copy=True))
                     for x in _leaves(snap)] for snap in traj]
                   for traj in trajectories]
    torch.save(payload, path)


def load_trajectories_pt(path: str, codec=None) -> List[np.ndarray]:
    """Load a .pt buffer -> list of stacked flat trajectories (E+1, P).

    With ``codec``, each trajectory's snapshot order is identified from
    its per-tensor shape signature (reference torch order vs native ravel
    order) and converted accordingly; an unidentifiable signature raises
    instead of concatenating a silently permuted student.  Without a
    codec, snapshots are concatenated as stored (legacy behavior — only
    correct for files this framework wrote without a codec).
    """
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    out = []
    for ti, traj in enumerate(payload):
        snaps_np = [[t.detach().numpy() for t in snap] for snap in traj]
        if codec is not None and snaps_np:
            shapes = [tuple(t.shape) for t in snaps_np[0]]
            order = codec.identify(shapes)
            if order == "torch":
                out.append(np.stack([codec.flat_from_torch(s)
                                     for s in snaps_np]))
                continue
            if order is None:
                raise ValueError(
                    f"{path}: trajectory {ti} snapshot shape signature "
                    f"matches neither the reference torch order nor this "
                    f"framework's ravel order for the configured student "
                    f"(first stored shapes: {shapes[:4]}...; expected "
                    f"torch {codec.torch_shapes[:4]}... or native "
                    f"{codec.flax_shapes[:4]}...) — wrong tower config?")
            # order == "native": fall through to plain concatenation
        out.append(np.stack([
            np.concatenate([t.reshape(-1).astype(np.float32) for t in snap])
            for snap in snaps_np]))
    return out


# ---------------------------------------------------------------------------
# buffer directory management (buffer.py:104-115, distill.py:255-283)
# ---------------------------------------------------------------------------

def next_free_index(save_dir: str, prefix: str = "img_replay_buffer_") -> int:
    n = 0
    while (os.path.exists(os.path.join(save_dir, f"{prefix}{n}.pt"))
           or os.path.exists(os.path.join(save_dir, f"{prefix}{n}.npz"))):
        n += 1
    return n


def _auto_codec(snapshot: Any, which: str):
    """Codec from a snapshot pytree template, or None (flat snapshots,
    tower families without an orderer, unexpected structure)."""
    try:
        from collections.abc import Mapping

        from multimodal_dataset_distillation_tpu.models import torch_order

        if not isinstance(snapshot, Mapping):
            return None
        if which == "image":
            return torch_order.codec_for_image_tower(snapshot)
        return torch_order.codec_for_projection(snapshot)
    except Exception as e:  # pragma: no cover - defensive
        import warnings

        warnings.warn(f"torch-order codec derivation failed ({e}); "
                      f"writing native-order .pt", stacklevel=2)
        return None


def save_expert(save_dir: str, img_trajectory: Sequence[Any],
                txt_trajectory: Sequence[Any],
                write_pt: bool = True, write_npz: bool = True,
                index: Optional[int] = None,
                img_codec="auto", txt_codec="auto") -> int:
    """Save one expert's (img, txt) trajectories; returns the index used.

    ``index``: explicit buffer index — used by multi-host expert fan-out,
    where each process owns fixed expert ids and the next-free-index scan
    (``buffer.py:106-108``) would race across hosts on a shared FS.
    ``img_codec``/``txt_codec``: torch-order codecs for the ``.pt``
    files; the default ``"auto"`` derives them from the first snapshot's
    pytree structure, so ``.pt`` buffers land in reference
    ``module.parameters()`` order whenever the tower family supports it.
    """
    os.makedirs(save_dir, exist_ok=True)
    n = next_free_index(save_dir) if index is None else int(index)
    if img_codec == "auto":
        img_codec = _auto_codec(img_trajectory[0], "image") \
            if len(img_trajectory) else None
    if txt_codec == "auto":
        txt_codec = _auto_codec(txt_trajectory[0], "text") \
            if len(txt_trajectory) else None
    if write_pt:
        save_trajectories_pt(
            os.path.join(save_dir, f"img_replay_buffer_{n}.pt"),
            [img_trajectory], codec=img_codec)
        save_trajectories_pt(
            os.path.join(save_dir, f"txt_replay_buffer_{n}.pt"),
            [txt_trajectory], codec=txt_codec)
    if write_npz:
        save_trajectory_npz(
            os.path.join(save_dir, f"img_replay_buffer_{n}.npz"),
            img_trajectory)
        save_trajectory_npz(
            os.path.join(save_dir, f"txt_replay_buffer_{n}.npz"),
            txt_trajectory)
    return n


def discover_buffers(expert_dir: str) -> Tuple[List[str], List[str]]:
    """Scan ``{img,txt}_replay_buffer_{n}`` pairs by increasing index
    (distill.py:255-261); npz preferred when both exist."""
    img_files, txt_files = [], []
    n = 0
    while True:
        found = None
        for ext in (".npz", ".pt"):
            i = os.path.join(expert_dir, f"img_replay_buffer_{n}{ext}")
            t = os.path.join(expert_dir, f"txt_replay_buffer_{n}{ext}")
            if os.path.exists(i) and os.path.exists(t):
                found = (i, t)
                break
        if found is None:
            break
        img_files.append(found[0])
        txt_files.append(found[1])
        n += 1
    return img_files, txt_files


def load_buffer(path: str, codec=None) -> List[np.ndarray]:
    """Load one buffer file -> list of flat trajectories (E+1, P)."""
    if path.endswith(".npz"):
        return [load_trajectory_npz(path)]
    return load_trajectories_pt(path, codec=codec)
