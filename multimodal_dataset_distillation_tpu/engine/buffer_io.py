"""Expert-trajectory buffer I/O (reference format + fast native format).

Reference format (``buffer.py:104-115``): ``img_replay_buffer_{n}.pt`` /
``txt_replay_buffer_{n}.pt`` = ``torch.save`` of a *list of trajectories*
(length 1 at HEAD, the list is cleared after each save); a trajectory is a
list of ``train_epochs+1`` snapshots; a snapshot is a list of per-parameter
CPU tensors in ``module.parameters()`` order.  Write-side collision
avoidance scans for the next free index (``buffer.py:106-108``).

This module preserves that container format bit-for-bit at the pickle
level (torch CPU is available on TPU hosts) with snapshots listed in this
framework's canonical pytree-leaf order, and *additionally* writes a
native ``.npz`` with the stacked flat trajectory ``(epochs+1, P)`` —
mmap-friendly, 1 array instead of thousands of tensors, what the
distiller actually consumes.  The reader accepts either; a ``.pt`` whose
concatenated size matches the student's flat size loads even if written
by other code.
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

def save_trajectories_pt(path: str, trajectories: Sequence[Sequence[Any]]) -> None:
    """torch.save a list of trajectories of per-param tensor lists."""
    import torch

    payload = [[[torch.from_numpy(np.ascontiguousarray(x))
                 for x in _leaves(snap)] for snap in traj]
               for traj in trajectories]
    torch.save(payload, path)


def load_trajectories_pt(path: str) -> List[np.ndarray]:
    """Load a .pt buffer -> list of stacked flat trajectories (E+1, P)."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    out = []
    for traj in payload:
        out.append(np.stack([
            np.concatenate([t.detach().numpy().reshape(-1).astype(np.float32)
                            for t in snap]) for snap in traj]))
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


def save_expert(save_dir: str, img_trajectory: Sequence[Any],
                txt_trajectory: Sequence[Any],
                write_pt: bool = True, write_npz: bool = True,
                index: Optional[int] = None) -> int:
    """Save one expert's (img, txt) trajectories; returns the index used.

    ``index``: explicit buffer index — used by multi-host expert fan-out,
    where each process owns fixed expert ids and the next-free-index scan
    (``buffer.py:106-108``) would race across hosts on a shared FS.
    """
    os.makedirs(save_dir, exist_ok=True)
    n = next_free_index(save_dir) if index is None else int(index)
    if write_pt:
        save_trajectories_pt(
            os.path.join(save_dir, f"img_replay_buffer_{n}.pt"),
            [img_trajectory])
        save_trajectories_pt(
            os.path.join(save_dir, f"txt_replay_buffer_{n}.pt"),
            [txt_trajectory])
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


def load_buffer(path: str) -> List[np.ndarray]:
    """Load one buffer file -> list of flat trajectories (E+1, P)."""
    if path.endswith(".npz"):
        return [load_trajectory_npz(path)]
    return load_trajectories_pt(path)
