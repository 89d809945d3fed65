"""Visualization & artifact pipeline (distill.py:358-426 equivalents).

* nearest-neighbor decoding of synthetic text embeddings back to real
  training sentences (cosine similarity; distill.py:89-95)
* 4x nearest-neighbor-upsampled PNG grids (make_grid nrow=10, first 90,
  per-image min-max normalize i.e. ``normalize=True, scale_each=True``)
* +-2.5 sigma clipped variants (distill_original.py:324-336)
* real distilled-tensor checkpoints (npz) — fixing the reference gap where
  ``images_{it}.pt`` saves are commented out (SURVEY.md §5.4).
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

import numpy as np
from PIL import Image


def nearest_neighbor(sentences: Sequence[str], query_embeddings: np.ndarray,
                     all_embeddings: np.ndarray) -> List[str]:
    """Cosine-nearest real sentence per synthetic embedding (distill.py:89-95)."""
    q = np.asarray(query_embeddings, np.float64)
    a = np.asarray(all_embeddings, np.float64)
    qn = q / np.maximum(np.linalg.norm(q, axis=1, keepdims=True), 1e-12)
    an = a / np.maximum(np.linalg.norm(a, axis=1, keepdims=True), 1e-12)
    sims = qn @ an.T
    idx = np.argmax(sims, axis=1)
    return [sentences[i] for i in idx]


def _minmax(img: np.ndarray) -> np.ndarray:
    lo, hi = img.min(), img.max()
    return (img - lo) / (hi - lo) if hi > lo else np.zeros_like(img)


def make_grid(images: np.ndarray, nrow: int = 10, upsample: int = 4,
              pad: int = 2) -> np.ndarray:
    """NHWC float images -> uint8 grid; per-image min-max scaling and
    nearest-neighbor upsampling (distill.py:368-371)."""
    images = np.asarray(images)[:90]
    if upsample > 1:
        images = images.repeat(upsample, axis=1).repeat(upsample, axis=2)
    n, h, w, c = images.shape
    ncol = nrow
    nr = (n + ncol - 1) // ncol
    grid = np.zeros((nr * (h + pad) + pad, ncol * (w + pad) + pad, c),
                    np.float32)
    for i in range(n):
        r, col = divmod(i, ncol)
        y = r * (h + pad) + pad
        x = col * (w + pad) + pad
        grid[y:y + h, x:x + w] = _minmax(images[i])
    return (grid * 255).astype(np.uint8)


def save_visualizations(save_dir: str, it: int, image_syn: np.ndarray,
                        text_syn: np.ndarray, train_sentences: Sequence[str],
                        train_caption_embed: np.ndarray,
                        clip_vals: Sequence[float] = (2.5,),
                        save_tensors: bool = True, zca=None,
                        save_grids: bool = True, syn_lrs=None,
                        save_pt: bool = False) -> dict:
    """Write PNG grids + sentence TXT + distilled-tensor npz; returns paths.

    ``save_grids=False`` mirrors the reference's ``ipc >= 50 and not
    force_save`` gate (distill.py:368): the upsampled grid/clipped/zca PNGs
    and decoded sentences are skipped; the distilled-tensor npz (our fix
    for the reference's SURVEY §5.4 gap) is still written.
    """
    os.makedirs(save_dir, exist_ok=True)
    out = {}
    if save_pt:
        out.update(_save_torch(save_dir, it, image_syn, text_syn, zca))
    if not save_grids:
        if save_tensors:
            out["tensors"] = _save_tensors(save_dir, it, image_syn,
                                           text_syn, syn_lrs)
        return out

    grid = make_grid(image_syn)
    p = os.path.join(save_dir, f"synthetic_images_{it}.png")
    Image.fromarray(grid).save(p)
    out["grid"] = p

    sentences = nearest_neighbor(train_sentences, text_syn,
                                 train_caption_embed)[:90]
    p = os.path.join(save_dir, f"synthetic_sentences_{it}.txt")
    with open(p, "w") as f:
        f.write("\n".join(sentences))
    out["sentences"] = p

    for cv in clip_vals:
        mu, sd = float(np.mean(image_syn)), float(np.std(image_syn))
        clipped = np.clip(image_syn, mu - cv * sd, mu + cv * sd)
        p = os.path.join(save_dir,
                         f"clipped_synthetic_images_{it}_std_{cv}.png")
        Image.fromarray(make_grid(clipped)).save(p)
        out[f"clipped_{cv}"] = p

    if zca is not None:
        # reconstructed (de-whitened) variants (distill.py:407-426)
        recon = zca.inverse_transform(np.asarray(image_syn))
        p = os.path.join(save_dir, f"zca_synthetic_images_{it}.png")
        Image.fromarray(make_grid(recon)).save(p)
        out["zca_grid"] = p
        for cv in clip_vals:
            mu, sd = float(np.mean(recon)), float(np.std(recon))
            clipped = np.clip(recon, mu - cv * sd, mu + cv * sd)
            p = os.path.join(
                save_dir, f"clipped_zca_synthetic_images_{it}_std_{cv}.png")
            Image.fromarray(make_grid(clipped)).save(p)
            out[f"zca_clipped_{cv}"] = p

    if save_tensors:
        out["tensors"] = _save_tensors(save_dir, it, image_syn, text_syn,
                                       syn_lrs)
    return out


def _save_tensors(save_dir: str, it: int, image_syn, text_syn,
                  syn_lrs=None) -> str:
    """Distilled-tensor checkpoint (fixes the reference's SURVEY §5.4 gap:
    distill_original.py:292-296 commented its tensor saves out).  Includes
    the learned inner LRs when given — evaluate_synset's lr_net IS the
    learned syn_lr_img (distill.py:312), so a saved set cannot be
    re-evaluated faithfully without them."""
    p = os.path.join(save_dir, f"distilled_{it}.npz")
    extra = {}
    if syn_lrs is not None:
        extra = {"syn_lr_img": np.asarray(syn_lrs[0], np.float32),
                 "syn_lr_txt": np.asarray(syn_lrs[1], np.float32)}
    np.savez(p, image_syn=image_syn, text_syn=text_syn, **extra)
    return p


def _save_torch(save_dir: str, it: int, image_syn, text_syn,
                zca=None) -> dict:
    """Torch-format distilled artifacts (``--save_pt``): the reference's
    ``images_{it}.pt`` / ``labels_{it}.pt`` tensor saves — present but
    commented out at distill_original.py:292-296 — plus the fork's LIVE
    ``images_zca_{it}.pt`` de-whitened save (distill.py:407-410) when ZCA
    is active.  Images go out NCHW float32 (the torch convention a
    reference-side consumer expects); our canonical layout is NHWC."""
    import torch

    out = {}
    imgs = np.ascontiguousarray(
        np.asarray(image_syn, np.float32).transpose(0, 3, 1, 2))
    p = os.path.join(save_dir, f"images_{it}.pt")
    torch.save(torch.from_numpy(imgs), p)
    out["images_pt"] = p
    p = os.path.join(save_dir, f"labels_{it}.pt")
    # explicit copy: text_syn may arrive as a read-only numpy view
    # (torch.from_numpy warns on non-writable arrays)
    torch.save(torch.from_numpy(np.array(text_syn, np.float32)), p)
    out["labels_pt"] = p
    if zca is not None:
        recon = np.ascontiguousarray(np.asarray(
            zca.inverse_transform(np.asarray(image_syn)),
            np.float32).transpose(0, 3, 1, 2))
        p = os.path.join(save_dir, f"images_zca_{it}.pt")
        torch.save(torch.from_numpy(recon), p)
        out["images_zca_pt"] = p
    return out
