"""ExpertCycler cache/prefetch property tests (VERDICT r3 weak #7).

The device-trajectory cache uses MRU-excluding-newest eviction with a
one-slot prefetch budget (engine/distill.py ExpertCycler).  These tests
drive randomized advance/restore sequences and assert the two invariants
the policy promises:

  1. budget:   len(device_cache) + len(pending) <= cap, always;
  2. identity: every segment served by the cached/prefetching cycler is
     bit-identical to an uncached oracle cycler walking the same
     cursors with the same seed (wrong-trajectory reuse is the failure
     mode the stable (file, expert) keys exist to prevent).
"""

import os

import numpy as np
import pytest

from multimodal_dataset_distillation_tpu.engine.buffer_io import (
    save_trajectories_pt,
)
from multimodal_dataset_distillation_tpu.engine.distill import ExpertCycler

torch = pytest.importorskip("torch")  # .pt files hold >1 expert per file


def _make_buffers(tmp_path, n_files, experts_per_file, epochs=3, p=6):
    """Each trajectory's values encode (file, expert, epoch) uniquely."""
    img_files, txt_files = [], []
    for f in range(n_files):
        trajs, ttrajs = [], []
        for e in range(experts_per_file):
            base = 1000.0 * f + 10.0 * e
            trajs.append([[np.full(p, base + ep, np.float32)]
                          for ep in range(epochs)])
            ttrajs.append([[np.full(p // 2, base + ep + 0.5, np.float32)]
                           for ep in range(epochs)])
        ip = os.path.join(tmp_path, f"img_replay_buffer_{f}.pt")
        tp = os.path.join(tmp_path, f"txt_replay_buffer_{f}.pt")
        save_trajectories_pt(ip, trajs)
        save_trajectories_pt(tp, ttrajs)
        img_files.append(ip)
        txt_files.append(tp)
    return img_files, txt_files


def _restore_into(src, dst):
    """Copy cursor + rng state src -> dst (what checkpoint restore does,
    engine/checkpoint.py load_distill_checkpoint)."""
    dst.img_files = list(src.img_files)
    dst.txt_files = list(src.txt_files)
    dst.file_idx = src.file_idx
    dst.expert_idx = src.expert_idx
    dst.rng.set_state(src.rng.get_state())
    dst._load_current()


@pytest.mark.parametrize("case", [
    # (n_files, experts_per_file, cap, load_all, steps)
    (3, 2, 2, False, 40),
    (4, 3, 4, True, 60),
    (2, 5, 3, True, 50),
    (5, 1, 2, False, 40),
    (1, 4, 4, True, 30),
])
def test_cache_budget_and_identity(tmp_path, case):
    n_files, epf, cap, load_all, steps = case
    img_files, txt_files = _make_buffers(tmp_path, n_files, epf)
    kw = dict(max_start_epoch=2, expert_epochs=1, seed=7, load_all=load_all)
    cached = ExpertCycler(img_files, txt_files, device_cache_cap=cap,
                          prefetch=True, **kw)
    oracle = ExpertCycler(img_files, txt_files, device_cache_cap=0,
                          prefetch=False, **kw)
    rng = np.random.RandomState(123)
    try:
        for step in range(steps):
            if rng.rand() < 0.1:
                # simulated checkpoint restore: cursors jump; the stale-
                # prefetch reap must keep the budget invariant
                _restore_into(oracle, cached)
            img_c, txt_c, start_c = cached.next_segment_device()
            img_o, txt_o, start_o = oracle.next_segment_device()
            # identity: same cursors + same rng stream -> same segment
            assert start_c == start_o
            np.testing.assert_array_equal(np.asarray(img_c),
                                          np.asarray(img_o))
            np.testing.assert_array_equal(np.asarray(txt_c),
                                          np.asarray(txt_o))
            # budget: cache plus in-flight prefetches never exceeds cap
            total = len(cached._device_cache) + len(cached._pending)
            assert total <= cap, (
                f"step {step}: cache={len(cached._device_cache)} "
                f"pending={len(cached._pending)} > cap={cap}")
            # the just-served entry is cached (cap >= 1)
            assert cached._last_key in cached._device_cache
    finally:
        cached.close()
        oracle.close()


def test_cache_disabled_serves_correct_segments(tmp_path):
    img_files, txt_files = _make_buffers(tmp_path, 2, 2)
    kw = dict(max_start_epoch=2, expert_epochs=1, seed=3)
    c0 = ExpertCycler(img_files, txt_files, device_cache_cap=0,
                      prefetch=False, **kw)
    c1 = ExpertCycler(img_files, txt_files, device_cache_cap=0,
                      prefetch=True, **kw)  # prefetch needs cap>=2: no-op
    try:
        assert c1._prefetch_pool is None
        for _ in range(10):
            a = c0.next_segment_device()
            b = c1.next_segment_device()
            np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
            assert len(c0._device_cache) == 0
    finally:
        c0.close()
        c1.close()


def test_full_rotation_visits_every_expert(tmp_path):
    """One full pass serves each (file, expert) exactly once before any
    repeats (the reference's cursor walk, distill.py:450-465)."""
    img_files, txt_files = _make_buffers(tmp_path, 3, 2)
    cyc = ExpertCycler(img_files, txt_files, max_start_epoch=2,
                       expert_epochs=1, seed=0, device_cache_cap=2,
                       prefetch=True)
    try:
        seen = []
        for _ in range(6):
            img, _txt, _s = cyc.next_segment_device()
            # first element encodes 1000*file + 10*expert (+epoch 0..2)
            seen.append(int(np.asarray(img)[0, 0]) // 10 * 10)
        assert len(set(seen)) == 6
    finally:
        cyc.close()
