#!/usr/bin/env python
"""COCO-scale retrieval-eval timing (run on TPU; round-3 VERDICT item 3).

Measures, at the COCO eval shape (5,000 images x 25,010 texts,
k_test=128; reference ``epoch_original.py:94-105`` / the fork's rewrite
``epoch.py:103-215``):

  1. scoring: the XLA matmul + two-pass top-k mask, both directions
     (this measurement retired the Pallas fused scoring kernel —
     DESIGN.md §6).
  2. ranking: the reference's per-row Python argsort loop vs the
     vectorized numpy broadcast formula vs the on-device rank kernel
     (with and without the host score-matrix pull each needs).

Prints a JSON lines table.  Everything uses random normalized
embeddings — ranks/metrics are shape-faithful, values meaningless.
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_IMG = int(os.environ.get("BE_IMG", 5000))
N_TXT = int(os.environ.get("BE_TXT", 25010))
DIM = int(os.environ.get("BE_DIM", 2304))
K = int(os.environ.get("BE_K", 128))
REPS = int(os.environ.get("BE_REPS", 3))


def _force(x):
    """Materialize one element to host — the reliable sync over the
    remote-TPU tunnel (timing immediately after an in-process compile
    has produced impossible sub-MXU-bound numbers with
    block_until_ready alone; see tools/roofline_expert.py note)."""
    import numpy as _np

    if hasattr(x, "ravel"):
        _np.asarray(x.ravel()[0])
    return x


def timeit(fn, reps=REPS):
    _force(fn())  # warmup/compile
    _force(fn())
    t0 = time.perf_counter()
    for _ in range(reps):
        out = _force(fn())
    return (time.perf_counter() - t0) / reps, out


def main():
    import jax
    import jax.numpy as jnp

    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )

    setup_compilation_cache()

    from multimodal_dataset_distillation_tpu.engine.eval import (
        _ranks_desc,
        _ranks_desc_device,
        topk_score_matrix,
    )
    from multimodal_dataset_distillation_tpu.ops.contrastive import (
        FIXED_LOGIT_SCALE,
    )

    rng = np.random.RandomState(0)
    img = rng.randn(N_IMG, DIM).astype(np.float32)
    txt = rng.randn(N_TXT, DIM).astype(np.float32)
    img /= np.linalg.norm(img, axis=1, keepdims=True)
    txt /= np.linalg.norm(txt, axis=1, keepdims=True)
    jimg, jtxt = jnp.asarray(img), jnp.asarray(txt)

    # ---- 1. scoring ----
    @jax.jit
    def xla_score(a, b):
        sims = FIXED_LOGIT_SCALE * jnp.dot(a, b.T,
                                           preferred_element_type=jnp.float32)
        return topk_score_matrix(sims, K)

    dt, i2t_x = timeit(lambda: jax.block_until_ready(xla_score(jimg, jtxt)))
    print(json.dumps({"op": "score_i2t_xla", "ms": round(dt * 1e3, 1)}),
          flush=True)
    dt, t2i_x = timeit(lambda: jax.block_until_ready(xla_score(jtxt, jimg)))
    print(json.dumps({"op": "score_t2i_xla", "ms": round(dt * 1e3, 1)}),
          flush=True)

    # (The Pallas fused scoring kernel this tool once A/B'd was removed
    # in round 4 — it could not compile at the COCO scale it targeted
    # while the XLA path above runs in <1 ms; DESIGN.md §6 keeps the
    # measurement record.)

    # ---- 2. ranking (t2i direction: 25k rows, the expensive one) ----
    targets = rng.randint(0, N_IMG, size=N_TXT)
    jt = jnp.asarray(targets)

    # host pull cost (what the device path avoids)
    dt, t2i_host = timeit(lambda: np.asarray(t2i_x), reps=1)
    print(json.dumps({"op": "host_pull_t2i_500MB", "ms": round(dt * 1e3, 1)}),
          flush=True)

    def loop_ranks():
        ranks = np.zeros(N_TXT)
        for i in range(N_TXT):
            inds = np.argsort(t2i_host[i])[::-1]
            ranks[i] = np.where(inds == targets[i])[0][0]
        return ranks

    dt, r_loop = timeit(loop_ranks, reps=1)
    print(json.dumps({"op": "rank_t2i_reference_loop", "ms": round(dt * 1e3, 1)}),
          flush=True)

    dt, r_vec = timeit(lambda: _ranks_desc(t2i_host, targets), reps=1)
    print(json.dumps({"op": "rank_t2i_vectorized_numpy", "ms": round(dt * 1e3, 1)}),
          flush=True)

    dt, r_dev = timeit(lambda: np.asarray(_ranks_desc_device(t2i_x, jt)))
    print(json.dumps({"op": "rank_t2i_device", "ms": round(dt * 1e3, 1)}),
          flush=True)

    # agreement (ties in the -100 block mean loop-vs-stable order can
    # differ below rank K; compare only where it matters for R@10)
    agree = np.mean((r_vec < 10) == (r_loop < 10))
    np.testing.assert_array_equal(np.asarray(r_dev), r_vec)
    print(json.dumps({"op": "rank_agreement_R@10", "frac": float(agree)}),
          flush=True)


if __name__ == "__main__":
    main()
