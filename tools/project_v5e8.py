#!/usr/bin/env python
"""v5e-8 throughput projection for the headline distill step.

BASELINE's >=3x throughput target names a **v5e-8** (vs A100 PyTorch at
a derived 0.35 steps/s -> target 1.05 steps/s).  Only one v5e chip is
reachable from this host, so the 8-chip number is a PROJECTION from the
measured single-chip step — this file is the derivation, with every
assumption explicit and a sensitivity table over the uncertain ones.

Inputs (all measured on v5e-1, DESIGN.md §10 "post-fused_jvp
re-profile" of the shipped headline config — NFNet-L0 224², nq=100,
syn_steps=8, mb=100, bf16 inner compute, forward-HVP, fused_jvp):

  total step           1147 ms   (0.872 steps/s same-session)
  conv fusions          809 ms / 439 GiB
  loop fusions          146 ms   (elementwise; bandwidth-saturated)
  data formatting        81 ms   (layout transposes)
  copy/async-done        51 ms   (spill DMA, mostly overlapped)
  scheduling slack      ~60 ms   (residual to total)

Decomposition into scaling classes under data-parallel sharding of the
inner minibatch (mb=100 -> pad-and-mask 104 -> 13/chip on 8 chips) with
shard_syn query sharding (nq=100 -> 104 -> 13/chip):

* BATCH-scaling work (per-chip cost x local_batch/global_batch):
  all activation traffic.  Conv bytes are ~97% activation: the
  weight-side traffic is ~72 model sweeps x 143 MB = ~10 GiB of the
  439 GiB (every conv reads its standardized weights once per
  application; 8 inner steps x ~9 forward-equivalents).  Loop fusions
  split ~50/50 batch/param (inner activations vs flat SGD/MSE);
  formatting and spill traffic track activations.
    batch_ms = 809*0.97 + 146*0.5 + 81 + 51 + 60(slack) = 1050 ms
* FIXED work (per-chip cost independent of batch): conv weight reads
  (~24 ms), param-sided loop fusions (~73 ms).
    fixed_ms = 97 ms
  (Replicated-student SGD updates and the trajectory-MSE reduction are
  in here; the sharded synthetic-state outer update scales but is
  charged as fixed — conservative.)
* ICI collectives: per inner step the data-parallel towers psum the
  f32 param grads (img ~143 MB + txt ~28 MB) in the inner update AND
  the Hessian-action terms in the meta-backward: 8 steps x 2 x 171 MB
  = 2.7 GiB/step.  Ring all-reduce moves 2*(N-1)/N x S per chip; at a
  conservative 100 GB/s effective per-chip ICI (v5e 2x4 torus) that is
  ~48 ms, charged FULLY EXPOSED (XLA's latency-hiding scheduler in
  fact overlaps collectives with the next step's convs — §10's sweep
  showed the overlap machinery working).
* Host dispatch: ~10 ms (pipelined loop, measured single-chip).

  t8 = fixed + batch x (13/100) + ici + dispatch
     = 97 + 136.5 + 48 + 10 = 291.5 ms  ->  3.43 steps/s  (9.8x A100)

Known risks, priced in the sensitivity table below:
  R1: small-batch lane padding.  At mb=13/chip XLA may pad batch into
      sublane/lane granularity for some conv layouts (the stem class
      already pads 100->128 at full batch).  Priced as a multiplier on
      the per-chip batch term (x1.5, x2, x3 — x3 would mean per-chip
      conv efficiency WORSE than the already-padded single-chip stem).
  R2: ICI efficiency (50 GB/s effective, or zero overlap of a 2x
      volume estimate).
  R3: fixed-work growth (x1.5 — e.g. GSPMD-introduced copies around
      the replicated flat carries).

Even the worst cell (x3 batch, 50 GB/s ICI, x1.5 fixed) stays above
the 1.05 steps/s target.  Run this file for the table.
"""

import json

# measured single-chip decomposition (ms), DESIGN.md §10
BATCH_MS = 809 * 0.97 + 146 * 0.5 + 81 + 51 + 60   # = 1049.7
FIXED_MS = 809 * 0.03 + 146 * 0.5                  # = 97.3
MEASURED_TOTAL_MS = 1147.0
ICI_BYTES_PER_STEP = 8 * 2 * 171e6                 # 2.74 GB
DISPATCH_MS = 10.0
TARGET = 1.05  # steps/s = 3 x 0.35 (bench.py baseline)


def project(measured_steps_per_sec: float, n_chips: int = 8,
            local_batch: int = 13, global_batch: int = 100,
            batch_penalty: float = 1.0, ici_gbps: float = 100.0,
            fixed_penalty: float = 1.0) -> float:
    """Projected steps/s on an n-chip v5e data mesh.

    The measured step time is split by the §10 decomposition shares
    (so the projection rescales with the actual measured number rather
    than assuming 1147 ms).
    """
    t1_ms = 1000.0 / measured_steps_per_sec
    scale = t1_ms / MEASURED_TOTAL_MS
    batch = BATCH_MS * scale * (local_batch / global_batch) * batch_penalty
    fixed = FIXED_MS * scale * fixed_penalty
    ici_ms = (2 * (n_chips - 1) / n_chips * ICI_BYTES_PER_STEP
              / (ici_gbps * 1e9) * 1e3)
    return 1000.0 / (fixed + batch + ici_ms + DISPATCH_MS)


def main():
    measured = 0.869  # BENCH_r03 v5e-1 headline
    rows = []
    for bp in (1.0, 1.5, 2.0, 3.0):
        for ici in (100.0, 50.0):
            for fp in (1.0, 1.5):
                v = project(measured, batch_penalty=bp, ici_gbps=ici,
                            fixed_penalty=fp)
                rows.append({
                    "batch_penalty": bp, "ici_gbps": ici,
                    "fixed_penalty": fp,
                    "projected_v5e8_steps_per_sec": round(v, 3),
                    "vs_target_1.05": round(v / TARGET, 2),
                })
    for r in rows:
        print(json.dumps(r))
    central = project(measured)
    print(json.dumps({
        "central_projection_steps_per_sec": round(central, 3),
        "vs_a100_baseline_0.35": round(central / 0.35, 2),
        "worst_cell_steps_per_sec": min(
            r["projected_v5e8_steps_per_sec"] for r in rows),
    }))


if __name__ == "__main__":
    main()
