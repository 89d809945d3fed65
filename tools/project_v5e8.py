#!/usr/bin/env python
"""v5e-8 throughput projection for the headline distill step.

BASELINE's >=3x throughput target names a **v5e-8** (vs A100 PyTorch at
a derived 0.35 steps/s -> target 1.05 steps/s).  Only one v5e chip is
reachable from this host, so the 8-chip number is a PROJECTION — but as
of round 5 its dominant term is MEASURED, not assumed:

Measured mode (``tools/batch_scaling_v5e1.json``, written by
``tools/bench_batch_scaling.py`` on v5e-1):

  Under the data-parallel sharding each v5e-8 chip runs the exact
  headline program on its own shard — nq=13, mb=13 of the pad-and-masked
  104 — with flat students replicated, so a single-chip run at
  (nq=13, mb=13) IS the per-chip compute of the 8-chip step up to (a)
  the contrastive logits block being 13x13 instead of 13 rows x 104
  global columns (~0.1 ms of MXU work) and (b) pad-row masking
  arithmetic (elementwise over 13 rows) — both negligible against the
  measured 266.6 ms.  Measured rows (v5e-1, shipped headline config —
  NFNet-L0 224^2, bf16 inner, syn_steps=8, unroll=8, forward-HVP,
  fused_jvp):

      n (=nq=mb)   step_ms    steps/s
          13         266.6     3.75
          26         486.4     2.06
          52         757.6     1.32
         100        1150.7     0.869   (= the shipped headline, control)

  The n=100 control reproducing the shipped 0.869 steps/s validates the
  harness; t(13)/linear-fit(13) = 0.82 shows small-batch lane padding
  costs LESS than proportional scaling predicts (the round-4 projection
  priced this risk at x1.5-x3 — the measurement retires it).

    t8 = t13 * (current_t100 / measured_t100)   # per-chip compute
         + ici + dispatch

  ICI: per inner step the data-parallel towers psum the f32 param grads
  (img ~143 MB + txt ~28 MB) in the inner update AND the Hessian-action
  terms in the meta-backward: 8 steps x 2 x 171 MB = 2.74 GB/step.
  Ring all-reduce moves 2*(N-1)/N x S per chip; at a conservative
  100 GB/s effective per-chip ICI (v5e 2x4 torus) that is ~48 ms,
  charged FULLY EXPOSED (XLA's latency-hiding scheduler in fact
  overlaps collectives — DESIGN §10's scheduler sweep showed the
  overlap machinery working).  Host dispatch ~10 ms (pipelined loop).

    central: 1000 / (266.6 + 48 + 10) = 3.08 steps/s   (8.8x A100)
    conservative (x1.3 GSPMD-overhead penalty on per-chip compute,
    50 GB/s ICI, 20 ms dispatch): 2.17 steps/s — 2.1x the 1.05 target.

Legacy mode (no measured file): the round-4 per-class decomposition
(batch/fixed split from the §10 profile) — kept as fallback only.

Run this file for the sensitivity table.
"""

import json
import os

MEASURED_JSON = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "batch_scaling_v5e1.json")
ICI_BYTES_PER_STEP = 8 * 2 * 171e6                 # 2.74 GB
TARGET = 1.05  # steps/s = 3 x 0.35 (bench.py baseline)

# legacy round-4 decomposition (DESIGN §10) — fallback when no
# measured batch-scaling file exists
BATCH_MS = 809 * 0.97 + 146 * 0.5 + 81 + 51 + 60   # = 1049.7
FIXED_MS = 809 * 0.03 + 146 * 0.5                  # = 97.3
MEASURED_TOTAL_MS = 1147.0


def _load_measured():
    try:
        with open(MEASURED_JSON) as f:
            data = json.load(f)
        if not data.get("valid_for_projection"):
            return None
        rows = {r["n"]: r["step_ms"] for r in data["rows"]}
        if 13 in rows and 100 in rows:
            return rows
    except Exception:
        pass
    return None


def _ici_ms(n_chips: float, ici_gbps: float) -> float:
    return (2 * (n_chips - 1) / n_chips * ICI_BYTES_PER_STEP
            / (ici_gbps * 1e9) * 1e3)


def project(measured_steps_per_sec: float, n_chips: int = 8,
            local_batch: int = 13, global_batch: int = 100,
            ici_gbps: float = 100.0, compute_penalty: float = 1.0,
            dispatch_ms: float = 10.0, batch_penalty: float = None,
            fixed_penalty: float = 1.0) -> float:
    """Projected steps/s on an n-chip v5e data mesh.

    Measured mode (default when tools/batch_scaling_v5e1.json exists):
    per-chip compute = the MEASURED single-chip step at the per-chip
    shard size (n=13), rescaled by the current headline measurement so
    the projection tracks the live bench number.  ``compute_penalty``
    prices residual multi-chip compute risk (GSPMD-introduced copies
    around replicated carries, sharded-softmax overhead).

    ``batch_penalty``/``fixed_penalty`` select the legacy (assumed
    decomposition) path — kept for the sensitivity table's comparison
    row and for hosts without the measured file.
    """
    t1_ms = 1000.0 / measured_steps_per_sec
    rows = _load_measured() if batch_penalty is None else None
    if rows is not None:
        t_local = rows[local_batch] * (t1_ms / rows[global_batch])
        return 1000.0 / (t_local * compute_penalty
                         + _ici_ms(n_chips, ici_gbps) + dispatch_ms)
    # legacy decomposition
    bp = 1.0 if batch_penalty is None else batch_penalty
    scale = t1_ms / MEASURED_TOTAL_MS
    batch = BATCH_MS * scale * (local_batch / global_batch) * bp
    fixed = FIXED_MS * scale * fixed_penalty
    return 1000.0 / (fixed + batch + _ici_ms(n_chips, ici_gbps)
                     + dispatch_ms)


def main():
    measured = 0.869  # v5e-1 headline (BENCH_r04; n=100 control row)
    rows = _load_measured()
    print(json.dumps({"measured_rows_found": bool(rows),
                      "rows": rows}))
    out = []
    for cp in (1.0, 1.15, 1.3):
        for ici in (100.0, 50.0):
            for dm in (10.0, 20.0):
                v = project(measured, compute_penalty=cp, ici_gbps=ici,
                            dispatch_ms=dm)
                out.append({
                    "compute_penalty": cp, "ici_gbps": ici,
                    "dispatch_ms": dm,
                    "projected_v5e8_steps_per_sec": round(v, 3),
                    "vs_target_1.05": round(v / TARGET, 2),
                })
    for r in out:
        print(json.dumps(r))
    central = project(measured)
    legacy = project(measured, batch_penalty=1.0)
    print(json.dumps({
        "central_projection_steps_per_sec": round(central, 3),
        "vs_a100_baseline_0.35": round(central / 0.35, 2),
        "worst_cell_steps_per_sec": min(
            r["projected_v5e8_steps_per_sec"] for r in out),
        "legacy_decomposition_central": round(legacy, 3),
    }))


if __name__ == "__main__":
    main()
