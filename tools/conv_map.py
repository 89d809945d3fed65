#!/usr/bin/env python
"""Join the captured profile trace with the optimized HLO: which conv
SHAPES do the slow kernels compute?

DESIGN.md §10 ends at "remaining software headroom is in the conv
kernels themselves" — ~35% of conv-fusion time runs under 500 GB/s in
small-per-call kernels.  This tool AOT-compiles the headline step
(compile-cache hit), parses ``compiled.as_text()`` to map every fusion
instruction to the convolution ops it contains (operand shapes, window,
feature_group_count), then aggregates the trace's per-kernel time/bytes
by conv signature.  Output: the table that says whether the slow class
is the grouped 3x3s, the 1x1s, the stem, or the tangent convs.

Usage: python tools/conv_map.py [trace_dir]   (default /tmp/profile_step)
Env: CM_HLO_OUT=/tmp/step_hlo.txt to also dump the HLO text.
"""
import collections
import glob
import gzip
import json
import os
import re
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_compiled():
    import jax

    from multimodal_dataset_distillation_tpu.config import Config
    from multimodal_dataset_distillation_tpu.engine.distill import Distiller
    from multimodal_dataset_distillation_tpu.engine.expert import init_bi_encoder
    from multimodal_dataset_distillation_tpu.models.clip_model import build_bi_encoder
    from multimodal_dataset_distillation_tpu.parallel.mesh import (
        setup_compilation_cache,
    )
    from multimodal_dataset_distillation_tpu.utils.flat import flatten_params

    setup_compilation_cache()
    cfg = Config(image_encoder="nfnet", image_size=224, num_queries=100,
                 syn_steps=8, mini_batch_size=100, expert_epochs=1,
                 lr_img=1000.0, lr_txt=1000.0, lr_lr=1e-2,
                 lr_teacher_img=0.1, lr_teacher_txt=0.1, seed=0,
                 inner_dtype="bfloat16", scan_unroll=8, hvp_mode="forward")
    model = build_bi_encoder(cfg)
    variables = init_bi_encoder(model, cfg)
    rng = np.random.RandomState(0)
    d = Distiller(cfg, model, variables,
                  rng.randn(100, 224, 224, 3).astype(np.float32),
                  rng.randn(100, 768).astype(np.float32))
    img_flat, _ = flatten_params(variables["params"]["image_encoder"])
    txt_flat, _ = flatten_params(variables["params"]["text_projection"])
    i0 = np.asarray(img_flat)
    t0 = np.asarray(txt_flat)
    traj_i = d.put_trajectory(np.stack([i0, i0 * 1.01]))
    traj_t = d.put_trajectory(np.stack([t0, t0 * 1.01]))
    import jax.numpy as jnp

    idx = jnp.asarray(d.sample_indices(rng))
    compiled = d._step_traj.lower(
        d.state, traj_i, traj_t, np.int32(0), idx,
        jax.random.PRNGKey(0)).compile()
    return compiled


# fusion instruction: %name = ... fusion(...), kind=..., calls=%comp
FUSION_RE = re.compile(
    r"[%]?([\w.\-]+) = [^=]*fusion\(.*calls=([\w.\-]+)")
CONV_RE = re.compile(
    r"convolution\(|convolution[\w.\-]* = ")

SHAPE_TOK = re.compile(r"(bf16|f32|f16|f64|s32|u32)\[([0-9,]*)\]")


def _numel(dims):
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n


CONV_OPERANDS_RE = re.compile(r"convolution\(([^,)]+), ([^,)]+)\)")


def _conv_flops(out_dims, w_dims, dim_labels):
    """FLOPs of one HLO convolution: 2 * |out| * (per-output fan-in),
    fan-in = |rhs operand| / (its output-feature dim).  Works for
    grouped/batch-grouped and AD-transposed convs alike.  Operand dims
    come from the symbol table (the optimized-HLO text prints conv
    operands by NAME only — matching on the conv line itself silently
    yields 0 FLOPs, a bug a round-3 review caught)."""
    if not out_dims or not w_dims:
        return 0
    w_list = [int(d) for d in w_dims.split(",") if d]
    try:
        rlabels = dim_labels.split("_")[1].split("->")[0]
        o_dim = rlabels.index("o")
        fan_in = _numel(w_dims) // max(w_list[o_dim], 1)
    except (IndexError, ValueError):
        fan_in = _numel(w_dims)
    return 2 * _numel(out_dims) * fan_in


def parse_hlo(text):
    """Map fusion instruction name -> list of conv signatures inside its
    called computation; also direct (unfused) convolution instrs."""
    comp_convs = collections.defaultdict(list)   # computation -> [raw sig]
    fusion_calls = {}                            # instr name -> computation
    defs = {}                                    # (comp, name) -> dims
    cur_comp = None
    for line in text.splitlines():
        if line and not line[0].isspace():
            m = re.match(r"(?:ENTRY )?[%]?([\w.\-]+)", line)
            if m:
                cur_comp = m.group(1)
            continue
        s = line.strip()
        if " = " not in s:
            continue
        name, rhs = s.split(" = ", 1)
        name = name.split(" ")[0].lstrip("%")
        sh = SHAPE_TOK.match(rhs)
        if sh:
            defs[(cur_comp, name)] = sh.group(2)
        if " fusion(" in rhs or rhs.startswith("fusion("):
            m = re.search(r"calls=[%]?([\w.\-]+)", rhs)
            if m:
                fusion_calls[name] = m.group(1)
        elif " convolution(" in rhs or rhs.startswith("convolution("):
            # out shape is the first token; window + fgc in the config
            out_shape = rhs.split(" ", 1)[0]
            w = re.search(r"window=\{([^}]*)\}", rhs)
            dnums = re.search(r"dim_labels=(\S+?)[,}]", rhs)
            fgc = re.search(r"feature_group_count=(\d+)", rhs)
            bgc = re.search(r"batch_group_count=(\d+)", rhs)
            ops = CONV_OPERANDS_RE.search(rhs)
            rhs_op = (ops.group(2).strip().lstrip("%") if ops else None)
            comp_convs[cur_comp].append((
                out_shape,
                w.group(1) if w else "",
                dnums.group(1) if dnums else "",
                int(fgc.group(1)) if fgc else 1,
                int(bgc.group(1)) if bgc else 1,
                (cur_comp, rhs_op)))
    # second pass: resolve operand shapes -> FLOPs (defs are complete now)
    unresolved = 0
    for comp, sigs in comp_convs.items():
        for i, sig in enumerate(sigs):
            out_shape, win, dn, fgc, bgc, op_key = sig
            w_dims = defs.get(op_key)
            if w_dims is None:
                unresolved += 1
            out_m = SHAPE_TOK.match(out_shape)
            fl = _conv_flops(out_m.group(2) if out_m else "", w_dims or "",
                             dn)
            sigs[i] = (out_shape, win, dn, fgc, bgc, fl)
    if unresolved:
        print(f"WARNING: {unresolved} convs with unresolved weight operand "
              f"(FLOPs undercounted)")
    kernel_convs = {}
    for instr, comp in fusion_calls.items():
        if comp in comp_convs:
            kernel_convs[instr] = comp_convs[comp]
    return kernel_convs


def main():
    trace_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/profile_step"
    if os.environ.get("CM_HLO_IN"):
        # offline mode: parse a previously-dumped HLO (CM_HLO_OUT) so the
        # analysis can be re-run without a TPU compile
        with open(os.environ["CM_HLO_IN"]) as f:
            text = f.read()
    else:
        compiled = build_compiled()
        text = compiled.as_text()
    if os.environ.get("CM_HLO_OUT"):
        with open(os.environ["CM_HLO_OUT"], "w") as f:
            f.write(text)
    kernel_convs = parse_hlo(text)
    n_conv_kernels = len(kernel_convs)
    print(f"HLO: {n_conv_kernels} fusions contain convolutions",
          file=sys.stderr)

    traces = sorted(glob.glob(os.path.join(
        trace_dir, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(traces[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    tids = {e["tid"]: e["args"].get("name") for e in ev
            if e.get("ph") == "M" and e.get("name") == "thread_name"
            and e.get("pid") == 3}
    opthreads = {t for t, n in tids.items() if n == "XLA Ops"}
    k = 2  # steps in the capture
    by_sig_t = collections.Counter()
    by_sig_b = collections.Counter()
    by_sig_n = collections.Counter()
    by_sig_f = collections.Counter()
    by_sig_mxu = collections.Counter()
    unmatched_t = 0
    # per-kernel roofline floor over the WHOLE program:
    #   floor_k = max(bytes_k / 819 GB/s, model_flops_k / 197 TFLOPS)
    # Sum(floor_k) is the time this exact program (XLA's kernel set and
    # its measured per-kernel bytes) cannot beat on a v5e even with
    # perfect kernels — the denominator for "fraction of the per-kernel
    # roofline achieved" (VERDICT r2 item 1 alternative criterion).
    # FLOPs come from the profiler's own per-event `model_flops` (XLA
    # cost analysis — correct for dilated/grouped/AD-transposed convs;
    # an earlier hand-rolled |out|*fan_in formula overcounted dilated
    # convs 4x and pushed the "floor" above measured time).
    HBM_PEAK, MXU_PEAK = 819e9, 197e12
    floor_us = meas_us = floor_conv_us = meas_conv_us = 0.0
    mxu_limited_us = 0.0
    for e in ev:
        if not (e.get("ph") == "X" and e.get("pid") == 3
                and e.get("tid") in opthreads):
            continue
        a = e.get("args", {})
        cat = a.get("hlo_category", "")
        name = e.get("name", "?")
        dur = e.get("dur", 0)
        byts = int(a.get("bytes_accessed", 0) or 0)
        flops = int(a.get("model_flops", 0) or 0)
        convs = kernel_convs.get(name)
        fl = max(byts / HBM_PEAK, flops / MXU_PEAK) * 1e6
        floor_us += fl
        meas_us += dur
        if flops / MXU_PEAK > byts / HBM_PEAK:
            mxu_limited_us += fl
        if cat == "convolution fusion":
            floor_conv_us += fl
            meas_conv_us += dur
            if convs is None:
                unmatched_t += dur
                continue
            sig = tuple(sorted(collections.Counter(convs).items()))
            by_sig_t[sig] += dur
            by_sig_b[sig] += byts
            by_sig_n[sig] += 1
            by_sig_f[sig] += fl
            if flops / MXU_PEAK > byts / HBM_PEAK:
                by_sig_mxu[sig] += fl
    print(f"\n== per-kernel roofline floor (819 GB/s HBM, 197 TFLOPS bf16) ==")
    print(f"all kernels : floor {floor_us/k/1e3:7.0f} ms/step   measured "
          f"{meas_us/k/1e3:7.0f} ms/step   achieved "
          f"{floor_us/max(meas_us, 1):5.1%}")
    print(f"conv fusions: floor {floor_conv_us/k/1e3:7.0f} ms/step   measured "
          f"{meas_conv_us/k/1e3:7.0f} ms/step   achieved "
          f"{floor_conv_us/max(meas_conv_us,1):5.1%}")
    print(f"MXU-limited share of the floor: {mxu_limited_us/k/1e3:.0f} ms/step")

    tot = sum(by_sig_t.values())
    print(f"\nmatched conv-fusion time: {tot/k/1e3:.0f} ms/step "
          f"(unmatched {unmatched_t/k/1e3:.0f} ms)")
    print(f"{'ms/st':>7} {'GiB':>6} {'GB/s':>5} {'ach%':>5} {'mxu':>4} "
          f"{'x':>5}  convs inside")
    for sig, us in by_sig_t.most_common(40):
        b = by_sig_b[sig]
        gbps = (b / 2**30 * 1.074) / (us / 1e6) if us else 0
        ach = by_sig_f[sig] / max(us, 1)
        mxu_share = by_sig_mxu[sig] / max(by_sig_f[sig], 1)
        desc = "; ".join(
            f"{c}x {shape} fgc={fgc}" + (f" bgc={bgc}" if bgc > 1 else "")
            + (f" win[{win[:40]}]" if win else "")
            for (shape, win, dn, fgc, bgc, fl), c in sig)
        print(f"{us/k/1e3:7.1f} {b/k/2**30:6.1f} {gbps:5.0f} {ach:5.0%} "
              f"{'MXU' if mxu_share > 0.5 else '':>4} "
              f"{by_sig_n[sig]//k:5d}  {desc[:120]}")


if __name__ == "__main__":
    main()
