#!/usr/bin/env python
"""Algorithmic-minimum HBM bytes for the headline distill step.

VERDICT r2 item 1's alternative done-criterion: *"a recorded measurement
showing achieved HBM bytes >= 90% of both the algorithmic-minimum bytes
and peak bandwidth (i.e. a proof the gap is hardware, not software)"*.

This computes the algorithmic side from the OPTIMIZED HLO of the step
(dump it with ``CM_HLO_OUT=/tmp/step_hlo.txt python tools/conv_map.py``
— compile-cache hit, so seconds once the program has been built once).
The optimized module is fully inlined: every ``convolution`` instruction
is executed exactly once per step, so

    conv_floor_bytes = sum over conv instrs of (|in| + |w| + |out|) x dtype

with UNPADDED logical shapes is a floor on the step's HBM traffic: each
conv must at minimum read its operands and write its result once
(elementwise chains fuse for free; operand re-reads, layout padding and
spills can only add).  The conv *set* itself is the chosen AD
orientation's — which DESIGN.md §10 shows is within ~1 forward-
equivalent of the second-order algorithm's FLOP minimum.

Output: floor bytes + floor seconds at 819 GB/s peak, and the per-shape
breakdown.  Compare against bench.py's measured step time: the ratio
floor_s / measured_s is the fraction of the bytes-roofline achieved.

Usage:
  CM_HLO_OUT=/tmp/step_hlo.txt python tools/conv_map.py   # on TPU
  python tools/bytes_floor.py /tmp/step_hlo.txt           # anywhere
"""
import collections
import json
import re
import sys

import numpy as np

DT_BYTES = {"bf16": 2, "f32": 4, "f64": 8, "f16": 2, "s32": 4, "u32": 4,
            "pred": 1, "s8": 1, "u8": 1}

SHAPE_RE = re.compile(r"(bf16|f32|f64|f16|s32|u32|pred)\[([0-9,]*)\]")


OPERANDS_RE = re.compile(r"convolution\(([^,)]+), ([^,)]+)\)")


def parse(path):
    """Two passes: the optimized-HLO text gives operands by NAME only
    (`convolution(%fusion.a, %fusion.b)`), so first build a symbol table
    of every instruction's result shape, then resolve conv operands.
    ENTRY-computation instructions carry no `%` prefix; names are
    normalized with it stripped."""
    defs = {}
    conv_lines = []
    with open(path) as f:
        for line in f:
            s = line.strip()
            if " = " not in s:
                continue
            lhs, rhs = s.split(" = ", 1)
            name = lhs.split(" ")[0].lstrip("%")
            if not name or "[" in name:
                continue
            m = SHAPE_RE.match(rhs)
            if m:
                defs[name] = (m.group(1), m.group(2))
            if re.match(r"(bf16|f32|f16|f64)\[[0-9,]*\]\S* convolution\(",
                        rhs):
                conv_lines.append(rhs)
    convs = []
    unresolved = 0
    for rhs in conv_lines:
        out = SHAPE_RE.match(rhs).groups()
        ops = OPERANDS_RE.search(rhs)
        a = defs.get(ops.group(1).strip().lstrip("%")) if ops else None
        b = defs.get(ops.group(2).strip().lstrip("%")) if ops else None
        if a is None or b is None:
            unresolved += 1
            continue
        convs.append((out, a, b))
    if unresolved:
        print(f"WARNING: {unresolved} conv instrs with unresolved operands")
    return convs


def nbytes(sh):
    dt, dims = sh
    n = 1
    for d in dims.split(","):
        if d:
            n *= int(d)
    return n * DT_BYTES[dt], n


def main():
    path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/step_hlo.txt"
    convs = parse(path)
    tot = 0
    by_class = collections.Counter()
    by_class_n = collections.Counter()
    for out, a, b in convs:
        bb = nbytes(out)[0] + nbytes(a)[0] + nbytes(b)[0]
        tot += bb
        key = (f"{out[0]}[{out[1]}]", f"{a[0]}[{a[1]}]", f"{b[0]}[{b[1]}]")
        by_class[key] += bb
        by_class_n[key] += 1
    print(f"convolution instructions in the optimized step: {len(convs)}")
    print(f"conv floor bytes: {tot/2**30:.1f} GiB -> floor time at "
          f"819 GB/s: {tot/819e9:.3f} s")
    print(f"{'count':>6} {'GiB':>7}  out <- in * weight")
    for key, b in by_class.most_common(16):
        print(f"{by_class_n[key]:6d} {b/2**30:7.2f}  {key[0]} <- "
              f"{key[1]} * {key[2]}")
    print(json.dumps({"conv_instrs": len(convs),
                      "conv_floor_gib": round(tot / 2**30, 1),
                      "conv_floor_s_at_peak": round(tot / 819e9, 3)}))


if __name__ == "__main__":
    main()
