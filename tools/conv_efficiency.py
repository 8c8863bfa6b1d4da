"""Join trace op times with per-fusion conv FLOPs from the compiled HLO.

Answers "which convolutions run below MXU peak, and by how much" for the
flagship b128 bf16 step — the targeting data for kernel-level optimization.

Usage:
  python tools/conv_efficiency.py <xplane.pb> <hlo.txt> [steps]
Prints one JSON line per conv fusion: measured ms/step, conv FLOPs,
achieved TFLOP/s, % of v5e bf16 peak (197 TFLOP/s), sorted by wasted ms.
"""

import json
import re
import sys
from collections import defaultdict

PEAK = 197e12


def hlo_conv_flops(hlo_path):
    """fusion name -> (flops, conv description) for fusions containing a
    convolution; also direct convolution instructions."""
    with open(hlo_path) as f:
        text = f.read()

    # map fused_computation name -> conv flops inside it
    comp_flops = {}
    comp_desc = {}
    for comp in re.split(r"\n(?=%?\w[\w.\-]* \([^)]*\) -> )", text):
        header = comp.split("\n", 1)[0]
        m = re.match(r"%?([\w.\-]+) \(", header)
        if not m:
            continue
        cname = m.group(1)
        flops = 0
        descs = []
        for cm in re.finditer(
            r"convolution\(|(\S+) = (\w+)\[([\d,]+)\][^ ]* convolution\(", comp
        ):
            pass
        for line in comp.split("\n"):
            if " convolution(" not in line:
                continue
            om = re.search(r"= \w+\[([\d,]+)\]", line)
            shapes = re.findall(r"\w+\[([\d,]+)\]\{", line)
            dm = re.search(r"dim_labels=(\S+?)[,}]", line)
            wm = re.search(r"window={([^}]*)}", line)
            if not om or len(shapes) < 3:
                continue
            out = [int(v) for v in om.group(1).split(",")]
            # operand shapes: first after '(' is lhs, second rhs
            lhs = [int(v) for v in shapes[1].split(",")]
            rhs = [int(v) for v in shapes[2].split(",")]
            # contraction size: product(rhs) / rhs_out_features.
            # dim_labels like b01f_01io->b01f or transposed variants; the
            # output feature count appears in out; contraction = prod(rhs)/F
            # where F = the rhs dim matching "o"
            labels = dm.group(1) if dm else "b01f_01io->b01f"
            rhs_labels = labels.split("_")[1].split("->")[0]
            o_pos = rhs_labels.index("o")
            f_out = rhs[o_pos]
            k = 1
            for v in rhs:
                k *= v
            k //= max(f_out, 1)
            n_out = 1
            for v in out:
                n_out *= v
            flops += 2 * n_out * k
            descs.append(f"out{out} rhs{rhs}")
        if flops:
            comp_flops[cname] = flops
            comp_desc[cname] = "; ".join(descs)

    # map instruction name -> computation it calls
    inst = {}
    for m in re.finditer(
        r"%([\w.\-]+) = \S+ fusion\([^\n]*?calls=%([\w.\-]+)", text
    ):
        if m.group(2) in comp_flops:
            inst[m.group(1)] = (comp_flops[m.group(2)], comp_desc[m.group(2)])
    return inst


def trace_times(xplane_path, steps):
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    with open(xplane_path, "rb") as f:
        xs.ParseFromString(f.read())
    agg = defaultdict(float)
    for plane in xs.planes:
        if "TPU" not in plane.name:
            continue
        ev_names = {k: v.name for k, v in plane.event_metadata.items()}
        for line in plane.lines:
            if line.name != "XLA Ops":
                continue
            for ev in line.events:
                name = ev_names.get(ev.metadata_id, "")
                op = name.split(" = ")[0].lstrip("%")
                agg[op] += ev.duration_ps / 1e9 / steps
    return agg


def main():
    xplane, hlo = sys.argv[1], sys.argv[2]
    steps = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    flops = hlo_conv_flops(hlo)
    times = trace_times(xplane, steps)
    rows = []
    conv_ms = other_ms = 0.0
    for op, ms in times.items():
        if op in flops:
            fl, desc = flops[op]
            ideal = fl / PEAK * 1e3
            rows.append((ms - ideal, ms, fl, desc, op))
            conv_ms += ms
        else:
            other_ms += ms
    rows.sort(reverse=True)
    for wasted, ms, fl, desc, op in rows[:25]:
        print(json.dumps({
            "op": op, "ms": round(ms, 2), "gflop": round(fl / 1e9, 1),
            "tflops": round(fl / ms / 1e9, 1), "pct_peak": round(fl / (ms / 1e3) / PEAK * 100, 1),
            "wasted_ms": round(wasted, 2), "conv": desc[:90],
        }))
    print(json.dumps({"conv_ms": round(conv_ms, 2), "non_conv_ms": round(other_ms, 2),
                      "ideal_conv_ms": round(sum(f / PEAK * 1e3 for f, _ in flops.values()), 2)}))


if __name__ == "__main__":
    main()
