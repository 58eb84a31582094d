#!/usr/bin/env python
"""Summarize converted model graphs: op histogram, parameter count,
MACs, and activation footprint.  The introspection companion to
tools/convert_tflite.py (compare with SURVEY.md §2.3's op inventory).

    python tools/graph_summary.py [npz ...]   (default: all bundled)
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, "/root/repo")

from tpu_face.compiler.lowering import Graph, graph_flops  # noqa: E402

DATA = Path("/root/repo/tpu_face/data")


def summarize(path):
    g = Graph(path)
    hist = {}
    for node in g.ops:
        hist[node["op"]] = hist.get(node["op"], 0) + 1
    params = sum(int(np.prod(v.shape)) for v in g.consts.values())
    # activation footprint: sum of op-output tensor sizes (f32 elems)
    act = 0
    for node in g.ops:
        for out in node["outputs"]:
            shape = g.tensors[out]["shape"]
            act += int(np.prod(shape)) if shape else 1
    flops = graph_flops(g)
    name = Path(path).stem
    print(f"== {name} ==")
    print(f"  input {g.input_shape} -> outputs {g.output_shapes}")
    print(f"  ops: {sum(hist.values())}  "
          + " ".join(f"{k}:{v}" for k, v in sorted(hist.items())))
    print(f"  params: {params/1e6:.2f} M   conv/fc work: "
          f"{flops/1e6:.1f} MFLOP   activations: {act*4/1e6:.1f} MB f32"
          f" (per frame)")


def main():
    paths = sys.argv[1:] or sorted(str(p) for p in DATA.glob("*.npz"))
    for p in paths:
        summarize(p)


if __name__ == "__main__":
    main()
