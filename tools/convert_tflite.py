#!/usr/bin/env python
"""Offline converter: .tflite flatbuffer -> (graph JSON + weight arrays) .npz.

This is the only place TensorFlow is used. The runtime library
(``tpu_face``) loads the converted artifacts and never touches TFLite.

Conversion folds away interpreter-only ops so the runtime graph is pure
compute (reference op inventory: SURVEY.md section 2.3):

* ``DEQUANTIZE`` of fp16 constants  -> constants dequantized once to f32
  (mirrors the reference's TFLite fp16 path, face_detection weights).
* ``DENSIFY`` of sparse constants   -> densified once by decoding the
  flatbuffer sparsity metadata (dense dims + CSR innermost dim).

Usage:
    python tools/convert_tflite.py <model.tflite> <out.npz>
    python tools/convert_tflite.py --all <models_dir> <out_dir>
"""

import json
import sys
from pathlib import Path

import numpy as np

from tensorflow.lite.python import schema_py_generated as schema_fb

# TensorType enum -> numpy dtype
_DTYPES = {
    0: np.float32,  # FLOAT32
    1: np.float16,  # FLOAT16
    2: np.int32,    # INT32
    3: np.uint8,    # UINT8
    4: np.int64,    # INT64
    9: np.int8,     # INT8
}

# BuiltinOperator codes we understand (subset needed by the face models).
_OP_NAMES = {v: k for k, v in vars(schema_fb.BuiltinOperator).items()
             if isinstance(v, int)}

_ACT_NAMES = {
    0: "NONE",
    1: "RELU",
    2: "RELU_N1_TO_1",
    3: "RELU6",
    4: "TANH",
    5: "SIGN_BIT",
}

_PAD_NAMES = {0: "SAME", 1: "VALID"}


def _sparse_vector(tab, vtype):
    """Unpack a SparseIndexVector union (segments / indices arrays)."""
    cls = {1: schema_fb.Int32Vector, 2: schema_fb.Uint16Vector,
           3: schema_fb.Uint8Vector}[vtype]
    v = cls()
    v.Init(tab.Bytes, tab.Pos)
    return v.ValuesAsNumpy().astype(np.int64)


def _densify(sparsity, shape, values):
    """Decode TFLite sparse storage (dense dims + CSR dims, no blocks)."""
    n = sparsity.TraversalOrderLength()
    order = [sparsity.TraversalOrder(j) for j in range(n)]
    assert sparsity.BlockMapLength() == 0, "block-sparse not supported"
    assert order == list(range(len(shape))), "permuted traversal unsupported"
    metas = [sparsity.DimMetadata(j) for j in range(n)]
    dense = np.zeros(shape, dtype=values.dtype)
    coords = [0] * n
    cursor = [0]

    def rec(d, seg_idx):
        if d == n:
            dense[tuple(coords)] = values[cursor[0]]
            cursor[0] += 1
            return
        dm = metas[d]
        if dm.Format() == 0:  # DENSE
            size = dm.DenseSize()
            for i in range(size):
                coords[d] = i
                rec(d + 1, seg_idx * size + i)
        else:  # SPARSE_CSR
            segs = _sparse_vector(dm.ArraySegments(),
                                  dm.ArraySegmentsType())
            idxs = _sparse_vector(dm.ArrayIndices(), dm.ArrayIndicesType())
            for i in range(segs[seg_idx], segs[seg_idx + 1]):
                coords[d] = idxs[i]
                rec(d + 1, -1)  # sparse dim must be innermost here

    rec(0, 0)
    assert cursor[0] == values.size, "sparse decode consumed wrong count"
    return dense


def _options(op, cls):
    """Unpack a builtin-options union table into ``cls``."""
    tab = op.BuiltinOptions()
    if tab is None:
        return None
    o = cls()
    o.Init(tab.Bytes, tab.Pos)
    return o


def _buffer_array(model, tensor):
    buf = model.Buffers(tensor.Buffer())
    if buf is None or buf.DataLength() == 0:
        return None
    data = buf.DataAsNumpy()
    dtype = _DTYPES[tensor.Type()]
    shape = [tensor.Shape(j) for j in range(tensor.ShapeLength())]
    arr = np.frombuffer(data.tobytes(), dtype=dtype)
    sp = tensor.Sparsity()
    if sp is not None:
        return _densify(sp, shape, arr)
    return arr.reshape(shape) if shape else arr


def convert(model_path: str, out_path: str) -> dict:
    data = Path(model_path).read_bytes()
    model = schema_fb.Model.GetRootAsModel(bytearray(data), 0)
    assert model.SubgraphsLength() == 1, "single-subgraph models only"
    sg = model.Subgraphs(0)

    # --- tensors ---------------------------------------------------------
    tensors = []
    consts = {}
    for i in range(sg.TensorsLength()):
        t = sg.Tensors(i)
        shape = [t.Shape(j) for j in range(t.ShapeLength())]
        dtype = np.dtype(_DTYPES[t.Type()]).name
        tensors.append({"shape": shape, "dtype": dtype})
        arr = _buffer_array(model, t)
        if arr is not None:
            consts[f"t{i}"] = arr

    # --- ops --------------------------------------------------------------
    def op_name(op):
        oc = model.OperatorCodes(op.OpcodeIndex())
        code = max(oc.BuiltinCode(), oc.DeprecatedBuiltinCode())
        return _OP_NAMES.get(code, f"UNKNOWN_{code}")

    ops = []
    for i in range(sg.OperatorsLength()):
        op = sg.Operators(i)
        name = op_name(op)
        inputs = [op.Inputs(j) for j in range(op.InputsLength())]
        outputs = [op.Outputs(j) for j in range(op.OutputsLength())]
        opts = {}
        if name == "CONV_2D":
            o = _options(op, schema_fb.Conv2DOptions)
            opts = {
                "stride": [o.StrideH(), o.StrideW()],
                "dilation": [o.DilationHFactor(), o.DilationWFactor()],
                "padding": _PAD_NAMES[o.Padding()],
                "activation": _ACT_NAMES[o.FusedActivationFunction()],
            }
        elif name == "DEPTHWISE_CONV_2D":
            o = _options(op, schema_fb.DepthwiseConv2DOptions)
            opts = {
                "stride": [o.StrideH(), o.StrideW()],
                "dilation": [o.DilationHFactor(), o.DilationWFactor()],
                "padding": _PAD_NAMES[o.Padding()],
                "activation": _ACT_NAMES[o.FusedActivationFunction()],
                "depth_multiplier": o.DepthMultiplier(),
            }
        elif name == "MAX_POOL_2D":
            o = _options(op, schema_fb.Pool2DOptions)
            opts = {
                "stride": [o.StrideH(), o.StrideW()],
                "filter": [o.FilterHeight(), o.FilterWidth()],
                "padding": _PAD_NAMES[o.Padding()],
                "activation": _ACT_NAMES[o.FusedActivationFunction()],
            }
        elif name == "ADD":
            o = _options(op, schema_fb.AddOptions)
            opts = {"activation": _ACT_NAMES[o.FusedActivationFunction()]}
        elif name == "MUL":
            o = _options(op, schema_fb.MulOptions)
            opts = {"activation": _ACT_NAMES[o.FusedActivationFunction()]}
        elif name == "SUB":
            o = _options(op, schema_fb.SubOptions)
            opts = {"activation": _ACT_NAMES[o.FusedActivationFunction()]}
        elif name == "DIV":
            o = _options(op, schema_fb.DivOptions)
            opts = {"activation": _ACT_NAMES[o.FusedActivationFunction()]}
        elif name == "FULLY_CONNECTED":
            o = _options(op, schema_fb.FullyConnectedOptions)
            assert o.WeightsFormat() == 0, "shuffled FC weights unsupported"
            opts = {
                "activation": _ACT_NAMES[o.FusedActivationFunction()],
                "keep_num_dims": bool(o.KeepNumDims()),
            }
        elif name == "MEAN":
            o = _options(op, schema_fb.ReducerOptions)
            opts = {"keep_dims": bool(o.KeepDims())}
        elif name == "SOFTMAX":
            o = _options(op, schema_fb.SoftmaxOptions)
            opts = {"beta": float(o.Beta())}
        elif name == "AVERAGE_POOL_2D":
            o = _options(op, schema_fb.Pool2DOptions)
            opts = {
                "stride": [o.StrideH(), o.StrideW()],
                "filter": [o.FilterHeight(), o.FilterWidth()],
                "padding": _PAD_NAMES[o.Padding()],
                "activation": _ACT_NAMES[o.FusedActivationFunction()],
            }
        elif name == "CONCATENATION":
            o = _options(op, schema_fb.ConcatenationOptions)
            opts = {"axis": o.Axis(),
                    "activation": _ACT_NAMES[o.FusedActivationFunction()]}
        elif name == "RESHAPE":
            o = _options(op, schema_fb.ReshapeOptions)
            if o is not None and o.NewShapeLength():
                opts = {"new_shape": [o.NewShape(j)
                                      for j in range(o.NewShapeLength())]}
        elif name == "RESIZE_BILINEAR":
            o = _options(op, schema_fb.ResizeBilinearOptions)
            opts = {"align_corners": bool(o.AlignCorners()),
                    "half_pixel_centers": bool(o.HalfPixelCenters())}
        elif name == "DEPTH_TO_SPACE":
            o = _options(op, schema_fb.DepthToSpaceOptions)
            opts = {"block_size": o.BlockSize()}
        elif name == "BATCH_MATMUL":
            o = _options(op, schema_fb.BatchMatMulOptions)
            opts = {"adj_x": bool(o.AdjX()) if o is not None else False,
                    "adj_y": bool(o.AdjY()) if o is not None else False}
        ops.append({"op": name, "inputs": inputs, "outputs": outputs,
                    "options": opts})

    # --- fold DENSIFY then DEQUANTIZE out of the op list -------------------
    # (sparse weights were decoded to dense arrays at tensor-read time; the
    #  two folding passes handle either op ordering in the flatbuffer)
    for node in ops:
        if node["op"] == "DENSIFY":
            consts[f"t{node['outputs'][0]}"] = consts[f"t{node['inputs'][0]}"]
    folded_ops = []
    for node in ops:
        name, ins, outs = node["op"], node["inputs"], node["outputs"]
        if name == "DENSIFY":
            continue
        if name == "DEQUANTIZE" and f"t{ins[0]}" in consts:
            consts[f"t{outs[0]}"] = consts[f"t{ins[0]}"].astype(np.float32)
            continue
        folded_ops.append(node)

    inputs = [sg.Inputs(j) for j in range(sg.InputsLength())]
    outputs = [sg.Outputs(j) for j in range(sg.OutputsLength())]

    graph = {
        "inputs": inputs,
        "outputs": outputs,
        "tensors": tensors,
        "ops": folded_ops,
    }
    payload = {"__graph__": np.array(json.dumps(graph))}
    payload.update(consts)
    np.savez_compressed(out_path, **payload)
    hist = {}
    for n in folded_ops:
        hist[n["op"]] = hist.get(n["op"], 0) + 1
    return hist


def main():
    args = sys.argv[1:]
    if args and args[0] == "--all":
        src, dst = Path(args[1]), Path(args[2])
        dst.mkdir(parents=True, exist_ok=True)
        for f in sorted(src.glob("*.tflite")):
            out = dst / (f.stem + ".npz")
            hist = convert(str(f), str(out))
            print(f"{f.name}: {hist}")
    else:
        hist = convert(args[0], args[1])
        print(hist)


if __name__ == "__main__":
    main()
