"""Lower a converted TFLite graph to a pure, batch-polymorphic JAX function.

The reference executes these graphs with the TFLite C++ interpreter,
rebuilding it on every call (reference: face_detection.rs:207-210).  Here the
graph is traced ONCE into XLA: convolutions hit the MXU as
``lax.conv_general_dilated`` in NHWC, elementwise ops fuse into them, and the
whole network compiles to a single TPU executable.  The lowered function is
natively batched — every op in the supported set is batch-preserving, so the
same traced graph serves any leading batch size.

Supported op set (complete for the 7 bundled face models, SURVEY.md §2.3,
plus the ArcFace-class embeddings op set — reference face_embeddings.rs
runs a downloadable MobileFaceNet-family model):
CONV_2D, DEPTHWISE_CONV_2D, FULLY_CONNECTED, BATCH_MATMUL, ADD, SUB, MUL,
DIV, MINIMUM, MAXIMUM, RELU, PRELU, LOGISTIC, SOFTMAX, MAX_POOL_2D,
AVERAGE_POOL_2D, MEAN, PAD, RESHAPE, TRANSPOSE, CONCATENATION,
RESIZE_BILINEAR, DEPTH_TO_SPACE, L2_NORMALIZATION, SQRT, RSQRT, NEG, EXP,
TANH, HARD_SWISH.
DEQUANTIZE/DENSIFY never reach the runtime (folded at conversion).
"""

import json
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax


class Graph:
    """A converted TFLite graph: op list + constant pool.

    ``collapse_separable`` folds DEPTHWISE(3x3, linear) -> CONV(1x1)
    pairs into one dense conv (see _collapse_separable_pairs): False
    (off), True (every eligible pair), or a predicate
    ``f(ci, co, h_out) -> bool`` selecting pairs.
    """

    def __init__(self, npz_path, collapse_separable=False):
        payload = np.load(npz_path, allow_pickle=False)
        meta = json.loads(str(payload["__graph__"]))
        self.inputs = meta["inputs"]
        self.outputs = meta["outputs"]
        self.tensors = meta["tensors"]
        self.consts = {int(k[1:]): payload[k] for k in payload.files
                       if k.startswith("t")}
        self.ops = _fold_pads_into_convs(meta["ops"], self.consts,
                                         set(self.outputs))
        if collapse_separable:
            pred = (collapse_separable if callable(collapse_separable)
                    else None)
            self.ops = _collapse_separable_pairs(
                self.ops, self.consts, self.tensors,
                set(self.outputs), pred)

    @property
    def input_shape(self):
        return tuple(self.tensors[self.inputs[0]]["shape"])

    @property
    def output_shapes(self):
        return [tuple(self.tensors[i]["shape"]) for i in self.outputs]


def _fold_pads_into_convs(ops, consts, graph_outputs):
    """Fold PAD ops into the convolutions that consume them.

    TFLite expresses SAME-style conv padding as an explicit PAD op
    followed by a VALID conv (11-43 PADs per detection model,
    SURVEY.md §2.3); each PAD materializes a full padded activation
    tensor in HBM.  Zero-pad + VALID conv == conv with explicit edge
    padding, so the pad becomes a conv attribute and the HBM round-trip
    disappears.  Folds only when every consumer is a CONV/DW with VALID
    padding and the pad touches spatial dims alone; MAX_POOL is NOT
    foldable (its identity is -inf, not 0)."""
    consumers = {}
    for node in ops:
        for i in node["inputs"]:
            consumers.setdefault(i, []).append(node)

    def spatial_pad(node):
        if node["op"] != "PAD" or node["inputs"][1] not in consts:
            return None
        p = np.asarray(consts[node["inputs"][1]])
        if p.shape != (4, 2) or p[0].any() or p[3].any():
            return None
        return [(int(p[1][0]), int(p[1][1])),
                (int(p[2][0]), int(p[2][1]))]

    folded = []
    for node in ops:
        pad = spatial_pad(node)
        out = node["outputs"][0] if node["outputs"] else None
        users = consumers.get(out, [])
        if (pad is not None and out not in graph_outputs and users
                and all(u["op"] in ("CONV_2D", "DEPTHWISE_CONV_2D")
                        and u["options"]["padding"] == "VALID"
                        and u["inputs"][0] == out for u in users)):
            for u in users:
                u["inputs"] = [node["inputs"][0]] + u["inputs"][1:]
                u["options"] = dict(u["options"], padding=pad)
            continue
        folded.append(node)
    return folded


def _collapse_separable_pairs(ops, consts, tensors, graph_outputs, pred):
    """Fold linear DEPTHWISE_CONV -> 1x1 CONV pairs into one dense conv.

    MediaPipe's face nets are separable-conv stacks (SURVEY.md §2.3):
    every residual block runs DW(kxk, no activation) then CONV(1x1),
    materializing the [B,H,W,C] intermediate in HBM twice (write +
    read).  Because the depthwise stage is LINEAR here (TFLite fused
    activation NONE on all 136 DW ops across the 6 bundled nets), the
    pair composes exactly into one dense conv:

        K_dense[o, kh, kw, i] = PW[o, 0, 0, i] * DW[0, kh, kw, i]
        b_dense = PW[:, 0, 0, :] @ b_dw + b_pw

    which eliminates the intermediate tensor's HBM round-trip and one
    sequential op, at the cost of k*k x the pointwise FLOPs.  Whether
    that trades well is per-layer (MXU lane utilization at small C vs
    bytes saved) — callers pass ``pred(ci, co, h_out)`` to select
    pairs from measurement (tools/tpu_sep_collapse_probe.py).

    Eligibility: DW has depth_multiplier 1, activation NONE, dilation
    1; its output feeds exactly the one 1x1 conv (stride 1, dilation
    1) and is not a graph output.  Composition is done in f64 and
    emitted f32 — bit-difference vs the uncollapsed pair is one
    rounding of the weight product, far inside the TFLite-parity
    tolerances (tests/test_net_parity.py) and the e2e budgets.
    """
    consumers = {}
    for idx, node in enumerate(ops):
        for t in node["inputs"]:
            consumers.setdefault(t, []).append(idx)

    def _weights(node):
        ws = [i for i in node["inputs"][1:] if i in consts]
        w = consts[node["inputs"][1]]
        b = (consts[node["inputs"][2]]
             if len(node["inputs"]) > 2 and node["inputs"][2] in consts
             else None)
        return w, b, ws

    next_id = len(tensors)
    out = []
    skip = set()
    for idx, node in enumerate(ops):
        if idx in skip:
            continue
        if node["op"] != "DEPTHWISE_CONV_2D":
            out.append(node)
            continue
        o = node["options"]
        dw_out = node["outputs"][0]
        cons = consumers.get(dw_out, [])
        ok = (o["activation"] == "NONE"
              and list(o.get("dilation", [1, 1])) == [1, 1]
              and o.get("depth_multiplier", 1) == 1
              and dw_out not in graph_outputs
              and len(cons) == 1 and cons[0] > idx)
        nxt = ops[cons[0]] if ok else None
        if nxt is not None:
            no = nxt["options"]
            pw_w = (consts[nxt["inputs"][1]]
                    if (nxt["op"] == "CONV_2D" and len(nxt["inputs"]) > 1
                        and nxt["inputs"][1] in consts) else None)
            ok = (pw_w is not None
                  and pw_w.shape[1] == 1 and pw_w.shape[2] == 1
                  and list(no.get("stride", [1, 1])) == [1, 1]
                  and list(no.get("dilation", [1, 1])) == [1, 1]
                  and nxt["inputs"][0] == dw_out)
        if not ok:
            out.append(node)
            continue
        dw_w, dw_b, _ = _weights(node)          # [1, kh, kw, C]
        pw_w, pw_b, _ = _weights(nxt)           # [Co, 1, 1, C]
        ci, co = dw_w.shape[3], pw_w.shape[0]
        oshape = tensors[nxt["outputs"][0]]["shape"]
        if pred is not None and not pred(ci, co, oshape[1]):
            out.append(node)
            continue
        dw64 = dw_w.astype(np.float64)
        pw64 = pw_w.astype(np.float64)
        k = (pw64[:, :, :, :] * dw64[0][None]).astype(np.float32)
        b = pw64[:, 0, 0, :] @ (dw_b.astype(np.float64)
                                if dw_b is not None else np.zeros(ci))
        if pw_b is not None:
            b = b + pw_b.astype(np.float64)
        b = b.astype(np.float32)
        w_id, b_id = next_id, next_id + 1
        next_id += 2
        consts[w_id], consts[b_id] = k, b
        tensors.append({"shape": list(k.shape), "name": "sep_w"})
        tensors.append({"shape": list(b.shape), "name": "sep_b"})
        out.append({
            "op": "CONV_2D",
            "inputs": [node["inputs"][0], w_id, b_id],
            "outputs": list(nxt["outputs"]),
            "options": {"stride": list(o["stride"]),
                        "dilation": [1, 1],
                        "padding": o["padding"],
                        "activation": nxt["options"]["activation"]},
        })
        skip.add(cons[0])
    return out


def graph_flops(graph, batch: int = 1) -> int:
    """MAC-based FLOP count (2*MACs) of the conv/matmul ops — the
    numerator for MFU reporting (docs/PERF.md)."""
    shapes = {i: t["shape"] for i, t in enumerate(graph.tensors)}
    total = 0
    for node in graph.ops:
        op, ins, outs = node["op"], node["inputs"], node["outputs"]
        if op in ("CONV_2D", "DEPTHWISE_CONV_2D"):
            w = graph.consts[ins[1]].shape
            oshape = shapes[outs[0]]
            # CONV weight OHWI: O*kh*kw*I MACs per output pixel;
            # DW weight [1,kh,kw,C]: kh*kw*C MACs per output pixel
            per_pix = (w[0] * w[1] * w[2] * w[3] if op == "CONV_2D"
                       else w[1] * w[2] * w[3])
            total += 2 * per_pix * oshape[1] * oshape[2]
        elif op == "FULLY_CONNECTED":
            w = graph.consts[ins[1]].shape
            total += 2 * w[0] * w[1]
    return total * batch


def _prelu(x, alpha):
    """Per-channel PReLU (module-level so probes can A/B formulations;
    tools/tpu_prelu_probe.py).

    max + alpha*min instead of the equivalent select form: elementwise
    the two are float-exact-identical in any dtype (the inactive branch
    contributes an exact 0), but XLA/TPU fuses this form into the
    producing conv's epilogue while the select materializes — the iris
    net drops 5.93 -> 3.27 ms at effective batch 256 (bf16, v5e)."""
    return jnp.maximum(x, 0) + alpha * jnp.minimum(x, 0)


def _act(x, kind):
    if kind == "NONE":
        return x
    if kind == "RELU":
        return jnp.maximum(x, 0.0)
    if kind == "RELU6":
        return jnp.clip(x, 0.0, 6.0)
    if kind == "RELU_N1_TO_1":
        return jnp.clip(x, -1.0, 1.0)
    if kind == "TANH":
        return jnp.tanh(x)
    raise NotImplementedError(f"activation {kind}")


def _resize_bilinear(x, out_hw, align_corners, half_pixel_centers):
    n, h, w, c = x.shape
    oh, ow = out_hw
    if half_pixel_centers:
        ys = (jnp.arange(oh, dtype=jnp.float32) + 0.5) * (h / oh) - 0.5
        xs = (jnp.arange(ow, dtype=jnp.float32) + 0.5) * (w / ow) - 0.5
    elif align_corners and oh > 1 and ow > 1:
        ys = jnp.arange(oh, dtype=jnp.float32) * ((h - 1) / (oh - 1))
        xs = jnp.arange(ow, dtype=jnp.float32) * ((w - 1) / (ow - 1))
    else:
        ys = jnp.arange(oh, dtype=jnp.float32) * (h / oh)
        xs = jnp.arange(ow, dtype=jnp.float32) * (w / ow)
    y0 = jnp.clip(jnp.floor(ys), 0, h - 1).astype(jnp.int32)
    x0 = jnp.clip(jnp.floor(xs), 0, w - 1).astype(jnp.int32)
    y1 = jnp.minimum(y0 + 1, h - 1)
    x1 = jnp.minimum(x0 + 1, w - 1)
    wy = jnp.clip(ys - y0.astype(jnp.float32), 0.0, 1.0)[None, :, None, None]
    wx = jnp.clip(xs - x0.astype(jnp.float32), 0.0, 1.0)[None, None, :, None]
    # row gathers once per y-set, column gathers on the row-reduced
    # tensors (not four full-tensor gathers)
    ty0 = x[:, y0]
    ty1 = x[:, y1]
    top = ty0[:, :, x0] * (1 - wx) + ty0[:, :, x1] * wx
    bot = ty1[:, :, x0] * (1 - wx) + ty1[:, :, x1] * wx
    return top * (1 - wy) + bot * wy


def _depth_to_space(x, block):
    n, h, w, c = x.shape
    x = x.reshape(n, h, w, block, block, c // (block * block))
    x = x.transpose(0, 1, 3, 2, 4, 5)
    return x.reshape(n, h * block, w * block, c // (block * block))


def build_jax_fn(graph, param_dtype=jnp.float32, compute_dtype=jnp.float32):
    """Return ``fn(x: [B,H,W,C]) -> tuple(outputs)`` tracing the graph.

    ``compute_dtype=jnp.bfloat16`` runs the conv stack in bf16 (MXU-native)
    while keeping outputs in f32.
    """
    consts = {k: jnp.asarray(v.astype(np.float32) if v.dtype == np.float16
                             else v)
              for k, v in graph.consts.items()}

    def cast_param(v):
        return v.astype(param_dtype) if v.dtype == jnp.float32 else v

    # f32 parity path: force true-f32 convolutions (JAX's DEFAULT precision
    # feeds the MXU bf16 inputs, ~1e-3 rel error vs the TFLite reference
    # kernels).  The bf16 fast path opts in via compute_dtype=bfloat16.
    precision = (lax.Precision.HIGHEST if compute_dtype == jnp.float32
                 else lax.Precision.DEFAULT)

    def fn(x):
        batch = x.shape[0]
        env = dict(consts)
        env[graph.inputs[0]] = x.astype(compute_dtype)

        def get(i):
            v = env[i]
            if v.dtype == jnp.float32 and compute_dtype != jnp.float32:
                return v.astype(compute_dtype)
            return v

        for node in graph.ops:
            op, ins, outs, o = (node["op"], node["inputs"],
                                node["outputs"], node["options"])
            if op == "CONV_2D":
                xin = get(ins[0])
                w = cast_param(get(ins[1]))  # OHWI
                y = lax.conv_general_dilated(
                    xin, jnp.transpose(w, (1, 2, 3, 0)),  # -> HWIO
                    window_strides=tuple(o["stride"]),
                    padding=o["padding"],
                    rhs_dilation=tuple(o["dilation"]),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    preferred_element_type=compute_dtype,
                    precision=precision,
                )
                if len(ins) > 2 and ins[2] >= 0:
                    y = y + cast_param(get(ins[2]))
                env[outs[0]] = _act(y, o["activation"])
            elif op == "DEPTHWISE_CONV_2D":
                xin = get(ins[0])
                w = cast_param(get(ins[1]))  # [1, kh, kw, C*M]
                cin = xin.shape[-1]
                kh, kw = w.shape[1], w.shape[2]
                y = lax.conv_general_dilated(
                    xin, w.reshape(kh, kw, 1, w.shape[3]),
                    window_strides=tuple(o["stride"]),
                    padding=o["padding"],
                    rhs_dilation=tuple(o["dilation"]),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=cin,
                    preferred_element_type=compute_dtype,
                    precision=precision,
                )
                if len(ins) > 2 and ins[2] >= 0:
                    y = y + cast_param(get(ins[2]))
                env[outs[0]] = _act(y, o["activation"])
            elif op == "MAX_POOL_2D":
                xin = get(ins[0])
                fh, fw = o["filter"]
                sh, sw = o["stride"]
                n_, h_, w_, c_ = xin.shape
                if (fh, fw) == (sh, sw) and h_ % fh == 0 and w_ % fw == 0:
                    # non-overlapping pool == reshape+max, which the TPU
                    # runs far faster than reduce_window
                    y = xin.reshape(n_, h_ // fh, fh, w_ // fw, fw, c_)
                    y = y.max(axis=(2, 4))
                else:
                    y = lax.reduce_window(
                        xin, -jnp.inf, lax.max,
                        (1, fh, fw, 1), (1, sh, sw, 1), o["padding"])
                env[outs[0]] = _act(y, o["activation"])
            elif op == "AVERAGE_POOL_2D":
                xin = get(ins[0])
                fh, fw = o["filter"]
                sh, sw = o["stride"]
                n_, h_, w_, c_ = xin.shape
                if (fh, fw) == (sh, sw) and h_ % fh == 0 and w_ % fw == 0:
                    y = xin.reshape(n_, h_ // fh, fh, w_ // fw, fw, c_)
                    y = y.mean(axis=(2, 4))
                else:
                    assert o["padding"] == "VALID", \
                        "SAME avg-pool edge renorm not implemented"
                    y = lax.reduce_window(
                        xin, jnp.array(0, xin.dtype), lax.add,
                        (1, fh, fw, 1), (1, sh, sw, 1),
                        o["padding"]) / (fh * fw)
                env[outs[0]] = _act(y, o["activation"])
            elif op == "FULLY_CONNECTED":
                xin = get(ins[0])
                w = cast_param(get(ins[1]))  # [out, in]
                din = w.shape[1]
                if not o.get("keep_num_dims"):
                    # TFLite flattens everything but the contraction dim
                    xin = xin.reshape(-1, din)
                y = jnp.dot(xin, w.T, precision=precision,
                            preferred_element_type=compute_dtype)
                if len(ins) > 2 and ins[2] >= 0:
                    y = y + cast_param(get(ins[2]))
                env[outs[0]] = _act(y, o["activation"])
            elif op == "BATCH_MATMUL":
                # TFLite BatchMatMul (attention-style embedders use it
                # between two activations); adj_x/adj_y transpose the
                # contraction dims, batch dims broadcast like jnp.matmul
                a, b = get(ins[0]), get(ins[1])
                if ins[1] in consts:
                    b = cast_param(b)
                if o.get("adj_x"):
                    a = jnp.swapaxes(a, -1, -2)
                if o.get("adj_y"):
                    b = jnp.swapaxes(b, -1, -2)
                env[outs[0]] = jnp.matmul(
                    a, b, precision=precision,
                    preferred_element_type=compute_dtype)
            elif op == "ADD":
                env[outs[0]] = _act(get(ins[0]) + get(ins[1]),
                                    o["activation"])
            elif op == "SUB":
                env[outs[0]] = _act(get(ins[0]) - get(ins[1]),
                                    o["activation"])
            elif op == "MUL":
                env[outs[0]] = _act(get(ins[0]) * get(ins[1]),
                                    o["activation"])
            elif op == "DIV":
                env[outs[0]] = _act(get(ins[0]) / get(ins[1]),
                                    o["activation"])
            elif op == "MINIMUM":
                env[outs[0]] = jnp.minimum(get(ins[0]), get(ins[1]))
            elif op == "MAXIMUM":
                env[outs[0]] = jnp.maximum(get(ins[0]), get(ins[1]))
            elif op == "MEAN":
                axes = tuple(np.asarray(graph.consts[ins[1]])
                             .reshape(-1).tolist())
                env[outs[0]] = jnp.mean(get(ins[0]), axis=axes,
                                        keepdims=o["keep_dims"])
            elif op == "SOFTMAX":
                env[outs[0]] = jax.nn.softmax(
                    get(ins[0]) * o.get("beta", 1.0), axis=-1)
            elif op == "L2_NORMALIZATION":
                xin = get(ins[0])
                sq = jnp.sum(jnp.square(xin), axis=-1, keepdims=True)
                env[outs[0]] = xin * lax.rsqrt(jnp.maximum(sq, 1e-12))
            elif op == "SQRT":
                env[outs[0]] = jnp.sqrt(get(ins[0]))
            elif op == "RSQRT":
                env[outs[0]] = lax.rsqrt(get(ins[0]))
            elif op == "NEG":
                env[outs[0]] = -get(ins[0])
            elif op == "EXP":
                env[outs[0]] = jnp.exp(get(ins[0]))
            elif op == "TANH":
                env[outs[0]] = jnp.tanh(get(ins[0]))
            elif op == "HARD_SWISH":
                xin = get(ins[0])
                env[outs[0]] = xin * jnp.clip(xin + 3.0, 0.0, 6.0) / 6.0
            elif op == "RELU":
                env[outs[0]] = jnp.maximum(get(ins[0]), 0.0)
            elif op == "PRELU":
                xin, alpha = get(ins[0]), cast_param(get(ins[1]))
                env[outs[0]] = _prelu(xin, alpha)
            elif op == "PAD":
                pads = np.asarray(graph.consts[ins[1]])
                env[outs[0]] = jnp.pad(get(ins[0]),
                                       [tuple(p) for p in pads])
            elif op == "RESHAPE":
                tgt = list(o.get("new_shape")
                           or np.asarray(graph.consts[ins[1]]).tolist())
                if tgt and tgt[0] == 1:
                    tgt[0] = batch
                env[outs[0]] = get(ins[0]).reshape(tgt)
            elif op == "TRANSPOSE":
                perm = np.asarray(graph.consts[ins[1]]).reshape(-1).tolist()
                assert perm[0] == 0, \
                    f"TRANSPOSE must preserve the batch axis, got {perm}"
                env[outs[0]] = jnp.transpose(get(ins[0]), perm)
            elif op == "CONCATENATION":
                env[outs[0]] = _act(
                    jnp.concatenate([get(i) for i in ins], axis=o["axis"]),
                    o["activation"])
            elif op == "RESIZE_BILINEAR":
                size = np.asarray(graph.consts[ins[1]]).tolist()
                env[outs[0]] = _resize_bilinear(
                    get(ins[0]), size, o["align_corners"],
                    o["half_pixel_centers"])
            elif op == "DEPTH_TO_SPACE":
                env[outs[0]] = _depth_to_space(get(ins[0]), o["block_size"])
            elif op == "LOGISTIC":
                env[outs[0]] = jax.nn.sigmoid(get(ins[0]))
            else:
                raise NotImplementedError(f"op {op}")

        return tuple(env[i].astype(jnp.float32) for i in graph.outputs)

    return fn


def load_model_fn(npz_path, compute_dtype=jnp.float32):
    """Load a converted model and return (graph, jitted batched fn)."""
    graph = Graph(npz_path)
    fn = build_jax_fn(graph, compute_dtype=compute_dtype)
    return graph, jax.jit(fn)


def flatten_batching(net):
    """Wrap a batched network fn so vmap stacks FLATTEN into its
    leading batch dim instead of nesting.

    Under ``vmap(vmap(net))`` — the multi-face cascade's shape: an
    outer frame batch and an inner face batch — XLA sees the CNN with
    two batch dimensions and lowers it ~3x slower than the same
    effective batch flat (nested 7.99 ms vs flat 2.57 ms for the mesh
    net at effective batch 128, tools/tpu_kface_probe.py).  This
    ``jax.custom_vmap`` rule reshapes the mapped axis into the leading
    batch dim and calls the wrapped fn recursively, so ANY depth of
    vmap nesting collapses to one flat batch (each nesting level
    re-triggers the rule).  Numerics are the net's own at the flat
    batch shape — the same program the single-face cascade runs.

    ``net`` must take one array with a leading batch dim and return a
    tuple of arrays with the same leading batch dim (build_jax_fn's
    contract).
    """

    from jax.custom_batching import custom_vmap

    @custom_vmap
    def f(x):
        return net(x)

    @f.def_vmap
    def _rule(axis_size, in_batched, x):  # noqa: ARG001
        if not in_batched[0]:
            out = f(x)
            return out, jax.tree_util.tree_map(lambda _: False, out)
        b0, b1 = x.shape[0], x.shape[1]
        out = f(x.reshape((b0 * b1,) + x.shape[2:]))
        out = jax.tree_util.tree_map(
            lambda o: o.reshape((b0, b1) + o.shape[1:]), out)
        return out, jax.tree_util.tree_map(lambda _: True, out)

    return f
