"""BATCH_MATMUL / TRANSPOSE conversion + lowering parity.

The reference's ``FaceEmbeddings`` executes whatever ops the downloaded
flatbuffer contains (reference face_embeddings.rs:46-86); attention-style
embedders ship BATCH_MATMUL between two activations (with adj_x/adj_y
transposes) plus explicit TRANSPOSE ops.  A tiny graph exercising all of
them is exported with the real TFLite converter and checked against the
TFLite interpreter.
"""

import json
import sys
from pathlib import Path

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

sys.path.insert(0, "/root/repo/tools")

_CACHE = Path("/tmp/tpu_face_fixtures")
_VER = "v2"


def _build_bmm_net():
    class Net(tf.Module):
        @tf.function(input_signature=[
            tf.TensorSpec([1, 4, 8, 16], tf.float32)])
        def __call__(self, x):
            # attention-head-style 4D transpose: not expressible as a
            # matmul adjoint, so the TRANSPOSE op survives conversion
            t = tf.transpose(x, [0, 2, 1, 3]) + 0.5        # [1, 8, 4, 16]
            a = tf.reshape(t, [1, 32, 16])
            at = tf.nn.relu(tf.transpose(a, [0, 2, 1]))    # [1, 16, 32]
            g = tf.matmul(a, at)                           # [1, 32, 32]
            h = tf.matmul(g, a) * 0.1                      # [1, 32, 16]
            k = tf.matmul(h, h, transpose_a=True)          # adj_x
            m = tf.matmul(h, h, transpose_b=True)          # adj_y
            return tf.concat([tf.reshape(k, [1, -1]),
                              tf.reshape(m, [1, -1])], axis=1)

    return Net()


@pytest.fixture(scope="module")
def bmm_model():
    """(tflite_path, npz_path): generated once, cached across sessions."""
    _CACHE.mkdir(exist_ok=True)
    tfl = _CACHE / f"bmm_{_VER}.tflite"
    npz = _CACHE / f"bmm_{_VER}.npz"
    if not tfl.exists():
        net = _build_bmm_net()
        cf = net.__call__.get_concrete_function()
        conv = tf.lite.TFLiteConverter.from_concrete_functions([cf], net)
        tfl.write_bytes(conv.convert())
    if not npz.exists():
        from convert_tflite import convert
        convert(str(tfl), str(npz))
    return str(tfl), str(npz)


def test_converted_ops_include_batch_matmul(bmm_model):
    _, npz = bmm_model
    payload = np.load(npz, allow_pickle=False)
    meta = json.loads(str(payload["__graph__"]))
    hist = {}
    for node in meta["ops"]:
        hist[node["op"]] = hist.get(node["op"], 0) + 1
    assert hist.get("BATCH_MATMUL", 0) >= 3, hist
    assert hist.get("TRANSPOSE", 0) >= 1, hist
    adj = [n["options"] for n in meta["ops"] if n["op"] == "BATCH_MATMUL"]
    assert any(o.get("adj_x") or o.get("adj_y") for o in adj) \
        or hist.get("TRANSPOSE", 0) >= 3, (adj, hist)


def test_batch_matmul_parity(bmm_model):
    """Lowered XLA graph vs the TFLite interpreter, random inputs."""
    import jax

    from tpu_face.compiler import Graph, build_jax_fn

    tfl, npz = bmm_model
    fn = jax.jit(build_jax_fn(Graph(npz)))

    interp = tf.lite.Interpreter(model_path=tfl)
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    rng = np.random.default_rng(11)
    for _ in range(2):
        x = rng.normal(size=inp["shape"]).astype(np.float32)
        interp.set_tensor(inp["index"], x)
        interp.invoke()
        want = interp.get_tensor(interp.get_output_details()[0]["index"])
        got = np.asarray(fn(x)[0])
        rel = np.max(np.abs(got - want)) / (np.max(np.abs(want)) + 1e-9)
        assert rel < 1e-5, rel


def test_batch_matmul_batch_polymorphic(bmm_model):
    """The same traced graph serves any leading batch size."""
    import jax

    from tpu_face.compiler import Graph, build_jax_fn

    _, npz = bmm_model
    fn = jax.jit(build_jax_fn(Graph(npz)))
    rng = np.random.default_rng(5)
    xb = rng.normal(size=(3, 4, 8, 16)).astype(np.float32)
    full = np.asarray(fn(xb)[0])
    assert full.shape[0] == 3
    row = np.asarray(fn(xb[1:2])[0])
    rel = np.max(np.abs(full[1] - row[0])) / (np.max(np.abs(row)) + 1e-9)
    assert rel < 1e-5, rel
