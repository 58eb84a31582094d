"""Converted XLA graphs vs the TFLite interpreter on the bundled
reference models (random inputs, tensor-level tolerances).

fp16-weight detection models: TFLite dequantizes to f32 exactly as the
converter does, so differences are conv-order fp noise (<= ~1e-4 on
logit-scale outputs).  f32 landmark/iris models are tighter.
"""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from tpu_face.compiler import Graph, build_jax_fn  # noqa: E402

REF_MODELS = "/root/reference/models"
OUR_MODELS = "/root/repo/tpu_face/data"

CASES = [
    ("face_detection_front", 2e-4),
    ("face_detection_back", 2e-4),
    ("face_detection_short_range", 2e-4),
    ("face_detection_full_range", 2e-4),
    ("face_detection_full_range_sparse", 2e-4),
    ("face_landmark", 2e-3),   # PReLU f32; outputs are pixel-scale
    ("iris_landmark", 2e-3),   # (x192), so 2e-3 ~= 1e-5 normalized
]


@pytest.mark.parametrize("name,atol", CASES)
def test_net_matches_tflite(name, atol):
    import jax
    interp = tf.lite.Interpreter(model_path=f"{REF_MODELS}/{name}.tflite")
    interp.allocate_tensors()
    (inp,) = interp.get_input_details()
    rng = np.random.default_rng(0)
    x = rng.uniform(-1.0, 1.0, size=inp["shape"]).astype(np.float32)
    interp.set_tensor(inp["index"], x)
    interp.invoke()
    want = {tuple(d["shape"]): interp.get_tensor(d["index"])
            for d in interp.get_output_details()}

    graph = Graph(f"{OUR_MODELS}/{name}.npz")
    fn = jax.jit(build_jax_fn(graph))
    got = fn(x)
    assert len(got) == len(want)
    for g in got:
        w = want[tuple(g.shape)]
        diff = np.max(np.abs(np.asarray(g) - w))
        assert diff <= atol, (name, g.shape, diff)
