"""The separable-collapse graph rewrite is numerically exact.

lowering._collapse_separable_pairs folds linear DW(3x3) -> 1x1 conv
pairs into one dense conv (kernel = outer product, bias composes
linearly) — the round-4 traffic/latency attack on the detect and iris
stages (docs/PERF.md, tools/tpu_sep_collapse_probe.py).  The reference
runs the uncollapsed TFLite graphs (face_detection.rs:235); parity
therefore demands the rewrite change nothing beyond fp rounding.
"""

import numpy as np
import pytest

from tpu_face.compiler import Graph, build_jax_fn

DATA = "/root/repo/tpu_face/data"

# (model, pairs that must collapse under collapse_separable=True)
CASES = [
    ("face_detection_back", 32),
    ("face_detection_short_range", 16),
    ("face_detection_full_range", 40),
    ("face_detection_full_range_sparse", 40),
    ("face_landmark", 20),
    ("iris_landmark", 26),
]


@pytest.mark.parametrize("name,npairs", CASES)
def test_collapse_exact(name, npairs):
    import jax

    path = f"{DATA}/{name}.npz"
    g0 = Graph(path)
    g1 = Graph(path, collapse_separable=True)
    dw0 = sum(1 for n in g0.ops if n["op"] == "DEPTHWISE_CONV_2D")
    dw1 = sum(1 for n in g1.ops if n["op"] == "DEPTHWISE_CONV_2D")
    assert dw0 - dw1 == npairs
    assert len(g0.ops) - len(g1.ops) == npairs

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (2,) + g0.input_shape[1:]).astype(np.float32)
    f0 = jax.jit(build_jax_fn(g0))
    f1 = jax.jit(build_jax_fn(g1))
    for a, b in zip(f0(x), f1(x)):
        a, b = np.asarray(a), np.asarray(b)
        # one extra rounding of the weight product; outputs are
        # logit/pixel scale (up to ~256)
        np.testing.assert_allclose(a, b, atol=2e-4)


def test_collapse_predicate_selects_pairs():
    path = f"{DATA}/face_detection_back.npz"
    g_all = Graph(path, collapse_separable=True)
    g_small = Graph(path,
                    collapse_separable=lambda ci, co, h: ci <= 24)
    dw_all = sum(1 for n in g_all.ops if n["op"] == "DEPTHWISE_CONV_2D")
    dw_small = sum(1 for n in g_small.ops
                   if n["op"] == "DEPTHWISE_CONV_2D")
    # back model: 16 pairs at ci=24, 16 at ci=48/96 (SURVEY.md §2.3
    # stack; histogram in tools/tpu_sep_collapse_probe.py)
    assert dw_all == 0
    assert dw_small == 16


def test_collapse_keeps_nonlinear_pairs():
    """The demo MobileFaceNet has PReLU between DW and 1x1 in all but
    one block — those pairs must NOT collapse."""
    g0 = Graph(f"{DATA}/demo/face_embeddings.npz")
    g1 = Graph(f"{DATA}/demo/face_embeddings.npz",
               collapse_separable=True)
    dw0 = sum(1 for n in g0.ops if n["op"] == "DEPTHWISE_CONV_2D")
    dw1 = sum(1 for n in g1.ops if n["op"] == "DEPTHWISE_CONV_2D")
    assert dw0 - dw1 == 1
