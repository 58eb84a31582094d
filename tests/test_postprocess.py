"""Weighted/plain NMS vs a direct NumPy port of the reference algorithm.

The fixed-shape masked tensor programs (tpu_face/ops/postprocess.py) must
reproduce the reference's sequential loop semantics (nms.rs:19-124)
exactly, including the weighted-average merging and the loop-guard.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from tpu_face.ops import postprocess as post


# --- sequential oracle (reference nms.rs semantics, NumPy) ----------------

def _iou(a, b):
    xmin, ymin = max(a[0], b[0]), max(a[1], b[1])
    xmax, ymax = min(a[2], b[2]), min(a[3], b[3])
    if not (xmin < xmax and ymin < ymax):
        return 0.0
    inter = (xmax - xmin) * (ymax - ymin)

    def area(r):
        w, h = r[2] - r[0], r[3] - r[1]
        return w * h if (w > 0 and h > 0) else 0.0

    denom = area(a) + area(b) - inter
    return inter / denom if denom > 0 else 0.0


def oracle_weighted_nms(data, scores, thr, min_score):
    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    remaining = [i for i in order if scores[i] > min_score]
    outputs = []
    while remaining:
        top = remaining[0]
        top_box = (data[top][0][0], data[top][0][1],
                   data[top][1][0], data[top][1][1])
        cands, rest = [], []
        for i in remaining:
            b = (data[i][0][0], data[i][0][1], data[i][1][0], data[i][1][1])
            (cands if _iou(b, top_box) > thr else rest).append(i)
        if cands:
            w = np.zeros_like(data[top])
            total = 0.0
            for i in cands:
                total += scores[i]
                w += data[i] * scores[i]
            outputs.append((w / total, scores[top]))
        else:
            outputs.append((data[top].copy(), scores[top]))
        if len(remaining) == len(rest):
            break
        remaining = rest
    return outputs


def _random_detections(rng, n, clusters=3):
    centers = rng.uniform(0.2, 0.8, size=(clusters, 2))
    data = np.zeros((n, 4, 2), np.float32)
    scores = rng.uniform(0.0, 1.0, size=n).astype(np.float32)
    for i in range(n):
        c = centers[i % clusters] + rng.normal(0, 0.02, 2)
        half = rng.uniform(0.05, 0.15)
        data[i, 0] = c - half
        data[i, 1] = c + half
        data[i, 2:] = rng.uniform(0, 1, (2, 2))
    return data, scores


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_weighted_nms_matches_oracle(seed):
    rng = np.random.RandomState(seed)
    data, scores = _random_detections(rng, 40)
    valid = scores > 0.5
    got_d, got_s, got_v = post.weighted_nms(
        data, scores, valid, max_outputs=16)
    got_d, got_s, got_v = map(np.asarray, (got_d, got_s, got_v))
    want = oracle_weighted_nms(data, scores, 0.3, 0.5)
    assert int(got_v.sum()) == len(want)
    for k, (wd, ws) in enumerate(want):
        np.testing.assert_allclose(got_d[k], wd, atol=2e-6)
        np.testing.assert_allclose(got_s[k], ws, atol=1e-6)


def test_weighted_nms_empty():
    data = np.zeros((10, 4, 2), np.float32)
    scores = np.full(10, 0.1, np.float32)
    _, _, v = post.weighted_nms(data, scores, scores > 0.5, max_outputs=4)
    assert not np.asarray(v).any()


def test_plain_nms_keeps_strongest_per_cluster():
    rng = np.random.RandomState(0)
    data, scores = _random_detections(rng, 30, clusters=2)
    valid = scores > 0.5
    _, got_s, got_v = post.plain_nms(data, scores, valid, max_outputs=8)
    got_s, got_v = np.asarray(got_s), np.asarray(got_v)
    # strongest overall detection always survives
    assert got_v[0]
    assert got_s[0] == scores[valid].max()


def test_decode_boxes_corner_conversion():
    anchors = np.array([[0.5, 0.5]], np.float32)
    raw = np.zeros((1, 1, 16), np.float32)
    raw[0, 0, 0:2] = [12.8, -12.8]   # center offset (x, y)
    raw[0, 0, 2:4] = [25.6, 51.2]    # size (w, h)
    raw[0, 0, 4:6] = [6.4, 6.4]      # first keypoint
    out = np.asarray(post.decode_boxes(raw[0], anchors, 128.0))
    # center = (0.5 + 0.1, 0.5 - 0.1); size = (0.2, 0.4)
    np.testing.assert_allclose(out[0, 0], [0.5, 0.2], atol=1e-6)  # corner0
    np.testing.assert_allclose(out[0, 1], [0.7, 0.6], atol=1e-6)  # corner1
    np.testing.assert_allclose(out[0, 2], [0.55, 0.55], atol=1e-6)


def test_clamped_sigmoid():
    x = np.array([-200.0, 0.0, 200.0], np.float32)
    y = np.asarray(post.clamped_sigmoid(x))
    assert y[1] == 0.5
    # clamp at +-80 keeps values finite and matches sigmoid(+-80)
    np.testing.assert_allclose(y[0], 1.0 / (1.0 + np.exp(80.0)), rtol=1e-6)
    np.testing.assert_allclose(y[2], 1.0 / (1.0 + np.exp(-80.0)), rtol=1e-6)


def test_letterbox_removal():
    data = np.array([[[0.5, 0.5], [0.75, 2.0 / 3.0]]], np.float32)
    pad = np.array([0.0, 1.0 / 6.0, 0.0, 1.0 / 6.0], np.float32)
    out = np.asarray(post.letterbox_removal(data, pad))
    np.testing.assert_allclose(out[0, 0], [0.5, 0.5], atol=1e-6)
    np.testing.assert_allclose(out[0, 1], [0.75, 0.75], atol=1e-6)


def _weighted_nms_reference(data, scores, threshold):
    """Direct python transcription of the reference's sequential
    weighted NMS (nms.rs:56-124) for property testing."""
    import numpy as np

    def iou(a, b):
        ixmin = max(a[0, 0], b[0, 0]); iymin = max(a[0, 1], b[0, 1])
        ixmax = min(a[1, 0], b[1, 0]); iymax = min(a[1, 1], b[1, 1])
        iw, ih = ixmax - ixmin, iymax - iymin
        inter = iw * ih if (iw > 0 and ih > 0) else 0.0
        area = lambda r: max(r[1, 0] - r[0, 0], 0) * max(r[1, 1] - r[0, 1], 0)
        union = area(a) + area(b) - inter
        return inter / union if union > 0 else 0.0

    order = sorted(range(len(scores)), key=lambda i: -scores[i])
    remaining = list(order)
    out = []
    while remaining:
        top = remaining[0]
        cand = [i for i in remaining if iou(data[top], data[i]) > threshold]
        rest = [i for i in remaining if i not in cand]
        if len(rest) == len(remaining):
            break
        merged = data[top].copy()
        if cand:
            w = np.array([scores[i] for i in cand])[:, None, None]
            merged = (w * np.stack([data[i] for i in cand])).sum(0) / w.sum()
        out.append((merged, scores[top]))
        remaining = rest
    return out


def test_weighted_nms_matches_sequential_reference():
    """The masked fixed-shape program reproduces the reference's
    sequential weighted merge on random detection sets."""
    import numpy as np

    rng = np.random.default_rng(42)
    for trial in range(5):
        n = 40
        centers = rng.uniform(0.2, 0.8, (n, 2))
        sizes = rng.uniform(0.05, 0.3, (n, 2))
        data = np.zeros((n, 3, 2), np.float32)
        data[:, 0] = centers - sizes / 2
        data[:, 1] = centers + sizes / 2
        data[:, 2] = centers  # one keypoint
        scores = rng.uniform(0.5, 1.0, n).astype(np.float32)
        valid = np.ones(n, bool)

        want = _weighted_nms_reference(data.astype(np.float64), scores,
                                       0.3)
        got_d, got_s, got_v = post.weighted_nms(
            jnp.asarray(data), jnp.asarray(scores), jnp.asarray(valid),
            max_outputs=n, threshold=0.3)
        got_d, got_s, got_v = (np.asarray(got_d), np.asarray(got_s),
                               np.asarray(got_v))
        n_valid = int(got_v.sum())
        assert n_valid == len(want), (trial, n_valid, len(want))
        for k, (md, ms) in enumerate(want):
            assert got_v[k]
            np.testing.assert_allclose(got_d[k], md, atol=1e-5)
            assert abs(got_s[k] - ms) < 1e-6


def test_plain_nms_matches_sequential_reference():
    """Greedy (non-weighted) NMS vs a direct transcription of
    nms.rs:19-53."""
    rng = np.random.default_rng(7)
    n = 30
    centers = rng.uniform(0.2, 0.8, (n, 2))
    sizes = rng.uniform(0.05, 0.3, (n, 2))
    data = np.zeros((n, 2, 2), np.float32)
    data[:, 0] = centers - sizes / 2
    data[:, 1] = centers + sizes / 2
    scores = rng.uniform(0.5, 1.0, n).astype(np.float32)

    def iou(a, b):
        ixmin = max(a[0, 0], b[0, 0]); iymin = max(a[0, 1], b[0, 1])
        ixmax = min(a[1, 0], b[1, 0]); iymax = min(a[1, 1], b[1, 1])
        iw, ih = ixmax - ixmin, iymax - iymin
        inter = iw * ih if (iw > 0 and ih > 0) else 0.0
        area = lambda r: (r[1, 0] - r[0, 0]) * (r[1, 1] - r[0, 1])
        union = area(a) + area(b) - inter
        return inter / union if union > 0 else 0.0

    order = sorted(range(n), key=lambda i: -scores[i])
    kept = []
    for i in order:
        if all(iou(data[i], data[j]) <= 0.3 for j in kept):
            kept.append(i)

    got_d, got_s, got_v = post.plain_nms(
        jnp.asarray(data), jnp.asarray(scores),
        jnp.asarray(np.ones(n, bool)), max_outputs=n, threshold=0.3)
    got_s = np.asarray(got_s)[np.asarray(got_v)]
    want_s = np.sort(scores[kept])[::-1]
    np.testing.assert_allclose(np.sort(got_s)[::-1], want_s, atol=1e-7)
