"""CLI driver tests (``python -m tpu_face ...``): JSON contract and
ground-truth agreement on the reference test image.

The reference's equivalent surface is its example binaries
(reference: examples/face_detection.rs:6-18), which are stale and do
not compile; the CLI is tested against the same BASELINE.md numbers as
the library.
"""

import json

import pytest

from tpu_face.__main__ import main

MAN = "/root/reference/test_data/man.jpg"


def _run(capsys, argv):
    rc = main(argv)
    out = capsys.readouterr().out.strip().splitlines()[-1]
    return rc, json.loads(out)


def test_cli_info(capsys):
    rc, d = _run(capsys, ["info"])
    assert rc == 0
    assert d["backend"] == "cpu"
    assert "back" in d["models"]


def test_cli_detect_matches_baseline(capsys):
    rc, d = _run(capsys, ["detect", MAN, "--model", "back",
                          "--pixels"])
    assert rc == 0
    assert len(d["faces"]) == 1
    f = d["faces"][0]
    assert f["score"] == pytest.approx(0.9595, abs=0.002)
    assert f["bbox"] == pytest.approx([195.6, 74.1, 334.9, 213.4],
                                      abs=1.0)
    assert len(f["keypoints"]) == 6


def test_cli_iris_full_chain(tmp_path, capsys):
    png = str(tmp_path / "iris.png")
    rc, d = _run(capsys, ["iris", MAN, "--pixels", "--render", png])
    assert rc == 0
    assert len(d["mesh"]) == 468
    # refined mesh: eye contour rows replaced by iris-stage output
    assert d["mesh"][1][0] == pytest.approx(263.85, abs=1.0)
    assert d["iris_left"][0][:2] == pytest.approx([236.17, 108.88],
                                                  abs=1.0)
    assert d["iris_right"][0][:2] == pytest.approx([290.88, 108.35],
                                                   abs=1.0)
    assert all(8.0 < v < 14.0 for v in d["iris_diameter_px"])
    import os
    assert os.path.getsize(png) > 10000


def test_cli_embed_reports_missing_model(capsys):
    # the embeddings model is not bundled (reference README.md:9-10);
    # the CLI must fail cleanly with a remediation message
    rc, d = _run(capsys, ["embed", MAN, MAN])
    assert rc == 1
    assert "convert_tflite" in d["error"]


def test_cli_embed_with_converted_model(capsys):
    """embed end-to-end with a converted ArcFace-class model (the
    fixture tests/test_embeddings_arcface.py builds), asserting the
    same-person cosine similarity exceeds a sane floor."""
    pytest.importorskip("tensorflow")
    import shutil
    from pathlib import Path

    cache = Path("/tmp/tpu_face_fixtures")
    npz_dir = cache / "arcface_w0.5_v1"
    if not (npz_dir / "face_embeddings.npz").exists():
        pytest.skip("arcface fixture not built yet "
                    "(run test_embeddings_arcface first)")
    # the CLI takes ONE model dir (reference new() semantics): stage the
    # bundled detection model next to the converted embeddings graph
    det = npz_dir / "face_detection_back.npz"
    if not det.exists():
        shutil.copy(Path("tpu_face/data/face_detection_back.npz"), det)
    rc, d = _run(capsys, ["embed",
                          "/root/reference/test_data/russ_cox_1.jpg",
                          "/root/reference/test_data/russ_cox_2.jpg",
                          "--model-path", str(npz_dir)])
    assert rc == 0
    assert d["dim"] in (128, 512)
    assert d["cosine_similarity"] > 0.3


def test_cli_identify_demo_graph(capsys):
    """Fused detect->crop->embed CLI on the bundled demo embeddings
    graph: one JSON line per image, a pairwise-similarity line, and
    the demo_weights marker (similarities are not semantic)."""
    rc = main(["identify", MAN, MAN])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 0 and len(lines) == 3
    for d in lines[:2]:
        assert d["face"] is True
        assert d["demo_weights"] is True
        assert d["dim"] == 128
        assert d["crop_bbox"] == pytest.approx([195, 75, 334, 214],
                                               abs=1.5)
    pairs = lines[2]
    assert pairs["demo_weights"] is True
    # identical images -> identical crops -> cosine exactly ~1
    assert pairs["pairs"][0]["cosine_similarity"] == pytest.approx(
        1.0, abs=1e-3)


def test_cli_cascade_batch(capsys):
    """Fused-pipeline CLI: one JSON line per image, BASELINE values."""
    rc = main(["cascade", MAN, MAN, "--pixels"])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 0 and len(lines) == 2
    for d in lines:
        f = d["faces"][0]
        assert f["mesh_valid"] is True
        assert f["bbox"] == pytest.approx([195.6, 74.1, 334.9, 213.4],
                                          abs=1.5)
        assert f["nose"] == pytest.approx([263.85, 143.37], abs=1.0)
        assert f["iris_centers"][0] == pytest.approx([236.17, 108.88],
                                                     abs=1.0)


def test_cli_track_frames(tmp_path, capsys):
    """Video-tracking CLI over a frame sequence: detector skipped once
    locked, per-frame JSON rows, smoothing flag honored."""
    import numpy as np
    from PIL import Image

    from tpu_face.utils.image_io import load_image

    img = load_image(MAN)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"f{i}.png")
        Image.fromarray(np.roll(img, 3 * i, axis=1)).save(p)
        paths.append(p)

    rc = main(["track", *paths, "--pixels", "--smooth",
               "--render-dir", str(tmp_path / "overlay")])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 0 and len(lines) == 5
    rows, summary = lines[:4], lines[4]
    assert rows[0]["detector_skipped"] is False
    assert all(r["detector_skipped"] for r in rows[1:])
    for t, r in enumerate(rows):
        assert len(r["faces"]) == 1
        # smoothing lags the 3 px/frame pan by ~1 frame (OneEuro)
        assert r["faces"][0]["nose"][0] == pytest.approx(
            263.85 + 3 * t, abs=4.0)
    xs = [r["faces"][0]["nose"][0] for r in rows]
    assert all(b > a for a, b in zip(xs, xs[1:]))  # follows the pan
    import os
    for r in rows:
        assert os.path.getsize(r["render"]) > 10000
    assert summary == {"frames": 4, "detector_skipped_on": 3,
                       "smoothing": True}


def test_cli_track_redetect_every_counts_forced_passes(tmp_path,
                                                       capsys):
    """--redetect-every forces detector passes: those frames must NOT
    count as detector_skipped (the step ran the full path)."""
    import numpy as np
    from PIL import Image

    from tpu_face.utils.image_io import load_image

    img = load_image(MAN)
    paths = []
    for i in range(4):
        p = str(tmp_path / f"r{i}.png")
        Image.fromarray(np.roll(img, 2 * i, axis=1)).save(p)
        paths.append(p)

    rc = main(["track", *paths, "--redetect-every", "2"])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 0
    rows, summary = lines[:4], lines[4]
    # steps 0 and 2 are forced detector passes; 1 and 3 are tracked
    assert [r["detector_skipped"] for r in rows] == [False, True,
                                                     False, True]
    assert summary["detector_skipped_on"] == 2


def test_cli_track_rejects_mixed_sizes(tmp_path, capsys):
    import numpy as np
    from PIL import Image

    from tpu_face.utils.image_io import load_image

    img = load_image(MAN)
    a = str(tmp_path / "a.png")
    b = str(tmp_path / "b.png")
    Image.fromarray(img).save(a)
    Image.fromarray(img[:200, :300]).save(b)
    rc = main(["track", a, b])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 1
    assert "same-size" in lines[-1]["error"]


def test_cli_mesh_matches_baseline(tmp_path, capsys):
    png = str(tmp_path / "mesh.png")
    rc, d = _run(capsys, ["mesh", MAN, "--pixels", "--render", png])
    assert rc == 0
    assert len(d["mesh"]) == 468
    # raw (pre-iris-refinement) mesh: nose within the px budget
    assert d["mesh"][1][0] == pytest.approx(263.85, abs=1.0)
    assert d["mesh"][1][1] == pytest.approx(143.37, abs=1.0)
    assert d["face"]["score"] == pytest.approx(0.9595, abs=0.002)
    import os
    assert os.path.getsize(png) > 10000


@pytest.mark.slow
def test_cli_track_multiface(tmp_path, capsys):
    """--max-faces > 1 routes through MultiFaceTracker; a two-face
    scene reports both faces per frame."""
    import numpy as np
    from PIL import Image

    from tpu_face.utils.image_io import load_image

    img = load_image(MAN)
    scene = np.concatenate([img, img[:, ::-1]], axis=1)
    paths = []
    for i in range(3):
        p = str(tmp_path / f"m{i}.png")
        Image.fromarray(np.roll(scene, 2 * i, axis=1)).save(p)
        paths.append(p)

    rc = main(["track", *paths, "--max-faces", "2", "--model",
               "full_sparse", "--pixels"])
    lines = [json.loads(l) for l in
             capsys.readouterr().out.strip().splitlines()]
    assert rc == 0
    rows, summary = lines[:3], lines[3]
    for r in rows:
        assert len(r["faces"]) == 2
    assert rows[0]["detector_skipped"] is False
    assert all(r["detector_skipped"] for r in rows[1:])
    assert summary["frames"] == 3
