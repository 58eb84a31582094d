#!/usr/bin/env python
"""Face embeddings + cosine similarity, end to end.

Mirrors the reference's embeddings test (reference
face_embeddings.rs:119-146): detect a face in each photo, embed the
crop, cosine-compare.  The reference's trained ArcFace .tflite is a
separate download it does not bundle (reference README.md:9-10); when
no converted model is present this example generates a
MobileFaceNet-architecture stand-in with deterministic random weights
(tools/make_arcface_tflite.py) so the full pipeline is runnable out of
the box.  Swap in a converted real model via --model-dir for meaningful
similarity scores.

    python examples/face_embeddings.py [--model-dir DIR]
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpu_face.models import (FaceDetection, FaceDetectionModel,
                             FaceEmbeddings)
from tpu_face.types import BBox
from tpu_face.utils.image_io import load_image, similarity_score

IMAGES = ["/root/reference/test_data/russ_cox_1.jpg",
          "/root/reference/test_data/russ_cox_2.jpg"]


def ensure_model(model_dir: str) -> str:
    npz = Path(model_dir) / "face_embeddings.npz"
    if npz.exists():
        return model_dir
    npz.parent.mkdir(parents=True, exist_ok=True)
    print("no converted embeddings model found — generating a "
          "MobileFaceNet stand-in (random weights, tools/"
          "make_arcface_tflite.py)...", file=sys.stderr)
    sys.path.insert(0, str(Path(__file__).resolve().parent.parent
                           / "tools"))
    from convert_tflite import convert
    from make_arcface_tflite import export
    tfl = Path(model_dir) / "face_embeddings.tflite"
    export(str(tfl), width=0.5)
    convert(str(tfl), str(npz))
    return model_dir


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir", default="/tmp/tpu_face_embeddings")
    args = ap.parse_args()

    emb = FaceEmbeddings(model_path=ensure_model(args.model_dir))
    det = FaceDetection(FaceDetectionModel.SHORT)

    vecs = []
    for path in IMAGES:
        faces = det.infer(path)
        if not faces:
            raise SystemExit(f"no face found in {path}")
        img = load_image(path)
        h, w = img.shape[:2]
        b = faces[0].bbox().scale((float(w), float(h)))
        vec = emb.infer(path, BBox(b.xmin, b.ymin, b.xmax, b.ymax))
        print(f"{Path(path).name}: bbox=({b.xmin:.0f},{b.ymin:.0f})-"
              f"({b.xmax:.0f},{b.ymax:.0f}) -> {vec.shape[0]}-d "
              f"embedding, |v|={float((vec**2).sum())**0.5:.4f}")
        vecs.append(vec)

    sim = similarity_score(vecs[0], vecs[1])
    print(f"cosine similarity: {sim:.4f}")


if __name__ == "__main__":
    main()
