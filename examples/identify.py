#!/usr/bin/env python
"""Fused identification pipeline: detect -> crop -> embed in ONE
batched XLA program (``pipeline.EmbedCascade``).

The reference's identification flow pays three host round-trips per
image (detect, Mat::roi crop, embed — reference face_embeddings.rs:46-86
driven by its test :119-146).  Here the whole chain stays on device and
a batch of frames produces a [B, D] matrix of L2-normalized embeddings
in one call — the serving shape for a face-identification backend.

Runs out of the box on the bundled demo embeddings graph
(tpu_face/data/demo — synthetic weights, see its README); pass
--model-dir with a converted real model for meaningful similarities.

    python examples/identify.py [--model-dir DIR]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from tpu_face.models import FaceDetectionModel
from tpu_face.pipeline import EmbedCascade
from tpu_face.utils.image_io import load_image

IMAGES = ["/root/reference/test_data/russ_cox_1.jpg",
          "/root/reference/test_data/russ_cox_2.jpg",
          "/root/reference/test_data/man.jpg"]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model-dir",
                    default=str(Path(__file__).resolve().parent.parent
                                / "tpu_face/data/demo"))
    args = ap.parse_args()

    cascade = EmbedCascade(FaceDetectionModel.SHORT,
                           embed_model_path=args.model_dir)

    # one program per frame geometry: batch same-sized frames together
    # (here: pad all three onto one canvas for a single batch)
    imgs = [load_image(p) for p in IMAGES]
    h = max(im.shape[0] for im in imgs)
    w = max(im.shape[1] for im in imgs)
    batch = np.zeros((len(imgs), h, w, 3), np.uint8)
    for i, im in enumerate(imgs):
        batch[i, :im.shape[0], :im.shape[1]] = im

    res = cascade.infer_batch(batch)
    embs = np.asarray(res.embedding)
    valid = np.asarray(res.face_valid)
    crops = np.asarray(res.crop_bbox)
    for i, path in enumerate(IMAGES):
        name = Path(path).name
        if not valid[i]:
            print(f"{name}: no face")
            continue
        x0, y0, x1, y1 = crops[i]
        print(f"{name}: crop ({x0:.0f},{y0:.0f})-({x1:.0f},{y1:.0f}) "
              f"-> {embs.shape[1]}-d, |v|="
              f"{float(np.linalg.norm(embs[i])):.4f}")

    print("pairwise cosine similarity (demo weights: NOT semantic):")
    for i in range(len(IMAGES)):
        for j in range(i + 1, len(IMAGES)):
            if valid[i] and valid[j]:
                print(f"  {Path(IMAGES[i]).name} vs "
                      f"{Path(IMAGES[j]).name}: "
                      f"{float(embs[i] @ embs[j]):+.4f}")


if __name__ == "__main__":
    main()
