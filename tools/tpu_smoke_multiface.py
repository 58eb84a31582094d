#!/usr/bin/env python
"""TPU smoke: FaceCascade(max_faces=4) on a crowded scene, real Mosaic.

The multi-face path (vmapped mesh+iris stages per detection,
pipeline.py) is covered on CPU by tests/test_crowded_nms.py; this script
executes it on actual TPU hardware — the Pallas warp kernel included —
and checks every returned face sits in a distinct grid cell.

    python tools/tpu_smoke_multiface.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/tpu_face_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    dev = jax.devices()[0]
    print(f"device: {dev.platform} ({dev.device_kind})",
          file=sys.stderr)

    img = load_image("/root/reference/test_data/man.jpg")
    crop = img[50:240, 170:360]
    ch, cw = crop.shape[:2]
    rows, cols = 2, 2
    canvas = np.zeros((rows * ch, cols * cw, 3), np.uint8)
    for r in range(rows):
        for c in range(cols):
            canvas[r * ch:(r + 1) * ch, c * cw:(c + 1) * cw] = crop

    cascade = FaceCascade(FaceDetectionModel.FULL_SPARSE, max_faces=4,
                          nms_top_m=2304, compute_dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    res = jax.block_until_ready(cascade.infer_batch(canvas))
    print(f"compile+run: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    valid = np.asarray(res.mesh_valid[0])
    env = np.asarray(res.envelope_ok[0])
    mesh = np.asarray(res.mesh[0])
    h, w = canvas.shape[:2]
    cells = set()
    for i in range(4):
        if valid[i]:
            nose = mesh[i, 1]
            cells.add((int(nose[1] * h // (h / rows)),
                       int(nose[0] * w // (w / cols))))
    print(f"valid={valid.tolist()} envelope_ok={env.tolist()} "
          f"cells={sorted(cells)}", file=sys.stderr)
    assert valid.sum() == 4, valid
    assert len(cells) == 4, cells

    t0 = time.perf_counter()
    for _ in range(5):
        out = cascade.infer_batch(canvas)
    jax.block_until_ready(out)
    print(f"steady: {(time.perf_counter()-t0)/5*1e3:.1f} ms/frame "
          f"(max_faces=4)", file=sys.stderr)
    print("MULTIFACE SMOKE OK")


if __name__ == "__main__":
    main()
