#!/usr/bin/env python
"""Large-rotation oracle frames + ground truth (BASELINE.md rows).

Every e2e oracle rotation before round 5 was <= ~7 deg (man.jpg face
ROI rot is -0.027 rad, the right-eye ROI -0.105), so the framework's
rotation machinery — fused warp envelopes, the rt16/rt32 auto-dispatch
predicate, the mirrored right-iris path composed with real rotation,
rotated projection (reference transform.rs:222-234, :389-418) — was
never TFLite-oracle-checked end-to-end where it actually engages.

This tool synthesizes in-plane-rotated frames from man.jpg (lossless
PNG, rotation about the image center with cv2.warpAffine, border 0 —
the same border convention both the reference warp and ours use), then
runs the reference-transcription oracle (tools/gen_ground_truth.py:
OpenCV preprocessing + TFLite interpreter + sequential weighted NMS)
on each to produce the BASELINE.md ground-truth rows asserted by
tests/test_rotation_e2e.py.

Usage: python tools/gen_rotated_oracle.py [outdir=assets/rotated]
                                          [man|portrait]
(the optional second arg regenerates only one frame family — "man"
for the 540p/close-up set, "portrait" for the rotated russ_cox_2.)
"""

import sys
from pathlib import Path

import cv2
import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent))
sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import gen_ground_truth as oracle  # noqa: E402

SRC = "/root/reference/test_data/man.jpg"
# frame rotations (deg, CCW-positive in image coords).  The derived
# face-ROI rotation is approx -1.5 deg + theta, so +/-15 puts the ROI
# at ~13.5/-16.5 deg (right at the rt32 envelope knee) and +/-30 at
# ~28.5/-31.5 deg (well into coverage-only territory).
ANGLES = (15, -15, 30, -30)


def make_frame(angle_deg: float) -> np.ndarray:
    bgr = cv2.imread(SRC)
    h, w = bgr.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle_deg, 1.0)
    return cv2.warpAffine(bgr, m, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_CONSTANT)


def make_closeup(angle_deg: float = 30.0) -> np.ndarray:
    """Close-up rotated frame sized to flip the auto-profile's iris
    rt-dispatch predicate (pipeline._batched_auto's pred_i).

    The 540p frames' warp scales (mesh ROI ~1x the 192 output, iris
    ~0.8x the 64) sit far inside BOTH rt envelopes, so the auto
    profile's conditionals never actually flip on them.  A 704px
    square close-up puts the face ROI near ~350 px: the iris warps
    run at scale ~1.5 where the rt=32 y-extent (32*1.5*(sin+cos) at
    ~45 deg eye-line rotation) exceeds the 72-row band but rt=16's
    (16+32 split) still fits — the exact regime the +7% speed config
    must NOT be dispatched in.  The mesh warp (scale ~1.8) stays
    rt32-feasible, so the two conds genuinely diverge."""
    bgr = cv2.imread(SRC)
    crop = bgr[0:360, 85:445]               # face-centered square
    big = cv2.resize(crop, (704, 704), interpolation=cv2.INTER_LINEAR)
    m = cv2.getRotationMatrix2D((352.0, 352.0), angle_deg, 1.0)
    return cv2.warpAffine(big, m, (704, 704), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_CONSTANT)


PORTRAIT_SRC = "/root/reference/test_data/russ_cox_2.jpg"


def make_portrait(angle_deg: float) -> np.ndarray:
    """Rotated PORTRAIT frame (200x225): russ_cox_2 is the geometry
    whose int-truncated letterbox pads force the exact double-resize
    detection path (image.letterbox_two_stage_params non-None), so
    rotating it composes that arm with a large ROI rotation — an
    intersection no other oracle frame reaches."""
    bgr = cv2.imread(PORTRAIT_SRC)
    h, w = bgr.shape[:2]
    m = cv2.getRotationMatrix2D((w / 2.0, h / 2.0), angle_deg, 1.0)
    return cv2.warpAffine(bgr, m, (w, h), flags=cv2.INTER_LINEAR,
                          borderMode=cv2.BORDER_CONSTANT)


def main():
    outdir = Path(sys.argv[1] if len(sys.argv) > 1 else
                  Path(__file__).resolve().parents[1] / "assets/rotated")
    outdir.mkdir(parents=True, exist_ok=True)
    only = sys.argv[2] if len(sys.argv) > 2 else None
    if only in (None, "man"):
        for angle in ANGLES:
            name = f"man_rot{angle:+d}.png".replace("+", "p").replace(
                "-", "m")
            path = outdir / name
            cv2.imwrite(str(path), make_frame(angle))
            print(f"\n######## frame rotation {angle:+d} deg -> {path}")
            oracle.run_cascade(str(path))
        path = outdir / "man_closeup_rotp30.png"
        cv2.imwrite(str(path), make_closeup(30.0))
        print(f"\n######## close-up +30 deg -> {path}")
        oracle.run_cascade(str(path))
    if only in (None, "portrait"):
        for angle in (20, -20):
            name = f"russ2_rot{angle:+d}.png".replace(
                "+", "p").replace("-", "m")
            path = outdir / name
            cv2.imwrite(str(path), make_portrait(angle))
            print(f"\n######## portrait rotation {angle:+d} deg -> "
                  f"{path}")
            oracle.run_cascade(str(path))


if __name__ == "__main__":
    main()
