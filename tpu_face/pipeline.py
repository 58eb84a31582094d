"""FaceCascade: the full detect -> ROI -> mesh -> 2x iris chain as ONE
jitted, batched XLA program.

The reference runs the cascade as four separate interpreter sessions with
host round-trips between every stage (reference: lib.rs:18-84 is the
canonical driver).  Here the whole chain stays on device: the detector's
weighted NMS feeds the face-ROI math, the mesh warp, the eye-ROI math and
both iris inferences (batched together as left + mirrored right) without
ever leaving HBM; a single host transfer returns all results.  Batch is a
leading vmap axis, so the same program serves any batch size and shards
over a device mesh by batch (see sharding.py).

Stage semantics match the standalone models exactly:
  detection    face_detection.rs:205-267
  face ROI     face_landmark.rs:180-198 (scale 1.5, SquareLong, eye rot)
  face mesh    face_landmark.rs:232-305
  eye ROIs     iris_landmark.rs:268-292 (scale 2.3, SquareLong)
  iris x2      iris_landmark.rs:158-248 (right eye mirrored)
  refinement   iris_landmark.rs:380-398
"""

from functools import partial
from pathlib import Path
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .compiler import Graph, build_jax_fn, flatten_batching
from .models.face_detection import (_DATA_DIR, _MODEL_FILES, _SSD_OPTS,
                                    FaceDetectionModel)
from .models.face_landmark import ROI_SCALE as MESH_ROI_SCALE
from .models.iris_landmark import (LEFT_EYE_END, LEFT_EYE_START,
                                   LEFT_EYE_TO_FACE_LANDMARK_INDEX,
                                   RIGHT_EYE_END, RIGHT_EYE_START,
                                   RIGHT_EYE_TO_FACE_LANDMARK_INDEX)
from .models.iris_landmark import ROI_SCALE as IRIS_ROI_SCALE
from .ops import anchors as anchors_lib
from .ops import image as image_ops
from .ops import postprocess as post


class CascadeResult(NamedTuple):
    """Per-image results of the fused cascade (leading batch axis).

    All coordinates are normalized to the input image.  ``face_valid``
    gates detection+NMS validity; ``mesh_valid`` additionally applies
    the mesh presence threshold.  With ``max_faces > 1`` every field
    gains a face axis after the batch axis (e.g. mesh [B, N, 468, 3]);
    with the default ``max_faces=1`` the shapes below apply.
    """

    detection: jnp.ndarray      # [B, 8, 2] corners + 6 keypoints
    score: jnp.ndarray          # [B] detection score
    face_valid: jnp.ndarray     # [B] bool
    face_roi: jnp.ndarray       # [B, 5] (cx, cy, w, h, rot) normalized
    mesh: jnp.ndarray           # [B, 468, 3] refined with iris contours
    mesh_raw: jnp.ndarray       # [B, 468, 3] before iris refinement
    mesh_score: jnp.ndarray     # [B] presence score
    mesh_valid: jnp.ndarray     # [B] bool (presence AND envelope_ok)
    eye_rois: jnp.ndarray       # [B, 2, 5] left/right normalized
    iris: jnp.ndarray           # [B, 2, 5, 3] left/right iris landmarks
    envelope_ok: jnp.ndarray    # [B] bool: every Pallas warp of this
    # face fit the kernel's static sampling windows (always True on the
    # exact-gather path).  False = the mesh/iris coordinates sampled
    # clamped taps — treat the face as invalid (mesh_valid already
    # folds this in).


def _norm_rotation(angle):
    two_pi = 2.0 * jnp.pi
    return angle - two_pi * jnp.floor((angle + jnp.pi) / two_pi)


def _bbox_to_roi_abs(xmin, ymin, xmax, ymax, kp0, kp1, scale, w, h):
    """Normalized bbox + two rotation keypoints -> ABS (5,) ROI.

    Square-long sizing (transform.rs:87-109) with rotation from the
    keypoint pair (transform.rs:62-75), as both ROI derivations use.
    ``kp0``/``kp1`` must be in the same coordinate space the matching
    reference derivation uses: ABSOLUTE pixels for the face ROI
    (face_landmark.rs:181 scales the detection first), NORMALIZED for
    the eye ROIs (iris_landmark.rs:274 uses raw mesh landmarks) — the
    atan2 result differs between the two spaces on non-square images."""
    long_side = jnp.maximum((xmax - xmin) * w, (ymax - ymin) * h)
    rw = long_side * scale[0]
    rh = long_side * scale[1]
    cx = (xmin + xmax) / 2.0 * w
    cy = (ymin + ymax) / 2.0 * h
    rot = _norm_rotation(-jnp.arctan2(kp0[1] - kp1[1], kp1[0] - kp0[0]))
    return jnp.stack([cx, cy, rw, rh, rot])


class _DetectorBase:
    """Shared detection front-end of the fused pipelines: model
    loading, per-frame plane preparation, the whole-image detect+NMS
    stage, and the batched host API (``__call__`` / ``infer_batch``
    over a per-geometry jit cache).  ``FaceCascade`` adds the
    mesh/iris stages, ``EmbedCascade`` the crop+embed stage — each
    defines ``_single`` and a ``_profile_label``."""

    _profile_label = "cascade.infer_batch"

    def _get_jitted(self, h, w):
        key = (h, w)
        if key not in self._jitted:
            from .ops.pallas_warp import planes_fit_vmem
            if (getattr(self, "_warp_profile", "coverage") == "auto"
                    and self._warp == "pallas"
                    and hasattr(self, "_mesh_net")
                    and planes_fit_vmem(h, w)):
                # per-batch rt dispatch (FaceCascade, resident tier;
                # any max_faces — all K faces vote on the predicates)
                fn = partial(self._batched_auto, image_size=(w, h))
                self._jitted[key] = jax.jit(fn)
            else:
                fn = partial(self._single, image_size=(w, h))
                self._jitted[key] = jax.jit(jax.vmap(fn))
        return self._jitted[key]

    def __call__(self, images: jnp.ndarray):
        if self._layout == "planar":
            _, _, h, w = images.shape
        else:
            _, h, w, _ = images.shape
        return self._get_jitted(h, w)(images)

    def infer_batch(self, images):
        from .utils import profiling

        with profiling.stage(self._profile_label):
            images = jnp.asarray(images)
            if images.ndim == 3:
                images = images[None]
            return self(images)

    def _init_detection(self, detection_model, model_path, compute_dtype,
                        warp_method, max_faces, nms_top_m, input_layout,
                        warp_profile: str = "auto"):
        assert warp_profile in ("coverage", "speed", "auto"), \
            warp_profile
        # "auto" (default since 0.3.1) dispatches the warp row tile
        # per batch via real HLO conditionals: rt=32 (+7%) exactly
        # when every valid face's ROI fits its envelope, the rt=16
        # coverage config otherwise — no coverage loss, at the cost
        # of compiling both branches (applies to max_faces=1 resident
        # pallas FaceCascade; transparent fallback elsewhere).
        # "coverage" pins the probe-validated rt=16 envelope (single
        # branch, halves cascade compile time); "speed" hard-pins
        # rt=32 (+7% cascade, tools/tpu_540p_rt_probe.py: 6,935 ->
        # 7,384 fps) at ~20% smaller rotated-face envelope beyond
        # ~15 deg — for operators who know their content.  Out-of-
        # envelope faces flag envelope_ok, never go wrong.
        self._warp_profile = warp_profile
        base = Path(model_path) if model_path else _DATA_DIR
        det_graph = Graph(base / f"{_MODEL_FILES[detection_model]}.npz")
        self._det_net = build_jax_fn(det_graph, compute_dtype=compute_dtype)
        self.anchors = jnp.asarray(
            anchors_lib.ssd_generate_anchors(_SSD_OPTS[detection_model]))
        _, self.det_h, self.det_w, _ = det_graph.input_shape
        self._warp = image_ops.resolve_warp_method(warp_method)
        self._compute_dtype = compute_dtype
        # "hwc" = [B, H, W, 3] frames (reference semantics); "planar"
        # = [B, 3, H, W] channel planes as the native decoder emits
        # them (decode_jpeg_batch(planar=True)) — skips the device-side
        # deinterleave that feeds the warp kernels' channel planes
        assert input_layout in ("hwc", "planar"), input_layout
        self._layout = input_layout
        self.max_faces = max_faces
        # weighted-NMS candidate-pool bound; raise for crowded scenes
        # (see models/face_detection.py nms_top_m)
        self.nms_top_m = nms_top_m
        self._jitted = {}
        return det_graph

    def _detect_stage(self, img, planes, image_size, warp):
        """Stage 1: whole-image detection + weighted NMS (reference
        face_detection.rs:205-267).  Returns (dets [N, 8, 2]
        normalized, scores [N], valid [N]) with N = max_faces."""
        w, h = image_size
        # Whole-image ROI has rotation 0, so the warp is separable: two
        # hat matmuls, the cheapest exact path.  On the Pallas path it
        # reads the shared channel planes (separable_sample_planar —
        # zero layout transposes); elsewhere the HWC formulation.
        # named_scope labels make device traces attribute fused ops to
        # stages (utils/profiling).
        with jax.named_scope("tpu_face.detect"):
            whole = jnp.array([0.5 * w, 0.5 * h, w, h, 0.0], jnp.float32)
            # bf16 hat-matmul dots for the big-frame detection warp
            # (same one-uint8-level contract as the Pallas kernel):
            # XLA's DEFAULT matmul precision already computes in bf16,
            # so this only halves the [Ho, W, 3] intermediate's storage
            # — a wash at 540p, real traffic at >=720p.  The f32 mode
            # stays fully exact for the bench's accuracy fallback.
            dot_dtype = (jnp.bfloat16
                         if (self._compute_dtype == jnp.bfloat16
                             and max(w, h) > 720) else None)
            # geometries where int-truncated pads make the reference's
            # first letterbox resize non-identity (e.g. 200x225
            # portrait) take the exact double-resize path — statically
            # decided per frame geometry, so the common landscape/
            # square shapes never pay for it
            two = image_ops.letterbox_two_stage_params(
                (w, h), (self.det_w, self.det_h))
            if two is not None:
                tensor, padding = image_ops.letterbox_two_stage(
                    planes if warp == "pallas" else img,
                    (w, h), (self.det_w, self.det_h), two,
                    (-1.0, 1.0), planar=(warp == "pallas"))
            elif warp == "pallas":
                dx, dy, padding = image_ops._source_coords(
                    whole, (self.det_w, self.det_h), True, False)
                tensor = image_ops._normalize_pixels(
                    image_ops.separable_sample_planar(
                        planes, dx, dy, dot_dtype=dot_dtype),
                    (-1.0, 1.0), True)
            else:
                tensor, padding = image_ops.warp_image_to_tensor(
                    img, whole, (self.det_w, self.det_h),
                    keep_aspect_ratio=True, output_range=(-1.0, 1.0),
                    method=("separable" if warp == "mxu" else warp),
                    dot_dtype=dot_dtype)
            raw_boxes, raw_scores = self._det_net(tensor[None])
        with jax.named_scope("tpu_face.nms"):
            boxes = post.decode_boxes(raw_boxes[0], self.anchors,
                                      float(self.det_h))
            scores = post.clamped_sigmoid(raw_scores[0].reshape(-1))
            valid = post.detection_validity(boxes, scores)
            out_d, out_s, out_v = post.weighted_nms(
                boxes, scores, valid, max_outputs=self.max_faces,
                top_m=self.nms_top_m)
            dets = post.letterbox_removal(out_d, padding)  # [N, 8, 2]
        return dets, out_s, out_v

    def _prepare_frame(self, image, image_size):
        """(img_f32_hwc, planes) for one frame — the ONE place the
        plane build and planar->HWC handling live (the full cascade
        and the tracked path must stay in sync).

        The exact-gather paths (and the standalone-model semantics)
        work on HWC; under "planar" input the transpose only actually
        lowers on those paths (XLA DCEs it when every consumer reads
        the channel planes instead).  Padded channel planes are built
        ONCE per frame and shared by every Pallas warp of the frame
        (detection + mesh + both irises); dtype per frame size
        (_plane_cfg): f32 while VMEM-resident, bf16 beyond
        (pixel-exact for uint8 sources, halves DMA traffic).  With
        "planar" input the build is a pure pad+convert — the host
        decoder already emits channel planes
        (native_loader.decode_jpeg_batch(planar=True))."""
        img = (image if self._layout == "hwc"
               else image.transpose(1, 2, 0)).astype(jnp.float32)
        planes = None
        if self._warp == "pallas":
            from .ops.pallas_warp import make_planes
            # plane height must cover the LARGEST band any warp uses
            planes = make_planes(image,
                                 band=max(self._bands(image_size)),
                                 dtype=self._plane_cfg(image_size)[0],
                                 layout=self._layout)
        return img, planes

    @staticmethod
    def _plane_cfg(image_size):
        """Warp-plane dtype + strip y-alignment for this frame size.

        f32 planes + the rolled 128-lane window are the fastest
        measured configuration while they fit VMEM residency
        (tools/tpu_bf16_planes_probe.py: bf16+wide loses ~6% at 540p
        because the wide window cancels the vreg saving).  Beyond the
        f32 residency envelope, bf16 planes (pixel-exact for uint8
        sources) take the HBM strip-DMA path with HALVED per-block DMA
        traffic (make_planes gates residency at f32 size for every
        dtype — near-budget bf16-resident sets fail Mosaic
        compilation)."""
        from .ops.pallas_warp import plane_y_align, planes_fit_vmem
        w, h = image_size
        dtype = (jnp.float32 if planes_fit_vmem(h, w)
                 else jnp.bfloat16)
        return dtype, plane_y_align(dtype)

    def _warp_cfg(self, image_size):
        """(cw, xload, x_budget, rt): mesh/iris warp block geometry.

        Huge frames mean huge faces: a 4K close-up face warps at mesh
        ROI scales ~8x the 192 output (and iris scales ~9x the 64),
        beyond the rolled 128-lane window's extent.  Past 2560 px the
        warps switch to cw=16 with a 512-lane wide window — x-budget
        383 lanes admits ROI scale ~19 (faces to ~2400 px at 4K).  On
        a tall NARROW frame the padded plane width caps the load (the
        kernel clamps xload to it), so the budget honestly shrinks
        with it instead of over-promising the envelope.

        ``rt`` (output rows per block) trades per-warp strip traffic
        (blocks x band) against band size — larger tiles mean fewer,
        taller strips, and their rt*|dy/dv| shear term shrinks the
        x-envelope a little at nonzero rotation.  rt=16 wins both
        tiers: +4% full-cascade at 540p resident
        (tools/tpu_540p_rt_probe.py: 6,664 -> 6,935; rt=32 is faster
        still but its shear cuts the rot>=15deg envelope ~20%, not
        taken) and +9% at 1080p strips
        (tools/tpu_1080p_rt_probe.py: 2,685 -> ~2,950).  The >2560
        wide-window tier keeps rt=8 (coverage-preserving rt16 is a
        wash there — iris bands grow exactly linearly in rt,
        tools/tpu_4k_rt_probe.py).  The opt-in "speed" profile runs
        the RESIDENT tier at rt=32 (see _init_detection)."""
        from .ops.pallas_warp import padded_width, planes_fit_vmem
        w, h = image_size
        if max(image_size) > 2560:
            xload = min(512, padded_width(w))
            return 16, xload, xload - 129, 8
        if (getattr(self, "_warp_profile", "coverage") == "speed"
                and planes_fit_vmem(h, w)):
            return 32, 256, 126, 32
        return 32, 256, 126, 16

    @staticmethod
    def _bands(image_size):
        """Static warp band sizes scaled to the frame: faces (and so
        ROIs) grow with the frame, and the band must cover
        rt*roi_h/out_h source rows per tile plus rotation shear.  The
        cap rises with the frame for the same close-up-face reason as
        _warp_cfg's x window.

        Both <= 2560 tiers pair with rt=16 (_warp_cfg).  The rolled
        128-lane x-window caps the feasible ROI scale frame-
        independently (x_ext = (cw cos + rt sin) * rh/out <= 124 =>
        ROI <= ~4x the output at rot 0), so bands only have to cover
        the y-extent of x-FEASIBLE ROIs:

        * resident (<= ~720p): mesh 96 (growing to 136 near the
          residency edge where full-frame ROIs approach the x-cap),
          iris 72 — at least the rt=8/64/48 envelope at every
          rotation except a <=3% sliver near 7 deg, and larger
          beyond 15 deg (tools/tpu_540p_rt_probe.py).
        * strips (to 2560): constant 144/144 (bf16 planes add 15 rows
          of alignment slack); covers every x-feasible ROI to ~46 deg
          rotation, the same crossover the old rt=8/128 config had.

        The >2560 tier keeps the rt=8 maxdim-scaled bands."""
        from .ops.pallas_warp import planes_fit_vmem
        w, h = image_size
        maxdim = max(image_size)

        def clamp8(v, lo, cap):
            return min(cap, max(lo, -(-v // 8) * 8))

        if maxdim > 2560:
            return (clamp8(maxdim // 12, 64, 192),
                    clamp8(maxdim // 12, 32, 192))
        if planes_fit_vmem(h, w):
            return clamp8(maxdim // 8, 96, 136), 72
        return 144, 144


class FaceCascade(_DetectorBase):
    """The fused cascade.  ``infer_batch(images)`` takes a uint8/float
    batch [B, H, W, 3] (all the same size) and returns a
    ``CascadeResult`` of device arrays; ``__call__`` is the raw jitted
    function for benchmarking/sharding."""

    def __init__(self,
                 detection_model: FaceDetectionModel =
                 FaceDetectionModel.BACK_CAMERA,
                 model_path: Optional[str] = None,
                 compute_dtype=jnp.float32,
                 warp_method: str = "auto",
                 max_faces: int = 1,
                 nms_top_m: int = 128,
                 input_layout: str = "hwc",
                 warp_profile: str = "auto"):
        self._init_detection(detection_model, model_path, compute_dtype,
                             warp_method, max_faces, nms_top_m,
                             input_layout, warp_profile)
        base = Path(model_path) if model_path else _DATA_DIR
        mesh_graph = Graph(base / "face_landmark.npz")
        iris_graph = Graph(base / "iris_landmark.npz")
        self._mesh_net = build_jax_fn(mesh_graph,
                                      compute_dtype=compute_dtype)
        self._iris_net = build_jax_fn(iris_graph,
                                      compute_dtype=compute_dtype)
        if max_faces > 1:
            # the K-face program runs the per-face stages under nested
            # [B][K] vmaps; flatten the CNN batch dims or XLA lowers
            # the convs ~3x slower (lowering.flatten_batching)
            self._mesh_net = flatten_batching(self._mesh_net)
            self._iris_net = flatten_batching(self._iris_net)
        _, self.mesh_h, self.mesh_w, _ = mesh_graph.input_shape
        _, self.iris_h, self.iris_w, _ = iris_graph.input_shape

    # ---- single-image program (vmapped over batch) ---------------------

    def _single(self, image, image_size):
        # frame size does not gate the Pallas path: beyond ~720p the
        # kernel switches to HBM-resident planes with per-block strip
        # DMA (ops/pallas_warp.make_planes dispatches residency)
        warp = self._warp
        img, planes = self._prepare_frame(image, image_size)
        dets, out_s, out_v = self._detect_stage(img, planes, image_size,
                                                warp)
        if self.max_faces == 1:
            return self._face_stages(img, planes, dets[0], out_s[0],
                                     out_v[0], image_size, warp)
        return jax.vmap(
            lambda d, s, v: self._face_stages(img, planes, d, s, v,
                                              image_size, warp))(
                                                  dets, out_s, out_v)

    def _full_cfg(self, image_size, cfg=None):
        """(cw, xload, x_budget, rt, mesh_band, iris_band): the
        resolved warp config — ``cfg`` overrides the per-size default
        (the "auto" profile's per-batch rt dispatch passes explicit
        configs; everything else passes None)."""
        if cfg is not None:
            return cfg
        mesh_band, iris_band = self._bands(image_size)
        cw, xload, x_budget, rt = self._warp_cfg(image_size)
        return cw, xload, x_budget, rt, mesh_band, iris_band

    def _face_roi_from_det(self, det, image_size):
        """Stage 2: face ROI (face_landmark.rs:180-198); keypoint rows
        2 (left eye) and 3 (right eye), scale 1.5, square-long."""
        w, h = image_size
        return _bbox_to_roi_abs(
            det[0, 0], det[0, 1], det[1, 0], det[1, 1],
            det[2] * jnp.array([w, h]), det[3] * jnp.array([w, h]),
            MESH_ROI_SCALE, w, h)

    def _face_stages(self, img, planes, det, score, face_valid,
                     image_size, warp, face_roi_abs=None, cfg=None):
        """Stages 2-6 for one detected face (vmapped when
        ``max_faces > 1``).  ``face_roi_abs`` overrides stage 2 when
        the ROI comes from elsewhere (the tracking loop derives it
        from the previous frame's landmarks, tracking.py); ``cfg``
        overrides the warp config (see _full_cfg)."""
        if face_roi_abs is None:
            face_roi_abs = self._face_roi_from_det(det, image_size)
        mesh, mesh_score, env_mesh, left_roi, right_roi = \
            self._mesh_half(img, planes, face_roi_abs, image_size,
                            warp, cfg)
        refined, l_iris, r_iris, env_iris = self._iris_half(
            img, planes, mesh, left_roi, right_roi, image_size, warp,
            cfg)
        return self._assemble_result(
            det, score, face_valid, face_roi_abs, mesh, refined,
            mesh_score, left_roi, right_roi, l_iris, r_iris,
            env_mesh & env_iris, image_size)

    def _mesh_half(self, img, planes, face_roi_abs, image_size, warp,
                   cfg=None):
        """Stage 3 (mesh warp + CNN + projection) and stage 4 (eye
        ROIs) for one face.  Returns (mesh [468,3] normalized,
        mesh_score, env_ok, left_roi, right_roi)."""
        w, h = image_size
        y_align = self._plane_cfg(image_size)[1]
        cw, xload, x_budget, rt, mesh_band, _ = self._full_cfg(
            image_size, cfg)

        # Stage 3: face mesh (face_landmark.rs:232-305); the standalone
        # FaceLandmark model remains the exact path for extreme
        # geometry beyond the band envelope.
        env_ok = jnp.asarray(True)
        with jax.named_scope("tpu_face.mesh_warp"):
            if warp == "pallas":
                from .ops.pallas_warp import (envelope_ok,
                                              warp_sample_multi)
                mx, my, mesh_pad = image_ops._source_coords(
                    face_roi_abs, (self.mesh_w, self.mesh_h), False,
                    False)
                env_ok = env_ok & envelope_ok(mx, my, cw, mesh_band,
                                              y_align, x_budget, rt)
                (mesh_raw,) = warp_sample_multi(
                    None, [(mx, my)], band=mesh_band, planes=planes,
                    cw=cw, xload=xload, rt=rt)
                mesh_tensor = image_ops._normalize_pixels(
                    mesh_raw, (0.0, 1.0), True)
            else:
                mesh_tensor, mesh_pad = image_ops.warp_image_to_tensor(
                    img, face_roi_abs, (self.mesh_w, self.mesh_h),
                    keep_aspect_ratio=False, output_range=(0.0, 1.0),
                    method=warp, band=mesh_band)
        with jax.named_scope("tpu_face.mesh"):
            raw_mesh, raw_flag = self._mesh_net(mesh_tensor[None])
            mesh_score = jax.nn.sigmoid(raw_flag.reshape(()))
            mesh = post.project_landmarks(
                raw_mesh.reshape(-1), (self.mesh_w, self.mesh_h),
                image_size, mesh_pad, face_roi_abs)  # [468, 3] norm

        # Stage 4: eye ROIs (iris_landmark.rs:268-292); rotation from
        # NORMALIZED landmark coordinates, as the reference computes it
        def eye_roi(i0, i1):
            p0, p1 = mesh[i0], mesh[i1]
            xmin = jnp.minimum(p0[0], p1[0])
            xmax = jnp.maximum(p0[0], p1[0])
            ymin = jnp.minimum(p0[1], p1[1])
            ymax = jnp.maximum(p0[1], p1[1])
            return _bbox_to_roi_abs(xmin, ymin, xmax, ymax,
                                    p0[:2], p1[:2],
                                    IRIS_ROI_SCALE, w, h)

        left_roi = eye_roi(LEFT_EYE_START, LEFT_EYE_END)
        right_roi = eye_roi(RIGHT_EYE_START, RIGHT_EYE_END)
        return mesh, mesh_score, env_ok, left_roi, right_roi

    def _iris_half(self, img, planes, mesh, left_roi, right_roi,
                   image_size, warp, cfg=None):
        """Stage 5 (iris warps + CNN + projections) and stage 6 (mesh
        refinement) for one face.  Returns (refined mesh, l_iris,
        r_iris, env_ok)."""
        y_align = self._plane_cfg(image_size)[1]
        cw, xload, x_budget, rt, _, iris_band = self._full_cfg(
            image_size, cfg)
        env_ok = jnp.asarray(True)

        # Stage 5: iris x2, batched as (left, mirrored right)
        # (iris_landmark.rs:158-248).  On the Pallas path both eye
        # crops sample in ONE kernel call (single VMEM fetch of the
        # frame planes).
        with jax.named_scope("tpu_face.iris_warp"):
            if warp == "pallas":
                from .ops.pallas_warp import (envelope_ok,
                                              warp_sample_multi)
                lx, ly, lp = image_ops._source_coords(
                    left_roi, (self.iris_w, self.iris_h), True, False)
                rx, ry, rp = image_ops._source_coords(
                    right_roi, (self.iris_w, self.iris_h), True, True)
                env_ok = (env_ok
                          & envelope_ok(lx, ly, cw, iris_band,
                                        y_align, x_budget, rt)
                          & envelope_ok(rx, ry, cw, iris_band,
                                        y_align, x_budget, rt))
                lt_raw, rt_raw2 = warp_sample_multi(
                    None, [(lx, ly), (rx, ry)], band=iris_band,
                    planes=planes, cw=cw, xload=xload, rt=rt)
                lt = image_ops._normalize_pixels(lt_raw, (0.0, 1.0),
                                                 True)
                rt2 = image_ops._normalize_pixels(rt_raw2, (0.0, 1.0),
                                                  True)
            else:
                lt, lp = image_ops.warp_image_to_tensor(
                    img, left_roi, (self.iris_w, self.iris_h),
                    keep_aspect_ratio=True, output_range=(0.0, 1.0),
                    flip_horizontal=False, method=warp, band=iris_band)
                rt2, rp = image_ops.warp_image_to_tensor(
                    img, right_roi, (self.iris_w, self.iris_h),
                    keep_aspect_ratio=True, output_range=(0.0, 1.0),
                    flip_horizontal=True, method=warp, band=iris_band)
        with jax.named_scope("tpu_face.iris"):
            raw_contour, raw_iris = self._iris_net(jnp.stack([lt, rt2]))

        def project_eye(raw, roi_abs, pad, flip):
            return post.project_landmarks(
                raw.reshape(-1), (self.iris_w, self.iris_h), image_size,
                pad, roi_abs, flip_horizontal=flip)

        l_contour = project_eye(raw_contour[0], left_roi, lp, False)
        r_contour = project_eye(raw_contour[1], right_roi, rp, True)
        l_iris = project_eye(raw_iris[0], left_roi, lp, False)
        r_iris = project_eye(raw_iris[1], right_roi, rp, True)

        # Stage 6: mesh refinement (iris_landmark.rs:380-398)
        refined = mesh.at[jnp.asarray(
            LEFT_EYE_TO_FACE_LANDMARK_INDEX)].set(l_contour)
        refined = refined.at[jnp.asarray(
            RIGHT_EYE_TO_FACE_LANDMARK_INDEX)].set(r_contour)
        return refined, l_iris, r_iris, env_ok

    def _assemble_result(self, det, score, face_valid, face_roi_abs,
                         mesh, refined, mesh_score, left_roi,
                         right_roi, l_iris, r_iris, env_ok,
                         image_size):
        w, h = image_size
        inv_w = 1.0 / w
        inv_h = 1.0 / h
        to_norm = jnp.array([inv_w, inv_h, 1.0, 1.0, 1.0])
        return CascadeResult(
            detection=det,
            score=score,
            face_valid=face_valid,
            face_roi=face_roi_abs * to_norm.at[2].set(inv_w)
                                           .at[3].set(inv_h),
            mesh=refined,
            mesh_raw=mesh,
            mesh_score=mesh_score,
            mesh_valid=face_valid & (mesh_score > 0.5) & env_ok,
            eye_rois=jnp.stack([left_roi, right_roi])
                     * to_norm.at[2].set(inv_w).at[3].set(inv_h),
            iris=jnp.stack([l_iris, r_iris]),
            envelope_ok=env_ok,
        )

    # ---- "auto" warp profile: per-batch rt dispatch --------------------

    # the probe-validated rt32 speed config and the rt16 coverage
    # config of the resident tier (tools/tpu_540p_rt_probe.py)
    _AUTO_CFG32 = (32, 256, 126, 32, 96, 72)
    _AUTO_CFG16 = (32, 256, 126, 16, 96, 72)

    def _roi_fits(self, roi_abs, out_size, keep_aspect, cw, rt, band,
                  x_budget, y_align):
        """Analytic rt-feasibility of one ROI: the same extent algebra
        as ``pallas_warp.envelope_ok``, from the SHARED
        ``image.warp_derivatives`` (property-tested against the
        grid-measured version in tests/test_envelope_property.py)."""
        dxdu, dxdv, dydu, dydv = image_ops.warp_derivatives(
            roi_abs, out_size, keep_aspect, xp=jnp)
        x_ext = cw * dxdu + rt * dxdv + 2.0
        y_ext = rt * dydv + cw * dydu + 2.0 + (y_align - 1)
        return (x_ext <= float(x_budget)) & (y_ext <= band)

    def _batched_auto(self, images, image_size):
        """The "auto" profile's batched program (resident tier,
        pallas, any max_faces): after detection, TWO batch-level HLO
        conditionals run the mesh half and the iris half at rt=32
        (the measured +7% config) whenever every valid face's EXACT
        ROI fits the rt32 envelope — all K faces of all frames vote —
        falling back to the rt=16 coverage config otherwise.  Per
        batch, no host sync, and no coverage loss: infeasible
        geometry selects the wide config instead of flagging
        envelope_ok the way a hard rt=32 profile would."""
        c32, c16 = self._AUTO_CFG32, self._AUTO_CFG16
        y_align = self._plane_cfg(image_size)[1]
        img_b, planes_b = jax.vmap(
            lambda im: self._prepare_frame(im, image_size))(images)
        d, s, v = jax.vmap(
            lambda img, pl: self._detect_stage(img, pl, image_size,
                                               "pallas")
        )(img_b, planes_b)                          # [B, K, ...]
        roi_b = jax.vmap(jax.vmap(
            lambda dd: self._face_roi_from_det(dd, image_size)))(d)

        invalid = jnp.logical_not(v)                # [B, K]
        fits_m = jax.vmap(jax.vmap(lambda r: self._roi_fits(
            r, (self.mesh_w, self.mesh_h), False, c32[0], c32[3],
            c32[4], c32[2], y_align)))(roi_b)
        pred_m = jnp.all(fits_m | invalid)

        # Per-face halves under two nested vmaps — the inner (face)
        # level shares the frame's planes, exactly like _single's face
        # vmap.  img is DEAD on the pallas path (the warps read the
        # channel planes), so it must not ride the cond operand
        # tuples — a conditional boundary materializes its operands,
        # and 128 f32 frames are ~300 MB of pure copy traffic per
        # step (the cost that killed the tracked path's dispatch, see
        # tracking.py; detection amortizes it here).
        def mesh_with(cfg):
            def run(ops):
                pb, rb = ops
                return jax.vmap(lambda pl, rr_k: jax.vmap(
                    lambda rr: self._mesh_half(
                        None, pl, rr, image_size, "pallas", cfg)
                )(rr_k))(pb, rb)
            return run

        mesh, mscore, env_m, lroi, rroi = jax.lax.cond(
            pred_m, mesh_with(c32), mesh_with(c16),
            (planes_b, roi_b))

        def iris_fits(r):
            return self._roi_fits(r, (self.iris_w, self.iris_h), True,
                                  c32[0], c32[3], c32[5], c32[2],
                                  y_align)

        pred_i = jnp.all((jax.vmap(jax.vmap(iris_fits))(lroi)
                          & jax.vmap(jax.vmap(iris_fits))(rroi))
                         | invalid)

        def iris_with(cfg):
            def run(ops):
                pb, m_, lr, rr = ops
                return jax.vmap(lambda pl, mk, lk, rk: jax.vmap(
                    lambda mm, l_, r_: self._iris_half(
                        None, pl, mm, l_, r_, image_size, "pallas",
                        cfg)
                )(mk, lk, rk))(pb, m_, lr, rr)
            return run

        refined, l_ir, r_ir, env_i = jax.lax.cond(
            pred_i, iris_with(c32), iris_with(c16),
            (planes_b, mesh, lroi, rroi))

        assemble = partial(self._assemble_result,
                           image_size=image_size)
        res = jax.vmap(jax.vmap(assemble))(
            d, s, v, roi_b, mesh, refined, mscore, lroi, rroi, l_ir,
            r_ir, env_m & env_i)
        if self.max_faces == 1:
            # match _single's contract: no face axis at max_faces=1
            res = jax.tree_util.tree_map(lambda a: a[:, 0], res)
        return res

    # batched API (__call__ / infer_batch): inherited from
    # _DetectorBase; returns CascadeResult


class EmbedResult(NamedTuple):
    """Per-image results of the fused identification pipeline (leading
    batch axis; with ``max_faces > 1`` a face axis follows it)."""

    detection: jnp.ndarray   # [B, 8, 2] corners + 6 keypoints (norm)
    score: jnp.ndarray       # [B] detection score
    face_valid: jnp.ndarray  # [B] bool
    crop_bbox: jnp.ndarray   # [B, 4] ABSOLUTE (x0, y0, x1, y1) crop used
    embedding: jnp.ndarray   # [B, D] L2-normalized feature vector


class EmbedCascade(_DetectorBase):
    """Fused detect -> crop -> embed identification pipeline.

    The reference's identification flow pays three host round-trips
    (detect, crop via Mat::roi, embed — face_embeddings.rs:46-86 driven
    by its test :119-146); here detection, the axis-aligned 112x112
    crop (same int-truncated rect semantics), the embedding CNN and
    the L2 norm compile into ONE batched XLA program.  Out-of-frame
    bboxes are clamped to the image (the reference's Mat::roi would
    error); crops of invalid faces are well-defined garbage masked by
    ``face_valid``.

    Like the reference, the embeddings model is not bundled: convert
    the downloaded flatbuffer and pass ``model_path`` (see
    models/face_embeddings.py).
    """

    def __init__(self,
                 detection_model: FaceDetectionModel =
                 FaceDetectionModel.BACK_CAMERA,
                 model_path: Optional[str] = None,
                 embed_model_path: Optional[str] = None,
                 compute_dtype=jnp.float32,
                 warp_method: str = "auto",
                 max_faces: int = 1,
                 nms_top_m: int = 128,
                 input_layout: str = "hwc",
                 warp_profile: str = "auto"):
        self._init_detection(detection_model, model_path, compute_dtype,
                             warp_method, max_faces, nms_top_m,
                             input_layout, warp_profile)
        ebase = Path(embed_model_path or model_path or _DATA_DIR)
        npz = ebase / "face_embeddings.npz"
        if not npz.exists():
            raise FileNotFoundError(
                f"converted model not found: {npz} — the embeddings "
                f"model is not bundled (see reference README); download "
                f"face_embeddings.tflite and run tools/convert_tflite.py")
        egraph = Graph(npz)
        self._embed_net = build_jax_fn(egraph,
                                       compute_dtype=compute_dtype)
        if max_faces > 1:
            # same nested-vmap flattening as FaceCascade's nets
            self._embed_net = flatten_batching(self._embed_net)
        _, self.embed_h, self.embed_w, _ = egraph.input_shape

    def _embed_face(self, img, planes, det, score, face_valid,
                    image_size, warp):
        """Crop + embed for one detected face (vmapped when
        ``max_faces > 1``)."""
        from .ops.geometry import crop_roi_from_detection

        # int-truncated crop rect (face_embeddings.rs:101-109),
        # intersected with the frame so edge faces stay in-bounds
        roi_abs, crop_bbox = crop_roi_from_detection(
            det[:2].astype(jnp.float32), image_size, xp=jnp)

        with jax.named_scope("tpu_face.embed_crop"):
            if warp == "pallas":
                # axis-aligned crop -> the separable path over the
                # shared frame planes is exact
                ex, ey, _ = image_ops._source_coords(
                    roi_abs, (self.embed_w, self.embed_h), False, False)
                tensor = image_ops._normalize_pixels(
                    image_ops.separable_sample_planar(planes, ex, ey),
                    (0.0, 1.0), True)
            else:
                tensor, _ = image_ops.warp_image_to_tensor(
                    img, roi_abs, (self.embed_w, self.embed_h),
                    keep_aspect_ratio=False, output_range=(0.0, 1.0),
                    method=("separable" if warp == "mxu" else warp))
        with jax.named_scope("tpu_face.embed"):
            (raw,) = self._embed_net(tensor[None])
            flat = raw.reshape(-1)
            # eps keeps invalid-slot garbage NaN-free (utils.rs:30-33
            # divides unguarded; valid embeddings have norm >> eps)
            emb = flat * jax.lax.rsqrt(
                jnp.maximum(jnp.sum(jnp.square(flat)), 1e-12))
        return EmbedResult(
            detection=det, score=score, face_valid=face_valid,
            crop_bbox=crop_bbox, embedding=emb)

    def _single(self, image, image_size):
        warp = self._warp
        img, planes = self._prepare_frame(image, image_size)
        dets, out_s, out_v = self._detect_stage(img, planes, image_size,
                                                warp)
        if self.max_faces == 1:
            return self._embed_face(img, planes, dets[0], out_s[0],
                                    out_v[0], image_size, warp)
        return jax.vmap(
            lambda d, s, v: self._embed_face(img, planes, d, s, v,
                                             image_size, warp))(
                                                 dets, out_s, out_v)

    # batched API (__call__ / infer_batch): inherited from
    # _DetectorBase; returns EmbedResult
    _profile_label = "embed_cascade.infer_batch"
