"""FaceTracker: video-mode cascade with detection-free tracking.

MediaPipe's production face pipeline runs the detector only when
tracking is lost: while the previous frame's mesh presence stays above
threshold, the next frame's face ROI is derived from the previous
landmarks (bbox over all 468 points + rotation from the eye-outer
landmarks, scale 1.5 square-long) and only the mesh+iris stages run.
The reference library has no video mode (every frame pays detection);
this is the TPU-native equivalent of the upstream
face_landmark_front.pbtxt tracking loop, kept entirely on device.

One jitted step serves B parallel streams: state is (roi [B,5],
valid [B]).  The step runs the tracking-only program for ALL streams,
then — only if any stream's tracked output is unusable — gathers up to
``repair_batch`` lost streams into a sub-batch and runs the full
detection cascade on just those frames, scattering the results back
(``lax.cond`` around the repair, so the detector CNN is genuinely
skipped at runtime when every stream is locked).  Realistic per-stream
lock churn therefore costs ~tracked(B) + full(R) per step instead of
collapsing the whole batch to the full path the moment one stream
loses lock; a mass-loss event (more lost streams than one repair pass
covers) or a forced redetect still takes the full path for everyone.
"""

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .models.face_detection import FaceDetectionModel
from .models.face_landmark import ROI_SCALE as MESH_ROI_SCALE
from .pipeline import CascadeResult, FaceCascade, _bbox_to_roi_abs
from .smoothing import OneEuroConfig, ResultSmoother

# rotation keypoints for landmark-derived ROIs: eye outer corners
# (same pair the upstream graph uses; also iris_landmark.rs:29-35's
# left-eye start / right-eye end indices)
_ROT_LEFT = 33
_ROT_RIGHT = 263


class TrackerState(NamedTuple):
    roi: jnp.ndarray     # [B, 5] absolute (cx, cy, w, h, rot)
    valid: jnp.ndarray   # [B] bool: ROI usable for the next frame


def roi_from_mesh(mesh: jnp.ndarray, image_size: Tuple[int, int]
                  ) -> jnp.ndarray:
    """Next-frame face ROI from a [468, 3] normalized mesh: bbox over
    all landmarks, rotation from the eye-outer pair, scale 1.5
    square-long (the tracking analog of face_detection_to_roi,
    reference face_landmark.rs:180-198)."""
    w, h = image_size
    xmin = jnp.min(mesh[:, 0])
    xmax = jnp.max(mesh[:, 0])
    ymin = jnp.min(mesh[:, 1])
    ymax = jnp.max(mesh[:, 1])
    kp0 = mesh[_ROT_LEFT, :2] * jnp.array([w, h], jnp.float32)
    kp1 = mesh[_ROT_RIGHT, :2] * jnp.array([w, h], jnp.float32)
    return _bbox_to_roi_abs(xmin, ymin, xmax, ymax, kp0, kp1,
                            MESH_ROI_SCALE, w, h)


def _det_from_roi(roi_abs, image_size):
    """Detection rows carrying a tracked ROI's bbox (the mesh ROI
    itself is injected downstream, not rederived from these rows)."""
    w, h = image_size
    cx, cy, rw, rh = roi_abs[0], roi_abs[1], roi_abs[2], roi_abs[3]
    half = jnp.stack([rw / w, rh / h]) / 2.0
    center = jnp.stack([cx / w, cy / h])
    return jnp.concatenate([
        (center - half)[None], (center + half)[None],
        jnp.zeros((6, 2), jnp.float32)])


class FaceTracker:
    """Stateful video cascade over B parallel streams.

    >>> tracker = FaceTracker(batch=8)
    >>> for frames in video_batches:          # [8, H, W, 3] each
    ...     result = tracker.step(frames)     # CascadeResult
    """

    def __init__(self,
                 detection_model: FaceDetectionModel =
                 FaceDetectionModel.BACK_CAMERA,
                 model_path: Optional[str] = None,
                 compute_dtype=jnp.float32,
                 warp_method: str = "auto",
                 redetect_every: Optional[int] = None,
                 input_layout: str = "hwc",
                 repair_batch: Optional[int] = None,
                 warp_profile: str = "auto",
                 smoothing=None):
        self.cascade = FaceCascade(detection_model,
                                   model_path=model_path,
                                   compute_dtype=compute_dtype,
                                   warp_method=warp_method,
                                   max_faces=1,
                                   input_layout=input_layout,
                                   warp_profile=warp_profile)
        assert self.cascade.max_faces == 1, \
            "tracking supports one face per stream"
        # opt-in OneEuro temporal smoothing of the output mesh/iris
        # landmarks ("one_euro" or an OneEuroConfig; see smoothing.py).
        # Applied to the RESULT only — next-frame ROIs keep following
        # the raw mesh, so the tracking dynamics are unchanged.
        self._init_smoothing(smoothing)
        # force a detector pass every N steps even while locked (guards
        # against slow drift); None = only on tracking loss
        self.redetect_every = redetect_every
        # per-step detection sub-batch for lost streams; None = B // 8
        # (min 1).  More simultaneous losses than this fall back to the
        # full path (and unrepaired streams recover on later steps).
        self.repair_batch = repair_batch
        self._state: Optional[TrackerState] = None
        self._state_hw: Optional[Tuple[int, int]] = None
        self._steps = 0
        self._jitted = {}

    def _repair_n(self, b: int) -> int:
        r = (self.repair_batch if self.repair_batch is not None
             else max(1, b // 8))
        return min(r, b)

    def _init_smoothing(self, smoothing):
        if smoothing is None:
            self._smoother = None
            return
        cfg = OneEuroConfig() if smoothing == "one_euro" else smoothing
        if not isinstance(cfg, OneEuroConfig):
            raise TypeError("smoothing must be None, 'one_euro' or an "
                            f"OneEuroConfig, got {smoothing!r}")
        self._smoother = ResultSmoother(cfg)

    def _smooth_result(self, res: CascadeResult, dt=None
                       ) -> CascadeResult:
        """Opt-in OneEuro smoothing of the OUTPUT landmarks; state
        rois / mesh_raw / validity stay raw (smoothing.py).  Mesh and
        iris ride ONE filter program (~0.5 ms/step dispatch here;
        negligible on a non-tunneled host).  ``dt`` = real seconds
        since the previous frame (None = the config's fixed rate)."""
        if self._smoother is None:
            return res
        mesh, iris = self._smoother(res.mesh, res.iris, res.mesh_valid,
                                    dt=dt)
        return res._replace(mesh=mesh, iris=iris)

    # ---- jitted step -----------------------------------------------------

    def _tracked_single(self, image, roi_abs, valid, image_size):
        """Mesh+iris stages only, from a landmark-derived ROI.

        ``valid`` (the stream's entry lock state) flows into
        face_valid/score — a stream without a usable ROI runs on a
        dummy ROI for shape purposes and must NOT surface as a valid
        face if the bounded repair sub-batch does not get to it."""
        c = self.cascade
        warp = c._warp
        # plane build + planar handling shared with the full cascade
        # (pipeline._prepare_frame is the single source of truth)
        img, planes = c._prepare_frame(image, image_size)
        det = _det_from_roi(roi_abs, image_size)
        return c._face_stages(img, planes, det,
                              valid.astype(jnp.float32), valid,
                              image_size, warp, face_roi_abs=roi_abs)

    # NOTE (round 3, CLOSED as a negative): a per-batch rt dispatch for
    # the tracked path ("auto"-style — two HLO conditionals around the
    # shared _mesh_half/_iris_half, predicates free off the state ROIs)
    # was built and measured SLOWER than the fused single-program path:
    # 10.1k vs 11.0k fps same-session at batch 128 (bench), because a
    # conditional boundary materializes its operands — the ~361 MB of
    # resident f32 planes crossing two conds cost ~2.2 ms/step of raw
    # copies (device trace: tools/tpu_tracked_trace.py, copy 2.53 vs
    # 0.41 ms/step) while the rt32 branch saves only ~1.0 ms of warp
    # time.  Rebuilding planes inside the branches trades the copies
    # for ~1.3 ms of duplicated pad+convert — still a net loss.  The
    # cascade's _batched_auto keeps its dispatch because detection
    # amortizes the boundary cost there (measured +6% end-to-end);
    # the tracked path always runs the fused program below.

    def _step_fn(self, images, roi, valid, force_detect, image_size):
        c = self.cascade
        b = images.shape[0]
        r = self._repair_n(b)
        w, h = image_size

        def full_path(_):
            return jax.vmap(
                lambda im: c._single(im, image_size))(images)

        def tracked_repair_path(_):
            # mesh+iris for ALL streams from the previous ROIs;
            # streams without a usable ROI get a unit dummy (NaN-free
            # warp math) and are repaired below
            dummy = jnp.array([w / 2.0, h / 2.0, 64.0, 64.0, 0.0],
                              jnp.float32)
            safe = jnp.where(valid[:, None], roi, dummy)
            res = jax.vmap(
                lambda im, rr, v: self._tracked_single(im, rr, v,
                                                       image_size)
            )(images, safe, valid)
            # unusable tracked output: no entry ROI, or presence lost
            lost = jnp.logical_not(valid & res.mesh_valid)

            def repair(cur):
                order = jnp.argsort(jnp.logical_not(lost))  # lost first
                sel = order[:r]
                sel_lost = lost[sel]
                sub = jnp.take(images, sel, axis=0)
                rres = jax.vmap(
                    lambda im: c._single(im, image_size))(sub)

                def merge(a, b_):
                    mask = sel_lost.reshape((r,) + (1,) * (b_.ndim - 1))
                    return a.at[sel].set(jnp.where(mask, b_, a[sel]))

                return jax.tree_util.tree_map(merge, cur, rres)

            return jax.lax.cond(jnp.any(lost), repair,
                                lambda cur: cur, res)

        # the full path only for forced redetects or mass entry-loss:
        # beyond one repair pass, or every stream (first step) — where
        # detection-for-all is cheaper than tracked-for-all + repair
        n_lost_entry = jnp.sum(jnp.logical_not(valid))
        use_full = (force_detect | (n_lost_entry > r)
                    | (n_lost_entry == b))
        res = jax.lax.cond(use_full, full_path, tracked_repair_path,
                           operand=None)
        next_roi = jax.vmap(
            lambda m: roi_from_mesh(m, image_size))(res.mesh)
        return res, TrackerState(next_roi, res.mesh_valid)

    def _get_jitted(self, hw):
        if hw not in self._jitted:
            h, w = hw
            self._jitted[hw] = jax.jit(
                lambda images, roi, valid, force:
                self._step_fn(images, roi, valid, force, (w, h)))
        return self._jitted[hw]

    # ---- host API --------------------------------------------------------

    def reset(self):
        self._state = None
        self._state_hw = None
        self._steps = 0
        if self._smoother is not None:
            self._smoother.reset()

    def step(self, images, dt=None) -> CascadeResult:
        """One tracked step over a [B, ...] frame batch.  ``dt``:
        seconds since the previous frame — only consumed by the
        optional OneEuro smoother (real-timestamp smoothing for
        variable-fps streams); tracking dynamics are dt-free."""
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if self.cascade._layout == "planar":
            b, _, h, w = images.shape
        else:
            b, h, w, _ = images.shape
        # stale state is unusable when the batch size OR the frame
        # resolution changes (ROIs are absolute pixels of the previous
        # resolution) — start from a clean detect
        if (self._state is None or self._state.valid.shape[0] != b
                or self._state_hw != (h, w)):
            self._state = TrackerState(
                jnp.zeros((b, 5), jnp.float32),
                jnp.zeros((b,), bool))
            self._state_hw = (h, w)
            if self._smoother is not None:
                # normalized landmark shapes are resolution-blind, so
                # the filter cannot see this reset on its own
                self._smoother.reset()
        res, self._state = self._get_jitted((h, w))(
            images, self._state.roi, self._state.valid,
            jnp.asarray(self.next_step_forced))
        self._steps += 1
        return self._smooth_result(res, dt)

    @property
    def next_step_forced(self) -> bool:
        """True when the next ``step()`` will force a detector pass
        for every stream regardless of lock state (the
        ``redetect_every`` schedule; the first step of a fresh tracker
        always detects through the mass-loss path instead).  Public so
        callers reporting detector activity (e.g. the ``track`` CLI)
        never re-derive the internal schedule."""
        return (self.redetect_every is not None
                and self._steps % self.redetect_every == 0)

    @property
    def tracking(self) -> np.ndarray:
        """Per-stream bool: a True stream enters the next step on the
        detection-free tracked path (False streams are repaired by a
        detection sub-batch, or the full path on mass loss)."""
        if self._state is None:
            return np.zeros(0, bool)
        return np.asarray(self._state.valid)


def _roi_iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """IoU of the axis-aligned bounds of two [K, 5] ROI sets."""
    def box(r):
        return jnp.stack([r[:, 0] - r[:, 2] / 2, r[:, 1] - r[:, 3] / 2,
                          r[:, 0] + r[:, 2] / 2, r[:, 1] + r[:, 3] / 2],
                         axis=1)

    ab, bb = box(a), box(b)
    x0 = jnp.maximum(ab[:, None, 0], bb[None, :, 0])
    y0 = jnp.maximum(ab[:, None, 1], bb[None, :, 1])
    x1 = jnp.minimum(ab[:, None, 2], bb[None, :, 2])
    y1 = jnp.minimum(ab[:, None, 3], bb[None, :, 3])
    inter = jnp.maximum(x1 - x0, 0.0) * jnp.maximum(y1 - y0, 0.0)
    area_a = (ab[:, 2] - ab[:, 0]) * (ab[:, 3] - ab[:, 1])
    area_b = (bb[:, 2] - bb[:, 0]) * (bb[:, 3] - bb[:, 1])
    return inter / jnp.maximum(area_a[:, None] + area_b[None, :] - inter,
                               1e-9)


def match_slots(new_roi: jnp.ndarray, new_valid: jnp.ndarray,
                prev_roi: jnp.ndarray, prev_valid: jnp.ndarray,
                iou_thresh: float = 0.1) -> jnp.ndarray:
    """Greedy IoU assignment of K re-detected faces to K previous
    slots, keeping identities stable across a re-detection.

    Returns perm [K] int32 such that slot j should take new face
    perm[j].  Matched pairs (IoU > thresh between the new and previous
    face ROIs) keep their slot; unmatched new faces (scene entries)
    fill the unmatched slots in NMS score order.  With no valid
    previous slots the permutation is the identity (initial fill stays
    in score order).  K is static, so the K-iteration greedy loop
    unrolls into straight-line XLA ops — no host sync."""
    k = new_roi.shape[0]
    m = jnp.where(new_valid[:, None] & prev_valid[None, :],
                  _roi_iou_matrix(new_roi, prev_roi), -1.0)
    slot_src = jnp.full((k,), -1, jnp.int32)
    used = jnp.zeros((k,), bool)
    for _ in range(k):
        flat = jnp.argmax(m)
        i = (flat // k).astype(jnp.int32)
        j = (flat % k).astype(jnp.int32)
        ok = m.reshape(-1)[flat] > iou_thresh
        slot_src = jnp.where(ok, slot_src.at[j].set(i), slot_src)
        used = jnp.where(ok, used.at[i].set(True), used)
        m = jnp.where(ok, m.at[i, :].set(-1.0).at[:, j].set(-1.0), m)
    unmatched = slot_src < 0
    rank = jnp.cumsum(unmatched.astype(jnp.int32)) - 1
    # stable sort: unmatched new faces in ascending index = NMS score
    # order fill the unmatched slots in slot order
    fill = jnp.argsort(used)[jnp.clip(rank, 0, k - 1)]
    return jnp.where(unmatched, fill.astype(jnp.int32), slot_src)


class MultiTrackerState(NamedTuple):
    roi: jnp.ndarray      # [B, K, 5] absolute per-face ROIs
    valid: jnp.ndarray    # [B, K] bool: slot holds a tracked face
    locked: jnp.ndarray   # [B] bool: stream may skip the detector


class MultiFaceTracker:
    """K-face video tracking over B parallel streams.

    Like ``FaceTracker`` but every stream tracks up to ``max_faces``
    faces simultaneously: while a stream stays locked, each valid face
    slot derives its next ROI from its own previous mesh and only the
    mesh+iris stages run (one program over the B*K face grid — the
    detector CNN is skipped through a real batch-level ``lax.cond``).
    A stream whose tracked output becomes unusable (any tracked face
    loses mesh presence) is re-detected IN-step by a bounded repair
    sub-batch (``repair_batch`` streams per step, like
    ``FaceTracker``); mass loss beyond that falls back to the full
    path for everyone.  Slot identity is stable while locked AND
    across re-detections: every detector pass greedily IoU-matches the
    new faces to the previous slots (``match_slots``), so a surviving
    face keeps its slot and a scene-entering face takes an empty one.
    NOTE: faces ENTERING the scene are only discovered by the detector
    — set ``redetect_every`` to rediscover periodically, exactly like
    the upstream tracking graph's re-detection interval.

    >>> tracker = MultiFaceTracker(max_faces=4)
    >>> for frames in video_batches:          # [B, H, W, 3]
    ...     result = tracker.step(frames)     # CascadeResult [B, K, ...]
    """

    def __init__(self,
                 detection_model: FaceDetectionModel =
                 FaceDetectionModel.BACK_CAMERA,
                 model_path: Optional[str] = None,
                 max_faces: int = 4,
                 compute_dtype=jnp.float32,
                 warp_method: str = "auto",
                 redetect_every: Optional[int] = None,
                 input_layout: str = "hwc",
                 repair_batch: Optional[int] = None,
                 warp_profile: str = "auto",
                 smoothing=None):
        assert max_faces >= 1
        self.cascade = FaceCascade(detection_model,
                                   model_path=model_path,
                                   compute_dtype=compute_dtype,
                                   warp_method=warp_method,
                                   max_faces=max_faces,
                                   input_layout=input_layout,
                                   warp_profile=warp_profile)
        self.max_faces = max_faces
        self.redetect_every = redetect_every
        # per-step detection sub-batch for unlocked streams (see
        # FaceTracker.repair_batch); None = B // 8, min 1
        self.repair_batch = repair_batch
        # per-slot OneEuro smoothing (identity-stable slots make the
        # [B, K] filter state meaningful; see FaceTracker)
        self._init_smoothing(smoothing)
        self._state: Optional[MultiTrackerState] = None
        self._state_hw: Optional[Tuple[int, int]] = None
        self._steps = 0
        self._jitted = {}

    _repair_n = FaceTracker._repair_n
    _init_smoothing = FaceTracker._init_smoothing
    _smooth_result = FaceTracker._smooth_result
    next_step_forced = FaceTracker.next_step_forced

    # ---- jitted step -----------------------------------------------------

    def _tracked_single(self, image, rois, valid, image_size):
        """Mesh+iris stages for K tracked faces of one frame (planes
        built once, shared by every face's warps)."""
        c = self.cascade
        img, planes = c._prepare_frame(image, image_size)
        w, h = image_size

        def per_face(roi_abs, v):
            # empty slots still execute (fixed shapes); give them a
            # unit ROI so the warp math stays NaN-free — the result is
            # masked by v anyway
            roi_abs = jnp.where(v, roi_abs,
                                jnp.array([w / 2.0, h / 2.0, 64.0,
                                           64.0, 0.0], jnp.float32))
            cx, cy = roi_abs[0], roi_abs[1]
            rw, rh = roi_abs[2], roi_abs[3]
            half = jnp.stack([rw / w, rh / h]) / 2.0
            center = jnp.stack([cx / w, cy / h])
            det = jnp.concatenate([
                (center - half)[None], (center + half)[None],
                jnp.zeros((6, 2), jnp.float32)])
            return c._face_stages(img, planes, det,
                                  v.astype(jnp.float32), v,
                                  image_size, c._warp,
                                  face_roi_abs=roi_abs)

        return jax.vmap(per_face)(rois, valid)

    def _step_fn(self, images, rois, valid, locked, force_detect,
                 image_size):
        c = self.cascade
        b = images.shape[0]
        r = self._repair_n(b)
        w, h = image_size
        scale = jnp.array([w, h, w, h, 1.0], jnp.float32)

        def reorder(res_k, proi, pval):
            # keep slot identities stable across a (re-)detection:
            # match new faces to the previous slots by ROI overlap
            perm = match_slots(res_k.face_roi * scale,
                               res_k.mesh_valid, proi, pval)
            return jax.tree_util.tree_map(lambda x: x[perm], res_k)

        def full_path(_):
            res = jax.vmap(
                lambda im: c._single(im, image_size))(images)
            res = jax.vmap(reorder)(res, rois, valid)
            return res, jnp.any(res.mesh_valid, axis=-1)

        def tracked_repair_path(_):
            res = jax.vmap(
                lambda im, rr, v: self._tracked_single(im, rr, v,
                                                       image_size)
            )(images, rois, valid)
            # a stream's tracked output is unusable if it entered
            # unlocked, or any previously-tracked face lost presence
            lost_face = jnp.any(
                valid & jnp.logical_not(res.mesh_valid), axis=-1)
            lost = jnp.logical_not(locked) | lost_face
            ok_locked = jnp.logical_not(lost) & jnp.any(res.mesh_valid,
                                                        axis=-1)

            def repair(cur):
                order = jnp.argsort(jnp.logical_not(lost))
                sel = order[:r]
                sel_lost = lost[sel]
                sub = jnp.take(images, sel, axis=0)
                rres = jax.vmap(
                    lambda im: c._single(im, image_size))(sub)
                rres = jax.vmap(reorder)(rres, rois[sel], valid[sel])

                def merge(a, b_):
                    mask = sel_lost.reshape((r,) + (1,) * (b_.ndim - 1))
                    return a.at[sel].set(jnp.where(mask, b_, a[sel]))

                merged = jax.tree_util.tree_map(merge, cur, rres)
                relocked = ok_locked.at[sel].set(jnp.where(
                    sel_lost, jnp.any(rres.mesh_valid, axis=-1),
                    ok_locked[sel]))
                return merged, relocked

            return jax.lax.cond(jnp.any(lost), repair,
                                lambda cur: (cur, ok_locked), res)

        n_unlocked = jnp.sum(jnp.logical_not(locked))
        use_full = (force_detect | (n_unlocked > r)
                    | (n_unlocked == b))
        res, next_locked = jax.lax.cond(
            use_full, full_path, tracked_repair_path, operand=None)
        next_roi = jax.vmap(jax.vmap(
            lambda m: roi_from_mesh(m, image_size)))(res.mesh)
        return res, MultiTrackerState(next_roi, res.mesh_valid,
                                      next_locked)

    def _get_jitted(self, hw):
        if hw not in self._jitted:
            h, w = hw
            self._jitted[hw] = jax.jit(
                lambda images, rois, valid, locked, force:
                self._step_fn(images, rois, valid, locked, force,
                              (w, h)))
        return self._jitted[hw]

    # ---- host API --------------------------------------------------------

    reset = FaceTracker.reset

    def step(self, images, dt=None) -> CascadeResult:
        """One tracked step (see ``FaceTracker.step``; ``dt`` feeds
        the optional smoother only)."""
        images = jnp.asarray(images)
        if images.ndim == 3:
            images = images[None]
        if self.cascade._layout == "planar":
            b, _, h, w = images.shape
        else:
            b, h, w, _ = images.shape
        k = self.max_faces
        if (self._state is None or self._state.valid.shape[0] != b
                or self._state_hw != (h, w)):
            self._state = MultiTrackerState(
                jnp.zeros((b, k, 5), jnp.float32),
                jnp.zeros((b, k), bool),
                jnp.zeros((b,), bool))
            self._state_hw = (h, w)
            if self._smoother is not None:
                # normalized landmark shapes are resolution-blind (see
                # FaceTracker.step)
                self._smoother.reset()
        res, self._state = self._get_jitted((h, w))(
            images, self._state.roi, self._state.valid,
            self._state.locked, jnp.asarray(self.next_step_forced))
        self._steps += 1
        return self._smooth_result(res, dt)

    @property
    def tracking(self) -> np.ndarray:
        """Per-stream bool: a True stream enters the next step on the
        detection-free tracked path (False streams are repaired by a
        detection sub-batch, or the full path on mass loss)."""
        if self._state is None:
            return np.zeros(0, bool)
        return np.asarray(self._state.locked)

    @property
    def face_count(self) -> np.ndarray:
        """Per-stream count of currently tracked faces."""
        if self._state is None:
            return np.zeros(0, np.int32)
        return np.asarray(self._state.valid).sum(axis=-1)
