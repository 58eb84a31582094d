"""Temporal landmark smoothing for video mode (OneEuro filter).

Raw per-frame meshes jitter: detector/mesh-CNN noise moves every
landmark a little even on a static face.  MediaPipe's production
video graphs smooth landmarks with the OneEuro filter (Casiez et al.,
CHI 2012 — an adaptive low-pass whose cutoff rises with speed, so
static points get heavy smoothing while fast motion stays responsive);
this is the TPU-native equivalent, one tiny elementwise XLA program
per step over [..., N, 3] landmark sets of B streams.

The reference library has no video mode (every call is a still
image), so there is nothing to smooth there; this subsystem matches
the upstream landmarks_smoothing_calculator semantics instead:
speed is measured relative to the face size (the landmark bbox
diagonal), so one parameter set works at every resolution and
distance.

Deliberately NOT fused into the tracker's jitted step: the filter is
stateful per stream, and keeping it a separate program leaves the
tracker step's signature (and its AOT artifacts) unchanged —
``FaceTracker(smoothing=...)`` chains it on the host side.

>>> smoother = LandmarkSmoother()               # OneEuroConfig()
>>> for frames in video_batches:
...     res = tracker.step(frames)
...     mesh = smoother(res.mesh, res.mesh_valid)
"""

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["OneEuroConfig", "LandmarkSmoother", "ResultSmoother"]


class OneEuroConfig(NamedTuple):
    """OneEuro parameters (Casiez et al. 2012).

    ``min_cutoff`` (Hz) sets smoothing at rest — lower = steadier;
    ``beta`` scales the cutoff with speed — higher = snappier motion
    (speed is in face-diagonals/second, see ``scale_by_face``);
    ``derivate_cutoff`` (Hz) low-passes the speed estimate itself;
    ``rate`` is the assumed frame rate, used only when the caller does
    not pass real inter-frame ``dt`` (variable-fps streams should —
    the upstream calculator integrates actual frame timestamps).
    """

    min_cutoff: float = 0.05
    beta: float = 10.0
    derivate_cutoff: float = 1.0
    rate: float = 30.0
    # measure speed relative to the landmark bbox diagonal (the
    # upstream calculator's object-scale normalization), so beta is
    # resolution- and distance-independent
    scale_by_face: bool = True


def _alpha(cutoff, te):
    """EMA coefficient of a first-order low-pass at ``cutoff`` Hz
    sampled ``te`` seconds after the previous sample."""
    tau = 1.0 / (2.0 * jnp.pi * cutoff)
    return 1.0 / (1.0 + tau / te)


def _one_euro_step(x, x_hat, dx_hat, cont, cfg: OneEuroConfig, te):
    """One filter update over [..., N, C] landmarks.

    ``cont`` [...] marks streams whose state continues from the
    previous frame; non-continuing streams re-initialize to the raw
    input (first frame of a track, or a re-acquired stream).
    ``te`` is the elapsed time (s) since the previous frame — the
    upstream landmarks_smoothing calculator integrates real frame
    timestamps, so a dropped frame (2x te) both doubles the measured
    speed window and doubles the low-pass step."""
    speed_scale = 1.0
    if cfg.scale_by_face:
        ext = (jnp.max(x[..., :2], axis=-2)
               - jnp.min(x[..., :2], axis=-2))          # [..., 2]
        diag = jnp.sqrt(jnp.sum(ext * ext, axis=-1))    # [...]
        # clamp: a degenerate landmark set (empty slot dummies) must
        # not blow the speed estimate up into permanent passthrough
        speed_scale = 1.0 / jnp.maximum(diag, 1e-2)[..., None, None]

    dx = (x - x_hat) / te
    a_d = _alpha(cfg.derivate_cutoff, te)
    dx_f = a_d * dx + (1.0 - a_d) * dx_hat
    cutoff = cfg.min_cutoff + cfg.beta * jnp.abs(dx_f) * speed_scale
    a = _alpha(cutoff, te)
    x_f = a * x + (1.0 - a) * x_hat

    cont_b = cont[..., None, None]
    new_hat = jnp.where(cont_b, x_f, x)
    new_d = jnp.where(cont_b, dx_f, jnp.zeros_like(dx_f))
    return new_hat, new_d


def _filter_step(x, valid, x_hat, dx_hat, ok, cfg, te):
    """Shared stateful update over one [..., N, C] point set: filter
    continuing streams, pass invalid rows through raw, reset their
    state.  Returns (out, new_x_hat, new_dx_hat, new_ok)."""
    new_hat, new_d = _one_euro_step(x, x_hat, dx_hat, ok & valid, cfg,
                                    te)
    vb = valid[..., None, None]
    return (jnp.where(vb, new_hat, x),
            jnp.where(vb, new_hat, x),
            jnp.where(vb, new_d, jnp.zeros_like(new_d)),
            valid)


class _SmootherBase:
    """Config validation + per-shape (x_hat, dx_hat, ok) state + one
    cached jitted program, shared by both smoothers."""

    def __init__(self, config: Optional[OneEuroConfig] = None):
        self.config = config if config is not None else OneEuroConfig()
        assert self.config.min_cutoff > 0 and self.config.rate > 0 \
            and self.config.derivate_cutoff > 0
        self._state = None  # (x_hat [lead+(N,C)], dx_hat, ok [lead])
        self._jitted = None

    def reset(self):
        self._state = None

    def _stored_state(self, shape, dtype, lead):
        """Existing state if it matches the combined point-set shape,
        else a fresh one (ok=False everywhere -> first call
        initializes to the raw input).  NOTE shapes are normalized
        coordinates and therefore resolution-blind: a caller that
        re-keys its streams at the same shapes (e.g. the trackers on
        a resolution change) must call ``reset()`` itself."""
        st = self._state
        if st is None or st[0].shape != shape or st[0].dtype != dtype:
            z = jnp.zeros(shape, dtype)
            st = (z, z, jnp.zeros(lead, bool))
        return st

    def _te(self, dt):
        """Elapsed seconds since the previous frame as a TRACED f32
        scalar (variable-fps streams must not retrace per dt);
        ``dt=None`` keeps the fixed-rate default 1/cfg.rate."""
        te = (1.0 / self.config.rate) if dt is None else float(dt)
        if te <= 0:
            raise ValueError(f"dt must be positive, got {dt}")
        return jnp.float32(te)


class LandmarkSmoother(_SmootherBase):
    """Stateful OneEuro smoothing over batched landmark streams.

    Call with ``landmarks [..., N, C]`` (leading dims = streams, e.g.
    [B, 468, 3] from ``FaceTracker`` or [B, K, 468, 3] from
    ``MultiFaceTracker``) and ``valid [...]`` per-stream flags; rows
    whose ``valid`` is False pass through raw and their filter state
    resets, so a re-acquired face restarts its filter instead of being
    dragged toward stale history.  State follows the input SHAPE: a
    batch-size change resets automatically, but a stream-identity or
    resolution change at the same shapes needs an explicit
    ``reset()`` (normalized coordinates look identical to the filter).
    """

    def _fn(self, x, valid, te, x_hat, dx_hat, ok):
        return _filter_step(x, valid, x_hat, dx_hat, ok, self.config,
                            te)

    def __call__(self, landmarks, valid=None, dt=None):
        """``dt``: seconds since the previous frame (real timestamps,
        the upstream semantics); ``None`` assumes 1/config.rate."""
        landmarks = jnp.asarray(landmarks)
        lead = landmarks.shape[:-2]
        if valid is None:
            valid = jnp.ones(lead, bool)
        else:
            valid = jnp.broadcast_to(jnp.asarray(valid, bool), lead)
        st = self._stored_state(landmarks.shape, landmarks.dtype, lead)
        if self._jitted is None:
            self._jitted = jax.jit(self._fn)
        out, x_hat, dx_hat, ok = self._jitted(landmarks, valid,
                                              self._te(dt), *st)
        self._state = (x_hat, dx_hat, ok)
        return out


class ResultSmoother(_SmootherBase):
    """OneEuro over a tracker result's mesh AND iris landmarks in ONE
    program (a separate iris filter would both cost an extra dispatch
    per step and normalize speed by the tiny iris bbox instead of the
    face — the 478 points are filtered as one face-scaled set).
    The concat/filter/split all happen inside the single jitted
    program, so the host API costs one dispatch per step."""

    def _fn(self, mesh, iris, valid, te, x_hat, dx_hat, ok):
        lead = mesh.shape[:-2]
        x = jnp.concatenate(
            [mesh, iris.reshape(lead + (-1, mesh.shape[-1]))], axis=-2)
        out, x_hat, dx_hat, ok = _filter_step(x, valid, x_hat, dx_hat,
                                              ok, self.config, te)
        n = mesh.shape[-2]
        return (out[..., :n, :],
                out[..., n:, :].reshape(iris.shape),
                x_hat, dx_hat, ok)

    def __call__(self, mesh, iris, valid, dt=None):
        mesh = jnp.asarray(mesh)
        iris = jnp.asarray(iris)
        lead = mesh.shape[:-2]
        valid = jnp.broadcast_to(jnp.asarray(valid, bool), lead)
        total = mesh.shape[-2] + int(
            np.prod(iris.shape[len(lead):-1]))
        comb_shape = lead + (total, mesh.shape[-1])
        st = self._stored_state(comb_shape, mesh.dtype, lead)
        if self._jitted is None:
            self._jitted = jax.jit(self._fn)
        m, ir, x_hat, dx_hat, ok = self._jitted(mesh, iris, valid,
                                                self._te(dt), *st)
        self._state = (x_hat, dx_hat, ok)
        return m, ir
