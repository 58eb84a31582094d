#!/usr/bin/env python
"""Full-cascade throughput benchmark.

Measures the fused detect -> ROI -> mesh -> 2x iris cascade
(tpu_face/pipeline.py) in frames/sec on one chip, steady state, and
prints ONE JSON line:

    {"metric": "cascade_fps_per_chip", "value": N, "unit": "frames/s",
     "vs_baseline": N / 53.8}

Baseline: the reference's full-cascade compute on its own models is
~53.8 fps (BASELINE.md: 18.6 ms = back-detect 14.3 + mesh 1.5 + 2x iris
2.8, TFLite x86 1-thread; the reference publishes no numbers of its own).

Accuracy is asserted before timing: the benched configuration must
reproduce the BASELINE.md ground truth on man.jpg (bbox IoU >= 0.99,
landmarks <= 1 px) or the bench falls back from bf16 to f32.
"""

import argparse
import json
import os
import sys
import time

import numpy as np


def _log(msg):
    print(msg, file=sys.stderr, flush=True)


def _distinct_batch(img, n, rng):
    """Mixed-content batch: every frame gets a different ROI geometry.

    Frame 0 stays the untouched man.jpg (the accuracy gate's ground
    truth); the rest are circular shifts (moves the face, so every
    warp's band geometry differs), horizontal flips (mirrors ROI
    rotation) and brightness jitter of it, plus crops of the russ_cox
    photos resized into the same canvas."""
    h, w = img.shape[:2]
    frames = [img]
    extra = []
    try:
        from PIL import Image
        for p in ("russ_cox_1.jpg", "russ_cox_2.jpg"):
            im = Image.open(f"/root/reference/test_data/{p}").convert(
                "RGB").resize((w, h), Image.BILINEAR)
            extra.append(np.asarray(im, np.uint8))
    except Exception:
        pass
    while len(frames) < n:
        i = len(frames)
        if extra and i % 5 == 4:
            base = extra[i % len(extra)]
        else:
            base = img
        dy = int(rng.integers(-h // 6, h // 6 + 1))
        dx = int(rng.integers(-w // 6, w // 6 + 1))
        f = np.roll(np.roll(base, dy, axis=0), dx, axis=1)
        if i % 3 == 1:
            f = f[:, ::-1]
        if i % 4 == 2:
            f = np.clip(f.astype(np.int16)
                        + int(rng.integers(-25, 26)), 0, 255
                        ).astype(np.uint8)
        frames.append(np.ascontiguousarray(f))
    return np.stack(frames[:n])


def _accuracy_ok(result, img_size=(540, 360)):
    """Ground-truth check on man.jpg (BASELINE.md)."""
    w, h = img_size
    det = np.asarray(result.detection[0]) * np.array([[w, h]])
    bbox = (det[0, 0], det[0, 1], det[1, 0], det[1, 1])
    gt = (195.6, 74.1, 334.9, 213.4)
    ixmin, iymin = max(bbox[0], gt[0]), max(bbox[1], gt[1])
    ixmax, iymax = min(bbox[2], gt[2]), min(bbox[3], gt[3])
    inter = max(ixmax - ixmin, 0) * max(iymax - iymin, 0)
    area = lambda r: (r[2] - r[0]) * (r[3] - r[1])
    iou = inter / (area(bbox) + area(gt) - inter)
    mesh = np.asarray(result.mesh_raw[0])
    nose = (mesh[1, 0] * w, mesh[1, 1] * h)
    iris = np.asarray(result.iris[0])
    li = (iris[0, 0, 0] * w, iris[0, 0, 1] * h)
    ok = (iou >= 0.99
          and abs(nose[0] - 263.85) <= 1.0 and abs(nose[1] - 143.37) <= 1.0
          and abs(li[0] - 236.17) <= 1.0 and abs(li[1] - 108.88) <= 1.0)
    return ok, iou, nose


def main():
    ap = argparse.ArgumentParser()
    # batch 128 is the measured throughput optimum on v5e-1 (sweep in
    # docs/PERF.md: 64/96/128/192/256/512/1024 -> 4.6/5.8/6.4/5.2/5.9/
    # 5.6/5.4 kfps; smaller working set pipelines better than more
    # amortization)
    ap.add_argument("--batch", type=int, default=128)
    # enough iterations that the one guaranteed host fetch at the end
    # (~2-45 ms tunnel RTT) stays <2% of the measured window
    ap.add_argument("--iters", type=int, default=60)
    ap.add_argument("--warmup", type=int, default=3)
    ap.add_argument("--repeats", type=int, default=3,
                    help="independent timed windows for the headline "
                         "number; value = median, spread recorded")
    ap.add_argument("--dtype", choices=["bf16", "f32", "auto"],
                    default="auto")
    ap.add_argument("--model", choices=["back", "short", "full"],
                    default="back")
    ap.add_argument("--identical", action="store_true",
                    help="bench N copies of one frame (legacy mode); "
                         "default is a mixed-content batch where every "
                         "frame has different ROI geometry")
    ap.add_argument("--skip-p50", action="store_true",
                    help="skip the batch-1 p50 latency measurement")
    ap.add_argument("--tracking", action="store_true",
                    help="(default now; kept for compatibility)")
    ap.add_argument("--no-tracking", action="store_true",
                    help="skip the video-tracking-mode measurement "
                         "(detector skipped while streams stay locked)")
    ap.add_argument("--no-churn", action="store_true",
                    help="skip the tracking-under-churn measurement "
                         "(2 streams lose lock per step, repaired by "
                         "the in-step detection sub-batch)")
    ap.add_argument("--no-multiface", action="store_true",
                    help="skip the max_faces=4 crowd-scene row")
    ap.add_argument("--no-f32-control", action="store_true",
                    help="skip the f32 accuracy-gate control row "
                         "(iou_f32): the bf16 gate margin is ~0.005 "
                         "IoU, and without a control a future dip is "
                         "not attributable to bf16 drift vs pipeline "
                         "regression")
    ap.add_argument("--no-variants", action="store_true",
                    help="skip the SHORT detector-variant throughput "
                         "row (fps_short)")
    ap.add_argument("--no-hires", action="store_true",
                    help="skip the 1080p/4K cascade + tracked rows "
                         "(fps_1080p, fps_1080p_tracked, fps_4k, "
                         "fps_4k_tracked)")
    ap.add_argument("--no-embed", action="store_true",
                    help="skip the fused detect->crop->embed "
                         "(EmbedCascade) measurement on the demo "
                         "embeddings graph")
    ap.add_argument("--warp-profile",
                    choices=["coverage", "speed", "auto"],
                    default="auto",
                    help="'auto' (default, matches the library "
                         "default) dispatches rt per batch on exact "
                         "ROI feasibility (speed when it fits, "
                         "coverage otherwise, no coverage loss); "
                         "'coverage' pins the rt=16 envelope; "
                         "'speed' hard-pins rt=32 (+7%% cascade, "
                         "~20%% smaller rotated-face envelope beyond "
                         "~15 deg)")
    ap.add_argument("--layout", choices=["hwc", "planar"],
                    default="hwc",
                    help="frame layout fed to the cascade: hwc = "
                         "[B,H,W,3] (reference semantics), planar = "
                         "[B,3,H,W] channel planes as the native "
                         "decoder emits them (decode_jpeg_batch("
                         "planar=True)) — skips the on-device "
                         "deinterleave")
    args = ap.parse_args()

    import jax

    # persistent compile cache: first run pays ~minutes of XLA/Mosaic
    # compilation, later runs start hot
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR",
                                     "/tmp/tpu_face_jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from tpu_face.models.face_detection import FaceDetectionModel
    from tpu_face.pipeline import FaceCascade
    from tpu_face.utils.image_io import load_image

    model = {"back": FaceDetectionModel.BACK_CAMERA,
             "short": FaceDetectionModel.SHORT,
             "full": FaceDetectionModel.FULL}[args.model]

    dev = jax.devices()[0]
    _log(f"device: {dev.platform} ({dev.device_kind}); "
         f"batch={args.batch} model={args.model}")

    img = load_image("/root/reference/test_data/man.jpg")
    if args.identical:
        batch = np.broadcast_to(img, (args.batch,) + img.shape)
        batch = np.ascontiguousarray(batch)
    else:
        batch = _distinct_batch(img, args.batch,
                                np.random.default_rng(0))
    if args.layout == "planar":
        # the layout the native decoder emits directly
        # (decode_jpeg_batch(planar=True)); transposed here because
        # this bench's frames come from synthetic variations, not
        # the JPEG loader
        batch = np.ascontiguousarray(batch.transpose(0, 3, 1, 2))
    batch = jnp.asarray(batch)

    order = (["bf16", "f32"] if args.dtype == "auto" else [args.dtype])
    cascade = None
    gate_iou = None
    for name in order:
        dtype = jnp.bfloat16 if name == "bf16" else jnp.float32
        cand = FaceCascade(model, compute_dtype=dtype,
                           input_layout=args.layout,
                           warp_profile=args.warp_profile)
        result = jax.block_until_ready(cand(batch[:1]))
        ok, iou, nose = _accuracy_ok(result)
        _log(f"{name}: accuracy ok={ok} iou={iou:.4f} nose={nose}")
        if ok:
            cascade = cand
            chosen = name
            gate_iou = float(iou)
            break
    if cascade is None:
        _log("no configuration met the accuracy budget")
        sys.exit(1)

    # f32 control next to the bf16 gate: the bf16 margin is ~0.005 IoU
    # above the 0.99 floor, so the artifact records what the SAME
    # pipeline scores at f32 — a future gate dip is then attributable
    # (bf16 numeric drift moves only the bf16 row; a pipeline
    # regression moves both).  No timing, one batch-1 pass.
    iou_f32 = None
    if chosen == "bf16" and not args.no_f32_control:
        try:
            ctl = FaceCascade(model, compute_dtype=jnp.float32,
                              input_layout=args.layout,
                              warp_profile=args.warp_profile)
            _, iou_f32, _ = _accuracy_ok(
                jax.block_until_ready(ctl(batch[:1])))
            iou_f32 = float(iou_f32)
            _log(f"f32 control: iou={iou_f32:.4f} "
                 f"(bf16 gate {gate_iou:.4f})")
            del ctl
        except Exception as e:                      # noqa: BLE001
            _log(f"f32 control skipped: {e}")

    # tunnel RTT probe, recorded in the JSON: the dev-tunnel fetch
    # round-trip varies 2-45 ms between sessions (docs/PERF.md) and is
    # the dominant term of p50_batch1_ms — recording it next to the
    # latency rows makes "tunnel was slow today" distinguishable from
    # a real dispatch regression in the artifact itself.
    one_f32 = batch[:1].astype(jnp.float32)
    rtts = []
    for i in range(7):
        # a FRESH tiny device value each probe: fetching the same
        # array twice reads jax's host-side cache and measures 0
        scal = one_f32.ravel()[0] + jnp.float32(i)
        jax.block_until_ready(scal)
        t0 = time.perf_counter()
        np.asarray(scal)
        rtts.append(time.perf_counter() - t0)
    rtt = float(np.median(rtts))
    _log(f"tunnel fetch RTT: {rtt * 1e3:.2f} ms (median of 7)")

    # compile for the bench batch, then steady-state timing.  Three
    # independent timed windows -> value = median, spread recorded:
    # a single window cannot distinguish session variance (tunnel /
    # nproc=1 host contention) from a real regression.
    jax.block_until_ready(cascade(batch))
    for _ in range(args.warmup):
        jax.block_until_ready(cascade(batch))
    def timed_window():
        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = cascade(batch)
        # one tiny host fetch instead of trusting block_until_ready:
        # the device executes enqueued programs in order, so
        # materializing any leaf of the LAST step proves every
        # iteration finished.  (Through a tunneled backend
        # block_until_ready has been observed to no-op, which would
        # silently time dispatch instead of compute.)
        np.asarray(out.score)
        jax.block_until_ready(out)
        return args.batch * args.iters / (time.perf_counter() - t0)

    window_fps = [timed_window() for _ in range(args.repeats)]
    spread = lambda ws: (max(ws) - min(ws)) / np.median(ws) * 100.0
    # contention-adaptive: a >2% window spread on this nproc=1 box
    # means another host process starved the TPU driver thread during
    # at least one window (the round-3 driver capture read 6% low for
    # exactly this reason).  Extra windows give the median a chance to
    # land on uncontended ones; the count is recorded so the artifact
    # says whether it needed them.
    while spread(window_fps) > 2.0 and len(window_fps) < args.repeats + 4:
        _log(f"window spread {spread(window_fps):.1f}% > 2% — host "
             f"contention suspected, timing an extra window")
        window_fps.append(timed_window())
    fps = float(np.median(window_fps))
    spread_pct = float(spread(window_fps))
    step_ms = args.batch / fps * 1e3
    _log(f"dtype={chosen} {fps:.1f} frames/s "
         f"(windows: {', '.join(f'{w:.0f}' for w in window_fps)}; "
         f"spread {spread_pct:.1f}%); {step_ms:.2f} ms/step "
         f"({step_ms / args.batch:.4f} ms/frame)"
         f"{' [identical frames]' if args.identical else ' [distinct]'}")

    # MFU: CNN FLOPs per frame (detect + mesh + 2x iris graphs; the
    # warps/NMS add none of the MXU work) against the chip's bf16 peak
    mfu_pct = None
    try:
        from tpu_face.compiler import Graph, graph_flops
        from tpu_face.models.face_detection import (_DATA_DIR,
                                                    _MODEL_FILES)
        det_g = Graph(_DATA_DIR / f"{_MODEL_FILES[model]}.npz")
        mesh_g = Graph(_DATA_DIR / "face_landmark.npz")
        iris_g = Graph(_DATA_DIR / "iris_landmark.npz")
        flops_frame = (graph_flops(det_g) + graph_flops(mesh_g)
                       + 2 * graph_flops(iris_g))
        peak = 197e12  # v5e bf16 peak (docs/PERF.md)
        mfu_pct = 100.0 * fps * flops_frame / peak
        _log(f"MFU: {mfu_pct:.2f}% ({flops_frame / 1e6:.0f} MFLOP/frame"
             f" at {fps:.0f} fps vs {peak / 1e12:.0f} TFLOP/s peak)")
    except Exception as e:                          # noqa: BLE001
        _log(f"mfu computation skipped: {e}")

    # achieved HBM bandwidth against the modeled ideal-fusion traffic
    # (tpu_face/compiler/traffic.py; table in tools/cascade_roofline.py
    # + docs/PERF.md): for a workload whose stated ceiling is HBM
    # traffic, bytes/s vs the 819 GB/s peak is the honest utilization
    # metric next to MFU.  The model is a LOWER bound on real traffic,
    # so the percentage is conservative.
    hbm_gbps = None
    try:
        from tpu_face.compiler import Graph as _G
        from tpu_face.compiler.traffic import cascade_bytes_per_frame
        from tpu_face.models.face_detection import (_DATA_DIR,
                                                    _MODEL_FILES)
        if args.layout == "planar":
            _, _, bh0, bw0 = batch.shape
        else:
            _, bh0, bw0, _ = batch.shape
        bpf = cascade_bytes_per_frame(
            (bw0, bh0), args.batch,
            _G(_DATA_DIR / f"{_MODEL_FILES[model]}.npz"),
            _G(_DATA_DIR / "face_landmark.npz"),
            _G(_DATA_DIR / "iris_landmark.npz"))
        hbm_gbps = fps * bpf / 1e9
        _log(f"achieved HBM bandwidth (modeled {bpf / 1e6:.1f} "
             f"MB/frame ideal-fusion traffic): {hbm_gbps:.0f} GB/s "
             f"= {hbm_gbps / 819 * 100:.0f}% of v5e peak")
    except Exception as e:                          # noqa: BLE001
        _log(f"hbm model skipped: {e}")

    # batch-1 p50 latency (BASELINE.md deliverable): single frame,
    # host-to-host, steady state — through the dev tunnel this is
    # dominated by the ~20 ms fetch RTT, so the device-only number is
    # measured separately below
    p50_ms = None
    p50_device_ms = None
    p50_device_ms_b8 = None
    if not args.skip_p50:
        one = batch[:1]
        jax.block_until_ready(cascade(one))
        lats = []
        for _ in range(30):
            t0 = time.perf_counter()
            r = cascade(one)
            np.asarray(r.score)  # force completion (see note above)
            lats.append(time.perf_counter() - t0)
        p50_ms = float(np.median(lats) * 1e3)
        _log(f"batch-1 p50 latency: {p50_ms:.2f} ms (host-to-host, "
             f"incl. transfer)")
        # device-only: a jitted fori_loop runs the whole cascade K
        # times back-to-back ON DEVICE.  The loop-carried acc*0.0 term
        # (not foldable for floats — NaN semantics) makes each
        # iteration data-depend on the previous one, so XLA cannot
        # hoist the loop-invariant cascade out; neither per-call
        # dispatch nor the tunnel is inside the measured window.
        from functools import partial as _partial

        if args.layout == "planar":
            _, _, bh, bw = batch.shape
        else:
            _, bh, bw, _ = batch.shape
        single = _partial(cascade._single, image_size=(bw, bh))
        one_f = one.astype(jnp.float32)

        @_partial(jax.jit, static_argnames="n")
        def rep(im, n):
            def body(i, acc):
                rr = jax.vmap(single)(im + acc * 0.0)
                return acc + jnp.sum(rr.score) * 0.0
            return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

        # k large enough that the +-RTT-variance of the single window
        # fetch (2-45 ms between sessions, docs/PERF.md) contributes
        # <0.1 ms/call of error; RTT itself measured once above and
        # recorded in the JSON
        k = 200
        np.asarray(rep(one_f, k))        # compile + warm
        windows = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(rep(one_f, k))
            windows.append((time.perf_counter() - t0 - rtt) / k)
        p50_device_ms = float(np.median(windows) * 1e3)
        _log(f"batch-1 device-only latency: {p50_device_ms:.3f} ms "
             f"(on-device repeat loop, fetch RTT {rtt * 1e3:.2f} ms "
             f"excluded)")

        # serving batch (b=8): same device-only repeat-loop number,
        # the latency a realistic serving batch sees on chip
        eight = batch[:8].astype(jnp.float32)
        k8 = 100
        np.asarray(rep(eight, k8))
        windows = []
        for _ in range(5):
            t0 = time.perf_counter()
            np.asarray(rep(eight, k8))
            windows.append((time.perf_counter() - t0 - rtt) / k8)
        p50_device_ms_b8 = float(np.median(windows) * 1e3)
        _log(f"batch-8 device-only latency: {p50_device_ms_b8:.3f} ms "
             f"({p50_device_ms_b8 / 8:.3f} ms/frame)")

    # trace-free serving path (docs/SERVING.md): save an
    # executable-kind AOT artifact at the serving batch, attach it
    # (installs into _jitted, so the host API skips tracing) and
    # measure steady-state host-to-host latency through it.  With
    # rtt_ms recorded alongside, the device+dispatch share is
    # directly readable from the artifact.
    p50_aot_b8_ms = None
    aot_error = None
    if not args.skip_p50:
        try:
            import tempfile

            from tpu_face import aot

            h, w = ((batch.shape[2], batch.shape[3])
                    if args.layout == "planar"
                    else (batch.shape[1], batch.shape[2]))
            scas = FaceCascade(model,
                               compute_dtype=(jnp.bfloat16
                                              if chosen == "bf16"
                                              else jnp.float32),
                               input_layout=args.layout,
                               warp_profile=args.warp_profile)
            with tempfile.TemporaryDirectory() as td:
                art = f"{td}/cascade_b8.tpuface"
                aot.save(scas, art, batch=8, height=h, width=w,
                         kind="executable")
                aot.attach(scas, art)
            eight_u8 = batch[:8]
            r = scas(eight_u8)           # warm the attached program
            np.asarray(r.score)
            lats = []
            for _ in range(30):
                t0 = time.perf_counter()
                r = scas(eight_u8)
                np.asarray(r.score)
                lats.append(time.perf_counter() - t0)
            p50_aot_b8_ms = float(np.median(lats) * 1e3)
            _log(f"batch-8 AOT-executable p50: {p50_aot_b8_ms:.2f} ms "
                 f"host-to-host (trace-free attached program; fetch "
                 f"RTT {rtt * 1e3:.2f} ms of that is tunnel)")
        except Exception as e:                      # noqa: BLE001
            aot_error = str(e)
            _log(f"AOT serving measurement failed: {e}")

    tracking_fps = None
    tracking_churn_fps = None
    tracking_error = None
    if not args.no_tracking:
        # measured by default but NEVER allowed to fail the bench —
        # the canonical cascade metric above is already recorded; a
        # failure is surfaced in the JSON record (tracking_error) so a
        # regression is visible in the artifact, not just stderr
        try:
            from tpu_face.tracking import FaceTracker

            tracker = FaceTracker(model,
                                  compute_dtype=(jnp.bfloat16
                                                 if chosen == "bf16"
                                                 else jnp.float32),
                                  input_layout=args.layout,
                                  warp_profile=args.warp_profile)
            r = tracker.step(batch)        # lock (full path) + compile
            np.asarray(r.score)
            assert tracker.tracking.all(), "tracking failed to lock"
            r = tracker.step(batch)        # compile tracked path
            np.asarray(r.score)
            assert tracker.tracking.all(), "tracking lost during warmup"
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = tracker.step(batch)
            np.asarray(r.score)
            dt = time.perf_counter() - t0
            # the number is only "tracking mode" if lock held the whole
            # loop — a lost stream silently runs the repair sub-batch
            assert tracker.tracking.all(), \
                "tracking lost mid-loop; tracking_fps would be invalid"
            tracking_fps = args.batch * args.iters / dt
            _log(f"tracking mode: {tracking_fps:.1f} frames/s "
                 f"({dt / args.iters * 1e3:.2f} ms/step, detector "
                 f"skipped)")

            if not args.no_churn and args.batch >= 8:
                # realistic lock churn: CHURN streams go dark each
                # step (rotating), lose mesh presence, and are
                # re-detected by the in-step repair sub-batch.  All
                # frame mutation happens on device (one jnp.where per
                # step) — no host transfers inside the loop.
                churn = max(2, args.batch // 64)   # ~1.6% of streams
                period = 32
                masks = np.zeros((period, args.batch), bool)
                for i in range(period):
                    for c in range(churn):
                        masks[i, (i * churn + c) % args.batch] = True
                masks_d = jnp.asarray(masks)
                mshape = ((args.batch, 1, 1, 1))
                # repair sub-batch sized to the churn rate (covers the
                # steady state of churn new losses + churn recovering
                # streams, with 2x burst headroom): a small detection
                # batch amortizes far better than the default B/8
                tracker = FaceTracker(model,
                                      compute_dtype=(jnp.bfloat16
                                                     if chosen == "bf16"
                                                     else jnp.float32),
                                      input_layout=args.layout,
                                      repair_batch=4 * churn,
                                      warp_profile=args.warp_profile)
                tracker.step(batch)               # lock (full path)
                for i in range(3):                # compile churn path
                    cur = jnp.where(masks_d[i].reshape(mshape),
                                    jnp.uint8(0), batch)
                    r = tracker.step(cur)
                np.asarray(r.score)
                t0 = time.perf_counter()
                for i in range(args.iters):
                    cur = jnp.where(masks_d[i % period].reshape(mshape),
                                    jnp.uint8(0), batch)
                    r = tracker.step(cur)
                np.asarray(r.score)
                dt = time.perf_counter() - t0
                # repair keeps losses bounded: only the currently-dark
                # streams and the just-recovered ones may be unlocked
                n_lost = int((~tracker.tracking).sum())
                assert n_lost <= 2 * churn, \
                    f"churn backlog grew to {n_lost} lost streams"
                tracking_churn_fps = args.batch * args.iters / dt
                _log(f"tracking w/ churn ({churn}/{args.batch} "
                     f"streams/step): {tracking_churn_fps:.1f} "
                     f"frames/s ({dt / args.iters * 1e3:.2f} ms/step, "
                     f"{n_lost} lost at end)")
        except Exception as e:                      # noqa: BLE001
            tracking_error = str(e)
            _log(f"tracking measurement failed: {e}")

    embed_fps = None
    embed_error = None
    if not args.no_embed:
        # fused detect -> crop -> embed serving pipeline on the demo
        # (synthetic-weight) embeddings graph — the real model is not
        # bundled, but the program shape/throughput is the same class
        try:
            from pathlib import Path

            from tpu_face.pipeline import EmbedCascade

            demo = Path(__file__).parent / "tpu_face/data/demo"
            ecas = EmbedCascade(model, embed_model_path=str(demo),
                                compute_dtype=(jnp.bfloat16
                                               if chosen == "bf16"
                                               else jnp.float32),
                                input_layout=args.layout,
                                warp_profile=args.warp_profile)
            r = ecas(batch)
            np.asarray(r.score)
            assert bool(np.asarray(r.face_valid[0])), "no face embedded"
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = ecas(batch)
            np.asarray(r.score)
            dt = time.perf_counter() - t0
            embed_fps = args.batch * args.iters / dt
            _log(f"embed cascade: {embed_fps:.1f} frames/s "
                 f"({dt / args.iters * 1e3:.2f} ms/step)")
        except Exception as e:                      # noqa: BLE001
            embed_error = str(e)
            _log(f"embed measurement failed: {e}")

    multiface_faces = None
    multiface_error = None
    if not args.no_multiface:
        # K-face crowd scene: a 2x2 grid of the man.jpg face crop,
        # FULL_SPARSE detector, max_faces=4 — records faces/s of the
        # vmapped per-face path (flat-batch CNNs + exact full-pool
        # NMS; tools/tpu_multiface_times.py is the standalone probe)
        try:
            from tpu_face.models.face_detection import \
                FaceDetectionModel
            from tpu_face.pipeline import FaceCascade
            from tpu_face.utils.image_io import load_image

            src = load_image("/root/reference/test_data/man.jpg")
            crop = src[50:240, 170:360]
            ch, cw = crop.shape[:2]
            canvas = np.zeros((2 * ch, 2 * cw, 3), np.uint8)
            for rr in range(2):
                for cc in range(2):
                    canvas[rr * ch:(rr + 1) * ch,
                           cc * cw:(cc + 1) * cw] = crop
            mb = min(args.batch, 32)
            mbatch = jnp.asarray(np.stack([canvas] * mb))
            mcas = FaceCascade(FaceDetectionModel.FULL_SPARSE,
                               max_faces=4,
                               compute_dtype=(jnp.bfloat16
                                              if chosen == "bf16"
                                              else jnp.float32))
            r = mcas(mbatch)
            np.asarray(r.score.ravel()[0])
            nf = float(np.asarray(r.mesh_valid).sum()) / mb
            assert nf >= 3.9, f"crowd scene found {nf:.2f}/4 faces"
            t0 = time.perf_counter()
            for _ in range(args.iters):
                r = mcas(mbatch)
            np.asarray(r.score.ravel()[0])
            dt = time.perf_counter() - t0
            multiface_faces = mb * args.iters * nf / dt
            _log(f"multiface (K=4 crowd, batch {mb}): "
                 f"{multiface_faces:.1f} faces/s "
                 f"({dt / args.iters * 1e3:.2f} ms/step)")
        except Exception as e:                      # noqa: BLE001
            multiface_error = str(e)
            _log(f"multiface measurement failed: {e}")

    variant_fps = {}
    variant_error = None
    if not args.no_variants:
        # Detector-variant throughput rows: 4 of 5 variants had parity
        # tests but no recorded TPU fps before round 5 — a serving
        # user choosing the cheap SHORT model (or the 192-sq FULL,
        # whose shapes FULL_SPARSE shares) had no artifact row.  Same
        # frames/layout/profile as the headline; each variant is gated
        # on its own BASELINE.md man.jpg bbox before timing.
        gts = {"short": (FaceDetectionModel.SHORT,
                         (199.8, 74.6, 335.7, 210.6)),
               "full": (FaceDetectionModel.FULL,
                        (187.1, 60.7, 339.6, 213.2))}
        for vname, (vmodel, vgt) in gts.items():
            if vmodel == model:
                continue                    # already the headline row
            try:
                vcas = FaceCascade(vmodel,
                                   compute_dtype=(jnp.bfloat16
                                                  if chosen == "bf16"
                                                  else jnp.float32),
                                   input_layout=args.layout,
                                   warp_profile=args.warp_profile)
                r = vcas(batch)
                np.asarray(r.score.ravel()[0])
                det0 = np.asarray(r.detection[0]) * np.array(
                    [[540, 360]])
                vb = (det0[0, 0], det0[0, 1], det0[1, 0], det0[1, 1])
                ix0, iy0 = max(vb[0], vgt[0]), max(vb[1], vgt[1])
                ix1, iy1 = min(vb[2], vgt[2]), min(vb[3], vgt[3])
                inter = max(ix1 - ix0, 0) * max(iy1 - iy0, 0)
                area = lambda r_: ((r_[2] - r_[0])   # noqa: E731
                                   * (r_[3] - r_[1]))
                viou = inter / (area(vb) + area(vgt) - inter)
                assert viou >= 0.99, \
                    f"{vname}-variant gate IoU {viou:.4f}"
                it = min(args.iters, 30)
                wins = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    for _ in range(it):
                        r = vcas(batch)
                    np.asarray(r.score.ravel()[0])
                    wins.append(args.batch * it
                                / (time.perf_counter() - t0))
                variant_fps[vname] = float(max(wins))
                _log(f"{vname}-variant cascade: "
                     f"{variant_fps[vname]:.1f} frames/s "
                     f"(gate IoU {viou:.4f})")
                del vcas
            except Exception as e:                  # noqa: BLE001
                variant_error = f"{vname}: {e}"
                _log(f"{vname}-variant measurement failed: {e}")

    hires = {}
    hires_error = None
    if not args.no_hires:
        # 1080p / 4K cascade + tracked rows, re-measured at HEAD every
        # round: before round 5 the README's hires numbers came from
        # round-3 probe prose (tools/tpu_1080p_cascade.py,
        # tpu_tracked_res_probe.py) and could rot silently.  Frame
        # construction matches tpu_tracked_res_probe.py: man.jpg
        # letterboxed onto a 16:9 canvas (face keeps its aspect at
        # every size), planar ingestion — the layout the native
        # decoder emits for free; the cascade rows roll/flip frames so
        # every warp's band geometry differs.
        try:
            from PIL import Image

            from tpu_face.tracking import FaceTracker

            src = Image.open(
                "/root/reference/test_data/man.jpg").convert("RGB")
            hdtype = (jnp.bfloat16 if chosen == "bf16"
                      else jnp.float32)
            rng = np.random.default_rng(0)
            # batches match the configurations docs/PERF.md's claims
            # were measured at (1080p cascade b64 / tracked b32; 4K
            # cascade b8 / tracked b32); iters sized for >=0.4 s
            # windows per the measurement-discipline rules
            tiers = (("1080p", 1080, 64, 25, 32, 50),
                     ("4k", 2160, 8, 50, 32, 25))
            for label, height, cb, cit, tb, tit in tiers:
                width = height * 16 // 9
                scale = min(width / src.width, height / src.height)
                fw, fh = int(src.width * scale), int(src.height * scale)
                face = np.asarray(src.resize((fw, fh), Image.BILINEAR),
                                  np.uint8)
                canvas = np.zeros((height, width, 3), np.uint8)
                y0, x0 = (height - fh) // 2, (width - fw) // 2
                canvas[y0:y0 + fh, x0:x0 + fw] = face
                frames = [canvas]
                while len(frames) < cb:
                    f = np.roll(canvas,
                                int(rng.integers(-width // 10,
                                                 width // 10)), axis=1)
                    if len(frames) % 3 == 1:
                        f = f[:, ::-1]
                    frames.append(np.ascontiguousarray(f))
                hbatch = jnp.asarray(np.ascontiguousarray(
                    np.stack(frames).transpose(0, 3, 1, 2)))

                hc = FaceCascade(model, compute_dtype=hdtype,
                                 input_layout="planar",
                                 warp_profile=args.warp_profile)
                r = hc(hbatch)
                np.asarray(r.score.ravel()[0])
                assert bool(np.asarray(r.mesh_valid[0])), \
                    f"{label}: face lost in cascade"
                wins = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    for _ in range(cit):
                        r = hc(hbatch)
                    np.asarray(r.score.ravel()[0])
                    wins.append(cb * cit / (time.perf_counter() - t0))
                hires[f"fps_{label}"] = float(max(wins))
                hires[f"batch_{label}"] = cb
                _log(f"{label} cascade (batch {cb}, planar): "
                     f"{hires[f'fps_{label}']:.1f} frames/s")
                del hc, r, hbatch

                tr = FaceTracker(model, compute_dtype=hdtype,
                                 input_layout="planar",
                                 warp_profile=args.warp_profile)
                ident = jnp.asarray(np.ascontiguousarray(
                    np.broadcast_to(canvas.transpose(2, 0, 1),
                                    (tb, 3, height, width))))
                rr = tr.step(ident)
                np.asarray(rr.score.ravel()[0])
                rr = tr.step(ident)          # tracked-path compile
                np.asarray(rr.score.ravel()[0])
                assert bool(np.asarray(tr.tracking).all()), \
                    f"{label}: tracker failed to lock"
                wins = []
                for _ in range(2):
                    t0 = time.perf_counter()
                    for _ in range(tit):
                        rr = tr.step(ident)
                    np.asarray(rr.score.ravel()[0])
                    wins.append(tb * tit / (time.perf_counter() - t0))
                assert bool(np.asarray(tr.tracking).all()), \
                    f"{label}: lost lock mid-loop"
                hires[f"fps_{label}_tracked"] = float(max(wins))
                hires[f"batch_{label}_tracked"] = tb
                _log(f"{label} tracked (batch {tb}, planar): "
                     f"{hires[f'fps_{label}_tracked']:.1f} frames/s")
                del tr, rr, ident
        except Exception as e:                      # noqa: BLE001
            hires_error = str(e)
            _log(f"hires measurement failed: {e}")

    from tpu_face import __version__

    baseline_fps = 53.8  # BASELINE.md reference cascade compute, x86 CPU
    record = {
        "metric": "cascade_fps_per_chip",
        "version": __version__,
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / baseline_fps, 2),
        "distinct_content": not args.identical,
        "layout": args.layout,
        "warp_profile": args.warp_profile,
        "spread_pct": round(spread_pct, 1),
        "n_windows": len(window_fps),
        "best_window_fps": round(float(max(window_fps)), 1),
        "rtt_ms": round(rtt * 1e3, 2),
    }
    if gate_iou is not None:
        record["gate_iou"] = round(gate_iou, 4)
        record["gate_dtype"] = chosen
    if chosen == "f32" and iou_f32 is None:
        iou_f32 = gate_iou
    if iou_f32 is not None:
        record["iou_f32"] = round(iou_f32, 4)
    if hbm_gbps is not None:
        record["hbm_gbps"] = round(hbm_gbps, 1)
    for vname, vfps in variant_fps.items():
        record[f"fps_{vname}"] = round(vfps, 1)
    if variant_error is not None:
        record["variant_error"] = variant_error
    for k, v in hires.items():
        record[k] = round(v, 1) if isinstance(v, float) else v
    if hires_error is not None:
        record["hires_error"] = hires_error
    if p50_ms is not None:
        record["p50_batch1_ms"] = round(p50_ms, 2)
    if p50_device_ms is not None:
        record["p50_device_ms"] = round(p50_device_ms, 3)
    if p50_device_ms_b8 is not None:
        record["p50_device_ms_b8"] = round(p50_device_ms_b8, 3)
    if p50_aot_b8_ms is not None:
        record["p50_aot_b8_ms"] = round(p50_aot_b8_ms, 2)
    if aot_error is not None:
        record["aot_error"] = aot_error
    if mfu_pct is not None:
        record["mfu_pct"] = round(mfu_pct, 2)
    if tracking_fps is not None:
        record["tracking_fps_per_chip"] = round(tracking_fps, 1)
    if tracking_churn_fps is not None:
        record["tracking_churn_fps_per_chip"] = round(tracking_churn_fps,
                                                      1)
    if tracking_error is not None:
        record["tracking_error"] = tracking_error
    if embed_fps is not None:
        record["embed_fps_per_chip"] = round(embed_fps, 1)
    if embed_error is not None:
        record["embed_error"] = embed_error
    if multiface_faces is not None:
        record["multiface_faces_per_s"] = round(multiface_faces, 1)
    if multiface_error is not None:
        record["multiface_error"] = multiface_error
    print(json.dumps(record))


if __name__ == "__main__":
    main()
