"""Multi-chip data-parallel sharding on the 8-device CPU test mesh."""

import jax
import numpy as np
import pytest

from tpu_face.models.face_detection import FaceDetectionModel
from tpu_face.parallel import data_parallel_mesh, infer_sharded, shard_batch
from tpu_face.pipeline import FaceCascade


def test_mesh_has_8_virtual_devices():
    assert len(jax.devices()) == 8  # conftest forces this


def test_shard_batch_layout():
    mesh = data_parallel_mesh()
    imgs = np.zeros((16, 8, 8, 3), np.uint8)
    sharded = shard_batch(imgs, mesh)
    assert len(sharded.sharding.device_set) == 8
    # batch axis split 8 ways -> each shard holds 2 frames
    shard = sharded.addressable_shards[0]
    assert shard.data.shape == (2, 8, 8, 3)


def test_shard_batch_requires_divisible():
    mesh = data_parallel_mesh()
    with pytest.raises(ValueError, match="not divisible"):
        shard_batch(np.zeros((3, 8, 8, 3), np.uint8), mesh)


def test_sharded_cascade_matches_single_device():
    cascade = FaceCascade(FaceDetectionModel.SHORT)
    rng = np.random.default_rng(0)
    imgs = rng.integers(0, 255, size=(8, 64, 64, 3)).astype(np.uint8)
    mesh = data_parallel_mesh()
    sharded_out = jax.block_until_ready(infer_sharded(cascade, imgs, mesh))
    single_out = jax.block_until_ready(cascade.infer_batch(imgs))
    # partitioned executables reassociate fp math; ~1e-4 drift expected
    np.testing.assert_allclose(np.asarray(sharded_out.mesh),
                               np.asarray(single_out.mesh), atol=2e-3)
    np.testing.assert_allclose(np.asarray(sharded_out.score),
                               np.asarray(single_out.score), atol=2e-3)


@pytest.mark.slow
def test_graft_entry_dryrun():
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "__graft_entry__", "/root/repo/__graft_entry__.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)


@pytest.mark.slow
def test_sharded_tracker_matches_single_device():
    """Video streams sharded over the mesh: lock, then tracked steps
    match the unsharded tracker."""
    from tpu_face.parallel import track_sharded
    from tpu_face.tracking import FaceTracker
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    frames = [np.stack([np.roll(img, 4 * t + i, axis=1)
                        for i in range(8)]) for t in range(3)]

    mesh = data_parallel_mesh()
    sharded = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    single = FaceTracker(FaceDetectionModel.BACK_CAMERA)
    for t, batch in enumerate(frames):
        rs = jax.block_until_ready(track_sharded(sharded, batch, mesh))
        ru = jax.block_until_ready(single.step(batch))
        assert sharded.tracking.all() and single.tracking.all(), t
        np.testing.assert_allclose(np.asarray(rs.mesh),
                                   np.asarray(ru.mesh), atol=2e-3)


@pytest.mark.slow
def test_sharded_multiface_tracker_matches_single_device():
    """K-face streams shard like single-face ones (same step
    signature; per-slot state stays chip-resident)."""
    from tpu_face.parallel import track_sharded
    from tpu_face.tracking import MultiFaceTracker
    from tpu_face.utils.image_io import load_image

    img = load_image("/root/reference/test_data/man.jpg")
    frames = [np.stack([np.roll(img, 4 * t + i, axis=1)
                        for i in range(8)]) for t in range(2)]

    mesh = data_parallel_mesh()
    sharded = MultiFaceTracker(FaceDetectionModel.BACK_CAMERA,
                               max_faces=2)
    single = MultiFaceTracker(FaceDetectionModel.BACK_CAMERA,
                              max_faces=2)
    for t, batch in enumerate(frames):
        rs = jax.block_until_ready(track_sharded(sharded, batch, mesh))
        ru = jax.block_until_ready(single.step(batch))
        assert sharded.tracking.all() and single.tracking.all(), t
        np.testing.assert_array_equal(np.asarray(rs.mesh_valid),
                                      np.asarray(ru.mesh_valid))
        v = np.asarray(ru.mesh_valid)
        np.testing.assert_allclose(np.asarray(rs.mesh)[v],
                                   np.asarray(ru.mesh)[v], atol=2e-3)


def test_sharded_cascade_has_no_collectives():
    """Scaling hygiene: the batch-sharded cascade must partition into
    per-chip programs with ZERO cross-chip collectives in steady state
    (SURVEY.md §2.4 — pure data parallelism; weights replicated)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    mesh = data_parallel_mesh()
    cascade = FaceCascade(FaceDetectionModel.SHORT)
    fn = cascade._get_jitted(64, 64)
    sh = NamedSharding(mesh, P("data", None, None, None))
    hlo = jax.jit(lambda x: fn(x), in_shardings=sh).lower(
        jax.ShapeDtypeStruct((8, 64, 64, 3), np.uint8)
    ).compile().as_text()
    for op in ("all-reduce", "all-gather", "collective-permute",
               "all-to-all", "reduce-scatter"):
        assert hlo.count(op) == 0, op


def test_sharded_planar_cascade_matches_hwc():
    """Planar ingestion composes with batch sharding: [B, 3, H, W]
    shards on the leading axis like HWC batches."""
    rng = np.random.default_rng(1)
    imgs = rng.integers(0, 255, size=(8, 64, 64, 3)).astype(np.uint8)
    planar = np.ascontiguousarray(imgs.transpose(0, 3, 1, 2))
    mesh = data_parallel_mesh()
    ref = jax.block_until_ready(
        infer_sharded(FaceCascade(FaceDetectionModel.SHORT), imgs, mesh))
    out = jax.block_until_ready(
        infer_sharded(FaceCascade(FaceDetectionModel.SHORT,
                                  input_layout="planar"), planar, mesh))
    np.testing.assert_allclose(np.asarray(out.mesh),
                               np.asarray(ref.mesh), atol=2e-3)
    np.testing.assert_array_equal(np.asarray(out.face_valid),
                                  np.asarray(ref.face_valid))


def test_sharded_embed_cascade_matches_single_device():
    """The identification pipeline shards over the batch like the
    face cascade (zero collectives: same program shape)."""
    from pathlib import Path

    import tpu_face
    from tpu_face.pipeline import EmbedCascade

    from tpu_face.utils.image_io import load_image

    demo = str(Path(tpu_face.__file__).parent / "data" / "demo")
    img = load_image("/root/reference/test_data/man.jpg")
    batch = np.stack([np.roll(img, 6 * i, axis=1) for i in range(8)])
    cas = EmbedCascade(FaceDetectionModel.SHORT, embed_model_path=demo)
    mesh = data_parallel_mesh()
    rs = jax.block_until_ready(infer_sharded(cas, batch, mesh))
    ru = jax.block_until_ready(cas.infer_batch(batch))
    np.testing.assert_array_equal(np.asarray(rs.face_valid),
                                  np.asarray(ru.face_valid))
    np.testing.assert_allclose(np.asarray(rs.embedding),
                               np.asarray(ru.embedding), atol=2e-4)
    assert np.asarray(rs.face_valid).all()
