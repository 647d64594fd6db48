"""Multi-device sharding tests on the virtual 8-device CPU mesh
(SURVEY §2.9: the TPU-native scale-out the reference lacked)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
from tensor_stream_tpu.models.transformer_net import gram_matrix
from tensor_stream_tpu.ops.vpp import VPPConfig, vpp_numpy
from tensor_stream_tpu.parallel import (build_train_step, make_mesh,
                                        make_train_state,
                                        multi_stream_round_robin,
                                        vpp_batch_sharded)

needs_mesh = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@needs_mesh
def test_mesh_factoring():
    mesh = make_mesh(8)
    assert mesh.shape["dp"] * mesh.shape["mp"] == 8
    mesh6 = make_mesh(6)
    assert mesh6.shape["dp"] * mesh6.shape["mp"] == 6


@needs_mesh
def test_sharded_vpp_matches_single_device():
    """dp x mp sharded VPP must be bit-identical to the single-device
    path (XLA halo exchanges don't change gather semantics)."""
    mesh = make_mesh(8)
    cfg = VPPConfig(src_width=128, src_height=96, width=64, height=48,
                    resize_type=ResizeType.BILINEAR, fourcc=FourCC.RGB24,
                    planes=Planes.MERGED, normalization=True)
    rng = np.random.default_rng(0)
    n = mesh.shape["dp"] * 2
    ys = rng.integers(0, 255, (n, 96, 128), np.uint8)
    uvs = rng.integers(0, 255, (n, 48, 128), np.uint8)
    sharded = np.asarray(vpp_batch_sharded(cfg, mesh, ys, uvs))
    for i in range(n):
        single = vpp_numpy(cfg, ys[i], uvs[i])
        np.testing.assert_array_equal(sharded[i], single)


@needs_mesh
def test_sharded_train_step_runs_and_descends():
    """Full sharded training step: loss decreases over a few steps."""
    mesh = make_mesh(8)
    cfg = VPPConfig(src_width=128, src_height=96, width=64, height=64,
                    resize_type=ResizeType.BILINEAR, fourcc=FourCC.RGB24,
                    planes=Planes.MERGED, normalization=True)
    params, opt_state, tx = make_train_state(mesh, 64, 64, batch=8)
    step = build_train_step(mesh, tx, cfg)
    rng = np.random.default_rng(0)
    ys = rng.integers(0, 255, (8, 96, 128), np.uint8)
    uvs = rng.integers(0, 255, (8, 48, 128), np.uint8)
    style = gram_matrix(jnp.zeros((1, 64, 64, 3)))
    losses = []
    for _ in range(3):
        params, opt_state, loss = step(params, opt_state, ys, uvs, style)
        losses.append(float(loss))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0]


@needs_mesh
def test_round_robin_stream_placement():
    mesh = make_mesh(8)
    mapping = multi_stream_round_robin(10, mesh)
    assert len(mapping) == 10
    assert mapping[0] == mapping[8]  # wraps over 8 devices


@pytest.mark.slow
def test_graft_entry_single_device():
    import __graft_entry__ as ge
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (1, 256, 256, 3)


@needs_mesh
def test_graft_entry_multichip():
    import __graft_entry__ as ge
    ge.dryrun_multichip(8)


@needs_mesh
def test_sharded_stream_loader_end_to_end():
    """ShardedStreamLoader: two streams -> one GLOBAL jax.Array sharded
    over a 'dp' mesh (each stream's frames resident on its own device),
    consumable by a sharded program — the dp-serving shape on the
    virtual mesh."""
    import os

    from jax.sharding import NamedSharding, PartitionSpec

    from tensor_stream_tpu import ShardedStreamLoader

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    loader = ShardedStreamLoader(
        [fix, fix], per_stream=4, host_resize=True, width=64, height=64,
        resize_type=ResizeType.BILINEAR, pixel_format=FourCC.RGB24,
        planes_pos=Planes.PLANAR, normalization=True, buffer_size=16)
    try:
        batch, indices = next(loader)
        assert batch.shape == (8, 3, 64, 64)
        shard_devs = {s.device for s in batch.addressable_shards}
        assert len(shard_devs) == 2  # one device per stream
        assert indices[0] == indices[1] == [1, 2, 3, 4]

        # A sharded reduction consumes the global array directly.
        mesh = loader.mesh
        out = jax.jit(
            lambda x: jnp.mean(x, axis=(1, 2, 3)),
            in_shardings=NamedSharding(mesh, PartitionSpec("dp")),
            out_shardings=NamedSharding(mesh, PartitionSpec("dp")))(batch)
        vals = np.asarray(out)
        assert vals.shape == (8,) and np.isfinite(vals).all()
        # Same file on both streams: per-stream shard means agree.
        assert np.allclose(vals[:4], vals[4:], atol=1e-6)
    finally:
        loader.close()


@needs_mesh
def test_sharded_clip_loader_end_to_end():
    """ShardedClipLoader: one file -> [n_devices*per_device, T, ...]
    clip batches dp-sharded over the virtual mesh, bit-equal to the
    serial FrameLoader frames, with one shuffled epoch order shared by
    all chips (no clip duplicated across devices)."""
    import os

    from jax.sharding import NamedSharding, PartitionSpec

    from tensor_stream_tpu import (FourCC, FrameLoader, Planes,
                                   ShardedClipLoader)

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    vkw = dict(host_resize=True, width=64, height=64,
               pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
               normalization=True)

    # Serial oracle through the SAME VPP program family.
    ser = FrameLoader(fix, batch=25, **vkw)
    frames = np.concatenate(
        [np.asarray(jax.block_until_ready(t)) for t, _ in ser])
    ser.close()

    loader = ShardedClipLoader(fix, clip_len=4, per_device=2, seed=11,
                               workers=2, **vkw)
    try:
        assert len(loader.devices) == 8 and loader.batch == 16
        assert len(loader) == 3  # 62 starts // 16
        seen = []
        for clips, starts in loader:
            assert clips.shape == (16, 4, 3, 64, 64)
            shard_devs = {s.device for s in clips.addressable_shards}
            assert len(shard_devs) == 8
            arr = np.asarray(jax.block_until_ready(clips))
            for c, s in zip(arr, starts):
                assert np.array_equal(c, frames[s:s + 4]), s
            seen.extend(int(s) for s in starts)
        assert len(seen) == 48 and len(set(seen)) == 48  # no dup per epoch

        # Next epoch reshuffles; a sharded program consumes the global
        # array directly.
        clips2, starts2 = next(loader)
        # state() reflects the handed-out batch (loader.epoch is the
        # fill thread's look-ahead position and may already be further).
        assert loader.state()["epoch"] == 1
        mesh = loader.mesh
        out = jax.jit(
            lambda x: jnp.mean(x, axis=(1, 2, 3, 4)),
            in_shardings=NamedSharding(mesh, PartitionSpec("dp")),
            out_shardings=NamedSharding(mesh, PartitionSpec("dp")))(clips2)
        vals = np.asarray(out)
        assert vals.shape == (16,) and np.isfinite(vals).all()

        # state() resume re-yields exactly the remaining epoch-1 clips.
        st = loader.state()
        rest = []
        for _, starts in loader:
            rest.extend(int(s) for s in starts)
    finally:
        loader.close()
    resumed = ShardedClipLoader(fix, clip_len=4, per_device=2,
                                epoch=st["epoch"],
                                start_clip=st["start_clip"],
                                seed=11, workers=2, **vkw)
    try:
        rest2 = []
        for _, starts in resumed:
            rest2.extend(int(s) for s in starts)
        assert rest2 == rest
    finally:
        resumed.close()


@needs_mesh
def test_sharded_clip_loader_augment_matches_single_device():
    """Fused augmentation is device-placement-invariant: the dp-sharded
    loader with per_device=1 over 8 chips produces the same augmented
    bytes as a single-device ClipLoader with batch=8 — keys derive from
    (epoch, clip start), not from device or shard position."""
    import os

    from tensor_stream_tpu import AugmentConfig, ClipLoader, FourCC, \
        Planes, ShardedClipLoader

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    aug = AugmentConfig(width=48, height=48, scale=(0.4, 1.0),
                        hflip=0.5, brightness=0.3, contrast=0.3)
    kw = dict(clip_len=4, seed=11, workers=2, host_resize=True,
              width=64, height=64, pixel_format=FourCC.RGB24,
              planes_pos=Planes.PLANAR, normalization=True, augment=aug)
    with ClipLoader(fix, batch=8, drop_partial=True, **kw) as single:
        want, want_starts = next(iter(single))
        want = np.asarray(jax.block_until_ready(want))
    with ShardedClipLoader(fix, per_device=1, **kw) as sharded:
        clips, starts = next(iter(sharded))
        assert clips.shape == (8, 4, 3, 48, 48)
        got = np.asarray(jax.block_until_ready(clips))
    assert list(starts) == list(want_starts)
    np.testing.assert_array_equal(got, want)


@needs_mesh
def test_sharded_clip_loader_rejects_zero_batch_epochs():
    """A global batch larger than the epoch's clip starts would yield
    zero batches forever (tails are always dropped across equal-sized
    shards) — rejected at construction, and the native handle is not
    leaked by the failed constructor."""
    import os

    from tensor_stream_tpu import ShardedClipLoader

    fix = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "fixtures", "bbb_720x480_RGB24_250.h264")
    with pytest.raises(ValueError, match="clip starts per epoch"):
        ShardedClipLoader(fix, clip_len=4, per_device=8, workers=1)


@needs_mesh
def test_sharded_clip_dataset_end_to_end():
    """ShardedClipDataset: a two-file corpus -> dp-sharded clip batches,
    one global shuffle across both files (no clip duplicated within the
    epoch), every clip bit-equal to the single-file ClipLoader's output
    for the same (file, start) label, decoder pools LRU-churned at
    max_open=1."""
    import os

    from tensor_stream_tpu import (ClipLoader, FourCC, Planes,
                                   ShardedClipDataset)

    fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixtures")
    files = [os.path.join(fixdir, "synthetic_640x360_120.h265"),
             os.path.join(fixdir, "synthetic_640x360_90_vp9.ivf")]
    vkw = dict(clip_len=4, host_resize=True, width=64, height=64,
               pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
               normalization=True, seed=3)

    oracle = {}
    for fi, path in enumerate(files):
        with ClipLoader(path, batch=2, shuffle=False, drop_partial=False,
                        workers=1, **vkw) as l:
            for clips, starts in l:
                arr = np.asarray(jax.block_until_ready(clips))
                for c, s in zip(arr, starts):
                    oracle[(fi, int(s))] = c

    with ShardedClipDataset(files, per_device=1, workers=1, max_open=1,
                            **vkw) as ds:
        assert len(ds.devices) == 8 and ds.batch == 8
        assert len(ds) == len(oracle) // 8  # 52 clips -> 6 full batches
        seen = []
        for clips, labels in ds:
            assert clips.shape == (8, 4, 3, 64, 64)
            assert len({s.device for s in clips.addressable_shards}) == 8
            arr = np.asarray(jax.block_until_ready(clips))
            for c, lab in zip(arr, labels):
                assert np.array_equal(c, oracle[lab]), lab
            seen.extend(labels)
        assert len(seen) == 48 and len(set(seen)) == 48
        assert {lab[0] for lab in seen} == {0, 1}  # both files sampled
        # The global array feeds a sharded program directly.
        clips2, _ = next(ds)
        out = jax.jit(lambda x: jnp.mean(x, axis=(1, 2, 3, 4)),
                      in_shardings=ds._sharding,
                      out_shardings=ds._sharding)(clips2)
        assert np.isfinite(np.asarray(out)).all()


@needs_mesh
def test_sharded_clip_dataset_augment_keys_by_corpus_identity():
    """ShardedClipDataset + augment: keys derive from the GLOBAL clip
    identity, so (a) the identity config reproduces the plain corpus
    bytes, and (b) a non-trivial config is deterministic run-to-run
    with per-clip-distinct transforms."""
    import os

    from tensor_stream_tpu import (AugmentConfig, FourCC, Planes,
                                   ShardedClipDataset)

    fixdir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "fixtures")
    files = [os.path.join(fixdir, "synthetic_640x360_120.h265"),
             os.path.join(fixdir, "synthetic_640x360_90_vp9.ivf")]
    kw = dict(clip_len=4, per_device=1, workers=1, host_resize=True,
              width=64, height=64, pixel_format=FourCC.RGB24,
              planes_pos=Planes.PLANAR, normalization=True, seed=3)

    with ShardedClipDataset(files, **kw) as ds:
        plain, labels0 = next(iter(ds))
        plain = np.asarray(jax.block_until_ready(plain))
    with ShardedClipDataset(files, augment=AugmentConfig(), **kw) as ds:
        fused, labels1 = next(iter(ds))
        fused = np.asarray(jax.block_until_ready(fused))
    assert labels0 == labels1
    np.testing.assert_array_equal(plain, fused)

    aug = AugmentConfig(width=48, height=48, scale=(0.4, 1.0), hflip=0.5,
                        brightness=0.4)
    runs = []
    for _ in range(2):
        with ShardedClipDataset(files, augment=aug, **kw) as ds:
            clips, labels = next(iter(ds))
            runs.append((labels,
                         np.asarray(jax.block_until_ready(clips))))
    assert runs[0][0] == runs[1][0]
    np.testing.assert_array_equal(runs[0][1], runs[1][1])
    assert runs[0][1].shape == (8, 4, 3, 48, 48)
    assert not np.array_equal(runs[0][1][0], runs[0][1][1])
