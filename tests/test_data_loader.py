"""FrameLoader: prefetching stream -> device-batch iterator."""
import numpy as np
import pytest

from conftest import resource

from tensor_stream_tpu import FourCC, FrameLoader, Planes, ResizeType


def test_loader_iterates_whole_stream_in_order():
    import jax
    path = resource("bbb_1080x608_420_10.h264")
    with FrameLoader(path, batch=4, prefetch=2, width=128, height=96,
                     resize_type=ResizeType.BILINEAR,
                     pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
                     normalization=True) as loader:
        assert loader.frame_size == (1080, 608)
        seen = []
        shapes = []
        for tensors, indices in loader:
            jax.block_until_ready(tensors)
            assert tensors.shape[1:] == (3, 96, 128)
            assert tensors.dtype == np.float32
            shapes.append(tensors.shape[0])
            seen.extend(indices)
    # All 10 frames, consecutively, once.
    assert seen == list(range(seen[0], seen[0] + len(seen)))
    assert len(seen) == 10
    assert sum(shapes) == 10


def test_loader_host_resize_matches_device_resize():
    import jax
    path = resource("bbb_1080x608_420_10.h264")

    def collect(host_resize):
        out = []
        with FrameLoader(path, batch=5, width=224, height=224,
                         host_resize=host_resize,
                         resize_type=ResizeType.BILINEAR,
                         pixel_format=FourCC.RGB24,
                         planes_pos=Planes.PLANAR,
                         normalization=True) as loader:
            for tensors, indices in loader:
                out.append((np.asarray(jax.block_until_ready(tensors)),
                            indices))
        return out

    dev = collect(False)
    host = collect(True)
    assert [i for _, i in dev] == [i for _, i in host]
    for (d, _), (h, _) in zip(dev, host):
        # +-1 u8 NV12 step through the BT.601 matrix (docs/PARITY.md).
        assert np.abs(d - h).max() <= 4.0 / 255 + 1e-7


def test_loader_close_mid_stream_no_hang():
    path = resource("bbb_1080x608_420_10.h264")
    loader = FrameLoader(path, batch=2, width=64, height=64,
                         pixel_format=FourCC.Y800, loop=True)
    tensors, indices = next(loader)
    assert tensors.shape[0] == 2
    loader.close()  # must unblock the drain thread and join promptly
    assert not loader._thread.is_alive()


def test_multi_stream_loader_stacks_streams():
    import jax
    from tensor_stream_tpu import MultiStreamLoader
    urls = [resource("bbb_1080x608_420_10.h264"),
            resource("bbb_720x480_RGB24_250.h264")]
    with MultiStreamLoader(urls, per_stream=3, width=96, height=96,
                           resize_type=ResizeType.BILINEAR,
                           pixel_format=FourCC.RGB24,
                           planes_pos=Planes.PLANAR,
                           normalization=True) as loader:
        batch, indices = next(loader)
        jax.block_until_ready(batch)
        assert batch.shape == (6, 3, 96, 96)
        assert indices[0] == [1, 2, 3] and indices[1] == [1, 2, 3]
        batch2, indices2 = next(loader)
        assert indices2[0] == [4, 5, 6] and indices2[1] == [4, 5, 6]


def test_sharded_stream_loader_on_mesh():
    """Two streams -> one global array sharded over a 2-device 'dp' mesh,
    each stream's frames resident on its own device (multichip serving
    topology). Runs on the virtual CPU mesh."""
    import jax
    if len(jax.devices()) < 2:
        pytest.skip("needs >= 2 devices")
    from tensor_stream_tpu import ShardedStreamLoader
    urls = [resource("bbb_1080x608_420_10.h264"),
            resource("bbb_720x480_RGB24_250.h264")]
    with ShardedStreamLoader(urls, per_stream=4, width=96, height=96,
                             resize_type=ResizeType.BILINEAR,
                             pixel_format=FourCC.RGB24,
                             planes_pos=Planes.PLANAR,
                             normalization=True) as loader:
        batch, indices = next(loader)
        assert batch.shape == (8, 3, 96, 96)
        assert len(batch.sharding.device_set) == 2
        assert indices[0] == [1, 2, 3, 4] and indices[1] == [1, 2, 3, 4]
        # the global array is usable by ordinary jitted code
        s = float(jax.jit(lambda x: x.sum())(batch))
        assert np.isfinite(s)


def test_loader_batches_safe_to_hold_across_iterations():
    """Held batches must not be corrupted by later staging reuse:
    device_put may alias the numpy staging buffer on the CPU backend, so
    a buffer is recycled only after the compute that consumed it
    finished (FrameLoader._recycle). Materializing everything at the end
    must equal materializing eagerly."""
    import jax

    from tensor_stream_tpu import FourCC, FrameLoader, Planes

    def run(hold):
        loader = FrameLoader(resource("bbb_1080x608_420_10.h264"), batch=4,
                             prefetch=2, pixel_format=FourCC.Y800,
                             planes_pos=Planes.PLANAR, width=96, height=64)
        out = []
        for tensors, idx in loader:
            out.append((idx, tensors if hold else np.asarray(tensors)))
        mats = [(i, np.asarray(t)) for i, t in out]
        loader.close()
        return mats

    eager = run(False)
    held = run(True)
    assert [i for i, _ in eager] == [i for i, _ in held]
    for (i, a), (_, b) in zip(eager, held):
        np.testing.assert_array_equal(a, b, err_msg=f"batch {i}")


@pytest.mark.parametrize("fixture", ["bbb_720x480_RGB24_250.h264",
                                     "bunny.mp4"])
def test_loader_checkpoint_resume_bitexact(fixture):
    """Checkpoint/resume (TPU extension, docs/ROADMAP.md item 5): a
    loader resumed from checkpoint() yields exactly the frames the
    original run would have yielded next — same indexes, same bytes —
    for both raw elementary streams (decode-discard resume) and
    container formats (keyframe seek + timestamp discard)."""
    from tensor_stream_tpu import FourCC, FrameLoader, Planes

    kw = dict(batch=4, prefetch=2, pixel_format=FourCC.Y800,
              planes_pos=Planes.PLANAR, width=96, height=64)
    full = FrameLoader(resource(fixture), **kw)
    batches = []
    for tensors, idx in full:
        batches.append((idx, np.asarray(tensors)))
        if len(batches) >= 6:
            break
    full.close()

    ckpt_point = 3  # resume after the 3rd batch
    first = FrameLoader(resource(fixture), **kw)
    for k, _ in zip(range(ckpt_point), first):
        pass
    ckpt = first.checkpoint()
    first.close()
    assert ckpt["next_index"] == batches[ckpt_point][0][0]

    resumed = FrameLoader(resource(fixture),
                          start_frame=ckpt["next_index"], **kw)
    for want_idx, want in batches[ckpt_point:]:
        tensors, idx = next(resumed)
        assert idx == want_idx
        np.testing.assert_array_equal(np.asarray(tensors), want)
    resumed.close()


def test_loader_bf16_output_dtype():
    """dtype="bfloat16" (TPU extension) flows through the loader: same
    bytes as the f32 contract output, one RN-even cast at the end —
    the natural model-input dtype on TPU at half the HBM footprint."""
    import jax
    import jax.numpy as jnp
    path = resource("bbb_1080x608_420_10.h264")
    kw = dict(batch=5, width=224, height=224,
              resize_type=ResizeType.BILINEAR, host_resize=True,
              pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
              normalization=True)
    with FrameLoader(path, **kw) as loader:
        f32, _ = next(iter(loader))
        jax.block_until_ready(f32)
    with FrameLoader(path, dtype="bfloat16", **kw) as loader:
        bf16, _ = next(iter(loader))
        jax.block_until_ready(bf16)
    assert bf16.dtype == jnp.bfloat16
    assert bf16.shape == f32.shape
    np.testing.assert_array_equal(np.asarray(bf16),
                                  np.asarray(f32.astype(jnp.bfloat16)))


def test_loader_augment_identity_and_determinism():
    """augment= on FrameLoader (TPU extension, ops/augment.py): the
    identity config reproduces the plain loader's bytes exactly, and a
    non-trivial config is deterministic run-to-run (keys derive from
    the absolute frame index)."""
    import jax
    from tensor_stream_tpu import AugmentConfig
    path = resource("bbb_1080x608_420_10.h264")
    kw = dict(batch=4, width=96, height=96, host_resize=True,
              resize_type=ResizeType.BILINEAR,
              pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
              normalization=True)
    with FrameLoader(path, **kw) as ld:
        plain, idx0 = next(iter(ld))
        plain = np.asarray(jax.block_until_ready(plain))
    with FrameLoader(path, augment=AugmentConfig(), **kw) as ld:
        fused, idx1 = next(iter(ld))
        fused = np.asarray(jax.block_until_ready(fused))
    assert idx0 == idx1
    np.testing.assert_array_equal(plain, fused)

    aug = AugmentConfig(width=64, height=64, scale=(0.4, 1.0),
                        hflip=0.5, brightness=0.3, contrast=0.3)
    runs = []
    for _ in range(2):
        with FrameLoader(path, augment=aug, **kw) as ld:
            t, idx = next(iter(ld))
            runs.append((idx, np.asarray(jax.block_until_ready(t))))
    assert runs[0][1].shape == (4, 3, 64, 64)
    assert runs[0][0] == runs[1][0]
    np.testing.assert_array_equal(runs[0][1], runs[1][1])
    # Different frames draw different keys: not all frames identical.
    assert not np.array_equal(runs[0][1][0], runs[0][1][1])


def test_loader_augment_resume_replays_same_bytes():
    """Keys derive from the absolute frame index, so a start_frame
    resume replays bit-identical augmented frames."""
    import jax
    from tensor_stream_tpu import AugmentConfig
    path = resource("bbb_1080x608_420_10.h264")
    aug = AugmentConfig(width=48, height=48, scale=(0.5, 1.0),
                        hflip=0.5, brightness=0.4, saturation=0.4)
    kw = dict(batch=3, width=96, height=96, host_resize=True,
              resize_type=ResizeType.BILINEAR, augment=aug,
              pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
              normalization=True)
    with FrameLoader(path, **kw) as ld:
        it = iter(ld)
        next(it)
        ckpt = ld.checkpoint()
        want_idx, want = [], []
        for t, idx in it:
            want_idx.append(idx)
            want.append(np.asarray(jax.block_until_ready(t)))
    with FrameLoader(path, start_frame=ckpt["next_index"], **kw) as ld:
        for widx, w in zip(want_idx, want):
            t, idx = next(iter(ld))
            assert idx == widx
            np.testing.assert_array_equal(np.asarray(t), w)


def test_loader_augment_validation_before_reader_starts():
    """Bad augment configs fail in __init__ BEFORE any native pipeline
    exists — nothing to leak, no thread to join."""
    import pytest
    from tensor_stream_tpu import AugmentConfig
    path = resource("bbb_1080x608_420_10.h264")
    with pytest.raises(ValueError, match="RGB24/BGR24"):
        FrameLoader(path, augment=AugmentConfig(), batch=2,
                    pixel_format=FourCC.Y800)
    with pytest.raises(ValueError, match="float"):
        FrameLoader(path, batch=2, width=96, height=96, host_resize=True,
                    pixel_format=FourCC.RGB24,
                    augment=AugmentConfig(mean=(0.5,) * 3,
                                          std=(0.25,) * 3))


def test_multi_stream_loader_augment_decorrelated():
    """augment= flows through to each stream's FrameLoader with a
    per-stream aug_seed offset: the SAME file on two slots draws
    different transforms at the same frame indices."""
    import jax
    from tensor_stream_tpu import AugmentConfig, MultiStreamLoader
    path = resource("bbb_1080x608_420_10.h264")
    aug = AugmentConfig(width=48, height=48, scale=(0.4, 1.0), hflip=0.5,
                        brightness=0.4)
    with MultiStreamLoader([path, path], per_stream=3, width=96,
                           height=96, host_resize=True,
                           resize_type=ResizeType.BILINEAR,
                           pixel_format=FourCC.RGB24,
                           planes_pos=Planes.PLANAR, normalization=True,
                           augment=aug) as ld:
        tensors, indices = next(iter(ld))
        a = np.asarray(jax.block_until_ready(tensors))
    assert a.shape == (6, 3, 48, 48)
    assert indices[0] == indices[1]  # same frames...
    assert not np.array_equal(a[:3], a[3:])  # ...different transforms
