"""On-device training augmentation (ops/augment.py + loader fusion).

Beyond parity: the reference stops at deterministic preprocessing
(src/VideoProcessor.cpp:94-166); the augmentation stage here is the
DALI RandomResizedCrop/Flip/ColorTwist capability fused into the same
jitted program as the NV12 conversion. Semantics are pinned against
closed forms (manual bilinear, exact flips, scale/normalize algebra)
and invariants (gray fixed points, per-clip consistency), and the
loader integration against determinism/resume/identity contracts.
"""
import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from conftest import RESOURCES, resource
from tensor_stream_tpu import AugmentConfig, ClipLoader
from tensor_stream_tpu.enums import FourCC, Planes, ResizeType
from tensor_stream_tpu.ops.augment import (make_clip_augment_fn,
                                           make_frame_augment_fn)

KEY = jax.random.key(7)


def merged_clip(t=4, h=32, w=48, seed=0, lo=0.0, hi=1.0):
    rng = np.random.default_rng(seed)
    return (lo + (hi - lo) * rng.random((t, h, w, 3))).astype(np.float32)


# ------------------------------------------------------------ pure semantics

def test_identity_config_changes_nothing():
    clip = merged_clip()
    cfg = AugmentConfig()
    assert cfg.identity
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    np.testing.assert_array_equal(np.asarray(fn(clip, KEY)), clip)


def test_same_size_resample_is_identity():
    """Deterministic full-frame 'crop' to the source size samples at
    exact integer coordinates — no pixel may change."""
    clip = merged_clip()
    cfg = AugmentConfig(width=48, height=32)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    np.testing.assert_allclose(np.asarray(fn(clip, KEY)), clip, atol=1e-6)


def test_hflip_is_exact_reverse():
    clip = merged_clip()
    cfg = AugmentConfig(hflip=1.0)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    np.testing.assert_allclose(np.asarray(fn(clip, KEY)),
                               clip[:, :, ::-1], atol=1e-6)


def manual_bilinear(img, oh, ow):
    """Half-pixel bilinear, edge-replicated: both neighbors clamp
    independently from the UNCLAMPED floor (so a -1 floor blends
    (0, 0), not (0, 1))."""
    H, W = img.shape[:2]
    ys = (np.arange(oh) + 0.5) * H / oh - 0.5
    xs = (np.arange(ow) + 0.5) * W / ow - 0.5
    y0f, x0f = np.floor(ys), np.floor(xs)
    ty, tx = ys - y0f, xs - x0f
    y0 = np.clip(y0f.astype(int), 0, H - 1)
    y1 = np.clip(y0f.astype(int) + 1, 0, H - 1)
    x0 = np.clip(x0f.astype(int), 0, W - 1)
    x1 = np.clip(x0f.astype(int) + 1, 0, W - 1)
    rows = img[y0] * (1 - ty)[:, None, None] + img[y1] * ty[:, None, None]
    return (rows[:, x0] * (1 - tx)[None, :, None]
            + rows[:, x1] * tx[None, :, None])


def test_full_frame_resize_matches_manual_bilinear():
    clip = merged_clip()
    cfg = AugmentConfig(width=20, height=12)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    out = np.asarray(fn(clip, KEY))
    for t in range(clip.shape[0]):
        np.testing.assert_allclose(out[t], manual_bilinear(clip[t], 12, 20),
                                   atol=1e-5)


def test_upsample_edge_replicates():
    """Regression: out-of-range sampling coordinates at the top/left of
    an UPSAMPLE must edge-replicate — a 2-row source [0, 1] blown up to
    8 rows starts at exactly 0.0 (the old clamp blended row 1 into the
    border)."""
    src = np.zeros((1, 2, 2, 3), np.float32)
    src[:, 1] = 1.0
    cfg = AugmentConfig(width=2, height=8)
    fn = jax.jit(make_clip_augment_fn(cfg, 2, 2, planar=False))
    out = np.asarray(fn(src, KEY))[0, :, 0, 0]
    want = manual_bilinear(src[0], 8, 2)[:, 0, 0]
    np.testing.assert_allclose(out, want, atol=1e-6)
    assert out[0] == 0.0 and out[-1] == 1.0  # pure edge pixels


def test_upsample_matches_manual_bilinear():
    clip = merged_clip()
    cfg = AugmentConfig(width=96, height=64)  # 48x32 -> 96x64 upsample
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    out = np.asarray(fn(clip, KEY))
    for t in range(clip.shape[0]):
        np.testing.assert_allclose(out[t], manual_bilinear(clip[t], 64, 96),
                                   atol=1e-5)


def test_planar_equals_merged():
    """The planar [T,3,H,W] path is the same math as merged [T,H,W,3]."""
    clip = merged_clip()
    cfg = AugmentConfig(width=24, height=16, scale=(0.4, 1.0),
                        ratio=(0.8, 1.25), hflip=0.5, brightness=0.3,
                        contrast=0.3, saturation=0.3, hue=0.1)
    fm = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    fp = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=True))
    out_m = np.asarray(fm(clip, KEY))
    out_p = np.asarray(fp(np.ascontiguousarray(np.moveaxis(clip, -1, 1)),
                          KEY))
    np.testing.assert_allclose(np.moveaxis(out_p, 1, -1), out_m, atol=2e-6)


def test_random_resized_crop_within_source_range():
    """Bilinear blends are convex: every output value must lie inside
    the source's [min, max], whatever rect/flip the key samples."""
    clip = merged_clip(lo=0.25, hi=0.75)
    cfg = AugmentConfig(width=16, height=16, scale=(0.1, 1.0),
                        ratio=(0.5, 2.0), hflip=0.5)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    for s in range(8):
        out = np.asarray(fn(clip, jax.random.key(s)))
        assert out.min() >= clip.min() - 1e-6
        assert out.max() <= clip.max() + 1e-6


def test_per_clip_temporal_consistency():
    """All frames of a clip share ONE transform: a clip of identical
    frames stays identical, and the single-frame builder with the same
    key reproduces every frame of the clip output."""
    frame = merged_clip(t=1)[0]
    clip = np.broadcast_to(frame, (5,) + frame.shape).copy()
    cfg = AugmentConfig(width=16, height=16, scale=(0.2, 1.0),
                        hflip=0.5, brightness=0.5, contrast=0.5,
                        saturation=0.5, hue=0.2)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    out = np.asarray(fn(clip, KEY))
    for t in range(1, 5):
        np.testing.assert_array_equal(out[t], out[0])


def test_key_determinism_and_sensitivity():
    clip = merged_clip()
    cfg = AugmentConfig(width=16, height=16, scale=(0.2, 1.0), hflip=0.5,
                        brightness=0.5)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    a = np.asarray(fn(clip, jax.random.key(1)))
    b = np.asarray(fn(clip, jax.random.key(1)))
    c = np.asarray(fn(clip, jax.random.key(2)))
    np.testing.assert_array_equal(a, b)
    assert not np.array_equal(a, c)


def test_gray_fixed_point_under_saturation_and_hue():
    """Saturation blends toward gray and hue rotates chroma — a gray
    clip is a fixed point of both."""
    g = np.broadcast_to(merged_clip()[..., :1], (4, 32, 48, 3)).copy()
    cfg = AugmentConfig(saturation=0.9, hue=0.5)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    np.testing.assert_allclose(np.asarray(fn(g, KEY)), g, atol=2e-6)


def test_brightness_is_a_global_scale():
    """Brightness multiplies every value by one factor within the
    documented U[1-b, 1+b] bounds (no clamp engages on this input)."""
    clip = merged_clip(lo=0.2, hi=0.7)
    cfg = AugmentConfig(brightness=0.25)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    out = np.asarray(fn(clip, KEY))
    f = out / clip
    assert 0.75 - 1e-5 <= f.min() and f.max() <= 1.25 + 1e-5
    np.testing.assert_allclose(f, f.flat[0], rtol=1e-4)


def test_contrast_preserves_clip_gray_mean():
    """Contrast blends against the mean gray of the WHOLE clip, which
    is therefore invariant."""
    clip = merged_clip(lo=0.3, hi=0.7)
    gray_w = np.array([0.299, 0.587, 0.114], np.float32)
    cfg = AugmentConfig(contrast=0.4)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    out = np.asarray(fn(clip, KEY))
    np.testing.assert_allclose((out @ gray_w).mean(),
                               (clip @ gray_w).mean(), atol=1e-5)


def test_normalize_exact():
    clip = merged_clip()
    mean, std = (0.45, 0.5, 0.55), (0.2, 0.25, 0.3)
    cfg = AugmentConfig(mean=mean, std=std)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    want = (clip - np.asarray(mean, np.float32)) / np.asarray(std,
                                                              np.float32)
    np.testing.assert_allclose(np.asarray(fn(clip, KEY)), want, atol=1e-6)


def test_u8_output_rounds_and_clamps():
    rng = np.random.default_rng(3)
    clip = rng.integers(0, 256, (2, 16, 16, 3), np.uint8)
    cfg = AugmentConfig(brightness=0.5)
    fn = jax.jit(make_clip_augment_fn(cfg, 16, 16, planar=False,
                                      unit=255.0))
    out = np.asarray(fn(clip, KEY))
    assert out.dtype == np.uint8
    # reproduce: factor is the first jitter draw; recover it from a
    # mid-range pixel and check the round/clamp law globally
    probe = np.flatnonzero((clip.reshape(-1) > 80) & (clip.reshape(-1)
                                                      < 120))[0]
    f = out.reshape(-1)[probe] / clip.reshape(-1)[probe]
    want = np.clip(np.round(clip.astype(np.float32) * f), 0, 255)
    np.testing.assert_allclose(out.astype(np.float32), want, atol=1.0)


def test_bgr_mirror_of_rgb():
    """bgr=True is the channel-reversed twin: augmenting a BGR clip
    equals augmenting the RGB clip and reversing channels."""
    clip = merged_clip()
    cfg = AugmentConfig(brightness=0.3, contrast=0.3, saturation=0.3,
                        hue=0.2)
    f_rgb = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    f_bgr = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False,
                                         bgr=True))
    out_rgb = np.asarray(f_rgb(clip, KEY))
    out_bgr = np.asarray(f_bgr(np.ascontiguousarray(clip[..., ::-1]),
                               KEY))
    np.testing.assert_allclose(out_bgr[..., ::-1], out_rgb, atol=2e-6)


def test_frame_fn_matches_clip_fn():
    clip = merged_clip()
    cfg = AugmentConfig(width=16, height=16, scale=(0.3, 1.0), hflip=0.5)
    cf = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    ff = jax.jit(make_frame_augment_fn(cfg, 32, 48, planar=False))
    out = np.asarray(cf(clip, KEY))
    for t in range(clip.shape[0]):
        np.testing.assert_array_equal(np.asarray(ff(clip[t], KEY)), out[t])


def test_random_erasing_zero_rect_after_normalize():
    """erase=1.0 zeroes exactly one rectangle, shared by all frames and
    channels, AFTER mean/std (fill is 0 in normalized space, i.e. the
    mean color); area within the erase_scale envelope."""
    clip = merged_clip(lo=0.5, hi=1.0)  # all values > 0 pre-normalize
    mean, std = (0.2, 0.2, 0.2), (0.5, 0.5, 0.5)
    cfg = AugmentConfig(erase=1.0, erase_scale=(0.1, 0.3),
                        mean=mean, std=std)
    fn = jax.jit(make_clip_augment_fn(cfg, 32, 48, planar=False))
    out = np.asarray(fn(clip, KEY))
    want = (clip - np.asarray(mean, np.float32)) / np.asarray(std,
                                                              np.float32)
    erased = (out == 0.0).all(axis=-1)  # post-normalize zeros
    mask2d = erased[0]
    # one solid rect, identical across frames
    for t in range(clip.shape[0]):
        assert np.array_equal(erased[t], mask2d)
    ys, xs = np.nonzero(mask2d)
    assert len(ys), "erase=1.0 must erase"
    assert mask2d[ys.min():ys.max() + 1, xs.min():xs.max() + 1].all()
    frac = mask2d.mean()
    assert 0.05 <= frac <= 0.35  # scale envelope (integer-rounded rect)
    np.testing.assert_allclose(np.where(erased[..., None], 0.0, out),
                               np.where(erased[..., None], 0.0, want),
                               atol=1e-6)


def test_random_erasing_probability_zero_and_identity():
    clip = merged_clip()
    fn = jax.jit(make_clip_augment_fn(
        AugmentConfig(erase=0.0), 32, 48, planar=False))
    np.testing.assert_array_equal(np.asarray(fn(clip, KEY)), clip)
    assert not AugmentConfig(erase=0.5).identity
    assert AugmentConfig().identity


def test_config_validation():
    with pytest.raises(ValueError, match="together"):
        AugmentConfig(width=224)
    with pytest.raises(ValueError, match="scale"):
        AugmentConfig(width=8, height=8, scale=(0.0, 1.0))
    with pytest.raises(ValueError, match="exceed the frame"):
        AugmentConfig(width=8, height=8, scale=(0.5, 1.5))
    with pytest.raises(ValueError, match="static output size"):
        AugmentConfig(scale=(0.5, 1.0))
    with pytest.raises(ValueError, match="probability"):
        AugmentConfig(hflip=1.5)
    with pytest.raises(ValueError, match="hue"):
        AugmentConfig(hue=0.7)
    with pytest.raises(ValueError, match="brightness"):
        AugmentConfig(brightness=-0.1)
    with pytest.raises(ValueError, match="mean/std"):
        AugmentConfig(mean=(0.5, 0.5, 0.5))
    with pytest.raises(ValueError, match="mean/std"):
        AugmentConfig(mean=(0.5,), std=(0.5,))
    with pytest.raises(ValueError, match="erase must"):
        AugmentConfig(erase=1.5)
    with pytest.raises(ValueError, match="erase_scale"):
        AugmentConfig(erase=0.5, erase_scale=(0.0, 0.3))
    with pytest.raises(ValueError, match="erase_ratio"):
        AugmentConfig(erase=0.5, erase_ratio=(2.0, 1.0))


# ------------------------------------------------------- loader integration

AUG = AugmentConfig(width=64, height=64, scale=(0.3, 1.0),
                    ratio=(0.75, 4 / 3), hflip=0.5, brightness=0.4,
                    contrast=0.4, saturation=0.4, hue=0.05,
                    mean=(0.45, 0.45, 0.45), std=(0.225, 0.225, 0.225))
LOADER_KW = dict(clip_len=3, batch=2, clip_step=1, shuffle=True, seed=3,
                 workers=1, host_resize=True, width=96, height=96,
                 resize_type=ResizeType.BILINEAR,
                 pixel_format=FourCC.RGB24, planes_pos=Planes.PLANAR,
                 normalization=True)
BBB = resource("bbb_1080x608_420_10.h264")


def test_clip_loader_augment_shape_and_determinism():
    with ClipLoader(BBB, augment=AUG, **LOADER_KW) as ld:
        clips, starts = next(iter(ld))
        a = np.asarray(clips)
    assert a.shape == (2, 3, 3, 64, 64) and a.dtype == np.float32
    with ClipLoader(BBB, augment=AUG, **LOADER_KW) as ld:
        clips2, starts2 = next(iter(ld))
    assert starts == starts2
    np.testing.assert_array_equal(a, np.asarray(clips2))


def test_clip_loader_identity_augment_matches_plain():
    """augment=AugmentConfig() must reproduce the plain loader's bytes
    exactly — the fused program is the contract output + a no-op."""
    with ClipLoader(BBB, **LOADER_KW) as ld:
        plain, starts = next(iter(ld))
        plain = np.asarray(plain)
    with ClipLoader(BBB, augment=AugmentConfig(), **LOADER_KW) as ld:
        fused, starts2 = next(iter(ld))
    assert starts == starts2
    np.testing.assert_array_equal(plain, np.asarray(fused))


def test_clip_loader_augment_resume_replays_same_augmentation():
    """Keys derive from (epoch, clip start): a resumed loader replays
    bit-identical augmented clips, not just the same clip order."""
    ref, metas = [], []
    with ClipLoader(BBB, augment=AUG, **LOADER_KW) as ld:
        it = iter(ld)
        for _ in range(3):
            clips, starts = next(it)
            ref.append(np.asarray(clips))
            metas.append((ld.state(), starts))
    st, _ = metas[0]
    with ClipLoader(BBB, augment=AUG, epoch=st["epoch"],
                    start_clip=st["start_clip"], **LOADER_KW) as ld:
        it = iter(ld)
        for want, (_, want_starts) in zip(ref[1:], metas[1:]):
            clips, starts = next(it)
            assert starts == want_starts
            np.testing.assert_array_equal(np.asarray(clips), want)


def test_clip_loader_augment_epochs_differ():
    """The epoch folds into the key: the same clip gets a different
    augmentation next epoch (same membership, fresh randomness)."""
    by_start = [{}, {}]
    with ClipLoader(BBB, augment=AUG, **LOADER_KW) as ld:
        for epoch in range(2):
            it = iter(ld)
            while True:
                try:
                    clips, starts = next(it)
                except StopIteration:
                    break
                arr = np.asarray(clips)
                for k, s in enumerate(starts):
                    by_start[epoch][int(s)] = arr[k]
    assert by_start[0].keys() == by_start[1].keys()
    diff = [s for s in by_start[0]
            if not np.array_equal(by_start[0][s], by_start[1][s])]
    assert diff, "every clip got the identical augmentation both epochs"


def test_augment_bf16_single_final_rounding():
    """dtype='bfloat16' + augment: the math must run on the contract
    f32 values with ONE final RN-even cast — i.e. exactly the f32-run
    result cast to bf16 (regression: the fused program once let the
    VPP quantize to bf16 BEFORE the augment math, double-rounding)."""
    import jax.numpy as jnp
    aug = AugmentConfig(width=64, height=64, scale=(0.5, 1.0), hflip=0.5,
                        brightness=0.3, contrast=0.3,
                        mean=(0.45,) * 3, std=(0.225,) * 3)
    kw = dict(LOADER_KW, augment=aug)
    with ClipLoader(BBB, **kw) as ld:
        f32, starts = next(iter(ld))
        f32 = np.asarray(jax.block_until_ready(f32))
    with ClipLoader(BBB, dtype="bfloat16", **kw) as ld:
        bf16, starts2 = next(iter(ld))
        assert bf16.dtype == jnp.bfloat16
        bf16 = np.asarray(jax.block_until_ready(bf16.astype(jnp.float32)))
    assert starts == starts2
    want = np.asarray(jnp.asarray(f32).astype(jnp.bfloat16)
                      .astype(jnp.float32))
    np.testing.assert_array_equal(bf16, want)


def test_augment_requires_rgb():
    with pytest.raises(ValueError, match="RGB24/BGR24"):
        ClipLoader(BBB, augment=AUG, clip_len=2, batch=1, workers=1,
                   pixel_format=FourCC.Y800)


def test_augment_mean_std_needs_float():
    with pytest.raises(ValueError, match="float"):
        ClipLoader(BBB, augment=AUG, clip_len=2, batch=1, workers=1,
                   host_resize=True, width=96, height=96,
                   pixel_format=FourCC.RGB24, normalization=False)
