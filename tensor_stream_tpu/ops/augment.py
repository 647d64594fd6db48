"""On-device training augmentations for clip/frame batches.

The reference stops at deterministic preprocessing (crop/resize/color,
src/VideoProcessor.cpp:94-166); training pipelines built on it do their
augmentation in torch on the GPU afterwards. Here augmentation is part
of the same jitted XLA program as the NV12 conversion — decode bytes
ship to HBM once and everything from YUV to the normalized, augmented
model input happens in one fused dispatch (beyond parity; the DALI
RandomResizedCrop/Flip/ColorTwist capability, TPU-first).

Semantics follow the de-facto standards so users can port recipes:

* spatial: torchvision ``RandomResizedCrop`` — area fraction uniform in
  ``scale``, aspect ratio log-uniform in ``ratio``, the rect clamped to
  the frame (torchvision's 10-try rejection loop is replaced by a clamp:
  data-dependent retries don't trace), bilinear half-pixel sampling to
  the static ``(height, width)`` target, plus ``hflip`` — the flip is
  folded into the sampling grid, so it costs nothing.
* photometric: torchvision ``ColorJitter`` factors — brightness/
  contrast/saturation multipliers uniform in ``[max(0, 1-x), 1+x]``,
  hue delta uniform in ``[-hue, hue]`` turns applied as a YIQ chroma
  rotation (DALI's linear formulation; torchvision's HSV round trip is
  not XLA-friendly). Applied in fixed order brightness -> contrast ->
  saturation -> hue (torchvision randomizes the order), one clamp to
  the value range at the end. Contrast blends against the mean gray of
  the WHOLE clip, not each frame — temporally consistent by design.
* ``mean``/``std``: per-channel normalization in the tensor's value
  scale, applied after the clamp.
* ``erase``: torchvision ``RandomErasing`` — probability ``erase``, one
  rectangle per clip with area fraction uniform in ``erase_scale`` and
  aspect (w/h) log-uniform in ``erase_ratio``, zero-filled, applied
  LAST (after mean/std, so the fill is the mean color of a normalized
  input — torchvision's recipe order).

Every random draw comes from an explicit ``jax.random`` key and one
key augments a whole clip — all frames of a clip share the transform
(temporal consistency), different clips get independent transforms, and
the same key always reproduces the same bytes. The loaders derive keys
from ``fold_in(fold_in(key(aug_seed), epoch), clip_identity)`` so
checkpoint/resume replays identical augmentations.
"""
import math
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

# ITU-R BT.601 luma weights (torchvision rgb_to_grayscale).
_GRAY_RGB = (0.299, 0.587, 0.114)
# RGB->YIQ / YIQ->RGB (NTSC), for the hue rotation.
_RGB2YIQ = np.array([[0.299, 0.587, 0.114],
                     [0.595716, -0.274453, -0.321263],
                     [0.211456, -0.522591, 0.311135]], np.float32)
_YIQ2RGB = np.linalg.inv(_RGB2YIQ).astype(np.float32)


@dataclass(frozen=True)
class AugmentConfig:
    """Static augmentation parameters (part of the jit cache key).

    All fields default to "off": the default config is the identity
    (useful as a base for ``dataclasses.replace``)."""
    # Spatial target. 0/0 = keep the source size (then only hflip and
    # the photometric ops apply).
    width: int = 0
    height: int = 0
    # RandomResizedCrop: crop area fraction range and aspect ratio
    # (w/h) range. (1,1)/(1,1) = deterministic full-frame resize.
    scale: tuple = (1.0, 1.0)
    ratio: tuple = (1.0, 1.0)
    # Probability of a horizontal flip.
    hflip: float = 0.0
    # ColorJitter half-ranges (0 = off): factor ~ U[max(0,1-x), 1+x].
    brightness: float = 0.0
    contrast: float = 0.0
    saturation: float = 0.0
    # Hue delta half-range in turns (torchvision hue=0.5 == half the
    # color circle); applied as a YIQ chroma rotation.
    hue: float = 0.0
    # Per-channel normalization (in the tensor's value scale), applied
    # after the final clamp. Both empty or both length-3.
    mean: tuple = ()
    std: tuple = ()
    # RandomErasing (torchvision semantics, applied LAST — after
    # mean/std, zero fill, i.e. the mean color of a normalized input):
    # probability, area-fraction range, aspect (w/h) range. One rect
    # per clip, shared by all frames (temporal consistency).
    erase: float = 0.0
    erase_scale: tuple = (0.02, 0.33)
    erase_ratio: tuple = (0.3, 3.3)

    def __post_init__(self):
        if (self.width > 0) != (self.height > 0):
            raise ValueError("width/height must be set together "
                             f"(got {self.width}x{self.height})")
        for name, rng, lo_min in (("scale", self.scale, 0.0),
                                  ("ratio", self.ratio, 0.0)):
            if len(rng) != 2 or not (lo_min < rng[0] <= rng[1]):
                raise ValueError(f"{name} must be (lo, hi) with "
                                 f"0 < lo <= hi, got {rng}")
        if self.scale[1] > 1.0:
            raise ValueError(f"scale upper bound must be <= 1.0 "
                             f"(a crop cannot exceed the frame), "
                             f"got {self.scale}")
        if (self.scale != (1.0, 1.0) or self.ratio != (1.0, 1.0)) \
                and not self.width:
            raise ValueError("scale/ratio sampling needs a static "
                             "output size; set width/height")
        if not 0.0 <= self.hflip <= 1.0:
            raise ValueError(f"hflip must be a probability, got "
                             f"{self.hflip}")
        for name, v in (("brightness", self.brightness),
                        ("contrast", self.contrast),
                        ("saturation", self.saturation)):
            if v < 0:
                raise ValueError(f"{name} must be >= 0, got {v}")
        if not 0.0 <= self.hue <= 0.5:
            raise ValueError(f"hue must be in [0, 0.5] turns, got "
                             f"{self.hue}")
        if not 0.0 <= self.erase <= 1.0:
            raise ValueError(f"erase must be a probability, got "
                             f"{self.erase}")
        es, er = self.erase_scale, self.erase_ratio
        if len(es) != 2 or not (0.0 < es[0] <= es[1] <= 1.0):
            raise ValueError(f"erase_scale must be (lo, hi) within "
                             f"(0, 1], got {es}")
        if len(er) != 2 or not (0.0 < er[0] <= er[1]):
            raise ValueError(f"erase_ratio must be (lo, hi) with "
                             f"0 < lo <= hi, got {er}")
        if bool(self.mean) != bool(self.std):
            raise ValueError("mean/std must be set together")
        if self.mean and (len(self.mean) != 3 or len(self.std) != 3
                          or any(s == 0 for s in self.std)):
            raise ValueError("mean/std must be length-3 with nonzero "
                             f"std, got {self.mean}/{self.std}")

    @property
    def identity(self):
        """True when this config never changes any pixel."""
        return (not self.width and self.scale == (1.0, 1.0)
                and self.ratio == (1.0, 1.0) and self.hflip == 0
                and self.brightness == 0 and self.contrast == 0
                and self.saturation == 0 and self.hue == 0
                and not self.mean and self.erase == 0)

    def output_size(self, src_w, src_h):
        return (self.width or src_w, self.height or src_h)


def _sample_rect(key, cfg, src_h, src_w):
    """RandomResizedCrop rect: (y0, x0, h, w) floats, clamped inside
    the frame (replaces torchvision's 10-try rejection loop)."""
    k_area, k_ratio, k_x, k_y = jax.random.split(key, 4)
    area = src_h * src_w * jax.random.uniform(
        k_area, minval=cfg.scale[0], maxval=cfg.scale[1])
    log_r = jax.random.uniform(k_ratio,
                               minval=math.log(cfg.ratio[0]),
                               maxval=math.log(cfg.ratio[1]))
    r = jnp.exp(log_r)
    w = jnp.clip(jnp.sqrt(area * r), 1.0, float(src_w))
    h = jnp.clip(jnp.sqrt(area / r), 1.0, float(src_h))
    x0 = jax.random.uniform(k_x) * (src_w - w)
    y0 = jax.random.uniform(k_y) * (src_h - h)
    return y0, x0, h, w


def _grid_1d(n_out, start, extent, flip=None):
    """Half-pixel bilinear sampling coordinates of `n_out` points over
    [start, start+extent); `flip` (traced bool or None) reverses the
    direction inside the rect."""
    u = (jnp.arange(n_out, dtype=jnp.float32) + 0.5) * (
        extent / n_out)
    if flip is not None:
        u = jnp.where(flip, extent - u, u)
    return start + u - 0.5


def _gather_lerp(x, coords, axis, size):
    """Bilinear 1D resample of `x` along `axis` at float `coords`,
    edge-replicated: BOTH neighbor indices clamp independently from the
    unclamped floor, so an out-of-range coordinate (e.g. -0.4 at the
    top border of an upsample) blends (0, 0) — pure edge pixel — not
    (0, 1)."""
    lo = jnp.floor(coords)
    t = (coords - lo)
    lo = lo.astype(jnp.int32)
    i0 = jnp.clip(lo, 0, size - 1)
    i1 = jnp.clip(lo + 1, 0, size - 1)
    a = jnp.take(x, i0, axis=axis)
    b = jnp.take(x, i1, axis=axis)
    shape = [1] * a.ndim
    shape[axis] = t.shape[0]
    t = t.reshape(shape)
    return a * (1.0 - t) + b * t


def make_clip_augment_fn(cfg: AugmentConfig, src_h: int, src_w: int,
                         planar: bool, unit: float = 1.0,
                         bgr: bool = False, out_dtype=None):
    """Builds ``fn(clip, key) -> clip`` for one clip.

    `clip` is ``[T, 3, H, W]`` (planar) or ``[T, H, W, 3]`` (merged) in
    any real dtype; math runs in f32 and the result is cast back to
    `out_dtype` (default: the input dtype; u8 gets round+clamp). `unit`
    is the value scale (1.0 for normalized tensors, 255.0 for u8-valued
    ones); jitter factors and the final clamp operate in that scale.
    All frames of the clip share one sampled transform."""
    h_axis, w_axis, c_axis = (2, 3, 1) if planar else (1, 2, 3)
    out_w, out_h = cfg.output_size(src_w, src_h)
    gray_w = np.asarray(_GRAY_RGB, np.float32)
    yiq, yiq_inv = _RGB2YIQ, _YIQ2RGB
    if bgr:
        gray_w = gray_w[::-1].copy()
        yiq = yiq[:, ::-1].copy()
        yiq_inv = yiq_inv[::-1, :].copy()
    spatial = bool(cfg.width) or cfg.hflip > 0
    n_jitter = sum(x > 0 for x in (cfg.brightness, cfg.contrast,
                                   cfg.saturation, cfg.hue))

    def _factor(key, half_range):
        return jax.random.uniform(key, minval=max(0.0, 1.0 - half_range),
                                  maxval=1.0 + half_range)

    def fn(clip, key):
        k_rect, k_flip, k_b, k_c, k_s, k_h, k_e = jax.random.split(key, 7)
        x = clip.astype(jnp.float32)
        if spatial:
            if cfg.width and (cfg.scale != (1.0, 1.0)
                              or cfg.ratio != (1.0, 1.0)):
                y0, x0, rh, rw = _sample_rect(k_rect, cfg, src_h, src_w)
            else:
                y0 = x0 = jnp.float32(0)
                rh, rw = jnp.float32(src_h), jnp.float32(src_w)
            flip = (jax.random.uniform(k_flip) < cfg.hflip) \
                if cfg.hflip > 0 else None
            ys = _grid_1d(out_h, y0, rh)
            xs = _grid_1d(out_w, x0, rw, flip)
            x = _gather_lerp(x, ys, h_axis, src_h)
            x = _gather_lerp(x, xs, w_axis, src_w)
        if n_jitter or cfg.mean:
            x = jnp.moveaxis(x, c_axis, -1)   # [..., 3] for channel math

            # Channel combinations are written elementwise, NOT as
            # matmuls: tiny [...,3]x[3,3] dots would hit the TPU MXU at
            # its default bf16 precision (~3 decimal digits) — the VPU
            # keeps them full f32 for free.
            def dot3(t, w):
                return (t[..., 0] * w[0] + t[..., 1] * w[1]
                        + t[..., 2] * w[2])

            if cfg.brightness > 0:
                x = x * _factor(k_b, cfg.brightness)
            if cfg.contrast > 0:
                m = jnp.mean(dot3(x, gray_w))  # mean gray of the CLIP
                x = (x - m) * _factor(k_c, cfg.contrast) + m
            if cfg.saturation > 0:
                g = dot3(x, gray_w)[..., None]
                x = g + (x - g) * _factor(k_s, cfg.saturation)
            if cfg.hue > 0:
                theta = 2.0 * math.pi * cfg.hue * jax.random.uniform(
                    k_h, minval=-1.0, maxval=1.0)
                c, s = jnp.cos(theta), jnp.sin(theta)
                lum = dot3(x, yiq[0])
                i0, q0 = dot3(x, yiq[1]), dot3(x, yiq[2])
                i1 = c * i0 - s * q0
                q1 = s * i0 + c * q0
                x = jnp.stack(
                    [lum * yiq_inv[ch, 0] + i1 * yiq_inv[ch, 1]
                     + q1 * yiq_inv[ch, 2] for ch in range(3)], axis=-1)
            if n_jitter:
                x = jnp.clip(x, 0.0, unit)
            if cfg.mean:
                mean = jnp.asarray(cfg.mean, jnp.float32)
                std = jnp.asarray(cfg.std, jnp.float32)
                x = (x - mean) / std
            x = jnp.moveaxis(x, -1, c_axis)
        if cfg.erase > 0:
            # RandomErasing, LAST (torchvision order: after normalize;
            # the zero fill is the mean color of a normalized input).
            # One rect per clip, fully inside the frame, all channels.
            ke_p, ke_a, ke_r, ke_y, ke_x = jax.random.split(k_e, 5)
            area = out_h * out_w * jax.random.uniform(
                ke_a, minval=cfg.erase_scale[0],
                maxval=cfg.erase_scale[1])
            r = jnp.exp(jax.random.uniform(
                ke_r, minval=math.log(cfg.erase_ratio[0]),
                maxval=math.log(cfg.erase_ratio[1])))
            ew = jnp.clip(jnp.sqrt(area * r), 1.0, float(out_w))
            eh = jnp.clip(jnp.sqrt(area / r), 1.0, float(out_h))
            y0 = jax.random.uniform(ke_y) * (out_h - eh)
            x0 = jax.random.uniform(ke_x) * (out_w - ew)
            ys = jnp.arange(out_h, dtype=jnp.float32)
            xs = jnp.arange(out_w, dtype=jnp.float32)
            shape_y = [1] * x.ndim
            shape_y[h_axis] = out_h
            shape_x = [1] * x.ndim
            shape_x[w_axis] = out_w
            inside = (((ys >= y0) & (ys < y0 + eh)).reshape(shape_y)
                      & ((xs >= x0) & (xs < x0 + ew)).reshape(shape_x))
            do = jax.random.uniform(ke_p) < cfg.erase
            x = jnp.where(do & inside, 0.0, x)
        dt = jnp.dtype(out_dtype) if out_dtype is not None else clip.dtype
        if dt == jnp.uint8:
            return jnp.clip(jnp.round(x), 0.0, 255.0).astype(jnp.uint8)
        return x.astype(dt)

    return fn


def make_frame_augment_fn(cfg: AugmentConfig, src_h: int, src_w: int,
                          planar: bool, unit: float = 1.0,
                          bgr: bool = False, out_dtype=None):
    """Single-frame variant: ``fn(frame, key)`` — a clip of length 1."""
    clip_fn = make_clip_augment_fn(cfg, src_h, src_w, planar, unit, bgr,
                                   out_dtype)

    def fn(frame, key):
        return clip_fn(frame[None], key)[0]

    return fn
