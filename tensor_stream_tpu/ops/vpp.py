"""VPP: crop -> NV12-domain resize -> color conversion -> tensor shaping.

TPU re-design of the reference's VideoProcessor::Convert
(reference: src/VideoProcessor.cpp:94-166) plus the output tensor shape
contract of its Python wrapper (src/Wrappers/WrapperPython.cpp:315-343).

Where the reference launched 2-4 CUDA kernels with a cudaMalloc per stage,
here the whole chain is a single jitted XLA program per parameter
combination: static shapes, all gather tables baked in as constants, fully
fused by the compiler, one HBM round trip. Compiled programs are cached per
`VPPConfig` the way the reference cached per-consumer CUDA streams.
"""
import dataclasses
from dataclasses import dataclass
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

from .. import _compile_cache
from ..enums import (ColorStandard, FourCC, Planes, ResizeType,
                     channels_by_fourcc)
from . import color as color_ops
from .crop import crop_nv12
from .resize import resize_nv12


@dataclass(frozen=True)
class VPPConfig:
    """Static parameters of one conversion — the jit cache key."""
    src_width: int
    src_height: int
    crop: tuple = (0, 0, 0, 0)  # (left, top, right, bottom); zeros = off
    width: int = 0              # resize target; 0 = native
    height: int = 0
    resize_type: ResizeType = ResizeType.NEAREST
    fourcc: FourCC = FourCC.RGB24
    planes: Planes = Planes.MERGED
    normalization: bool = False
    # YUV->RGB matrix (TPU extension): BT601 = the reference's exact
    # constants (every committed oracle); BT709 for HD-mastered content.
    # Only affects RGB24/BGR24/HSV — the YUV-domain formats never apply
    # the matrix.
    standard: ColorStandard = ColorStandard.BT601
    # Output dtype override (TPU extension): "" keeps the reference
    # contract (uint8, or float32 when normalization is on); "bfloat16"
    # / "float16" / "float32" cast the final tensor on device. bf16 is
    # the natural model-input dtype on TPU — halving the post-VPP HBM
    # footprint — and the cast fuses into the conversion program (one
    # rounding, RN-even, applied after the reference-exact f32 math).
    dtype: str = ""

    def __post_init__(self):
        if self.dtype not in ("", "float32", "bfloat16", "float16"):
            raise ValueError(
                f"unsupported output dtype {self.dtype!r}; expected "
                "'bfloat16', 'float16', 'float32' or '' (contract default)")
        # HSV output is always normalized float (VideoProcessor.h:39-52).
        if self.fourcc == FourCC.HSV:
            object.__setattr__(self, "normalization", True)
        # NV12-domain resize interleaves UV at half the target width, so
        # odd targets would silently corrupt chroma (the reference's CUDA
        # kernels have the same constraint, unchecked); fail loudly.
        if (self.width or self.height) and (self.width % 2 or
                                            self.height % 2):
            raise ValueError("resize target must have even width/height "
                             f"(got {self.width}x{self.height})")

    def output_size(self):
        """Final (width, height) after crop/resize defaulting
        (reference: VideoProcessor.cpp:106-135)."""
        w, h = self.src_width, self.src_height
        cw = self.crop[2] - self.crop[0]
        ch = self.crop[3] - self.crop[1]
        if 0 < cw < self.src_width and 0 < ch < self.src_height:
            w, h = cw, ch
        if self.width and self.height:
            w, h = self.width, self.height
        return w, h

    def output_shape(self):
        """Tensor shape contract (WrapperPython.cpp:318-341)."""
        w, h = self.output_size()
        c = channels_by_fourcc(self.fourcc)
        if self.fourcc in (FourCC.RGB24, FourCC.BGR24):
            return (3, h, w) if self.planes == Planes.PLANAR else (h, w, 3)
        if self.fourcc in (FourCC.YUV444, FourCC.HSV):
            return (h, w, 3)
        return (1, int(h * c), w)

    def output_dtype(self):
        if self.dtype:
            return jnp.dtype(self.dtype)
        return jnp.float32 if self.normalization else jnp.uint8


def make_vpp_fn(cfg: VPPConfig):
    """Builds the (un-jitted) NV12 -> tensor conversion for `cfg`."""
    cw = cfg.crop[2] - cfg.crop[0]
    ch = cfg.crop[3] - cfg.crop[1]
    do_crop = 0 < cw < cfg.src_width and 0 < ch < cfg.src_height
    cur_w, cur_h = (cw, ch) if do_crop else (cfg.src_width, cfg.src_height)
    do_resize = bool(cfg.width and cfg.height and
                     (cfg.width != cur_w or cfg.height != cur_h))
    out_w, out_h = cfg.output_size()

    # Full-frame NV12->RGB (no crop/resize) is the hottest op; use the
    # hand-written Pallas kernel there — ~10-25% faster than the XLA
    # fusion at HD sizes (21.3 vs 24.0 us/frame measured at 1920x1080)
    # and bit-identical everywhere (tests/test_pallas.py). Planar only
    # BY MEASUREMENT: the kernel supports merged output too, but its
    # [.., W, 3] blocks pad lanes 3->128 and the padded stores DMA at
    # ~2% efficiency — 4053 us/frame vs XLA's 236 us at 1920x1080
    # (docs/ROADMAP.md item 3) — so merged stays on the XLA fusion.
    # Heights must be a multiple of 8 so the row blocks tile legally
    # (8-but-not-16 heights use the kernel's uv_half_select mode). Gated
    # to the TPU backend: the Mosaic primitives lower nowhere else.
    use_pallas = (not do_crop and not do_resize and
                  cfg.fourcc in (FourCC.RGB24, FourCC.BGR24) and
                  cfg.planes == Planes.PLANAR and
                  cfg.standard.value >= 0 and  # AUTO resolved upstream
                  cfg.src_height % 8 == 0 and
                  jax.default_backend() == "tpu")
    if use_pallas:
        from .pallas_color import build_pallas_nv12_to_rgb
        kernel = build_pallas_nv12_to_rgb(cfg.src_height, cfg.src_width,
                                          cfg.fourcc == FourCC.BGR24,
                                          cfg.planes == Planes.PLANAR,
                                          cfg.normalization,
                                          standard=cfg.standard.value)
        if not cfg.dtype:
            return kernel
        out_dtype = jnp.dtype(cfg.dtype)
        return lambda y, uv: kernel(y, uv).astype(out_dtype)

    def base_fn(y, uv):
        # named_scope: stage names surface in jax.profiler / XLA metadata,
        # the device-side counterpart of the reference's NVTX ranges.
        if do_crop:
            with jax.named_scope("vpp_crop"):
                y, uv = crop_nv12(y, uv, *cfg.crop)
        if do_resize:
            with jax.named_scope(f"vpp_resize_{cfg.resize_type.name}"):
                y, uv = resize_nv12(y, uv, cur_w, cur_h, cfg.width,
                                    cfg.height, cfg.resize_type)
        four = cfg.fourcc
        if four in (FourCC.RGB24, FourCC.BGR24):
            return color_ops.nv12_to_rgb(y, uv, swap_rb=(four == FourCC.BGR24),
                                         planar=(cfg.planes == Planes.PLANAR),
                                         normalization=cfg.normalization,
                                         standard=cfg.standard.value)
        if four == FourCC.Y800:
            return color_ops.nv12_to_y800(y, cfg.normalization)
        if four == FourCC.UYVY:
            out = color_ops.nv12_to_uyvy(y, uv, cfg.normalization)
            return out.reshape(1, out_h * 2, out_w)
        if four == FourCC.YUV444:
            uyvy = color_ops.nv12_to_uyvy(y, uv, normalization=False,
                                          as_float=cfg.normalization)
            return color_ops.uyvy_to_yuv444(uyvy, out_w, out_h,
                                            cfg.normalization,
                                            float_mode=cfg.normalization)
        if four == FourCC.NV12:
            return color_ops.nv12_merge(y, uv, cfg.normalization)
        if four == FourCC.HSV:
            return color_ops.nv12_to_hsv(y, uv, standard=cfg.standard.value)
        raise ValueError(f"unsupported FourCC {four}")

    if not cfg.dtype:
        return base_fn
    out_dtype = jnp.dtype(cfg.dtype)

    def fn(y, uv):
        return base_fn(y, uv).astype(out_dtype)

    return fn


@lru_cache(maxsize=256)
def build_vpp(cfg: VPPConfig, device_index: int = 0):
    """Jitted single-frame VPP: (y [H,W] u8, uv [H/2,W] u8) -> jax.Array."""
    _compile_cache.ensure_compile_cache()
    device = jax.devices()[device_index]
    return jax.jit(make_vpp_fn(cfg), device=device)


@lru_cache(maxsize=64)
def build_vpp_batched_flat(cfg: VPPConfig, batch: int, device_index: int = 0,
                           post_fn=None):
    """Jitted batched VPP over ONE flat NV12 staging buffer.

    Takes a single (batch*H*W*3/2,) uint8 array laid out as all Y planes
    followed by all UV planes and returns [batch, ...] tensors. One
    contiguous host->HBM transfer per batch instead of two — the
    transfer is the throughput wall on the consumer side, so the staging
    buffer is written once by the native ring drain and shipped whole.

    `post_fn` (optional, traceable, [batch, ...] in / any pytree out)
    runs INSIDE the same jitted program after the conversion — serving
    fuses its model here so one tick is one device dispatch and XLA
    fuses normalize/convert into the model's first ops
    (serving.StreamInferencer(pipeline="fused")).
    """
    _compile_cache.ensure_compile_cache()
    device = jax.devices()[device_index]
    fn = make_vpp_fn(cfg)
    h, w = cfg.src_height, cfg.src_width
    y_size = batch * h * w

    def flat_fn(flat):
        ys = flat[:y_size].reshape(batch, h, w)
        uvs = flat[y_size:].reshape(batch, h // 2, w)
        out = jax.vmap(fn)(ys, uvs)
        return post_fn(out) if post_fn is not None else out

    # NOTE: donating `flat` was tried and reverted — the outputs never
    # match the staging buffer's shape/dtype (u8 planes in, f32 or
    # differently-sized u8 tensors out), so XLA can alias nothing and
    # only emits "donated buffer not usable" warnings.
    return jax.jit(flat_fn, device=device)


@lru_cache(maxsize=64)
def build_vpp_clip_augment(cfg: VPPConfig, aug, clips: int, clip_len: int,
                           aug_seed: int, device_index: int = 0):
    """Jitted batched VPP + per-clip training augmentation.

    Same flat-staging contract as `build_vpp_batched_flat`, but the
    program takes a second `ids` input — int32 [clips, 2] of
    (epoch, clip identity) — derives one PRNG key per clip via
    fold_in(fold_in(key(aug_seed), epoch), identity), and applies the
    `AugmentConfig` transform (ops/augment.py) to each clip inside the
    SAME dispatch: decode bytes ship to HBM once and the normalized,
    augmented model input comes back. Returns [clips, clip_len, ...].
    Deterministic and resume-stable: a resumed loader re-derives the
    identical keys for the identical clips.
    """
    from .augment import make_clip_augment_fn
    if cfg.fourcc not in (FourCC.RGB24, FourCC.BGR24):
        raise ValueError("augment requires an RGB24/BGR24 pixel format "
                         f"(got {cfg.fourcc}) — the transforms are "
                         "defined on RGB model inputs")
    if aug.mean and cfg.output_dtype() == jnp.uint8:
        raise ValueError("mean/std normalization needs a float tensor; "
                         "pass normalization=True or dtype='bfloat16'/"
                         "'float32'")
    _compile_cache.ensure_compile_cache()
    device = jax.devices()[device_index]
    # The inner VPP runs WITHOUT the output-dtype override: augmentation
    # math must see the contract f32/u8 values, and the single final
    # rounding to cfg's dtype happens in clip_fn (out_dtype) — otherwise
    # a bf16/f16 override would quantize BEFORE the jitter/crop math and
    # round a second time after it.
    fn = make_vpp_fn(dataclasses.replace(cfg, dtype=""))
    h, w = cfg.src_height, cfg.src_width
    out_w, out_h = cfg.output_size()
    clip_fn = make_clip_augment_fn(
        aug, out_h, out_w, planar=(cfg.planes == Planes.PLANAR),
        unit=1.0 if cfg.normalization else 255.0,
        bgr=(cfg.fourcc == FourCC.BGR24), out_dtype=cfg.output_dtype())
    batch = clips * clip_len
    y_size = batch * h * w

    def flat_fn(flat, ids):
        ys = flat[:y_size].reshape(batch, h, w)
        uvs = flat[y_size:].reshape(batch, h // 2, w)
        t = jax.vmap(fn)(ys, uvs)
        t = t.reshape((clips, clip_len) + t.shape[1:])
        base = jax.random.key(aug_seed)
        keys = jax.vmap(lambda e, i: jax.random.fold_in(
            jax.random.fold_in(base, e), i))(ids[:, 0], ids[:, 1])
        return jax.vmap(clip_fn)(t, keys)

    return jax.jit(flat_fn, device=device)


@lru_cache(maxsize=64)
def build_vpp_batched(cfg: VPPConfig, device_index: int = 0):
    """Jitted batched VPP: (y [N,H,W], uv [N,H/2,W]) -> [N, ...].

    The batch dimension is how the TPU earns its keep: one dispatch
    processes many frames, amortizing host->HBM transfer and kernel launch
    (the reference processed one frame per CUDA launch chain).
    """
    _compile_cache.ensure_compile_cache()
    device = jax.devices()[device_index]
    fn = make_vpp_fn(cfg)
    return jax.jit(jax.vmap(fn), device=device)


def vpp_numpy(cfg: VPPConfig, y: np.ndarray, uv: np.ndarray) -> np.ndarray:
    """Convenience: run the VPP on host arrays and return a NumPy copy."""
    return np.asarray(build_vpp(cfg)(y, uv))
