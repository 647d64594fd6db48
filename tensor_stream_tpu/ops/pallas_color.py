"""Hand-written Pallas/Mosaic TPU kernel for the hot VPP op:
full-frame NV12 -> RGB24/BGR24 conversion (+normalization, planar/merged).

This is the TPU counterpart of the reference's busiest CUDA kernels
(reference: src/ColorConversion.cu:41-93). The op is HBM-bandwidth bound
(1.5 B/px in, 3 or 12 B/px out); the kernel streams row-blocks of the Y
and UV planes through VMEM once, does the BT.601 math on the VPU with the
exact constants/rounding of the reference, and writes the channel planes
— one pass, no intermediate HBM traffic.

The chroma upsample (each UV byte pair serves a 2x2 luma block) is done
in-register: `pltpu.repeat` doubles the sublane (row) axis, and the
even/odd lane broadcast is a mask + `pltpu.roll` along lanes — no
gathers.

Math parity is asserted against the XLA path (itself bit-exact vs the
CUDA oracles) in tests/test_pallas.py.
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .color import _STANDARD_COEFS

# Correctly-rounded x/255 without a table lookup (Mosaic has no >=2D
# gather): 1/255 = 2^-8 / (1 - 2^-8) = 2^-8 * (1 + 2^-8 + 2^-16 + ...).
# For integer x in [0, 255], s = x + x*2^-8 + x*2^-16 is EXACT in f32
# (three non-overlapping 8-bit fields fill the 24-bit mantissa); the
# series tail x*(2^-24 + 2^-32 + ...) = x * 2^-24 * 256/255 is added as
# one rounded product, which perturbs the exact s by ~2^-40 relative —
# far below the half-ulp rounding boundary (x/255 is never exactly a
# tie: its binary expansion is infinite unless x % 255 == 0, and those
# cases are exact). Verified bit-identical to the f32 LUT for all 256
# values on TPU (tests/test_pallas.py).
_TAIL_255 = np.float32(np.float64(2.0) ** -24 * 256.0 / 255.0)


def _div255_exact(x_f32):
    s = (x_f32 + x_f32 * jnp.float32(2.0 ** -8)) + x_f32 * jnp.float32(2.0 ** -16)
    return (s + x_f32 * _TAIL_255) * jnp.float32(2.0 ** -8)


def _rgb_from_planes(y_f32, u_f32, v_f32, standard=0):
    """Exact reference math (src/ColorConversion.cu:23-38) on f32 blocks;
    `standard` selects the matrix like ops/color.py (compile-time
    constants — full-range folds the y_off=0/y_coef=1 identity away)."""
    rv, bu, gv, gu, y_coef, y_off = _STANDARD_COEFS[standard]
    yv = jnp.maximum(jnp.float32(0), y_f32 - y_off) * y_coef
    vi = v_f32 - jnp.float32(128)
    ui = u_f32 - jnp.float32(128)
    r = (yv + (rv * vi + jnp.float32(0.5))).astype(jnp.int32)
    b = (yv + (bu * ui + jnp.float32(0.5))).astype(jnp.int32)
    g = (yv + (gv * vi + gu * ui + jnp.float32(0.5))).astype(jnp.int32)
    clip = lambda x: jnp.clip(x, 0, 255)
    return clip(r), clip(g), clip(b)


def _u8_to_f32(x):
    # Mosaic has no direct u8->f32 cast; widen through int32 (bitcast to
    # i8 then mask keeps the unsigned range).
    return (x.astype(jnp.int32) & 0xFF).astype(jnp.float32)


def _nv12_rgb_kernel(y_ref, uv_ref, out_ref, *, swap_rb,
                     normalization, planar, block_w, uv_half_select=False,
                     standard=0):
    y = _u8_to_f32(y_ref[...])
    # UV row r serves luma rows 2r and 2r+1 — an interleaved doubling
    # (jnp.repeat lowers to broadcast+reshape on the sublane axis; NOT
    # pltpu.repeat, which tiles the whole block).
    uv2 = jnp.repeat(_u8_to_f32(uv_ref[...]), 2, axis=0)
    if uv_half_select:
        # 8-row-Y-block mode (heights divisible by 8 but not 16): the UV
        # block spec delivers 8 UV rows covering TWO Y blocks (index_map
        # i//2). Double to 16 rows, rotate this block's half to the top
        # (dynamic sublane rotate — value dynamic_slice doesn't lower),
        # and keep the first 8 rows statically.
        off = (pl.program_id(0) % 2) * 8
        uv2 = pltpu.roll(uv2, shift=16 - off, axis=0)[:8]
    lane = jax.lax.broadcasted_iota(jnp.int32, uv2.shape, dimension=1)
    even = (lane % 2) == 0
    u_even = jnp.where(even, uv2, 0.0)
    v_odd = jnp.where(even, 0.0, uv2)
    # broadcast each even-lane U to its odd neighbor, odd-lane V to even.
    u = u_even + pltpu.roll(u_even, shift=1, axis=1)
    v = v_odd + pltpu.roll(v_odd, shift=block_w - 1, axis=1)  # roll by -1
    r, g, b = _rgb_from_planes(y, u, v, standard)
    if swap_rb:
        r, b = b, r
    if normalization:
        chans = [_div255_exact(c.astype(jnp.float32)) for c in (r, g, b)]
        dtype = jnp.float32
    else:
        chans = [r, g, b]  # keep i32: Mosaic only reshapes 32-bit minor dims
        dtype = jnp.uint8
    axis = 0 if planar else -1
    out_ref[...] = jnp.stack(chans, axis=axis).astype(dtype)


@functools.lru_cache(maxsize=32)
def build_pallas_nv12_to_rgb(height: int, width: int, swap_rb: bool,
                             planar: bool, normalization: bool,
                             block_rows: int = 64, interpret: bool = False,
                             standard: int = 0):
    """Returns a jitted (y [H,W] u8, uv [H/2,W] u8) -> RGB converter.

    Requires even H and H % (2*block_rows) paddable; rows are processed in
    `block_rows`-row blocks (UV in block_rows/2). W must be a multiple of
    2 (NV12) — lane padding to 128 is handled by Mosaic.
    """
    assert height % 2 == 0 and width % 2 == 0
    # Mosaic blocks must have sublane counts divisible by 8 (Y) — and the
    # UV block is block_rows/2, so block_rows must be a multiple of 16
    # that divides the height. Heights divisible by 8 but not 16 (e.g.
    # exactly-1080-row streams) use 8-row Y blocks with an 8-row UV block
    # shared by two consecutive Y blocks (uv_half_select). Anything else
    # falls back to one whole-frame block (always legal: block == array
    # dims — small frames only, VMEM bounds it).
    while block_rows >= 16 and height % block_rows != 0:
        block_rows //= 2
    uv_half_select = False
    if block_rows < 16:
        if height % 16 != 0 and height % 8 == 0:
            block_rows = 8
            uv_half_select = True
        else:
            block_rows = height
    grid = (height // block_rows,)
    dtype = jnp.float32 if normalization else jnp.uint8
    # Merged [.., W, 3] blocks pad the 3-wide minor dim to 128 lanes in
    # VMEM (42x), so HD frames must bound the padded out block. Column
    # tiles must themselves be multiples of 128 (Mosaic block rule);
    # when no such divisor exists, keep whole-width blocks but drop to
    # 8-row blocks (uv_half_select mode) so the padded block stays
    # within budget (8 x W x 128 x 4B, double-buffered).
    block_cols = width
    if not planar and width > 512:
        for d in (384, 256, 128):
            if width % d == 0:
                block_cols = d
                break
        if block_cols < width:
            if block_rows > 16 and height % 16 == 0:
                block_rows = 16
        elif not uv_half_select and height % 16 == 0:
            block_rows = 8
            uv_half_select = True
        grid = (height // block_rows,)
    grid_cols = width // block_cols
    if planar:
        out_shape = jax.ShapeDtypeStruct((3, height, width), dtype)
        out_spec = pl.BlockSpec((3, block_rows, width),
                                lambda i: (0, i, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((height, width, 3), dtype)
        if grid_cols == 1:
            out_spec = pl.BlockSpec((block_rows, width, 3),
                                    lambda i: (i, 0, 0))
        else:
            out_spec = pl.BlockSpec((block_rows, block_cols, 3),
                                    lambda i, j: (i, j, 0))

    kernel = functools.partial(_nv12_rgb_kernel, swap_rb=swap_rb,
                               normalization=normalization, planar=planar,
                               block_w=block_cols,
                               uv_half_select=uv_half_select,
                               standard=standard)
    two_d = not planar and grid_cols > 1
    if two_d:
        grid = (height // block_rows, grid_cols)
        y_spec = pl.BlockSpec((block_rows, block_cols), lambda i, j: (i, j))
        if uv_half_select:
            uv_spec = pl.BlockSpec((8, block_cols), lambda i, j: (i // 2, j))
        else:
            uv_spec = pl.BlockSpec((block_rows // 2, block_cols),
                                   lambda i, j: (i, j))
    else:
        y_spec = pl.BlockSpec((block_rows, width), lambda i: (i, 0))
        if uv_half_select:
            uv_spec = pl.BlockSpec((8, width), lambda i: (i // 2, 0))
        else:
            uv_spec = pl.BlockSpec((block_rows // 2, width), lambda i: (i, 0))
    call = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[y_spec, uv_spec],
        out_specs=out_spec,
        out_shape=out_shape,
        interpret=interpret,
    )
    return jax.jit(call)
