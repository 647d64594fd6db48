"""NV12-domain crop.

Equivalent of the reference CUDA crop kernel (reference: src/Crop.cu:4-48).
Its per-pixel index arithmetic reduces to two plane slices:
  Y'  = Y [top : top+h,      left : left+w]
  UV' = UV[top/2 : top/2+h/2, left : left+w]
(the UV source column is the even-aligned dst column plus `left`, which for
the full even/odd pair sweep is exactly a contiguous slice). On TPU a
static slice compiles to a zero-cost HBM view feeding the fused VPP.
"""
import jax.numpy as jnp


def crop_nv12(y: jnp.ndarray, uv: jnp.ndarray, left: int, top: int,
              right: int, bottom: int):
    """Crops tightly-packed NV12 planes; box is (left, top, right, bottom)."""
    w = right - left
    h = bottom - top
    y_out = y[top:top + h, left:left + w]
    uv_out = uv[top // 2: top // 2 + h // 2, left:left + w]
    return y_out, uv_out
