"""Flash attention for TPU — a Pallas/Mosaic kernel with online softmax.

The model families (VideoViT / VideoDiT / VideoMoE, models/video_vit.py)
attend with a materialized [.., S, S] logits tensor: exact, fine for the
factorized short sequences they default to, but O(S²) HBM traffic the
moment clips get long (a 32-frame 448² clip is S = 6272 spatial tokens —
157 MB of f32 logits per head). This module keeps attention in VMEM:
Q tiles stay resident while K/V tiles stream through once, a running
(m, l) softmax makes the tiling exact, and the [S, S] matrix never
exists in HBM. The reference framework has no transformer layer at all
(its model example is a per-frame CNN, reference: python_examples/
fast_neural_style/transformer_net.py) — this is part of the TPU-native
model/serving stack built on top of the same loaders.

Design notes (the kernel playbook, not a port of any implementation):
  * grid = (batch, heads, q_tiles, kv_tiles); kv is the innermost
    "arbitrary" (sequential) dimension — it is the online-softmax
    reduction; batch/head/q tiles are "parallel" (megacore-splittable).
  * running stats m (row max) and l (row sum) live in VMEM scratch,
    lane-replicated to (block_q, 128) so every store is a full native
    tile; the f32 accumulator is (block_q, head_dim).
  * the accumulator stays UNNORMALIZED across kv tiles (one alpha
    rescale per tile); the single division by l happens at the last kv
    tile, fused with the output cast.
  * causal masking skips whole above-diagonal kv tiles at the grid
    level (no matmul issued) and masks elementwise only in the one
    straddling tile; fully-padded kv tiles are skipped the same way.
  * logits/stats accumulate in f32 (preferred_element_type); the P@V
    matmul runs in the input dtype (bf16 feeds the MXU at full rate).
    For bf16/f16 inputs the normalizer l rides that matmul as a
    ones-augmented V column (the kernel is VPU-bound at d=64; the l
    error is subsumed by the output's own quantization); f32 inputs
    keep an exact f32 VPU sum for l.
  * masked logits get -0.7*f32max, not -inf: exp(-inf - (-inf)) is NaN
    for rows that a mask empties.

The backward pass is memory-efficient without a second kernel: a
custom_vjp recomputes P one kv tile at a time from the saved (o, l, m)
residuals inside a lax.scan — peak memory O(S·block_k) instead of
O(S²), every step two MXU matmuls (XLA pipelines the scan). Gradients
are exact (same tiling identity as the forward), asserted against the
materialized reference in tests/test_flash_attention.py.

On non-TPU backends the kernel runs in Pallas interpret mode (tests run
on the CPU mesh); `impl="xla"` forces the materialized path.
"""
import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_MASK_VALUE = -0.7 * float(np.finfo(np.float32).max)


def _cdiv(a, b):
    return -(-a // b)


def _ones_augment(v):
    """[..., d] -> [..., d+1] with an all-ones last column: P @ v_aug
    then computes sum(p) (the softmax normalizer) in column d ON THE
    MXU, sparing the kernels a VPU cross-lane sum pass per tile. One
    O(S·d) HBM copy per call — noise next to the kernel's tile work."""
    return jnp.concatenate(
        [v, jnp.ones(v.shape[:-1] + (1,), v.dtype)], axis=-1)


def _band_lo(qi, window, block_q, block_k):
    """First kv tile intersecting q tile `qi`'s sliding-window band: the
    earliest tile whose last column reaches first_q_row - window + 1.
    Works on both traced int32 (inside kernels / index maps) and Python
    ints (static grid sizing)."""
    if isinstance(qi, int):
        return max(qi * block_q - (window - 1), 0) // block_k
    return jnp.maximum(qi * block_q - (window - 1), 0) // block_k


def _kernel(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref,
            m_scr, acc_scr, l_scr=None, *, sm_scale, causal, window,
            q_len, kv_len, block_q, block_k, save_residuals, banded):
    qi = pl.program_id(2)
    ki = pl.program_id(3)
    nk = pl.num_programs(3)
    if banded:
        # Band-restricted kv grid (window set): the grid's kv dimension
        # covers only the live band of this q tile, so out-of-band tiles
        # never become grid steps at all — per-query cost is O(window)
        # in grid steps, DMAs AND matmuls (r04 measured grid-level
        # `pl.when` skips alone buying 1.4x where the live-tile ratio
        # implies ~4x: thousands of skipped steps still paid their
        # per-step overhead). `ki` here is band-relative; rebase it on
        # the q tile's first live kv tile.
        ki = _band_lo(qi, window, block_q, block_k) + ki

    @pl.when(pl.program_id(3) == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        acc_scr[...] = jnp.zeros_like(acc_scr)
        if l_scr is not None:
            l_scr[...] = jnp.zeros_like(l_scr)

    # Whole-tile skips: above the causal diagonal (first kv row of this
    # tile > last q row of this q tile), entirely inside kv padding, or
    # (banded grid) past the band's trailing edge when this q tile's
    # band is narrower than the static band width.
    run = ki * block_k < kv_len
    if causal:
        run = jnp.logical_and(run, ki * block_k <= (qi + 1) * block_q - 1)
    if window is not None:
        # Band lower edge: the tile's last kv col must reach
        # first_q_row - window + 1. (Banded grids start at the band's
        # first tile by construction; kept for the non-banded path.)
        run = jnp.logical_and(
            run, (ki + 1) * block_k - 1 >= qi * block_q - window + 1)
        if not causal:
            # Symmetric band |row - col| < window: upper edge too.
            run = jnp.logical_and(
                run, ki * block_k <= (qi + 1) * block_q - 1 + window - 1)

    # Elementwise masking is the largest VPU cost after exp (two iotas,
    # compares and a select over the whole [block_q, block_k] tile) and
    # only EDGE tiles need it: the one the causal diagonal straddles,
    # the ones a window edge crosses, and the kv-padding tile. Interior
    # tiles run a mask-free body; the two variants live under exclusive
    # pl.when predicates.
    needs_mask = (ki + 1) * block_k > kv_len
    if causal:
        needs_mask = jnp.logical_or(
            needs_mask, (ki + 1) * block_k - 1 > qi * block_q)
    if window is not None:
        needs_mask = jnp.logical_or(
            needs_mask, ki * block_k <= (qi + 1) * block_q - 1 - window)
        if not causal:
            needs_mask = jnp.logical_or(
                needs_mask, (ki + 1) * block_k - 1 >= qi * block_q + window)

    def _tile_body(masked):
        q = q_ref[0, 0]                       # [block_q, d]
        k = k_ref[0, 0]                       # [block_k, d]
        # Explicit DEFAULT precision: the kernel must be insensitive to a
        # global jax_default_matmul_precision='highest' (Mosaic rejects
        # fp32-precision matmuls on bf16 operands).
        s = jax.lax.dot_general(
            q, k, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.DEFAULT)      # [block_q, block_k]
        s *= sm_scale

        if masked:
            col = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 1)
                   + ki * block_k)
            mask = col < kv_len
            if causal or window is not None:
                row = (jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
                       + qi * block_q)
            if causal:
                mask = jnp.logical_and(mask, col <= row)
            if window is not None:
                if causal:
                    mask = jnp.logical_and(mask, col > row - window)
                else:
                    mask = jnp.logical_and(mask, jnp.abs(col - row) < window)
            # jnp.float32(...): a bare Python float weak-types to f64
            # under jax.enable_x64 and Mosaic cannot lower the f64->f32
            # truncf.
            s = jnp.where(mask, s, jnp.float32(_MASK_VALUE))

        m_prev = m_scr[...]                           # [block_q, 128]
        m_curr = jnp.max(s, axis=1, keepdims=True)    # [block_q, 1]
        m_next = jnp.maximum(m_prev, m_curr)          # lane-replicated
        alpha = jnp.exp(m_prev - m_next)
        # s - m_next: m_next is lane-replicated, tile it across the kv
        # lanes of the logits block (block_k is a multiple of 128).
        reps = block_k // _LANES
        m_tiled = m_next if reps == 1 else jnp.tile(m_next, (1, reps))
        p = jnp.exp(s - m_tiled)                      # [block_q, block_k]
        m_scr[...] = m_next

        # v arrives ONES-AUGMENTED ([block_k, d+1], last column all 1s):
        # column d of P@V is sum(p), and the accumulator's alpha
        # recurrence is exactly the online-softmax l recurrence — the
        # normalizer rides the MXU matmul instead of paying a VPU
        # cross-lane sum pass over every [block_q, block_k] tile (the
        # kernel is VPU-bound at d=64; 2.94 -> 2.32 ms at 256x512,
        # S=8192 causal). bf16/f16 inputs only: DEFAULT-precision MXU
        # passes truncate operands to bf16, and p is already
        # bf16-rounded for the P@V product there (the l error is
        # subsumed by the output's own quantization) — but f32 inputs
        # promise f32 softmax stats, so they keep the exact VPU sum
        # (l_scr) and ignore the augmented column.
        if l_scr is not None:
            l_scr[...] = alpha * l_scr[...] + jnp.sum(p, axis=1,
                                                      keepdims=True)
        v = v_ref[0, 0]                               # [block_k, d+1]
        o_curr = jax.lax.dot(p.astype(v.dtype), v,
                             preferred_element_type=jnp.float32,
                             precision=jax.lax.Precision.DEFAULT)
        # alpha is lane-replicated: one lane broadcasts over ANY head_dim
        # (a [:, :d] slice breaks the moment d > 128 lanes).
        acc_scr[...] = acc_scr[...] * alpha[:, :1] + o_curr

    @pl.when(jnp.logical_and(run, needs_mask))
    def _tile_masked():
        _tile_body(True)

    @pl.when(jnp.logical_and(run, jnp.logical_not(needs_mask)))
    def _tile_plain():
        _tile_body(False)

    @pl.when(pl.program_id(3) == nk - 1)
    def _store():
        acc = acc_scr[...]                            # [block_q, d+1]
        d = acc.shape[1] - 1
        if l_scr is not None:
            l = l_scr[...][:, :1]                     # exact f32 VPU sum
        else:
            l = acc[:, d:]                            # sum(p), via MXU
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc[:, :d] * l_inv).astype(o_ref.dtype)
        if save_residuals:
            l_ref[0, 0] = jnp.broadcast_to(l, l_ref[0, 0].shape)
            m_ref[0, 0] = m_scr[...]


def _band_kernel(q_ref, k_ref, v_ref, o_ref, l_ref, m_ref, *, sm_scale,
                 causal, window, kv_len, block_q, band, sk_pad,
                 save_residuals):
    """Sliding-window forward, band-as-one-block: the q tile's whole live
    band is fetched as a single kv block (Element/unblocked indexing, the
    band start is not tile-aligned), so the softmax is one plain pass —
    no online (m, l) accumulation, no inner kv grid, no per-step pipeline
    overhead. r04's grid-level `pl.when` skip measured 1.4x at
    S=8192/W=1024 (skipped steps still cost ~0.3 us each and live steps
    never amortize their q-boundary pipeline flushes over a 3-step band);
    this shape measures ~3.5x on the same point."""
    qi = pl.program_id(2)
    base = _band_base(qi, causal, window, block_q, band, sk_pad)
    q = q_ref[0, 0]                                   # [block_q, d]
    k = k_ref[0, 0]                                   # [band, d]
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.DEFAULT)          # [block_q, band]
    s *= sm_scale

    col = jax.lax.broadcasted_iota(jnp.int32, s.shape, 1) + base
    row = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0) + qi * block_q
    mask = col < kv_len
    if causal:
        mask = jnp.logical_and(mask, col <= row)
        mask = jnp.logical_and(mask, col > row - window)
    else:
        mask = jnp.logical_and(mask, jnp.abs(col - row) < window)
    s = jnp.where(mask, s, jnp.float32(_MASK_VALUE))

    m = jnp.max(s, axis=1, keepdims=True)             # [block_q, 1]
    p = jnp.exp(s - m)
    v_ = v_ref[0, 0]                                  # [band, d+1] (ones)
    o = jax.lax.dot(p.astype(v_.dtype), v_,
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
    d = o.shape[1] - 1
    if v_.dtype == jnp.float32:
        # f32 contract: exact VPU normalizer (DEFAULT MXU passes
        # truncate to bf16 — fine for bf16 inputs, not for f32 stats).
        l = jnp.sum(p, axis=1, keepdims=True)
    else:
        l = o[:, d:]                                  # sum(p), via MXU
    l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
    o_ref[0, 0] = (o[:, :d] * l_inv).astype(o_ref.dtype)
    if save_residuals:
        l_ref[0, 0] = jnp.broadcast_to(l, l_ref[0, 0].shape)
        m_ref[0, 0] = jnp.broadcast_to(m, m_ref[0, 0].shape)


def _band_base(qi, causal, window, block_q, band, sk_pad):
    """Element (not block) offset of q tile `qi`'s kv band: low edge of
    the window, aligned down to the 128-lane grain, clamped in-bounds.
    `band` is sized (in _band_sizes) so the aligned-down start still
    covers the tile's last live column."""
    raw = qi * block_q - (window - 1)  # symmetric and causal share the low edge
    hi = sk_pad - band
    if isinstance(raw, int):
        return (min(max(raw, 0), hi) // _LANES) * _LANES
    # The //128*128 must be the LAST op: Mosaic's layout prover needs to
    # see the returned element offset as provably lane-aligned.
    return (jnp.clip(raw, 0, hi) // _LANES) * _LANES


def _band_sizes(causal, window, block_q):
    """Static band width covering every live column of a q tile plus the
    128-lane alignment slack of the band start."""
    span = block_q + window - 1 if causal else block_q + 2 * (window - 1)
    return _cdiv(span + _LANES - 1, _LANES) * _LANES


# Above this many band columns the one-block kernel's VMEM working set
# (f32 logits [block_q, band] + double-buffered kv blocks) stops fitting
# comfortably; wider windows fall back to the banded-grid kernel.
_BAND_COLS_MAX = 4608


def _flash_fwd_band_pallas(q, k, v, causal, window, sm_scale, block_q,
                           q_len, kv_len, save_residuals, interpret):
    from jax._src.pallas.core import Element  # no public alias yet

    b, h, sq, d = q.shape
    sk = k.shape[2]
    group = h // k.shape[1]
    nq = sq // block_q
    band = _band_sizes(causal, window, block_q)
    grid = (b, h, nq)
    kernel = functools.partial(
        _band_kernel, sm_scale=sm_scale, causal=causal, window=window,
        kv_len=kv_len, block_q=block_q, band=band, sk_pad=sk,
        save_residuals=save_residuals)
    out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
                 jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32),
                 jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, q_: (b_, h_, q_, 0)),
        pl.BlockSpec((1, 1, block_q, _LANES),
                     lambda b_, h_, q_: (b_, h_, q_, 0)),
        pl.BlockSpec((1, 1, block_q, _LANES),
                     lambda b_, h_, q_: (b_, h_, q_, 0)),
    ]

    def kv_map(b_, h_, q_):
        return (b_, h_ // group,
                _band_base(q_, causal, window, block_q, band, sk), 0)

    k_spec = pl.BlockSpec(
        (Element(1), Element(1), Element(band), Element(d)), kv_map)
    v_spec = pl.BlockSpec(
        (Element(1), Element(1), Element(band), Element(d + 1)), kv_map)
    v = _ones_augment(v)
    o, l, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, q_: (b_, h_, q_, 0)),
            k_spec,
            v_spec,
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel")),
        interpret=interpret,
    )(q, k, v)
    return o, l[..., 0], m[..., 0]


def _flash_fwd_pallas(q, k, v, causal, window, sm_scale, block_q, block_k,
                      q_len, kv_len, save_residuals, interpret):
    b, h, sq, d = q.shape
    sk = k.shape[2]
    # GQA: kv heads may be a divisor of q heads — the grid iterates q
    # heads and the k/v index maps fold each group onto its kv head (no
    # materialized jnp.repeat; the kernel streams the SHARED kv tiles).
    group = h // k.shape[1]
    nq = sq // block_q
    nk = sk // block_k

    # Sliding window: restrict the kv grid dimension to the band itself.
    # The widest per-q-tile band (in tiles) is computed statically over
    # all q tiles; the kernel and the index maps rebase the band-relative
    # kv step onto the q tile's first live tile. Out-of-band kv tiles are
    # then not skipped grid steps — they don't exist, so neither their
    # DMAs nor their per-step grid overhead is paid (r04: `pl.when`
    # skips alone measured 1.4x at S=8192/W=1024 where the live ratio
    # implies ~4x — the ~2k skipped steps' overhead ate the win).
    banded = window is not None
    if banded:
        def _hi(q_):
            if causal:
                e = ((q_ + 1) * block_q - 1) // block_k
            else:
                e = ((q_ + 1) * block_q + window - 2) // block_k
            return min(e, nk - 1)
        nk_grid = max(_hi(q_) - _band_lo(q_, window, block_q, block_k) + 1
                      for q_ in range(nq))
    else:
        nk_grid = nk
    grid = (b, h, nq, nk_grid)

    # Bandwidth twin of the kernel's grid-level skip, for the non-banded
    # (plain causal / padded) grid: clamp the kv BLOCK index into the
    # live range for this q tile. Skipped grid steps then request the
    # block already resident in VMEM and the pipeline elides the
    # HBM->VMEM copy (Mosaic only issues the DMA when the computed index
    # changes between steps). The in-kernel `run` predicate keeps the
    # clamped (aliased) tiles from contributing to the accumulator.
    last_kv_tile = (kv_len - 1) // block_k  # never fetch all-padding tiles

    def _kv_block(q_, k_):
        if banded:
            k_ = _band_lo(q_, window, block_q, block_k) + k_
        ki = jnp.minimum(k_, last_kv_tile)
        if causal:
            ki = jnp.minimum(ki, ((q_ + 1) * block_q - 1) // block_k)
        elif window is not None:
            ki = jnp.minimum(
                ki, ((q_ + 1) * block_q + window - 2) // block_k)
        return ki
    kernel = functools.partial(
        _kernel, sm_scale=sm_scale, causal=causal, window=window,
        q_len=q_len, kv_len=kv_len, block_q=block_q, block_k=block_k,
        save_residuals=save_residuals, banded=banded)
    out_shape = [jax.ShapeDtypeStruct((b, h, sq, d), q.dtype),
                 jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32),
                 jax.ShapeDtypeStruct((b, h, sq, _LANES), jnp.float32)]
    out_specs = [
        pl.BlockSpec((1, 1, block_q, d), lambda b_, h_, q_, k_: (b_, h_, q_, 0)),
        pl.BlockSpec((1, 1, block_q, _LANES),
                     lambda b_, h_, q_, k_: (b_, h_, q_, 0)),
        pl.BlockSpec((1, 1, block_q, _LANES),
                     lambda b_, h_, q_, k_: (b_, h_, q_, 0)),
    ]
    # Ones-augment v so the kernel's P@V matmul also produces the
    # softmax normalizer (column d) — see _kernel._tile_body.
    v = _ones_augment(v)
    o, l, m = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, 1, block_q, d),
                         lambda b_, h_, q_, k_: (b_, h_, q_, 0)),
            pl.BlockSpec((1, 1, block_k, d),
                         lambda b_, h_, q_, k_:
                         (b_, h_ // group, _kv_block(q_, k_), 0)),
            pl.BlockSpec((1, 1, block_k, d + 1),
                         lambda b_, h_, q_, k_:
                         (b_, h_ // group, _kv_block(q_, k_), 0)),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((block_q, _LANES), jnp.float32),   # running max
            pltpu.VMEM((block_q, d + 1), jnp.float32),    # unnorm. o | l
        ] + ([] if q.dtype != jnp.float32 else [
            pltpu.VMEM((block_q, _LANES), jnp.float32),   # f32 exact l
        ]),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel",
                                 "arbitrary")),
        interpret=interpret,
    )(q, k, v)
    return o, l[..., 0], m[..., 0]


def _pad_axis(x, axis, to):
    pad = to - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _reference(q, k, v, causal, sm_scale, window=None):
    """Materialized-logits attention, identical numerics contract
    (f32 logits/softmax, input-dtype P@V) — the `impl="xla"` path and
    the oracle the kernel is asserted against. GQA kv (fewer kv heads)
    is materialized by repeating heads; `window` masks the band."""
    if k.shape[1] != q.shape[1]:
        rep = q.shape[1] // k.shape[1]
        k = jnp.repeat(k, rep, axis=1)
        v = jnp.repeat(v, rep, axis=1)
    s = jnp.einsum("bhqd,bhkd->bhqk", q, k,
                   preferred_element_type=jnp.float32) * sm_scale
    sq, sk = q.shape[2], k.shape[2]
    mask = None
    if causal:
        mask = jnp.tril(jnp.ones((sq, sk), bool), k=sk - sq)
    if window is not None:
        row = jnp.arange(sq)[:, None]
        col = jnp.arange(sk)[None, :]
        band = (col > row - window) if causal else \
            (jnp.abs(col - row) < window)
        mask = band if mask is None else jnp.logical_and(mask, band)
    if mask is not None:
        s = jnp.where(mask, s, jnp.float32(_MASK_VALUE))
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bhqk,bhkd->bhqd", p.astype(v.dtype), v)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8))
def _flash(q, k, v, causal, window, sm_scale, block_q, block_k, interpret):
    o, _, _ = _fwd_padded(q, k, v, causal, window, sm_scale, block_q,
                          block_k, interpret)
    return o


def _fwd_padded(q, k, v, causal, window, sm_scale, block_q, block_k,
                interpret):
    """Pad sequences to tile multiples, run the kernel, slice back.
    Returns (o, l, m) with l/m at the PADDED q length (the backward
    scan re-pads its tensors to match)."""
    sq, sk = q.shape[2], k.shape[2]
    sq_pad = _cdiv(sq, block_q) * block_q
    sk_pad = _cdiv(sk, block_k) * block_k
    qp = _pad_axis(q, 2, sq_pad)
    kp = _pad_axis(k, 2, sk_pad)
    vp = _pad_axis(v, 2, sk_pad)
    if (window is not None
            and _band_sizes(causal, window, block_q)
            <= min(sk_pad, _BAND_COLS_MAX)):
        o, l, m = _flash_fwd_band_pallas(qp, kp, vp, causal, window,
                                         sm_scale, block_q, sq, sk, True,
                                         interpret)
    else:
        o, l, m = _flash_fwd_pallas(qp, kp, vp, causal, window, sm_scale,
                                    block_q, block_k, sq, sk, True,
                                    interpret)
    return o[:, :, :sq], l, m


def _flash_fwd(q, k, v, causal, window, sm_scale, block_q, block_k,
               interpret):
    o, l, m = _fwd_padded(q, k, v, causal, window, sm_scale, block_q,
                          block_k, interpret)
    return o, (q, k, v, o, l, m)


def _flash_bwd(causal, window, sm_scale, block_q, block_k, interpret, res,
               do):
    """Tile-recomputing backward: for each kv tile, rebuild P from the
    saved softmax stats, then
        dv_j = P^T @ dO        dP = dO @ V_j^T
        dS = P * (dP - delta)  (delta = rowsum(dO * O))
        dq += dS @ K_j * scale dk_j = dS^T @ Q * scale
    One lax.scan step per kv tile: O(S·block_k) live memory. With a
    sliding window each step additionally slices the q side down to the
    kv tile's live row band, so windowed training cost is O(S·W) like
    the forward (see the banded_bwd block below).

    Matmul OPERANDS stay in the input dtype (bf16 inputs hit the MXU at
    bf16 rate — an all-f32 recompute measured 3x slower for the whole
    fwd+bwd at S=2048); softmax stats, delta and every accumulation are
    f32 (`preferred_element_type`), the same contract as the forward
    kernel."""
    q, k, v, o, l, m = res
    b, h, sq, d = q.shape
    hk = k.shape[1]
    g = h // hk
    sk = k.shape[2]
    sk_pad = _cdiv(sk, block_k) * block_k
    nk = sk_pad // block_k
    dt = q.dtype

    # Sliding window: each kv tile only interacts with a band of q rows
    # (block_k + window - 1 rows for causal, + 2*(window-1) symmetric).
    # Slice exactly that band out of the q-side tensors per scan step
    # (dynamic_slice at the tile's first live row) so the per-step
    # matmuls are O(band·block_k), not O(S·block_k) — the backward twin
    # of the forward's band-restricted kv grid; total fwd+bwd cost with
    # a window is O(S·W). Rows inside the slice but outside the band
    # contribute exactly 0 (their logits are masked to _MASK_VALUE and
    # exp underflows to 0.0 in f32), so gradients stay exact.
    if window is not None:
        bwd_off = 0 if causal else window - 1
        span = (block_k + window - 1 if causal
                else block_k + 2 * (window - 1))
        bwd_span = min(_cdiv(span, _LANES) * _LANES, sq)
        banded_bwd = bwd_span < sq
    else:
        banded_bwd = False

    dof = do.astype(dt)
    delta = jnp.sum(do.astype(jnp.float32) * o.astype(jnp.float32),
                    axis=-1)                                 # [b,h,sq]
    l_q = l[:, :, :sq]
    m_q = m[:, :, :sq]
    l_inv = jnp.where(l_q == 0.0, 1.0, 1.0 / l_q)

    # Group the q-side tensors by kv head — [b, hk, g, sq, ...]: every
    # kv tile interacts with its whole query-head group (GQA; g=1 is
    # plain MHA and the einsums degenerate to the ungrouped ones).
    qg = q.reshape(b, hk, g, sq, d)
    dofg = dof.reshape(b, hk, g, sq, d)
    deltag = delta.reshape(b, hk, g, sq)
    m_g = m_q.reshape(b, hk, g, sq)
    l_invg = l_inv.reshape(b, hk, g, sq)

    # kv tensors reshaped to per-tile blocks for the scan.
    kb = _pad_axis(k, 2, sk_pad).reshape(
        b, hk, nk, block_k, d).transpose(2, 0, 1, 3, 4)
    vb = _pad_axis(v, 2, sk_pad).reshape(
        b, hk, nk, block_k, d).transpose(2, 0, 1, 3, 4)

    row = jnp.arange(sq, dtype=jnp.int32)
    prec = jax.lax.Precision.DEFAULT

    def step(dq_acc, xs):
        j, kj, vj = xs
        if banded_bwd:
            start = jnp.clip(j * block_k - bwd_off, 0, sq - bwd_span)
            sl = lambda x: jax.lax.dynamic_slice_in_dim(x, start, bwd_span,
                                                        axis=3)
            qs, dofs = sl(qg), sl(dofg)
            deltas, ms, lis = sl(deltag), sl(m_g), sl(l_invg)
            rows = start + jnp.arange(bwd_span, dtype=jnp.int32)
        else:
            qs, dofs, deltas, ms, lis, rows = (qg, dofg, deltag, m_g,
                                               l_invg, row)
        s = jnp.einsum("bhgqd,bhkd->bhgqk", qs, kj,
                       preferred_element_type=jnp.float32,
                       precision=prec) * sm_scale
        col = j * block_k + jnp.arange(block_k, dtype=jnp.int32)
        mask = jnp.broadcast_to(col[None, :] < sk,
                                (rows.shape[0], block_k))
        if causal:
            mask = jnp.logical_and(mask, col[None, :] <= rows[:, None])
        if window is not None:
            band = (col[None, :] > rows[:, None] - window) if causal \
                else (jnp.abs(col[None, :] - rows[:, None]) < window)
            mask = jnp.logical_and(mask, band)
        s = jnp.where(mask[None, None, None], s, jnp.float32(_MASK_VALUE))
        p = jnp.exp(s - ms[..., None]) * lis[..., None]
        pc = p.astype(dt)
        dv_j = jnp.einsum("bhgqk,bhgqd->bhkd", pc, dofs,
                          preferred_element_type=jnp.float32,
                          precision=prec)
        dp = jnp.einsum("bhgqd,bhkd->bhgqk", dofs, vj,
                        preferred_element_type=jnp.float32,
                        precision=prec)
        ds = (p * (dp - deltas[..., None]) * sm_scale).astype(dt)
        dq_part = jnp.einsum("bhgqk,bhkd->bhgqd", ds, kj,
                             preferred_element_type=jnp.float32,
                             precision=prec)
        if banded_bwd:
            dq_acc = jax.lax.dynamic_update_slice_in_dim(
                dq_acc, sl(dq_acc) + dq_part, start, axis=3)
        else:
            dq_acc = dq_acc + dq_part
        dk_j = jnp.einsum("bhgqk,bhgqd->bhkd", ds, qs,
                          preferred_element_type=jnp.float32,
                          precision=prec)
        return dq_acc, (dk_j, dv_j)

    dq0 = jnp.zeros((b, hk, g, sq, d), jnp.float32)
    dq, (dk_b, dv_b) = jax.lax.scan(
        step, dq0, (jnp.arange(nk, dtype=jnp.int32), kb, vb))
    dq = dq.reshape(b, h, sq, d)
    dk = dk_b.transpose(1, 2, 0, 3, 4).reshape(b, hk, sk_pad, d)[:, :, :sk]
    dv = dv_b.transpose(1, 2, 0, 3, 4).reshape(b, hk, sk_pad, d)[:, :, :sk]
    return (dq.astype(q.dtype), dk.astype(k.dtype), dv.astype(v.dtype))


_flash.defvjp(_flash_fwd, _flash_bwd)


def flash_attention(q, k, v, *, causal: bool = False,
                    window: Optional[int] = None,
                    sm_scale: Optional[float] = None,
                    block_q: Optional[int] = None,
                    block_k: Optional[int] = None,
                    impl: str = "auto"):
    """Tiled attention: softmax(Q K^T / sqrt(d)) V without materializing
    the [S, S] logits. Shapes [batch, heads, seq, head_dim]; kv seq may
    differ from q seq (cross-attention) unless `causal=True` (which
    requires equal lengths). Differentiable (tile-recomputing VJP).

    GQA/MQA: k/v may carry FEWER heads than q (q heads must be a
    multiple) — each group of q heads attends to its shared kv head;
    the kernel streams the shared kv tiles without materializing a
    repeat, and the VJP accumulates dk/dv over the group. This is the
    KV-cache memory lever for serving (kv state shrinks by the group
    factor).

    window=W: sliding-window (local) attention. With causal=True each
    query attends to the last W positions (col in (row-W, row]) — the
    batch twin of the streaming ring cache (models/streaming.py, whose
    max_steps IS this window). Without causal it is the symmetric band
    |row-col| < W. Out-of-band kv tiles never become forward grid
    steps (the kv grid dimension is band-restricted) and the backward
    scan slices each kv tile's live q-row band, so long-stream cost —
    DMAs and matmuls, forward AND backward — is O(S·W), not O(S²).
    Requires equal q/kv lengths.

    impl: "auto" → Pallas kernel on TPU, materialized path elsewhere
    (interpret mode serializes the grid — a silent perf cliff, reserved
    for the explicit impl="pallas" the tests use); "pallas" forces the
    kernel (interpret mode off-TPU), "xla" the materialized path.

    Default tiles adapt to the sequence (measured on v5e at
    [1, 8, S, 64] bf16, scan-timed so the remote-dispatch floor is
    excluded): 256x512 up to S<4096 (the measured optimum at S=2048;
    128x128 is ~35% slower), 512x1024 at S>=4096 full attention
    (2.94 -> 1.96 ms forward at S=8192 causal — at this d the kernel
    is VPU/softmax-bound, and larger tiles amortize the cross-lane
    reductions; 1024x1024 measures the same within noise at 2x the
    VMEM). Windowed calls keep block_q=256: the band width (block_q +
    window) sets their cost, so smaller q tiles win. Tiles clamp to
    the padded sequence, so short-sequence calls are unaffected.
    """
    if (q.ndim != 4 or k.shape[0] != q.shape[0] or v.shape != k.shape
            or q.shape[-1] != k.shape[-1]):
        raise ValueError(f"bad attention shapes {q.shape} {k.shape} "
                         f"{v.shape}")
    if q.shape[1] % k.shape[1]:
        raise ValueError(f"q heads {q.shape[1]} must be a multiple of kv "
                         f"heads {k.shape[1]} (GQA)")
    if sm_scale is None:
        sm_scale = float(q.shape[-1]) ** -0.5
    if causal and q.shape[2] != k.shape[2]:
        raise ValueError("causal=True requires equal q/kv lengths")
    if window is not None:
        if window < 1:
            raise ValueError(f"window must be >= 1, got {window}")
        if q.shape[2] != k.shape[2]:
            raise ValueError("window requires equal q/kv lengths")
        window = int(window)
    on_tpu = jax.devices()[0].platform == "tpu"
    # x64 mode: gridded pallas_call index maps fail Mosaic legalization
    # on current toolchains (verified: even a trivial 2-block grid dies
    # with "failed to legalize func.return" while ungridded kernels
    # compile) — route compiled TPU calls to the materialized path;
    # interpret mode (off-TPU) is unaffected and keeps the kernel
    # testable under x64.
    x64 = bool(jax.config.jax_enable_x64)
    if impl == "xla" or (impl == "auto" and not on_tpu) or (on_tpu and x64):
        return _reference(q, k, v, causal, sm_scale, window)
    if impl not in ("auto", "pallas"):
        raise ValueError(f"unknown impl {impl!r}")
    interpret = not on_tpu
    if block_q is None:
        block_q = 512 if (window is None and q.shape[2] >= 4096) else 256
    if block_k is None:
        block_k = 1024 if (window is None and k.shape[2] >= 4096) else 512
    # Clamp tiles to the padded sequence (short sequences -> one tile,
    # still lane-aligned).
    block_q = min(block_q, _cdiv(q.shape[2], _LANES) * _LANES)
    block_k = min(block_k, _cdiv(k.shape[2], _LANES) * _LANES)
    if block_q % _LANES or block_k % _LANES:
        raise ValueError("block sizes must be multiples of 128")
    return _flash(q, k, v, causal, window, float(sm_scale), int(block_q),
                  int(block_k), interpret)
