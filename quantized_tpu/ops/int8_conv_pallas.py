"""Direct Pallas int8 convolution: tap-unrolled implicit GEMM, fully fused.

Why this kernel exists (measured on the live v5e, bench/sweep_conv.py):
XLA's s8xs8->s32 conv writes the int32 accumulator to HBM (4 B/elem) and the
requantization epilogue runs as a *separate* full pass (read 4 B, write 1 B)
— XLA never output-fuses into convolutions. That 10 B/elem of activation
traffic is why the int8 engine lost to its bf16 twin (4 B/elem) despite the
MXU's 2x int8 rate. This kernel keeps the accumulator in VMEM and writes the
next layer's stored-int8 directly: 1 B in + 1 B out per element, everything
else fused.

Scheme (one kernel invocation computes one output tile, no K-grid):

- the *whole padded image* (``nb`` images, all channels) sits in VMEM; it is
  fetched once per image-group (grid order makes its block index constant
  across the inner grid dims);
- the kernel unrolls the Kh x Kw taps: each tap is one MXU dot
  ``(nb*bh*Wo, Cin) @ (Cin, bn)`` on an int8 slice of the resident image,
  accumulated in int32 (exact — f32 would lose integer exactness past 2^24);
- the epilogue applies the per-channel affine ``acc * alpha + beta``
  (zero-point correction + folded BN bias, see int8_matmul.py), optional
  fused residual add (dequantized from its own grid), ReLU, and optional
  requantization straight onto the next consumer's uint8 grid.

Zero-padding correctness: the caller pads spatially with the *stored
zero-point* so padded taps contribute exactly 0 (int8_matmul.py contract).

Replaces the implicit native-conv surface of the reference (cuDNN via
F.conv2d, reference models/modules/quantize.py QConv2d.forward) — SURVEY.md
section 2 #21, section 7 step 4b.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from quantized_tpu.ops.int8_conv import pad_stored_zp
from quantized_tpu.ops.int8_matmul import resolve_interpret

Ints = Tuple[int, int]


def _pair(v):
    return (v, v) if isinstance(v, int) else tuple(v)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _conv_kernel(
    x_ref,      # (nb, Hp, Wp, Cin) int8 (stored u-128), zero-point padded
    w_ref,      # (Kh, Kw, Cin, bn) int8
    alpha_ref,  # (1, bn) f32
    beta_ref,   # (1, bn) f32
    out_ref,    # (nb, bh, Wo, bn) int8 or f32
    *,
    taps: Tuple[Tuple[int, int], ...],
    stride: Ints,
    bh: int,
    wo: int,
    relu: bool,
    out_requant: Optional[Tuple[float, int]],
):
    nb = x_ref.shape[0]
    cin = x_ref.shape[3]
    bn = w_ref.shape[3]
    sh, sw = stride
    m = pl.program_id(2)
    h0 = m * bh * sh

    acc = jnp.zeros((nb * bh * wo, bn), jnp.int32)
    for dh, dw in taps:
        if sh == 1 and sw == 1:
            a = x_ref[:, pl.ds(h0 + dh, bh), pl.ds(dw, wo), :]
        else:
            # strided tap: load the contiguous footprint, then subsample in
            # registers (VMEM-resident, no HBM cost)
            a_full = x_ref[:, pl.ds(h0 + dh, (bh - 1) * sh + 1), pl.ds(dw, (wo - 1) * sw + 1), :]
            a = a_full[:, ::sh, ::sw, :]
        acc = acc + jax.lax.dot_general(
            a.reshape(nb * bh * wo, cin),
            w_ref[dh, dw],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    y = acc.astype(jnp.float32) * alpha_ref[0] + beta_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_requant is None:
        out_ref[...] = y.reshape(nb, bh, wo, bn)
    else:
        out_scale, out_zp = out_requant
        q = jnp.round(y * jnp.float32(1.0 / out_scale) + jnp.float32(out_zp - 128))
        q = jnp.clip(q, -128.0, 127.0)
        out_ref[...] = q.astype(jnp.int8).reshape(nb, bh, wo, bn)


def _conv_gatherk_kernel(
    x_ref, w_ref, alpha_ref, beta_ref, out_ref, *,
    taps, stride, bh, wo, relu, out_requant,
):
    """Small-Cin variant (e.g. the space-to-depth stem, Cin=12): per-tap dots
    would use 12 of 128 MXU lanes. Instead gather all taps into one
    (M, Kh*Kw*Cin) patch matrix in VMEM (im2col-in-registers) and run a
    single full-K dot. Weight ref comes pre-reshaped (Kh*Kw*Cin, bn) in
    (dh, dw, c) order to match the concatenation."""
    nb = x_ref.shape[0]
    cin = x_ref.shape[3]
    bn = w_ref.shape[1]
    sh, sw = stride
    m = pl.program_id(2)
    h0 = m * bh * sh

    cols = []
    for dh, dw in taps:
        if sh == 1 and sw == 1:
            a = x_ref[:, pl.ds(h0 + dh, bh), pl.ds(dw, wo), :]
        else:
            a_full = x_ref[:, pl.ds(h0 + dh, (bh - 1) * sh + 1), pl.ds(dw, (wo - 1) * sw + 1), :]
            a = a_full[:, ::sh, ::sw, :]
        cols.append(a.reshape(nb * bh * wo, cin))
    patches = jnp.concatenate(cols, axis=1)
    acc = jax.lax.dot_general(
        patches, w_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * alpha_ref[0] + beta_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_requant is None:
        out_ref[...] = y.reshape(nb, bh, wo, bn)
    else:
        out_scale, out_zp = out_requant
        q = jnp.round(y * jnp.float32(1.0 / out_scale) + jnp.float32(out_zp - 128))
        q = jnp.clip(q, -128.0, 127.0)
        out_ref[...] = q.astype(jnp.int8).reshape(nb, bh, wo, bn)


def _conv_residual_kernel(
    x_ref, w_ref, alpha_ref, beta_ref, r_ref, out_ref, *,
    taps, stride, bh, wo, relu, out_requant, res_grid,
):
    """Same as _conv_kernel plus a fused residual add: ``r`` is stored int8
    on ``res_grid``; y = relu(acc*alpha + beta + deq(r)), then requant."""
    nb = x_ref.shape[0]
    cin = x_ref.shape[3]
    bn = w_ref.shape[3]
    sh, sw = stride
    m = pl.program_id(2)
    h0 = m * bh * sh

    acc = jnp.zeros((nb * bh * wo, bn), jnp.int32)
    for dh, dw in taps:
        if sh == 1 and sw == 1:
            a = x_ref[:, pl.ds(h0 + dh, bh), pl.ds(dw, wo), :]
        else:
            a_full = x_ref[:, pl.ds(h0 + dh, (bh - 1) * sh + 1), pl.ds(dw, (wo - 1) * sw + 1), :]
            a = a_full[:, ::sh, ::sw, :]
        acc = acc + jax.lax.dot_general(
            a.reshape(nb * bh * wo, cin),
            w_ref[dh, dw],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )

    y = acc.astype(jnp.float32) * alpha_ref[0] + beta_ref[0]
    r_scale, r_zp = res_grid
    r = r_ref[...].reshape(nb * bh * wo, bn).astype(jnp.float32)
    y = y + (r + jnp.float32(128 - r_zp)) * jnp.float32(r_scale)
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_requant is None:
        out_ref[...] = y.reshape(nb, bh, wo, bn)
    else:
        out_scale, out_zp = out_requant
        q = jnp.round(y * jnp.float32(1.0 / out_scale) + jnp.float32(out_zp - 128))
        q = jnp.clip(q, -128.0, 127.0)
        out_ref[...] = q.astype(jnp.int8).reshape(nb, bh, wo, bn)


def _flat_kernel(
    x_ref,      # (nb, L, Cin) int8: zero-point padded image, rows flattened (h*Wp + w)
    w_ref,      # (T, Cin, bn) per-tap weights, taps ordered like `offs`
    alpha_ref,  # (1, bn) f32
    beta_ref,   # (1, bn) f32
    out_ref,    # (nb, bm, bn) int8/f32: flat output rows (junk at w >= Wo)
    *,
    offs: Tuple[int, ...],
    bm: int,
    gather_k: bool,
    relu: bool,
    out_requant: Optional[Tuple[float, int]],
):
    """Stride-1 conv on the flat row view: every tap slice is a contiguous,
    sublane-aligned (nb, bm, Cin) block at static offset ``off = dh*Wp + dw``
    from the tile origin — no relayouts. ``gather_k`` concatenates all taps
    into one (M, T*Cin) patch matrix for a single full-K MXU dot (the win for
    small Cin where per-tap K would idle most of the MXU's K lanes)."""
    nb = x_ref.shape[0]
    cin = x_ref.shape[2]
    bn = w_ref.shape[2]
    ntaps = len(offs)
    m = pl.program_id(2)
    r0 = m * bm  # bm is 32-aligned, so this dynamic sublane offset is provable

    # Mosaic only allows *aligned* dynamic sublane offsets: load one aligned
    # band covering every tap, then take static shifted sub-slices (compiled
    # as sublane rotates, VMEM-local).
    band_rows = bm + offs[-1] if len(offs) > 1 else bm
    band = x_ref[:, pl.ds(r0, band_rows), :]

    if gather_k:
        cols = [band[:, off:off + bm, :].reshape(nb * bm, cin) for off in offs]
        patches = jnp.concatenate(cols, axis=1)
        acc = jax.lax.dot_general(
            patches,
            w_ref[...].reshape(ntaps * cin, bn),
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
    else:
        acc = jnp.zeros((nb * bm, bn), jnp.int32)
        for t, off in enumerate(offs):
            a = band[:, off:off + bm, :].reshape(nb * bm, cin)
            acc = acc + jax.lax.dot_general(
                a, w_ref[t], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32,
            )

    y = acc.astype(jnp.float32) * alpha_ref[0] + beta_ref[0]
    if relu:
        y = jnp.maximum(y, 0.0)
    if out_requant is None:
        out_ref[...] = y.reshape(nb, bm, bn)
    else:
        out_scale, out_zp = out_requant
        q = jnp.round(y * jnp.float32(1.0 / out_scale) + jnp.float32(out_zp - 128))
        q = jnp.clip(q, -128.0, 127.0)
        out_ref[...] = q.astype(jnp.int8).reshape(nb, bm, bn)


@functools.partial(
    jax.jit,
    static_argnames=(
        "stride", "padding", "stored_zp", "relu", "out_requant",
        "nb", "block_m", "block_n", "gather_k", "interpret",
    ),
)
def int8_conv_flat(
    x_q: jax.Array,   # (N, H, W, Cin) int8 stored (u-128), unpadded
    w_q: jax.Array,   # (Kh, Kw, Cin, Cout) int8 symmetric
    alpha: jax.Array,
    beta: jax.Array,
    stride: Ints = 1,
    padding: Ints = 0,
    stored_zp: int = -128,
    relu: bool = False,
    out_requant: Optional[Tuple[float, int]] = None,
    nb: Optional[int] = None,
    block_m: int = 512,
    block_n: Optional[int] = None,
    gather_k: Optional[bool] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Flat-row direct conv (stride 1 only). Computes output at every padded
    column (Wp-wide rows, junk where w >= Wo), then repacks to (N, Ho, Wo,
    Cout) with one XLA slice. All tap reads are contiguous aligned blocks."""
    sh, sw = _pair(stride)
    assert sh == 1 and sw == 1, "int8_conv_flat is stride-1 only"
    ph, pw = _pair(padding)
    kh, kw, cin, cout = w_q.shape
    n, h, w, _ = x_q.shape
    ho = h + 2 * ph - kh + 1
    wo = w + 2 * pw - kw + 1

    xp = pad_stored_zp(x_q, (ph, pw), stored_zp)
    hp, wp = xp.shape[1], xp.shape[2]

    bm = block_m
    rows = ho * wp  # flat output rows (junk cols included)
    m_tiles = _cdiv(rows, bm)
    # flat input length each tile may touch
    need = (m_tiles * bm - 1) + (kh - 1) * wp + (kw - 1) + 1
    x_flat = xp.reshape(n, hp * wp, cin)
    if need > hp * wp:
        x_flat = jnp.pad(
            x_flat, ((0, 0), (0, need - hp * wp), (0, 0)),
            constant_values=jnp.int8(stored_zp),
        )
    L = x_flat.shape[1]

    if nb is None:
        img_bytes = L * max(cin, 128)
        nb = 1
        while nb * 2 <= n and n % (nb * 2) == 0 and (nb * 2) * img_bytes <= 2 * 1024 * 1024:
            nb *= 2
    bn = block_n if block_n is not None else min(256, cout)
    if gather_k is None:
        gather_k = cin < 128 and kh * kw > 1

    offs = tuple(dh * wp + dw for dh in range(kh) for dw in range(kw))
    out_dtype = jnp.float32 if out_requant is None else jnp.int8
    grid = (n // nb, _cdiv(cout, bn), m_tiles)

    x_spec = pl.BlockSpec((nb, L, cin), lambda i, j, m: (i, 0, 0), memory_space=pltpu.VMEM)
    w_spec = pl.BlockSpec(
        (kh * kw, cin, bn), lambda i, j, m: (0, 0, j), memory_space=pltpu.VMEM
    )
    ab_spec = pl.BlockSpec((1, bn), lambda i, j, m: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (nb, bm, bn), lambda i, j, m: (i, m, j), memory_space=pltpu.VMEM
    )

    flops = 2 * n * rows * kh * kw * cin * cout
    out_flat = pl.pallas_call(
        functools.partial(
            _flat_kernel, offs=offs, bm=bm, gather_k=gather_k,
            relu=relu, out_requant=out_requant,
        ),
        grid=grid,
        in_specs=[x_spec, w_spec, ab_spec, ab_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((n, m_tiles * bm, cout), out_dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=n * L * cin + kh * kw * cin * cout + n * rows * cout,
            transcendentals=0,
        ),
        interpret=resolve_interpret(interpret),
    )(x_flat, w_q.reshape(kh * kw, cin, cout), alpha.astype(jnp.float32)[None, :],
      beta.astype(jnp.float32)[None, :])

    # repack: drop junk columns (w >= Wo) — one fused XLA slice/copy
    out = out_flat[:, : ho * wp, :].reshape(n, ho, wp, cout)
    return out[:, :, :wo, :]


def _pick_tiles(n: int, ho: int, wo: int, cout: int,
                hp: int, wp: int, cin: int,
                nb: Optional[int], block_h: Optional[int], block_n: Optional[int]):
    """Heuristic tile choice: target >=256 GEMM rows per dot, cap the resident
    image group at ~2 MB of VMEM, keep Cout tiles at 256 lanes."""
    if nb is None:
        img_bytes = hp * wp * cin
        nb = 1
        target_rows = 512
        while (
            nb * 2 <= n
            and n % (nb * 2) == 0
            and nb * ho * wo < target_rows
            and (nb * 2) * img_bytes <= 2 * 1024 * 1024
        ):
            nb *= 2
        while n % nb != 0:  # n not a power of two: fall back
            nb -= 1
    if block_n is None:
        block_n = min(256, cout)
    if block_h is None:
        block_h = max(1, min(ho, _cdiv(512, nb * wo)))
        while ho % block_h != 0:
            block_h -= 1
    return nb, block_h, block_n


@functools.partial(
    jax.jit,
    static_argnames=(
        "stride", "padding", "stored_zp", "relu", "out_requant", "res_grid",
        "nb", "block_h", "block_n", "interpret",
    ),
)
def int8_conv_direct(
    x_q: jax.Array,   # (N, H, W, Cin) int8 stored (u-128), unpadded
    w_q: jax.Array,   # (Kh, Kw, Cin, Cout) int8 symmetric
    alpha: jax.Array,  # (Cout,) f32
    beta: jax.Array,   # (Cout,) f32
    residual: Optional[jax.Array] = None,  # (N, Ho, Wo, Cout) int8 on res_grid
    stride: Ints = 1,
    padding: Ints = 0,
    stored_zp: int = -128,
    relu: bool = False,
    out_requant: Optional[Tuple[float, int]] = None,
    res_grid: Optional[Tuple[float, int]] = None,
    nb: Optional[int] = None,
    block_h: Optional[int] = None,
    block_n: Optional[int] = None,
    interpret: Optional[bool] = None,
) -> jax.Array:
    """Fused direct conv. Returns NHWC f32, or stored-int8 on
    ``out_requant``'s grid. ``residual`` (with ``res_grid``) fuses
    ``relu(conv + deq(residual))`` into the epilogue."""
    sh, sw = _pair(stride)
    ph, pw = _pair(padding)
    kh, kw, cin, cout = w_q.shape
    n, h, w, _ = x_q.shape
    ho = (h + 2 * ph - kh) // sh + 1
    wo = (w + 2 * pw - kw) // sw + 1

    xp = pad_stored_zp(x_q, (ph, pw), stored_zp)
    hp, wp = xp.shape[1], xp.shape[2]

    nb_, bh, bn = _pick_tiles(n, ho, wo, cout, hp, wp, cin, nb, block_h, block_n)
    m_tiles = _cdiv(ho, bh)
    # the last H tile may read rows past the padded image: extend the pad
    need_rows = (m_tiles * bh - 1) * sh + kh
    if need_rows > hp:
        xp = jnp.pad(
            xp, ((0, 0), (0, need_rows - hp), (0, 0), (0, 0)),
            constant_values=jnp.int8(stored_zp),
        )
        hp = need_rows
    if n % nb_ != 0:
        raise ValueError(f"batch {n} not divisible by image-group size {nb_}")

    taps = tuple((i, j) for i in range(kh) for j in range(kw))
    out_dtype = jnp.float32 if out_requant is None else jnp.int8
    j_tiles = _cdiv(cout, bn)
    grid = (n // nb_, j_tiles, m_tiles)

    x_spec = pl.BlockSpec(
        (nb_, hp, wp, cin), lambda i, j, m: (i, 0, 0, 0), memory_space=pltpu.VMEM
    )
    w_spec = pl.BlockSpec(
        (kh, kw, cin, bn), lambda i, j, m: (0, 0, 0, j), memory_space=pltpu.VMEM
    )
    ab_spec = pl.BlockSpec((1, bn), lambda i, j, m: (0, j), memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec(
        (nb_, bh, wo, bn), lambda i, j, m: (i, m, 0, j), memory_space=pltpu.VMEM
    )

    flops = 2 * n * ho * wo * kh * kw * cin * cout
    bytes_accessed = (
        n * hp * wp * cin + kh * kw * cin * cout
        + n * ho * wo * cout * (1 if out_requant is not None else 4)
    )
    common = dict(
        grid=grid,
        out_shape=jax.ShapeDtypeStruct((n, ho, wo, cout), out_dtype),
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "parallel"),
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops, bytes_accessed=bytes_accessed, transcendentals=0
        ),
        interpret=resolve_interpret(interpret),
    )
    alpha2 = alpha.astype(jnp.float32)[None, :]
    beta2 = beta.astype(jnp.float32)[None, :]

    if residual is None:
        if cin <= 32 and len(taps) > 1:
            # small-Cin: single full-K dot on gathered patches (stem path)
            wk_spec = pl.BlockSpec(
                (kh * kw * cin, bn), lambda i, j, m: (0, j), memory_space=pltpu.VMEM
            )
            return pl.pallas_call(
                functools.partial(
                    _conv_gatherk_kernel, taps=taps, stride=(sh, sw), bh=bh,
                    wo=wo, relu=relu, out_requant=out_requant,
                ),
                in_specs=[x_spec, wk_spec, ab_spec, ab_spec],
                **common,
            )(xp, w_q.reshape(kh * kw * cin, cout), alpha2, beta2)
        return pl.pallas_call(
            functools.partial(
                _conv_kernel, taps=taps, stride=(sh, sw), bh=bh, wo=wo,
                relu=relu, out_requant=out_requant,
            ),
            in_specs=[x_spec, w_spec, ab_spec, ab_spec],
            **common,
        )(xp, w_q, alpha2, beta2)

    assert res_grid is not None, "residual requires res_grid=(scale, zero_point)"
    r_spec = pl.BlockSpec(
        (nb_, bh, wo, bn), lambda i, j, m: (i, m, 0, j), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _conv_residual_kernel, taps=taps, stride=(sh, sw), bh=bh, wo=wo,
            relu=relu, out_requant=out_requant, res_grid=res_grid,
        ),
        in_specs=[x_spec, w_spec, ab_spec, ab_spec, r_spec],
        **common,
    )(xp, w_q, alpha2, beta2, residual)
