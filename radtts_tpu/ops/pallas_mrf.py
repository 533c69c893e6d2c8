"""Pallas TPU kernel: fused HiFi-GAN multi-receptive-field (MRF) resblock
stack for the narrow-channel upsample stages.

Motivation (measured on v5e, scripts/ab_gen_cut.py): the C=64 and C=32
stages cost ~7 of the generator's ~9 ms true compute while running at
11-30 TFLOP/s — every one of their 18 small convs round-trips activations
through HBM at 25-50% lane utilization, and XLA keeps fusion boundaries
between them. This kernel computes the ENTIRE MRF —

    mean_k RB_k(x),   RB_k(x): 3x [x += conv_{k,1}(lrelu(conv_{k,d}(
                                   lrelu(x)))),  d in (1,3,5)]

(reference: hifigan_models.py:83-148, 200-215) — in VMEM: one read of the
tile, one write of the mean, with each conv a rolled-window matmul
(P, k*C) x (k*C, C) on the MXU.

Halo: each RB_k chain reaches sum_i (d_i+1)(k-1)/2 = 6(k-1) frames; x is
pre-padded by HALO=60 zeros (= the k=11 chain), which also supplies the
zero-padding the reference convs see at sequence ends. Interior tiles read
their neighbors' frames through overlapping tile views built with strided
slices at the XLA level (BlockSpec blocks cannot overlap).
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

KERNEL_SIZES = (3, 7, 11)
DILATIONS = (1, 3, 5)
HALO = 60            # 6 * (11 - 1): reach of the deepest RB chain
LRELU_SLOPE = 0.1


def _lrelu(x):
    return jnp.where(x >= 0, x, LRELU_SLOPE * x)


def _roll_rows(buf, shift):
    """pltpu.roll along the sublane (row) axis — split out so the
    ablation harness (scripts/ab_mrf_bufdtype.py) can monkeypatch it.
    Window building costs 0.17-0.23 ms of the C=64/C=128 stages'
    over-roofline residual (identity-roll ablation, v5e 2026-08-20);
    the measured dead ends: bf16 buffers don't lower (Mosaic's
    dynamic_rotate is 32-bit-only, and bitcasting to u32 lane-pairs hits
    "Changing bitwidths not supported"), static two-slice concat is no
    cheaper than the rotate, and taps-per-dot chunk resizing (1.25/5/10
    MB slabs) is chip-weather-flat under interleaved timing."""
    return pltpu.roll(buf, shift, axis=0)


def _conv_taps(buf, w, b, offsets, taps_per_dot=None):
    """buf: (P, C) value. Same-size output y[t] = sum_j w_j·buf[t+off_j];
    rows within reach of the buffer edge wrap (garbage) but stay inside
    the halo margin. Window build = rolls concatenated on lanes, chunked
    so each (P, taps*C) slab stays ~2.5 MB of VMEM; one MXU dot per slab.

    bf16 weight storage is supported (the wide-stage variant): the window
    is cast to the weight dtype for the dot — on TPU this matches DEFAULT
    matmul precision, which rounds fp32 operands to bf16 on the MXU anyway
    — and accumulation stays fp32.

    taps_per_dot=1 skips the lane-axis concatenate entirely (one MXU dot
    per tap): at C=128 (the folded kernels) Mosaic cannot concatenate
    rolled copies whose row shifts are not sublane-aligned ("result/input
    offset mismatch on non-concat dimension"); per-tap dots at a 128-deep
    contraction lose nothing."""
    P, C = buf.shape
    taps = taps_per_dot or max(1, int(2.5e6 / (P * C * 4)))
    y = None
    for j0 in range(0, len(offsets), taps):
        jj = offsets[j0:j0 + taps]
        # pltpu.roll requires non-negative shifts; -o mod P is the same
        cols = [_roll_rows(buf, (-o) % P) for o in jj]
        win = jnp.concatenate(cols, axis=1) if len(cols) > 1 else cols[0]
        part = jax.lax.dot_general(
            win.astype(w.dtype), w[j0 * C:(j0 + len(cols)) * C],
            dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = part if y is None else y + part
    return y + b                                      # b: (1, C)


def _conv_valid(buf, w, b, k, d):
    """Dilation-d k-tap conv as _conv_taps with symmetric offsets."""
    half = (k - 1) // 2
    return _conv_taps(buf, w, b, [(j - half) * d for j in range(k)])


def _make_kernel(kernel_sizes, n_out_rb, tile, n_tiles, T, P, halo):
    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        x = x_ref[0]                                   # (P, C) fp32
        # Global frame index of each buffer row: intermediates outside the
        # true sequence [0, T) must be ZERO after every conv (the reference
        # zero-pads each conv input at the sequence ends; a fused chain
        # would otherwise propagate nonzero out-of-range values back in).
        i_tile = pl.program_id(0) % n_tiles
        tglob = (i_tile * tile - halo
                 + jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0))
        inside = jnp.logical_and(tglob >= 0, tglob < T)
        acc = None
        for m, k in enumerate(kernel_sizes):
            w1, b1, w2, b2 = refs[4 * m: 4 * m + 4]
            xr = x
            for i, d in enumerate(DILATIONS):
                xt = _conv_valid(_lrelu(xr), w1[i], b1[i], k, d)
                xt = jnp.where(inside, xt, 0.0)
                xt = _conv_valid(_lrelu(xt), w2[i], b2[i], k, 1)
                xt = jnp.where(inside, xt, 0.0)
                xr = xr + xt
            acc = xr if acc is None else acc + xr
        o_ref[0] = acc[halo:halo + tile] * (1.0 / n_out_rb)
    return kernel


@functools.partial(jax.jit, static_argnames=(
    "tile", "interpret", "kernel_sizes", "n_out_rb", "weight_dtype"))
def pallas_mrf(x, weights, tile=1024, interpret=False,
               kernel_sizes=KERNEL_SIZES, n_out_rb=None,
               weight_dtype=jnp.float32):
    """x: (B, T, C) fp32. weights: list over `kernel_sizes` of dicts
    {w1: (3, k, C, C), b1: (3, C), w2: (3, k, C, C), b2: (3, C)},
    w*[i] being the dilation-(1,3,5)[i] conv taps (taps-major, i.e. torch
    weight (C_out, C_in, k) transposed to (k, C_in, C_out)). Returns the
    MRF mean (B, T, C). T is padded to a tile multiple internally.

    Wide stages (C=256) don't fit all three resblocks' fp32 weights in
    VMEM (33 MB): call once per resblock (kernel_sizes=(k,)) with
    n_out_rb=3 and weight_dtype=bf16 and SUM the outputs — the division by
    the true resblock count happens in-kernel. The halo shrinks to the
    requested chains' reach, 6*(max_k - 1)."""
    B, T, C = x.shape
    n_rb = len(weights)
    if n_out_rb is None:
        n_out_rb = n_rb
    halo = 6 * (max(kernel_sizes) - 1)
    Tp = -(-T // tile) * tile
    xp = jnp.pad(x.astype(jnp.float32),
                 ((0, 0), (halo, halo + Tp - T), (0, 0)))
    P = tile + 2 * halo

    flat = []
    for wd in weights:
        w1 = wd["w1"].astype(weight_dtype)
        w2 = wd["w2"].astype(weight_dtype)
        # biases shaped (3, 1, C): b[i] reads as a 2D (1, C) VMEM row
        flat += [w1.reshape(3, -1, C),
                 wd["b1"].astype(jnp.float32).reshape(3, 1, C),
                 w2.reshape(3, -1, C),
                 wd["b2"].astype(jnp.float32).reshape(3, 1, C)]
    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]

    # Overlapping tile views built once at the XLA level (strided slices,
    # ~12% extra HBM traffic at tile=1024): (B * n_tiles, P, C).
    n_tiles = Tp // tile
    views = [xp[:, i * tile: i * tile + P] for i in range(n_tiles)]
    xv = jnp.stack(views, axis=1).reshape(B * n_tiles, P, C)

    out = pl.pallas_call(
        _make_kernel(kernel_sizes, n_out_rb, tile, n_tiles, T, P, halo),
        out_shape=jax.ShapeDtypeStruct((B * n_tiles, tile, C), jnp.float32),
        grid=(B * n_tiles,),
        in_specs=[pl.BlockSpec((1, P, C), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((1, tile, C), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xv, *flat)

    out = out.reshape(B, n_tiles * tile, C)
    return out[:, :T]


def pallas_mrf_wide(x, weights, tile=512, interpret=False):
    """Wide-stage (C=256) MRF: one pallas_mrf invocation per resblock with
    bf16 weight storage (~8.7 MB for the k=11 block vs 33 MB for all three
    in fp32), outputs summed. bf16 storage matches what DEFAULT matmul
    precision already does to fp32 operands on the MXU; accumulation is
    fp32. Returns the MRF mean (B, T, C)."""
    n_rb = len(weights)
    out = None
    for m, wd in enumerate(weights):
        part = pallas_mrf(x, (wd,), tile=tile, interpret=interpret,
                          kernel_sizes=(KERNEL_SIZES[m],), n_out_rb=n_rb,
                          weight_dtype=jnp.bfloat16)
        out = part if out is None else out + part
    return out


def _make_folded_kernel(specs, n_out_rb, tile, n_tiles, T, F, C, P, halo):
    """Folded-space MRF kernel: row r of the buffer = `fold` consecutive
    frames packed into lanes. Convs are block-banded taps over rows
    (offsets from fold_conv_weights' (m_lo, m_hi)); out-of-sequence
    intermediates are re-zeroed after every conv at FRAME granularity
    (lane l belongs to frame r*F + l//C), exactly like the unfolded
    kernel — including a ragged last row when T % fold != 0."""
    def kernel(x_ref, *refs):
        o_ref = refs[-1]
        x = x_ref[0]                                   # (P, F*C) fp32
        i_tile = pl.program_id(0) % n_tiles
        rglob = (i_tile * tile - halo
                 + jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0))
        phase = jax.lax.broadcasted_iota(jnp.int32, (P, F * C), 1) // C
        frame = rglob * F + phase
        inside = jnp.logical_and(frame >= 0, frame < T)
        acc = None
        ref_i = 0
        for spec in specs:
            xr = x
            for i in range(len(spec["offs1"])):
                w1, b1, w2, b2 = (r[...] for r in refs[ref_i:ref_i + 4])
                ref_i += 4
                xt = _conv_taps(_lrelu(xr), w1, b1, spec["offs1"][i],
                                taps_per_dot=1)
                xt = jnp.where(inside, xt, 0.0)
                xt = _conv_taps(_lrelu(xt), w2, b2, spec["offs2"][i],
                                taps_per_dot=1)
                xt = jnp.where(inside, xt, 0.0)
                xr = xr + xt
            acc = xr if acc is None else acc + xr
        o_ref[0] = acc[halo:halo + tile] * (1.0 / n_out_rb)
    return kernel


@functools.partial(jax.jit, static_argnames=(
    "fold", "tile", "interpret", "kernel_sizes", "n_out_rb",
    "weight_dtype"))
def pallas_mrf_folded(x, weights, fold, tile=512, interpret=False,
                      kernel_sizes=KERNEL_SIZES, n_out_rb=None,
                      weight_dtype=jnp.float32):
    """Time-folded fused MRF for the narrow tail stages (C=32/64).

    Same contract as pallas_mrf, but the kernel works on (T/fold,
    fold*C)-shaped buffers so each conv's MXU dot is fold·C lanes wide
    (128 at C=32/fold=4) instead of C: a 32x32 matmul uses ~1/16 of the
    MXU; the folded block-banded weights (ops/folded_conv.py math,
    exact zero blocks) trade ~2.7x FLOPs for 16x lane utilization. The
    products computed are a superset of the original conv's (extra terms
    multiply exact zeros), so outputs match to rounding.
    Requires T % fold == 0 (the caller pads frames, which this wraps in
    the tile padding anyway)."""
    from radtts_tpu.ops.folded_conv import fold_conv_weights

    B, T, C = x.shape
    F = int(fold)
    n_rb = len(weights)
    if n_out_rb is None:
        n_out_rb = n_rb
    Tp_f = -(-T // F) * F
    if Tp_f != T:
        x = jnp.pad(x.astype(jnp.float32), ((0, 0), (0, Tp_f - T), (0, 0)))
    U = Tp_f // F
    X = x.astype(jnp.float32).reshape(B, U, F * C)

    flat, specs, halo = [], [], 0
    for k, wd in zip(kernel_sizes, weights):
        offs1, offs2, chain = [], [], 0
        spec = {"offs1": offs1, "offs2": offs2}
        for i, d in enumerate(DILATIONS):
            W1, B1, (pl1, pr1) = fold_conv_weights(
                wd["w1"][i], wd["b1"][i], (k - 1) // 2 * d, d, F)
            W2, B2, (pl2, pr2) = fold_conv_weights(
                wd["w2"][i], wd["b2"][i], (k - 1) // 2, 1, F)
            flat += [W1.reshape(-1, F * C).astype(weight_dtype),
                     B1.astype(jnp.float32).reshape(1, F * C),
                     W2.reshape(-1, F * C).astype(weight_dtype),
                     B2.astype(jnp.float32).reshape(1, F * C)]
            offs1.append(list(range(-pl1, pr1 + 1)))
            offs2.append(list(range(-pl2, pr2 + 1)))
            chain += max(pl1, pr1) + max(pl2, pr2)
        halo = max(halo, chain)
        specs.append(spec)

    Up = -(-U // tile) * tile
    Xp = jnp.pad(X, ((0, 0), (halo, halo + Up - U), (0, 0)))
    P = tile + 2 * halo
    n_tiles = Up // tile
    views = [Xp[:, i * tile: i * tile + P] for i in range(n_tiles)]
    Xv = jnp.stack(views, axis=1).reshape(B * n_tiles, P, F * C)

    w_specs = [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in flat]
    out = pl.pallas_call(
        _make_folded_kernel(specs, n_out_rb, tile, n_tiles, T, F, C, P,
                            halo),
        out_shape=jax.ShapeDtypeStruct((B * n_tiles, tile, F * C),
                                       jnp.float32),
        grid=(B * n_tiles,),
        in_specs=[pl.BlockSpec((1, P, F * C), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM)] + w_specs,
        out_specs=pl.BlockSpec((1, tile, F * C), lambda g: (g, 0, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(Xv, *flat)

    out = out.reshape(B, Up * F, C)
    return out[:, :T]


def mrf_weights_from_params(resblock_group):
    """Adapt one upsample stage's resblock params (as stored by
    models/hifigan.py: [{convs1: [{w,b} x3], convs2: [{w,b} x3]} per kernel
    size]) to this kernel's packed layout."""
    packed = []
    for block in resblock_group:
        packed.append({
            "w1": jnp.stack([c["w"] for c in block["convs1"]]),
            "b1": jnp.stack([c["b"] for c in block["convs1"]]),
            "w2": jnp.stack([c["w"] for c in block["convs2"]]),
            "b2": jnp.stack([c["b"] for c in block["convs2"]]),
        })
    return packed
