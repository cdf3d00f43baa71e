"""Pallas TPU kernels: 3DGS sorted alpha-compositing, forward + backward.

The hot path of the framework — the TPU equivalent of gsplat's
`rasterize_to_pixels` fwd/bwd CUDA kernels. Design notes:

  * grid over image tiles (32x32 px = 1024 pixels, P). TPU pallas has a
    ~10us fixed cost per grid step, so tiles are big; each step loops
    over the tile's depth-sorted instance segment in chunks of G=128
    gaussians with double-buffered DMA from HBM (segment offsets arrive
    via scalar prefetch). Segments are NOT pre-aligned: each tile reads
    from the floor-aligned base floor(start/G)*G and masks the `lead`
    columns belonging to the previous tile, which keeps every DMA slice
    lane-aligned without the realignment gather pass.
  * instance data is a transposed SoA (16 field rows x CAP columns);
    chunk math is laid out (P pixels x G instances): alpha is VPU
    elementwise from broadcast field rows, the in-chunk transmittance
    prefix is a log-step lane scan (7 masked rotate-adds on the VPU —
    exact f32, unlike a default-precision MXU matmul which rounds the
    operands to bf16), and accumulation is fields (16,G) @ w^T -> the
    (16,P) output block, run at HIGHEST dot precision for parity with
    the dense oracle. Row k of the output accumulates
    sum_i w_i * field_k(i): rows 6-8 are color, 9 depth, 10 (the
    constant one) alpha.
  * forward early-exits a tile once every pixel is saturated
    (log T < log 1e-4), the analog of gsplat's per-warp done flag. The
    number of chunks actually composited (`i_fin`) is emitted per tile
    (row 1 of the logT output) so the backward starts its reverse walk
    exactly where the forward stopped — both a correctness requirement
    (the saved final logT corresponds to chunk i_fin-1, not n_chunks-1)
    and the big backward speedup on saturated tiles.
  * because the wrapper reads color/alpha/depth straight out of the acc
    rows, the cotangent d_acc IS the pixel gradient frame the backward
    needs: dL/dw = d_acc^T @ fields.
  * backward re-walks the live chunks in REVERSE order, reconstructing
    per-row transmittance from the saved final logT (gsplat's recompute
    strategy) and carrying the suffix sum
    S = dlogT + sum_{later} w_j dL/dw_j needed for dL/dalpha.
    Per-instance gradients go to disjoint G-aligned columns of a
    (16, CAP_OUT) buffer (`binning.out_starts` layout) — no atomics,
    since an instance belongs to exactly one tile. Chunks the forward
    never composited are walk-skipped but their columns (and the
    sentinel block binning routes invalid slots to) are zero-written,
    so the wrapper's gradient routing needs no validity mask.

Instance field rows (INST_DIM=16):
  0 mx, 1 my (pixel-space mean), 2-4 conic (a,b,c), 5 opacity,
  6-8 rgb, 9 depth, 10 one (1.0 for valid rows), 11-15 pad.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INST_DIM = 16
G = 128          # gaussians per chunk == segment alignment
TILE_W = 32
TILE_H = 32
P = TILE_W * TILE_H

ALPHA_CUTOFF = 1.0 / 255.0
MAX_ALPHA = 0.999
LOG_T_EPS = math.log(1e-4)

F32 = jnp.float32
HIGHEST = jax.lax.Precision.HIGHEST
_LOG2G = int(math.log2(G))


def _trunc_bf16(v):
    """Zero the low 16 mantissa bits: the result is exactly representable
    in bf16, so a DEFAULT-precision MXU pass multiplies it exactly."""
    u = jax.lax.bitcast_convert_type(v, jnp.uint32)
    return jax.lax.bitcast_convert_type(u & jnp.uint32(0xFFFF0000), F32)


def dot_f32(a, b, dims):
    """dot_general at ~f32 accuracy from three DEFAULT-precision MXU
    passes (bf16x3 split: hi*hi + hi*lo + lo*hi; the lo*lo term is below
    f32 roundoff). Mosaic only lowers DEFAULT and HIGHEST; HIGHEST runs
    6 passes, this is twice as fast at equal practical accuracy."""
    a_hi = _trunc_bf16(a)
    b_hi = _trunc_bf16(b)
    a_lo = a - a_hi
    b_lo = b - b_hi
    d = functools.partial(jax.lax.dot_general, dimension_numbers=dims,
                          preferred_element_type=F32)
    return d(a_hi, b_hi) + d(a_hi, b_lo) + d(a_lo, b_hi)


def lane_scan_rolls(x, reverse=False):
    """Prefix (exclusive) / suffix (inclusive) sum along lanes: exact f32
    via log2(G) masked rotate-adds on the VPU. ~3us per (1024,128) —
    used where exactness matters more than speed. (pltpu.roll only takes
    non-negative shifts; a left-roll by s is a roll by n-s.)"""
    col = jax.lax.broadcasted_iota(jnp.int32, x.shape, 1)
    n = x.shape[-1]
    if not reverse:
        x = jnp.where(col >= 1, pltpu.roll(x, 1, 1), 0.0)
    for k in range(_LOG2G):
        s = 1 << k
        if reverse:
            x = x + jnp.where(col < n - s, pltpu.roll(x, n - s, 1), 0.0)
        else:
            x = x + jnp.where(col >= s, pltpu.roll(x, s, 1), 0.0)
    return x


def _scan_mat(n, kind):
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    op = {"prefix_excl": r < c, "suffix_incl": r >= c}[kind]
    return op.astype(F32)


def _lane_scan_mm(x, kind):
    """Prefix/suffix sum along lanes via a split triangular matmul.

    A DEFAULT-precision MXU pass rounds operands to bf16 (~4e-3 rel) —
    too coarse for transmittance. But the 0/1 scan matrix is exact in
    bf16, so splitting x = hi + lo (hi = bf16-truncated, exactly
    representable) gives  scan(x) = mm(hi) + mm(lo)  with error only
    from rounding lo (~1.6e-5 rel of x): two fast MXU passes instead of
    a 6-pass HIGHEST matmul or a ~3us VPU roll-scan."""
    M = _scan_mat(x.shape[-1], kind)
    hi = _trunc_bf16(x)
    lo = x - hi
    d = functools.partial(jax.lax.dot, preferred_element_type=F32)
    return d(hi, M) + d(lo, M)


def lane_prefix_excl(x):
    """Exclusive prefix sum along the lane (last) axis (~1.6e-5 rel)."""
    return _lane_scan_mm(x, "prefix_excl")


def lane_suffix_incl(x):
    """Inclusive suffix sum along the lane (last) axis (~1.6e-5 rel)."""
    return _lane_scan_mm(x, "suffix_incl")


def _pixel_coords(tile_id, n_tiles_x):
    """Global pixel centers of this tile as (P, 1) columns."""
    tx = (tile_id % n_tiles_x).astype(F32) * TILE_W
    ty = (tile_id // n_tiles_x).astype(F32) * TILE_H
    row = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    lx = (row % TILE_W).astype(F32) + 0.5
    ly = (row // TILE_W).astype(F32) + 0.5
    return tx + lx, ty + ly


def _chunk_alpha(buf, px, py, col0, count):
    """alpha for one chunk (or a 2G pair). buf: (INST_DIM, W) block with
    W a multiple of G; px, py (P, 1).

    col0 may be negative (floor-aligned chunk base: col0 = i*G - lead);
    columns with col < 0 belong to the previous tile's segment and are
    masked out; columns with col >= count (segment end or beyond the
    tile's last chunk) are masked too. Returns alpha (P,W), lam (P,W),
    dx, dy (P,W), not_clamped (P,W)."""
    width = buf.shape[1]
    mx = buf[0:1, :]
    my = buf[1:2, :]
    a = buf[2:3, :]
    b = buf[3:4, :]
    c = buf[4:5, :]
    op = buf[5:6, :]
    one = buf[10:11, :]
    dx = px - mx                       # (P, W)
    dy = py - my
    sigma = 0.5 * a * dx * dx + b * dx * dy + 0.5 * c * dy * dy
    raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(raw, MAX_ALPHA)
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, width), 1)
    valid = (col >= 0) & (col < count) & (one > 0.5)
    alpha = jnp.where((alpha >= ALPHA_CUTOFF) & valid, alpha, 0.0)
    lam = jnp.log1p(-alpha)
    return alpha, lam, dx, dy, (raw < MAX_ALPHA)


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------

def _fwd_kernel(tile_starts, inst_hbm, acc_ref, logT_ref, buf, sem,
                *, n_tiles_x):
    t = pl.program_id(0)
    start = tile_starts[t]
    count = tile_starts[t + 1] - start
    base = (start // G) * G            # floor-aligned chunk base
    lead = start - base
    n_chunks = jnp.where(count > 0, pl.cdiv(lead + count, G), 0)
    # pair (2-chunk) steps: twice the work per loop iteration gives the
    # VPU/MXU two independent instruction streams to overlap, hiding the
    # serial per-chunk dependency latency. A pair's second chunk may lie
    # beyond the segment — its columns mask to zero via `count`, and the
    # instance buffer carries 2G of padding so the DMA stays in bounds.
    n_pairs = pl.cdiv(n_chunks, 2)

    px, py = _pixel_coords(t, n_tiles_x)

    def dma(p, slot):
        off = pl.multiple_of(base + p * (2 * G), G)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(off, 2 * G)], buf.at[slot], sem.at[slot])

    @pl.when(n_pairs > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        p, acc, logT = carry
        return (p < n_pairs) & (jnp.max(logT) > LOG_T_EPS)

    def body(carry):
        p, acc, logT = carry
        slot = jax.lax.rem(p, 2)

        @pl.when(p + 1 < n_pairs)
        def _():
            dma(p + 1, jax.lax.rem(p + 1, 2)).start()

        dma(p, slot).wait()
        pair = buf[slot]                                    # (16, 2G)
        alpha, lam, _, _, _ = _chunk_alpha(pair, px, py,
                                           p * (2 * G) - lead, count)
        lamA = lam[:, :G]
        lamB = lam[:, G:]
        sA = jnp.sum(lamA, axis=1, keepdims=True)
        # per-half prefix scans (a full-2G scan would double the scan
        # matmul FLOPs — measured slower) + the half-A total carried
        # into half B
        logT_tot = logT + jnp.concatenate(
            [lane_prefix_excl(lamA), sA + lane_prefix_excl(lamB)], axis=1)
        w = jnp.where(logT_tot > LOG_T_EPS,
                      alpha * jnp.exp(logT_tot), 0.0)       # (P, 2G)
        acc = acc + dot_f32(pair, w, (((1,), (1,)), ((), ())))  # (16, P)
        logT = logT + sA + jnp.sum(lamB, axis=1, keepdims=True)
        return p + 1, acc, logT

    p_fin, acc, logT = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), jnp.zeros((INST_DIM, P), F32),
         jnp.zeros((P, 1), F32)))

    # drain the DMA the last body iteration prefetched but never consumed
    @pl.when((p_fin < n_pairs) & (n_pairs > 0))
    def _():
        dma(p_fin, jax.lax.rem(p_fin, 2)).wait()

    # chunks composited: both chunks of every processed pair contributed
    # to logT (a beyond-segment second chunk contributed exactly zero),
    # so i_fin is even or equals n_chunks — the backward's pair walk and
    # the wrapper's live-chunk routing mask rely on exactly this.
    i_fin = jnp.minimum(2 * p_fin, n_chunks)
    acc_ref[0] = acc
    # row 0: final log-transmittance; row 1: chunks composited (i_fin),
    # exact in f32, consumed by the backward's reverse walk
    logT_ref[0] = jnp.concatenate(
        [jnp.swapaxes(logT, 0, 1),
         jnp.full((1, P), i_fin.astype(F32))], axis=0)


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y",
                                             "interpret"))
def rasterize_fwd(inst_data: jnp.ndarray, tile_starts: jnp.ndarray,
                  n_tiles_x: int, n_tiles_y: int, interpret: bool = False):
    """inst_data (16, CAP+2G), tile_starts (n_tiles+1,) ->
    (acc (n_tiles, 16, P), logT (n_tiles, 2, P): row 0 log-transmittance,
    row 1 the per-tile composited chunk count i_fin)."""
    n_tiles = n_tiles_x * n_tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(
            pl.BlockSpec((1, INST_DIM, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, INST_DIM, 2 * G), F32),  # double-buffered pairs
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_tiles_x=n_tiles_x),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, INST_DIM, P), F32),
                   jax.ShapeDtypeStruct((n_tiles, 2, P), F32)),
        interpret=interpret,
    )(tile_starts, inst_data)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def zero_dead_grad_columns(count, lead, n_live, out0, gbuf, ginst_ref,
                           wsem):
    """Backward-kernel ZERO phase, shared by the 3DGS and 2DGS kernels
    (they must stay byte-identical — `_instance_grads_to_fields` relies
    on this sentinel contract with no runtime mask): chunks the forward
    never composited ([n_live, n_chunks) — the saturation early-exit)
    get explicit zero gradient columns, and the LAST grid step also
    zeroes the sentinel block (the final G buffer columns, where binning
    routes every invalid slot). Dead columns reading as exact zeros lets
    the wrapper's un-sort gather drop its runtime live mask — the
    per-slot ifin[slot_tile] gather it replaces cost 5.8 ms/step at
    1080p (r4 device trace), a third of the 3DGS backward's own time;
    the zero writes are pure DMA on columns the walk never touches.
    All zdma writes are waited before returning, so the caller's reverse
    walk may immediately reuse `gbuf`/`wsem`. Field count and chunk size
    come from `gbuf`'s (2, inst_dim, G) shape."""
    inst_dim, g = gbuf.shape[1], gbuf.shape[2]
    n_chunks = jnp.where(count > 0, pl.cdiv(lead + count, g), 0)
    n_z = n_chunks - n_live
    cap_out = ginst_ref.shape[1]
    is_last = pl.program_id(0) == pl.num_programs(0) - 1
    n_zt = n_z + jnp.where(is_last, 1, 0)

    def zcol(i):
        return jnp.where(i < n_z, out0 + (n_live + i) * g, cap_out - g)

    def zdma(col, slot):
        off = pl.multiple_of(col, g)
        return pltpu.make_async_copy(
            gbuf.at[slot], ginst_ref.at[:, pl.ds(off, g)], wsem.at[slot])

    @pl.when(n_zt > 0)
    def _():
        gbuf[0] = jnp.zeros((inst_dim, g), F32)
        gbuf[1] = jnp.zeros((inst_dim, g), F32)

        def zbody(i, c):
            slot = jax.lax.rem(i, 2)

            @pl.when(i >= 2)
            def _():
                zdma(zcol(i - 2), slot).wait()

            zdma(zcol(i), slot).start()
            return c

        jax.lax.fori_loop(0, n_zt, zbody, 0)

        @pl.when(n_zt > 1)
        def _():
            zdma(zcol(n_zt - 2), jax.lax.rem(n_zt - 2, 2)).wait()

        zdma(zcol(n_zt - 1), jax.lax.rem(n_zt - 1, 2)).wait()


def _bwd_kernel(tile_starts, out_starts, ifin, inst_hbm, dacc_ref,
                dlogT_ref, logT_final_ref, ginst_ref, buf, gbuf,
                sem, wsem, *, n_tiles_x):
    t = pl.program_id(0)
    start = tile_starts[t]
    count = tile_starts[t + 1] - start
    base = (start // G) * G
    lead = start - base
    out0 = out_starts[t]
    n_live = ifin[t]      # chunks the forward actually composited
    # single-chunk reverse walk (unlike the forward's pair steps: the
    # backward's body keeps ~12 (P, width) f32 temporaries live, and
    # width=2G overflows the 16MB VMEM budget and spills — measured
    # slower, not faster). n_live from the pair-stepping forward is
    # even or equals n_chunks; walking chunks [0, n_live) is exact either
    # way — a beyond-segment chunk contributes zero via the count mask.

    # dacc/dlogT/logT_final arrive as auto-pipelined VMEM blocks: pallas
    # prefetches tile t+1's frames during tile t's walk, so the per-tile
    # prologue costs no DMA latency (at ~2 chunks/tile segment length the
    # prologue otherwise dominates the whole kernel)
    go = dacc_ref[0]                                  # (16, P)
    px, py = _pixel_coords(t, n_tiles_x)

    dlogT = jnp.swapaxes(dlogT_ref[0], 0, 1)          # (P, 1)
    logT0 = jnp.swapaxes(logT_final_ref[0], 0, 1)     # (P, 1)

    def dma(i, slot):
        off = pl.multiple_of(base + i * G, G)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(off, G)], buf.at[slot], sem.at[slot])

    def wdma(i, slot):
        off = pl.multiple_of(out0 + i * G, G)
        return pltpu.make_async_copy(
            gbuf.at[slot], ginst_ref.at[:, pl.ds(off, G)], wsem.at[slot])

    zero_dead_grad_columns(count, lead, n_live, out0, gbuf, ginst_ref,
                           wsem)

    @pl.when(n_live > 0)
    def _():
        dma(n_live - 1, jax.lax.rem(n_live - 1, 2)).start()

    def body(k, carry):
        S, logT_after = carry
        i = n_live - 1 - k
        slot = jax.lax.rem(i, 2)

        @pl.when(i - 1 >= 0)
        def _():
            dma(i - 1, jax.lax.rem(i - 1, 2)).start()

        dma(i, slot).wait()
        chunk = buf[slot]                                     # (16, G)
        alpha, lam, dx, dy, not_clamped = _chunk_alpha(
            chunk, px, py, i * G - lead, count)
        logT_tot = logT_after - lane_suffix_incl(lam)  # log T before row j
        T = jnp.exp(logT_tot)
        w = jnp.where(logT_tot > LOG_T_EPS, alpha * T, 0.0)

        # dL/dw (P, G) = d_acc^T (P, 16) @ fields (16, G)
        dw = dot_f32(go, chunk, (((0,), (0,)), ((), ())))
        wdw = w * dw
        S_after = S + lane_suffix_incl(wdw) - wdw      # strict suffix
        live = w > 0.0
        # -alpha·dalpha folded: alpha·(T·dw - S_after/(1-alpha)) =
        # w·dw - S_after·alpha/(1-alpha), reusing wdw
        dsig = jnp.where(not_clamped & live,
                         S_after * (alpha / (1.0 - alpha)) - wdw, 0.0)

        # All geometry gradients are column sums of products of dsig with
        # dx/dy — form the minimal product set (5 muls: u = dx·dsig,
        # v = dy·dsig, dx·u, dy·u, dy·v) and reduce each over pixels,
        # then combine per gaussian in O(G). This replaces the naive
        # ~17 (P,·) VPU ops of forming each gradient separately, with no
        # recombination cancellation (every sum is exact in its own
        # right, same error profile as the elementwise original).
        u = dx * dsig
        v = dy * dsig
        s0 = jnp.sum(dsig, axis=0, keepdims=True)
        cx = jnp.sum(u, axis=0, keepdims=True)         # Σ dx·dsig
        cy = jnp.sum(v, axis=0, keepdims=True)         # Σ dy·dsig
        sxu = jnp.sum(dx * u, axis=0, keepdims=True)   # Σ dx²·dsig
        syu = jnp.sum(dy * u, axis=0, keepdims=True)   # Σ dx·dy·dsig
        syv = jnp.sum(dy * v, axis=0, keepdims=True)   # Σ dy²·dsig

        a = chunk[2:3, :]
        b = chunk[3:4, :]
        c = chunk[4:5, :]
        op = chunk[5:6, :]
        gmx = -(a * cx + b * cy)
        gmy = -(b * cx + c * cy)
        ga = 0.5 * sxu
        gb = syu
        gc = 0.5 * syv
        # dop = (alpha/op)·dalpha = -dsig/op  (masked identically to dsig)
        gop = jnp.where(op > 0, -s0 / jnp.maximum(op, 1e-12), 0.0)
        gcd = dot_f32(go, w, (((1,), (0,)), ((), ())))          # (16, G)
        zero = jnp.zeros((1, G), F32)

        # reuse of this gbuf slot: make sure its previous write landed
        @pl.when(k >= 2)
        def _():
            wdma(i + 2, slot).wait()

        gbuf[slot] = jnp.concatenate(
            [gmx, gmy, ga, gb, gc, gop,
             gcd[6:7], gcd[7:8], gcd[8:9], gcd[9:10],
             zero, zero, zero, zero, zero, zero], axis=0)     # (16, G)
        wdma(i, slot).start()

        S = S + jnp.sum(wdw, axis=1, keepdims=True)
        logT_after = logT_after - jnp.sum(lam, axis=1, keepdims=True)
        return S, logT_after

    jax.lax.fori_loop(0, n_live, body, (dlogT, logT0))

    # drain outstanding grad writes (last two chunks processed were
    # indices 1 and 0 in segment order)
    @pl.when(n_live > 0)
    def _():
        wdma(0, 0).wait()

    @pl.when(n_live > 1)
    def _():
        wdma(1, 1).wait()


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y",
                                             "interpret"))
def rasterize_bwd(inst_data: jnp.ndarray, tile_starts: jnp.ndarray,
                  out_starts: jnp.ndarray, ifin: jnp.ndarray,
                  d_acc: jnp.ndarray, d_logT: jnp.ndarray,
                  logT_final: jnp.ndarray,
                  n_tiles_x: int, n_tiles_y: int,
                  interpret: bool = False) -> jnp.ndarray:
    """d_acc (n_tiles, 16, P), d_logT / logT_final (n_tiles, 1, P),
    out_starts (n_tiles+1,) aligned grad columns, ifin (n_tiles,) chunks
    the forward composited. Returns per-instance grads
    (16, grad_capacity(CAP)) in the `binning.grad_slot` column layout;
    dead columns (never-composited chunks, the sentinel block) are
    written as exact zeros — routing needs no validity mask."""
    from horizongs_tpu.ops.binning import grad_capacity
    n_tiles = n_tiles_x * n_tiles_y
    cap = inst_data.shape[1] - 2 * G   # CAP+2G buffer -> logical capacity
    cap_out = grad_capacity(cap, n_tiles, G)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec((1, INST_DIM, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM),
                  pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, INST_DIM, G), F32),   # double-buffered chunks
            pltpu.VMEM((2, INST_DIM, G), F32),   # grad write buffers
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_tiles_x=n_tiles_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((INST_DIM, cap_out), F32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, out_starts, ifin, inst_data, d_acc, d_logT, logT_final)
