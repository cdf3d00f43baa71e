"""Pallas TPU kernels: 3DGS sorted alpha-compositing, forward + backward.

The hot path of the framework — the TPU equivalent of gsplat's
`rasterize_to_pixels` fwd/bwd CUDA kernels. Design notes:

  * grid over image tiles (32x32 px = 1024 pixels, P). TPU pallas has a
    ~10us fixed cost per grid step, so tiles are big; each step loops
    over the tile's depth-sorted instance segment in chunks of G=128
    gaussians with double-buffered DMA from HBM (segment offsets arrive
    via scalar prefetch; segments are G-aligned by
    `binning.align_tile_segments` so every slice is lane-aligned).
  * instance data is a transposed SoA (16 field rows x CAP columns);
    chunk math is laid out (P pixels x G instances): alpha is VPU
    elementwise from broadcast field rows, the in-chunk transmittance
    prefix is one (P,G)@(G,G) triangular matmul on the MXU, and
    accumulation is fields (16,G) @ w^T -> the (16,P) output block.
    Row k of the output accumulates sum_i w_i * field_k(i): rows 6-8 are
    color, 9 depth, 10 (the constant one) alpha.
  * forward early-exits a tile once every pixel is saturated
    (log T < log 1e-4), the analog of gsplat's per-warp done flag.
  * because the wrapper reads color/alpha/depth straight out of the acc
    rows, the cotangent d_acc IS the pixel gradient frame the backward
    needs: dL/dw = d_acc^T @ fields.
  * backward re-walks each segment in REVERSE chunk order,
    reconstructing per-row transmittance from the saved final logT
    (gsplat's recompute strategy) and carrying the suffix sum
    S = dlogT + sum_{later} w_j dL/dw_j needed for dL/dalpha.
    Per-instance gradients go to disjoint columns of a (16, CAP)
    buffer — no atomics, since an instance belongs to exactly one tile.

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


def _excl_prefix_mat():
    """M[k, j] = 1 if k < j — x(P,G) @ M gives exclusive prefix along G."""
    r = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    return (r < c).astype(F32)


def _incl_suffix_mat():
    """M[k, j] = 1 if k >= j — x(P,G) @ M gives inclusive suffix along G."""
    r = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    return (r >= c).astype(F32)


def _strict_suffix_mat():
    r = jax.lax.broadcasted_iota(jnp.int32, (G, G), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (G, G), 1)
    return (r > c).astype(F32)


def _pixel_coords(tile_id, n_tiles_x):
    """Global pixel centers of this tile as (P, 1) columns."""
    tx = (tile_id % n_tiles_x).astype(F32) * TILE_W
    ty = (tile_id // n_tiles_x).astype(F32) * TILE_H
    row = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)
    lx = (row % TILE_W).astype(F32) + 0.5
    ly = (row // TILE_W).astype(F32) + 0.5
    return tx + lx, ty + ly


def _chunk_alpha(buf, px, py, col0, count):
    """alpha for one chunk. buf: (INST_DIM, G) block; px, py (P, 1).

    Returns alpha (P,G), lam (P,G), dx, dy (P,G), not_clamped (P,G)."""
    mx = buf[0:1, :]
    my = buf[1:2, :]
    a = buf[2:3, :]
    b = buf[3:4, :]
    c = buf[4:5, :]
    op = buf[5:6, :]
    one = buf[10:11, :]
    dx = px - mx                       # (P, G)
    dy = py - my
    sigma = 0.5 * a * dx * dx + b * dx * dy + 0.5 * c * dy * dy
    raw = op * jnp.exp(-sigma)
    alpha = jnp.minimum(raw, MAX_ALPHA)
    col = col0 + jax.lax.broadcasted_iota(jnp.int32, (1, G), 1)
    valid = (col < count) & (one > 0.5)
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
    n_chunks = pl.cdiv(count, G)

    px, py = _pixel_coords(t, n_tiles_x)
    M_excl = _excl_prefix_mat()

    def dma(i, slot):
        off = pl.multiple_of(start + i * G, G)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(off, G)], buf.at[slot], sem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0).start()

    def cond(carry):
        i, acc, logT = carry
        return (i < n_chunks) & (jnp.max(logT) > LOG_T_EPS)

    def body(carry):
        i, acc, logT = carry
        slot = jax.lax.rem(i, 2)

        @pl.when(i + 1 < n_chunks)
        def _():
            dma(i + 1, jax.lax.rem(i + 1, 2)).start()

        dma(i, slot).wait()
        chunk = buf[slot]
        alpha, lam, _, _, _ = _chunk_alpha(chunk, px, py, i * G, count)
        seg_excl = jax.lax.dot(lam, M_excl, preferred_element_type=F32)
        logT_tot = logT + seg_excl                          # (P, G)
        w = jnp.where(logT_tot > LOG_T_EPS,
                      alpha * jnp.exp(logT_tot), 0.0)
        acc = acc + jax.lax.dot_general(
            chunk, w, (((1,), (1,)), ((), ())),
            preferred_element_type=F32)                     # (16, P)
        logT = logT + jnp.sum(lam, axis=1, keepdims=True)
        return i + 1, acc, logT

    i_fin, acc, logT = jax.lax.while_loop(
        cond, body,
        (jnp.asarray(0, jnp.int32), jnp.zeros((INST_DIM, P), F32),
         jnp.zeros((P, 1), F32)))

    # drain the DMA the last body iteration prefetched but never consumed
    @pl.when((i_fin < n_chunks) & (n_chunks > 0))
    def _():
        dma(i_fin, jax.lax.rem(i_fin, 2)).wait()

    acc_ref[0] = acc
    logT_ref[0] = jnp.swapaxes(logT, 0, 1)


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y",
                                             "interpret"))
def rasterize_fwd(inst_data: jnp.ndarray, tile_starts: jnp.ndarray,
                  n_tiles_x: int, n_tiles_y: int, interpret: bool = False):
    """inst_data (16, CAP+G), tile_starts (n_tiles+1,) ->
    (acc (n_tiles, 16, P), logT (n_tiles, 1, P))."""
    n_tiles = n_tiles_x * n_tiles_y
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=(
            pl.BlockSpec((1, INST_DIM, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, P), lambda t, *_: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((2, INST_DIM, G), F32),   # double-buffered chunks
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_fwd_kernel, n_tiles_x=n_tiles_x),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, INST_DIM, P), F32),
                   jax.ShapeDtypeStruct((n_tiles, 1, P), F32)),
        interpret=interpret,
    )(tile_starts, inst_data)


# ---------------------------------------------------------------------------
# backward
# ---------------------------------------------------------------------------

def _bwd_kernel(tile_starts, inst_hbm, dacc_hbm, dlogT_hbm,
                logT_final_hbm, ginst_ref, buf, go, gbuf, lt_buf,
                sem, sem_go, wsem, *, n_tiles_x):
    t = pl.program_id(0)
    start = tile_starts[t]
    count = tile_starts[t + 1] - start
    n_chunks = pl.cdiv(count, G)

    cp_go = pltpu.make_async_copy(dacc_hbm.at[t], go, sem_go)
    cp_go.start()
    cp_dl = pltpu.make_async_copy(dlogT_hbm.at[t], lt_buf.at[0], sem_go)
    cp_dl.start()
    cp_lt = pltpu.make_async_copy(logT_final_hbm.at[t], lt_buf.at[1], sem_go)
    cp_lt.start()
    cp_go.wait()
    cp_dl.wait()
    cp_lt.wait()

    px, py = _pixel_coords(t, n_tiles_x)
    M_sufi = _incl_suffix_mat()
    M_sufs = _strict_suffix_mat()

    dlogT = jnp.swapaxes(lt_buf[0], 0, 1)             # (P, 1)
    logT0 = jnp.swapaxes(lt_buf[1], 0, 1)             # (P, 1)

    def dma(i, slot):
        off = pl.multiple_of(start + i * G, G)
        return pltpu.make_async_copy(
            inst_hbm.at[:, pl.ds(off, G)], buf.at[slot], sem.at[slot])

    def wdma(i, slot):
        off = pl.multiple_of(start + i * G, G)
        return pltpu.make_async_copy(
            gbuf.at[slot], ginst_ref.at[:, pl.ds(off, G)], wsem.at[slot])

    @pl.when(n_chunks > 0)
    def _():
        dma(n_chunks - 1, jax.lax.rem(n_chunks - 1, 2)).start()

    def body(k, carry):
        S, logT_after = carry
        i = n_chunks - 1 - k
        slot = jax.lax.rem(i, 2)

        @pl.when(i - 1 >= 0)
        def _():
            dma(i - 1, jax.lax.rem(i - 1, 2)).start()

        dma(i, slot).wait()
        chunk = buf[slot]
        alpha, lam, dx, dy, not_clamped = _chunk_alpha(
            chunk, px, py, i * G, count)
        suf_incl = jax.lax.dot(lam, M_sufi, preferred_element_type=F32)
        logT_tot = logT_after - suf_incl               # log T before row j
        T = jnp.exp(logT_tot)
        w = jnp.where(logT_tot > LOG_T_EPS, alpha * T, 0.0)

        # dL/dw (P, G) = d_acc^T (P, 16) @ fields (16, G)
        dw = jax.lax.dot_general(go[:], chunk, (((0,), (0,)), ((), ())),
                                 preferred_element_type=F32)
        wdw = w * dw
        S_after = S + jax.lax.dot(wdw, M_sufs, preferred_element_type=F32)
        live = w > 0.0
        dalpha = jnp.where(live, T * dw - S_after / (1.0 - alpha), 0.0)

        a = chunk[2:3, :]
        b = chunk[3:4, :]
        c = chunk[4:5, :]
        op = chunk[5:6, :]
        exp_neg_sigma = jnp.where(op > 0, alpha / jnp.maximum(op, 1e-12), 0.0)
        dsig = jnp.where(not_clamped & live, -alpha * dalpha, 0.0)
        dop = jnp.where(not_clamped & live, exp_neg_sigma * dalpha, 0.0)

        gmx = -jnp.sum((a * dx + b * dy) * dsig, axis=0, keepdims=True)
        gmy = -jnp.sum((b * dx + c * dy) * dsig, axis=0, keepdims=True)
        ga = jnp.sum(0.5 * dx * dx * dsig, axis=0, keepdims=True)
        gb = jnp.sum(dx * dy * dsig, axis=0, keepdims=True)
        gc = jnp.sum(0.5 * dy * dy * dsig, axis=0, keepdims=True)
        gop = jnp.sum(dop, axis=0, keepdims=True)
        gcd = jax.lax.dot(go[:], w, preferred_element_type=F32)  # (16, G)
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

    jax.lax.fori_loop(0, n_chunks, body, (dlogT, logT0))

    # drain outstanding grad writes (last two chunks processed were
    # indices 1 and 0 in segment order)
    @pl.when(n_chunks > 0)
    def _():
        wdma(0, 0).wait()

    @pl.when(n_chunks > 1)
    def _():
        wdma(1, 1).wait()


@functools.partial(jax.jit, static_argnames=("n_tiles_x", "n_tiles_y",
                                             "interpret"))
def rasterize_bwd(inst_data: jnp.ndarray, tile_starts: jnp.ndarray,
                  d_acc: jnp.ndarray, d_logT: jnp.ndarray,
                  logT_final: jnp.ndarray,
                  n_tiles_x: int, n_tiles_y: int,
                  interpret: bool = False) -> jnp.ndarray:
    """d_acc (n_tiles, 16, P), d_logT / logT_final (n_tiles, 1, P).
    Returns per-instance grads (16, CAP+G) in the field-row layout."""
    n_tiles = n_tiles_x * n_tiles_y
    cap = inst_data.shape[1]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY),
                  pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, INST_DIM, G), F32),   # double-buffered chunks
            pltpu.VMEM((INST_DIM, P), F32),      # grad-out frame
            pltpu.VMEM((2, INST_DIM, G), F32),   # grad write buffers
            pltpu.VMEM((2, 1, P), F32),          # dlogT / logT_final
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    return pl.pallas_call(
        functools.partial(_bwd_kernel, n_tiles_x=n_tiles_x),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((INST_DIM, cap), F32),
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(tile_starts, inst_data, d_acc, d_logT, logT_final)
