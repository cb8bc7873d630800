"""Sorted-stream scatter-add ("splat") for voxel-grid gradients.

The backward pass of every trainable-grid read (trilinear sample, displaced
multi-tap sample) is a scatter-add of millions of per-point corner
contributions into a multi-MB dense grid. XLA-TPU lowers large scatter-adds
to sort + a table-sweep "apply" pass that runs at ~0.5-0.9 GB/s of table
bytes plus ~90M updates/s (measured on v5e, `scripts/bench_scatter.py`) —
~300ms for the fine-stage SDF grid and >1.5s for a color grid, the dominant
cost of a train step.

This module replaces that with the structure the problem actually has:

1. Sort the *points* once by base-cell id (3.1M keys ~= 11ms on v5e).
2. Every corner/tap stream is then already sorted, because each stream's
   cell index is ``base + static_offset`` and adding a constant preserves
   order. No per-corner sort is needed.
3. A Pallas kernel sweeps the output grid in 128-cell-tile blocks; per
   block it consumes each stream's (contiguous!) update range in groups of
   128 sorted updates and applies each group with a one-hot matmul on the
   MXU: ``out[2C,128] += V_hi/lo[2C,128] @ onehot[128,128]``. The values
   ride as a bf16 hi+lo split so the matmul is a single MXU pass at ~f32
   accuracy; blocks stream at memory bandwidth and update cost is ~1-2
   cycles/update instead of XLA's table sweep.

The reference implements the same gradients as hand-written CUDA backward
kernels (``cuda/render_utils_kernel.cu:653-707``, ``adam_upd_kernel.cu``)
or relies on torch's native grid_sample backward; this is the TPU-shaped
equivalent.
"""

from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# DMA chunk: rows of 128 sorted updates staged to VMEM per async copy.
_GROUP = 128
_ROWS = 16               # groups per chunk
_CH = _ROWS * _GROUP     # updates per chunk

_PAD_SENTINEL = np.int32(2**30)


def _splat_kernel_body(T, C, S, offsets, lo_ref, hi_ref, tf_ref, tl_ref,
                       base_hbm, vals_hbm, trng_hbm, out_ref, idx_buf,
                       val_buf, trng_buf, sems):
    b = pl.program_id(0)
    block_base = b * (T * _GROUP)
    bt = b * T
    out_ref[...] = jnp.zeros_like(out_ref)

    lane = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, _GROUP), 1)
    sub = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, 1), 0)

    def copies(s, st, slot):
        return (
            pltpu.make_async_copy(
                base_hbm.at[pl.ds(st // _GROUP, _ROWS), :], idx_buf.at[slot],
                sems.at[0, slot],
            ),
            pltpu.make_async_copy(
                vals_hbm.at[s, :, pl.ds(st, _CH)], val_buf.at[slot],
                sems.at[1, slot],
            ),
            pltpu.make_async_copy(
                trng_hbm.at[s, st // _CH], trng_buf.at[slot],
                sems.at[2, slot],
            ),
        )

    for s in range(S):
        off = int(offsets[s])
        lo = lo_ref[s, b]
        hi = hi_ref[s, b]
        # tiles of the range's first/last update: tighten boundary groups
        # whose host-side span includes rows of neighboring blocks
        tfirst = tf_ref[s, b]
        tlast = tl_ref[s, b]
        st0 = (lo // _CH) * _CH  # chunk-aligned DMA start
        nch = pl.cdiv(hi - st0, _CH)

        @pl.when(nch > 0)
        def _(s=s, lo=lo, hi=hi, st0=st0, nch=nch, off=off):
            for cp in copies(s, st0, 0):
                cp.start()

            def chunk_body(i, _):
                st = st0 + i * _CH
                slot = jax.lax.rem(i, 2)

                @pl.when(i + 1 < nch)
                def _():
                    for cp in copies(s, st + _CH, 1 - slot):
                        cp.start()

                for cp in copies(s, st, slot):
                    cp.wait()

                idxT = jnp.transpose(idx_buf[slot], (1, 0))  # [GROUP, ROWS]
                v32 = val_buf[slot]
                v_hi = v32.astype(jnp.bfloat16)
                v_lo = (v32 - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                vb = jnp.concatenate([v_hi, v_lo], axis=0)  # [2C, CH] bf16

                for g in range(_ROWS):
                    g0 = st + g * _GROUP  # global row of this group's start

                    @pl.when((g0 + _GROUP > lo) & (g0 < hi))
                    def _(g=g, g0=g0):
                        # tile span precomputed host-side; boundary groups
                        # tightened by the range's first/last update tile
                        t0 = jnp.clip(
                            jnp.maximum(trng_buf[slot, 0, g] - bt, tfirst),
                            0, T - 1,
                        )
                        t1 = jnp.minimum(trng_buf[slot, 1, g] - bt, tlast)
                        pos = sub + g0
                        valid = (pos >= lo) & (pos < hi)
                        relc = idxT[:, g:g + 1] + (off - block_base)
                        vg = vb[:, g * _GROUP:(g + 1) * _GROUP]  # [2C, GROUP]

                        def tile_body(t_match, t_store, _=None):
                            a1 = jnp.where(
                                ((relc - t_match * _GROUP) == lane) & valid,
                                1.0, 0.0,
                            ).astype(jnp.bfloat16)  # [GROUP upd, GROUP cell]
                            res = jax.lax.dot_general(
                                vg, a1, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )  # [2C, GROUP]
                            out_ref[t_store] = out_ref[t_store] + (
                                res[:C] + res[C:]
                            )
                            return 0

                        # most groups span 1-2 tiles. tile_body self-masks
                        # (the one-hot matches nothing outside tile
                        # t_match), so run two tiles unconditionally — an
                        # idle matmul is ~5x cheaper than a taken branch —
                        # and branch only for the rare wide spans. t0+1 may
                        # exceed the block: match finds nothing, store is
                        # clamped in-bounds.
                        tile_body(t0, t0)
                        tile_body(t0 + 1, jnp.minimum(t0 + 1, T - 1))

                        @pl.when(t1 > t0 + 1)
                        def _():
                            jax.lax.fori_loop(
                                t0 + 2, t1 + 1, lambda t, c: tile_body(t, t, c), 0
                            )
                return 0

            jax.lax.fori_loop(0, nch, chunk_body, 0)


@functools.partial(
    jax.jit,
    static_argnames=("offsets", "n_cells", "block_tiles", "interpret"),
)
def sorted_streams_splat(
    base_sorted: jnp.ndarray,
    vals: jnp.ndarray,
    offsets: Tuple[int, ...],
    n_cells: int,
    block_tiles: int = 128,
    interpret: bool = False,
    n_valid=None,
) -> jnp.ndarray:
    """Dense scatter-add of S sorted update streams into a [n_cells, C] table.

    base_sorted: [M] int32, ascending. vals: [S, C, M] float32. Stream s's
    update k targets row ``base_sorted[k] + offsets[s]``; the caller must
    zero ``vals`` wherever that index falls outside [0, n_cells) (out-of-
    range rows are silently dropped). Returns [n_cells, C] float32.

    ``n_valid`` (traced scalar or None): updates k >= n_valid are march
    pad-tail rows whose values are zero by construction — they are dropped
    from every block's range. Without this, the block holding the pads'
    collapse cell serially sweeps the whole zero tail (hundreds of chunk
    DMAs for nothing on typical budget-dominated marches).
    """
    S, C, M = vals.shape
    assert len(offsets) == S

    if jax.default_backend() != "tpu" and not interpret:
        out = jnp.zeros((n_cells, C), jnp.float32)
        kmask = (
            None if n_valid is None
            else (jnp.arange(M) < n_valid)[None, :]
        )
        for s in range(S):
            idx = base_sorted + offsets[s]
            ok = (idx >= 0) & (idx < n_cells)
            v = jnp.where(ok[None, :], vals[s], 0.0)
            if kmask is not None:
                v = jnp.where(kmask, v, 0.0)
            out = out.at[jnp.clip(idx, 0, n_cells - 1)].add(v.T)
        return out

    T = block_tiles
    block = T * _GROUP
    nb = -(-n_cells // block)
    n_pad = nb * block
    c_pad = -(-C // 8) * 8  # sublane alignment for the HBM value slices

    if n_valid is not None:
        # move pad-tail updates to the sentinel cell: ascending order is
        # preserved (they were the max-cell tail) and no block's
        # searchsorted range ever includes them
        nv = jnp.asarray(n_valid, jnp.int32)
        base_sorted = jnp.where(
            jnp.arange(M, dtype=jnp.int32) >= nv, _PAD_SENTINEL,
            base_sorted.astype(jnp.int32),
        )

    # pad streams so in-kernel DMA never reads past the end, and so the
    # sorted index array reshapes into [rows, 128]
    m_pad = (-(-(M + _CH) // _CH)) * _CH
    base_p = jnp.concatenate(
        [base_sorted.astype(jnp.int32),
         jnp.full((m_pad - M,), _PAD_SENTINEL, jnp.int32)]
    ).reshape(m_pad // _GROUP, _GROUP)
    vals_p = jnp.pad(vals, ((0, 0), (0, c_pad - C), (0, m_pad - M)))

    # per (stream, block) update ranges; constant-offset streams stay sorted
    bounds = jnp.arange(nb + 1, dtype=jnp.int32) * block  # [nb+1]
    offs = jnp.asarray(offsets, jnp.int32)
    cuts = jnp.searchsorted(
        base_sorted, (bounds[None, :] - offs[:, None]).reshape(-1), side="left"
    ).reshape(S, nb + 1).astype(jnp.int32)
    lo, hi = cuts[:, :-1], cuts[:, 1:]

    # block-local tiles of each range's first/last update (clamped) — used
    # to tighten boundary groups whose 128-row span strays into neighbors
    bt = (jnp.arange(nb, dtype=jnp.int32) * T)[None, :]
    first_idx = base_sorted[jnp.clip(lo, 0, M - 1)] + offs[:, None]
    last_idx = base_sorted[jnp.clip(hi - 1, 0, M - 1)] + offs[:, None]
    tf = jnp.clip(first_idx // _GROUP - bt, 0, T - 1).astype(jnp.int32)
    tl = jnp.clip(last_idx // _GROUP - bt, 0, T - 1).astype(jnp.int32)

    # per (stream, group-of-128) global tile span, packed per DMA chunk as
    # [S, NCH, 2, 128] so the kernel reads them as cheap static-lane scalars
    nchunks = m_pad // _CH
    gfirst, glast = base_p[:, 0], base_p[:, -1]  # [G]
    gt0 = (gfirst[None, :] + offs[:, None]) // _GROUP  # [S, G]
    gt1 = (glast[None, :] + offs[:, None]) // _GROUP
    trng = jnp.stack([gt0, gt1], axis=2).reshape(S, nchunks, _ROWS, 2)
    trng = jnp.moveaxis(trng, 3, 2)  # [S, NCH, 2, ROWS]
    trng = jnp.pad(trng, ((0, 0), (0, 0), (0, 0), (0, _GROUP - _ROWS)))

    kernel = functools.partial(
        _splat_kernel_body, T, c_pad, S, tuple(int(o) for o in offsets)
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nb,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (T, c_pad, _GROUP), lambda b, lo, hi, tf, tl: (b, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((2, _ROWS, _GROUP), jnp.int32),
                pltpu.VMEM((2, c_pad, _CH), jnp.float32),
                pltpu.SMEM((2, 2, _GROUP), jnp.int32),
                pltpu.SemaphoreType.DMA((3, 2)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nb * T, c_pad, _GROUP), jnp.float32),
        interpret=interpret,
    )(lo, hi, tf, tl, base_p, vals_p, trng)

    # [NT, Cp, 128] -> [NT, 128, Cp] -> [n_cells, C]
    out = out.transpose(0, 2, 1).reshape(n_pad, c_pad)[:n_cells, :C]
    return out


def sorted_scatter_1d(idx_sorted: jnp.ndarray, x: jnp.ndarray,
                      size: int, n_valid=None) -> jnp.ndarray:
    """Scatter ``x [M]`` to a zero [size] array at ascending (unique up to
    droppable duplicates) indices — the march's dense-bridge scatter,
    through the splat kernel instead of XLA's table-sweep lowering.
    Rows >= ``n_valid`` must target droppable cells (the march's dump row);
    they are skipped entirely."""
    if x.dtype == jnp.bool_:
        out = _sorted_scatter_f32(idx_sorted, x.astype(jnp.float32), size,
                                  n_valid)
        return out > 0.5
    return _sorted_scatter_f32(idx_sorted, x.astype(jnp.float32), size,
                               n_valid).astype(x.dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _sorted_scatter_f32(idx_sorted, x, size, n_valid=None):
    return sorted_streams_splat(
        idx_sorted, x[None, None, :], (0,), size, n_valid=n_valid
    )[:, 0]


def _sorted_scatter_f32_fwd(idx_sorted, x, size, n_valid=None):
    return _sorted_scatter_f32(idx_sorted, x, size, n_valid), (idx_sorted,
                                                               n_valid)


def _sorted_scatter_f32_bwd(size, res, ct):
    # unique indices => the adjoint is a plain gather
    idx_sorted, n_valid = res
    return (jnp.zeros_like(idx_sorted), jnp.take(ct, idx_sorted),
            None if n_valid is None else jnp.zeros_like(n_valid))


_sorted_scatter_f32.defvjp(_sorted_scatter_f32_fwd, _sorted_scatter_f32_bwd)


@jax.custom_vjp
def sorted_gather_rows(table: jnp.ndarray, idx_sorted: jnp.ndarray,
                       n_valid=None) -> jnp.ndarray:
    """``table[idx_sorted]`` row gather whose adjoint is the sorted splat
    kernel instead of XLA's scatter lowering. ``idx_sorted`` must be
    ascending and in-range. Rows >= ``n_valid`` carry zero cotangents
    (march pad tail) and are skipped in the adjoint."""
    return jnp.take(table, idx_sorted, axis=0)


def _sorted_gather_rows_fwd(table, idx_sorted, n_valid=None):
    return jnp.take(table, idx_sorted, axis=0), (table.shape, idx_sorted,
                                                 n_valid)


def _sorted_gather_rows_bwd(res, ct):
    (R, C), idx_sorted, n_valid = res
    dtable = sorted_streams_splat(
        idx_sorted, ct.T[None].astype(jnp.float32), (0,), R, n_valid=n_valid
    ).astype(ct.dtype)
    return (dtable, jnp.zeros_like(idx_sorted),
            None if n_valid is None else jnp.zeros_like(n_valid))


sorted_gather_rows.defvjp(_sorted_gather_rows_fwd, _sorted_gather_rows_bwd)


# ---------------------------------------------------------------------------
# Chunk-major sorted trilinear gather: the forward mirror of the splat.
# Points sorted by base cell -> each 2048-point chunk's 8 corner reads live
# in one contiguous table window, DMA'd to VMEM (bf16 hi+lo split) and
# gathered with one-hot MXU matmuls at ~1-2 cycles/point/corner — no
# per-step packed-table rebuild, unlike the corner-pack path.
# ---------------------------------------------------------------------------

# points per chunk (= one grid step). Measured per-grid-step overhead is
# ~0.9-2 ms regardless of in-step work (scripts/bench_gather_grid.py), so
# bigger chunks amortize it; the cost is coarser locality (more table span
# per chunk) and coarser n_valid pad skipping.
_GCH = int(__import__("os").environ.get("ESR_GATHER_CHUNK", 2048))
# weighted-path piece height: table rows resident per piece (the default
# covers a YZ+Z+1 corner span at 256^3). Taller pieces amortize the fixed
# per-piece cost but hold gcap*C*4 B of VMEM (C=6 @ 98304 = 2.4 MB).
_GCAP = int(__import__("os").environ.get("ESR_GATHER_PIECE", 98304))
if _GCAP % _GROUP != 0:
    # hard error, not assert: stripped under python -O this would reach the
    # kernel, whose piece-count/padding math (and the out-of-bounds-read
    # guarantees discussed at the piece loop below) assumes _GROUP alignment
    raise ValueError(f"ESR_GATHER_PIECE={_GCAP} must be a multiple of {_GROUP}")
# raw C=1 tap gathers can afford much taller pieces in VMEM (rows are 4 B);
# fewer pieces amortize whatever the measured ~1.4 ms/piece fixed cost is
_GCAP_RAW = int(__import__("os").environ.get("ESR_GATHER_PIECE_RAW", 98304))
# misaligned pieces would shift every tap in pieces p>=1 by gcap %% 128 rows
if _GCAP_RAW % _GROUP != 0:
    raise ValueError(
        f"ESR_GATHER_PIECE_RAW={_GCAP_RAW} must be a multiple of {_GROUP}")
# Below this many points the plain XLA row gather wins outright: the
# kernel's cost is ~fixed per table sweep for any point set whose sorted
# chunks span the whole grid (the r5 fine trace measured the SAME
# ~113 ms for the fused K2 gather at 131k AND 524k points — piece count
# ~ table_rows / piece_height, independent of M), while XLA gathers are
# row-count-bound at ~90-250M rows/s. For surface-distributed march
# points the crossover is ~1M points x 8 corners; 262144 keeps the
# shrunk phase-2 head reads (K2 = N*16, secondary Nsec*8) on the XLA
# path (r5: fine step 855 -> 717 ms). ESR_GATHER_XLA_M overrides.
_GATHER_XLA_M = int(
    __import__("os").environ.get("ESR_GATHER_XLA_M", 262144)
)
# matmul precision for the one-hot gather. Mosaic only lowers DEFAULT and
# HIGHEST in-kernel (HIGH raises NotImplementedError); HIGHEST keeps the
# sampled values bit-exact. Env knob for microbenching the alternative.
_GATHER_PRECISION = {
    "default": jax.lax.Precision.DEFAULT,
    "highest": jax.lax.Precision.HIGHEST,
}[__import__("os").environ.get("ESR_GATHER_PRECISION", "highest")]


def _gather_kernel_body(C, R, M, offsets, raw, family, gcap, w0_ref, npc_ref,
                        gf_ref, gl_ref, idx_hbm, w_hbm, tbl_hbm, out_ref,
                        idx_buf, w_buf, pbuf, sems):
    # lane-major throughout: points and cells ride the 128-lane dim, so no
    # in-kernel transposes and all HBM minor dims are large/aligned.
    #
    # Offsets are processed in FAMILIES of W stride-``sa`` consecutive slots
    # (family=(sa, W); W=1 degenerates to one-offset families). A family's
    # W reads share one one-hot built from the BASE slot and ride a single
    # [W*C, 256] x [256, 128] matmul whose LHS rows are lane-rolled views of
    # the piece buffer — the measured cost law is ~1.4-1.6 ms per piece
    # REGARDLESS of table bytes, i.e. pure per-matmul-issue overhead
    # (16 groups x D offsets x 2 tiles = 768 issues/piece at D=24), so
    # fewer, wider issues are the whole game: 768 -> 64 for the tap calls.
    sa, W = family
    K = len(offsets) // W
    c = pl.program_id(0)
    ncap_t = gcap // _GROUP
    # extra tiles DMA'd past the piece so every slot of a family anchored in
    # this piece reads resident data (slot w reads base + w*sa)
    ext_t = ((W - 1) * sa) // _GROUP + 2
    out_ref[...] = jnp.zeros_like(out_ref)

    cp_idx = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(c * (_GCH // _GROUP), _GCH // _GROUP), :],
        idx_buf, sems.at[0],
    )
    cp_idx.start()
    if not raw:
        cp_w = pltpu.make_async_copy(
            w_hbm.at[:, pl.ds(c * (_GCH // _GROUP), _GCH // _GROUP), :],
            w_buf, sems.at[1],
        )
        cp_w.start()

    base0 = w0_ref[c]
    npc = npc_ref[c]
    cell_sub = jax.lax.broadcasted_iota(jnp.int32, (2 * _GROUP, _GROUP), 0)
    cell_sub1 = jax.lax.broadcasted_iota(jnp.int32, (_GROUP, _GROUP), 0)
    pos_lane = jax.lax.broadcasted_iota(jnp.int32, (1, _GROUP), 1)

    cp_idx.wait()
    if not raw:
        cp_w.wait()

    def piece_body(p, _):
        pstart = base0 + p * gcap
        if raw:
            cp_t = pltpu.make_async_copy(
                tbl_hbm.at[pl.ds(pstart // _GROUP, ncap_t + ext_t), :, :],
                pbuf, sems.at[2],
            )
            cp_t.start()
            cp_t.wait()
        else:
            # weighted path: exactly the proven v2 structure — DMA the
            # piece only, keep the one-past tile zero so the unclamped
            # second-tile matmul read can't turn garbage into NaN
            cp_t = pltpu.make_async_copy(
                tbl_hbm.at[pl.ds(pstart // _GROUP, ncap_t), :, :],
                pbuf.at[:ncap_t], sems.at[2],
            )
            cp_t.start()
            cp_t.wait()
            pbuf[ncap_t] = jnp.zeros_like(pbuf[ncap_t])

        for g in range(_GCH // _GROUP):
            gpos = c * _GCH + g * _GROUP
            gf = gf_ref[c, g]
            gl = gl_ref[c, g]
            valid = (pos_lane + gpos) < M          # [1, GROUP] lanes
            row = idx_buf[g:g + 1, :]              # [1, GROUP] lanes

            for k in range(K):
                ck = offsets[k * W]
                # NO pl.when guard per family: a taken branch costs ~1us
                # while an idle self-masked matmul costs ~0.2us (playbook
                # rule 4). The one-hot (v_rel) self-masks out-of-piece
                # reads; a family is processed in the one piece holding
                # its BASE slot, the other slots read the ext_t extension.
                t0 = jnp.clip(
                    (gf + ck - pstart) // _GROUP, 0, ncap_t - 1
                )
                t1 = jnp.minimum(
                    (gl + ck - pstart) // _GROUP, ncap_t - 1
                )
                rel = row + (ck - pstart)      # [1, GROUP] base-slot cell
                v_rel = valid & (rel >= 0) & (rel < gcap)

                if not raw:
                    # weighted (C>1) path: the verified v2 formulation —
                    # one [C,128]x[128,128] matmul per tile. The family
                    # rework (256-contraction, rolled LHS rows) hangs or
                    # faults the TPU worker for C>1 (bench_family_shapes
                    # c6); host asserts keep W==1 here.
                    wrow = w_buf[k:k + 1, g, :]
                    gs = g * _GROUP

                    def tile_v(t, rel=rel, v_rel=v_rel):
                        a1 = jnp.where(
                            ((rel - t * _GROUP) == cell_sub1) & v_rel,
                            1.0, 0.0,
                        )
                        return jax.lax.dot_general(
                            pbuf[t], a1,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=_GATHER_PRECISION,
                        )  # [C, pts_lane]

                    v = tile_v(t0) + tile_v(t0 + 1)
                    cur = out_ref[0, :, pl.ds(gs, _GROUP)]
                    out_ref[0, :, pl.ds(gs, _GROUP)] = cur + wrow * v

                    @pl.when(t1 > t0 + 1)
                    def _(t0=t0, t1=t1, gs=gs, wrow=wrow, tile_v=tile_v):
                        def body(t, _):
                            cur = out_ref[0, :, pl.ds(gs, _GROUP)]
                            out_ref[0, :, pl.ds(gs, _GROUP)] = (
                                cur + wrow * tile_v(t)
                            )
                            return 0

                        jax.lax.fori_loop(t0 + 2, t1 + 1, body, 0)

                    continue

                def fam_v(t, rel=rel, v_rel=v_rel):
                    # one-hot over a 2-tile (256-cell) window anchored at t
                    a1 = jnp.where(
                        ((rel - t * _GROUP) == cell_sub) & v_rel,
                        1.0, 0.0,
                    )  # [256 cells_sub, pts_lane] f32 (exact 0/1)
                    rows = []
                    for w in range(W):
                        q = w * sa
                        tw, ph = q // _GROUP, q % _GROUP
                        r3 = jnp.concatenate(
                            [pbuf[t + tw], pbuf[t + tw + 1],
                             pbuf[t + tw + 2]], axis=-1,
                        )  # [C, 384]
                        if ph:
                            # y[i] = x[i + ph]: slot w's cells sit ph lanes
                            # past the base slot's within its tile pair
                            r3 = pltpu.roll(r3, (-ph) % (3 * _GROUP),
                                            axis=1)
                        rows.append(r3[:, : 2 * _GROUP])
                    lhs = (rows[0] if W == 1
                           else jnp.concatenate(rows, axis=0))  # [W*C, 256]
                    # DEFAULT (one bf16 pass) would quantize sampled
                    # values to ~0.4%; HIGHEST keeps them bit-exact
                    # (Mosaic does not lower HIGH in-kernel)
                    return jax.lax.dot_general(
                        lhs, a1,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=_GATHER_PRECISION,
                    )  # [W*C, pts_lane]

                gs = g * _GROUP

                def accum(v, g=g, k=k):
                    # raw: each slot gets its own output channel
                    cur = out_ref[0, k * W:(k + 1) * W, pl.ds(gs, _GROUP)]
                    out_ref[0, k * W:(k + 1) * W,
                            pl.ds(gs, _GROUP)] = cur + v

                # common case: the group's base span fits the 2-tile window
                accum(fam_v(t0))

                @pl.when(t1 > t0 + 1)
                def _(t0=t0, t1=t1, fam_v=fam_v, accum=accum):
                    def body(i, _):
                        accum(fam_v(t0 + 2 + 2 * i))
                        return 0

                    # 2-tile steps cover (t0+1, t1]
                    jax.lax.fori_loop(0, (t1 - t0) // 2, body, 0)
        return 0

    jax.lax.fori_loop(0, npc, piece_body, 0)


@functools.partial(
    jax.jit, static_argnames=("offsets", "raw", "interpret", "family")
)
def sorted_corner_gather(
    table: jnp.ndarray,
    base_sorted: jnp.ndarray,
    weights: Optional[jnp.ndarray],
    offsets: Tuple[int, ...],
    raw: bool = False,
    interpret: bool = False,
    n_valid=None,
    family: Optional[Tuple[int, int]] = None,
) -> jnp.ndarray:
    """``out[m] = sum_d weights[m, d] * table[base_sorted[m] + offsets[d]]``
    (or, with ``raw=True`` and a [R, 1] table, the unweighted per-offset
    values ``out[m, d]``). ``base_sorted`` need not be strictly sorted —
    only *spatially local*: each 2048-point chunk's reads must span a
    bounded table window (per-chunk/group min/max bounds are computed
    host-side). table: [R, C] f32; weights: [M, len(offsets)] or None.

    ``n_valid`` (traced scalar or None): rows >= n_valid are pad slots
    whose output may be anything finite — chunks made entirely of them get
    their piece count clamped to 0 (output zeros, no table DMA, no
    matmuls). March buffers are mostly pad on typical scenes (the static
    budget covers worst-case rays), so this skip is worth ~the whole
    kernel cost; the caller must guarantee every consumer masks pad rows.
    """
    R, C = table.shape
    M = base_sorted.shape[0]
    D = len(offsets)
    if raw:
        assert C == 1 and weights is None
    if family is None:
        family = (1, 1)
    sa, W = family
    assert W >= 1 and sa >= 1 and D % W == 0, (sa, W, D)
    # family batching is raw-only: the weighted branch runs the verified
    # v2 per-offset formulation (the batched variant hangs/faults the TPU
    # worker for C>1 — scripts/bench_family_shapes.py c6; tz/ty/tx exact)
    assert raw or W == 1, "family batching requires raw mode"
    for k in range(D // W):
        for w in range(W):
            assert offsets[k * W + w] == offsets[k * W] + w * sa, \
                ("family structure violated", offsets, family)

    if not interpret and (jax.default_backend() != "tpu"
                          or M <= _GATHER_XLA_M):
        outs = []
        out = jnp.zeros((M, C), jnp.float32)
        for d in range(D):
            # clip: out-of-range corner reads carry zero weight, but
            # jnp.take's default fill mode would poison them with NaN
            idx_d = jnp.clip(base_sorted + offsets[d], 0, R - 1)
            vals = jnp.take(table, idx_d, axis=0)
            if raw:
                outs.append(vals[:, 0])
            else:
                out = out + weights[:, d:d + 1] * vals
        out = jnp.stack(outs, -1) if raw else out
        if n_valid is not None:
            # mirror the kernel's pad-chunk zeros (whole 2048-chunks past
            # n_valid) so both backends agree bitwise
            row_chunk = (jnp.arange(M) // _GCH) * _GCH
            out = jnp.where(row_chunk[:, None] >= n_valid, 0.0, out)
        return out

    m_pad = -(-M // _GCH) * _GCH
    nch = m_pad // _GCH
    idx_p = jnp.concatenate(
        [base_sorted.astype(jnp.int32),
         jnp.full((m_pad - M,), base_sorted[-1], jnp.int32)]
    )
    idx2d = idx_p.reshape(-1, _GROUP)
    if raw:
        w_p = jnp.zeros((1, m_pad // _GROUP, _GROUP), jnp.float32)
    else:
        w_p = jnp.pad(
            weights.astype(jnp.float32).T, ((0, 0), (0, m_pad - M))
        ).reshape(D, m_pad // _GROUP, _GROUP)  # [D, rows, 128] lane-major
    # the last piece's DMA reads [pstart, pstart + _GCAP + ext) where pstart
    # can reach cmax + span - 1 (npc = ceil((cmax + span - w0)/_GCAP)) and
    # ext covers the family-slot extension, so the table must be padded past
    # R by span + _GCAP + ext — anything less leaves out-of-bounds HBM reads
    span = max(offsets) + 2
    gcap = _GCAP_RAW if raw else _GCAP
    ext_t = ((W - 1) * sa) // _GROUP + 2
    r_pad = (-(-(R + span + gcap + (ext_t + 1) * _GROUP) // _GROUP)) \
        * _GROUP
    tbl_p = jnp.pad(table, ((0, r_pad - R), (0, 0))).reshape(
        r_pad // _GROUP, _GROUP, C
    ).transpose(0, 2, 1)  # [tiles, C, 128]: dynamic indexing on dim 0

    # per-group/chunk min-max bounds (locality, not sortedness)
    gmat = idx2d  # [rows, 128]
    gfirst = gmat.min(axis=1).reshape(nch, _GCH // _GROUP)
    glast = gmat.max(axis=1).reshape(nch, _GCH // _GROUP)
    cmin = gfirst.min(axis=1)
    cmax = glast.max(axis=1)
    w0 = jnp.clip((cmin // _GROUP) * _GROUP, 0, R)
    npc = jnp.clip(
        -(-(cmax + span - w0) // gcap), 0, 1 + (R + span) // gcap
    ).astype(jnp.int32)
    if n_valid is not None:
        chunk_start = jnp.arange(nch, dtype=jnp.int32) * _GCH
        npc = jnp.where(chunk_start >= n_valid, 0, npc)

    c_out = D if raw else C
    kernel = functools.partial(
        _gather_kernel_body, C, R, M, tuple(int(o) for o in offsets), raw,
        (sa, W), gcap,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=4,
            grid=(nch,),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(
                (1, c_out, _GCH), lambda c, *_: (c, 0, 0)
            ),
            scratch_shapes=[
                pltpu.VMEM((_GCH // _GROUP, _GROUP), jnp.int32),
                pltpu.VMEM((max(1, D if not raw else 1),
                            _GCH // _GROUP, _GROUP), jnp.float32),
                pltpu.VMEM((gcap // _GROUP + ext_t, C, _GROUP),
                           jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nch, c_out, _GCH), jnp.float32),
        interpret=interpret,
    )(w0.astype(jnp.int32), npc, gfirst, glast, idx2d, w_p, tbl_p)

    # [NCH, Cout, GCH] -> [M, Cout]
    return out.transpose(0, 2, 1).reshape(m_pad, c_out)[:M]


@jax.custom_vjp
def permute_rows(x, perm, inv_perm):
    """``x[perm]`` for a bijective ``perm``; the adjoint is the inverse
    gather (XLA would otherwise lower the transpose as a scatter)."""
    return jnp.take(x, perm, axis=0)


def _permute_rows_fwd(x, perm, inv_perm):
    return jnp.take(x, perm, axis=0), (perm, inv_perm)


def _permute_rows_bwd(res, ct):
    perm, inv_perm = res
    return (jnp.take(ct, inv_perm, axis=0), jnp.zeros_like(perm),
            jnp.zeros_like(inv_perm))


permute_rows.defvjp(_permute_rows_fwd, _permute_rows_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=())
def sorted_trilinear_sample(grid, pts_sorted, xyz_min, xyz_max,
                            n_valid=None):
    """Zeros-mode trilinear sample at points pre-sorted by base cell
    (ascending): the forward runs the chunk-major gather kernel, the
    backward the sorted splat with the sort skipped. The production path
    for the wide color/BRDF grids, whose march points arrive cell-sorted
    from the phase-2 compaction. Rows >= ``n_valid`` (the march's pad
    tail) return zeros via the chunk skip."""
    return _sorted_trilinear_sample_impl(grid, pts_sorted, xyz_min, xyz_max,
                                         n_valid)


def _sorted_trilinear_sample_impl(grid, pts_sorted, xyz_min, xyz_max,
                                  n_valid=None):
    from esrnerf_tpu.ops.grid import normalized_index

    X, Y, Z, C = grid.shape
    idx = normalized_index(pts_sorted, xyz_min, xyz_max, (X, Y, Z))
    i0 = jnp.floor(idx).astype(jnp.int32)
    base = (i0[:, 0] * Y + i0[:, 1]) * Z + i0[:, 2]
    size = jnp.array([X, Y, Z], jnp.int32)
    v0 = (i0 >= 0) & (i0 < size)
    v1 = (i0 + 1 >= 0) & (i0 + 1 < size)
    fx = idx[:, 0] - i0[:, 0]
    fy = idx[:, 1] - i0[:, 1]
    fz = idx[:, 2] - i0[:, 2]
    w = []
    for d in range(8):
        dx, dy, dz = d >> 2 & 1, d >> 1 & 1, d & 1
        ok = ((v1 if dx else v0)[:, 0] & (v1 if dy else v0)[:, 1]
              & (v1 if dz else v0)[:, 2])
        w.append((fx if dx else 1 - fx) * (fy if dy else 1 - fy)
                 * (fz if dz else 1 - fz) * ok)
    wts = jnp.stack(w, 1)  # [M, 8]
    offs = tuple((d >> 2 & 1) * Y * Z + (d >> 1 & 1) * Z + (d & 1)
                 for d in range(8))
    # contract: pts inside the bbox (march points are) => base >= 0;
    # corner reads past the last cell land in the kernel's zero padding
    # and carry zero weight anyway. NOTE: no family batching here — the
    # multi-row lane roll it needs for C>1 LHS rows crashes the TPU worker
    # (Mosaic fault, scripts/bench_family_shapes.py c6); family mode is
    # restricted to raw C=1 tables
    return sorted_corner_gather(grid.reshape(-1, C), base, wts, offs,
                                n_valid=n_valid)


def _sorted_trilinear_sample_fwd(grid, pts_sorted, xyz_min, xyz_max,
                                 n_valid=None):
    out = _sorted_trilinear_sample_impl(grid, pts_sorted, xyz_min, xyz_max,
                                        n_valid)
    return out, (grid.shape, pts_sorted, xyz_min, xyz_max, n_valid)


def _sorted_trilinear_sample_bwd(res, ct):
    grid_shape, pts, xyz_min, xyz_max, n_valid = res
    dgrid = trilinear_splat(
        grid_shape, pts, ct, xyz_min, xyz_max, assume_sorted=True,
        n_valid=n_valid,
    )
    return (dgrid, jnp.zeros_like(pts), jnp.zeros_like(xyz_min),
            jnp.zeros_like(xyz_max),
            None if n_valid is None else jnp.zeros_like(n_valid))


sorted_trilinear_sample.defvjp(
    _sorted_trilinear_sample_fwd, _sorted_trilinear_sample_bwd
)


@jax.custom_vjp
def sorted_trilinear_sample_multi(grids, pts_sorted, xyz_min, xyz_max,
                                  n_valid=None):
    """Sample SEVERAL same-resolution grids at the same cell-sorted points
    through ONE chunk-major gather: the kernel's cost is per-matmul-issue
    and independent of the channel count (PERF.md cost law), so k grids
    cost ~1 gather instead of k. ``grids`` is a tuple of [X,Y,Z,C_i]
    arrays; returns a tuple of [M, C_i] outputs.

    The backward splats each grid's cotangent slice SEPARATELY by default
    (three fold-capped 536 MB transients beat one 1.6 GB table on the
    HBM-tight PDRA double-batch step); set ``ESR_SPLAT_MULTI_BWD_CAP`` to
    a byte budget > the fused [n_cells, cpad(sum C_i)] table to fuse the
    backward sweeps too (one per-block sweep instead of k).

    Used by the LTS/PDRA fan-out where off_color/emo_color/brdf are all
    sampled at the march points (reference esrnerf.py:487-679 samples the
    k0 grids independently; the fusion is a TPU cost-law optimization with
    bitwise-identical results)."""
    return _sorted_trilinear_sample_multi_impl(
        grids, pts_sorted, xyz_min, xyz_max, n_valid
    )


def _sorted_trilinear_sample_multi_impl(grids, pts_sorted, xyz_min, xyz_max,
                                        n_valid=None):
    cat = jnp.concatenate(grids, -1)
    out = _sorted_trilinear_sample_impl(cat, pts_sorted, xyz_min, xyz_max,
                                        n_valid)
    splits = list(np.cumsum([g.shape[-1] for g in grids])[:-1])
    return tuple(jnp.split(out, splits, axis=-1))


def _sorted_trilinear_sample_multi_fwd(grids, pts_sorted, xyz_min, xyz_max,
                                       n_valid=None):
    out = _sorted_trilinear_sample_multi_impl(grids, pts_sorted, xyz_min,
                                              xyz_max, n_valid)
    return out, (tuple(g.shape for g in grids), pts_sorted, xyz_min, xyz_max,
                 n_valid)


def _sorted_trilinear_sample_multi_bwd(res, cts):
    import os

    shapes, pts, xyz_min, xyz_max, n_valid = res
    n_cells = shapes[0][0] * shapes[0][1] * shapes[0][2]
    cap = int(os.environ.get("ESR_SPLAT_MULTI_BWD_CAP", 0))
    cpad = lambda c: -(-c // 8) * 8

    # greedy-group adjacent grids while the fused fold=1 shear table fits
    # the byte budget; default budget 0 => every grid splats alone (the
    # memory-neutral configuration)
    groups, cur, cur_c = [], [], 0
    for i, sh in enumerate(shapes):
        c = sh[3]
        if cur and n_cells * cpad(cur_c + c) * 4 > cap:
            groups.append(cur)
            cur, cur_c = [], 0
        cur.append(i)
        cur_c += c
    groups.append(cur)

    dgrids = [None] * len(shapes)
    for grp in groups:
        ct_g = (cts[grp[0]] if len(grp) == 1
                else jnp.concatenate([cts[i] for i in grp], -1))
        c_g = sum(shapes[i][3] for i in grp)
        dg = trilinear_splat(
            (*shapes[grp[0]][:3], c_g), pts, ct_g, xyz_min, xyz_max,
            assume_sorted=True, n_valid=n_valid,
        )
        if len(grp) == 1:
            dgrids[grp[0]] = dg
        else:
            off = 0
            for i in grp:
                dgrids[i] = dg[..., off:off + shapes[i][3]]
                off += shapes[i][3]

    return (tuple(dgrids), jnp.zeros_like(pts), jnp.zeros_like(xyz_min),
            jnp.zeros_like(xyz_max),
            None if n_valid is None else jnp.zeros_like(n_valid))


sorted_trilinear_sample_multi.defvjp(
    _sorted_trilinear_sample_multi_fwd, _sorted_trilinear_sample_multi_bwd
)


def displaced_taps_splat(
    grid_shape: Sequence[int],
    pts: jnp.ndarray,
    ct: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    displace: Tuple[float, ...],
    n_valid=None,
) -> jnp.ndarray:
    """Adjoint of :func:`esrnerf_tpu.ops.grid.displaced_taps`: splat the
    [M, 6, D] tap cotangents into a zero [X,Y,Z,1] grid.

    Per axis, the window-packed taps become 2 sorted streams (the db
    corner) x 2W channels (dc corner x window slot), un-folded by a shear
    pass — the same structure as :func:`trilinear_splat`.
    """
    from esrnerf_tpu.ops.grid import _window_geometry

    X, Y, Z, _ = grid_shape
    n_cells = X * Y * Z
    strides = (Y * Z, Z, 1)

    per_axis = _window_geometry((X, Y, Z), pts, xyz_min, xyz_max, displace)
    dflat = jnp.zeros((n_cells,), jnp.float32)

    # ct layout: axis order z, y, x (pairs -,+) — grid.displaced_taps
    for k, g in enumerate((per_axis[2], per_axis[1], per_axis[0])):
        W = g["W"]
        sa, sb, sc = strides[g["a"]], strides[g["b"]], strides[g["c"]]
        ct_a = ct[:, 2 * k:2 * k + 2, :]  # [M, 2, D]
        j = jnp.arange(W)
        wj = ((j == g["rel"][..., None]) * (1.0 - g["fq"][..., None])
              + (j == (g["rel"][..., None] + 1)) * g["fq"][..., None])
        slot = jnp.einsum("msd,msdw->mw", ct_a, wj)  # [M, W]

        base = g["i0b"] * sb + g["i0c"] * sc + g["w0"] * sa
        if n_valid is not None:
            # rows >= n_valid are march pad slots (zero cotangents): key
            # them to the sentinel so they sort last and fall outside every
            # block's update range — by ROW index, so eps-perturbed pad
            # points are still excluded
            base = jnp.where(
                jnp.arange(base.shape[0], dtype=jnp.int32)
                >= jnp.asarray(n_valid, jnp.int32),
                _PAD_SENTINEL, base,
            )
        base_s, order = jax.lax.sort_key_val(
            base, jnp.arange(base.shape[0], dtype=jnp.int32)
        )
        packed = jnp.concatenate(
            [slot, g["fb"][:, None], g["fc"][:, None]], -1
        )[order]  # one row gather for all sort payloads
        slot_s = packed[:, :W]
        fb_s, fc_s = packed[:, W], packed[:, W + 1]

        shifts = [dc * sc + jj * sa for dc in (0, 1) for jj in range(W)]
        pad = max(shifts) + 2
        vals = []
        for db in (0, 1):
            wb = jnp.where(db, fb_s, 1 - fb_s)
            chan = []
            for dc in (0, 1):
                wc = jnp.where(dc, fc_s, 1 - fc_s)
                chan.append(slot_s.T * (wb * wc)[None, :])  # [W, M]
            vals.append(jnp.concatenate(chan, axis=0))  # [2W, M]
        vals = jnp.stack(vals, 0)  # [2, 2W, M]

        out2 = sorted_streams_splat(
            base_s + pad, vals, (0, sb), n_cells + 2 * pad
        )
        dflat = dflat + shear_combine(out2, shifts, n_cells, 1, pad)[:, 0]

    return dflat.reshape(X, Y, Z, 1)


def splat_oracle(base, vals, offsets, n_cells):
    """Numpy oracle for tests."""
    S, C, M = vals.shape
    out = np.zeros((n_cells, C), np.float64)
    for s in range(S):
        idx = np.asarray(base) + offsets[s]
        ok = (idx >= 0) & (idx < n_cells)
        np.add.at(out, idx[ok], np.asarray(vals)[s, :, ok])
    return out.astype(np.float32)


# ---------------------------------------------------------------------------
# Trilinear corner-splat: the grid_sample_3d backward expressed as 2 sorted
# x-corner streams over one point sort, with the (dy, dz) corners folded
# into kernel channels and un-folded by a dense shear-add afterwards (a
# channel-k value written at cell n means "add to cell n + shift_k"; the
# shear is a few shifted full-table adds at memory bandwidth, far cheaper
# than 4x the per-update kernel work).
# ---------------------------------------------------------------------------


def shear_combine(out2: jnp.ndarray, shifts: Sequence[int],
                  n_cells: int, C: int, pad: int) -> jnp.ndarray:
    """Un-fold a channel-folded table: channel-k's value at padded row r
    belongs to cell ``r - pad + shifts[k]``. Returns [n_cells, C]:
    ``result[n, c] = sum_k out2[n + pad - shifts[k], k*C + c]``."""
    acc = jnp.zeros((n_cells, C), out2.dtype)
    for k, sh in enumerate(shifts):
        lo = pad - sh
        acc = acc + out2[lo:lo + n_cells, k * C:(k + 1) * C]
    return acc


def trilinear_splat(
    grid_shape: Sequence[int],
    pts: jnp.ndarray,
    ct: jnp.ndarray,
    xyz_min: jnp.ndarray,
    xyz_max: jnp.ndarray,
    fold: Optional[int] = None,
    assume_sorted: bool = False,
    n_valid=None,
) -> jnp.ndarray:
    """Adjoint of zeros-mode trilinear sampling: splat per-point cotangents
    ``ct [M, C]`` at ``pts [M, 3]`` into a zero grid of ``grid_shape``
    ([X,Y,Z,C]). Equals ``grid_sample_3d_impl``'s grid-gradient.

    ``fold`` of the 8 corners ride as kernel channels (fewer, cheaper
    streams; bigger [n_cells, fold*C] shear table). Default: all 8 for
    small C, 4 for wide color grids — then halved until the transient
    [n_cells, cpad(fold*C)] table fits ``ESR_SPLAT_TABLE_CAP`` bytes
    (default 700 MB). At 256^3 a C=6 color grid with fold=4 makes a
    1.5 GB table; several such backward splats scheduled concurrently
    OOM'd the 16 GB chip on the LTS step. fold=1 means every corner is
    its own stream (C channels, no shear pass).
    ``assume_sorted`` skips the cell sort (march phase-2 points arrive
    pre-sorted).
    """
    import os

    from esrnerf_tpu.ops.grid import normalized_index

    X, Y, Z, C = grid_shape
    n_cells = X * Y * Z
    if fold is None:
        fold = 8 if C <= 2 else 4
        cap = int(os.environ.get("ESR_SPLAT_TABLE_CAP", 700 * 2**20))
        cpad = lambda c: -(-c // 8) * 8
        while fold > 1 and n_cells * cpad(fold * C) * 4 > cap:
            fold //= 2
    assert fold in (1, 2, 4, 8)

    idx = normalized_index(pts, xyz_min, xyz_max, (X, Y, Z))
    i0 = jnp.floor(idx).astype(jnp.int32)
    base = (i0[:, 0] * Y + i0[:, 1]) * Z + i0[:, 2]

    size = jnp.array([X, Y, Z], jnp.int32)
    v0 = (i0 >= 0) & (i0 < size)
    v1 = (i0 + 1 >= 0) & (i0 + 1 < size)
    fx, fy, fz = idx[:, 0] - i0[:, 0], idx[:, 1] - i0[:, 1], idx[:, 2] - i0[:, 2]

    # one [M, 8C] value matrix in unsorted order, permuted by a single row
    # gather after the key sort (TPU gathers are row-count-bound: one wide
    # gather beats one per payload)
    w = []
    for d in range(8):
        dx, dy, dz = d >> 2 & 1, d >> 1 & 1, d & 1
        ok = ((v1 if dx else v0)[:, 0] & (v1 if dy else v0)[:, 1]
              & (v1 if dz else v0)[:, 2])
        w.append(
            (fx if dx else 1 - fx) * (fy if dy else 1 - fy)
            * (fz if dz else 1 - fz) * ok
        )
    wts = jnp.stack(w, 1)  # [M, 8] corner order d = dx*4+dy*2+dz
    vals_mat = (wts[:, :, None] * ct[:, None, :]).reshape(-1, 8 * C)

    if assume_sorted:
        base_s, vals_s = base, vals_mat
    else:
        base_s, order = jax.lax.sort_key_val(
            base, jnp.arange(base.shape[0], dtype=jnp.int32)
        )
        vals_s = vals_mat[order]  # [M, 8C]

    # corners split into S streams (leading bits of d) x `fold` channels
    S = 8 // fold
    offs_all = [(d >> 2 & 1) * Y * Z + (d >> 1 & 1) * Z + (d & 1)
                for d in range(8)]
    stream_offs = tuple(offs_all[s * fold] for s in range(S))
    shifts = [offs_all[c] for c in range(fold)]  # relative within a stream
    pad = max(shifts) + 2

    vals = vals_s.reshape(-1, S, fold * C).transpose(1, 2, 0)  # [S, fC, M]
    # n_valid only survives the skipped sort when the updates keep their
    # row order (assume_sorted); a key sort would scatter the pad tail
    out2 = sorted_streams_splat(
        base_s + pad, vals, stream_offs, n_cells + 2 * pad,
        n_valid=n_valid if assume_sorted else None,
    )
    flat = shear_combine(out2, shifts, n_cells, C, pad)
    return flat.reshape(X, Y, Z, C)
