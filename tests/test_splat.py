"""Oracle tests for the sorted-stream splat (ops/splat.py)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from esrnerf_tpu.ops import splat as splatops
from esrnerf_tpu.ops import grid as gridops

pytestmark = pytest.mark.quick


def _mk_streams(rng, M, S, C, n_cells, spread):
    base = np.sort(rng.integers(-4, spread, size=M)).astype(np.int32)
    vals = rng.standard_normal((S, C, M)).astype(np.float32)
    offsets = tuple(int(o) for o in rng.integers(0, 300, size=S))
    # contract: zero vals where target out of range
    for s in range(S):
        idx = base + offsets[s]
        bad = (idx < 0) | (idx >= n_cells)
        vals[s, :, bad] = 0.0
    return base, vals, offsets


@pytest.mark.parametrize("M,S,C,n_cells", [
    (1000, 8, 1, 5000),
    (3000, 3, 6, 70000),
    (17, 2, 2, 40000),
])
def test_splat_matches_oracle_fallback(M, S, C, n_cells):
    rng = np.random.default_rng(0)
    base, vals, offsets = _mk_streams(rng, M, S, C, n_cells, n_cells)
    out = splatops.sorted_streams_splat(
        jnp.asarray(base), jnp.asarray(vals), offsets, n_cells
    )
    ref = splatops.splat_oracle(base, vals, offsets, n_cells)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-5, atol=1e-5)


def test_splat_kernel_interpret():
    """The Pallas kernel itself (interpret mode) against the oracle."""
    rng = np.random.default_rng(1)
    n_cells = 130 * 128 + 17  # force padding + several blocks
    base, vals, offsets = _mk_streams(rng, 2500, 4, 3, n_cells, n_cells)
    out = splatops.sorted_streams_splat(
        jnp.asarray(base), jnp.asarray(vals), offsets, n_cells,
        block_tiles=16, interpret=True,
    )
    ref = splatops.splat_oracle(base, vals, offsets, n_cells)
    # the kernel carries values as a bf16 hi+lo split (~16 mantissa bits)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


def test_splat_kernel_interpret_8_streams():
    """fold=1 shape: 8 single-corner streams, C channels, no shear —
    the big-grid memory mode (ESR_SPLAT_TABLE_CAP) of trilinear_splat."""
    rng = np.random.default_rng(7)
    n_cells = 40 * 128 + 5
    base = np.sort(rng.integers(0, n_cells - 600, 2500)).astype(np.int32)
    vals = rng.standard_normal((8, 6, 2500)).astype(np.float32)
    offsets = (0, 1, 17, 18, 550, 551, 567, 568)
    out = splatops.sorted_streams_splat(
        jnp.asarray(base), jnp.asarray(vals), offsets, n_cells,
        block_tiles=16, interpret=True,
    )
    ref = splatops.splat_oracle(base, vals, offsets, n_cells)
    np.testing.assert_allclose(np.asarray(out), ref, rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("fold", [1, 2, 4])
def test_trilinear_splat_fold_parity(fold):
    """Every fold (incl. the fold=1 big-grid memory mode) matches fold=8."""
    rng = np.random.default_rng(11)
    shape = (12, 10, 9, 6)
    pts = (rng.uniform(-1, 1, (500, 3)).astype(np.float32) * 1.2)
    ct = rng.standard_normal((500, 6)).astype(np.float32)
    mn, mx = jnp.asarray([-1.0, -1, -1]), jnp.asarray([1.0, 1, 1])
    ref = splatops.trilinear_splat(shape, jnp.asarray(pts), jnp.asarray(ct),
                                   mn, mx, fold=8)
    out = splatops.trilinear_splat(shape, jnp.asarray(pts), jnp.asarray(ct),
                                   mn, mx, fold=fold)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_trilinear_splat_is_grid_sample_adjoint():
    rng = np.random.default_rng(2)
    shape = (9, 8, 7, 3)
    pts = rng.uniform(-0.1, 1.1, size=(400, 3)).astype(np.float32)
    ct = rng.standard_normal((400, 3)).astype(np.float32)
    mn = jnp.zeros(3)
    mx = jnp.ones(3)

    grad = splatops.trilinear_splat(
        shape, jnp.asarray(pts), jnp.asarray(ct), mn, mx
    )

    g0 = jnp.zeros(shape)
    _, vjp = jax.vjp(
        lambda g: gridops.grid_sample_3d_impl(g, jnp.asarray(pts), mn, mx), g0
    )
    (want,) = vjp(jnp.asarray(ct))
    np.testing.assert_allclose(np.asarray(grad), np.asarray(want),
                               rtol=2e-4, atol=2e-5)


def test_sorted_corner_gather_interpret():
    rng = np.random.default_rng(5)
    R, C, M = 3000, 3, 700
    table = rng.standard_normal((R, C)).astype(np.float32)
    offsets = (0, 1, 17, 18, 289, 290, 306, 307)
    base = np.sort(rng.integers(0, R - 310, size=M)).astype(np.int32)
    w = rng.standard_normal((M, 8)).astype(np.float32)
    out = splatops.sorted_corner_gather(
        jnp.asarray(table), jnp.asarray(base), jnp.asarray(w), offsets,
        interpret=True,
    )
    want = sum(w[:, d:d+1] * table[base + offsets[d]] for d in range(8))
    np.testing.assert_allclose(np.asarray(out), want, rtol=5e-4, atol=5e-4)


def test_sorted_trilinear_sample_matches_grid_sample():
    rng = np.random.default_rng(6)
    shape = (14, 11, 9, 5)
    grid = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    # include exact-boundary and near-edge points: corner reads past the
    # table end must not poison the result (NaN-fill regression)
    pts = rng.uniform(0.001, 0.999, size=(600, 3)).astype(np.float32)
    pts[:10] = 1.0
    pts[10:20] = 0.0
    pts[20:30] = 0.999999
    mn, mx = jnp.zeros(3), jnp.ones(3)
    # sort by base cell as the march would
    idx = np.floor(pts * (np.array(shape[:3]) - 1)).astype(np.int64)
    base = (idx[:, 0] * shape[1] + idx[:, 1]) * shape[2] + idx[:, 2]
    pts = jnp.asarray(pts[np.argsort(base)])

    out, vjp = jax.vjp(
        lambda g: splatops.sorted_trilinear_sample(g, pts, mn, mx), grid)
    want, vjp_ref = jax.vjp(
        lambda g: gridops.grid_sample_3d_impl(g, pts, mn, mx), grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(want),
                               rtol=1e-5, atol=1e-5)
    ct = jnp.asarray(rng.standard_normal(out.shape).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(vjp(ct)[0]), np.asarray(vjp_ref(ct)[0]),
        rtol=2e-4, atol=2e-5,
    )


@pytest.mark.parametrize("bwd_cap", [0, 10**9])
def test_sorted_trilinear_sample_multi_matches_separate(bwd_cap,
                                                        monkeypatch):
    """The fused multi-grid gather (one kernel sweep for off/emo/brdf)
    must match per-grid sorted_trilinear_sample in both the forward and
    the per-grid backward splats — under the default split backward AND
    the ESR_SPLAT_MULTI_BWD_CAP fused backward."""
    monkeypatch.setenv("ESR_SPLAT_MULTI_BWD_CAP", str(bwd_cap))
    rng = np.random.default_rng(11)
    shape3 = (10, 9, 8)
    widths = (5, 3, 6)
    grids = tuple(
        jnp.asarray(rng.standard_normal((*shape3, c)).astype(np.float32))
        for c in widths
    )
    pts = rng.uniform(0.001, 0.999, size=(500, 3)).astype(np.float32)
    idx = np.floor(pts * (np.array(shape3) - 1)).astype(np.int64)
    base = (idx[:, 0] * shape3[1] + idx[:, 1]) * shape3[2] + idx[:, 2]
    pts = jnp.asarray(pts[np.argsort(base)])
    mn, mx = jnp.zeros(3), jnp.ones(3)
    n_valid = jnp.int32(470)  # exercise the pad-chunk contract too

    outs, vjp = jax.vjp(
        lambda gs: splatops.sorted_trilinear_sample_multi(
            gs, pts, mn, mx, n_valid),
        grids,
    )
    cts = tuple(
        jnp.asarray(rng.standard_normal(o.shape).astype(np.float32))
        for o in outs
    )
    (dgrids,) = vjp(cts)

    for g, o, ct, dg in zip(grids, outs, cts, dgrids):
        want, vjp_ref = jax.vjp(
            lambda gg: splatops.sorted_trilinear_sample(
                gg, pts, mn, mx, n_valid),
            g,
        )
        np.testing.assert_allclose(np.asarray(o), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)
        np.testing.assert_allclose(
            np.asarray(dg), np.asarray(vjp_ref(ct)[0]),
            rtol=2e-4, atol=2e-5,
        )


def test_sorted_gather_raw_and_unsorted_locality():
    """raw=True returns per-offset values; order only needs locality."""
    rng = np.random.default_rng(7)
    R, M = 5000, 700
    table = rng.standard_normal((R, 1)).astype(np.float32)
    offsets = (0, 3, 7, 450, 900)
    # locally-shuffled (non-sorted) base
    base = np.sort(rng.integers(0, R - 901, size=M)).astype(np.int32)
    sh = rng.permutation(M) % 64
    base = base[np.argsort(np.arange(M) + sh * 3)]
    out = splatops.sorted_corner_gather(
        jnp.asarray(table), jnp.asarray(base), None, offsets,
        raw=True, interpret=True,
    )
    want = np.stack([table[base + o, 0] for o in offsets], -1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("sa,W,C,weighted", [
    (1, 1, 6, True),      # weighted per-offset path (family is raw-only:
                          # the batched variant faults the TPU worker)
    (1, 6, 1, False),     # z-axis tap window
    (130, 6, 1, False),   # y-axis-like stride: crosses tiles, phase = w*2
    (66049, 6, 1, False), # x-axis-like stride: multi-piece extension
])
@pytest.mark.full
def test_sorted_gather_family_matches_flat(sa, W, C, weighted):
    """family=(sa, W) batched matmuls == per-offset oracle, incl. strides
    larger than a tile and larger than a piece (ext_t DMA extension)."""
    rng = np.random.default_rng(11)
    R = 400000
    M = 4096  # 2 chunks (kernel path forced via interpret=True)
    K = 4
    corners = rng.integers(0, 900, size=K)
    offsets = tuple(int(c) + w * sa for c in corners for w in range(W))
    hi = R - max(offsets) - 2
    # locally-sorted base with a wide-span group thrown in
    base = np.sort(rng.integers(0, hi, size=M)).astype(np.int32)
    base[111] = 0  # widen one group's span past 2 tiles
    base.sort()
    table = rng.standard_normal((R, C)).astype(np.float32)
    w = (rng.standard_normal((M, K * W)).astype(np.float32)
         if weighted else None)
    out = splatops.sorted_corner_gather(
        jnp.asarray(table), jnp.asarray(base),
        None if w is None else jnp.asarray(w),
        offsets, raw=not weighted, interpret=True, family=(sa, W),
    )
    if weighted:
        want = sum(w[:, d:d + 1] * table[base + offsets[d]]
                   for d in range(K * W))
    else:
        want = np.stack([table[base + o, 0] for o in offsets], -1)
    np.testing.assert_allclose(np.asarray(out), want, rtol=5e-4, atol=5e-4)


@pytest.mark.full
def test_sorted_gather_family_n_valid_chunk_skip():
    rng = np.random.default_rng(12)
    R, M, W, sa = 300000, 6144, 6, 130
    corners = (0, 257, 66049, 66306)
    offsets = tuple(c + w * sa for c in corners for w in range(W))
    base = np.sort(rng.integers(0, R - max(offsets) - 2, size=M))
    base = base.astype(np.int32)
    table = rng.standard_normal((R, 1)).astype(np.float32)
    n_valid = jnp.int32(2048 + 7)  # chunk 0 full, chunk 1 partial, 2 pad
    out = splatops.sorted_corner_gather(
        jnp.asarray(table), jnp.asarray(base), None, offsets,
        raw=True, interpret=True, family=(sa, W), n_valid=n_valid,
    )
    want = np.stack([table[base + o, 0] for o in offsets], -1)
    np.testing.assert_allclose(np.asarray(out)[:4096], want[:4096],
                               rtol=5e-4, atol=5e-4)
    assert np.all(np.asarray(out)[4096:] == 0.0)
