"""March pipeline invariants: the static-budget compaction must be a pure
re-layout — ray-marched outputs computed from the compacted [K] buffers must
equal the same reduction done on the dense [N,S] grid, for both filter
styles."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from esrnerf_tpu.config import load_cfg
from esrnerf_tpu.models.voxurf_base import VoxurfGeometry, make_mask_cache
from esrnerf_tpu.ops import render as renderops

import os

pytestmark = pytest.mark.quick

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture(scope="module")
def geo():
    cfg = load_cfg(
        "cfg/app/coarse.yaml",
        ["app.phase=train", "data.cls=x", "data.root=x", "data.scene=x",
         "app.model.num_voxels=8000"],
        root_dir=REPO,
    )
    rng = np.random.default_rng(0)
    density = np.where(
        rng.uniform(size=(12, 12, 12, 1)) > 0.4, 20.0, -20.0
    ).astype(np.float32)
    mask_cache = make_mask_cache(density, [-1, -1, -1], [1, 1, 1], 1e-6,
                                 1e-3, 3)
    return VoxurfGeometry(cfg, 0.5, 4.0, [-1, -1, -1], [1, 1, 1], mask_cache)


def random_rays(n, seed=0):
    rng = np.random.default_rng(seed)
    o = rng.normal(size=(n, 3)).astype(np.float32)
    o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2
    d = (rng.normal(scale=0.4, size=(n, 3)).astype(np.float32) - o)
    vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d), jnp.asarray(vd)


@pytest.mark.parametrize("style", ["coarse", "fine"])
def test_compaction_preserves_reductions(geo, style):
    rng = np.random.default_rng(1)
    sdf_grid = jnp.asarray(
        rng.normal(scale=0.3, size=(*geo.world_size, 1)).astype(np.float32)
    )
    N = 24
    ro, rd, vd = random_rays(N)
    s_val = 25.0
    thres = 1e-4

    m = geo.march(sdf_grid, ro, rd, vd, s_val, thres, "interp", style=style)
    assert float(m.overflow) == 0.0, "budget too small for the test"

    # dense reference: same masked pipeline without compaction
    rs = geo.sample_dense(ro, rd)
    mask = rs.valid & geo.mask_cache.query(rs.pts)
    sdf = geo.sample_grid(sdf_grid, rs.pts)[..., 0]
    alpha = renderops.neus_alpha_interp(sdf, mask, s_val)
    if style == "fine":
        pre = mask & (alpha > thres)
        a1 = jnp.where(pre, alpha, 0.0)
        w1, last = renderops.alpha2weights(a1, pre)
        keep = w1 > thres
        weights = jnp.where(keep, w1, 0.0)
    else:
        w1, _ = renderops.alpha2weights(alpha, mask)
        keep = w1 > thres
        a2 = jnp.where(keep, alpha, 0.0)
        weights, last = renderops.alpha2weights(a2, keep)

    # compare: weighted reduction of an arbitrary per-point field
    field_dense = jnp.sin(rs.pts * 3.0)  # [N,S,3]
    ray_sum_dense = (weights[..., None] * field_dense).sum(1)

    field_c = jnp.sin(m.pts * 3.0)
    ray_sum_compact = geo.segment_to_rays(m, field_c)

    np.testing.assert_allclose(
        np.asarray(ray_sum_compact), np.asarray(ray_sum_dense),
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(m.alphainv_last), np.asarray(last), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(m.cum_weights), np.asarray(weights.sum(1)),
        rtol=1e-5, atol=1e-6,
    )


def test_march_pad_tail_keeps_base_ascending(geo):
    """Regression (round-1 advisor high finding): pad rows used to carry
    pts1[K1-1] — an arbitrary cell — so after the cell sort March.pts had a
    non-ascending constant tail, corrupting sorted_trilinear_sample's
    searchsorted-based splat backward (silently dropped real gradient
    updates). Pads must collapse onto the last real (max-cell) row so the
    base-cell sequence stays weakly ascending end to end."""
    from esrnerf_tpu.ops.grid import normalized_index

    rng = np.random.default_rng(3)
    sdf_grid = jnp.asarray(
        rng.normal(scale=0.3, size=(*geo.world_size, 1)).astype(np.float32)
    )
    N = 24
    ro, rd, vd = random_rays(N, seed=3)
    # generous budget => a long pad tail (the failing configuration)
    m = geo.march(sdf_grid, ro, rd, vd, 25.0, 1e-4, "interp",
                  k_budget=N * geo.points_per_ray * 2, style="coarse")
    assert float(m.overflow) == 0.0
    assert bool(np.asarray(m.pad).any()), "test needs a pad tail"

    X, Y, Z = geo.world_size
    ind = normalized_index(
        m.pts, jnp.asarray(geo.xyz_min), jnp.asarray(geo.xyz_max), (X, Y, Z)
    )
    i0 = np.floor(np.asarray(ind)).astype(np.int64)
    base = (i0[:, 0] * Y + i0[:, 1]) * Z + i0[:, 2]
    assert np.all(np.diff(base) >= 0), "March.pts base cells must ascend"
    # pads occupy exactly one cell (locality: no grid-spanning tail)
    pad = np.asarray(m.pad)
    assert np.unique(base[pad]).size == 1


def test_overflow_reported(geo):
    """With a tiny budget the march must report the dropped fraction."""
    rng = np.random.default_rng(2)
    sdf_grid = jnp.asarray(
        rng.normal(scale=0.1, size=(*geo.world_size, 1)).astype(np.float32)
    )
    ro, rd, vd = random_rays(16)
    m = geo.march(sdf_grid, ro, rd, vd, 25.0, 1e-4, "interp",
                  k_budget=8, style="coarse")
    assert float(m.overflow) > 0.0


def test_surf_band_cull_parity(geo):
    """Band cull (surf_band_factor) changes per-ray renders by at most the
    e^-factor alpha-tail bound; culled samples are only far-field ones."""
    import copy

    rng = np.random.default_rng(3)
    X = Y = Z = 20
    x, y, z = np.mgrid[-1:1:X * 1j, -1:1:Y * 1j, -1:1:Z * 1j]
    sdf = ((x**2 + y**2 + z**2) ** 0.5 - 0.6).astype(np.float32)[..., None]
    sdf_j = jnp.asarray(sdf)
    o, d, vd = random_rays(64, seed=4)
    s_val = 80.0

    def run(band):
        g = copy.copy(geo)
        g.surf_band_factor = band
        m = g.march(sdf_j, o, d, vd, s_val, 1e-4, "interp", style="fine")
        rgbish = jax.ops.segment_sum(
            m.weights * m.sdf, m.ray_id, num_segments=m.n_rays + 1
        )[:64]
        return m, rgbish

    m0, r0 = run(0.0)
    m1, r1 = run(14.0)
    # cum per-ray weights and the weighted reduction agree to the tail bound
    np.testing.assert_allclose(np.asarray(m1.cum_weights),
                               np.asarray(m0.cum_weights), atol=5e-4)
    np.testing.assert_allclose(np.asarray(r1), np.asarray(r0), atol=5e-4)
    np.testing.assert_allclose(np.asarray(m1.alphainv_last),
                               np.asarray(m0.alphainv_last), atol=5e-4)
    # the cull actually drops phase-1 candidates on this scene (phase-2
    # survivors are near-surface and must be unaffected, checked above)
    rs = geo.sample_dense(o, d)
    occ = geo.band_occ64(sdf_j, s_val)
    n_band = int((rs.valid & geo.query_nearest64(occ, rs.pts)).sum())
    n_plain = int((rs.valid & geo.mask_cache.query_nearest(rs.pts)).sum())
    assert n_band < n_plain


@pytest.mark.parametrize("band", [14.0, 0.0])
def test_phase1_block_bit_parity(geo, band):
    """Block-granular phase 1 (phase1_block=8: block-center coarse test +
    per-sample re-test on the compacted list) must produce the IDENTICAL
    March as the dense per-sample path — same survivor set, same order,
    same values — whenever neither budget truncates. band=0 exercises the
    no-band variant (block-dilated occ_sup instead of the band mask)."""
    import copy

    X = Y = Z = 20
    x, y, z = np.mgrid[-1:1:X * 1j, -1:1:Y * 1j, -1:1:Z * 1j]
    sdf = ((x**2 + y**2 + z**2) ** 0.5 - 0.6).astype(np.float32)[..., None]
    sdf_j = jnp.asarray(sdf)
    o, d, vd = random_rays(48, seed=9)
    s_val = 80.0

    def run(blk):
        g = copy.copy(geo)
        g.surf_band_factor = band
        g.phase1_block = blk
        g._rebuild_mask_blk()
        return g.march(sdf_j, o, d, vd, s_val, 1e-4, "interp", style="fine")

    m1 = run(1)
    m8 = run(8)
    assert float(m1.overflow) == 0.0 and float(m8.overflow) == 0.0
    assert int(m1.n_valid) == int(m8.n_valid)
    nv = int(m1.n_valid)
    for field in ("pts", "ray_id", "step_id", "weights", "alpha", "sdf"):
        a = np.asarray(getattr(m1, field))[:nv]
        b = np.asarray(getattr(m8, field))[:nv]
        np.testing.assert_array_equal(a, b, err_msg=field)
    np.testing.assert_array_equal(np.asarray(m1.alphainv_last),
                                  np.asarray(m8.alphainv_last))
    np.testing.assert_array_equal(np.asarray(m1.cum_weights),
                                  np.asarray(m8.cum_weights))


def test_march_ray_slots_regroups_march(geo):
    """march_ray_slots == the march's surviving rows grouped per ray (the
    relight fine-tune precompute must be a pure re-layout)."""
    rng = np.random.default_rng(5)
    X = Y = Z = 20
    x, y, z = np.mgrid[-1:1:X * 1j, -1:1:Y * 1j, -1:1:Z * 1j]
    sdf = ((x**2 + y**2 + z**2) ** 0.5 - 0.6).astype(np.float32)[..., None]
    sdf_j = jnp.asarray(sdf)
    o, d, vd = random_rays(32, seed=6)
    ppr = 24

    m = geo.march(sdf_j, o, d, vd, 80.0, 1e-4, "interp", style="fine")
    pts, valid, (counts, dropped) = geo.march_ray_slots(
        sdf_j, o, d, vd, 80.0, 1e-4, "interp", ppr
    )
    assert pts.shape == (32, ppr, 3) and valid.shape == (32, ppr)

    rid = np.asarray(m.ray_id)
    mpts = np.asarray(m.pts)
    pad = np.asarray(m.pad)
    got_p, got_v = np.asarray(pts), np.asarray(valid)
    total_dropped = 0
    for r in range(32):
        rows = mpts[(rid == r) & ~pad]
        n = min(len(rows), ppr)
        total_dropped += max(len(rows) - ppr, 0)
        assert got_v[r, :n].all() and not got_v[r, n:].any(), r
        # same point SET per ray (slot order = cell-sorted march order)
        np.testing.assert_allclose(
            np.sort(got_p[r, :n], axis=0), np.sort(rows[:n], axis=0),
            rtol=1e-6, atol=1e-6,
        )
    want_counts = np.asarray(
        [int(((rid == r) & ~pad).sum()) for r in range(32)])
    np.testing.assert_array_equal(np.asarray(counts), want_counts)
    np.testing.assert_array_equal(
        np.asarray(dropped), np.maximum(want_counts - ppr, 0))
    assert total_dropped == int(np.asarray(dropped).sum())
