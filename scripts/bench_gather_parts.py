"""Decisive component breakdown of the piece-sweep gather kernel: DMA-only
vs +LHS-build vs +matmul, at the exact per-piece shapes of the 24-offset tap
call (C=1 table, family (1,6), 4 families x 16 groups per piece).

Each variant runs the same fori piece loop (64 pieces x fixed work), so
ms/piece isolates the component costs. float() transfer to sync.
"""

import functools
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

GROUP = 128
GCAP = 98304
NCAP_T = GCAP // GROUP
EXT_T = 2
NPIECE = 64
W = 6
K = 4
PREC = jax.lax.Precision.HIGHEST


def body(mode, prec, tbl_hbm, out_ref, pbuf, sems):
    out_ref[...] = jnp.zeros_like(out_ref)
    cell_sub = jax.lax.broadcasted_iota(jnp.int32, (2 * GROUP, GROUP), 0)
    row = jax.lax.broadcasted_iota(jnp.int32, (1, GROUP), 1) * 3

    def piece(p, _):
        cp = pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(p * NCAP_T, NCAP_T + EXT_T), :, :],
            pbuf, sems,
        )
        cp.start()
        cp.wait()
        if mode == "dma":
            return 0
        for g in range(16):
            for k in range(K):
                rel = row + (k * 37 - 5)
                v_rel = (rel >= 0) & (rel < GCAP)
                t0 = jnp.clip((p * 13 + g * 7 + k) % NCAP_T, 0, NCAP_T - 1)
                a1 = jnp.where(((rel - t0 * GROUP) == cell_sub) & v_rel,
                               1.0, 0.0)
                rows = []
                for w in range(W):
                    r3 = jnp.concatenate(
                        [pbuf[t0 + w // GROUP], pbuf[t0 + w // GROUP + 1],
                         pbuf[t0 + w // GROUP + 2]], axis=-1)
                    if w % GROUP:
                        r3 = pltpu.roll(r3, (-(w % GROUP)) % (3 * GROUP),
                                        axis=1)
                    rows.append(r3[:, :2 * GROUP])
                lhs = jnp.concatenate(rows, axis=0)
                if mode == "build":
                    # consume lhs+a1 without the dot: cheap adds
                    acc = lhs[:, :GROUP] + lhs[:, GROUP:]
                    out_ref[0, k * W:(k + 1) * W, pl.ds(g * GROUP, GROUP)] = (
                        out_ref[0, k * W:(k + 1) * W, pl.ds(g * GROUP, GROUP)]
                        + acc + a1[:W, :])
                else:
                    v = jax.lax.dot_general(
                        lhs, a1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                    out_ref[0, k * W:(k + 1) * W, pl.ds(g * GROUP, GROUP)] = (
                        out_ref[0, k * W:(k + 1) * W, pl.ds(g * GROUP, GROUP)]
                        + v)
                    if mode == "when":
                        t1 = t0 - 2  # never taken

                        @pl.when(t1 > t0 + 1)
                        def _(t0=t0, t1=t1, g=g, k=k):
                            def bd(i, _):
                                vv = jax.lax.dot_general(
                                    lhs, a1, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                    precision=prec)
                                out_ref[0, k * W:(k + 1) * W,
                                        pl.ds(g * GROUP, GROUP)] = (
                                    out_ref[0, k * W:(k + 1) * W,
                                            pl.ds(g * GROUP, GROUP)] + vv)
                                return 0
                            jax.lax.fori_loop(0, (t1 - t0) // 2, bd, 0)
        return 0

    jax.lax.fori_loop(0, NPIECE, piece, 0)


def run(mode, prec=PREC):
    tiles = NPIECE * NCAP_T + EXT_T + 8
    tbl = jnp.ones((tiles, 1, GROUP), jnp.float32)
    fn = pl.pallas_call(
        functools.partial(body, mode, prec),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=0,
            grid=(1,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, K * W, 2048), lambda c: (c, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((NCAP_T + EXT_T, 1, GROUP), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((1, K * W, 2048), jnp.float32),
    )
    jfn = jax.jit(lambda t: fn(t))
    out = jfn(tbl)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = jfn(tbl)
    f = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / 10
    assert np.isfinite(f)
    print(f"{mode:6s} prec={str(prec)[10:]:8s}: {dt*1e3:8.2f} ms total, "
          f"{dt*1e6/NPIECE:8.1f} us/piece")


if __name__ == "__main__":
    run("when", jax.lax.Precision.HIGHEST)
    run("when", jax.lax.Precision.DEFAULT)
    run("full", jax.lax.Precision.HIGHEST)
