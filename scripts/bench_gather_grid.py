"""Is the real gather kernel's cost per GRID STEP rather than per piece?

Same total work as bench_gather_parts (64 pieces x 64 family matmuls), but
laid out as grid=(64,) with ONE piece per grid step — mirroring the real
kernel's per-chunk structure (out block [1,24,2048], zero-init, idx DMA,
scalar-prefetch reads). Compare us/step against the single-step variant.
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
NCH = 64
W = 6
K = 4


def body(prec, stage, w0_ref, gf_ref, gl_ref, idx_hbm, tbl_hbm, out_ref, idx_buf,
         pbuf, stg, sems):
    c = pl.program_id(0)
    out_ref[...] = jnp.zeros_like(out_ref)
    cell_sub = jax.lax.broadcasted_iota(jnp.int32, (2 * GROUP, GROUP), 0)

    cp_idx = pltpu.make_async_copy(
        idx_hbm.at[pl.ds(c * 16, 16), :], idx_buf, sems.at[0])
    cp_idx.start()
    cp_idx.wait()

    base0 = w0_ref[c]
    cp = pltpu.make_async_copy(
        tbl_hbm.at[pl.ds(base0 // GROUP, NCAP_T + EXT_T), :, :], pbuf,
        sems.at[1])
    cp.start()
    cp.wait()

    for g in range(16):
        gf = gf_ref[c, g]
        gl = gl_ref[c, g]
        row = idx_buf[g:g + 1, :]
        for k in range(K):
            ck = k * 37
            rel = row + (ck - base0)
            v_rel = (rel >= 0) & (rel < GCAP)
            t0 = jnp.clip((gf + ck - base0) // GROUP, 0, NCAP_T - 1)
            t1 = jnp.minimum((gl + ck - base0) // GROUP, NCAP_T - 1)
            a1 = jnp.where(((rel - t0 * GROUP) == cell_sub) & v_rel,
                           1.0, 0.0)
            if stage:
                cps = pltpu.make_async_copy(
                    pbuf.at[pl.ds(t0, 3)], stg, sems.at[2])
                cps.start()
                cps.wait()
            rows = []
            for w in range(W):
                if stage:
                    r3 = jnp.concatenate(
                        [stg[0], stg[1], stg[2]], axis=-1)
                else:
                    r3 = jnp.concatenate(
                        [pbuf[t0], pbuf[t0 + 1], pbuf[t0 + 2]], axis=-1)
                if w:
                    r3 = pltpu.roll(r3, (-w) % (3 * GROUP), axis=1)
                rows.append(r3[:, :2 * GROUP])
            lhs = jnp.concatenate(rows, axis=0)
            v = jax.lax.dot_general(
                lhs, a1, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=prec)
            out_ref[0, k * W:(k + 1) * W, pl.ds(g * GROUP, GROUP)] = (
                out_ref[0, k * W:(k + 1) * W, pl.ds(g * GROUP, GROUP)] + v)

            @pl.when(t1 > t0 + 1)
            def _(t0=t0, t1=t1, g=g, k=k, rel=rel, v_rel=v_rel):
                def bd(i, _):
                    t = t0 + 2 + 2 * i
                    a1x = jnp.where(((rel - t * GROUP) == cell_sub) & v_rel,
                                    1.0, 0.0)
                    rws = []
                    for w in range(W):
                        r3 = jnp.concatenate(
                            [pbuf[t], pbuf[t + 1], pbuf[t + 2]], axis=-1)
                        if w:
                            r3 = pltpu.roll(r3, (-w) % (3 * GROUP), axis=1)
                        rws.append(r3[:, :2 * GROUP])
                    vv = jax.lax.dot_general(
                        jnp.concatenate(rws, axis=0), a1x,
                        (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32, precision=prec)
                    out_ref[0, k * W:(k + 1) * W, pl.ds(g * GROUP, GROUP)] = (
                        out_ref[0, k * W:(k + 1) * W,
                                pl.ds(g * GROUP, GROUP)] + vv)
                    return 0

                jax.lax.fori_loop(0, (t1 - t0) // 2, bd, 0)


def run(prec, tight_span, stage=False):
    tiles = NCH * NCAP_T + EXT_T + 8
    tbl = jnp.ones((tiles, 1, GROUP), jnp.float32)
    rng = np.random.default_rng(0)
    w0 = (np.arange(NCH, dtype=np.int32) * GCAP)
    if tight_span:
        gf = np.repeat(w0[:, None], 16, 1) + 64
        gl = gf + 100
    else:
        gf = np.repeat(w0[:, None], 16, 1) + rng.integers(0, GCAP // 2,
                                                          (NCH, 16))
        gl = gf + rng.integers(0, GCAP // 3, (NCH, 16))
    idx = np.clip(gf[:, :, None] + rng.integers(0, 100, (NCH, 16, GROUP)),
                  0, None).astype(np.int32).reshape(NCH * 16, GROUP)
    fn = pl.pallas_call(
        functools.partial(body, prec, stage),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(NCH,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec((1, K * W, 2048), lambda c, *_: (c, 0, 0)),
            scratch_shapes=[
                pltpu.VMEM((16, GROUP), jnp.int32),
                pltpu.VMEM((NCAP_T + EXT_T, 1, GROUP), jnp.float32),
                pltpu.VMEM((3, 1, GROUP), jnp.float32),
                pltpu.SemaphoreType.DMA((3,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((NCH, K * W, 2048), jnp.float32),
    )
    jfn = jax.jit(lambda a, b, c2, d, t: fn(a, b, c2, d, t))
    args = (jnp.asarray(w0), jnp.asarray(gf.astype(np.int32)),
            jnp.asarray(gl.astype(np.int32)), jnp.asarray(idx), tbl)
    out = jfn(*args)
    float(np.asarray(out).ravel()[0])
    t0 = time.perf_counter()
    for _ in range(10):
        out = jfn(*args)
    f = float(np.asarray(out).ravel()[0])
    dt = (time.perf_counter() - t0) / 10
    assert np.isfinite(f)
    print(f"grid=({NCH}) prec={str(prec)[10:]:8s} tight={tight_span} "
          f"stage={stage}: {dt*1e3:8.2f} ms total, "
          f"{dt*1e6/NCH:8.1f} us/chunk-step")


if __name__ == "__main__":
    run(jax.lax.Precision.HIGHEST, True, stage=True)
    run(jax.lax.Precision.HIGHEST, False, stage=True)
    run(jax.lax.Precision.HIGHEST, True, stage=False)
