"""Microbenchmark: scatter-add apply strategies on the real TPU.

Validates the sorted-splat kernel design (PERF.md roadmap item 1) before
committing to it. Timing via float() transfer sync (block_until_ready does
not synchronize through the axon tunnel).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import esrnerf_tpu  # noqa: F401  (enables the persistent compilation cache)


def timeit(fn, *args, n=5):
    out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])  # warm + sync
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _ = float(jnp.asarray(out).ravel()[0])
    return (time.perf_counter() - t0) / n


def main():
    dev = jax.devices()[0]
    print("device:", dev)
    rng = np.random.default_rng(0)

    # fine-stage-like shapes: M points -> 8 corners, into N-cell tables
    M = 3_100_000
    N_SDF = 167 * 100_000  # ~16.7M
    C = 6
    N_COLOR_ROWS = N_SDF

    base = rng.integers(0, N_SDF - 70_000, size=M).astype(np.int32)
    base_j = jnp.asarray(base)
    vals = jnp.asarray(rng.standard_normal((M, 8), dtype=np.float32))
    valsC = jnp.asarray(rng.standard_normal((M, 8 * C), dtype=np.float32))

    offs = np.array([0, 1, 256, 257, 65536, 65537, 65792, 65793], np.int32)

    @jax.jit
    def scatter_sdf(base, vals):
        idx = (base[:, None] + offs[None, :]).reshape(-1)
        return jnp.zeros(N_SDF, jnp.float32).at[idx].add(vals.reshape(-1))

    @jax.jit
    def scatter_color_folded(base, vals):
        idx = ((base[:, None] + offs[None, :])[:, :, None] * C
               + jnp.arange(C, dtype=jnp.int32)).reshape(-1)
        return jnp.zeros(N_COLOR_ROWS * C, jnp.float32).at[idx].add(
            vals.reshape(-1))

    @jax.jit
    def scatter_color_rows(base, vals):
        idx = (base[:, None] + offs[None, :]).reshape(-1)
        v = vals.reshape(M * 8, C)  # row d of point m targets idx[m*8+d]
        return jnp.zeros((N_COLOR_ROWS, C), jnp.float32).at[idx].add(v)

    @jax.jit
    def sort_m(base):
        k, v = jax.lax.sort_key_val(base, jnp.arange(M, dtype=jnp.int32))
        return k

    @jax.jit
    def sort_u25(base, vals):
        idx = (base[:, None] + offs[None, :]).reshape(-1)
        k, v = jax.lax.sort_key_val(idx, vals.reshape(-1))
        return k

    @jax.jit
    def scatter_sdf_sorted(base_sorted, vals):
        idx = (base_sorted[:, None] + offs[None, :]).reshape(-1)
        # per-corner streams are sorted; interleaved they are not. Use one
        # corner at a time with sorted flag.
        out = jnp.zeros(N_SDF, jnp.float32)
        for c in range(8):
            out = out.at[base_sorted + offs[c]].add(
                vals[:, c], indices_are_sorted=True)
        return out

    bs = jnp.sort(base_j)

    for name, fn, args in [
        ("sort 3.1M keyval", sort_m, (base_j,)),
        ("sort 25M keyval", sort_u25, (base_j, vals)),
        ("scatter sdf 25M->16.7M f32", scatter_sdf, (base_j, vals)),
        ("scatter sdf sorted-flag", scatter_sdf_sorted, (bs, vals)),
        ("scatter color folded 149M->100M", scatter_color_folded,
         (base_j, valsC)),
        ("scatter color rows 25Mx6->16.7Mx6", scatter_color_rows,
         (base_j, valsC)),
    ]:
        try:
            t = timeit(fn, *args)
            print(f"{name:42s} {t*1e3:9.1f} ms")
        except Exception as e:  # noqa: BLE001
            print(f"{name:42s} FAILED: {type(e).__name__}: {e}")


if __name__ == "__main__" and "splat" not in __import__("sys").argv:
    main()


def bench_splat():
    from esrnerf_tpu.ops import splat as splatops
    rng = np.random.default_rng(0)
    N = 256 * 256 * 256
    YZ, Z = 256 * 256, 256

    for name, M, C in [("sdf-like M=3.1M C=1", 3_100_000, 1),
                       ("color-like M=524K C=6", 524_288, 6),
                       ("color-like M=3.1M C=6", 3_100_000, 6)]:
        base = np.sort(rng.integers(0, N - YZ - Z - 2, size=M)).astype(np.int32)
        vals = rng.standard_normal((8, C, M)).astype(np.float32)
        from esrnerf_tpu.ops.grid import corner_offsets_dmajor
        offsets = tuple(corner_offsets_dmajor(256, 256))
        f = lambda b, v: splatops.sorted_streams_splat(b, v, offsets, N)
        t = timeit(f, jnp.asarray(base), jnp.asarray(vals))
        print(f"splat kernel {name:24s} {t*1e3:9.1f} ms")

    # full wrapper incl. sort+permute, fine-stage sdf shape
    M = 3_100_000
    pts = jnp.asarray(rng.uniform(0.02, 0.98, (M, 3)).astype(np.float32))
    ct = jnp.asarray(rng.standard_normal((M, 1)).astype(np.float32))
    mn, mx = jnp.zeros(3), jnp.ones(3)
    g = lambda p, c: splatops.trilinear_splat((256, 256, 256, 1), p, c, mn, mx)
    t = timeit(jax.jit(g), pts, ct)
    print(f"trilinear_splat full (sort+permute+kernel) {t*1e3:9.1f} ms")


if __name__ == "__main__" and "splat" in __import__("sys").argv:
    bench_splat()


def bench_splat_realistic():
    """Surface-shell distribution: what a real SDF march produces."""
    from esrnerf_tpu.ops import splat as splatops
    rng = np.random.default_rng(0)
    R = 256
    N = R ** 3

    def shell_cells(M):
        d = rng.standard_normal((M, 3))
        d /= np.linalg.norm(d, axis=1, keepdims=True)
        r = 0.35 + 0.02 * rng.standard_normal(M)  # thin shell
        pts = 0.5 + d * r[:, None]
        ijk = np.clip((pts * (R - 1)).astype(np.int32), 0, R - 2)
        return np.sort((ijk[:, 0] * R + ijk[:, 1]) * R + ijk[:, 2])

    from esrnerf_tpu.ops.grid import corner_offsets_dmajor
    offsets = tuple(corner_offsets_dmajor(R, R))
    for name, M, C in [("shell sdf M=3.1M C=1", 3_100_000, 1),
                       ("shell color M=524K C=6", 524_288, 6)]:
        base = shell_cells(M).astype(np.int32)
        vals = rng.standard_normal((8, C, M)).astype(np.float32)
        f = lambda b, v: splatops.sorted_streams_splat(b, v, offsets, N)
        t = timeit(f, jnp.asarray(base), jnp.asarray(vals))
        print(f"splat kernel {name:26s} {t*1e3:9.1f} ms")


if __name__ == "__main__" and "shell" in __import__("sys").argv:
    bench_splat_realistic()
