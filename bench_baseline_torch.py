"""Torch-CPU baseline for the fine-stage train step.

The reference (ecrireme/ESR-NeRF) is CUDA-only — its ray kernels are compiled
CUDA extensions (``app/utils/base/cuda/``), so the published code cannot run
the fine stage on CPU at all. This script reimplements the reference's
fine-stage step with the same computation graph in pure PyTorch (the CPU
fallback a reference user would have to write): dense ray sampling
(``dvgo.py:140-172`` formulation), ``F.grid_sample`` trilinear reads
(``module.py:24-35``), ragged compaction via ``masked_select`` (mirroring
``render_utils_cuda.sample_pts_on_rays``), the interp NeuS alpha
(``functions.py:72-105``), cumprod transmittance (``alpha2weight``
semantics), the 24-displaced-tap feature sampler (``voxurff.py:678-721``),
the two radiance MLPs + tonemapper, and an Adam step over all params.

Prints one JSON line {"metric": "fine_train_rays_per_sec_torch_cpu", ...}.
BENCH_BATCH rays per step (default 1024 — torch-CPU throughput is linear in
batch at these sizes, so rays/s extrapolates to the reference's 8192).
"""

import json
import os
import time

import numpy as np
import torch
import torch.nn.functional as F

torch.manual_seed(0)

NUM_VOXELS = int(os.environ.get("BENCH_NUM_VOXELS", 16777216))
BATCH = int(os.environ.get("BENCH_BATCH", 1024))
ITERS = int(os.environ.get("BENCH_ITERS", 3))
RES = round(NUM_VOXELS ** (1 / 3))
STEPSIZE = 0.5
S_VAL = 80.0
GRAD_FEAT = (0.5, 1.0, 1.5, 2.0)
COLOR_DIM = 6
WIDTH, DEPTH = 192, 4


def make_mlp(din, width, depth, dout):
    layers = [torch.nn.Linear(din, width), torch.nn.ReLU()]
    for _ in range(depth - 2):
        layers += [torch.nn.Linear(width, width), torch.nn.ReLU()]
    layers += [torch.nn.Linear(width, dout)]
    return torch.nn.Sequential(*layers)


def grid_sample(grid, pts):
    # grid [1,C,X,Y,Z], pts world [-1,1]; align_corners, zyx flip like the
    # reference DenseGrid.forward (module.py:24-35)
    ind = pts.flip(-1)[None, None, None]  # [1,1,1,M,3]
    out = F.grid_sample(grid, ind, align_corners=True)
    return out[0, :, 0, 0].T  # [M, C]


def main():
    voxel = 2.0 / (RES - 1)
    # unit-ball SDF so rays actually hit a surface (same scene as bench.py)
    g = torch.linspace(-1, 1, RES)
    xx, yy, zz = torch.meshgrid(g, g, g, indexing="ij")
    ball = ((xx**2 + yy**2 + zz**2).sqrt() - 0.7)[None, None]
    sdf = torch.nn.Parameter(ball.clone())
    off_color = torch.nn.Parameter(torch.zeros(1, COLOR_DIM, RES, RES, RES))
    emo_color = torch.nn.Parameter(torch.zeros(1, COLOR_DIM, RES, RES, RES))
    D = len(GRAD_FEAT)
    dim0 = (3 + 3 * 5 * 2) + (3 * 4 * 3) + COLOR_DIM + D * 3 + D * 6 + 1
    off_net = make_mlp(dim0, WIDTH, DEPTH, 3)
    emo_net = make_mlp(dim0, WIDTH, DEPTH, 3)
    tone = make_mlp(3 + 3 * 4 * 2, WIDTH, 2, 3)
    params = (
        [sdf, off_color, emo_color]
        + list(off_net.parameters()) + list(emo_net.parameters())
        + list(tone.parameters())
    )
    opt = torch.optim.Adam(params, lr=1e-3)

    n_samples = int(np.sqrt(3) * 2 / (STEPSIZE * voxel)) + 1

    rng = np.random.default_rng(1)

    def make_batch():
        o = rng.normal(size=(BATCH, 3)).astype(np.float32)
        o = o / np.linalg.norm(o, axis=-1, keepdims=True) * 2.0
        d = rng.normal(scale=0.3, size=(BATCH, 3)).astype(np.float32) - o
        vd = d / np.linalg.norm(d, axis=-1, keepdims=True)
        rgb = rng.uniform(0, 1, (BATCH, 3)).astype(np.float32)
        return (torch.from_numpy(o), torch.from_numpy(d),
                torch.from_numpy(vd), torch.from_numpy(rgb))

    posfreq = 2.0 ** torch.arange(5)
    viewfreq = 2.0 ** torch.arange(4)
    colorfreq = 2.0 ** torch.arange(4)
    base = torch.tensor(
        [[0, 0, -1], [0, 0, 1], [0, -1, 0], [0, 1, 0], [-1, 0, 0], [1, 0, 0]],
        dtype=torch.float32,
    )
    disp = torch.tensor(GRAD_FEAT)

    def step(o, d, vd, rgb):
        # dense sampling from bbox entry (dvgo.py:140-172 formulation)
        vec = torch.where(d == 0, torch.full_like(d, 1e-6), d)
        ra = (1.0 - o) / vec
        rb = (-1.0 - o) / vec
        t_min = torch.minimum(ra, rb).amax(-1).clamp(0.5, 4.0)
        rate = torch.arange(n_samples)[None, :, None] * STEPSIZE * voxel
        dirn = d / d.norm(dim=-1, keepdim=True)
        pts = (o + d * t_min[:, None])[:, None] + dirn[:, None] * rate
        inb = ((pts > -1) & (pts < 1)).all(-1)

        # ragged compaction (reference sample_pts_on_rays returns [M,3])
        ray_id = torch.arange(BATCH)[:, None].expand(-1, n_samples)[inb]
        p = pts[inb]  # [M,3]

        sdfv = grid_sample(sdf, p)[:, 0]
        # interp alpha along the ragged list (functions.py:72-105)
        same_next = torch.zeros_like(sdfv, dtype=torch.bool)
        same_next[:-1] = ray_id[1:] == ray_id[:-1]
        nxt = torch.cat([sdfv[1:], sdfv[-1:]])
        prv = torch.cat([sdfv[:1], sdfv[:-1]])
        same_prev = torch.zeros_like(same_next)
        same_prev[1:] = same_next[:-1]
        est_n = torch.where(same_next, 0.5 * (sdfv + nxt), sdfv)
        est_p = torch.where(same_prev, 0.5 * (sdfv + prv), sdfv)
        cdf_p = torch.sigmoid(est_p * S_VAL)
        cdf_n = torch.sigmoid(est_n * S_VAL)
        alpha = ((cdf_p - cdf_n).relu() + 1e-5) / (cdf_p + 1e-5)

        keep = alpha > 1e-4
        ray_id = ray_id[keep]
        p = p[keep]
        alpha = alpha[keep]
        sdfv = sdfv[keep]

        # transmittance via per-ray cumprod on the ragged list
        one_m = (1 - alpha).clamp_min(1e-10)
        logc = torch.cumsum(one_m.log(), 0)
        first = torch.zeros(BATCH + 1, dtype=torch.long)
        first.scatter_reduce_(
            0, ray_id + 1, torch.arange(len(ray_id)), "amin", include_self=False
        )
        seg_off = torch.cat([torch.zeros(1), logc])[first[ray_id + 1]]
        prevc = torch.cat([torch.zeros(1), logc[:-1]])
        T_in = (prevc - seg_off).exp()
        w = alpha * T_in

        k2 = w > 1e-4
        ray_id = ray_id[k2]
        p = p[k2]
        w = w[k2]
        sdfv = sdfv[k2]

        # 24-displaced-tap features (voxurff.py:678-721)
        ind = (p + 1) / 2 * (RES - 1)
        all_ind = (ind[:, None, None] + base[:, None, :] * disp[None, :, None]
                   ).clamp(0, RES - 1)
        feat24 = grid_sample(
            sdf, all_ind.reshape(-1, 3) / (RES - 1) * 2 - 1
        ).reshape(-1, 6, D)
        diff = (all_ind[:, 1::2] - all_ind[:, 0::2]).amax(-1)
        grad = (feat24[:, 1::2] - feat24[:, 0::2]) / diff.clamp_min(1e-6) / voxel
        normal = grad / grad.norm(dim=1, keepdim=True).clamp_min(1e-12)

        xyz_n = (p + 1) / 2
        xe = (xyz_n[..., None] * posfreq).reshape(len(p), -1)
        ve = (vd[ray_id][..., None] * viewfreq).reshape(len(p), -1)
        feat = torch.cat(
            [xyz_n, xe.sin(), xe.cos(), ve, ve.sin(), ve.cos(),
             sdfv[:, None], feat24.reshape(len(p), -1),
             normal.reshape(len(p), -1)], -1)

        off = F.softplus(off_net(torch.cat([grid_sample(off_color, p), feat], -1)))
        emo = F.softplus(emo_net(torch.cat([grid_sample(emo_color, p), feat], -1)))
        lin = off + emo
        ce = (lin[..., None] * colorfreq).reshape(len(p), -1)
        srgb = torch.sigmoid(tone(torch.cat([lin, ce.sin(), ce.cos()], -1)))

        img = torch.zeros(BATCH, 3)
        img.index_add_(0, ray_id, w[:, None] * srgb)
        loss = ((img - rgb) ** 2).mean()

        opt.zero_grad()
        loss.backward()
        opt.step()
        return float(loss)

    batch = make_batch()
    step(*batch)  # warmup
    t0 = time.perf_counter()
    for _ in range(ITERS):
        step(*batch)
    dt = time.perf_counter() - t0
    rays_per_sec = BATCH * ITERS / dt
    print(json.dumps({
        "metric": "fine_train_rays_per_sec_torch_cpu",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s",
        "batch": BATCH,
        "threads": torch.get_num_threads(),
    }))


if __name__ == "__main__":
    main()
