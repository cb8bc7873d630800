"""Build the offline LPIPS TorchScript bundle used by
``esrnerf_tpu.utils.metrics.rgb_lpips``.

This sandbox has zero egress, so neither torchvision backbones nor the
``lpips`` package's pretrained weights can be downloaded here — run this
script ONCE on any connected machine:

    pip install lpips torchvision
    python scripts/make_lpips_bundle.py --net alex --out assets/lpips_alex.pt

and copy the two produced files into the repo:

    assets/lpips_<net>.pt            self-contained TorchScript module,
                                     (im0, im1) in [-1,1], [B?,3,H,W] ->
                                     scalar LPIPS distance
    assets/lpips_<net>.golden.json   sha256 of the bundle + golden
                                     distances on two deterministic
                                     synthetic image pairs

`metrics._load_lpips` picks the bundle up automatically (env var
``LPIPS_WEIGHTS`` still wins), and ``tests/test_lpips_weights.py``
verifies any present bundle reproduces its own goldens, so corruption or
a torch-version drift fails loudly instead of skewing eval metrics.

Reference parity: the reference computes LPIPS-alex/vgg on every eval
(``/root/reference/utils2/metric.py:15-28``) via the same lpips==0.1
package this bundle freezes.
"""

import argparse
import hashlib
import json
import os


def synthetic_pair(seed: int, h: int = 64, w: int = 64):
    """Deterministic [0,1] image pair (gt, distorted) — the golden probes.

    Pure numpy so the sandbox-side test regenerates bit-identical inputs.
    """
    import numpy as np

    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(
        np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij"
    )
    gt = np.stack(
        [0.5 + 0.5 * np.sin(6.28 * (xx + 0.1 * k) * (1 + k))
         * np.cos(6.28 * yy * (2 - 0.3 * k)) for k in range(3)],
        axis=-1,
    ).astype(np.float32)
    noise = rng.normal(scale=0.1, size=gt.shape).astype(np.float32)
    im = np.clip(gt + noise, 0.0, 1.0)
    return gt, im


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--net", default="alex", choices=["alex", "vgg", "squeeze"])
    ap.add_argument("--out", default=None, help="output .pt path")
    args = ap.parse_args()

    import lpips  # type: ignore
    import numpy as np
    import torch

    out = args.out or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "assets", f"lpips_{args.net}.pt",
    )
    os.makedirs(os.path.dirname(out), exist_ok=True)

    model = lpips.LPIPS(net=args.net, version="0.1").eval()

    class Wrapped(torch.nn.Module):
        """(im0, im1) in [-1,1] -> scalar; accepts [3,H,W] or [B,3,H,W]."""

        def __init__(self, m):
            super().__init__()
            self.m = m

        def forward(self, im0, im1):
            if im0.dim() == 3:
                im0 = im0.unsqueeze(0)
            if im1.dim() == 3:
                im1 = im1.unsqueeze(0)
            return self.m(im0, im1).reshape(())

    wrapped = Wrapped(model)
    h, w = 64, 64
    ex = torch.zeros(1, 3, h, w)
    scripted = torch.jit.trace(wrapped, (ex, ex), check_trace=False)
    torch.jit.save(scripted, out)

    sha = hashlib.sha256(open(out, "rb").read()).hexdigest()
    reloaded = torch.jit.load(out, map_location="cpu").eval()
    goldens = {}
    for seed in (0, 1):
        gt, im = synthetic_pair(seed, h, w)
        t = lambda a: torch.from_numpy(  # noqa: E731
            np.ascontiguousarray(a)).permute(2, 0, 1).float()
        with torch.no_grad():
            d = float(reloaded(2 * t(gt) - 1, 2 * t(im) - 1).item())
        goldens[f"seed{seed}"] = d
    meta = {
        "net": args.net, "sha256": sha, "lpips_version": "0.1",
        "torch_version": torch.__version__, "image_hw": [h, w],
        "goldens": goldens,
    }
    side = out[: -len(".pt")] + ".golden.json"
    with open(side, "w") as f:
        json.dump(meta, f, indent=1)
    print(json.dumps(meta, indent=1))
    print(f"wrote {out} and {side}")


if __name__ == "__main__":
    main()
