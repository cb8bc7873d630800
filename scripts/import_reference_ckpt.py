"""Convert a reference (ecrireme/ESR-NeRF, PyTorch) checkpoint into this
framework's format.

Usage:
  python scripts/import_reference_ckpt.py <ref.ckpt> <out.ckpt> [kind]

``kind`` is one of dvgo | voxurfc | voxurff | esrnerf; when omitted it is
inferred from the checkpoint path (the reference names checkpoints by the
stage class, e.g. ``.../fine.Fine/...``). The torch optimizer state is not
carried over (fresh Adam moments) — import a finished stage's last.ckpt
and warm-start the next stage, which re-initializes its optimizer anyway.
"""

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    if len(sys.argv) < 3:
        print(__doc__)
        return 2
    src, dst = sys.argv[1], sys.argv[2]
    import torch  # CPU build is enough

    from esrnerf_tpu.utils import checkpoint as ckpt_io
    from esrnerf_tpu.utils.import_torch_ckpt import (
        STAGE_KINDS, convert_checkpoint)

    kind = sys.argv[3] if len(sys.argv) > 3 else None
    if kind is None:
        low = src.lower()
        for frag, k in STAGE_KINDS:
            if frag in low:
                kind = k
                break
    if kind is None:
        print("cannot infer model kind from path; pass one of "
              "dvgo|voxurfc|voxurff|esrnerf explicitly")
        return 2

    ref = torch.load(src, map_location="cpu", weights_only=False)
    payload = convert_checkpoint(ref, kind)
    ckpt_io.save_checkpoint(dst, payload)
    p = payload["renderer"]["params"]
    print(f"imported kind={kind}: "
          f"{sorted(p)} -> {dst} "
          f"(global_step={payload['trainer']['global_step']})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
