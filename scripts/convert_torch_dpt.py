#!/usr/bin/env python
"""Offline torch->npz DPT/ViT weight dump (run where timm/torch.hub access
exists; this environment has neither network egress nor timm).

Two modes:

  # timm backbone only (what the reference's _make_pretrained_* pull,
  # manydepth/dpt/vit.py:494-543):
  python scripts/convert_torch_dpt.py --timm vit_base_resnet50_384 out.npz
  python scripts/convert_torch_dpt.py --timm vit_base_patch16_384 out.npz
  python scripts/convert_torch_dpt.py --timm vit_large_patch16_384 out.npz

  # full MiDaS/DPT checkpoint (scratch + head included,
  # manydepth/dpt/base_model.py:4-16):
  python scripts/convert_torch_dpt.py --pt dpt_hybrid-midas-501f0c75.pt out.npz
  python scripts/convert_torch_dpt.py --pt midas_v21-f6b98070.pt out.npz

  # torch.hub model (the MidasNet_large trunk, dpt/blocks.py:133-135):
  python scripts/convert_torch_dpt.py \
      --hub facebookresearch/WSL-Images:resnext101_32x8d_wsl out.npz

The resulting .npz loads via polardepth_tpu.models.dpt_weights.load_dpt_npz
(layout transposes + position-embedding grid resize happen there, on the
TPU host).  Keys are stored under their original torch names.
"""

import argparse
import sys


def main() -> int:
    p = argparse.ArgumentParser()
    g = p.add_mutually_exclusive_group(required=True)
    g.add_argument("--timm", help="timm model name to download")
    g.add_argument("--pt", help="torch checkpoint file (.pt/.pth)")
    g.add_argument("--hub", help="torch.hub '<repo>:<model>' to download")
    p.add_argument("out", help="output .npz path")
    a = p.parse_args()

    import numpy as np

    if a.timm:
        try:
            import timm
        except ImportError:
            print("timm is required for --timm (pip install timm)")
            return 1
        model = timm.create_model(a.timm, pretrained=True)
        state = model.state_dict()
    elif a.hub:
        import torch
        repo, name = a.hub.split(":")
        state = torch.hub.load(repo, name).state_dict()
    else:
        import torch
        state = torch.load(a.pt, map_location="cpu")
        for key in ("state_dict", "model"):
            if isinstance(state, dict) and key in state \
                    and isinstance(state[key], dict):
                state = state[key]

    arrays = {}
    for k, v in state.items():
        if "num_batches_tracked" in k or "attn_mask" in k:
            continue
        arrays[k] = v.detach().cpu().numpy() if hasattr(v, "detach") else \
            np.asarray(v)
    np.savez(a.out, **arrays)
    print(f"wrote {len(arrays)} arrays to {a.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
