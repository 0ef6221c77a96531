#!/usr/bin/env python
"""Offline torchvision->npz ResNet18 weight dump (run where torchvision
exists; this environment has none).

  python scripts/convert_torch_resnet18.py resnet18_imagenet.npz

The resulting .npz loads via models/resnet.py:load_torch_resnet18 to give
the reference's `--weights_init pretrained` initialisation
(trainer.py:176,193).
"""

import sys


def main(out_path: str) -> int:
    import numpy as np
    try:
        import torchvision
    except ImportError:
        print("torchvision is required (run this on a machine that has it)")
        return 1
    model = torchvision.models.resnet18(weights="IMAGENET1K_V1")
    state = {k: v.numpy() for k, v in model.state_dict().items()
             if "num_batches_tracked" not in k}
    np.savez(out_path, **state)
    print(f"wrote {len(state)} arrays to {out_path}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main(sys.argv[1] if len(sys.argv) > 1
                          else "resnet18_imagenet.npz"))
