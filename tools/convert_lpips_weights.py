"""Convert pretrained LPIPS(vgg) weights to the npz schema consumed by
`horizongs_tpu.train.lpips_jax` (run on any machine with torch +
torchvision + the `lpips` pip package and network access, then ship the
npz to the TPU host, default path ~/.cache/horizongs_tpu/lpips_vgg.npz).

Usage: python tools/convert_lpips_weights.py [out.npz]
"""
import sys

import numpy as np


def main(out_path=None):
    import lpips
    import torch

    out_path = out_path or __import__("os").path.join(
        __import__("os").path.expanduser("~"), ".cache", "horizongs_tpu",
        "lpips_vgg.npz")
    net = lpips.LPIPS(net="vgg")
    params = {}

    # VGG16 conv kernels: torch (cout, cin, kh, kw) -> HWIO
    convs = [m for m in net.net.slice1] + [m for m in net.net.slice2] + \
            [m for m in net.net.slice3] + [m for m in net.net.slice4] + \
            [m for m in net.net.slice5]
    i = 0
    for m in convs:
        if isinstance(m, torch.nn.Conv2d):
            params[f"conv{i}_w"] = (
                m.weight.detach().numpy().transpose(2, 3, 1, 0))
            params[f"conv{i}_b"] = m.bias.detach().numpy()
            i += 1
    assert i == 13, f"expected 13 VGG convs, got {i}"

    # LPIPS linear heads: 1x1 convs (1, C, 1, 1) -> (C,)
    for j, lin in enumerate(net.lins):
        w = lin.model[-1].weight.detach().numpy()
        params[f"lin{j}_w"] = w.reshape(-1)

    import os
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    np.savez(out_path, **params)
    print(f"wrote {out_path} ({len(params)} arrays)")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else None)
