#!/usr/bin/env python
"""Convert pretrained LPIPS(VGG) weights to the .npz shacira_tpu consumes.

The reference computes LPIPS through the ``lpips`` pip package
(wisp/ops/image/metrics.py:81-109, ``LPIPS(net='vgg')``).  This build
reimplements the math natively (shacira_tpu/ops/lpips.py) but cannot download
the pretrained weights in a zero-egress environment, so conversion is a
one-time step on any machine that has the weights:

  Mode A (easiest — ``pip install lpips torchvision``):
      python tools/convert_lpips.py --out lpips_vgg.npz

  Mode B (no lpips package — torchvision VGG16 checkpoint + the LPIPS repo's
  linear-layer checkpoint, e.g. ``lpips/weights/v0.1/vgg.pth``):
      python tools/convert_lpips.py --out lpips_vgg.npz \
          --vgg16-pth vgg16-397923af.pth --lin-pth vgg.pth

Then point the metric at it:
      export SHACIRA_LPIPS_WEIGHTS=/path/to/lpips_vgg.npz

Layout produced (consumed by shacira_tpu.ops.lpips.load_lpips_weights):
  conv{i}_w  [3,3,Cin,Cout] HWIO   (i = 0..12, the 13 VGG16 convs)
  conv{i}_b  [Cout]
  lin{li}    [C]  (li = 0..4, the 5 LPIPS 1x1 linear taps)
"""
from __future__ import annotations

import argparse
import sys

import numpy as np


def convert_from_lpips_pkg(out_path: str):
    """Mode A: via the lpips package (downloads weights on first use)."""
    from shacira_tpu.ops.lpips import export_weights_npz
    export_weights_npz(out_path)


def convert_from_checkpoints(out_path: str, vgg16_pth: str, lin_pth: str):
    """Mode B: raw torch checkpoints, no lpips/torchvision import needed.

    ``vgg16_pth``: torchvision VGG16 state_dict (features.{0,2,5,...}.weight
    with [out,in,kh,kw] kernels).  ``lin_pth``: LPIPS linear checkpoint
    (lin{li}.model.1.weight, [C,1,1,1] non-negative 1x1 kernels).
    """
    import torch

    vgg = torch.load(vgg16_pth, map_location='cpu')
    if hasattr(vgg, 'state_dict'):
        vgg = vgg.state_dict()
    lin = torch.load(lin_pth, map_location='cpu')
    if hasattr(lin, 'state_dict'):
        lin = lin.state_dict()

    w = {}
    conv_keys = sorted(
        (k for k in vgg if k.startswith('features.') and k.endswith('.weight')),
        key=lambda k: int(k.split('.')[1]))
    if len(conv_keys) != 13:
        raise SystemExit(f'expected 13 VGG16 convs, found {len(conv_keys)} '
                         f'in {vgg16_pth}')
    for i, k in enumerate(conv_keys):
        kw = vgg[k].numpy()
        w[f'conv{i}_w'] = kw.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        w[f'conv{i}_b'] = vgg[k.replace('.weight', '.bias')].numpy()

    for li in range(5):
        key = next((k for k in lin if k.startswith(f'lin{li}.')
                    and k.endswith('.weight')), None)
        if key is None:
            raise SystemExit(f'missing lin{li} weight in {lin_pth}')
        w[f'lin{li}'] = lin[key].numpy().reshape(-1)

    np.savez(out_path, **w)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.split('\n')[0])
    p.add_argument('--out', required=True, help='output .npz path')
    p.add_argument('--vgg16-pth', help='torchvision VGG16 state_dict (mode B)')
    p.add_argument('--lin-pth', help='LPIPS v0.1 vgg.pth lin checkpoint (mode B)')
    args = p.parse_args(argv)
    if args.vgg16_pth or args.lin_pth:
        if not (args.vgg16_pth and args.lin_pth):
            p.error('mode B needs both --vgg16-pth and --lin-pth')
        convert_from_checkpoints(args.out, args.vgg16_pth, args.lin_pth)
    else:
        convert_from_lpips_pkg(args.out)
    data = np.load(args.out)
    print(f'wrote {args.out}: {len(data.files)} arrays, '
          f'{sum(data[k].size for k in data.files):,} parameters')
    return 0


if __name__ == '__main__':
    sys.exit(main())
