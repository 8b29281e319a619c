"""Batch utilities, the counterpart of the reference's mtsutil plugins
(mitsuba/src/utils/{tonemap,addimages,joinrgb}.cpp):

  tonemap    EXR -> PNG/JPG with gamma / Reinhard tonemapping
  addimages  weighted sum of two EXRs (A*wa + B*wb)
  joinrgb    merge three single-channel EXRs into RGB

Usage:
  python -m ppg_tpu.tools.util tonemap [-g gamma | -r key] [-m multiplier]
      in.exr [in2.exr ...]
  python -m ppg_tpu.tools.util addimages wa a.exr wb b.exr out.exr
  python -m ppg_tpu.tools.util joinrgb r.exr g.exr b.exr out.exr
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..io import exr


def _read(path):
    img = exr.read(path)
    img = img[0] if isinstance(img, tuple) else img
    return np.asarray(img, np.float32)


def tonemap(args):
    for path in args.inputs:
        img = _read(path)[..., :3] * args.multiplier
        if args.reinhard is not None:
            # photographic tonemapping (Reinhard et al.), like tonemap.cpp
            lum = (img[..., 0] * 0.212671 + img[..., 1] * 0.715160
                   + img[..., 2] * 0.072169)
            key = args.reinhard
            avg = np.exp(np.log(np.maximum(lum, 1e-6)).mean())
            scaled = key / avg * img
            img = scaled / (1.0 + (lum * key / avg))[..., None]
        srgb = np.where(img <= 0.0031308, img * 12.92,
                        1.055 * np.maximum(img, 1e-9) ** (1 / args.gamma)
                        - 0.055)
        out8 = (np.clip(srgb, 0, 1) * 255 + 0.5).astype(np.uint8)
        from PIL import Image

        dst = os.path.splitext(path)[0] + ".png"
        Image.fromarray(out8).save(dst)
        print(f"wrote {dst}")


def addimages(args):
    a = _read(args.a)
    b = _read(args.b)
    exr.write(args.out, args.wa * a + args.wb * b)
    print(f"wrote {args.out}")


def joinrgb(args):
    chans = [_read(p) for p in (args.r, args.g, args.b)]
    chans = [c[..., 0] if c.ndim == 3 else c for c in chans]
    exr.write(args.out, np.stack(chans, -1).astype(np.float32))
    print(f"wrote {args.out}")


def main(argv=None):
    ap = argparse.ArgumentParser(prog="ppg-util")
    sub = ap.add_subparsers(dest="cmd", required=True)

    t = sub.add_parser("tonemap")
    t.add_argument("inputs", nargs="+")
    t.add_argument("-g", dest="gamma", type=float, default=2.4,
                   help="sRGB-style gamma (default srgb curve)")
    t.add_argument("-r", dest="reinhard", type=float, default=None,
                   metavar="KEY", help="Reinhard tonemap with this key")
    t.add_argument("-m", dest="multiplier", type=float, default=1.0)
    t.set_defaults(fn=tonemap)

    a = sub.add_parser("addimages")
    a.add_argument("wa", type=float)
    a.add_argument("a")
    a.add_argument("wb", type=float)
    a.add_argument("b")
    a.add_argument("out")
    a.set_defaults(fn=addimages)

    j = sub.add_parser("joinrgb")
    j.add_argument("r")
    j.add_argument("g")
    j.add_argument("b")
    j.add_argument("out")
    j.set_defaults(fn=joinrgb)

    args = ap.parse_args(argv)
    args.fn(args)


if __name__ == "__main__":
    main()
