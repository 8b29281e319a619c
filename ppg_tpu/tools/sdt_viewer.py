"""SD-tree visualizer: the reference's nanogui/OpenGL tool
(visualizer/src/main.cpp) re-done headless — reads one or more .sdt
snapshots (bit-compatible format, io/sdt.py) and renders:

  * a 3D scatter of spatial-tree leaf centers colored by mean radiance
    (false-color log scale, like the GL point cloud at main.cpp:580-623)
  * the directional quadtree of a selected leaf rasterized to a
    2^depth x 2^depth radiance map (DTree::loadData, main.cpp:192-209)
    with the same false-color HDR mapping + exposure control

Usage:
  python -m ppg_tpu.tools.sdt_viewer run-01.sdt [-o out.png]
      [--select-point x y z | --select-index N] [--exposure E]
      [--res 512]
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from ..io.sdt import read_sdt


def falsecolor(v, exposure=0.0):
    """Reference visualizer's false-color HDR mapping (modified
    imageview.cpp shader): log-ish ramp through blue-cyan-green-yellow-red."""
    x = np.clip(np.log2(np.maximum(v, 1e-12) * 2.0**exposure + 1.0) / 10.0,
                0.0, 1.0)
    # piecewise-linear jet-like ramp
    r = np.clip(1.5 - np.abs(4 * x - 3.0), 0, 1)
    g = np.clip(1.5 - np.abs(4 * x - 2.0), 0, 1)
    b = np.clip(1.5 - np.abs(4 * x - 1.0), 0, 1)
    return np.stack([r, g, b], -1)


def rasterize_dtree(sums, children, res=512):
    """Rasterize one directional quadtree to a res x res radiance map
    (area-normalized node means, like DTree::eval descent)."""
    img = np.zeros((res, res), np.float64)
    # stack of (node, x0, y0, size)
    stack = [(0, 0, 0, res)]
    n_nodes = len(sums)
    while stack:
        node, x0, y0, size = stack.pop()
        if node >= n_nodes:
            continue
        half = size // 2
        for q in range(4):
            child = int(children[node, q])
            # quadrant layout: bit0 = x, bit1 = y (canonical order)
            qx = x0 + (q & 1) * half
            qy = y0 + ((q >> 1) & 1) * half
            if child != 0 and half >= 1:
                stack.append((child, qx, qy, max(half, 1)))
            else:
                area = max(half, 1) ** 2
                val = float(sums[node, q]) / area
                img[qy:qy + max(half, 1), qx:qx + max(half, 1)] += val
    total = img.mean()
    if total > 0:
        img /= img.mean()
    return img


def main(argv=None):
    ap = argparse.ArgumentParser(prog="sdt_viewer")
    ap.add_argument("sdt", nargs="+", help=".sdt snapshot file(s)")
    ap.add_argument("-o", dest="out", default=None, help="output PNG")
    ap.add_argument("--select-point", nargs=3, type=float, default=None,
                    metavar=("X", "Y", "Z"),
                    help="visualize the D-tree of the leaf nearest this point")
    ap.add_argument("--select-index", type=int, default=None)
    ap.add_argument("--exposure", type=float, default=0.0)
    ap.add_argument("--res", type=int, default=512)
    args = ap.parse_args(argv)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for path in args.sdt:
        cam, trees = read_sdt(path)
        pos = np.array([t["pos"] for t in trees])
        means = np.array([t["mean"] for t in trees])
        print(f"{path}: {len(trees)} leaves, mean radiance "
              f"{means.mean():.4g} (max {means.max():.4g})")

        sel = None
        if args.select_index is not None:
            sel = args.select_index
        elif args.select_point is not None:
            centers = pos + np.array([t["size"] for t in trees]) * 0.5
            sel = int(np.argmin(
                ((centers - np.array(args.select_point)) ** 2).sum(-1)))

        ncols = 2 if sel is not None else 1
        fig = plt.figure(figsize=(7 * ncols, 6))
        ax = fig.add_subplot(1, ncols, 1, projection="3d")
        c = falsecolor(means, args.exposure)
        ax.scatter(pos[:, 0], pos[:, 1], pos[:, 2], c=c, s=4)
        ax.set_title(f"{os.path.basename(path)} — {len(trees)} S-tree leaves")

        if sel is not None:
            t = trees[sel]
            n = len(t["sums"])
            img = rasterize_dtree(
                t["sums"].reshape(n, 4), t["children"].reshape(n, 4),
                args.res)
            ax2 = fig.add_subplot(1, ncols, 2)
            ax2.imshow(falsecolor(img, args.exposure), origin="lower")
            ax2.set_title(
                f"D-tree {sel}: {n} nodes, statWeight {t['stat_weight']}, "
                f"mean {t['mean']:.4g}")
            print(f"  selected leaf {sel}: pos {t['pos']}, "
                  f"{n} quadtree nodes")

        out = args.out or os.path.splitext(path)[0] + ".png"
        fig.tight_layout()
        fig.savefig(out, dpi=110)
        plt.close(fig)
        print(f"  wrote {out}")


if __name__ == "__main__":
    main()
