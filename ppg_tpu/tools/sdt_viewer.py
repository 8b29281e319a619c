"""SD-tree visualizer: the reference's nanogui/OpenGL tool
(visualizer/src/main.cpp) re-done headless — reads one or more .sdt
snapshots (bit-compatible format, io/sdt.py) and renders:

  * a 3D scatter of spatial-tree leaf centers colored by mean radiance
    (false-color log scale, like the GL point cloud at main.cpp:580-623)
  * the directional quadtree of a selected leaf rasterized to a
    2^depth x 2^depth radiance map (DTree::loadData, main.cpp:192-209)
    with the same false-color HDR mapping + exposure control

Interactive mode (--interactive) matches the reference app's workflow
(visualizer/src/main.cpp:314-623):

  * click a point in the 3D leaf cloud -> nearest leaf in *display*
    space is picked (the analog of updateDTree's pick-ray nearest
    search, main.cpp:580-603) and its quadtree radiance map refreshes
  * mouse over the radiance map -> per-pixel radiance and the pixel's
    fraction of the tree total in the title bar (ImageView pixel probe,
    main.cpp:498-517)
  * keys: +/- exposure (exposure slider), [ / ] switch between several
    loaded .sdt iterations, matplotlib's built-in 3D drag = orbit/zoom

Usage:
  python -m ppg_tpu.tools.sdt_viewer run-01.sdt [-o out.png]
      [--select-point x y z | --select-index N] [--exposure E]
      [--res 512] [--interactive]
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


class InteractiveViewer:
    """Stateful matplotlib viewer over >=1 .sdt snapshots.

    Testable headless: the event handlers (`pick_display`,
    `set_exposure`, `switch_file`, `probe`) are plain methods the tests
    drive directly with synthetic coordinates (tests/test_sdt_viewer.py),
    and `show()` only enters the GUI loop when a display backend exists.
    """

    def __init__(self, paths, res=256, exposure=0.0):
        import matplotlib.pyplot as plt

        self.paths = list(paths)
        self.res = res
        self.exposure = exposure
        self.file_idx = 0
        self.sel = 0
        self._cache = {}
        self._load()

        self.fig = plt.figure(figsize=(13, 6))
        self.ax3d = self.fig.add_subplot(1, 2, 1, projection="3d")
        self.ax2d = self.fig.add_subplot(1, 2, 2)
        self.fig.canvas.mpl_connect("button_press_event", self._on_click)
        self.fig.canvas.mpl_connect("key_press_event", self._on_key)
        self.fig.canvas.mpl_connect("motion_notify_event", self._on_motion)
        self.redraw()

    # -- data ------------------------------------------------------------
    def _load(self):
        path = self.paths[self.file_idx]
        if path not in self._cache:
            cam, trees = read_sdt(path)
            pos = np.array([t["pos"] for t in trees])
            size = np.array([t["size"] for t in trees])
            means = np.array([t["mean"] for t in trees])
            self._cache[path] = (cam, trees, pos + 0.5 * size, means)
        self.cam, self.trees, self.centers, self.means = self._cache[path]
        self.sel = min(self.sel, len(self.trees) - 1)

    # -- event handlers (also the headless-test API) ---------------------
    def pick_display(self, x2, y2):
        """Pick the leaf nearest to display point (x2, y2) — the
        screen-space equivalent of the reference's pick-ray nearest
        leaf (main.cpp:580-603). Returns the selected index."""
        from mpl_toolkits.mplot3d import proj3d

        xs, ys, _ = proj3d.proj_transform(
            self.centers[:, 0], self.centers[:, 1], self.centers[:, 2],
            self.ax3d.get_proj())
        pts = self.ax3d.transData.transform(np.column_stack([xs, ys]))
        self.sel = int(np.argmin(((pts - [x2, y2]) ** 2).sum(-1)))
        self.redraw()
        return self.sel

    def set_exposure(self, delta):
        self.exposure += delta
        self.redraw()
        return self.exposure

    def switch_file(self, step):
        self.file_idx = (self.file_idx + step) % len(self.paths)
        self._load()
        self.redraw()
        return self.file_idx

    def probe(self, ix, iy):
        """Radiance-map pixel probe: (value, percent-of-total) at integer
        pixel (ix, iy) of the current map (main.cpp:498-517)."""
        if not (0 <= ix < self.res and 0 <= iy < self.res):
            return None
        v = float(self.img[iy, ix])
        total = float(self.img.sum())
        return v, (100.0 * v / total if total > 0 else 0.0)

    # -- matplotlib plumbing ---------------------------------------------
    def _on_click(self, ev):
        if ev.inaxes is self.ax3d and ev.x is not None:
            self.pick_display(ev.x, ev.y)

    def _on_key(self, ev):
        if ev.key in ("+", "="):
            self.set_exposure(0.5)
        elif ev.key == "-":
            self.set_exposure(-0.5)
        elif ev.key == "]":
            self.switch_file(1)
        elif ev.key == "[":
            self.switch_file(-1)

    def _on_motion(self, ev):
        if ev.inaxes is self.ax2d and ev.xdata is not None:
            p = self.probe(int(ev.xdata), int(ev.ydata))
            if p is not None:
                self.ax2d.set_xlabel(
                    f"radiance {p[0]:.4g}  ({p[1]:.2f}% of total)")
                self.fig.canvas.draw_idle()

    def redraw(self):
        t = self.trees[self.sel]
        n = len(t["sums"])
        self.img = rasterize_dtree(
            t["sums"].reshape(n, 4), t["children"].reshape(n, 4), self.res)

        self.ax3d.clear()
        c = falsecolor(self.means, self.exposure)
        sizes = np.full(len(self.centers), 4.0)
        sizes[self.sel] = 40.0
        self.ax3d.scatter(self.centers[:, 0], self.centers[:, 1],
                          self.centers[:, 2], c=c, s=sizes)
        self.ax3d.set_title(
            f"{os.path.basename(self.paths[self.file_idx])} — "
            f"{len(self.trees)} leaves (click to pick; [ ] iter, +/- exp)")

        self.ax2d.clear()
        self.ax2d.imshow(falsecolor(self.img, self.exposure), origin="lower")
        self.ax2d.set_title(
            f"D-tree {self.sel}: {n} nodes, statWeight {t['stat_weight']}, "
            f"mean {t['mean']:.4g}, exposure {self.exposure:+.1f}")
        self.fig.canvas.draw_idle()

    def show(self):
        import matplotlib
        import matplotlib.pyplot as plt

        if matplotlib.get_backend().lower() == "agg":
            print("no display backend — interactive mode needs a GUI; "
                  "falling back to a static dump")
            return False
        plt.show()
        return True


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
    ap.add_argument("--interactive", action="store_true",
                    help="open the click-to-pick viewer (needs a display)")
    args = ap.parse_args(argv)

    import matplotlib

    if args.interactive:
        viewer = InteractiveViewer(args.sdt, res=args.res,
                                   exposure=args.exposure)
        if viewer.show():
            return

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
