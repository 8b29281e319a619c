"""Interactive progressive render viewer: the stand-in for the
reference's Qt GUI (src/mtsgui, ~12k LoC — tabbed render views fed live
by RenderQueue listeners). This tool renders a scene progressively
(pass-sized sample batches, like BlockedRenderProcess results streaming
into the view) into a matplotlib window with exposure/gamma control.

Runs headless under the Agg backend for tests/CI (--updates N --out
f.png renders N progressive updates and saves instead of showing).

Usage:
  python -m ppg_tpu.tools.gui scene.xml [--spp-per-update 4]
      [--updates N] [--exposure E] [--out out.png] [-D key=value]
Keys (interactive): +/- exposure, q quit.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def tonemap(img, exposure=0.0, gamma=2.2):
    x = np.maximum(img, 0.0) * (2.0 ** exposure)
    srgb = np.where(x <= 0.0031308, x * 12.92,
                    1.055 * np.maximum(x, 1e-9) ** (1.0 / gamma) - 0.055)
    return np.clip(srgb, 0.0, 1.0)


class ProgressiveRenderer:
    """Accumulates pass-sized batches; view() returns the running mean
    (the RenderQueue/Film develop analog)."""

    def __init__(self, scene, spp_per_update=4, seed=0, chunk=1 << 16):
        from ..integrators.driver import make_config

        self.sc = scene
        self.cfg = make_config(scene, guiding=False)
        self.spp_per_update = spp_per_update
        self.chunk = chunk
        self.seed = seed
        self.n_updates = 0
        self.acc = None
        self.dev = None

    def step(self):
        from ..integrators.driver import (DeviceScene, regen_eligible,
                                          render, render_regen)

        if self.dev is None:
            self.dev = DeviceScene.from_scene(self.sc)
        fn = (render_regen if regen_eligible(self.sc, self.cfg) else render)
        img = fn(self.sc, spp=self.spp_per_update,
                 seed=self.seed + 7919 * self.n_updates, chunk=self.chunk,
                 cfg=self.cfg, scene_dev=self.dev)
        self.acc = img if self.acc is None else (
            (self.acc * self.n_updates + img) / (self.n_updates + 1))
        self.n_updates += 1
        return self.acc

    @property
    def spp(self):
        return self.n_updates * self.spp_per_update


def run_gui(scene_path, defines=None, spp_per_update=4, updates=None,
            exposure=0.0, out=None, chunk=1 << 16):
    from .. import enable_compilation_cache
    from ..scene.scene import load_scene

    enable_compilation_cache()
    headless = updates is not None
    if headless:
        import matplotlib

        matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    sc = load_scene(scene_path, defines or {})
    pr = ProgressiveRenderer(sc, spp_per_update, chunk=chunk)

    fig, ax = plt.subplots(figsize=(8, 8 * sc.film["height"]
                                    / max(sc.film["width"], 1)))
    ax.set_axis_off()
    im = ax.imshow(np.zeros((sc.film["height"], sc.film["width"], 3)))
    state = {"exposure": exposure, "quit": False}

    def refresh():
        if pr.acc is not None:
            im.set_data(tonemap(pr.acc, state["exposure"]))
        ax.set_title(f"{os.path.basename(scene_path)} — {pr.spp} spp "
                     f"(exposure {state['exposure']:+.1f})")
        fig.canvas.draw_idle()

    def on_key(ev):
        if ev.key in ("+", "="):
            state["exposure"] += 0.5
        elif ev.key == "-":
            state["exposure"] -= 0.5
        elif ev.key == "q":
            state["quit"] = True
        refresh()

    fig.canvas.mpl_connect("key_press_event", on_key)
    if not headless:
        plt.ion()
        plt.show()

    n = 0
    while not state["quit"] and (updates is None or n < updates):
        pr.step()
        refresh()
        if not headless:
            plt.pause(0.01)
            if not plt.fignum_exists(fig.number):
                break
        n += 1

    if out:
        fig.savefig(out, dpi=110, bbox_inches="tight")
        print(f"wrote {out}")
    if not headless:
        plt.ioff()
        plt.show()
    return pr


def main(argv=None):
    ap = argparse.ArgumentParser(
        prog="ppg-gui", description="progressive render viewer")
    ap.add_argument("scene")
    ap.add_argument("--spp-per-update", type=int, default=4)
    ap.add_argument("--updates", type=int, default=None,
                    help="headless: render N updates and exit")
    ap.add_argument("--exposure", type=float, default=0.0)
    ap.add_argument("--out", default=None)
    ap.add_argument("--chunk", type=int, default=1 << 16)
    ap.add_argument("-D", dest="defines", action="append", default=[])
    args = ap.parse_args(argv)
    defines = dict(d.split("=", 1) for d in args.defines)
    run_gui(args.scene, defines, args.spp_per_update, args.updates,
            args.exposure, args.out, args.chunk)


if __name__ == "__main__":
    main()
