"""Ablate the cbox-improved axes to find which one costs us quality.

Round-4 parity: cbox default beats the reference (mse_ratio 0.907) but
cbox-improved lags (1.246 > the 1.10 gate). The reference's improved
config (scenes/cbox/cbox-improved.xml) stacks five axes on the default:
inversevar combination, kl sampling-fraction loss, stochastic spatial +
box directional filters, sTreeThreshold 4000, sppPerPass 1. This
renders cbox at the full 512x512 / 127 spp protocol once per single
axis (plus default and full-improved ends) against the committed
parity GT and prints an MSE table — the axis whose solo gain falls
furthest short of its reference-side gain is the bug.

Usage: python tools/bench/ablate_improved.py [axis ...]
(no args = all; each run ~2-4 min on TPU)
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np

from ppg_tpu.integrators.guided import GuidedPathTracer
from ppg_tpu.io.exr import read
from ppg_tpu.scene.scene import load_scene

AXES = {
    "default": {},
    "inversevar": dict(sampleCombination="inversevar"),
    "kl": dict(bsdfSamplingFractionLoss="kl"),
    "stochastic": dict(spatialFilter="stochastic"),
    "dirbox": dict(directionalFilter="box"),
    "spp1": dict(sppPerPass=1),
    "stree4000": dict(sTreeThreshold=4000),
    "filters": dict(spatialFilter="stochastic", directionalFilter="box"),
    "improved": dict(sampleCombination="inversevar",
                     bsdfSamplingFractionLoss="kl",
                     spatialFilter="stochastic",
                     directionalFilter="box",
                     sTreeThreshold=4000, sppPerPass=1),
}


def main():
    names = sys.argv[1:] or list(AXES)
    gt = np.asarray(read("/root/repo/parity/gt/cbox-gt.exr")[0])
    sc = load_scene("/root/reference/scenes/cbox/cbox.xml")
    for name in names:
        ov = AXES[name]
        t0 = time.time()
        gp = GuidedPathTracer(sc, overrides=ov)
        img = gp.render(seed=0, spp_budget=127)
        mse = float(np.mean((img - gt) ** 2))
        rel = float(np.mean((img - gt) ** 2 / (gt * gt + 1e-2)))
        print(json.dumps(dict(axis=name, mse=mse, relmse=rel,
                              seconds=round(time.time() - t0, 1))),
              flush=True)


if __name__ == "__main__":
    main()
