"""Oracle tests for the guided iteration drivers (renderSPP / renderTime).

The oracle is an independent pure-python transcription of the reference
scheduling logic (guided_path.cpp:1342-1427 renderSPP, :1434-1514
renderTime): iteration pass counts, the merge-final rule, the variance
extrapolation order (currentVarAtEnd = passesThisIteration * variance /
remainingPasses computed BEFORE remainingPasses is decremented,
:1389-1398), and the automatic-budget FINAL extension trigger
(:1399-1414).  The production driver (GuidedPathTracer.render /
_render_time) is run with a stubbed _render_passes fed scripted variance
sequences; the resulting pass schedules must be identical.
"""

import math

import numpy as np
import pytest

from ppg_tpu.integrators import guided as guided_mod
from ppg_tpu.integrators.guided import GuidedPathTracer


# ---------------------------------------------------------------------------
# oracle: verbatim transcription of the reference C++ driver decisions
# ---------------------------------------------------------------------------

def reference_spp_schedule(budget_spp, spp_per_pass, variances, automatic):
    """guided_path.cpp:1342-1427. Returns [(passes, is_final), ...]; one
    variance is consumed per performRenderPasses call."""
    n_passes = int(math.ceil(budget_spp / float(spp_per_pass)))
    sched = []
    vi = 0
    passes_rendered = 0
    it = 0
    cur_var_at_end = float("inf")
    while passes_rendered < n_passes:
        spp_rendered = passes_rendered * spp_per_pass
        remaining = n_passes - passes_rendered
        pti = min(remaining, 1 << it)
        if remaining - pti < 2 * pti:       # merge-final (:1372-1374)
            pti = remaining
        is_final = pti >= remaining
        sched.append((pti, is_final))
        variance = variances[vi]
        vi += 1
        passes_rendered += pti
        last_var = cur_var_at_end
        cur_var_at_end = pti * variance / remaining   # PRE-subtraction (:1390)
        remaining -= pti                              # (:1398)
        if automatic and remaining > 0 and (
            remaining < pti
            or (spp_rendered > 256 and cur_var_at_end > last_var)
        ):                                             # (:1399-1408)
            sched.append((remaining, True))
            vi += 1
            passes_rendered += remaining
        it += 1
    return sched


def reference_time_schedule(n_seconds, spp_per_pass, script, automatic):
    """guided_path.cpp:1434-1514. `script` maps call index -> (seconds,
    variance) for each performRenderPasses call. Returns
    [(passes, is_final), ...]."""
    sched = []
    ci = 0
    passes_rendered = 0
    it = 0
    cur_var_at_end = float("inf")
    elapsed = 0.0
    while elapsed < n_seconds:
        spp_rendered = passes_rendered * spp_per_pass
        remaining_time = n_seconds - elapsed          # (:1457)
        pti = 1 << it
        seconds_iter, variance = script[ci]
        ci += 1
        sched.append((pti, False))
        elapsed += seconds_iter
        passes_rendered += pti
        last_var = cur_var_at_end
        cur_var_at_end = seconds_iter * variance / remaining_time  # (:1477)
        remaining_time -= seconds_iter                              # (:1483)
        if automatic and remaining_time > 0 and (
            remaining_time < seconds_iter
            or (spp_rendered > 256 and cur_var_at_end > last_var)
        ):
            while True:                                # do-while (:1494-1500)
                seconds_ext, _ = script[ci]
                ci += 1
                sched.append((pti, True))
                elapsed += seconds_ext
                passes_rendered += pti
                if elapsed >= n_seconds:
                    break
        it += 1
    return sched


# ---------------------------------------------------------------------------
# probe: drive the REAL production driver with stubbed render passes
# ---------------------------------------------------------------------------

class _FakeHostTree:
    def pull(self, sdtree):
        pass

    def refine_and_reset(self, *a, **k):
        pass

    def build(self):
        pass

    def distribution_stats(self):
        z = {"min": 0, "avg": 0.0, "max": 0}
        return dict(n_dtrees=1, stree_depth=1, approx_memory_mb=0.0,
                    depth=z, mean_radiance=z, nodes=z, stat_weight=z)


class _FakeClock:
    """Deterministic stand-in for the `time` module inside guided.py."""

    def __init__(self):
        self.now = 1000.0

    def time(self):
        return self.now


class _DriverProbe(GuidedPathTracer):
    """GuidedPathTracer with _render_passes replaced by a script reader.
    Exercises the real render()/_render_time() control flow only."""

    def __init__(self, spp_per_pass, sample_combination, variances,
                 budget_type="spp", budget=None, seconds_script=None,
                 clock=None, image_values=None):
        self.spp_per_pass = spp_per_pass
        self.sample_combination = sample_combination
        self.budget_type = budget_type
        self.budget = budget
        self.nee = "never"
        self.s_tree_threshold = 12000
        self.d_tree_threshold = 0.01
        self.sd_tree_max_mb = -1
        self.dump_sdtree = False
        self.dump_path = None
        self.host_tree = _FakeHostTree()
        self.stats = []
        self.tree_stats = []
        self.flush_cb = None
        self._variances = list(variances)
        self._seconds_script = list(seconds_script or [])
        self._clock = clock
        self._image_values = list(image_values or [])
        self._call = 0
        self.schedule = []

    def _zeros(self):
        return (np.zeros((2, 2, 3), np.float32), np.zeros((2, 2), np.float32))

    def _to_image_buffers(self, buf):
        return buf

    def _push(self):
        return None

    def _render_passes(self, n_passes, sdtree, is_built, do_nee, is_final,
                       film_buf, seed_base):
        self.schedule.append((int(n_passes), bool(is_final)))
        i = self._call
        self._call += 1
        variance = self._variances[i] if i < len(self._variances) \
            else self._variances[-1]
        if self._clock is not None:
            self._seconds = self._seconds_script[i] \
                if i < len(self._seconds_script) else self._seconds_script[-1]
            self._clock.now += self._seconds
        val = self._image_values[i] if i < len(self._image_values) else 0.0
        image = np.full((2, 2, 3), val, np.float32)
        return sdtree, film_buf, image, variance


# ---------------------------------------------------------------------------
# SPP-budget scenarios
# ---------------------------------------------------------------------------

SPP_SCENARIOS = [
    # (name, budget_spp, spp_per_pass, combination, variances)
    ("cbox_default", 127, 4, "automatic", [1.0] * 8),
    ("flat_var", 128, 4, "automatic", [0.5] * 8),
    # decreasing variance: extension must never fire
    ("decreasing", 512, 16, "automatic",
     [1.0, 0.5, 0.25, 0.12, 0.06, 0.03]),
    # variance bump late enough that sppRendered > 256: extension fires
    ("late_bump", 256, 64, "automatic", [1.0, 1.0, 40.0, 1.0, 1.0]),
    # the order-of-operations discriminator: old (buggy) code divided by the
    # POST-subtraction remaining and would fire the extension here; the
    # reference does not. it2 of 64 passes @128spp/pass: last = 2*v1/63,
    # pti=4, remaining(pre)=61, post=57. v2 chosen so
    # 4*v2/61 < 2*v1/63 < 4*v2/57.
    ("order_discriminator", 64 * 128, 128, "automatic",
     [3.0, 1.0, 0.47, 1.0, 1.0, 1.0]),
    ("inversevar_no_ext", 64 * 128, 128, "inversevar",
     [3.0, 1.0, 0.47, 1.0, 1.0, 1.0]),
    ("single_pass", 4, 4, "automatic", [1.0]),
    ("three_passes", 12, 4, "automatic", [1.0, 1.0]),
    ("inversevar_flat", 508, 4, "inversevar", [1.0] * 10),
]


@pytest.mark.parametrize("name,budget,spp,comb,variances", SPP_SCENARIOS)
def test_spp_driver_matches_reference(name, budget, spp, comb, variances):
    oracle = reference_spp_schedule(budget, spp, variances,
                                    automatic=(comb == "automatic"))
    probe = _DriverProbe(spp, comb, variances, budget_type="spp")
    probe.render(seed=0, spp_budget=budget)
    assert probe.schedule == oracle, (
        f"{name}: production schedule {probe.schedule} != oracle {oracle}")
    # total budget is always exactly consumed
    assert sum(p for p, _ in probe.schedule) == math.ceil(budget / spp)


def test_order_discriminator_is_discriminating():
    """The buggy post-subtraction order must yield a DIFFERENT schedule on
    the discriminator scenario (guards against the oracle test passing
    vacuously)."""
    _, budget, spp, comb, variances = SPP_SCENARIOS[4]

    def buggy_schedule():
        n_passes = budget // spp
        sched = []
        vi = passes_rendered = it = 0
        cur = float("inf")
        while passes_rendered < n_passes:
            spp_rendered = passes_rendered * spp
            remaining = n_passes - passes_rendered
            pti = min(remaining, 1 << it)
            if remaining - pti < 2 * pti:
                pti = remaining
            sched.append((pti, pti >= remaining))
            v = variances[vi]
            vi += 1
            passes_rendered += pti
            last = cur
            remaining -= pti                      # WRONG ORDER (pre-round-3)
            cur = pti * v / remaining if remaining > 0 else 0.0
            if remaining > 0 and (remaining < pti
                                  or (spp_rendered > 256 and cur > last)):
                sched.append((remaining, True))
                vi += 1
                passes_rendered += remaining
            it += 1
        return sched

    oracle = reference_spp_schedule(budget, spp, variances, automatic=True)
    assert buggy_schedule() != oracle


def test_inversevar_combination_weights():
    """Final image = inverse-variance blend of the LAST <=4 iteration images
    (guided_path.cpp:1567-1582)."""
    budget, spp = 508, 4   # doubling: 1,2,4,8,16,32,64 final -> 7 iterations
    variances = [1.0, 0.5, 0.25, 0.125, 0.0625, 0.03125, 0.016]
    img_vals = [1.0, 2.0, 3.0, 4.0, 5.0, 6.0, 7.0]
    probe = _DriverProbe(spp, "inversevar", variances, budget_type="spp",
                         image_values=img_vals)
    final = probe.render(seed=0, spp_budget=budget)
    assert len(probe.schedule) == 7
    w = 1.0 / np.array(variances[-4:])
    w /= w.sum()
    expect = float((w * np.array(img_vals[-4:])).sum())
    assert np.allclose(final, expect, rtol=1e-5)


# ---------------------------------------------------------------------------
# time-budget scenarios
# ---------------------------------------------------------------------------

TIME_SCENARIOS = [
    # (name, n_seconds, spp_per_pass, [(seconds, variance), ...])
    # iterations double in passes; seconds roughly double too
    ("steady", 30.0, 4,
     [(2.0, 1.0), (4.0, 0.5), (8.0, 0.25), (16.0, 0.12), (16.0, 0.06)]),
    # budget runs out exactly at an iteration boundary
    ("exact_boundary", 6.0, 4, [(2.0, 1.0), (4.0, 0.5), (8.0, 0.2)]),
    # remaining_time < seconds_iter after a slow iteration: extension fires
    # and loops whole batches until the clock passes the budget
    ("slow_iter_extension", 20.0, 4,
     [(2.0, 1.0), (11.0, 0.5), (4.0, 0.5), (4.0, 0.5)]),
    # variance bump with sppRendered > 256 triggers the extension
    ("var_bump_extension", 40.0, 128,
     [(2.0, 1.0), (4.0, 1.0), (8.0, 9.0), (8.0, 1.0), (8.0, 1.0),
      (8.0, 1.0), (8.0, 1.0)]),
    # first iteration blows the whole budget
    ("one_shot", 5.0, 4, [(9.0, 1.0)]),
]


@pytest.mark.parametrize("name,n_seconds,spp,script", TIME_SCENARIOS)
def test_time_driver_matches_reference(name, n_seconds, spp, script,
                                       monkeypatch):
    oracle = reference_time_schedule(n_seconds, spp, script, automatic=True)
    clock = _FakeClock()
    monkeypatch.setattr(guided_mod, "time", clock)
    probe = _DriverProbe(spp, "automatic",
                         [v for _, v in script],
                         budget_type="seconds", budget=n_seconds,
                         seconds_script=[s for s, _ in script], clock=clock)
    probe.render(seed=0)
    assert probe.schedule == oracle, (
        f"{name}: production schedule {probe.schedule} != oracle {oracle}")
