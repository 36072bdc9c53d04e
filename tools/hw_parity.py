#!/usr/bin/env python
"""Hardware parity sweep: integrate representative systems on the attached
jax device and compare end states against the independent native C++
backend (which shares no code with the XLA path below the tape encoding).

Motivated by the TPU event-detection incident (PERF.md: jnp.power's
exp/log lowering silently NaN'd the isolator on TPU only): op lowerings
differ between backends, and only end-to-end cross-backend comparison
catches the silent ones.

Expected levels (measured; see PERF.md "TPU f64 is double-float"): XLA
emulates f64 on TPU as two-float arithmetic with ~2^-48 unit roundoff and
inexact products, so trajectories with heavy cancellation/transcendental
content deviate from true-f64 at ~1e-9 over 10 time units, while
arithmetic-dominated flows hold ~1e-14.  The MISMATCH threshold is set an
order above the worst measured platform level — it flags *lowering bugs*
(NaNs, wrong branches), not the platform's precision class.

Run on the TPU:  python tools/hw_parity.py
"""

import sys

import numpy as np

sys.path.insert(0, "/root/repo")

import heyoka_tpu as hy  # noqa: E402
from heyoka_tpu.expr.decompose import taylor_decompose_sys  # noqa: E402
from heyoka_tpu.native import native_propagate_until  # noqa: E402

hy.s11n.enable_compilation_cache()

x, y = hy.make_vars("x", "y")

CASES = [
    ("pendulum", hy.models.pendulum(), [0.05, 0.025], 10.0, {}),
    ("nbody3", hy.models.nbody(3, masses=[1.0, 1e-3, 2e-3]),
     [0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 1.5, 0, -0.8, 0, 0], 5.0,
     dict(compact_mode=True)),
    ("trig", [(x, hy.sin(x) * hy.cos(y) + hy.tan(0.3 * x)),
              (y, hy.exp(-y) + hy.atan2(x, y) + x ** -1.5)],
     [0.7, 1.3], 1.0, {}),
    ("kepler", [(x, hy.kepE(0.3, y)), (y, hy.sqrt(x) + hy.log(y) + hy.erf(x))],
     [1.2, 0.8], 1.0, {}),
    ("inverse-trig", [(x, hy.asin(0.3 * y) + hy.tanh(x) + hy.sigmoid(y)),
                      (y, hy.acos(0.2 * x) + hy.atan(y) + hy.sinh(0.1 * x))],
     [0.3, 0.2], 1.0, {}),
    ("negpow", [(x, y ** -9), (y, -0.1 * x - 1.0 + 0.0 * y)],
     [0.5, -2.0], 1.0, {}),
    ("time-dep", [(x, hy.par[0] * hy.sin(hy.time) + 0.1 * x),
                  (y, hy.time * y - 9.8)],
     [0.4, 0.6], 1.0, dict(pars=[1.1])),
]


def main():
    import jax

    dev = jax.devices()[0]
    print(f"device: {dev.platform} {dev.device_kind}")
    worst = 0.0
    bad = []
    for name, sys_, ic, t_end, kw in CASES:
        pars = kw.pop("pars", None)
        ta = hy.taylor_adaptive(sys_, ic, tol=1e-15, pars=pars, **kw)
        ta.propagate_until(t_end)
        tape = taylor_decompose_sys(sys_)
        s, t, n = native_propagate_until(
            tape, ic, pars, 0.0, t_end, ta.order
        )
        scale = np.maximum(1.0, np.abs(s)).max()
        err = float(np.abs(np.asarray(ta.state) - s).max() / scale)
        worst = max(worst, err)
        status = "ok" if err < 1e-6 else "MISMATCH"
        if status != "ok":
            bad.append(name)
        print(f"{name:14s} rel-err vs native: {err:9.2e}  ({status})")
    print(f"worst: {worst:.2e}  mismatches: {bad or 'none'}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
