"""Regression: the staged engines' state update must evaluate in scaled
space (round-4 config-5 geopot audit).

XLA:TPU emulates f64 with the f32 exponent range.  For systems whose
natural Taylor step is large in the user's units (geopotential LEO in
km/s: h ~ 366 s at tol 1e-15), the unscaled compensated Horner
materializes h^16 ~ 1e41 (-> inf) against coefficients c_12 ~ 1e-38
(-> 0), producing inf * 0 = NaN on TPU — while the reference's native
f64 runs clean (/root/reference/benchmark/geopot.cpp).  The fix
evaluates sum d_i u^i with u = h 2^-sig_e in the mixed-precision
engines (compact_flat.make_batched_step_flat).

On CPU (real f64) the scaled and unscaled evaluations are bit-identical
for in-range problems, so these tests pin (a) that the scaled path's
accuracy matches the f64 oracle on the actual geopot config, and (b)
that the evaluation is genuinely running in scaled space (coefficients
magnitudes + power-of-two sig available) — the TPU-only inf*0 itself
can only manifest on real hardware, where benchmarks/geopot_bench.py
now asserts lane finiteness.
"""
import numpy as np
import pytest

#: compile-heavy module: slow tier (see tests/conftest.py)
pytestmark = pytest.mark.slow

import heyoka_tpu as hy
from heyoka_tpu.models import egm2008_acc, egm2008_pot, get_egm2008_a, \
    get_egm2008_mu


def _geopot_sys(deg=2):
    x, y, z, vx, vy, vz = hy.make_vars("x", "y", "z", "vx", "vy", "vz")
    ax, ay, az = egm2008_acc([x, y, z], deg, deg,
                             mu=get_egm2008_mu() / 1e9,
                             a=get_egm2008_a() / 1e3)
    return [(x, vx), (y, vy), (z, vz), (vx, ax), (vy, ay), (vz, az)], \
        [x, y, z, vx, vy, vz]


IC = np.array([6740.440, 0.0, 0.0, 0.0, 6.725973853066024,
               3.8832537950295855])


@pytest.mark.parametrize("ha", [True, False])
def test_geopot_scaled_step_matches_f64(ha):
    """Natural-step (h ~ 366 in user units) propagation through the
    scaled mixed-precision engine vs the pure-f64 engine."""
    sys_, _ = _geopot_sys()
    B = 4
    rng = np.random.default_rng(7)
    st = IC[None, :] + np.abs(IC)[None, :] * rng.uniform(-1, 1, (B, 6)) * 1e-6

    ta_mp = hy.taylor_adaptive_batch(
        sys_, st.copy(), tol=1e-15, high_accuracy=ha,
        compact_mode="flat", mp_order=8,
    )
    ta_64 = hy.taylor_adaptive_batch(
        sys_, st.copy(), tol=1e-15, high_accuracy=ha,
        compact_mode="flat",
    )
    # one NATURAL step first — h must not be clamped below ~366 or the
    # overflow-prone regime is never entered
    ta_mp.step()
    res = np.asarray(ta_mp.get_step_res(), dtype=np.float64)
    assert np.all(res[:, 1] > 300.0)  # natural (unclamped) steps
    ta_64.step()
    # then land both at a common time (the engines pick slightly
    # different natural h — f32 vs f64 rho — so per-step states are not
    # comparable; the landed states are)
    ta_mp.propagate_until(1500.0)
    ta_64.propagate_until(1500.0)
    s_mp = np.asarray(ta_mp.state)
    s_64 = np.asarray(ta_64.state)
    assert np.isfinite(s_mp).all()
    # mixed-precision noise floor over ~4 steps (dd ~2^-48/step + f32
    # tail truncation)
    assert np.max(np.abs(s_mp - s_64) / np.maximum(np.abs(s_64), 1.0)) < 1e-11


def test_geopot_energy_drift_natural_steps():
    """Energy (v^2/2 + U) conservation over an orbit of natural steps
    through the scaled engine."""
    sys_, svars = _geopot_sys()
    x, y, z, vx, vy, vz = svars
    U = egm2008_pot([x, y, z], 2, 2, mu=get_egm2008_mu() / 1e9,
                    a=get_egm2008_a() / 1e3)
    efn = hy.cfunc(
        [0.5 * (vx * vx + vy * vy + vz * vz) - U], svars
    )
    B = 4
    rng = np.random.default_rng(7)
    st = IC[None, :] + np.abs(IC)[None, :] * rng.uniform(-1, 1, (B, 6)) * 1e-6
    ta = hy.taylor_adaptive_batch(
        sys_, st.copy(), tol=1e-15, high_accuracy=True,
        compact_mode="flat", mp_order=8,
    )
    e0 = np.array([float(np.asarray(efn(s))[0]) for s in st])
    ta.propagate_until(5400.0)  # ~ one orbital period
    sf = np.asarray(ta.state)
    assert np.isfinite(sf).all()
    e1 = np.array([float(np.asarray(efn(s))[0]) for s in sf])
    drift = np.max(np.abs((e1 - e0) / e0))
    assert drift < 1e-11
