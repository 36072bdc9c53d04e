"""Engine auto-selection for stiff / fast-growing tapes (VERDICT r4 #5).

Reference anchor: ``benchmark/stiff_equation.cpp`` — y' = -lam (y - cos t),
lam = 1e5: Taylor coefficients grow like lam^k/k! (~8e77 at order 19),
far beyond the f32 exponent range that XLA:TPU's emulated f64 inherits.
On such backends, plain ``taylor_adaptive_batch`` must auto-promote the
scaled-carry flat engine instead of returning NaN.
"""

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu.native import native_available


def _stiff_sys(lam=1e5):
    y = hy.make_vars("y")
    return [(y, -lam * (y - hy.cos(hy.time)))]


@pytest.mark.skipif(not native_available(), reason="no host C++ compiler")
def test_auto_promotes_flat_on_emulated_backend(monkeypatch):
    import jax

    # pretend we are on an emulated-f64 backend (the real check is
    # jax.default_backend() != "cpu"); the probe itself runs on the host
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    tb = hy.taylor_adaptive_batch(_stiff_sys(), np.zeros((4, 1)), tol=1e-15)
    assert tb.compact_mode == "flat"
    assert tb._mp_order is not None and 1 <= tb._mp_order <= 8
    # the f64 phase stays within the emulated range at the chosen depth
    probe = tb._stiff_probe()
    assert float(np.nanmax(probe[: tb._mp_order + 1])) < 1e30


@pytest.mark.skipif(not native_available(), reason="no host C++ compiler")
def test_auto_respects_explicit_choice_and_env(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    # explicit engine choice wins
    tb = hy.taylor_adaptive_batch(_stiff_sys(), np.zeros((2, 1)), tol=1e-15,
                                  compact_mode=True)
    assert tb.compact_mode is True
    # escape hatch
    monkeypatch.setenv("HEYOKA_STIFF_AUTO", "0")
    tb2 = hy.taylor_adaptive_batch(_stiff_sys(), np.zeros((2, 1)), tol=1e-15)
    assert tb2.compact_mode is False


def test_non_stiff_unaffected(monkeypatch):
    import jax

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    x, v = hy.make_vars("x", "v")
    tb = hy.taylor_adaptive_batch([(x, v), (v, -hy.sin(x))],
                                  np.zeros((2, 2)), tol=1e-15)
    assert tb.compact_mode is False


def test_stiff_integrates_finite_on_this_backend():
    # on the CPU test backend the default engine handles the range; the
    # point here is end-to-end correctness of the stiff configuration
    # through the public API (the flat engine is what TPU would pick)
    tb = hy.taylor_adaptive_batch(_stiff_sys(), np.zeros((4, 1)), tol=1e-15,
                                  compact_mode="flat", mp_order=5)
    res = tb.propagate_until(np.full(4, 0.5))
    assert all(oc == hy.taylor_outcome.time_limit for oc in res[0])
    st = tb.state
    assert np.isfinite(st).all()
    # closed form: y -> (cos t + lam sin t / lam) damped transient;
    # steady solution y = (lam^2 cos t + lam sin t)/(1+lam^2)
    lam = 1e5
    t = 0.5
    y_exact = (lam * lam * np.cos(t) + lam * np.sin(t)) / (1 + lam * lam)
    assert np.allclose(st[:, 0], y_exact, rtol=1e-6)
