"""Round-4 series fast path (VERDICT r3 item 5): head/tail two-f32
evaluation and flat-engine support for ``trig_series`` tapes.

Reference anchor: the series evaluation behind
``/root/reference/src/model/vsop2013.cpp`` / ``src/detail/vsop2013/*``
(f64 on CPU; the threshold parameter already truncates the series at
~1e-9 relative, which bounds the accuracy the tail path must preserve).
"""
import numpy as np
import pytest

#: compile-heavy module: slow tier (see tests/conftest.py)
pytestmark = pytest.mark.slow

import heyoka_tpu as hy
from heyoka_tpu.expr import series as S


@pytest.fixture
def big_series(rng=None):
    rng = np.random.default_rng(11)
    n = 4000  # > _TAIL_MIN + head, forces a real tail split
    amp = (10.0 ** rng.uniform(-8, 0, n))[:, None]
    ph = np.stack([rng.uniform(-np.pi, np.pi, n),
                   rng.uniform(-400, 400, n),
                   rng.uniform(-3, 3, n)], axis=1)
    return amp, ph


def _numpy_eval(amp, ph, tv):
    a = amp[:, 0]
    p = ph[:, -1].copy()
    for j in range(ph.shape[1] - 2, -1, -1):
        p = p * tv + ph[:, j]
    return float(np.sum(a * np.sin(p)))


def test_fast_eval_matches_f64(big_series):
    amp, ph = big_series
    e = S.trig_series(hy.time, amp, ph)
    cf = hy.cfunc([e], [])
    for tv in (0.0, 0.37, -1.25, 12.0):
        got = float(np.asarray(cf([], time=tv))[0])
        ref = _numpy_eval(amp, ph, tv)
        # tail f32 error bound: ~6e-8 * SPLIT * max|amp| * sqrt(n_tail)
        assert got == pytest.approx(ref, abs=5e-9)
    d = S._split_store(S._STORE[S._key_for(amp, ph)])
    assert d["tail"] is not None  # the split actually engaged


def test_fast_jet_integration_matches_full(big_series):
    amp, ph = big_series
    e = S.trig_series(hy.time, amp, ph)
    x = hy.make_vars("x")
    sys_ = [(x, e * 0.01 + 0.0 * x)]
    st = np.array([[0.0], [0.5]])
    tv = 0.3

    tb = hy.taylor_adaptive_batch(sys_, st.copy(), tol=1e-15,
                                  time=np.full(2, tv))
    tb.propagate_until(tv + 0.05)
    s_fast = np.asarray(tb.state).copy()

    # full-precision oracle: disable the split (fresh split cache)
    old = S._FAST
    S._FAST = False
    try:
        for d in S._STORE.values():
            d.pop("head", None)
            d.pop("tail", None)
        tb2 = hy.taylor_adaptive_batch(sys_, st.copy(), tol=1e-15,
                                       time=np.full(2, tv))
        tb2.propagate_until(tv + 0.05)
        s_ref = np.asarray(tb2.state)
    finally:
        S._FAST = old
        for d in S._STORE.values():
            d.pop("head", None)
            d.pop("tail", None)
    assert np.abs(s_fast - s_ref).max() < 1e-9


def test_flat_engine_series_matches_loops(big_series):
    """The flat staged engine (f64 and scaled mixed-precision) must agree
    with the loops engine on a series tape — the flat+mp route is what
    keeps ELP2000-class coefficients within TPU's emulated-f64 range."""
    amp, ph = big_series
    e = S.trig_series(hy.time, amp, ph)
    x = hy.make_vars("x")
    sys_ = [(x, e * 0.01 + 0.0 * x)]
    st = np.array([[0.0], [0.5]])
    tv = 0.3

    tb_l = hy.taylor_adaptive_batch(sys_, st.copy(), tol=1e-15,
                                    time=np.full(2, tv))
    tb_l.propagate_until(tv + 0.05)
    s_l = np.asarray(tb_l.state)

    tb_f = hy.taylor_adaptive_batch(sys_, st.copy(), tol=1e-15,
                                    time=np.full(2, tv),
                                    compact_mode="flat")
    tb_f.propagate_until(tv + 0.05)
    assert np.abs(np.asarray(tb_f.state) - s_l).max() < 1e-13

    tb_m = hy.taylor_adaptive_batch(sys_, st.copy(), tol=1e-15,
                                    time=np.full(2, tv),
                                    compact_mode="flat", mp_order=8)
    tb_m.propagate_until(tv + 0.05)
    assert np.abs(np.asarray(tb_m.state) - s_l).max() < 1e-10


def test_elp2000_flat_mp_integration():
    """ELP2000 lunar tape through the flat scaled engine vs the loops f64
    oracle (the production TPU configuration for series tapes)."""
    from heyoka_tpu.models import elp2000_cartesian_e2000

    x, y, z = hy.make_vars("x", "y", "z")
    c = elp2000_cartesian_e2000(thresh=1e-4, series_op=True)
    sys_c = [(x, c[0] * 1e-10), (y, c[1] * 1e-10), (z, c[2] * 1e-10)]
    tb = hy.taylor_adaptive_batch(sys_c, np.zeros((2, 3)), tol=1e-15,
                                  compact_mode="flat", mp_order=8)
    tb.propagate_until(0.0005)
    s_m = np.asarray(tb.state)
    assert np.isfinite(s_m).all()
    tb2 = hy.taylor_adaptive_batch(sys_c, np.zeros((2, 3)), tol=1e-15)
    tb2.propagate_until(0.0005)
    s_l = np.asarray(tb2.state)
    assert np.abs((s_m - s_l) / np.maximum(np.abs(s_l), 1e-30)).max() < 1e-9


def test_mp_order_cap(monkeypatch):
    """On emulated-f64 backends mp_order is capped so series f64-phase
    coefficients stay representable (batch.py round-4 guard)."""
    import jax

    from heyoka_tpu.models import elp2000_cartesian_e2000

    x, y, z = hy.make_vars("x", "y", "z")
    c = elp2000_cartesian_e2000(thresh=1e-6, series_op=True)
    sys_c = [(x, c[0] * 1e-10), (y, c[1] * 1e-10), (z, c[2] * 1e-10)]
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    tb = hy.taylor_adaptive_batch(sys_c, np.zeros((1, 3)), tol=1e-15,
                                  compact_mode="flat", mp_order=8)
    assert tb._mp_order <= 7  # ELP rates cap near 6
    from heyoka_tpu.expr.series import mp_order_cap
    assert tb._mp_order == mp_order_cap(tb._tape)


def test_vsop_p9_flat_mp_long_run():
    """VSOP2013 p9 q/p tape through the flat scaled engine over ~370
    steps vs the loops f64 oracle.

    Regression (round 4): the scaled carry's top-order-ratio sig
    collapsed when the order-(mp-1) norm crossed zero mid-propagation —
    over-downscale, f32 underflow of the top rows, rho = inf, h = inf,
    NaN states.  The growth estimate is now cross-checked against the
    (mp-2, mp) pair and floored near the root estimator."""
    from heyoka_tpu.models import vsop2013_elliptic

    x, y = hy.make_vars("x", "y")
    q9 = vsop2013_elliptic(9, 5, thresh=1e-7, series_op=True)
    p9 = vsop2013_elliptic(9, 6, thresh=1e-7, series_op=True)
    sys_c = [(x, q9), (y, p9)]
    B = 2
    tb = hy.taylor_adaptive_batch(sys_c, np.zeros((B, 2)), tol=1e-15,
                                  compact_mode="flat", mp_order=5)
    tb.propagate_until(0.02)
    s1 = np.asarray(tb.state)
    assert np.isfinite(s1).all()
    tb2 = hy.taylor_adaptive_batch(sys_c, np.zeros((B, 2)), tol=1e-15)
    tb2.propagate_until(0.02)
    s2 = np.asarray(tb2.state)
    assert np.abs(s1 - s2).max() < 1e-10
