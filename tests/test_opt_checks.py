"""Engine-provenance assertions (the reference's opt_checks analog).

Reference: ``test/opt_checks.cpp`` asserts IR-level properties of the
emitted code (vectorization actually happened).  The rebuild's equivalent
danger is silent fallback ladders — pallas "auto" resolving to the XLA
phase, fused->flat, codegen->interpreter — leaving a production config
quietly running a slower engine.  ``engine_report()``/``assert_engine()``
expose the resolved engines; these tests prove a forced fallback is
caught (VERDICT r4 item 6).
"""

import numpy as np
import pytest

import jax

import heyoka_tpu as hy
from heyoka_tpu.models import nbody


MASSES = [1.0, 1.0 / 1047.355]


def _tb(**kw):
    rng = np.random.default_rng(0)
    ic = np.array([0., 0., 0., 0., 0., 0., 1., 0., 0., 0., 6.28, 0.])
    st = ic[None, :] + rng.uniform(-1, 1, (8, 12)) * 1e-9
    return hy.taylor_adaptive_batch(nbody(2, masses=MASSES), st,
                                    tol=1e-15, high_accuracy=True, **kw)


def test_production_interpret_config_rides_fused():
    # the CPU-executable twin of the TPU production config must resolve
    # to the fused multi-step kernel driver
    tb = _tb(compact_mode="flat", mp_order=8, pallas_phase="dd-interpret")
    tb.assert_engine(propagate_engine="fused",
                     pallas_phase="dd-interpret", compact_mode="flat")


def test_forced_fallback_is_caught(monkeypatch):
    # break the fused builder: "auto" silently falls back to the per-step
    # flat driver — assert_engine must catch exactly that
    from heyoka_tpu.taylor import batch as batch_mod
    from heyoka_tpu.taylor.pallas_phase import UnsupportedPallasOp

    import heyoka_tpu.taylor.fused as fused_mod

    def _broken(*a, **k):
        raise UnsupportedPallasOp("forced for the opt-check test")

    monkeypatch.setattr(fused_mod, "make_propagate_until_fused", _broken)
    tb = _tb(compact_mode="flat", mp_order=8, pallas_phase="dd-interpret")
    rep = tb.engine_report()
    assert rep["propagate_engine"] == "flat"
    with pytest.raises(AssertionError, match="engine check failed"):
        tb.assert_engine(propagate_engine="fused")


def test_fused_prop_true_refuses_fallback(monkeypatch):
    # fused_prop=True is the hard form: no silent ladder, the ctor-level
    # driver build raises instead of degrading
    from heyoka_tpu.taylor.pallas_phase import UnsupportedPallasOp

    import heyoka_tpu.taylor.fused as fused_mod

    def _broken(*a, **k):
        raise UnsupportedPallasOp("forced for the opt-check test")

    monkeypatch.setattr(fused_mod, "make_propagate_until_fused", _broken)
    tb = _tb(compact_mode="flat", mp_order=8, pallas_phase="dd-interpret",
             fused_prop=True)
    with pytest.raises(UnsupportedPallasOp):
        tb.engine_report()


def test_auto_resolution_on_cpu_is_staged_xla():
    # pallas "auto" on a CPU backend resolves to the staged XLA phase —
    # documented behavior, and the report must say so (not "dd")
    tb = _tb(compact_mode="flat", mp_order=8, pallas_phase="auto")
    rep = tb.engine_report()
    assert rep["pallas_phase"] in (False, "dd") and rep["pallas_phase"] != "dd"
    assert rep["propagate_engine"] == "flat"


def test_native_backend_reports_engine():
    tb = _tb(backend="auto")
    rep = tb.engine_report()
    if tb.backend == "native":
        assert rep["propagate_engine"] in ("native-cg", "native-interp")
    else:
        assert rep["propagate_engine"] in ("loop", "flat")


@pytest.mark.skipif(jax.default_backend() == "cpu",
                    reason="Mosaic custom-call check needs a TPU backend")
def test_hlo_contains_tpu_custom_call():
    # the literal opt_checks analog: the compiled production propagate
    # program must contain the Mosaic kernel custom-call
    import jax.numpy as jnp

    tb = _tb(compact_mode="flat", mp_order=8, pallas_phase="dd")
    tb.assert_engine(propagate_engine="fused", pallas_phase="dd")
    B = tb.batch_size
    zero = jnp.zeros((B,))
    args = (tb._state, tb._pars, tb._t_hi, tb._t_lo, zero, zero,
            jnp.full((B,), jnp.inf), jnp.asarray(0, jnp.int64))
    txt = tb._pu_jit.lower(*args).as_text()
    assert "tpu_custom_call" in txt or "custom_call" in txt
