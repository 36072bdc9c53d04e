"""Regression tests for the round-1 advisor findings (ADVICE.md).

Covers: stable ensemble mesh cache keys, DD.powi(x, 0), pallas_phase
pickling of the pre-resolution setting, in-graph callbacks combined with
events on the stepwise drivers, and get_tstate() before eval_taylor_map().
"""

import pickle

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu import models
from heyoka_tpu.expr import core as ec


def test_get_tstate_before_eval_taylor_map():
    vsys = hy.var_ode_sys(models.pendulum(), hy.VarArgs.vars)
    ta = hy.taylor_adaptive(vsys, [0.05, 0.025], tol=1e-12)
    ts = ta.get_tstate()
    assert ts.shape == (2,)
    assert np.all(ts == 0.0)
    # after an eval it returns the evaluated map
    ta.propagate_until(1.0)
    ts2 = np.asarray(ta.eval_taylor_map(np.zeros(2)))
    assert np.allclose(np.asarray(ta.get_tstate()), ts2)


def test_ingraph_callback_with_events_scalar():
    # An AngleReducer (in-graph) combined with a non-terminal event used to
    # TypeError in the stepwise drivers; now adapted host-side.
    x, v = ec.make_vars("x", "v")
    ev = hy.nt_event(v, lambda ta, t, d_sgn: None)
    ta = hy.taylor_adaptive(
        models.pendulum(), [3.0, 0.025], tol=1e-12, nt_events=[ev]
    )
    oc = ta.propagate_until(20.0, callback=hy.callback.AngleReducer(["x"]))
    assert 0.0 <= float(np.asarray(ta.state)[0]) < 2 * np.pi


def test_ingraph_callback_with_events_batch():
    ev = hy.nt_event(ec.make_vars("v"), lambda ta, t, d_sgn, i: None)
    st = np.array([[3.0, 0.02], [3.1, 0.01], [2.9, 0.03], [3.05, 0.0]])
    tb = hy.taylor_adaptive_batch(
        models.pendulum(), st, tol=1e-12, nt_events=[ev]
    )
    tb.propagate_until(
        np.full(4, 20.0), callback=hy.callback.AngleReducer(["x"])
    )
    assert np.all(np.asarray(tb.state)[:, 0] >= 0.0)
    assert np.all(np.asarray(tb.state)[:, 0] < 2 * np.pi)


def test_pallas_phase_pickle_preserves_auto():
    st = np.tile([0.05, 0.025], (4, 1))
    tb = hy.taylor_adaptive_batch(
        models.pendulum(), st, tol=1e-12, compact_mode="flat",
        mp_order=None, pallas_phase="auto",
    )
    # on CPU "auto" resolves to False in-process...
    assert tb._pallas_phase in (False, "dd")
    # ...but the pickle must carry the pre-resolution setting
    st2 = pickle.loads(pickle.dumps(tb))
    assert st2._pallas_phase_setting == "auto"


def test_dd_powi_zero():
    from heyoka_tpu.taylor.pallas_phase import _mk_arith
    import jax.numpy as jnp

    _F32, DD = _mk_arith(jnp, barriers=False)
    x = (jnp.asarray([2.0], jnp.float32), jnp.asarray([0.0], jnp.float32))
    hi, lo = DD.powi(x, 0)
    assert float(hi[0]) == 1.0 and float(lo[0]) == 0.0


def test_mesh_cache_key_stable():
    from heyoka_tpu.ensemble import _mesh_key
    import jax
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[:2])
    m1 = Mesh(devs, ("traj",))
    m2 = Mesh(devs, ("traj",))
    assert _mesh_key(m1) == _mesh_key(m2)
    assert _mesh_key(None) is None
