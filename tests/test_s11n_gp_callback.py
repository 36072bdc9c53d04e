"""Serialization, gp, callback and logging tests (reference analogs:
the per-class s11n roundtrips of test/*.cpp, test/gp.cpp,
test/step_callback.cpp, test/angle_reducer.cpp, test/logging.cpp)."""

import math
import os
import subprocess
import sys

import numpy as np
import pytest

import heyoka_tpu as hy
from heyoka_tpu.models import pendulum, pm_x


def test_expression_pickle():
    x, v = hy.make_vars("x", "v")
    e = hy.sin(x) * hy.par[0] + hy.time * v ** 2.5
    e2 = hy.s11n.loads(hy.s11n.dumps(e))
    assert e2 == e
    assert hash(e2) == hash(e)


def test_integrator_pickle_midflight():
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-12)
    ta.propagate_until(3.7)
    ta2 = hy.s11n.loads(hy.s11n.dumps(ta))
    assert ta2.time == ta.time
    assert ta2.order == ta.order
    np.testing.assert_array_equal(ta2.state, ta.state)
    np.testing.assert_array_equal(ta2.tc, ta.tc)
    # both continue identically
    ta.propagate_until(8.0)
    ta2.propagate_until(8.0)
    np.testing.assert_array_equal(ta.state, ta2.state)


def test_batch_integrator_pickle(rng):
    states = 0.05 + 0.01 * rng.standard_normal((4, 2))
    tab = hy.taylor_adaptive_batch(pendulum(), states, tol=1e-12)
    tab.propagate_until(2.0)
    tab2 = hy.s11n.loads(hy.s11n.dumps(tab))
    np.testing.assert_array_equal(tab2.state, tab.state)
    np.testing.assert_array_equal(tab2.time, tab.time)


def test_cfunc_pickle_fresh_process(tmp_path):
    # dataset-backed ops must rehydrate via the registry resolver in a
    # process that never constructed the EOPData
    cf = hy.make_cfunc([pm_x() * 2.0], vars=[])
    want = float(cf(np.zeros(0), time=0.2)[0])
    p = tmp_path / "cf.pkl"
    hy.s11n.save(cf, str(p))
    code = (
        "import numpy as np, heyoka_tpu as hy\n"
        f"cf = hy.s11n.load({str(p)!r})\n"
        "print(repr(float(cf(np.zeros(0), time=0.2)[0])))\n"
    )
    env = dict(os.environ)
    env.update({"JAX_PLATFORMS": "cpu", "PALLAS_AXON_POOL_IPS": ""})
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True, env=env
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert float(r.stdout.strip()) == pytest.approx(want, rel=1e-15)


def test_continuous_output_pickle():
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-12)
    *_, co = ta.propagate_until(12.0, c_output=True)
    co2 = hy.s11n.loads(hy.s11n.dumps(co))
    ts = np.linspace(0.5, 11.5, 13)
    np.testing.assert_array_equal(co(ts), co2(ts))


def test_angle_reducer():
    x, v = hy.make_vars("x", "v")
    ta = hy.taylor_adaptive([(x, v), (v, 0.0 * x)], [0.1, 10.0], tol=1e-12)
    oc, *_ = ta.propagate_until(100.0, callback=hy.angle_reducer(["x"]))
    assert oc == hy.TaylorOutcome.time_limit
    assert 0.0 <= ta.state[0] < 2 * math.pi
    # velocity untouched
    assert ta.state[1] == 10.0
    with pytest.raises(ValueError, match="not a state variable"):
        ar = hy.angle_reducer(["nope"])
        ar.pre_hook(ta)


def test_step_callback_set():
    x, v = hy.make_vars("x", "v")
    ta = hy.taylor_adaptive([(x, v), (v, 0.0 * x)], [0.1, 10.0], tol=1e-12)
    cbs = hy.StepCallbackSet(hy.angle_reducer(["x"]))
    ta.propagate_until(50.0, callback=cbs)
    assert 0.0 <= ta.state[0] < 2 * math.pi


def test_gp_generator_and_operators():
    gen = hy.gp.ExpressionGenerator(["x", "y"], rng=42)
    e = gen(2, 4)
    n = hy.gp.count_nodes(e)
    assert n >= 3
    assert hy.gp.fetch_from_node_id(e, 0) is e
    assert hy.gp.fetch_from_node_id(e, n - 1) is not None

    e2 = hy.gp.mutate(e, gen, rng=1)
    assert hy.gp.count_nodes(e2) >= 1
    a, b = hy.gp.crossover(e, e2, rng=2)
    assert hy.gp.count_nodes(a) >= 1 and hy.gp.count_nodes(b) >= 1

    # generated expressions are usable: compile one as a cfunc
    vs = sorted(hy.get_variables(e)) or ["x"]
    cf = hy.make_cfunc([e], vars=vs)
    out = cf(np.full((len(vs),), 0.37))
    assert out.shape == (1,)


def test_negative_base_fractional_pow_folds_to_nan():
    # regression: (-3.2) ** 0.7 must fold to nan (matching jnp.power), not
    # raise on a complex result
    e = hy.expr_pow_probe = (hy.make_vars("x") * 0.0 - 3.2) ** 0.7
    cf = hy.make_cfunc([e], vars=["x"])
    assert math.isnan(float(cf(np.array([1.0]))[0]))


def test_logging_levels_and_timer():
    hy.set_logger_level_trace()
    with hy.logging.SimpleTimer("unit-test") as t:
        pass
    assert t.elapsed >= 0.0
    hy.set_logger_level_warn()
    assert hy.logging.logger.level == 30


def _s11n_te_cb(ta, d_sgn, lane):
    return True


def test_batch_integrator_pickle_with_events(rng):
    # reference analog: test/s11n_event.cpp — events (and live cooldowns)
    # survive the round trip and keep firing afterwards
    from heyoka_tpu import t_event

    x, v = hy.make_vars("x", "v")
    states = 0.05 + 0.01 * rng.standard_normal((4, 2))
    tab = hy.taylor_adaptive_batch(
        pendulum(), states, tol=1e-12,
        t_events=[t_event(v, callback=_s11n_te_cb, cooldown=0.5)],
    )
    tab.propagate_until(10.0)  # several te hits (continue) per lane
    tab2 = hy.s11n.loads(hy.s11n.dumps(tab))
    np.testing.assert_array_equal(tab2.state, tab.state)
    np.testing.assert_array_equal(tab2.time, tab.time)
    assert len(tab2.t_events) == 1
    np.testing.assert_array_equal(
        np.asarray(tab2._te_cooldowns), np.asarray(tab._te_cooldowns)
    )
    # both keep integrating identically through the next event window
    tab.propagate_until(12.0)
    tab2.propagate_until(12.0)
    np.testing.assert_allclose(tab2.state, tab.state, rtol=0, atol=1e-13)
