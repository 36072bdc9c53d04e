"""Ensemble propagation tests (reference analog: test/ensemble_propagate.cpp):
ensemble results must match individual propagations; sharded runs must match
unsharded ones."""

import numpy as np

import jax

import heyoka_tpu as hy
from heyoka_tpu import ensemble_propagate_until, ensemble_propagate_grid
from heyoka_tpu.models import pendulum


N_ITER = 8


def test_ensemble_matches_individual(rng):
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
    states = 0.05 + 0.01 * rng.standard_normal((N_ITER, 2))

    def gen(i):
        return {"state": states[i]}

    res = ensemble_propagate_until(ta, 10.0, N_ITER, gen)
    assert res["state"].shape == (N_ITER, 2)
    for i in range(N_ITER):
        tai = hy.taylor_adaptive(pendulum(), states[i], tol=1e-15)
        tai.propagate_until(10.0)
        # 1-ulp tolerance: XLA fuses the vmapped/sharded loop body
        # differently from the scalar program (see test_batch.py note)
        np.testing.assert_allclose(
            np.asarray(res["state"][i]), tai.state, rtol=0, atol=5e-14
        )
        assert int(res["nsteps"][i]) > 0


def test_ensemble_sharded_matches_unsharded(rng):
    from jax.sharding import Mesh

    devs = jax.devices()
    assert len(devs) >= 8, "conftest must provide 8 virtual cpu devices"
    mesh = Mesh(np.array(devs[:8]), ("traj",))

    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
    states = 0.05 + 0.01 * rng.standard_normal((N_ITER, 2))
    gen = {"state": states}

    res_plain = ensemble_propagate_until(ta, 5.0, N_ITER, gen)
    res_mesh = ensemble_propagate_until(ta, 5.0, N_ITER, gen, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res_plain["state"]), np.asarray(res_mesh["state"])
    )
    np.testing.assert_allclose(
        np.asarray(res_plain["nsteps"]), np.asarray(res_mesh["nsteps"])
    )


def test_ensemble_grid(rng):
    ta = hy.taylor_adaptive(pendulum(), [0.05, 0.025], tol=1e-15)
    states = 0.05 + 0.01 * rng.standard_normal((N_ITER, 2))
    grid = np.linspace(0.0, 3.0, 5)
    res = ensemble_propagate_grid(ta, grid, N_ITER, {"state": states})
    assert res["out"].shape == (N_ITER, 5, 2)
    for i in range(0, N_ITER, 3):
        tai = hy.taylor_adaptive(pendulum(), states[i], tol=1e-15)
        *_, out = tai.propagate_grid(grid)
        np.testing.assert_allclose(np.asarray(res["out"][i]), out, atol=1e-13)


def test_ensemble_batch_variants(rng):
    from heyoka_tpu.ensemble import ensemble_propagate_until_batch

    tab = hy.taylor_adaptive_batch(
        pendulum(), 0.05 + 0.0 * rng.standard_normal((4, 2)), tol=1e-12
    )
    states = 0.05 + 0.01 * rng.standard_normal((3, 4, 2))
    res = ensemble_propagate_until_batch(tab, 5.0, 3, {"state": states})
    assert res["state"].shape == (3, 4, 2)
    assert res["nsteps"].shape == (3, 4)
    ta = hy.taylor_adaptive(pendulum(), states[1, 2], tol=1e-12)
    ta.propagate_until(5.0)
    np.testing.assert_allclose(res["state"][1, 2], ta.state, rtol=0, atol=5e-14)


def test_ensemble_flat_batch_matches_loop():
    # batch ensemble over a mesh with the staged flat engine: each shard
    # steps its lane block through the lockstep driver; must match the
    # vmapped loop engine with identical per-lane step counts
    import jax
    from jax.sharding import Mesh

    states = 0.05 + 0.01 * np.random.default_rng(2).standard_normal((8, 2))
    mesh = Mesh(np.array(jax.devices()), ("traj",))
    gen = {"state": states.reshape(2, 4, 2)}
    tab_f = hy.taylor_adaptive_batch(
        pendulum(), states[:4], tol=1e-12, compact_mode="flat"
    )
    res_f = hy.ensemble_propagate_until_batch(tab_f, 10.0, 2, gen, mesh=mesh)
    tab_l = hy.taylor_adaptive_batch(
        pendulum(), states[:4], tol=1e-12, compact_mode=True
    )
    res_l = hy.ensemble_propagate_until_batch(tab_l, 10.0, 2, gen, mesh=mesh)
    np.testing.assert_allclose(
        np.asarray(res_f["state"]), np.asarray(res_l["state"]),
        rtol=0, atol=5e-13,
    )
    np.testing.assert_array_equal(
        np.asarray(res_f["nsteps"]), np.asarray(res_l["nsteps"])
    )
