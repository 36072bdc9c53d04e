"""Ensemble propagation over the device mesh.

Reference parity: heyoka ``ensemble_propagate_until/for/grid``
(``include/heyoka/ensemble_propagate.hpp:108-269``,
``src/ensemble_propagate.cpp:47-88``): run N independent instances of an
integrator, each customized by a generator, in parallel.

TPU-native design (the distributed story, SURVEY.md §2 #23): trajectories are
embarrassingly parallel, so the ensemble is a ``vmap`` over the trajectory
axis, ``shard_map``-ed across a ``jax.sharding.Mesh`` so each device runs its
shard's lockstep ``lax.while_loop`` *independently* (no global convergence
barrier between shards — a device whose trajectories finished early goes
idle, exactly like a TBB worker finishing its range early in the reference).
Multi-host meshes ride DCN via ``jax.distributed``; no collectives appear in
the hot loop, only at result gathering.
"""

from __future__ import annotations

import math as _pymath

import jax
import jax.numpy as jnp
import numpy as np

from .taylor import loops as _loops
from .taylor.outcome import TaylorOutcome


def _build_inputs(ta, n_iter, gen):
    """Materialize per-instance (state, pars, time) from the generator.

    ``gen(i) -> dict`` may override ``state``, ``pars``, ``time`` for
    instance i (the analog of heyoka's ``gen(ta_copy, i)`` mutation hook).
    Alternatively ``gen`` may be a dict of stacked arrays.
    """
    dim = ta.dim
    n_pars = ta._tape.n_pars
    dtype = ta._dtype
    if isinstance(gen, dict):
        states = np.asarray(gen.get("state"), dtype=dtype)
        pars = gen.get("pars")
        pars = (
            np.zeros((n_iter, n_pars), dtype=dtype)
            if pars is None
            else np.asarray(pars, dtype=dtype).reshape(n_iter, n_pars)
        )
        times = gen.get("time")
        times = (
            np.full((n_iter,), ta.time, dtype=dtype)
            if times is None
            else np.broadcast_to(np.asarray(times, dtype=dtype), (n_iter,))
        )
        return states, pars, times

    states = np.empty((n_iter, dim), dtype=dtype)
    pars = np.empty((n_iter, n_pars), dtype=dtype)
    times = np.empty((n_iter,), dtype=dtype)
    for i in range(n_iter):
        over = gen(i) or {}
        states[i] = np.asarray(over.get("state", ta.state), dtype=dtype)
        pars[i] = np.asarray(over.get("pars", ta.pars), dtype=dtype).reshape(n_pars)
        times[i] = float(over.get("time", ta.time))
    return states, pars, times


def _check_no_events(ta):
    """Ensemble drivers run the event-free propagation kernels; an
    integrator carrying events would otherwise fail deep inside the driver
    with a shape error (its tape has extra sv_func columns)."""
    if getattr(ta, "_ev_step", None) is not None:
        raise NotImplementedError(
            "ensemble propagation does not support integrators with events "
            "yet; use taylor_adaptive_batch with events, or strip the "
            "events from the template integrator"
        )


def _mesh_shard(fun, mesh, n_args):
    """shard_map ``fun`` over the trajectory axis of an (optional) mesh."""
    if mesh is None:
        return fun
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    axis = mesh.axis_names[0]
    specs = tuple(P(axis) for _ in range(n_args))
    try:
        return shard_map(
            fun, mesh=mesh, in_specs=specs, out_specs=P(axis), check_rep=False
        )
    except TypeError:  # jax >= 0.8: check_rep became check_vma
        return shard_map(
            fun, mesh=mesh, in_specs=specs, out_specs=P(axis), check_vma=False
        )


def ensemble_propagate_until(
    ta, t, n_iter: int, gen, *, max_delta_t=None, max_steps=0, mesh=None
):
    """Propagate ``n_iter`` customized instances until time ``t``.

    Returns a dict of stacked results: state, time, outcome, min_h, max_h,
    nsteps (the array analog of the reference's vector of result tuples).
    When ``mesh`` is given, the trajectory axis is sharded across its first
    axis (``n_iter`` must be divisible by the mesh size).
    """
    _check_no_events(ta)
    states, pars, times = _build_inputs(ta, n_iter, gen)
    if max_delta_t is None:
        max_delta_t = _pymath.inf
    dtype = ta._dtype

    if getattr(ta, "_flat", False):
        # the integrator runs the staged flat engine: each mesh shard steps
        # its whole lane block through the lockstep batched driver instead
        # of vmapping the scalar jet (~6x on TPU; see PERF.md)
        from .taylor.compact_flat import make_propagate_until_flat

        puf = make_propagate_until_flat(
            ta._tape, ta._order, dtype=dtype,
            high_accuracy=ta._high_accuracy,
        )

        def vm(state, pars_, t_hi, t_lo, tgt):
            return puf(
                state, pars_, t_hi, t_lo, tgt, jnp.zeros_like(tgt),
                jnp.full_like(tgt, float(max_delta_t)),
                jnp.asarray(int(max_steps), jnp.int64),
            )

        if jax.default_backend() == "cpu":
            fn = jax.jit(
                _mesh_shard(vm, mesh, 5),
                compiler_options={"xla_disable_hlo_passes": "algsimp"},
            )
        else:
            fn = jax.jit(_mesh_shard(vm, mesh, 5))
    else:
        pu = _loops.make_propagate_until(ta._fns)

        def one(state, pars_, t_hi, t_lo, tgt):
            return pu(
                state, pars_, t_hi, t_lo, tgt, jnp.asarray(0.0, dtype),
                jnp.asarray(float(max_delta_t), dtype),
                jnp.asarray(int(max_steps), jnp.int64),
            )

        vm = jax.vmap(one)
        fn = jax.jit(_mesh_shard(vm, mesh, 5))

    targets = jnp.broadcast_to(jnp.asarray(t, dtype), (n_iter,))
    res = fn(
        jnp.asarray(states),
        jnp.asarray(pars),
        jnp.asarray(times),
        jnp.zeros((n_iter,), dtype),
        targets,
    )
    return {
        "state": res["state"],
        "time": res["t_hi"] + res["t_lo"],
        "outcome": res["outcome"],
        "min_h": res["min_h"],
        "max_h": res["max_h"],
        "nsteps": res["nsteps"],
    }


def ensemble_propagate_for(ta, delta_t, n_iter: int, gen, **kw):
    states, pars, times = _build_inputs(ta, n_iter, gen)
    # target per instance = its own start time + delta
    t = times + float(delta_t)
    return ensemble_propagate_until(
        ta, t, n_iter, {"state": states, "pars": pars, "time": times}, **kw
    )


def ensemble_propagate_grid(
    ta, grid, n_iter: int, gen, *, max_delta_t=None, max_steps=0, mesh=None
):
    """Ensemble dense-output sampling on a shared grid; returns the stacked
    output array (n_iter, len(grid), dim) plus per-instance diagnostics."""
    _check_no_events(ta)
    states, pars, times = _build_inputs(ta, n_iter, gen)
    if max_delta_t is None:
        max_delta_t = _pymath.inf
    dtype = ta._dtype
    grid = jnp.asarray(np.asarray(grid, dtype=dtype))

    pg = _loops.make_propagate_grid(ta._fns)

    def one(state, pars_, t_hi, t_lo):
        return pg(
            state, pars_, t_hi, t_lo, grid,
            jnp.asarray(float(max_delta_t), dtype),
            jnp.asarray(int(max_steps), jnp.int64),
        )

    vm = jax.vmap(one)
    fn = jax.jit(_mesh_shard(vm, mesh, 4))

    res = fn(
        jnp.asarray(states),
        jnp.asarray(pars),
        jnp.asarray(times),
        jnp.zeros((n_iter,), dtype),
    )
    return {
        "out": res["out"],
        "state": res["state"],
        "time": res["t_hi"] + res["t_lo"],
        "outcome": res["outcome"],
        "min_h": res["min_h"],
        "max_h": res["max_h"],
        "nsteps": res["nsteps"],
    }


# -- batch variants -------------------------------------------------------------
# Reference parity: ensemble_propagate_*_batch (ensemble_propagate.hpp:180-269)
# run N copies of a *batch* integrator.  Under vmap the scalar and batch
# ensembles are the same computation, so these wrappers flatten the
# (n_iter, batch) axes into one trajectory axis and reshape the results.


def _flatten_batch_gen(tab, n_iter, gen):
    b = tab.batch_size
    if not isinstance(gen, dict):
        raise TypeError("batch ensembles take a dict of stacked arrays")
    states = np.asarray(gen["state"], dtype=tab._dtype)
    if states.shape[:2] != (n_iter, b):
        raise ValueError(f"state must have shape ({n_iter}, {b}, dim)")
    out = {"state": states.reshape(n_iter * b, -1)}
    if "pars" in gen and gen["pars"] is not None:
        out["pars"] = np.asarray(gen["pars"], dtype=tab._dtype).reshape(
            n_iter * b, -1
        )
    if "time" in gen and gen["time"] is not None:
        out["time"] = np.broadcast_to(
            np.asarray(gen["time"], dtype=tab._dtype), (n_iter, b)
        ).reshape(n_iter * b)
    return out


class _BatchShim:
    """Adapts a TaylorAdaptiveBatch to the scalar ensemble driver."""

    def __init__(self, tab):
        self.dim = tab.dim
        self._tape = tab._tape
        self._dtype = tab._dtype
        self._fns = tab._fns
        self._flat = getattr(tab, "_flat", False)
        self._order = tab._order
        self._high_accuracy = tab._high_accuracy
        self.state = tab.state[0]
        self.pars = tab.pars[0]
        self.time = float(np.asarray(tab.time)[0])


def _reshape_res(res, n_iter, b):
    out = {}
    for k, v in res.items():
        v = np.asarray(v)
        out[k] = v.reshape((n_iter, b) + v.shape[1:])
    return out


def ensemble_propagate_until_batch(tab, t, n_iter: int, gen, **kw):
    res = ensemble_propagate_until(
        _BatchShim(tab), t, n_iter * tab.batch_size,
        _flatten_batch_gen(tab, n_iter, gen), **kw
    )
    return _reshape_res(res, n_iter, tab.batch_size)


def ensemble_propagate_for_batch(tab, delta_t, n_iter: int, gen, **kw):
    res = ensemble_propagate_for(
        _BatchShim(tab), delta_t, n_iter * tab.batch_size,
        _flatten_batch_gen(tab, n_iter, gen), **kw
    )
    return _reshape_res(res, n_iter, tab.batch_size)


def ensemble_propagate_grid_batch(tab, grid, n_iter: int, gen, **kw):
    res = ensemble_propagate_grid(
        _BatchShim(tab), grid, n_iter * tab.batch_size,
        _flatten_batch_gen(tab, n_iter, gen), **kw
    )
    return _reshape_res(res, n_iter, tab.batch_size)
