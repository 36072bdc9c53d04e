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


def _events_config(ta):
    """Classify the template integrator's event configuration for the
    ensemble drivers: ``None`` when event-free, else ``(t_events,
    nt_events, has_te_callbacks)``.  Terminal events with callbacks
    decide continue-vs-stop per step in the reference
    (``events.hpp:151-309``) — those route to the host-stepwise
    per-instance fallback (documented O(n_iter) dispatch cost) instead of
    the on-device driver."""
    if getattr(ta, "_ev_step", None) is None:
        return None
    tes = list(ta._t_events)
    ntes = list(ta._nt_events)
    has_te_cb = any(ev.callback is not None for ev in tes)
    return tes, ntes, has_te_cb


def _ens_cache(ta):
    try:
        return ta.__dict__.setdefault("_ens_drivers", {})
    except AttributeError:  # exotic ta without __dict__
        return None


def _mesh_key(mesh):
    """Stable cache identity for a mesh: axis names/shape + device ids
    (id(mesh) can be recycled after garbage collection)."""
    if mesh is None:
        return None
    return (
        tuple(mesh.axis_names),
        tuple(mesh.devices.shape),
        tuple(d.id for d in mesh.devices.flat),
    )


def _mesh_shard(fun, mesh, n_args, n_scalar=0):
    """shard_map ``fun`` over the trajectory axis of an (optional) mesh;
    the last ``n_scalar`` args are replicated scalars."""
    if mesh is None:
        return fun
    from jax.sharding import PartitionSpec as P
    try:
        from jax import shard_map
    except ImportError:  # older jax
        from jax.experimental.shard_map import shard_map

    axis = mesh.axis_names[0]
    specs = (tuple(P(axis) for _ in range(n_args))
             + tuple(P() for _ in range(n_scalar)))
    try:
        return shard_map(
            fun, mesh=mesh, in_specs=specs, out_specs=P(axis), check_rep=False
        )
    except TypeError:  # jax >= 0.8: check_rep became check_vma
        return shard_map(
            fun, mesh=mesh, in_specs=specs, out_specs=P(axis), check_vma=False
        )


def _until_driver_key(max_delta_t, max_steps, mesh):
    """Cache key of the packed 'until' ensemble driver on
    ``ta._ens_drivers`` — the single source of truth for the key format
    (tools/ensemble_profile.py reaches into the cache with it)."""
    return ("until", float(max_delta_t), int(max_steps), _mesh_key(mesh))


def ensemble_propagate_until(
    ta, t, n_iter: int, gen, *, max_delta_t=None, max_steps=0, mesh=None
):
    """Propagate ``n_iter`` customized instances until time ``t``.

    Returns a dict of stacked results: state, time, outcome, min_h, max_h,
    nsteps (the array analog of the reference's vector of result tuples).
    When ``mesh`` is given, the trajectory axis is sharded across its first
    axis (``n_iter`` must be divisible by the mesh size).
    """
    states, pars, times = _build_inputs(ta, n_iter, gen)
    if max_delta_t is None:
        max_delta_t = _pymath.inf
    dtype = ta._dtype

    evcfg = _events_config(ta)
    if evcfg is not None:
        if evcfg[2]:
            # terminal-event callbacks need mid-flight host dispatch:
            # per-instance scalar propagation on one pickled working copy
            return _ensemble_propagate_until_host_ev(
                ta, n_iter, states, pars, times, t,
                float(max_delta_t), int(max_steps),
            )
        return _ensemble_propagate_until_ev(
            ta, evcfg, n_iter, states, pars, times, t,
            float(max_delta_t), int(max_steps), mesh,
        )

    # the built + jitted driver is cached on the integrator: rebuilding
    # it per call makes every ensemble invocation re-lower and re-link the
    # whole program (tens of seconds for the Pallas engines even with a
    # warm persistent cache)
    cache = _ens_cache(ta)
    key = _until_driver_key(max_delta_t, max_steps, mesh)
    fn = cache.get(key) if cache is not None else None
    if fn is None and getattr(ta, "_flat", False):
        # the integrator runs the staged flat engine: each mesh shard steps
        # its whole lane block through the lockstep batched driver instead
        # of vmapping the scalar jet (~6x on TPU; see PERF.md).  Mirror
        # _pu_jit's selection: ride the fused multi-step Pallas kernel
        # (the production propagate path) whenever the tape supports it.
        from .taylor.compact_flat import make_propagate_until_flat

        puf = None
        fused_setting = getattr(ta, "_fused_prop", "auto")
        if (fused_setting in ("auto", True)
                and getattr(ta, "_pallas_phase", False)
                in ("dd", "dd-interpret")
                and getattr(ta, "_mp_order", None) is not None):
            from .taylor.pallas_phase import UnsupportedPallasOp
            from .taylor.fused import make_propagate_until_fused

            try:
                puf = make_propagate_until_fused(
                    ta._tape, ta._order, dtype=dtype,
                    high_accuracy=ta._high_accuracy,
                    mp_order=ta._mp_order,
                    pallas_phase=ta._pallas_phase,
                )
            except UnsupportedPallasOp:
                # mirror _pu_jit (batch.py): an explicit fused_prop=True
                # is an error on unsupported tapes, "auto" falls back
                if fused_setting is True:
                    raise
                puf = None
        if puf is None:
            puf = make_propagate_until_flat(
                ta._tape, ta._order, dtype=dtype,
                high_accuracy=ta._high_accuracy,
                mp_order=getattr(ta, "_mp_order", None),
                pallas_phase=getattr(ta, "_pallas_phase", False),
            )

        n_sv = int(np.asarray(states).shape[1])

        def vm(packed, tgt_s):
            # one packed upload per call: [state | t_hi | pars] columns
            # — the tunnel round trip per array dominated the steady
            # ensemble dispatch (~120 ms for 5 uploads, PERF round-3)
            state = packed[:, :n_sv]
            t_hi = packed[:, n_sv]
            pars_ = packed[:, n_sv + 1:]
            tgt = jnp.full_like(t_hi, tgt_s)
            return puf(
                state, pars_, t_hi, jnp.zeros_like(t_hi), tgt,
                jnp.zeros_like(t_hi),
                jnp.full_like(t_hi, float(max_delta_t)),
                jnp.asarray(int(max_steps), jnp.int64),
            )

        from .taylor.compact_flat import jit_flat_step

        fn = jit_flat_step(_mesh_shard(vm, mesh, 1, 1))
    elif fn is None:
        pu = _loops.make_propagate_until(ta._fns)

        def one(state, pars_, t_hi, tgt):
            return pu(
                state, pars_, t_hi, jnp.asarray(0.0, dtype), tgt,
                jnp.asarray(0.0, dtype),
                jnp.asarray(float(max_delta_t), dtype),
                jnp.asarray(int(max_steps), jnp.int64),
            )

        n_sv = int(np.asarray(states).shape[1])

        def vm(packed, tgt_s):
            state = packed[:, :n_sv]
            t_hi = packed[:, n_sv]
            pars_ = packed[:, n_sv + 1:]
            tgt = jnp.full_like(t_hi, tgt_s)
            return jax.vmap(one)(state, pars_, t_hi, tgt)

        fn = jax.jit(_mesh_shard(vm, mesh, 1, 1))
    if cache is not None:
        cache[key] = fn

    packed = np.concatenate(
        [np.asarray(states, dtype),
         np.asarray(times, dtype)[:, None],
         np.asarray(pars, dtype)], axis=1)
    res = fn(jnp.asarray(packed), jnp.asarray(t, dtype))
    return {
        "state": res["state"],
        "time": res["t_hi"] + res["t_lo"],
        "outcome": res["outcome"],
        "min_h": res["min_h"],
        "max_h": res["max_h"],
        "nsteps": res["nsteps"],
    }


def _ensemble_propagate_until_ev(
    ta, evcfg, n_iter, states, pars, times, t, max_delta_t, max_steps, mesh,
):
    """Ensemble propagate-until for event-carrying integrators (terminal
    events pure-stop).

    Round-2 design: the whole instance axis steps through the *natively
    batched* recording driver (``events.make_propagate_until_ev_batch`` on
    ``events_impl.build_event_step_batch`` — dense tree isolation over all
    instance*event rows, step-indexed record rows, no per-instance
    scatters), shard_map-ed over the mesh.  Every nt hit is recorded on
    device and returned (padded) as ``nt_times/nt_idx/nt_sgn`` with
    per-instance ``nt_count``; nt callbacks are dispatched host-side
    afterwards, chronologically within each instance, as
    ``cb(results, t, d_sgn, instance)``.
    """
    from .taylor.events import make_propagate_until_ev_batch
    from .taylor.events_impl import MAX_ROOTS, build_event_step_batch

    tes, ntes, _ = evcfg
    dtype = ta._dtype
    mdt = float(max_delta_t)
    cache = _ens_cache(ta)
    key = ("until_ev", mdt, _mesh_key(mesh))
    fn = cache.get(key) if cache is not None else None
    if fn is None:
        is_flat = getattr(ta, "_flat", False)
        if is_flat:
            from .taylor.compact_flat import jit_flat_step
        # batch ensembles reuse the integrator's own batch event step
        # (byte-identical construction: same tape/events/engine — the
        # shim forwards it, and rebuilding a Pallas-bearing jet costs
        # tens of seconds, PERF.md ensemble audit).  A scalar ta's
        # _ev_step_raw is the per-trajectory step — NOT reusable here.
        ev_b = (getattr(ta, "_ev_step_raw", None)
                if isinstance(ta, _BatchShim) else None)
        if ev_b is None:
            flat_jet = None
            if is_flat:
                # the event jet rides the staged flat / dd-Pallas engine
                # (jet_mode), like TaylorAdaptiveBatch's own event step
                from .taylor.compact_flat import make_batched_step_flat

                flat_jet = make_batched_step_flat(
                    ta._tape, ta._order, dtype=dtype,
                    high_accuracy=ta._high_accuracy,
                    mp_order=getattr(ta, "_mp_order", None),
                    layout="3d", unroll=True, staged=True,
                    pallas_phase=getattr(ta, "_pallas_phase", False),
                    jet_mode=True,
                )
            ev_b = build_event_step_batch(
                ta._fns, tes, ntes, dtype, ta._tol, flat_jet=flat_jet,
            )
        pu = make_propagate_until_ev_batch(
            ev_b, ta._order, ta.dim, len(tes), len(ntes),
        )

        def shard_fn(state, pars_, t_hi, t_lo, tgt, msteps, cd, act, lh,
                     tc):
            return pu(
                state, pars_, t_hi, t_lo, tgt, jnp.zeros_like(tgt),
                jnp.full_like(tgt, mdt), msteps, cd, act, lh, tc,
            )

        shfn = _mesh_shard(shard_fn, mesh, 10)
        # a flat-engine jet inside the driver needs the CPU pass
        # workarounds regardless of whether the step was reused or
        # rebuilt (jit_flat_step is a plain jit on TPU)
        fn = jit_flat_step(shfn) if is_flat else jax.jit(shfn)
        if cache is not None:
            cache[key] = fn

    from collections import deque

    from .taylor.batch import _decode_hits, unpack_ev_summary

    targets = jnp.broadcast_to(jnp.asarray(t, dtype), (n_iter,))
    n_sv = ta.dim + len(tes) + len(ntes)
    cur = dict(
        state=jnp.asarray(states),
        t_hi=jnp.asarray(times),
        t_lo=jnp.zeros((n_iter,), dtype),
        cooldowns=jnp.zeros((n_iter, len(tes)), dtype),
        last_h=jnp.zeros((n_iter,), dtype),
        tc=jnp.zeros((n_iter, ta._order + 1, n_sv), dtype),
        active=jnp.ones((n_iter,), bool),
    )
    pars_j = jnp.asarray(pars)
    done = np.zeros((n_iter,), bool)
    oc = np.full((n_iter,), int(TaylorOutcome.time_limit), np.int32)
    te_idx = np.full((n_iter,), -1, np.int32)
    te_sgn = np.zeros((n_iter,), np.int32)
    min_h = np.full((n_iter,), _pymath.inf)
    max_h = np.zeros((n_iter,))
    nsteps = np.zeros((n_iter,), np.int64)
    last_h = np.zeros((n_iter,))
    inst_hits = [[] for _ in range(n_iter)]

    # pipelined chunk dispatch (see TaylorAdaptiveBatch.
    # _propagate_until_ev_fast): next-chunk inputs are device arrays
    # (active = ~done), so the packed-summary download of chunk k overlaps
    # chunk k+1 on device; a step limit needs host nsteps and stays
    # sequential
    max_depth = 1 if max_steps else 3
    inflight = deque()
    all_done = False

    def dispatch():
        nonlocal cur
        if max_steps:
            msteps = np.maximum(0, max_steps - nsteps)
        else:
            msteps = np.zeros((n_iter,), np.int64)
        res = fn(
            cur["state"], pars_j, cur["t_hi"], cur["t_lo"], targets,
            jnp.asarray(msteps, jnp.int64), cur["cooldowns"],
            cur["active"], cur["last_h"], cur["tc"],
        )
        cur = dict(
            state=res["state"], t_hi=res["t_hi"], t_lo=res["t_lo"],
            cooldowns=res["cooldowns"], last_h=res["last_h"],
            tc=res["tc"], active=~res["done"],
        )
        # prefetch the packed summary to the host (see batch.py
        # _propagate_until_ev_fast): the decode of chunk k then overlaps
        # the in-flight chunks instead of paying a synchronous round trip
        try:
            res["packed"].copy_to_host_async()
        except (AttributeError, TypeError):
            pass
        inflight.append(res)

    depth = 1
    while True:
        while len(inflight) < depth and not all_done:
            dispatch()
        res = inflight.popleft()
        summary = unpack_ev_summary(res, len(ntes))
        if summary["it"] and ntes:
            _decode_hits(summary, res, len(ntes), inst_hits)
        min_h = np.minimum(min_h, summary["min_h"])
        max_h = np.maximum(max_h, summary["max_h"])
        nsteps += summary["nsteps"]
        newly = ~done & summary["done"]
        oc = np.where(newly, summary["outcome"], oc)
        te_idx = np.where(newly, summary["te_idx"], te_idx)
        te_sgn = np.where(newly, summary["te_sgn"], te_sgn)
        done |= newly
        all_done = all_done or bool(done.all())
        if all_done and not inflight:
            break
        depth = min(max_depth, depth + 1)
    last_h = np.asarray(cur["last_h"])

    counts = np.array([len(inst_hits[i]) for i in range(n_iter)])
    cap = max(1, int(counts.max())) if counts.size else 1
    nt_times = np.full((n_iter, cap), np.nan)
    nt_idx = np.full((n_iter, cap), -1, np.int32)
    nt_sgn = np.zeros((n_iter, cap), np.int32)
    fwd = np.asarray(targets) >= times
    for i in range(n_iter):
        if not inst_hits[i]:
            continue
        ts = np.array([h[0] for h in inst_hits[i]])
        ix = np.array([h[1] for h in inst_hits[i]])
        sg = np.array([h[2] for h in inst_hits[i]])
        order_ = np.argsort(ts) if fwd[i] else np.argsort(-ts)
        n = ts.shape[0]
        nt_times[i, :n] = ts[order_]
        nt_idx[i, :n] = ix[order_]
        nt_sgn[i, :n] = sg[order_]

    results = {
        "state": cur["state"],
        "time": cur["t_hi"] + cur["t_lo"],
        "outcome": oc,
        "min_h": min_h,
        "max_h": max_h,
        "nsteps": nsteps,
        "te_idx": te_idx,
        "te_sgn": te_sgn,
        "nt_times": nt_times,
        "nt_idx": nt_idx,
        "nt_sgn": nt_sgn,
        "nt_count": counts,
    }
    if any(ev.callback is not None for ev in ntes):
        for i in range(n_iter):
            for k in range(int(counts[i])):
                cb = ntes[int(nt_idx[i, k])].callback
                if cb is not None:
                    cb(results, float(nt_times[i, k]), int(nt_sgn[i, k]), i)
    return results


def _ensemble_propagate_until_host_ev(
    ta, n_iter, states, pars, times, t, max_delta_t, max_steps,
):
    """Host-stepwise per-instance fallback for terminal events WITH
    callbacks (reference semantics: the callback decides continue-vs-stop
    mid-flight, ``events.hpp:151-309``, and receives the live integrator).

    One working copy of the template is deep-copied once and reused
    across instances, so compiled drivers are shared; the remaining cost
    is the per-step host dispatch of the scalar event drivers — use the
    on-device path (callback=None terminal events) for throughput.
    """
    import copy

    if isinstance(ta, _BatchShim):
        # batch ensembles: one deep-copied working copy of the batch
        # integrator steps each instance's lane block through its own
        # host event driver (te callbacks receive the live batch
        # integrator and the lane index, like the direct call)
        tab = copy.deepcopy(ta._tab)
        b = tab.batch_size
        n_inst = n_iter // b
        dim = tab.dim
        out_state = np.empty((n_iter, dim))
        out_time = np.empty((n_iter,))
        oc = np.full((n_iter,), int(TaylorOutcome.time_limit), np.int32)
        min_h = np.full((n_iter,), _pymath.inf)
        max_h = np.zeros((n_iter,))
        nsteps = np.zeros((n_iter,), np.int64)
        te_idx = np.full((n_iter,), -1, np.int32)
        t_arr = np.broadcast_to(np.asarray(t, np.float64), (n_iter,))
        for i in range(n_inst):
            sl = slice(i * b, (i + 1) * b)
            tab.state = states[sl][:, :dim]
            tab.pars = pars[sl]
            tab.set_time(times[sl])
            tab.reset_cooldowns()
            ocs, mn, mx, ns = tab.propagate_until(
                t_arr[sl], max_delta_t=max_delta_t, max_steps=max_steps,
            )
            out_state[sl] = np.asarray(tab.state)[:, :dim]
            out_time[sl] = np.asarray(tab.time)
            for j, o in enumerate(ocs):
                oc[i * b + j] = int(o)
                if int(o) >= 0:
                    te_idx[i * b + j] = int(o)
            min_h[sl] = np.minimum(min_h[sl], np.asarray(mn))
            max_h[sl] = np.maximum(max_h[sl], np.asarray(mx))
            nsteps[sl] += np.asarray(ns)
        return {
            "state": out_state,
            "time": out_time,
            "outcome": oc,
            "min_h": min_h,
            "max_h": max_h,
            "nsteps": nsteps,
            "te_idx": te_idx,
        }
    # deepcopy goes through the pickle protocol for the integrator state
    # but keeps callback closures by reference (locals cannot pickle)
    tai = copy.deepcopy(ta)
    dim = ta.dim
    out_state = np.empty((n_iter, dim))
    out_time = np.empty((n_iter,))
    oc = np.full((n_iter,), int(TaylorOutcome.time_limit), np.int32)
    min_h = np.full((n_iter,), _pymath.inf)
    max_h = np.zeros((n_iter,))
    nsteps = np.zeros((n_iter,), np.int64)
    te_idx = np.full((n_iter,), -1, np.int32)
    t_arr = np.broadcast_to(np.asarray(t, np.float64), (n_iter,))
    for i in range(n_iter):
        tai.state = states[i]
        tai.pars = pars[i]
        tai.time = float(times[i])
        tai.reset_cooldowns()
        o, mn, mx, ns = tai.propagate_until(
            float(t_arr[i]), max_delta_t=max_delta_t, max_steps=max_steps,
        )
        out_state[i] = np.asarray(tai.state)[:dim]
        out_time[i] = tai.time
        oc[i] = int(o)
        min_h[i] = mn
        max_h[i] = mx
        nsteps[i] = ns
        if isinstance(o, int) and int(o) >= 0:
            te_idx[i] = int(o)
    return {
        "state": out_state,
        "time": out_time,
        "outcome": oc,
        "min_h": min_h,
        "max_h": max_h,
        "nsteps": nsteps,
        "te_idx": te_idx,
    }


def ensemble_propagate_for(ta, delta_t, n_iter: int, gen, **kw):
    states, pars, times = _build_inputs(ta, n_iter, gen)
    # target per instance = its own start time + delta
    t = times + float(delta_t)
    return ensemble_propagate_until(
        ta, t, n_iter, {"state": states, "pars": pars, "time": times}, **kw
    )


def _ensemble_propagate_grid_host_ev(
    ta, n_iter, states, pars, times, grid, max_delta_t, max_steps,
):
    """Per-instance host fallback for ensemble grids over event-carrying
    integrators (the scalar event-aware ``propagate_grid`` runs per
    instance on one pickled working copy; per-step host dispatch cost —
    reference runs the same event machinery per instance,
    ``ensemble_propagate.hpp:230-269``)."""
    import copy

    if isinstance(ta, _BatchShim):
        # batch ensembles: one deep-copied working copy of the batch
        # integrator runs each instance's lane block through its own
        # event-aware propagate_grid (stepwise host driver)
        tab = copy.deepcopy(ta._tab)
        b = tab.batch_size
        n_inst = n_iter // b
        dim = tab.dim
        grid = np.asarray(grid, dtype=ta._dtype)
        ngrid = grid.shape[0]
        out = np.full((n_iter, ngrid, dim), np.nan)
        out_state = np.empty((n_iter, dim))
        out_time = np.empty((n_iter,))
        oc = np.full((n_iter,), int(TaylorOutcome.time_limit), np.int32)
        min_h = np.full((n_iter,), _pymath.inf)
        max_h = np.zeros((n_iter,))
        nsteps = np.zeros((n_iter,), np.int64)
        for i in range(n_inst):
            sl = slice(i * b, (i + 1) * b)
            tab.state = states[sl][:, :dim]
            tab.pars = pars[sl]
            tab.set_time(times[sl])
            tab.reset_cooldowns()
            ocs, mn, mx, ns, res = tab.propagate_grid(
                grid, max_delta_t=max_delta_t, max_steps=max_steps,
            )
            out[sl] = np.asarray(res)
            out_state[sl] = np.asarray(tab.state)[:, :dim]
            out_time[sl] = np.asarray(tab.time)
            for j, o in enumerate(ocs):
                oc[i * b + j] = int(o)
            min_h[sl] = np.minimum(min_h[sl], np.asarray(mn))
            max_h[sl] = np.maximum(max_h[sl], np.asarray(mx))
            nsteps[sl] += np.asarray(ns)
        return {
            "out": out,
            "state": out_state,
            "time": out_time,
            "outcome": oc,
            "min_h": min_h,
            "max_h": max_h,
            "nsteps": nsteps,
        }
    tai = copy.deepcopy(ta)
    grid = np.asarray(grid, dtype=ta._dtype)
    ngrid = grid.shape[0]
    dim = ta.dim
    out = np.full((n_iter, ngrid, dim), np.nan)
    out_state = np.empty((n_iter, dim))
    out_time = np.empty((n_iter,))
    oc = np.full((n_iter,), int(TaylorOutcome.time_limit), np.int32)
    min_h = np.full((n_iter,), _pymath.inf)
    max_h = np.zeros((n_iter,))
    nsteps = np.zeros((n_iter,), np.int64)
    for i in range(n_iter):
        tai.state = states[i]
        tai.pars = pars[i]
        tai.time = float(times[i])
        tai.reset_cooldowns()
        o, mn, mx, ns, res = tai.propagate_grid(
            grid, max_delta_t=max_delta_t, max_steps=max_steps,
        )
        out[i] = np.asarray(res)
        out_state[i] = np.asarray(tai.state)[:dim]
        out_time[i] = tai.time
        oc[i] = int(o)
        min_h[i] = mn
        max_h[i] = mx
        nsteps[i] = ns
    return {
        "out": out,
        "state": out_state,
        "time": out_time,
        "outcome": oc,
        "min_h": min_h,
        "max_h": max_h,
        "nsteps": nsteps,
    }


def ensemble_propagate_grid(
    ta, grid, n_iter: int, gen, *, max_delta_t=None, max_steps=0, mesh=None
):
    """Ensemble dense-output sampling on a shared grid; returns the stacked
    output array (n_iter, len(grid), dim) plus per-instance diagnostics."""
    if _events_config(ta) is not None:
        states, pars, times = _build_inputs(ta, n_iter, gen)
        return _ensemble_propagate_grid_host_ev(
            ta, n_iter, states, pars, times, grid,
            _pymath.inf if max_delta_t is None else float(max_delta_t),
            int(max_steps),
        )
    states, pars, times = _build_inputs(ta, n_iter, gen)
    if max_delta_t is None:
        max_delta_t = _pymath.inf
    dtype = ta._dtype
    grid = jnp.asarray(np.asarray(grid, dtype=dtype))

    cache = _ens_cache(ta)
    # the grid VALUES are baked into the traced program, so they key the
    # cache (bytes of the host copy; grids are small)
    key = ("grid", np.asarray(grid).tobytes(), float(max_delta_t),
           int(max_steps), _mesh_key(mesh))
    fn = cache.get(key) if cache is not None else None
    if fn is None:
        pg = _loops.make_propagate_grid(ta._fns)

        def one(state, pars_, t_hi, t_lo):
            return pg(
                state, pars_, t_hi, t_lo, grid,
                jnp.asarray(float(max_delta_t), dtype),
                jnp.asarray(int(max_steps), jnp.int64),
            )

        vm = jax.vmap(one)
        fn = jax.jit(_mesh_shard(vm, mesh, 4))
        if cache is not None:
            cache[key] = fn

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
        self._tab = tab
        self.dim = tab.dim
        self._tape = tab._tape
        self._dtype = tab._dtype
        self._fns = tab._fns
        self._flat = getattr(tab, "_flat", False)
        self._mp_order = getattr(tab, "_mp_order", None)
        self._pallas_phase = getattr(tab, "_pallas_phase", False)
        self._fused_prop = getattr(tab, "_fused_prop", "auto")
        # share the underlying integrator's jitted-driver cache so fresh
        # shims (one per ensemble_*_batch call) reuse compiled programs
        self._ens_drivers = tab.__dict__.setdefault("_ens_drivers", {})
        self._order = tab._order
        self._tol = tab._tol
        self._high_accuracy = tab._high_accuracy
        self._ev_step = getattr(tab, "_ev_step", None)
        self._ev_step_raw = getattr(tab, "_ev_step_raw", None)
        self._t_events = getattr(tab, "_t_events", [])
        self._nt_events = getattr(tab, "_nt_events", [])
        self.state = tab.state[0]
        self.pars = tab.pars[0]
        self.time = float(np.asarray(tab.time)[0])


def _reshape_res(res, n_iter, b):
    # keep device arrays on device: np.asarray here would force a
    # synchronous device->host download of every result field (measured
    # ~35% of the public-API ensemble wall time through the TPU tunnel,
    # PERF.md round-2 ensemble audit); reshape is a device-side metadata op
    out = {}
    for k, v in res.items():
        if isinstance(v, np.ndarray) or not hasattr(v, "reshape"):
            v = np.asarray(v)
        out[k] = v.reshape((n_iter, b) + tuple(v.shape[1:]))
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
