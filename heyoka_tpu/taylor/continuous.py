"""Continuous output: dense interpolation over a whole propagation.

Reference parity: heyoka ``continuous_output[_batch]<T>``
(``include/heyoka/continuous_output.hpp:49-204``, ``src/continuous_output.cpp``):
``propagate_until/for(..., c_output=True)`` records every step's Taylor
coefficients and (hi, lo) step times; the resulting object evaluates the
trajectory anywhere inside the integration interval via binary search +
Horner.

TPU-native design: the recording driver is the same on-device
``lax.while_loop`` as ``make_propagate_until``, with a bounded ring buffer of
``chunk`` steps carried in the loop; the facade re-enters the loop until the
target is reached, concatenating chunks host-side (O(total steps) memory only
on host, static shapes on device).  Evaluation is a jitted
``searchsorted`` + Horner kernel, vectorized over query times — the XLA
analog of the reference's JIT-compiled binary-search-and-evaluate function
(``continuous_output.cpp``).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ..dfloat import dd_add_d, dd_add_dd
from .outcome import TaylorOutcome
from . import loops as _loops
from . import stepper as _st


def make_propagate_until_cout(fns: _loops.StepFns, chunk: int):
    """Build a propagate-until driver that also records, for each accepted
    step, the Taylor coefficients and the (hi, lo) step start time + h into
    fixed-size buffers of capacity ``chunk``.

    Returns the usual carry dict plus ``rec_tc``, ``rec_t``, ``rec_h`` and
    ``rec_n``; the loop stops early (outcome untouched, ``done`` False) when
    the buffer fills, so the caller re-enters with the returned state.
    """

    def pu(state, pars, t_hi, t_lo, target_hi, target_lo, max_delta_t, max_steps):
        dtype = state.dtype
        zero = jnp.asarray(0.0, dtype)
        inf = jnp.asarray(jnp.inf, dtype)

        def remaining(th, tl):
            rh, _ = dd_add_dd(target_hi, target_lo, -th, -tl)
            return rh

        rem0 = remaining(t_hi, t_lo)
        fwd = rem0 > zero

        init = dict(
            state=state,
            t_hi=t_hi,
            t_lo=t_lo,
            last_h=zero,
            tc=jnp.zeros((fns.order + 1, fns.n_eq), dtype),
            nsteps=jnp.int64(0),
            min_h=inf,
            max_h=zero,
            outcome=jnp.int32(TaylorOutcome.time_limit),
            done=rem0 == zero,
            rec_tc=jnp.zeros((chunk, fns.order + 1, fns.n_eq), dtype),
            rec_t=jnp.zeros((chunk, 2), dtype),
            rec_h=jnp.zeros((chunk,), dtype),
            rec_n=jnp.int32(0),
        )

        def cond(c):
            return ~c["done"] & (c["rec_n"] < chunk)

        def body(c):
            rem = remaining(c["t_hi"], c["t_lo"])
            cap = jnp.minimum(jnp.abs(rem), max_delta_t)
            dt = jnp.where(fwd, cap, -cap)

            new_state, h, tc = _loops.single_step(
                fns, c["state"], pars, c["t_hi"], dt
            )
            nt_hi, nt_lo = dd_add_d(c["t_hi"], c["t_lo"], h)
            finite = jnp.all(jnp.isfinite(new_state)) & jnp.isfinite(h)

            nsteps = c["nsteps"] + 1
            rem_after = remaining(nt_hi, nt_lo)
            reached = jnp.where(fwd, rem_after <= zero, rem_after >= zero)
            hit_step_limit = (max_steps > 0) & (nsteps >= max_steps) & ~reached

            outcome = jnp.where(
                ~finite,
                jnp.int32(TaylorOutcome.err_nf_state),
                jnp.where(
                    hit_step_limit,
                    jnp.int32(TaylorOutcome.step_limit),
                    jnp.int32(TaylorOutcome.time_limit),
                ),
            )
            done = ~finite | hit_step_limit | reached

            # record the accepted step (start time + tc + h)
            k = c["rec_n"]
            z = jnp.int32(0)
            rec_tc = lax.dynamic_update_slice(
                c["rec_tc"], tc[None], (k, z, z)
            )
            rec_t = lax.dynamic_update_slice(
                c["rec_t"],
                jnp.stack([c["t_hi"], c["t_lo"]])[None],
                (k, z),
            )
            rec_h = lax.dynamic_update_slice(c["rec_h"], h[None], (k,))

            alive = ~c["done"]

            def sel(new, old):
                return jnp.where(alive, new, old)

            abs_h = jnp.abs(h)
            rec = jnp.where(alive & finite, 1, 0)
            return dict(
                state=sel(new_state, c["state"]),
                t_hi=sel(nt_hi, c["t_hi"]),
                t_lo=sel(nt_lo, c["t_lo"]),
                last_h=sel(h, c["last_h"]),
                tc=jnp.where(alive, tc, c["tc"]),
                nsteps=sel(nsteps, c["nsteps"]),
                min_h=sel(jnp.minimum(c["min_h"], abs_h), c["min_h"]),
                max_h=sel(jnp.maximum(c["max_h"], abs_h), c["max_h"]),
                outcome=sel(outcome, c["outcome"]),
                done=sel(done, c["done"]),
                rec_tc=jnp.where(alive, rec_tc, c["rec_tc"]),
                rec_t=jnp.where(alive, rec_t, c["rec_t"]),
                rec_h=jnp.where(alive, rec_h, c["rec_h"]),
                rec_n=c["rec_n"] + rec,
            )

        return lax.while_loop(cond, body, init)

    return pu


class ContinuousOutput:
    """Dense output over a full propagation (heyoka ``continuous_output<T>``).

    ``times``: (n_steps + 1,) step boundaries; ``tcs``: (n_steps, order+1,
    dim) per-step Taylor coefficients.  Calling with a scalar/array of times
    evaluates the trajectory there (vectorized, jitted).
    """

    def __init__(self, times_hi, times_lo, tcs, order: int, dim: int, fwd: bool):
        self._times_hi = jnp.asarray(times_hi)
        self._times_lo = jnp.asarray(times_lo)
        self._tcs = jnp.asarray(tcs)
        self._order = int(order)
        self._dim = int(dim)
        self._fwd = bool(fwd)

    @property
    def n_steps(self) -> int:
        return int(self._tcs.shape[0])

    @property
    def times(self) -> np.ndarray:
        """Step boundary times (n_steps + 1,)."""
        return np.asarray(self._times_hi + self._times_lo)

    @property
    def tcs(self) -> np.ndarray:
        return np.asarray(self._tcs)

    @property
    def bounds(self) -> tuple:
        """(initial time, final time) of the recorded propagation, in
        propagation order (heyoka ``get_bounds``)."""
        t = self.times
        return (float(t[0]), float(t[-1]))

    @partial(jax.jit, static_argnums=0)
    def _eval(self, ts):
        # step index: rightmost boundary <= t (forward) / >= t (backward)
        bnd = self._times_hi + self._times_lo
        if self._fwd:
            idx = jnp.searchsorted(bnd, ts, side="right") - 1
        else:
            idx = self._tcs.shape[0] - jnp.searchsorted(bnd[::-1], ts, side="left")
        idx = jnp.clip(idx, 0, self._tcs.shape[0] - 1)
        rel = (ts - self._times_hi[idx]) - self._times_lo[idx]
        tc = self._tcs[idx]  # (n, order+1, dim)

        res = tc[:, self._order, :]
        for i in range(1, self._order + 1):
            res = tc[:, self._order - i, :] + res * rel[:, None]
        return res

    def __getstate__(self):
        return {
            "times_hi": np.asarray(self._times_hi),
            "times_lo": np.asarray(self._times_lo),
            "tcs": np.asarray(self._tcs),
            "order": self._order,
            "dim": self._dim,
            "fwd": self._fwd,
        }

    def __setstate__(self, st):
        self.__init__(
            st["times_hi"], st["times_lo"], st["tcs"], st["order"],
            st["dim"], st["fwd"],
        )

    def __call__(self, t):
        scalar = np.ndim(t) == 0
        t = jnp.atleast_1d(jnp.asarray(t, self._tcs.dtype))
        out = np.asarray(self._eval(t))
        self._output = out[0] if scalar else out
        return self._output

    @property
    def output(self):
        """The result of the last evaluation (reference ``get_output``)."""
        if not hasattr(self, "_output"):
            self._output = np.zeros((self._tcs.shape[-1],),
                                    dtype=self._tcs.dtype)
        return self._output


class ContinuousOutputBatch:
    """Batch continuous output (heyoka ``continuous_output_batch<T>``):
    per-lane step sequences, padded to the longest lane.  ``__call__`` takes
    one time per lane (or a (n_times, batch) array)."""

    def __init__(self, times_hi, times_lo, tcs, n_steps, order: int, dim: int, fwd):
        self._times_hi = jnp.asarray(times_hi)  # (batch, cap+1)
        self._times_lo = jnp.asarray(times_lo)
        self._tcs = jnp.asarray(tcs)  # (batch, cap, order+1, dim)
        self._n_steps = jnp.asarray(n_steps)  # (batch,)
        self._order = int(order)
        self._dim = int(dim)
        self._fwd = fwd  # (batch,) bool

    @property
    def n_steps(self) -> np.ndarray:
        return np.asarray(self._n_steps)

    @property
    def batch_size(self) -> int:
        return int(self._tcs.shape[0])

    @partial(jax.jit, static_argnums=0)
    def _eval(self, ts):
        # ts: (batch,) one query per lane
        def lane(bnd_hi, bnd_lo, tcs, n, fwd, t):
            bnd = bnd_hi + bnd_lo
            # pad region has bnd == 0; use only the first n+1 boundaries by
            # clamping the search result to [0, n-1]
            idx_f = jnp.searchsorted(bnd, t, side="right") - 1
            idx_b = tcs.shape[0] - jnp.searchsorted(bnd[::-1], t, side="left")
            idx = jnp.where(fwd, idx_f, idx_b)
            idx = jnp.clip(idx, 0, jnp.maximum(n - 1, 0))
            rel = (t - bnd_hi[idx]) - bnd_lo[idx]
            tc = tcs[idx]
            res = tc[self._order]
            for i in range(1, self._order + 1):
                res = tc[self._order - i] + res * rel
            return res

        return jax.vmap(lane)(
            self._times_hi, self._times_lo, self._tcs, self._n_steps, self._fwd, ts
        )

    def __getstate__(self):
        return {
            "times_hi": np.asarray(self._times_hi),
            "times_lo": np.asarray(self._times_lo),
            "tcs": np.asarray(self._tcs),
            "n_steps": np.asarray(self._n_steps),
            "order": self._order,
            "dim": self._dim,
            "fwd": np.asarray(self._fwd),
        }

    def __setstate__(self, st):
        self.__init__(
            st["times_hi"], st["times_lo"], st["tcs"], st["n_steps"],
            st["order"], st["dim"], jnp.asarray(st["fwd"]),
        )

    def __call__(self, t):
        t = jnp.asarray(t, self._tcs.dtype)
        if t.ndim == 1:
            return np.asarray(self._eval(t))
        if t.ndim == 2:
            return np.asarray(jax.vmap(self._eval)(t))
        raise ValueError("t must be (batch,) or (n_times, batch)")
