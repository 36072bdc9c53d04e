"""Variational ODE systems.

Reference parity: heyoka ``var_ode_sys`` (``include/heyoka/var_ode_sys.hpp:34-77``,
``src/var_ode_sys.cpp:177-330``): augment an ODE system with its variational
equations wrt initial conditions / params / initial time, plus the helpers to
set up the variational initial conditions
(``src/detail/setup_variational_ics.cpp``).

Round-1 scope: first-order variational equations (the workhorse for STM /
sensitivity propagation); arbitrary order follows the same augmentation
recursively and is tracked for a later milestone.
"""

from __future__ import annotations

import enum
from typing import Sequence

import numpy as np

from .expr.core import Expr, Param, Variable, expr, sum_expr
from .expr.diff import diff


class VarArgs(enum.IntEnum):
    """Which quantities to differentiate against (heyoka ``var_args``,
    ``var_ode_sys.hpp:29``)."""

    vars = 1  # initial conditions
    params = 2
    time = 4  # initial time
    all = 7


class var_ode_sys:
    """An ODE system augmented with first-order variational equations.

    The augmented state layout is ``[x_0..x_{n-1}, dx_0/da_0, dx_1/da_0, ...]``
    (per-argument blocks of n state sensitivities), matching the reference's
    ordering of variational state blocks.
    """

    def __init__(self, sys, args=VarArgs.vars, order: int = 1):
        if order != 1:
            raise NotImplementedError(
                "variational order > 1 is not implemented yet "
                "(round-1 capability delta; reference supports arbitrary order)"
            )
        from .taylor.adaptive import _normalize_sys

        self.orig_sys = _normalize_sys(sys)
        self.order = int(order)
        n = len(self.orig_sys)
        xs = [lhs for lhs, _ in self.orig_sys]
        fs = [rhs for _, rhs in self.orig_sys]

        # which args
        if isinstance(args, VarArgs):
            sel_vars = bool(args & VarArgs.vars)
            sel_pars = bool(args & VarArgs.params)
            sel_time = bool(args & VarArgs.time)
            arglist: list = []
            if sel_vars:
                arglist += xs
            if sel_pars:
                from .expr.core import get_params

                arglist += [Param(i) for i in get_params(fs)]
            if sel_time:
                from .expr.core import TimeExpr

                arglist += [TimeExpr()]
        else:
            arglist = []
            for a in args:
                if isinstance(a, str):
                    a = Variable(a)
                arglist.append(a)
        self.vargs = arglist

        # Jacobian wrt state
        J = [[diff(f, x) for x in xs] for f in fs]

        sys_out = list(self.orig_sys)
        ics_init = []  # initial-value description per variational var
        names = []
        for ai, a in enumerate(arglist):
            for i in range(n):
                vname = f"∂{xs[i].name}_a{ai}"
                names.append(vname)
        # equations: v_{i,a}' = sum_m J[i][m] v_{m,a} (+ df_i/dp for params)
        for ai, a in enumerate(arglist):
            vvars = [Variable(f"∂{xs[i].name}_a{ai}") for i in range(n)]
            for i in range(n):
                terms = []
                for m in range(n):
                    terms.append(J[i][m] * vvars[m])
                rhs = sum_expr(terms)
                if isinstance(a, Param):
                    rhs = rhs + diff(fs[i], a)
                sys_out.append((vvars[i], rhs))
            if isinstance(a, Variable):
                ics_init.append(("var", [1.0 if xs[i].name == a.name else 0.0 for i in range(n)]))
            elif isinstance(a, Param):
                ics_init.append(("par", [0.0] * n))
            else:
                ics_init.append(("time", None))  # -f(x0, t0), fills at ctor

        self.sys = sys_out
        self._ics_desc = ics_init
        self.n_orig = n

    @property
    def n_vargs(self) -> int:
        return len(self.vargs)

    def initial_state(self, state0, pars=None, t0: float = 0.0) -> np.ndarray:
        """Full augmented initial state from the original initial conditions
        (heyoka ``setup_variational_ics``, ``setup_variational_ics.cpp:49``)."""
        state0 = np.asarray(state0, dtype=float)
        n = self.n_orig
        blocks = [state0]
        for (kind, vals) in self._ics_desc:
            if kind == "time":
                # d x / d t0 at t0 is -f(x0, t0)
                from .cfunc import make_cfunc

                cf = make_cfunc(
                    [rhs for _, rhs in self.orig_sys],
                    vars=[lhs for lhs, _ in self.orig_sys],
                )
                f0 = np.asarray(cf(state0, pars=pars, time=t0))
                blocks.append(-f0)
            else:
                blocks.append(np.asarray(vals, dtype=float))
        return np.concatenate(blocks)

    def get_vslice(self, arg_idx: int) -> slice:
        """Slice of the augmented state holding d(state)/d(arg_idx)
        (heyoka ``get_vslice``)."""
        n = self.n_orig
        start = n + arg_idx * n
        return slice(start, start + n)
