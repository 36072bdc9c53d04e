"""Compiled functions (cfunc).

Reference parity: heyoka ``cfunc<T>`` (``include/heyoka/expression.hpp:734-965``,
``src/cfunc_class.cpp``, codegen ``src/expression_cfunc.cpp``): compile a
vector function of expressions into a callable ``f(inputs, pars, time)`` with
single (1-D) and multi (2-D) evaluation.

TPU-native design: the decomposed tape is traced once into a jaxpr and jitted
(the analog of ``add_cfunc``'s LLVM emission, ``expression_cfunc.cpp:1505``);
multi-eval is ``jax.vmap`` (the analog of the strided batch entry point), and
multithreaded evaluation (``multi_eval_mt``, ``cfunc_class.cpp:726``) is XLA's
own parallelism — no TBB chunking needed.
"""

from __future__ import annotations

from functools import cached_property

import jax
import jax.numpy as jnp
import numpy as np

from .expr import registry as _reg
from .expr.decompose import Tape, function_decompose


def tape_eval(tape: Tape, inputs, pars, t):
    """Evaluate a decomposed tape at order 0 (shared with the jet engine)."""
    n_eq = tape.n_eq
    vals = [None] * tape.n_uvars

    def G(operand):
        kind = operand[0]
        if kind == "c":
            return operand[1]
        if kind == "p":
            return pars[operand[1]]
        if kind == "t":
            return t
        return vals[operand[1]]

    for i in range(n_eq):
        vals[i] = inputs[i]
    for oi, op in enumerate(tape.ops):
        iv = [G(b) for b in op.inputs]
        if op.op == "mul":
            r = iv[0] * iv[1]
        elif op.op == "pow":
            from .taylor.jet import _pow0

            r = _pow0(iv[0], op.meta["alpha"])
        elif op.op in ("asin", "acos", "atan", "asinh", "acosh", "atanh", "erf"):
            r = _reg.opdef(op.op).evaluate(iv[0])
        elif op.op == "atan2":
            r = _reg.opdef(op.op).evaluate(iv[0], iv[1])
        else:
            r = _reg.opdef(op.op).evaluate(*iv)
        vals[n_eq + oi] = r
    return [G(o) for o in tape.outputs]


class cfunc:
    """Compiled vector function of expressions.

    ``inputs`` layout: single eval takes ``(n_vars,)``; multi eval takes
    ``(n_evals, n_vars)`` with outputs ``(n_evals, n_outs)`` (delta from the
    reference's column-major mdspans: row-major is the natural jax layout).
    """

    def __init__(self, fns, vars=None, *, dtype=jnp.float64):
        self.tape = function_decompose(fns, vars)
        self.fns = list(fns)
        self.dtype = jnp.dtype(dtype)

    @property
    def vars(self) -> list:
        """The input variable names, in order (reference ``get_vars``)."""
        return list(self.tape.var_names)

    @property
    def fn(self) -> list:
        """The compiled expressions (reference ``get_fn``)."""
        return list(self.fns)

    @property
    def dc(self):
        """The decomposition tape (reference ``get_dc``)."""
        return self.tape

    @property
    def n_vars(self) -> int:
        return self.tape.n_eq

    @property
    def n_outs(self) -> int:
        return len(self.tape.outputs)

    @property
    def n_pars(self) -> int:
        return self.tape.n_pars

    @cached_property
    def _single(self):
        tape, dtype = self.tape, self.dtype

        @jax.jit
        def f(inputs, pars, t):
            outs = tape_eval(tape, inputs, pars, t)
            return jnp.stack([jnp.asarray(o, dtype=dtype) for o in outs])

        return f

    @cached_property
    def _multi(self):
        tape, dtype = self.tape, self.dtype

        def f1(inputs, pars, t):
            outs = tape_eval(tape, inputs, pars, t)
            return jnp.stack([jnp.asarray(o, dtype=dtype) for o in outs])

        return jax.jit(jax.vmap(f1, in_axes=(0, None, None)))

    @cached_property
    def _multi_batch_pars(self):
        tape, dtype = self.tape, self.dtype

        def f1(inputs, pars, t):
            outs = tape_eval(tape, inputs, pars, t)
            return jnp.stack([jnp.asarray(o, dtype=dtype) for o in outs])

        return jax.jit(jax.vmap(f1, in_axes=(0, 0, None)))

    @cached_property
    def _multi_time(self):
        tape, dtype = self.tape, self.dtype

        def f1(inputs, pars, t):
            outs = tape_eval(tape, inputs, pars, t)
            return jnp.stack([jnp.asarray(o, dtype=dtype) for o in outs])

        return jax.jit(jax.vmap(f1, in_axes=(0, None, 0)))

    @cached_property
    def _multi_batch_pars_time(self):
        tape, dtype = self.tape, self.dtype

        def f1(inputs, pars, t):
            outs = tape_eval(tape, inputs, pars, t)
            return jnp.stack([jnp.asarray(o, dtype=dtype) for o in outs])

        return jax.jit(jax.vmap(f1, in_axes=(0, 0, 0)))

    def __call__(self, inputs, pars=None, time=0.0):
        inputs = jnp.asarray(inputs, dtype=self.dtype)
        if pars is None:
            pars = jnp.zeros((self.n_pars,), self.dtype)
        else:
            pars = jnp.asarray(pars, dtype=self.dtype)
        t_arr = np.asarray(time)
        if inputs.ndim == 1:
            return self._single(
                inputs, pars, jnp.asarray(float(time), self.dtype)
            )
        if inputs.ndim == 2:
            # per-evaluation times are supported in multi-eval (the
            # reference's time-batched cfunc evaluation, cfunc_class.cpp)
            if t_arr.ndim == 1:
                t = jnp.asarray(t_arr, self.dtype)
                if t.shape[0] != inputs.shape[0]:
                    raise ValueError("time must have shape (n_evals,)")
                if pars.ndim == 2:
                    return self._multi_batch_pars_time(inputs, pars, t)
                return self._multi_time(inputs, pars, t)
            t = jnp.asarray(float(time), self.dtype)
            if pars.ndim == 2:
                return self._multi_batch_pars(inputs, pars, t)
            return self._multi(inputs, pars, t)
        raise ValueError("inputs must be 1-D or 2-D")

    def __getstate__(self):
        return {
            "fns": self.fns,
            "vars": self.tape.var_names,
            "dtype": self.dtype.name,
        }

    def __setstate__(self, st):
        self.__init__(st["fns"], vars=st["vars"], dtype=st["dtype"])

    def __repr__(self):
        return (
            f"cfunc(n_vars={self.n_vars}, n_outs={self.n_outs}, "
            f"n_pars={self.n_pars}, dtype={self.dtype.name})"
        )


def make_cfunc(fns, vars=None, **kw) -> cfunc:
    """Factory mirroring heyoka's ``cfunc<T>`` ctor / ``add_cfunc``."""
    return cfunc(fns, vars, **kw)
