"""The precision ladder: f64 (TPU/CPU) -> long double -> quad -> arbitrary.

The reference supports double / long double / __float128 / MPFR reals
(tut_extended_precision, tut_arbitrary_precision).  heyoka_tpu's ladder:

- f32/f64 through jax (TPU/CPU) — the production path;
- 80-bit long double and __float128 through the native C++ runtime
  (same tape, same recurrences, templated scalar type);
- any decimal precision through the mpmath-backed interpreter.

The classic demonstration is time reversibility (benchmarks.rst:162-192):
propagate the pendulum forward and back and measure the return error.

Run:  python examples/12_precision_ladder.py
"""

import ctypes

import numpy as np

import heyoka_tpu as hy
from heyoka_tpu import native as nat
from heyoka_tpu.expr.decompose import taylor_decompose_sys

tape = taylor_decompose_sys(hy.models.pendulum())
IC = [0.05, 0.025]
T = 200.0

# -- double (native C++; the jax path gives the same class of error) ------
s1, t1, _ = nat.native_propagate_until(tape, IC, None, 0.0, T, 20)
s2, _, _ = nat.native_propagate_until(tape, s1, None, t1, 0.0, 20)
err_f64 = np.abs(s2 - np.asarray(IC)).max()

# -- 80-bit long double ----------------------------------------------------
s0 = np.array(IC, np.longdouble)
s1, t1, _ = nat.native_propagate_until_ld(tape, s0, None, 0.0, T, 26)
s2, _, _ = nat.native_propagate_until_ld(tape, s1, None, t1, 0.0, 26)
err_ld = float(np.abs(s2 - s0).max())

# -- __float128 (double-double I/O at the boundary) --------------------------
hi, lo, th, tl, _ = nat.native_propagate_until_f128(tape, IC, None, 0.0, T, 40)
p = nat.pack_tape(tape)
th2, tl2 = ctypes.c_double(th), ctypes.c_double(tl)
nat._lib().ht_propagate_until_f128(
    p["n_eq"], p["n_ops"], p["n_pars"], p["opcodes"], p["arity"],
    p["inputs"], p["meta"], p["alpha"], p["consts"], p["n_consts"],
    p["rhs"], hi, lo, np.zeros(1), ctypes.byref(th2), ctypes.byref(tl2),
    0.0, np.inf, np.int64(0), np.int32(40))
err_q = max(abs((hi[0] - IC[0]) + lo[0]), abs((hi[1] - IC[1]) + lo[1]))

# -- arbitrary precision (mpmath, 50 digits) --------------------------------
import mpmath as mp  # noqa: E402

mpta = hy.multiprec.MPTaylorIntegrator(tape, IC, dps=50)
with mp.workdps(50):
    x0, v0 = mp.mpf(IC[0]), mp.mpf(IC[1])
mpta.propagate_until(T)
mpta.propagate_until(0.0)
with mp.workdps(50):
    err_mp = max(abs(mpta.state[0] - x0), abs(mpta.state[1] - v0))

print(f"pendulum 0 -> {T:g} -> 0 return error:")
print(f"  double       : {err_f64:.3e}")
print(f"  long double  : {err_ld:.3e}")
print(f"  __float128   : {err_q:.3e}")
print(f"  mpmath 50 dps: {mp.nstr(err_mp, 3)}")
