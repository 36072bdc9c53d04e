"""Double-length ("double-double") arithmetic.

Reference parity: heyoka's dfloat (``src/detail/dfloat.cpp``,
``src/detail/llvm_helpers_dl.cpp``) — error-free two-float accumulation used
for the integrator time variable so that accuracy is maintained over tens of
billions of steps (``README.md:46-47``).  Classic Dekker/Knuth error-free
transformations; pure jnp, works for any float dtype and under jit/vmap.
"""

from __future__ import annotations


def two_sum(a, b):
    """Knuth two-sum: s + err == a + b exactly."""
    s = a + b
    v = s - a
    err = (a - (s - v)) + (b - v)
    return s, err


def quick_two_sum(a, b):
    """Dekker fast two-sum; requires |a| >= |b| (or a == 0)."""
    s = a + b
    err = b - (s - a)
    return s, err


def dd_add_d(hi, lo, x):
    """(hi, lo) + x with renormalization; returns (hi', lo')."""
    s, e = two_sum(hi, x)
    e = e + lo
    return quick_two_sum(s, e)


def dd_add_dd(ahi, alo, bhi, blo):
    s, e = two_sum(ahi, bhi)
    e = e + alo + blo
    return quick_two_sum(s, e)


def dd_neg(hi, lo):
    return -hi, -lo


def dd_sub_d(hi, lo, x):
    return dd_add_d(hi, lo, -x)


def dd_normalize(hi, lo):
    return quick_two_sum(hi, lo)
