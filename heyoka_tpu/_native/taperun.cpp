// Native CPU Taylor-method runtime: a compiled tape interpreter.
//
// Reference parity: heyoka's runtime *is* native code — an LLVM-JITed
// stepper over the decomposition tape (src/taylor_0{0,1,2}.cpp).  heyoka_tpu
// runs its hot path through XLA on the TPU; this C++ runtime provides the
// native CPU companion: the same decomposition tape, the same per-op Taylor
// recurrences (recurrences.py), the same Jorba step control
// (taylor_00.cpp:102-273 semantics), executed by an optimized C++
// interpreter.  It serves as
//   - the "opt-level-0 reference backend" of the test strategy
//     (SURVEY.md §4: compiled-vs-independent-backend equivalence),
//   - a host-side fallback/runtime when no accelerator is attached,
//   - the fast oracle for high-order recurrence validation,
//   - the extended-precision (80-bit long double) backend — the analog of
//     the reference's tut_extended_precision support, which TPUs cannot
//     provide (the numeric core is templated on the scalar type).
//
// Exposed as a plain C ABI consumed via ctypes (no pybind11 in this image).
//
// Tape encoding (produced by heyoka_tpu.native.pack_tape):
//   n_eq state variables, ops[] with:
//     opcode   int32   (see OpCode)
//     arity    int32
//     in[MAXA] int32   operand codes: >=0 -> u-var index; -1-j -> const j;
//                      -1000000-j -> par j; -2000000 -> time
//     meta0/1  int32   aux u-var indices (pair/sq/sin/cos), -1 if unused
//     alpha    double  (pow exponent)
//   consts[]: literal pool
//   rhs[]:    per state variable, operand code of its derivative
//
// Coefficient storage: cc[k * n_u + i] = order-k normalized coefficient of
// u-var i.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <limits>
#include <vector>

namespace {

constexpr int MAXA = 8;

enum OpCode : int32_t {
    OP_SUM = 0,
    OP_MUL,
    OP_DIV,
    OP_POW,
    OP_SIN,
    OP_COS,
    OP_SINH,
    OP_COSH,
    OP_TAN,
    OP_TANH,
    OP_EXP,
    OP_LOG,
    OP_SQRT,
    OP_SIGMOID,
    OP_ASIN,
    OP_ACOS,
    OP_ATAN,
    OP_ASINH,
    OP_ACOSH,
    OP_ATANH,
    OP_ERF,
    OP_ATAN2,
    OP_RELU,
    OP_RELUP,
    OP_SELECT,
    OP_CMP_LT,
    OP_CMP_LE,
    OP_CMP_GT,
    OP_CMP_GE,
    OP_CMP_EQ,
    OP_CMP_NE,
    OP_LAND,
    OP_LOR,
    OP_LNOT,
    OP_KEPE,
    OP_KEPF,
    OP_KEPDE,
};

struct TapeOp {
    int32_t opcode;
    int32_t arity;
    int32_t in[MAXA];
    int32_t meta0;
    int32_t meta1;
    double alpha;
};

template <typename T>
struct Tape {
    int32_t n_eq;
    int32_t n_ops;
    int32_t n_pars;
    std::vector<TapeOp> ops;
    std::vector<T> consts;
    std::vector<int32_t> rhs;
};

// operand value at order k (G() of recurrences.py)
template <typename T>
inline T gval(const T *cc, int32_t n_u, const Tape<T> &tp, const T *pars,
              T t, int32_t code, int32_t k)
{
    if (code >= 0) {
        return cc[static_cast<std::size_t>(k) * n_u + code];
    }
    if (code == -2000000) {
        return k == 0 ? t : (k == 1 ? T(1) : T(0));
    }
    if (code <= -1000000) {
        return k == 0 ? pars[-1000000 - code] : T(0);
    }
    return k == 0 ? tp.consts[-1 - code] : T(0);
}

template <typename T>
T newton_kepE(T ecc, T M)
{
    const T twopi = 2 * std::acos(T(-1));
    const T tol = 10 * std::numeric_limits<T>::epsilon();
    T Mr = M - twopi * std::floor(M / twopi);
    T E = Mr + T(0.85) * ecc * (std::sin(Mr) >= 0 ? T(1) : T(-1));
    for (int it = 0; it < 100; ++it) {
        const T f = E - ecc * std::sin(E) - Mr;
        const T fp = 1 - ecc * std::cos(E);
        const T d = f / fp;
        E -= d;
        if (std::fabs(d) < tol) break;
    }
    return E + (M - Mr);
}

template <typename T>
T newton_kepF(T h, T kk, T lam)
{
    const T twopi = 2 * std::acos(T(-1));
    const T tol = 10 * std::numeric_limits<T>::epsilon();
    T lr = lam - twopi * std::floor(lam / twopi);
    T F = lr;
    for (int it = 0; it < 100; ++it) {
        const T f = F + h * std::cos(F) - kk * std::sin(F) - lr;
        const T fp = 1 - h * std::sin(F) - kk * std::cos(F);
        const T d = f / fp;
        F -= d;
        if (std::fabs(d) < tol) break;
    }
    return F + (lam - lr);
}

template <typename T>
T newton_kepDE(T s0, T c0, T DM)
{
    const T twopi = 2 * std::acos(T(-1));
    const T tol = 10 * std::numeric_limits<T>::epsilon();
    T Dr = DM - twopi * std::floor(DM / twopi);
    T DE = Dr;
    for (int it = 0; it < 100; ++it) {
        const T f = DE + s0 * (1 - std::cos(DE)) - c0 * std::sin(DE) - Dr;
        const T fp = 1 + s0 * std::sin(DE) - c0 * std::cos(DE);
        const T d = f / fp;
        DE -= d;
        if (std::fabs(d) < tol) break;
    }
    return DE + (DM - Dr);
}

// order-0 evaluation of one op
template <typename T>
T eval0(const Tape<T> &tp, const TapeOp &op, const T *cc, int32_t n_u,
        const T *pars, T t)
{
    auto g = [&](int a) { return gval(cc, n_u, tp, pars, t, op.in[a], 0); };
    switch (op.opcode) {
        case OP_SUM: {
            T s = 0;
            for (int a = 0; a < op.arity; ++a) s += g(a);
            return s;
        }
        case OP_MUL: return g(0) * g(1);
        case OP_DIV: return g(0) / g(1);
        case OP_POW: return std::pow(g(0), T(op.alpha));
        case OP_SIN: return std::sin(g(0));
        case OP_COS: return std::cos(g(0));
        case OP_SINH: return std::sinh(g(0));
        case OP_COSH: return std::cosh(g(0));
        case OP_TAN: return std::tan(g(0));
        case OP_TANH: return std::tanh(g(0));
        case OP_EXP: return std::exp(g(0));
        case OP_LOG: return std::log(g(0));
        case OP_SQRT: return std::sqrt(g(0));
        case OP_SIGMOID: return 1 / (1 + std::exp(-g(0)));
        case OP_ASIN: return std::asin(g(0));
        case OP_ACOS: return std::acos(g(0));
        case OP_ATAN: return std::atan(g(0));
        case OP_ASINH: return std::asinh(g(0));
        case OP_ACOSH: return std::acosh(g(0));
        case OP_ATANH: return std::atanh(g(0));
        case OP_ERF: return std::erf(g(0));
        case OP_ATAN2: return std::atan2(g(0), g(1));
        case OP_RELU: return g(0) > 0 ? g(0) : T(0);
        case OP_RELUP: return g(0) > 0 ? T(1) : T(0);
        case OP_SELECT: return g(0) != 0 ? g(1) : g(2);
        case OP_CMP_LT: return g(0) < g(1) ? T(1) : T(0);
        case OP_CMP_LE: return g(0) <= g(1) ? T(1) : T(0);
        case OP_CMP_GT: return g(0) > g(1) ? T(1) : T(0);
        case OP_CMP_GE: return g(0) >= g(1) ? T(1) : T(0);
        case OP_CMP_EQ: return g(0) == g(1) ? T(1) : T(0);
        case OP_CMP_NE: return g(0) != g(1) ? T(1) : T(0);
        case OP_LAND: {
            for (int a = 0; a < op.arity; ++a)
                if (g(a) == 0) return T(0);
            return T(1);
        }
        case OP_LOR: {
            for (int a = 0; a < op.arity; ++a)
                if (g(a) != 0) return T(1);
            return T(0);
        }
        case OP_LNOT: return g(0) == 0 ? T(1) : T(0);
        case OP_KEPE: return newton_kepE(g(0), g(1));
        case OP_KEPF: return newton_kepF(g(0), g(1), g(2));
        case OP_KEPDE: return newton_kepDE(g(0), g(1), g(2));
    }
    return std::numeric_limits<T>::quiet_NaN();
}

// order-k recurrence of one op (k >= 1); u = this op's u-var index
template <typename T>
T rec(const Tape<T> &tp, const TapeOp &op, int32_t u, const T *cc,
      int32_t n_u, const T *pars, T t, int32_t k)
{
    const T kd = static_cast<T>(k);
    auto G = [&](int a, int32_t j) {
        return gval(cc, n_u, tp, pars, t, op.in[a], j);
    };
    auto U = [&](int32_t i, int32_t j) {
        return cc[static_cast<std::size_t>(j) * n_u + i];
    };
    switch (op.opcode) {
        case OP_SUM: {
            T s = 0;
            for (int a = 0; a < op.arity; ++a) s += G(a, k);
            return s;
        }
        case OP_MUL: {
            T s = 0;
            for (int32_t j = 0; j <= k; ++j) s += G(0, j) * G(1, k - j);
            return s;
        }
        case OP_DIV: {
            T s = 0;
            for (int32_t j = 0; j < k; ++j) s += U(u, j) * G(1, k - j);
            return (G(0, k) - s) / G(1, 0);
        }
        case OP_POW: {
            T s = 0;
            for (int32_t j = 0; j < k; ++j)
                s += (T(op.alpha) * (k - j) - j) * G(0, k - j) * U(u, j);
            return s / (kd * G(0, 0));
        }
        case OP_SIN:
        case OP_SINH:
        case OP_COSH: {
            T s = 0;
            for (int32_t j = 1; j <= k; ++j)
                s += j * G(0, j) * U(op.meta0, k - j);
            return s / kd;
        }
        case OP_COS: {
            T s = 0;
            for (int32_t j = 1; j <= k; ++j)
                s += j * G(0, j) * U(op.meta0, k - j);
            return -s / kd;
        }
        case OP_EXP: {
            T s = 0;
            for (int32_t j = 1; j <= k; ++j) s += j * G(0, j) * U(u, k - j);
            return s / kd;
        }
        case OP_LOG: {
            T s = 0;
            for (int32_t j = 1; j < k; ++j) s += j * U(u, j) * G(0, k - j);
            return (G(0, k) - s / kd) / G(0, 0);
        }
        case OP_SQRT: {
            T s = 0;
            for (int32_t j = 1; j < k; ++j) s += U(u, j) * U(u, k - j);
            return (G(0, k) - s) / (2 * U(u, 0));
        }
        case OP_TAN: {
            T s = 0;
            for (int32_t m = 0; m < k; ++m)
                s += U(op.meta0, m) * (k - m) * G(0, k - m);
            return G(0, k) + s / kd;
        }
        case OP_TANH: {
            T s = 0;
            for (int32_t m = 0; m < k; ++m)
                s += U(op.meta0, m) * (k - m) * G(0, k - m);
            return G(0, k) - s / kd;
        }
        case OP_SIGMOID: {
            T s = 0;
            for (int32_t m = 0; m < k; ++m)
                s += (U(u, m) - U(op.meta0, m)) * (k - m) * G(0, k - m);
            return s / kd;
        }
        case OP_ASIN:
        case OP_ATAN:
        case OP_ASINH:
        case OP_ACOSH:
        case OP_ATANH:
        case OP_ACOS: {
            const T sign = op.opcode == OP_ACOS ? T(-1) : T(1);
            T s = 0;
            for (int32_t m = 1; m < k; ++m)
                s += G(1, m) * (k - m) * U(u, k - m);
            return (sign * kd * G(0, k) - s) / (kd * G(1, 0));
        }
        case OP_ERF: {
            T s = 0;
            for (int32_t m = 0; m < k; ++m)
                s += G(1, m) * (k - m) * G(0, k - m);
            return (2 / std::sqrt(std::acos(T(-1)))) * s / kd;
        }
        case OP_ATAN2: {
            T r1 = 0, r2 = 0, s = 0;
            for (int32_t m = 0; m < k; ++m) {
                r1 += G(1, m) * (k - m) * G(0, k - m);
                r2 += G(0, m) * (k - m) * G(1, k - m);
            }
            for (int32_t m = 1; m < k; ++m)
                s += G(2, m) * (k - m) * U(u, k - m);
            return (r1 - r2 - s) / (kd * G(2, 0));
        }
        case OP_RELU: return G(0, 0) > 0 ? G(0, k) : T(0);
        case OP_RELUP: return T(0);
        case OP_SELECT: return G(0, 0) != 0 ? G(1, k) : G(2, k);
        case OP_CMP_LT:
        case OP_CMP_LE:
        case OP_CMP_GT:
        case OP_CMP_GE:
        case OP_CMP_EQ:
        case OP_CMP_NE:
        case OP_LAND:
        case OP_LOR:
        case OP_LNOT: return T(0);
        case OP_KEPE: {
            const int32_t si = op.meta0, ci = op.meta1;
            auto q = [&](int32_t m) {
                T s = 0;
                for (int32_t j = 0; j <= m; ++j) s += G(0, j) * U(ci, m - j);
                return s;
            };
            T t1 = kd * G(1, k), t2 = 0, t3 = 0;
            for (int32_t j = 1; j <= k; ++j) t2 += j * G(0, j) * U(si, k - j);
            for (int32_t m = 1; m < k; ++m) t3 += q(m) * (k - m) * U(u, k - m);
            return (t1 + t2 + t3) / (kd * (1 - q(0)));
        }
        case OP_KEPF: {
            const int32_t si = op.meta0, ci = op.meta1;
            auto w = [&](int32_t m) {
                T s = 0;
                for (int32_t j = 0; j <= m; ++j)
                    s += G(0, j) * U(si, m - j) + G(1, j) * U(ci, m - j);
                return s;
            };
            T t1 = kd * G(2, k), t2 = 0, t3 = 0, t4 = 0;
            for (int32_t j = 1; j <= k; ++j) {
                t2 -= j * G(0, j) * U(ci, k - j);
                t3 += j * G(1, j) * U(si, k - j);
            }
            for (int32_t m = 1; m < k; ++m) t4 += w(m) * (k - m) * U(u, k - m);
            return (t1 + t2 + t3 + t4) / (kd * (1 - w(0)));
        }
        case OP_KEPDE: {
            const int32_t si = op.meta0, ci = op.meta1;
            auto w = [&](int32_t m) {
                T s = 0;
                for (int32_t j = 0; j <= m; ++j)
                    s += G(0, j) * U(si, m - j) - G(1, j) * U(ci, m - j);
                return s;
            };
            auto omc = [&](int32_t i) {
                return i == 0 ? (1 - U(ci, 0)) : -U(ci, i);
            };
            T t1 = kd * G(2, k), t2 = 0, t3 = 0, t4 = 0;
            for (int32_t j = 1; j <= k; ++j) {
                t2 -= j * G(0, j) * omc(k - j);
                t3 += j * G(1, j) * U(si, k - j);
            }
            for (int32_t m = 1; m < k; ++m) t4 -= w(m) * (k - m) * U(u, k - m);
            return (t1 + t2 + t3 + t4) / (kd * (1 + w(0)));
        }
    }
    return std::numeric_limits<T>::quiet_NaN();
}

// full jet: cc has (order+1) * n_u scalars, state preloaded into order 0
template <typename T>
void compute_jet(const Tape<T> &tp, T *cc, const T *pars, T t, int32_t order)
{
    const int32_t n_u = tp.n_eq + tp.n_ops;
    for (int32_t i = 0; i < tp.n_ops; ++i) {
        cc[tp.n_eq + i] = eval0(tp, tp.ops[i], cc, n_u, pars, t);
    }
    for (int32_t k = 1; k <= order; ++k) {
        T *row = cc + static_cast<std::size_t>(k) * n_u;
        for (int32_t i = 0; i < tp.n_eq; ++i) {
            row[i] = gval(cc, n_u, tp, pars, t, tp.rhs[i], k - 1) / k;
        }
        for (int32_t i = 0; i < tp.n_ops; ++i) {
            row[tp.n_eq + i]
                = rec(tp, tp.ops[i], tp.n_eq + i, cc, n_u, pars, t, k);
        }
    }
}

// Jorba rho step-size control (taylor_00.cpp:102-273 semantics)
template <typename T>
T determine_h(const T *cc, int32_t n_u, int32_t n_eq, int32_t order, T max_dt)
{
    T m0 = 0, mo = 0, mo1 = 0;
    for (int32_t i = 0; i < n_eq; ++i) {
        m0 = std::fmax(m0, std::fabs(cc[i]));
        mo = std::fmax(
            mo, std::fabs(cc[static_cast<std::size_t>(order) * n_u + i]));
        mo1 = std::fmax(
            mo1,
            std::fabs(cc[static_cast<std::size_t>(order - 1) * n_u + i]));
    }
    const T num = m0 <= 1 ? T(1) : m0;
    const T rho_o = std::pow(num / mo, T(1) / order);
    const T rho_o1 = std::pow(num / mo1, T(1) / (order - 1));
    const T rho = std::fmin(rho_o, rho_o1);
    // e*e as a product (not exp(2)) to match the python/double constant
    const T e1 = std::exp(T(1));
    const T fac = std::exp(T(-0.7) / (order - 1)) / (e1 * e1);
    T h = rho * fac;
    h = std::fmin(h, std::fabs(max_dt));
    return max_dt < 0 ? -h : h;
}

template <typename T>
void horner_update(const T *cc, int32_t n_u, int32_t n_eq, int32_t order,
                   T h, T *out)
{
    for (int32_t i = 0; i < n_eq; ++i) {
        T r = cc[static_cast<std::size_t>(order) * n_u + i];
        for (int32_t k = order - 1; k >= 0; --k) {
            r = cc[static_cast<std::size_t>(k) * n_u + i] + r * h;
        }
        out[i] = r;
    }
}

template <typename T>
Tape<T> build_tape(int32_t n_eq, int32_t n_ops, int32_t n_pars,
                   const int32_t *opcodes, const int32_t *arity,
                   const int32_t *inputs, const int32_t *meta,
                   const double *alpha, const double *consts,
                   int32_t n_consts, const int32_t *rhs)
{
    Tape<T> tp;
    tp.n_eq = n_eq;
    tp.n_ops = n_ops;
    tp.n_pars = n_pars;
    tp.ops.resize(n_ops);
    for (int32_t i = 0; i < n_ops; ++i) {
        TapeOp &op = tp.ops[i];
        op.opcode = opcodes[i];
        op.arity = arity[i];
        std::memcpy(op.in, inputs + static_cast<std::size_t>(i) * MAXA,
                    sizeof(int32_t) * MAXA);
        op.meta0 = meta[2 * i];
        op.meta1 = meta[2 * i + 1];
        op.alpha = alpha[i];
    }
    tp.consts.assign(consts, consts + n_consts);
    tp.rhs.assign(rhs, rhs + n_eq);
    return tp;
}

template <typename T>
void jet_impl(int32_t n_eq, int32_t n_ops, int32_t n_pars,
              const int32_t *opcodes, const int32_t *arity,
              const int32_t *inputs, const int32_t *meta, const double *alpha,
              const double *consts, int32_t n_consts, const int32_t *rhs,
              const T *state, const T *pars, T t, int32_t order, T *out_cc)
{
    const Tape<T> tp = build_tape<T>(n_eq, n_ops, n_pars, opcodes, arity,
                                     inputs, meta, alpha, consts, n_consts,
                                     rhs);
    const int32_t n_u = n_eq + n_ops;
    std::memset(out_cc, 0,
                sizeof(T) * static_cast<std::size_t>(order + 1) * n_u);
    std::memcpy(out_cc, state, sizeof(T) * n_eq);
    compute_jet(tp, out_cc, pars, t, order);
}

template <typename T>
int64_t propagate_until_impl(const Tape<T> &tp, T *state, const T *pars,
                             T *time_io, T target, T max_dt,
                             int64_t max_steps, int32_t order)
{
    const int32_t n_u = tp.n_eq + tp.n_ops;
    std::vector<T> cc(static_cast<std::size_t>(order + 1) * n_u);
    T t_hi = *time_io, t_lo = 0;
    const bool fwd = target >= t_hi;
    int64_t steps = 0;
    while (true) {
        const T rem = target - (t_hi + t_lo);
        if ((fwd && rem <= 0) || (!fwd && rem >= 0)) break;
        T cap = std::fmin(std::fabs(rem), max_dt);
        std::fill(cc.begin(), cc.end(), T(0));
        std::memcpy(cc.data(), state, sizeof(T) * tp.n_eq);
        compute_jet(tp, cc.data(), pars, t_hi, order);
        const T h
            = determine_h(cc.data(), n_u, tp.n_eq, order, fwd ? cap : -cap);
        horner_update(cc.data(), n_u, tp.n_eq, order, h, state);
        // double-length time accumulation (Knuth two-sum)
        {
            const T s = t_hi + h;
            const T v = s - t_hi;
            const T err = (t_hi - (s - v)) + (h - v);
            t_lo += err;
            t_hi = s;
            const T s2 = t_hi + t_lo;
            t_lo = t_lo - (s2 - t_hi);
            t_hi = s2;
        }
        ++steps;
        for (int32_t i = 0; i < tp.n_eq; ++i) {
            if (!std::isfinite(state[i])) {
                *time_io = t_hi + t_lo;
                return -steps;
            }
        }
        if (max_steps > 0 && steps >= max_steps) break;
    }
    *time_io = t_hi + t_lo;
    return steps;
}

} // namespace

extern "C" {

// Compute the normalized Taylor-coefficient jet:
// out_cc must hold (order+1) * (n_eq + n_ops) doubles.
void ht_jet(int32_t n_eq, int32_t n_ops, int32_t n_pars,
            const int32_t *opcodes, const int32_t *arity,
            const int32_t *inputs, const int32_t *meta, const double *alpha,
            const double *consts, int32_t n_consts, const int32_t *rhs,
            const double *state, const double *pars, double t, int32_t order,
            double *out_cc)
{
    jet_impl<double>(n_eq, n_ops, n_pars, opcodes, arity, inputs, meta,
                     alpha, consts, n_consts, rhs, state, pars, t, order,
                     out_cc);
}

// Extended-precision (80-bit long double) jet.
void ht_jet_ld(int32_t n_eq, int32_t n_ops, int32_t n_pars,
               const int32_t *opcodes, const int32_t *arity,
               const int32_t *inputs, const int32_t *meta,
               const double *alpha, const double *consts, int32_t n_consts,
               const int32_t *rhs, const long double *state,
               const long double *pars, long double t, int32_t order,
               long double *out_cc)
{
    jet_impl<long double>(n_eq, n_ops, n_pars, opcodes, arity, inputs, meta,
                          alpha, consts, n_consts, rhs, state, pars, t,
                          order, out_cc);
}

// Adaptive propagate-until; returns the step count (negative on non-finite
// state).  state is updated in place; *time_io tracks the current time.
int64_t ht_propagate_until(
    int32_t n_eq, int32_t n_ops, int32_t n_pars, const int32_t *opcodes,
    const int32_t *arity, const int32_t *inputs, const int32_t *meta,
    const double *alpha, const double *consts, int32_t n_consts,
    const int32_t *rhs, double *state, const double *pars, double *time_io,
    double target, double max_dt, int64_t max_steps, int32_t order)
{
    const Tape<double> tp = build_tape<double>(
        n_eq, n_ops, n_pars, opcodes, arity, inputs, meta, alpha, consts,
        n_consts, rhs);
    return propagate_until_impl<double>(tp, state, pars, time_io, target,
                                        max_dt, max_steps, order);
}

// Extended-precision adaptive propagate-until.
int64_t ht_propagate_until_ld(
    int32_t n_eq, int32_t n_ops, int32_t n_pars, const int32_t *opcodes,
    const int32_t *arity, const int32_t *inputs, const int32_t *meta,
    const double *alpha, const double *consts, int32_t n_consts,
    const int32_t *rhs, long double *state, const long double *pars,
    long double *time_io, long double target, long double max_dt,
    int64_t max_steps, int32_t order)
{
    const Tape<long double> tp = build_tape<long double>(
        n_eq, n_ops, n_pars, opcodes, arity, inputs, meta, alpha, consts,
        n_consts, rhs);
    return propagate_until_impl<long double>(tp, state, pars, time_io,
                                             target, max_dt, max_steps,
                                             order);
}

// Batched adaptive propagate-until: B independent trajectories, thread
// parallel (the host-runtime analog of the reference's batch mode, which
// reaches SIMD lanes via LLVM vector types + a TBB pool; trajectories are
// embarrassingly parallel, so here each OpenMP thread runs the scalar
// driver on its own lanes).  Per-lane step counts land in steps_out
// (negative on non-finite state).
void ht_propagate_until_batch(
    int32_t n_eq, int32_t n_ops, int32_t n_pars, const int32_t *opcodes,
    const int32_t *arity, const int32_t *inputs, const int32_t *meta,
    const double *alpha, const double *consts, int32_t n_consts,
    const int32_t *rhs, int32_t batch, double *states, const double *pars,
    double *times, const double *targets, double max_dt, int64_t max_steps,
    int32_t order, int64_t *steps_out)
{
    const Tape<double> tp = build_tape<double>(
        n_eq, n_ops, n_pars, opcodes, arity, inputs, meta, alpha, consts,
        n_consts, rhs);
    const int32_t stride = n_pars > 0 ? n_pars : 1;
#if defined(_OPENMP)
#pragma omp parallel for schedule(dynamic)
#endif
    for (int32_t b = 0; b < batch; ++b) {
        steps_out[b] = propagate_until_impl<double>(
            tp, states + static_cast<std::size_t>(b) * n_eq,
            pars + static_cast<std::size_t>(b) * stride, times + b,
            targets[b], max_dt, max_steps, order);
    }
}

} // extern "C"
