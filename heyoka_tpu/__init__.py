"""heyoka_tpu — a TPU-native Taylor-method ODE integration framework.

A from-scratch rebuild of the capabilities of bluescarni/heyoka (C++/LLVM) as an
idiomatic JAX/XLA/Pallas framework:

- symbolic expression system (``heyoka_tpu.expr``) — hashable AST, operator
  overloads with constant folding, symbolic differentiation, decomposition of
  ODE right-hand sides into an SSA tape of elementary operations
  (reference: heyoka ``include/heyoka/expression.hpp``, ``src/expression_*.cpp``);
- Taylor-method integrators (``heyoka_tpu.taylor``) — the per-order jet of
  normalized Taylor coefficients is emitted as a single XLA computation,
  adaptive step-size control (Jorba's rho prescription) and the propagation
  loops run fully on-device inside ``lax.while_loop``
  (reference: heyoka ``src/taylor_0{0,1,2}.cpp``, ``src/taylor_adaptive.cpp``);
- batch mode via ``jax.vmap`` (reference: ``taylor_adaptive_batch``), ensembles
  via ``shard_map`` over a device mesh (reference: ``src/ensemble_propagate.cpp``);
- compiled functions (``cfunc``), event detection, variational equations,
  and the model library (pendulum, N-body, CR3BP, SGP4, ...) built on top.

Double precision is the default working dtype, as in the reference; importing
this package enables JAX x64 mode.
"""

import jax as _jax

_jax.config.update("jax_enable_x64", True)

from .expr.core import (  # noqa: E402
    Expr,
    Number,
    Variable,
    Param,
    TimeExpr,
    Func,
    make_vars,
    par,
    time as time_,
    subs,
    rename_variables,
    get_variables,
    get_params,
    is_time_dependent,
)
from .expr import math  # noqa: E402
from .expr.math import (  # noqa: E402
    sin, cos, tan, asin, acos, atan, atan2,
    sinh, cosh, tanh, asinh, acosh, atanh,
    exp, log, sqrt, cbrt, erf, sigmoid, relu, relup,
    kepE, kepF, kepDE, sum_ as sum_expr, sum_, sum_sq, prod, pi, select,
    lt, gt, le, ge, eq, ne, logical_and, logical_or, logical_not,
)
from .expr.diff import diff  # noqa: E402
from .expr.dtens import diff_tensors, dtens  # noqa: E402
from .expr.decompose import taylor_decompose_sys, function_decompose  # noqa: E402
from .taylor.adaptive import TaylorAdaptive, taylor_adaptive  # noqa: E402
from .taylor.batch import TaylorAdaptiveBatch, taylor_adaptive_batch  # noqa: E402
from .taylor.outcome import TaylorOutcome  # noqa: E402

#: heyoka.py-style alias (``hy.taylor_outcome.success`` etc.)
taylor_outcome = TaylorOutcome
from .taylor.continuous import (  # noqa: E402
    ContinuousOutput,
    ContinuousOutputBatch,
)
from .taylor.stepper import taylor_order_from_tol  # noqa: E402


def recommended_simd_size(dtype=None) -> int:
    """The natural batch width of the attached backend — the analog of
    heyoka's ``recommended_simd_size<T>()`` (``llvm_state.hpp:88-110``).
    On an accelerator backend this is the 128-lane vector tile (also the
    Pallas kernel batch tile — the same for f32 and f64, since TPU f64
    is emulated on f32 lanes, so ``dtype`` is accepted only for API
    parity); on CPU it is a vector-register-ish 8.  Batch sizes that are
    a multiple of this fill every lane of the batched engines."""
    import jax as _j

    return 8 if _j.default_backend() == "cpu" else 128
from .taylor.events import t_event, nt_event, EventDirection  # noqa: E402
from .cfunc import cfunc, make_cfunc  # noqa: E402
from .lagham import lagrangian, hamiltonian  # noqa: E402
from .varsys import var_ode_sys, VarArgs  # noqa: E402
from .eop_sw import EOPData, SWData, eop_data, sw_data  # noqa: E402
from . import s11n  # noqa: E402
from . import gp  # noqa: E402
from .callback import AngleReducer, StepCallbackSet, angle_reducer  # noqa: E402
from . import logging  # noqa: E402
from .logging import (  # noqa: E402
    set_logger_level_trace,
    set_logger_level_debug,
    set_logger_level_info,
    set_logger_level_warn,
    set_logger_level_err,
)
from . import models  # noqa: E402
from . import multiprec  # noqa: E402
from .ensemble import (  # noqa: E402
    ensemble_propagate_until,
    ensemble_propagate_for,
    ensemble_propagate_grid,
    ensemble_propagate_until_batch,
    ensemble_propagate_for_batch,
    ensemble_propagate_grid_batch,
)

time = time_

__version__ = "0.1.0"
