"""Symbolic expression layer.

TPU-native analog of heyoka's expression system (``include/heyoka/expression.hpp``,
``src/expression_*.cpp``): a hashable immutable AST over
``Number | Variable | Param | TimeExpr | Func``, with constant-folding operator
overloads, symbolic differentiation, and decomposition into an SSA tape whose
compilation unit is handed to XLA (instead of heyoka's LLVM JIT).
"""

from . import core, math, registry, decompose, diff, dtens  # noqa: F401
