"""Taylor-method integrator core.

TPU-native analog of heyoka's ``src/taylor_0{0,1,2}.cpp`` /
``src/taylor_adaptive*.cpp``: the per-order jet of normalized Taylor
coefficients is built as one XLA computation from the decomposed tape,
adaptive step-size control follows Jorba's rho prescription, and all
propagation loops run on-device inside ``lax.while_loop``.
"""

from . import recurrences, jet, stepper, adaptive, batch, outcome  # noqa: F401
from .compact import make_jet_fn_compact  # noqa: F401
from .compact_loop import (  # noqa: F401
    make_jet_fn_compact_loop,
    make_jet_fn_compact_batched,
    make_batched_step,
    make_batched_step_mixed,
)
from .compact_flat import make_batched_step_flat, jit_flat_step  # noqa: F401
