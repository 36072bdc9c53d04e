"""Feed-forward neural network as an expression graph
(reference: ``src/model/ffnn.cpp:147``, ``include/heyoka/model/ffnn.hpp:98-124``).

Weights and biases are runtime params (``par[i]``), laid out layer by layer:
for each layer, the weight matrix in row-major order (out x in), then the
biases — the same flattened layout as the reference, so a trained parameter
vector ports directly.  This is the neural-ODE building block: the returned
expressions drop straight into an ODE right-hand side.
"""

from __future__ import annotations

from typing import Callable, Sequence

from ..expr.core import Param, expr, sum_expr


def ffnn(
    inputs: Sequence,
    nn_hidden: Sequence[int],
    n_out: int,
    activations: Sequence[Callable],
    *,
    first_par_idx: int = 0,
):
    """Build the symbolic outputs of a fully connected net.

    ``activations`` has one callable per layer (hidden layers + output
    layer), each mapping Expr -> Expr (e.g. ``heyoka_tpu.tanh``; use
    ``lambda e: e`` for linear).
    """
    ins = [expr(i) for i in inputs]
    sizes = [len(ins)] + [int(h) for h in nn_hidden] + [int(n_out)]
    if len(activations) != len(sizes) - 1:
        raise ValueError(
            f"need {len(sizes) - 1} activations (hidden + output), "
            f"got {len(activations)}"
        )

    idx = int(first_par_idx)
    layer = ins
    for li in range(len(sizes) - 1):
        n_in, n_o = sizes[li], sizes[li + 1]
        act = activations[li]
        out = []
        w_base = idx
        b_base = idx + n_in * n_o
        for o in range(n_o):
            terms = [
                Param(w_base + o * n_in + i) * layer[i] for i in range(n_in)
            ]
            terms.append(Param(b_base + o))
            out.append(act(sum_expr(terms)))
        idx = b_base + n_o
        layer = out
    return layer


def ffnn_par_count(n_in: int, nn_hidden: Sequence[int], n_out: int) -> int:
    sizes = [int(n_in)] + [int(h) for h in nn_hidden] + [int(n_out)]
    return sum(
        sizes[i] * sizes[i + 1] + sizes[i + 1] for i in range(len(sizes) - 1)
    )
