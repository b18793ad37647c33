"""Graph convolution over mesh edges.

Parity: reference ops/graph_conv.py:17 (`GraphConv` nn.Module) +
csrc/gather_scatter/ (191 LoC).  On TPU the gather/scatter becomes a
`segment_sum` over directed edges — XLA lowers it to sorted scatter-adds,
and its transpose (a gather) is the backward.

The module is a flax.linen layer; a functional `graph_conv` and the naive
`gather_scatter_python` reference are also provided.
"""

from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp


def gather_scatter(input: jnp.ndarray, edges: jnp.ndarray, directed: bool = False):
    """Sum neighbor features over edges (reference ops/graph_conv.py:92/csrc).

    input: (V, D) vertex features; edges: (E, 2) int (may contain -1 padding).
    Returns (V, D): out[i] = sum_{j : (i,j) in E} input[j] (+ reverse if
    undirected).
    """
    V = input.shape[0]
    valid = jnp.all(edges >= 0, axis=-1)
    e0 = jnp.where(valid, edges[:, 0], V)  # scatter to dropped row V
    e1 = jnp.where(valid, edges[:, 1], V)
    out = jax.ops.segment_sum(input[jnp.maximum(edges[:, 1], 0)] *
                              valid[:, None], e0, num_segments=V + 1)
    if not directed:
        out = out + jax.ops.segment_sum(
            input[jnp.maximum(edges[:, 0], 0)] * valid[:, None],
            e1,
            num_segments=V + 1,
        )
    return out[:V]


def gather_scatter_python(input, edges, directed: bool = False):
    """Reference-naming alias for the oracle implementation."""
    return gather_scatter(input, edges, directed)


class GraphConv(nn.Module):
    """y_i = W0 x_i + sum_{j in N(i)} W1 x_j (reference ops/graph_conv.py:17)."""

    input_dim: int
    output_dim: int
    # note: the reference calls this arg `init`; renamed because flax.linen
    # Modules reserve `.init` for parameter initialization.
    init_method: str = "normal"
    directed: bool = False

    @nn.compact
    def __call__(self, verts: jnp.ndarray, edges: jnp.ndarray) -> jnp.ndarray:
        if self.init_method == "normal":
            kinit = nn.initializers.normal(stddev=0.01)
        elif self.init_method == "zero":
            kinit = nn.initializers.zeros_init()
        else:
            raise ValueError('Invalid GraphConv initialization "%s"' % self.init_method)
        w0 = nn.Dense(self.output_dim, kernel_init=kinit, name="w0")
        w1 = nn.Dense(self.output_dim, kernel_init=kinit, name="w1")
        if verts.shape[0] == 0:
            return jnp.zeros((0, self.output_dim), verts.dtype)
        verts_w0 = w0(verts)
        neighbor_sums = gather_scatter(w1(verts), edges, self.directed)
        return verts_w0 + neighbor_sums


class GatherScatter:
    """Class wrapper over `gather_scatter` (the reference's autograd
    Function, graph_conv.py:136)."""

    def __init__(self, directed: bool = False) -> None:
        self.directed = directed

    def __call__(self, input, edges):
        return gather_scatter(input, edges, self.directed)
