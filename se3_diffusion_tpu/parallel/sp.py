"""Sequence-parallel (sp) sharding of the [B, N, N, C] pair activations.

The reference handles long sequences purely by shrinking the batch
(`max_squared_res` packing, SURVEY.md section 5.7) and hard-caps N at 512
— the O(N^2) pair representation is the memory wall. Here the pair dim
is sharded over the mesh's 'sp' axis the GSPMD way (the scaling-book
recipe): the model annotates pair tensors at their creation points with
`annotate_pair`, jit/GSPMD propagates the sharding through the
elementwise/MLP ops and inserts the collectives (all-gathers of the
small [B, N, C] node tensors; the [B, N, N, C] tensors never
materialize unsharded on a chip).

Why annotation instead of shard_map surgery: every pair-touching op in
the model (edge MLPs, triangle-free IPA logits, EdgeTransition) is
row-local in the first N axis — softmax and o_pair reduce over the
SECOND N axis, which stays unsharded — so constraint propagation
recovers exactly the manual decomposition while the model code stays
single-device readable.

Usage:
    mesh = create_mesh(jax.devices(), sp_size=4)
    with pair_sharding(mesh):
        out = jax.jit(fwd)(params, feats)   # pair activations row-sharded

The context only arms the annotations at TRACE time (sharding becomes
part of the compiled program); the null context (sp_size == 1 or no
mesh) is the identity, so single-chip paths are untouched.
"""
from __future__ import annotations

import contextlib
import threading
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from se3_diffusion_tpu.parallel.mesh import SP_AXIS

_state = threading.local()

U = P.UNCONSTRAINED


def current_sp_mesh() -> Optional[Mesh]:
    return getattr(_state, "mesh", None)


@contextlib.contextmanager
def pair_sharding(mesh: Optional[Mesh]):
    """Arms pair-tensor sp annotations for functions traced inside."""
    if mesh is not None and SP_AXIS in mesh.shape and mesh.shape[SP_AXIS] > 1:
        _state.mesh = mesh
    else:
        _state.mesh = None
    try:
        yield
    finally:
        _state.mesh = None


def annotate_pair(x: jax.Array, row_axis: int = 1) -> jax.Array:
    """Constrains a pair tensor's first-N (row) axis onto 'sp'.

    Works on [B, N, N, C] (row_axis=1, default) and [B, H, N, N]
    attention logits (row_axis=2). All other axes are left UNCONSTRAINED
    so dp batch sharding (or replication) propagates independently.
    """
    mesh = current_sp_mesh()
    if mesh is None:
        return x
    spec = [U] * x.ndim
    spec[row_axis] = SP_AXIS
    return jax.lax.with_sharding_constraint(
        x, NamedSharding(mesh, P(*spec))
    )
