"""Taubin λ|μ smoothing on device.

Replaces Open3D ``filter_smooth_taubin(number_of_iterations=10)``
(ref utils.py:319-322). The umbrella (uniform) Laplacian is two
scatter-adds over the edge list; the λ/μ pair (shrink + inflate)
iterates under lax.fori_loop — no host round-trips.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def mesh_edges(faces: jax.Array) -> jax.Array:
    """(T,3) int32 -> (3T, 2) directed edge list (with duplicates)."""
    return jnp.concatenate([
        faces[:, (0, 1)], faces[:, (1, 2)], faces[:, (2, 0)],
    ], axis=0)


@partial(jax.jit, static_argnames=("iterations",))
def taubin_smooth(vertices: jax.Array, faces: jax.Array,
                  iterations: int = 10, lam: float = 0.5, mu: float = -0.53,
                  vertex_mask: jax.Array | None = None,
                  face_mask: jax.Array | None = None) -> jax.Array:
    """Open3D-default λ=0.5, μ=-0.53, 10 iterations (ref utils.py:319).

    ``face_mask`` (T,) lets callers pad ``faces`` to a BUCKETED static
    shape (pow2) so one compiled program serves every mesh of a size
    class — without it each sweep row's unique face count forced a
    fresh ~2-min XLA compile (measured: the t_energies/t_smooth columns
    ran 145 s on rows whose warm cost is 2.2 s). Masked (padding) faces
    contribute nothing; results are bit-identical to the unpadded call.
    """
    V = vertices.shape[0]
    e = mesh_edges(faces)
    src, dst = e[:, 0], e[:, 1]

    if face_mask is not None:
        w = jnp.tile(face_mask.astype(vertices.dtype), 3)
    else:
        w = jnp.ones(e.shape[0], vertices.dtype)
    deg = jnp.zeros(V, vertices.dtype).at[src].add(w).at[dst].add(w)
    safe_deg = jnp.maximum(deg, 1.0)[:, None]

    def umbrella(v):
        acc = jnp.zeros_like(v)
        acc = acc.at[src].add(v[dst] * w[:, None])
        acc = acc.at[dst].add(v[src] * w[:, None])
        # unreferenced (orphan) vertices have deg 0: leave them in place
        # (Open3D semantics) instead of collapsing toward the origin
        delta = jnp.where(deg[:, None] > 0, acc / safe_deg - v, 0.0)
        if vertex_mask is not None:
            delta = jnp.where(vertex_mask[:, None], delta, 0.0)
        return delta

    def body(i, v):
        v = v + lam * umbrella(v)
        v = v + mu * umbrella(v)
        return v

    return jax.lax.fori_loop(0, iterations, body, vertices)
