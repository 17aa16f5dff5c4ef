"""shard_map drivers: chains (and emcee walkers) over a device mesh.

≙ the reference's ``MCMCDistributed()`` multi-process chain parallelism
(reference test/runtests.jl:96-110), rebuilt as SPMD: the vmapped chain batch
is shard_mapped over a 1-D ``chains`` mesh axis. Each device runs its chain
shard independently — no communication until the final (host-side) bundling,
exactly mirroring the reference's 'chains never communicate mid-run'
property (SURVEY.md §5).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
from jax.sharding import Mesh, PartitionSpec as P

from .mesh import make_mesh


def shard_chain_fn(
    batched_fn: Callable,
    mesh: Optional[Mesh] = None,
    axis: str = "chains",
    num_chains: Optional[int] = None,
) -> Callable:
    """Wrap a vmapped chain function so its leading axis shards over ``mesh``.

    ``batched_fn(*batched_args) -> (samples, final_state)`` with every leaf
    carrying the chain axis first. Requires ``num_chains`` divisible by the
    mesh size (pad at the call site if needed).
    """
    mesh = mesh if mesh is not None else make_mesh(axis=axis)
    n_dev = mesh.shape[axis]
    if num_chains is not None and num_chains % n_dev != 0:
        raise ValueError(
            f"num_chains={num_chains} must be divisible by the mesh size "
            f"{n_dev} (axis {axis!r})."
        )
    spec = P(axis)

    def call(*args):
        in_specs = tuple(spec for _ in args)
        fn = jax.shard_map(
            batched_fn,
            mesh=mesh,
            in_specs=in_specs,
            out_specs=spec,
            check_vma=False,
        )
        return jax.jit(fn)(*args)

    return call
