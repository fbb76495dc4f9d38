"""Device mesh, shardings, and parallel training utilities.

The reference is single-GPU with no distributed code at all (SURVEY.md §2.10);
scaling here is native jax.sharding over a ('data', 'model') Mesh:

  * data parallelism — batches sharded on the leading axis; under jit the
    gradient/BN reductions become XLA collectives over ICI automatically.
  * tensor parallelism — the wide MLP kernels (1024-d trunk layers) sharded
    on their output dimension over 'model'; XLA partitions the matmuls and
    inserts all-gathers/reduce-scatters where needed.

No hand-written collectives: the compute functions stay single-device
semantics; placement alone (`jax.device_put` with NamedSharding) drives the
SPMD partitioning — the "pick a mesh, annotate shardings, let XLA insert
collectives" recipe.
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_device_mesh(n_devices: Optional[int] = None, model_parallel: int = 1) -> Mesh:
    devices = jax.devices()
    n = n_devices or len(devices)
    assert n % model_parallel == 0, (n, model_parallel)
    arr = np.asarray(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(arr, ("data", "model"))


def data_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(batch, mesh: Mesh):
    """Shard array leaves on their leading (batch) axis over 'data'.

    Leaves that cannot carry the batch axis — scalars, or arrays whose
    leading dim does not divide by the data-mesh size (e.g. per-sample-
    invariant tables someone later adds to the pytrees) — are replicated
    instead of being sharded wrongly."""
    s = data_sharding(mesh)
    r = replicated(mesh)
    n_data = mesh.shape["data"]

    def place(x):
        ok = getattr(x, "ndim", 0) >= 1 and x.shape[0] % n_data == 0
        return jax.device_put(x, s if ok else r)

    return jax.tree_util.tree_map(place, batch)


def replicate(tree, mesh: Mesh):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)


def tp_param_spec(path, leaf, mesh: Mesh, min_dim: int = 512) -> P:
    """Tensor-parallel spec for one parameter: shard wide Dense kernels on the
    output dim over 'model' (and their biases), replicate everything else."""
    model_size = mesh.shape["model"]
    if model_size == 1:
        return P()
    names = [getattr(k, "key", "") for k in path]
    is_kernel = names and names[-1] == "kernel"
    is_bias = names and names[-1] == "bias"
    if leaf.ndim >= 1 and leaf.shape[-1] % model_size == 0 and leaf.shape[-1] >= min_dim:
        if is_kernel:
            return P(*([None] * (leaf.ndim - 1) + ["model"]))
        if is_bias and leaf.ndim == 1:
            return P("model")
    return P()


def shard_params_tp(params, mesh: Mesh, min_dim: int = 512):
    """Place a parameter tree with tensor-parallel sharding over `mesh`."""
    def place(path, leaf):
        spec = tp_param_spec(path, leaf, mesh, min_dim)
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map_with_path(place, params)


def shard_state(state, mesh: Mesh, tensor_parallel: bool = True,
                reinit_opt: bool = False):
    """Place a TrainState on the mesh: params (optionally TP-sharded),
    batch_stats/step replicated.  With reinit_opt the optimizer moments are
    re-initialized from the sharded params so they inherit the same layout
    (use for FRESH states only, e.g. the multichip dry run — guarded below);
    otherwise they are replicated and XLA reshards on first use."""
    if reinit_opt and int(jax.device_get(state.step)) > 0:
        raise ValueError(
            "shard_state(reinit_opt=True) would discard the optimizer moments "
            f"of a mid-training state (step={int(jax.device_get(state.step))}); "
            "use reinit_opt=False to reshard an existing optimizer state."
        )
    if tensor_parallel:
        params = shard_params_tp(state.params, mesh)
    else:
        params = replicate(state.params, mesh)
    if reinit_opt:
        opt_state = state.tx.init(params)
    else:
        opt_state = replicate(state.opt_state, mesh)
    return state.replace(
        params=params,
        opt_state=opt_state,
        batch_stats=replicate(state.batch_stats, mesh),
        step=jax.device_put(state.step, replicated(mesh)),
    )
