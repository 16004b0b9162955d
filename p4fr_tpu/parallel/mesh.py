"""Device mesh & sharding helpers.

The reference is strictly single-device (reference: SURVEY §2.7 — no
torch.distributed anywhere); this layer is new, TPU-first infrastructure:

- a 2-axis ``(data, model)`` mesh over ICI;
- batch arrays shard over ``data``;
- transformer projection kernels optionally shard over ``model`` (tensor
  parallelism for attention heads / FF), with XLA inserting the
  all-reduce/all-gather collectives;
- everything degrades to a no-op on a 1-device mesh.
"""

from __future__ import annotations

from typing import Any, Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_data: int = -1, n_model: int = 1, devices: Optional[Sequence] = None
) -> Mesh:
    """Build a (data, model) mesh. ``n_data=-1`` consumes all remaining
    devices after the model axis."""
    devices = list(devices if devices is not None else jax.devices())
    if n_model < 1:
        n_model = 1
    if n_data == -1:
        n_data = len(devices) // n_model
    use = n_data * n_model
    if use < 1 or use > len(devices):
        raise ValueError(
            f"mesh {n_data}x{n_model} does not fit {len(devices)} devices"
        )
    grid = np.asarray(devices[:use]).reshape(n_data, n_model)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def _spec_for_param(path: Tuple[str, ...], value, n_model: int) -> P:
    """Tensor-parallel partition rule for transformer projections.

    Column-parallel (shard output dim): q/k/v projections, FF up-proj.
    Row-parallel (shard input dim): attention out-proj, FF down-proj.
    Everything else (convs, norms, embeddings, biases) replicates.
    """
    if n_model <= 1:
        return P()
    names = [p.lower() for p in path]
    joined = "/".join(names)
    is_kernel = names[-1] == "kernel"
    if not is_kernel or value.ndim != 2:
        return P()

    def divisible(dim):
        return value.shape[dim] % n_model == 0

    if any(k in joined for k in ("q_linear", "k_linear", "v_linear")):
        return P(None, MODEL_AXIS) if divisible(1) else P()
    if "out_linear" in joined:
        return P(MODEL_AXIS, None) if divisible(0) else P()
    if "linear0" in joined:  # FF up
        return P(None, MODEL_AXIS) if divisible(1) else P()
    if "linear1" in joined:  # FF down
        return P(MODEL_AXIS, None) if divisible(0) else P()
    return P()


def param_shardings(params: Any, mesh: Mesh) -> Any:
    """NamedSharding pytree for a param tree under the given mesh."""
    n_model = mesh.shape[MODEL_AXIS]

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = []
    for path, value in flat:
        keys = tuple(
            getattr(p, "key", getattr(p, "name", str(p))) for p in path
        )
        out.append(NamedSharding(mesh, _spec_for_param(keys, value, n_model)))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_batch(mesh: Mesh, *arrays):
    """device_put arrays with batch-axis sharding."""
    sh = batch_sharding(mesh)
    out = tuple(jax.device_put(a, sh) for a in arrays)
    return out if len(out) > 1 else out[0]
