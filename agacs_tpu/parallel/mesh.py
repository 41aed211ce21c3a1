"""Device mesh + sharding rules.

The reference's entire distributed story is DDP over NCCL
(`train/distributed_utils.py`, `trainer.py:229-243`: per-GPU processes,
gradient allreduce). TPU-native replacement: a `jax.sharding.Mesh` with
axes ("data", "model") and GSPMD — batches sharded over "data", the big
weight matrices optionally sharded over "model" (tensor parallelism), XLA
inserting all collectives over ICI. No launcher/rendezvous code exists
because the JAX runtime owns process coordination.

Sequence/pipeline/expert parallelism are deliberately absent: the model
family caps sequences at 30 s audio / 448 text tokens and has no experts
(SURVEY §2.7, §5) — the mesh covers dp+tp which is what these shapes use.
"""

from __future__ import annotations

from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_data: int | None = None,
    n_model: int = 1,
    devices: list | None = None,
) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if n_data is None:
        n_data = n // n_model
    assert n_data * n_model == n, (n_data, n_model, n)
    arr = np.asarray(devices).reshape(n_data, n_model)
    return Mesh(arr, axis_names=("data", "model"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Leading batch axis over 'data', everything else replicated."""
    return NamedSharding(mesh, P("data"))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    """Shard the leading (batch) axis over 'data'; batches whose size does
    not divide the data-axis length are replicated instead (correct, just
    not parallel — happens only for ragged tail batches, and is logged).

    Multi-process: each host holds only its own slice of the global batch
    (rank-split sampler, like DDP), so device_put onto non-addressable
    devices would fail — use make_array_from_process_local_data, which
    assembles the global array from per-process shards."""
    import logging

    n_data = mesh.shape["data"]
    data_spec = NamedSharding(mesh, P("data"))
    repl_spec = NamedSharding(mesh, P())
    multiprocess = jax.process_count() > 1

    def put(x):
        ok = hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n_data == 0
        if multiprocess:
            # local batch must shard evenly in the multi-process regime;
            # the per-host sampler guarantees equal batch counts/sizes.
            return jax.make_array_from_process_local_data(
                data_spec if ok else repl_spec, np.asarray(x)
            )
        if not ok and hasattr(x, "shape") and x.ndim >= 1:
            logging.debug(
                "shard_batch: leading dim %d %% %d != 0 — replicating "
                "(serial tail batch)", x.shape[0], n_data,
            )
        return jax.device_put(x, data_spec if ok else repl_spec)

    return jax.tree.map(put, batch)


def param_sharding_rules(path: str, shape: tuple) -> P:
    """Tensor-parallel partition spec by parameter role.

    Applied to '.'-joined pytree paths of the whisper model. Stacked-layer
    params carry a leading layer axis, so the sharded dim shifts by one:

      mlp fc1 w   (L, d, 4d)   -> shard 4d  (column parallel)
      mlp fc2 w   (L, 4d, d)   -> shard 4d  (row parallel)
      attn q/k/v  (L, d, d)    -> shard out (head parallel)
      attn out    (L, d, d)    -> shard in  (row parallel)
      token_emb   (V, d)       -> shard V
      everything else          -> replicated
    """
    if path.endswith("mlp.fc1.w"):
        return P(None, None, "model")
    if path.endswith("mlp.fc1.b"):
        return P(None, "model")
    if path.endswith("mlp.fc2.w"):
        return P(None, "model", None)
    for role in ("query", "key", "value", "query_cs", "key_cs"):
        if path.endswith(f"{role}.w"):
            return P(None, None, "model")
        if path.endswith(f"{role}.b"):
            return P(None, "model")
    if path.endswith("out.w"):
        return P(None, "model", None)
    if path.endswith("token_emb"):
        return P("model", None)
    return P()


def shard_params(mesh: Mesh, params: Any, tensor_parallel: bool = False) -> Any:
    """Place params on the mesh: replicated (pure dp) or tp-sharded."""
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def name(kp):
        return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    out = []
    for kp, leaf in flat:
        spec = param_sharding_rules(name(kp), leaf.shape) if tensor_parallel else P()
        # drop specs that don't divide the dim evenly (small models/tests)
        if tensor_parallel and spec != P():
            n_model = mesh.shape["model"]
            ok = all(
                s is None or (leaf.shape[i] % n_model == 0)
                for i, s in enumerate(spec)
            )
            if not ok:
                spec = P()
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)
