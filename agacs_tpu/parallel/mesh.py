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


def local_batch_rows(mesh: Mesh, global_b: int) -> slice:
    """The slice of global batch rows this process must load when the
    batch is sharded over 'data'.

    The trainer runs ONE global program on every host (GSPMD): each step
    all hosts agree on the same global batch (same sampler output) and
    each loads only its contiguous row block — the TPU-native replacement
    for the reference's DDP rank-split sampler
    (espnet2/iterators + DistributedSampler; trainer.py:229-243). Row
    blocks are contiguous because `make_mesh` lays devices out in
    jax.devices() order, which sorts by process index."""
    n_proc = jax.process_count()
    assert global_b % n_proc == 0, (global_b, n_proc)
    per = global_b // n_proc
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_batch(mesh: Mesh, batch: Any, process_local: bool | None = None) -> Any:
    """Place a batch on the mesh, leading axis sharded over 'data'.

    Single-process: `batch` holds the full global batch; leaves whose
    leading dim does not divide the data axis are replicated instead
    (correct, just not parallel — only ragged tail batches, logged).

    Multi-process (GSPMD, one global program on every host):
      * process_local=True  — `batch` holds only THIS host's row block
        (see `local_batch_rows`); the global array is assembled from the
        per-process shards via make_array_from_process_local_data.
      * process_local=False — `batch` holds the FULL batch on every host
        and is replicated (the ragged-tail fallback).
    The caller decides (bin/train.py), because a local shard and a small
    full batch are indistinguishable by shape alone."""
    import logging

    n_data = mesh.shape["data"]
    data_spec = NamedSharding(mesh, P("data"))
    repl_spec = NamedSharding(mesh, P())
    n_proc = jax.process_count()

    if n_proc > 1:
        if process_local is None:
            raise ValueError(
                "multi-process shard_batch requires explicit process_local"
            )
        n_local = n_data // n_proc

        def put(x):
            x = np.asarray(x)
            if process_local:
                assert x.ndim >= 1 and x.shape[0] % max(n_local, 1) == 0, (
                    f"process-local batch dim {x.shape} does not divide "
                    f"{n_local} local data-devices"
                )
                return jax.make_array_from_process_local_data(data_spec, x)
            return jax.make_array_from_process_local_data(repl_spec, x)

        return jax.tree.map(put, batch)

    def put(x):
        ok = hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % n_data == 0
        if not ok and hasattr(x, "shape") and x.ndim >= 1:
            logging.debug(
                "shard_batch: leading dim %d %% %d != 0 — replicating "
                "(serial tail batch)", x.shape[0], n_data,
            )
        return jax.device_put(x, data_spec if ok else repl_spec)

    return jax.tree.map(put, batch)


# column-parallel targets: output (last) dim sharded, bias sharded too.
_COL_W = (
    "mlp.fc1.w",
    "query.w", "key.w", "value.w", "query_cs.w", "key_cs.w",  # head parallel
    ".down.w",                       # bottleneck adapter down-projection
    "downsample_input.w", "downsample_encoder_input.w",
    "downsample_layers.w",           # side-ladder downsamples
    "conv1.w",                       # conv stem (k, 80, d): out channels
)
_COL_B = tuple(w[:-2] + ".b" for w in _COL_W)
# row-parallel targets: input (second-to-last) dim sharded, bias replicated
# (each consumes a column-parallel producer; XLA closes the pair with a
# reduce over 'model').
_ROW_W = (
    "mlp.fc2.w",
    "out.w",                         # attention output projection
    ".up.w",                         # adapter up-projection
    "upsample_output.w",             # side-ladder upsample
    "conv2.w",                       # conv stem second conv: in channels
)


def param_sharding_rules(path: str, shape: tuple) -> P:
    """Tensor-parallel partition spec by parameter role.

    Applied to '.'-joined pytree paths of the whisper model. Rules are
    shape-aware: stacked-layer params carry a leading layer axis, so the
    sharded dim shifts by one. Col/row pairs:

      mlp fc1 / fc2          (L, d, 4d) / (L, 4d, d)
      attn q/k/v (+cs) / out (L, d, d) head-parallel / row-parallel
      adapter down / up      (L, d, r) / (L, r, d)
      side down* / upsample  (d, r) or (L, d, r) / (r, d)
      conv1 / conv2          (k, 80, d) out-channel / (k, d, d) in-channel
      token_emb              (V, d) -> shard V (rows padded to a multiple
                             of the model axis by `shard_params`; the model
                             slices the pad logit columns, whisper.py)
      everything else        -> replicated

    Not sharded (documented): the CTC head (d, V) — its pad columns would
    perturb the CTC log-softmax and ctc_weight is 0 in every whisper
    recipe; LayerNorm/gate/positional params (tiny).
    """
    nd = len(shape)
    if path.endswith("upsample_output.w"):
        return P(*([None] * (nd - 2) + ["model", None]))
    if any(path.endswith(t) for t in _COL_W):
        return P(*([None] * (nd - 1) + ["model"]))
    if any(path.endswith(t) for t in _COL_B):
        return P(*([None] * (nd - 1) + ["model"]))
    if any(path.endswith(t) for t in _ROW_W):
        return P(*([None] * (nd - 2) + ["model", None]))
    if path.endswith("token_emb"):
        return P("model", None)
    return P()


def pad_vocab_rows(leaf, n_model: int):
    """Zero-pad token_emb rows to a multiple of the model axis so the
    largest parameter tp-shards despite the odd vocab (51865). The model
    slices logits back to n_vocab (models/whisper.py); pad rows are never
    indexed by token ids and receive zero gradients."""
    v = leaf.shape[0]
    pad = (-v) % n_model
    if pad == 0:
        return leaf
    widths = [(0, pad)] + [(0, 0)] * (leaf.ndim - 1)
    return np.pad(np.asarray(leaf), widths)


def shard_params(mesh: Mesh, params: Any, tensor_parallel: bool = False) -> Any:
    """Place params on the mesh: replicated (pure dp) or tp-sharded.

    A tp rule whose target dim does not divide the model axis is dropped
    (XLA GSPMD requires even sharding) — loudly: each drop is
    logging.warning'd, and `shard_summary` lets callers assert what
    actually got partitioned (the multichip dryrun fails if a rule was
    dropped unexpectedly)."""
    import logging

    flat, treedef = jax.tree_util.tree_flatten_with_path(params)

    def name(kp):
        return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    out = []
    for kp, leaf in flat:
        spec = param_sharding_rules(name(kp), leaf.shape) if tensor_parallel else P()
        if tensor_parallel and spec != P():
            n_model = mesh.shape["model"]
            if name(kp).endswith("token_emb"):
                # the one indivisible-by-design target: pad the odd vocab
                # (51865) instead of dropping the rule (VERDICT r3 #4)
                leaf = pad_vocab_rows(leaf, n_model)
            ok = all(
                s is None or (leaf.shape[i] % n_model == 0)
                for i, s in enumerate(spec)
            )
            if not ok:
                logging.warning(
                    "shard_params: tp rule %s dropped for %s %s (dim not "
                    "divisible by model axis %d) — parameter is REPLICATED",
                    spec, name(kp), leaf.shape, n_model,
                )
                spec = P()
        out.append(jax.device_put(leaf, NamedSharding(mesh, spec)))
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_summary(params: Any) -> dict[str, list[str]]:
    """{'partitioned': [path ...], 'replicated': [path ...]} over the
    param pytree's actual post-placement shardings."""
    flat, _ = jax.tree_util.tree_flatten_with_path(params)

    def name(kp):
        return ".".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    out: dict[str, list[str]] = {"partitioned": [], "replicated": []}
    for kp, leaf in flat:
        sh = getattr(leaf, "sharding", None)
        replicated = sh is None or sh.is_fully_replicated
        out["replicated" if replicated else "partitioned"].append(name(kp))
    return out


def shard_opt_state(mesh: Mesh, opt_state: Any, min_size: int = 1024) -> Any:
    """ZeRO-1-style optimizer-state sharding along the DATA axis.

    The reference optionally wraps training in fairscale
    ShardedDataParallel + OSS (`espnet2/train/trainer.py:193-199,344-347`),
    which shards optimizer state across data-parallel ranks. GSPMD
    equivalent: place each moment tensor (any opt-state leaf at least
    `min_size` elements) sharded over 'data' on its first divisible axis;
    XLA reduce-scatters gradients into the sharded update math and
    all-gathers only the final parameter updates. Irrelevant for
    adapter-PET (tiny opt state); for full-FT it cuts the resident Adam
    moments (2x model, f32) to 1/n_data per chip.

    Leaves that are scalars, too small, or with no divisible axis stay
    replicated (correct, just not sharded)."""
    n_data = mesh.shape["data"]

    def place(x):
        if not hasattr(x, "shape") or x.ndim == 0 or x.size < min_size:
            return jax.device_put(x, NamedSharding(mesh, P()))
        for axis in range(x.ndim):
            if x.shape[axis] % n_data == 0 and x.shape[axis] >= n_data:
                spec = [None] * x.ndim
                spec[axis] = "data"
                return jax.device_put(x, NamedSharding(mesh, P(*spec)))
        return jax.device_put(x, NamedSharding(mesh, P()))

    return jax.tree.map(place, opt_state)


def opt_state_shard_stats(opt_state: Any) -> dict:
    """{'sharded_bytes': n, 'replicated_bytes': n, 'sharded_leaves': k}
    over the actual post-placement shardings (for logging/dryrun)."""
    out = {"sharded_bytes": 0, "replicated_bytes": 0, "sharded_leaves": 0}
    for leaf in jax.tree.leaves(opt_state):
        sh = getattr(leaf, "sharding", None)
        nbytes = getattr(leaf, "nbytes", 0)
        if sh is not None and not sh.is_fully_replicated:
            out["sharded_bytes"] += nbytes
            out["sharded_leaves"] += 1
        else:
            out["replicated_bytes"] += nbytes
    return out
