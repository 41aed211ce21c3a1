"""Checkpointing: epoch snapshots, best/latest tracking, n-best averaging.

Replicates the reference scheme (`trainer.py:357-477`,
`main_funcs/average_nbest_models.py`): per-epoch checkpoint with model +
optimizer + reporter state, `latest` / `<phase>.<metric>.best` pointers,
prune-to-nbest, and state-dict averaging of the k best epochs into
`valid.acc.ave` — but with numpy-npz storage keyed by pytree paths
(portable, no torch dependency).
"""

from __future__ import annotations

import json
import os
from typing import Any

import jax
import numpy as np


def _savable(v) -> np.ndarray:
    """npz-compatible view of a leaf. numpy has no native bfloat16, so
    bf16 leaves (e.g. the frozen trunk under cast_frozen_params) are
    stored as float32 — lossless, and load_pytree_like casts back to the
    template dtype on read."""
    a = np.asarray(v)
    if a.dtype.name == "bfloat16":
        return a.astype(np.float32)
    return a


def _flatten_with_names(tree: Any) -> list[tuple[str, np.ndarray]]:
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)

    def name(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    return [(name(kp), _savable(v)) for kp, v in flat]


def save_pytree(path: str, tree: Any) -> None:
    pairs = _flatten_with_names(tree)
    np.savez(path, **{k: v for k, v in pairs})


def load_pytree_like(path: str, template: Any) -> Any:
    """Load a npz into the structure of `template` (names must match)."""
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)

    def name(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    leaves = []
    for kp, tmpl in flat:
        arr = data[name(kp)]
        if arr.dtype.kind == "V" and arr.dtype.itemsize == 2:
            # legacy file with a raw-saved bf16 leaf (pre-_savable):
            # reinterpret the bytes
            import ml_dtypes

            arr = arr.view(ml_dtypes.bfloat16)
        leaves.append(jax.numpy.asarray(arr, dtype=tmpl.dtype))
    return jax.tree_util.tree_unflatten(treedef, [l for l in leaves])


def save_opt_state(path: str, opt_state: Any) -> None:
    """Keyed by pytree path (not flat index), so a structural change in the
    optimizer config fails loudly on resume instead of silently loading
    wrong leaves. Leaves sharded across hosts (optim_state_shard moments
    under a multi-host data axis) are allgathered first — np.asarray on a
    non-fully-addressable array raises."""
    np.savez(path, **dict(_flatten_with_names(_to_host_replicated(opt_state))))


def load_opt_state_like(path: str, template: Any) -> Any:
    data = np.load(path)
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)

    def name(kp):
        return "/".join(str(getattr(k, "key", getattr(k, "idx", k))) for k in kp)

    out = []
    for kp, tmpl in flat:
        key = name(kp)
        if key not in data:
            raise KeyError(
                f"optimizer-state leaf {key!r} missing from {path} — "
                "optimizer config changed since the checkpoint was written?"
            )
        arr = data[key]
        t = np.asarray(tmpl)
        if arr.shape != t.shape:
            raise ValueError(
                f"optimizer-state leaf {key!r} shape mismatch: "
                f"checkpoint {arr.shape} vs current {t.shape}"
            )
        out.append(jax.numpy.asarray(arr, dtype=t.dtype))
    return jax.tree_util.tree_unflatten(treedef, out)


def _to_host_replicated(tree: Any) -> Any:
    """Make every leaf host-materializable: leaves sharded across
    non-addressable devices (multi-host tensor parallelism) are
    allgathered onto every host through a compiled identity with a
    replicated out-sharding; already-replicated or local leaves pass
    through."""
    from jax.sharding import NamedSharding, PartitionSpec

    def conv(x):
        if (isinstance(x, jax.Array) and not x.is_fully_addressable
                and not x.is_fully_replicated):
            sh = NamedSharding(x.sharding.mesh, PartitionSpec())
            x = jax.jit(lambda a: a, out_shardings=sh)(x)
        return x

    return jax.tree.map(conv, tree)


class CheckpointManager:
    """Experiment-dir layout:

      exp_dir/
        checkpoint_meta.json      resume metadata (epoch, step, rng, history)
        {n}epoch.params.npz       per-epoch params
        checkpoint.params.npz     latest params (resume point)
        checkpoint.opt.npz        latest optimizer state
        valid.acc.ave.params.npz  n-best average (written by average_nbest)

    backend="orbax" swaps the npz leaves for orbax StandardCheckpointer
    directories ({n}epoch.params.orbax/ ...): sharded arrays save without
    a host gather and restore onto their meshes — the multi-host /
    tensor-parallel path (npz would pull every shard through one host).
    """

    def __init__(self, exp_dir: str, keep_nbest: int = 3,
                 criterion: tuple[str, str, str] = ("valid", "acc", "max"),
                 backend: str = "npz"):
        assert backend in ("npz", "orbax"), backend
        self.exp_dir = exp_dir
        self.keep_nbest = keep_nbest
        self.criterion = tuple(criterion)
        self.backend = backend
        # multi-host: npz writes happen on the primary only (params must
        # be replicated/addressable there); orbax saves are collective —
        # every process calls save/restore, orbax coordinates the shards.
        # Metadata/prune are primary-only under both backends.
        self._primary = jax.process_index() == 0
        os.makedirs(exp_dir, exist_ok=True)
        self._orbax = None
        if backend == "orbax":
            import orbax.checkpoint as ocp

            self._orbax = ocp.StandardCheckpointer()

    # -- backend-dispatched leaf IO ---------------------------------------
    def _params_path(self, stem: str) -> str:
        ext = "orbax" if self.backend == "orbax" else "npz"
        return os.path.join(self.exp_dir, f"{stem}.{ext}")

    def _save_tree(self, path: str, tree) -> None:
        if self.backend == "orbax":
            # force=True overwrites atomically inside orbax — safe under
            # multi-host (a manual rmtree would race between processes)
            self._orbax.save(os.path.abspath(path), tree, force=True)
        else:
            save_pytree(path, tree)

    def _load_tree(self, path: str, template):
        if self.backend == "orbax":
            import jax.numpy as jnp

            def abstract(x):
                sh = getattr(x, "sharding", None)
                # restoring with the template's sharding puts every shard
                # straight onto its devices (multi-host / tp) and avoids
                # orbax's from-file sharding inference warning
                if isinstance(sh, jax.sharding.NamedSharding):
                    return jax.ShapeDtypeStruct(x.shape, x.dtype, sharding=sh)
                return jax.ShapeDtypeStruct(x.shape, x.dtype)

            restored = self._orbax.restore(
                os.path.abspath(path), jax.tree.map(abstract, template)
            )
            return jax.tree.map(lambda x, t: jnp.asarray(x, t.dtype),
                                restored, template)
        return load_pytree_like(path, template)

    def _meta_path(self) -> str:
        return os.path.join(self.exp_dir, "checkpoint_meta.json")

    def save_epoch(self, epoch: int, state, history: dict) -> None:
        """history: {epoch: {"valid": {...}, "train": {...}}}."""
        if self.backend == "orbax":
            # collective: every process participates, orbax coordinates
            self._save_tree(self._params_path(f"{epoch}epoch.params"),
                            state.params)
            self._save_tree(self._params_path("checkpoint.params"),
                            state.params)
            self._save_tree(self._params_path("checkpoint.opt"),
                            state.opt_state)
        elif self._primary:
            self._save_tree(self._params_path(f"{epoch}epoch.params"),
                            state.params)
            self._save_tree(self._params_path("checkpoint.params"),
                            state.params)
            save_opt_state(
                os.path.join(self.exp_dir, "checkpoint.opt.npz"),
                state.opt_state,
            )
        if not self._primary:
            return
        meta = {
            "epoch": epoch,
            "step": int(state.step),
            "rng": np.asarray(state.rng).tolist(),
            "history": {str(k): v for k, v in history.items()},
        }
        with open(self._meta_path(), "w") as f:
            json.dump(meta, f, indent=1)
        self._prune(history)

    def load_meta(self) -> dict | None:
        if not os.path.exists(self._meta_path()):
            return None
        with open(self._meta_path()) as f:
            return json.load(f)

    def resume(self, state, tx=None):
        """Restore latest checkpoint into `state` (template for structure).
        Returns (state, start_epoch, history) — mirrors --resume true
        (trainer.py:133-158)."""
        import jax.numpy as jnp

        meta = self.load_meta()
        if meta is None:
            return state, 1, {}
        params = self._load_tree(
            self._params_path("checkpoint.params"), state.params
        )
        if self.backend == "orbax":
            opt_state = self._load_tree(
                self._params_path("checkpoint.opt"), state.opt_state
            )
        else:
            opt_state = load_opt_state_like(
                os.path.join(self.exp_dir, "checkpoint.opt.npz"), state.opt_state
            )
        import dataclasses

        state = dataclasses.replace(
            state,
            params=params,
            opt_state=opt_state,
            step=jnp.asarray(meta["step"], jnp.int32),
            rng=jnp.asarray(np.asarray(meta["rng"], np.uint32)),
        )
        history = {int(k): v for k, v in meta["history"].items()}
        return state, meta["epoch"] + 1, history

    def _ranked_epochs(self, history: dict) -> list[int]:
        phase, metric, mode = self.criterion
        scored = [
            (ep, vals[phase][metric])
            for ep, vals in history.items()
            if phase in vals and metric in vals[phase]
        ]
        scored.sort(key=lambda x: x[1], reverse=(mode == "max"))
        return [ep for ep, _ in scored]

    def best_epoch(self, history: dict) -> int | None:
        ranked = self._ranked_epochs(history)
        return ranked[0] if ranked else None

    def _prune(self, history: dict) -> None:
        """Remove per-epoch snapshots outside the n-best (trainer.py:417-447)."""
        import shutil

        keep = set(self._ranked_epochs(history)[: self.keep_nbest])
        ext = "orbax" if self.backend == "orbax" else "npz"
        for fname in os.listdir(self.exp_dir):
            if fname.endswith(f"epoch.params.{ext}"):
                ep = int(fname.split("epoch")[0])
                if ep not in keep:
                    full = os.path.join(self.exp_dir, fname)
                    if os.path.isdir(full):
                        shutil.rmtree(full)
                    else:
                        os.remove(full)

    def average_nbest(self, history: dict, template) -> Any:
        """Mean of the n best epochs' params -> valid.acc.ave
        (average_nbest_models.py). Always ALSO writes the portable npz
        artifact (decode CLIs read it regardless of backend).

        Multi-host: npz backend loads/averages on the primary only (the
        files were written there); orbax restores collectively on every
        process, tp-sharded leaves are allgathered via a compiled
        identity, and the primary writes the npz."""
        if self.backend != "orbax" and not self._primary:
            return None
        eps = self._ranked_epochs(history)[: self.keep_nbest]
        assert eps, "no scored epochs to average"
        acc = None
        for ep in eps:
            p = self._load_tree(self._params_path(f"{ep}epoch.params"), template)
            p = _to_host_replicated(p)
            if acc is None:
                acc = jax.tree.map(lambda x: np.asarray(x, np.float32), p)
            else:
                acc = jax.tree.map(
                    lambda a, x: a + np.asarray(x, np.float32), acc, p
                )
        avg = jax.tree.map(lambda a: a / len(eps), acc)
        # integer leaves (int8 quantized trunk) keep their dtype: frozen
        # across snapshots, the rounded mean is the value itself (mirrors
        # bin/average_checkpoints.py)
        avg = jax.tree.map(
            lambda a, t: np.round(a).astype(t.dtype)
            if np.issubdtype(np.asarray(t).dtype, np.integer) else a,
            avg, template,
        )
        phase, metric, _ = self.criterion
        if self._primary:
            out = os.path.join(
                self.exp_dir, f"{phase}.{metric}.ave.params.npz"
            )
            save_pytree(out, avg)
        return avg
