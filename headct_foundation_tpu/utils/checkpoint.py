"""Checkpoint save/load for train states.

The reference saves torch pickles with {epoch, best_loss, state_dict,
momentum_model_state_dict, optimizer, scheduler} (reference:
src/utils/misc.py:35-52). Here a checkpoint is a single file holding the same
metadata plus numpy pytrees serialized with flax.serialization — portable,
readable without JAX, and restorable onto any mesh (arrays are re-placed
according to the target state's shardings at load).

``utils/torch_interop.py`` handles importing the reference's actual ``.pt``
checkpoints for weight parity.
"""

from __future__ import annotations

import os
import pickle
import threading
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import serialization


def _fetch_global(x: Any) -> np.ndarray:
    """numpy copy of a (possibly non-fully-addressable) array.

    Multi-host sharded params (fsdp/tensor axes spanning processes) cannot be
    device_get on one process — they are gathered with a COLLECTIVE, so
    save_checkpoint must be entered by every process in that regime (the
    engines call it unconditionally; only process 0 writes). Fully-replicated
    leaves (pure data parallelism — the common multi-host case) short-circuit
    to a local read: no collective, no per-leaf jit dispatch."""
    if isinstance(x, jax.Array) and not x.is_fully_addressable:
        if x.is_fully_replicated:
            return np.asarray(x)
        from jax.experimental import multihost_utils

        return np.asarray(multihost_utils.process_allgather(x, tiled=True))
    return np.asarray(jax.device_get(x))


def to_numpy_tree(tree: Any) -> Any:
    """Host-numpy copy of a state pytree; gathers cross-process-sharded
    leaves collectively (call from every process in that regime)."""
    return jax.tree.map(_fetch_global, tree)


_to_numpy_tree = to_numpy_tree  # internal alias


def _needs_collective(tree: Any) -> bool:
    """True iff fetching the tree requires a cross-process collective.

    Non-addressable leaves that are FULLY REPLICATED (pure data parallelism —
    the common multi-host case) do not: every process can read its local
    replica, so non-writer processes can skip the fetch entirely."""
    return any(
        isinstance(leaf, jax.Array)
        and not leaf.is_fully_addressable
        and not leaf.is_fully_replicated
        for leaf in jax.tree.leaves(tree)
    )


class _AsyncSaver:
    """One background writer for checkpoint serialization.

    At most ONE save is in flight (``submit`` joins the previous one first):
    ordering of latest/best files is preserved and the device-side snapshot
    memory is bounded to a single extra copy of the state."""

    def __init__(self):
        self._thread: Optional[threading.Thread] = None
        self._error: Optional[BaseException] = None

    def submit(self, fn) -> None:
        self.wait()

        def _run():
            try:
                fn()
            except BaseException as e:  # surfaced on the next wait()/submit()
                self._error = e

        self._thread = threading.Thread(
            target=_run, name="ckpt-writer", daemon=True
        )
        self._thread.start()

    def wait(self) -> None:
        if self._thread is not None:
            self._thread.join()
            self._thread = None
        if self._error is not None:
            err, self._error = self._error, None
            raise err


_SAVER = _AsyncSaver()


def wait_for_saves() -> None:
    """Join any in-flight async checkpoint write — both the pickle
    background writer and orbax's AsyncCheckpointer (end of training,
    before reading a just-written checkpoint, or in tests)."""
    _SAVER.wait()
    if _ORBAX_ASYNC is not None:
        _ORBAX_ASYNC.wait_until_finished()


def _snapshot(tree: Any) -> Any:
    """Device-side copy of every jax.Array leaf (an HBM->HBM copy, ~ms/GB —
    NOT a transfer). The train loop donates the live state's buffers to the
    next step (donate_argnums), so a background thread must never read them;
    the copies are ours alone and are fetched/serialized off-thread.

    Non-addressable FULLY-REPLICATED leaves (multi-host pure-DP) are copied
    from the local replica shard: jnp.copy of the global array would be a
    cross-process dispatch, which process 0 cannot enter alone."""

    def _copy(x):
        if not isinstance(x, jax.Array):
            return x
        if not x.is_fully_addressable:
            return jnp.copy(x.addressable_data(0))
        return jnp.copy(x)

    return jax.tree.map(_copy, tree)


def save_checkpoint(
    state: Any,
    epoch: int,
    best_loss: float,
    dir_add: str,
    filename: str = "model.ckpt",
    logger=None,
    extra: Optional[Dict[str, Any]] = None,
    async_save: bool = False,
    fmt: str = "pickle",
) -> str:
    """Checkpoint {epoch, best_loss, step, params, opt_state, **extra}.

    ``fmt="orbax"`` (config: ``TRAIN.CKPT_FORMAT``) routes to the orbax
    backend — ``filename`` becomes a checkpoint DIRECTORY of the same name,
    transparently handled by ``load_checkpoint``. On multi-host, orbax
    writes cooperatively (each process its own shards, no gather): measured
    on the full ViT-B MAE state, 73.6 s vs the pickle gather+write's 341 s
    on the same mount.

    ``async_save=True`` snapshots the arrays on device (cheap) and moves the
    D2H fetch + pickle + disk write to a background thread, so the epoch
    boundary doesn't stall on serializing ~GBs of state (the reference's
    torch.save is fully synchronous on the trainer, src/utils/misc.py:35-52).

    Multi-host: call from EVERY process. States with cross-process-SHARDED
    leaves are gathered with a collective (synchronously on the main thread —
    a background-thread collective could interleave with the train loop's
    and deadlock). Fully-REPLICATED multi-host states (pure DP) need no
    collective: non-writer processes return without touching the state, and
    process 0 reads its local replica (off-thread when async). Process 0
    alone writes the file, so the returned path exists on its filesystem only.
    """
    if fmt == "orbax":
        return save_checkpoint_orbax(
            state, epoch, best_loss, dir_add, filename,
            logger=logger, extra=extra, async_save=async_save,
        )
    if fmt != "pickle":
        raise ValueError(f"unknown checkpoint format {fmt!r}")
    path = os.path.join(dir_add, filename)

    devtree = {
        "step": state.step,
        "params": state.params,
        "opt_state": state.opt_state,
        "extra": dict(extra) if extra else {},
    }
    if _needs_collective(devtree):
        # collective gather on all processes; numpy from here on
        devtree = to_numpy_tree(devtree)
    if jax.process_index() != 0:
        return path
    os.makedirs(dir_add, exist_ok=True)
    if async_save:
        devtree = _snapshot(devtree)

    def _write():
        payload = {
            "epoch": int(epoch),
            "best_loss": float(best_loss),
            # _fetch_global, not device_get: on the sync multi-host pure-DP
            # path step is still a non-addressable replicated jax.Array
            "step": int(_fetch_global(devtree["step"])),
            "params": serialization.to_state_dict(_to_numpy_tree(devtree["params"])),
            "opt_state": serialization.to_state_dict(
                _to_numpy_tree(devtree["opt_state"])
            ),
        }
        payload.update(
            {
                k: serialization.to_state_dict(_to_numpy_tree(v))
                if not isinstance(v, (int, float, str))
                else v
                for k, v in devtree["extra"].items()
            }
        )
        tmp = path + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(payload, f, protocol=pickle.HIGHEST_PROTOCOL)
        if os.path.isdir(path):
            # leftover orbax DIRECTORY of the same name (a previous run with
            # TRAIN.CKPT_FORMAT=orbax) — os.replace onto it would raise, and
            # under async_save only at the NEXT epoch's join
            import shutil

            shutil.rmtree(path)
        os.replace(tmp, path)
        if logger:
            logger.info(f"Saved checkpoint {path}")

    if async_save:
        _SAVER.submit(_write)
    else:
        _write()
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    if os.path.isdir(path):  # orbax checkpoint directory
        return load_checkpoint_orbax(path)
    with open(path, "rb") as f:
        return pickle.load(f)


# ---------------------------------------------------------------------------
# Orbax backend — async, multi-host-safe checkpointing for large states.
# The pickle format above stays the default (single-file, torch-era UX);
# orbax is selected by passing a directory path.
# ---------------------------------------------------------------------------

_ORBAX_ASYNC = None


def _orbax_async_checkpointer():
    """One process-wide AsyncCheckpointer (the orbax-recommended pattern:
    reusing it serializes saves and bounds the background-copy memory)."""
    global _ORBAX_ASYNC
    if _ORBAX_ASYNC is None:
        import orbax.checkpoint as ocp

        _ORBAX_ASYNC = ocp.AsyncCheckpointer(ocp.PyTreeCheckpointHandler())
    return _ORBAX_ASYNC


def save_checkpoint_orbax(
    state: Any, epoch: int, best_loss: float, dir_add: str, name: str = "ckpt",
    logger=None, extra: Optional[Dict[str, Any]] = None,
    async_save: bool = False,
) -> str:
    """Orbax-native save. Multi-host: call from EVERY process (orbax's save
    barriers across processes internally — a rank-0-only call would hang).
    Unlike the pickle backend there is NO gather: jax.Array leaves are handed
    to orbax live, and each process writes its own addressable shards —
    checkpoint cost stays O(state/process) however the state is sharded.

    ``async_save=True`` uses orbax's AsyncCheckpointer: the device->host
    copy is synchronous (mutation safety — the train loop donates the
    state's buffers), the serialization + write happen in background
    threads. ``wait_for_saves`` joins it."""
    import orbax.checkpoint as ocp

    path = os.path.abspath(os.path.join(dir_add, name))
    os.makedirs(dir_add, exist_ok=True)
    payload = {
        "epoch": int(epoch),
        "best_loss": float(best_loss),
        "step": int(_fetch_global(state.step)),
        "params": state.params,
        "opt_state": serialization.to_state_dict(state.opt_state),
    }
    for k, v in (extra or {}).items():
        payload[k] = (
            v if isinstance(v, (int, float, str))
            else serialization.to_state_dict(v)
        )
    if async_save:
        ckptr = _orbax_async_checkpointer()
        ckptr.save(path, payload, force=True)
    else:
        with ocp.PyTreeCheckpointer() as ckptr:
            ckptr.save(path, payload, force=True)
    if logger:
        logger.info(f"Saving orbax checkpoint {path}")
    return path


def load_checkpoint_orbax(path: str) -> Dict[str, Any]:
    """Restore an orbax checkpoint as a HOST-NUMPY tree.

    Array leaves are explicitly restored as np.ndarray: checkpoints written
    cooperatively by a multi-host run store jax.Array sharding metadata tied
    to the writing topology, and restoring them as jax.Arrays on a different
    topology (e.g. feature extraction on one host from a pod-trained
    checkpoint) fails sharding deserialization. Numpy restoration reads the
    full array from the shard files regardless of topology; restore_state
    re-device_puts with the live state's shardings."""
    import numpy as _np

    import orbax.checkpoint as ocp
    from orbax.checkpoint import metadata as ocp_md

    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        meta_tree = ckptr.metadata(path).item_metadata.tree
        restore_args = jax.tree.map(
            lambda m: ocp.RestoreArgs(restore_type=_np.ndarray)
            if isinstance(m, ocp_md.ArrayMetadata)
            and not isinstance(m, ocp_md.ScalarMetadata)
            else ocp.RestoreArgs(),
            meta_tree,
            is_leaf=lambda m: isinstance(m, ocp_md.Metadata),
        )
        return ckptr.restore(path, restore_args=restore_args)


def restore_state(
    state: Any, payload: Dict[str, Any], restore_opt: bool = True
) -> Tuple[Any, int, float]:
    """Restore a TrainState from a checkpoint payload.

    Arrays are device_put with the template state's shardings preserved
    (jax re-places them lazily on first use under jit in_shardings).
    Returns (state, epoch, best_loss).
    """
    # _restore_tree casts each leaf to the TEMPLATE dtype: a checkpoint from
    # a different-precision run must not silently change the train state's
    # avals (the jitted step was compiled against the template's dtypes)
    new_state = state.replace(
        params=_restore_tree(state.params, payload["params"]),
        step=payload.get("step", 0),
    )
    if restore_opt and "opt_state" in payload:
        new_state = new_state.replace(
            opt_state=_restore_tree(state.opt_state, payload["opt_state"])
        )
    # states that carry BatchNorm running stats (downstream classifier)
    # restore them too — evaluating a reloaded model with fresh mean/var
    # would silently change its predictions
    if "batch_stats" in payload and hasattr(state, "batch_stats"):
        new_state = new_state.replace(
            batch_stats=_restore_tree(state.batch_stats, payload["batch_stats"])
        )
    return new_state, payload.get("epoch", 0), payload.get("best_loss", float("inf"))


def _restore_tree(target: Any, payload_sd: Any) -> Any:
    """from_state_dict a payload subtree onto a (possibly sharded) target.

    The template handed to from_state_dict is a host-side ZEROS tree of the
    target's shapes — never ``device_get(target)``: on a multi-controller
    run the live state's leaves span processes (not addressable locally),
    so fetching them would raise — and even single-host it is a pointless
    D2H of the entire state. from_state_dict only consumes the template's
    STRUCTURE (it raises on key mismatches rather than filling defaults)."""

    def _zeros_like(t):
        if hasattr(t, "shape") and hasattr(t, "dtype"):
            return np.zeros(t.shape, t.dtype)
        return t

    restored = serialization.from_state_dict(
        jax.tree.map(_zeros_like, target), payload_sd
    )

    def _place(t, n):
        if hasattr(t, "sharding"):
            # full host value -> the template's (possibly cross-process)
            # sharding; every process holds the same loaded checkpoint, so
            # device_put shards out just the locally addressable pieces
            return jax.device_put(np.asarray(n, dtype=t.dtype), t.sharding)
        return type(t)(n) if isinstance(t, (int, float)) else n

    return jax.tree.map(_place, target, restored)


def restore_dino_state(
    state: Any, payload: Dict[str, Any], logger=None
) -> Tuple[Any, int, float]:
    """Full DINO resume: student params, teacher params, optimizer state,
    DINO center, student/teacher head BatchNorm stats, and step — everything
    the trainer checkpoints (mirror of the reference's full model + optimizer
    + scheduler + epoch restore, reference: src/utils/misc.py:55-69).

    Returns (state, epoch, best_loss). Missing payload entries (older
    checkpoints, cross-format loads) are skipped with a log line instead of
    silently resetting everything.
    """
    replace = {"params": _restore_tree(state.params, payload["params"])}
    skipped = []
    optional = {
        "teacher_params": "momentum_model_state_dict",
        "opt_state": "opt_state",
        "center": "center",
        "head_stats": "head_stats",
        "teacher_head_stats": "teacher_head_stats",
    }
    for field, key in optional.items():
        if key in payload:
            try:
                replace[field] = _restore_tree(getattr(state, field), payload[key])
            except (ValueError, KeyError, TypeError) as e:
                skipped.append(f"{key} ({e})")
        else:
            skipped.append(key)
    new_state = state.replace(
        step=jax.device_put(
            np.asarray(payload.get("step", 0), dtype=np.int32), state.step.sharding
        ),
        **replace,
    )
    if skipped and logger:
        logger.warning(f"DINO resume: not restored: {skipped}")
    return new_state, payload.get("epoch", 0), payload.get("best_loss", float("inf"))
