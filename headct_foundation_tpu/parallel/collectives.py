"""Collective helpers (reference surface: src/utils/misc.py comms utilities).

Inside sharded-jit train steps, collectives are implicit — XLA inserts them —
so the reference's per-step ``all_reduce_mean`` (misc.py:287-299) has no
explicit equivalent. These helpers cover the explicit cases:

* ``all_reduce_mean`` — host-level mean across processes (metric sync,
  reference: SmoothedValue.synchronize_between_processes, misc.py:158-169).
* ``all_gather``/``psum_mean`` — for use INSIDE shard_map-ped functions with a
  named axis; ``all_gather`` is differentiable (its transpose is the
  reduce-scatter the reference hand-writes in AllGatherFunction,
  misc.py:428-444 — JAX derives it automatically).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def all_reduce_mean(x: float) -> float:
    """Mean of a host scalar across processes (single-process: identity)."""
    if jax.process_count() == 1:
        return float(x)
    arr = jax.make_array_from_process_local_data(
        jax.sharding.NamedSharding(
            jax.sharding.Mesh(np.asarray(jax.devices()).reshape(-1), ("d",)),
            jax.sharding.PartitionSpec("d"),
        ),
        np.full((jax.local_device_count(),), float(x), dtype=np.float32),
    )
    return float(jnp.mean(arr))


def all_gather(x: jnp.ndarray, axis_name: str, tiled: bool = True) -> jnp.ndarray:
    """Differentiable all-gather over a named mesh axis (use under shard_map).

    The VJP is a reduce-scatter — the reference implements this by hand as
    AllGatherFunction (misc.py:428-444); JAX's autodiff of lax.all_gather
    yields the same program.
    """
    return jax.lax.all_gather(x, axis_name, tiled=tiled)


def psum_mean(x: jnp.ndarray, axis_name: str) -> jnp.ndarray:
    """Cross-replica mean over a named axis (use under shard_map)."""
    return jax.lax.pmean(x, axis_name)
