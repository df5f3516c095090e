"""Host→device input pipeline: double-buffered batch prefetch onto the mesh.

The reference feeds the GPU with a blocking per-step ``data.to(device)``
(reference: engine_pretrain_mae.py:56). TPU-native, the transfer is hoisted
into a background thread that keeps ``depth`` batches resident on device ahead
of the train loop, so H2D copies ride under device compute and the step never
waits on PCIe:

    loader threads (disk/preprocess) → DevicePrefetcher (shard_batch + H2D)
        → train loop (dispatch only)

Volumes cross the wire in their storage dtype (fp16 from the disk cache —
half the H2D bytes of fp32); the jitted step casts to bfloat16 on device.
"""

from __future__ import annotations

import queue
import threading
from typing import Any, Iterator, Optional

import jax
import jax.numpy as jnp
import numpy as np

from headct_foundation_tpu.parallel.mesh import batch_sharding, shard_batch


def measure_h2d_mbps(nbytes: int = 12 << 20, tries: int = 2) -> float:
    """Measured host->device bandwidth (MB/s) via the production chunked-put
    path, best of ``tries``. On a locally attached TPU this lands in the
    GB/s range; over a WAN-tunnel relay it swings 17 MB/s-1.4 GB/s
    minute-to-minute (ROUND_NOTES)."""
    import time

    probe = np.zeros(nbytes // 2, np.int16)
    best = float("inf")
    for _ in range(max(1, tries)):
        t0 = time.perf_counter()
        jax.block_until_ready(
            chunked_device_put(probe, DevicePrefetcher.CHUNK_BYTES)
        )
        best = min(best, time.perf_counter() - t0)
    return probe.nbytes / 1e6 / best


def resolve_wire_format(config, probe_mbps: Optional[float] = None) -> str:
    """Resolve ``DATA.WIRE_FORMAT='auto'`` to a concrete wire format from
    the measured H2D bandwidth; literal formats pass through.

    Policy (equivalence study: wire_equivalence.json + tests/test_wire_format
    bounds): ``hu16`` is the production default — numerically within wire
    quantization of the float chain. When the measured transport is below
    ``DATA.WIRE_AUTO_MBPS`` (default 150 MB/s — well under any rate that
    could feed the ~450 MB/s the compute step consumes at hu16), the loader
    is transport-bound and ``hu8`` (half the bytes, documented-lossy: worst
    window error 1.2e-2, ~10x below the training augmentation's intensity
    jitter) roughly doubles sustained throughput; above it, stay hu16.

    Scope: the wire format is read ONLY by training loaders/caches and the
    jitted train/eval steps' window expansion. The measured basis for
    letting auto pick hu8 there is TRAINING-level equivalence (300-step
    flagship A/B: mean relative |Δloss| 4.4e-5 — wire_equivalence.json).
    Feature-level hu8-vs-hu16 cosine FAILS the 0.999 parity bar (0.80-0.91
    measured) — which is why hu8 is never used on the inference path (the
    feature extractor ships lossless int16 HU) and never a global default."""
    wire = str(getattr(config.DATA, "WIRE_FORMAT", "windowed"))
    if wire != "auto":
        return wire
    mbps = measure_h2d_mbps() if probe_mbps is None else probe_mbps
    chosen = "hu8" if mbps < float(getattr(config.DATA, "WIRE_AUTO_MBPS",
                                           150.0)) else "hu16"
    import logging

    logging.getLogger("headct_foundation_tpu.data").info(
        "WIRE_FORMAT=auto: measured H2D %.1f MB/s -> %s", mbps, chosen,
    )
    return chosen


def chunked_device_put(arr: np.ndarray, chunk_bytes: int) -> jax.Array:
    """device_put with multiple concurrent in-flight chunks along axis 0:
    pipelines the transport (PCIe DMA channels locally; measured multi-x
    aggregate on a tunneled remote chip). Returns an UNSHARDED device array
    on the default device."""
    n = max(1, -(-arr.nbytes // chunk_bytes))
    if n == 1:
        return jax.device_put(arr)
    parts = [jax.device_put(p) for p in np.array_split(arr, n, axis=0)]
    return jnp.concatenate(parts, axis=0)


class DevicePrefetcher:
    """Wrap an iterable of host batches; yield device-resident batches.

    Batches may be bare arrays or tuples whose field ``field`` is the volume
    array (extra fields — filenames, labels — pass through untouched on host).
    Yields the same structure with the volume replaced by a sharded
    ``jax.Array`` (and, with ``with_counts=True``, appends the real
    pre-padding batch size for consumers that slice per-sample outputs).
    """

    def __init__(
        self,
        loader: Any,
        mesh: Any,
        depth: int = 2,
        field: int = 0,
        dtype: Optional[Any] = None,
        with_counts: bool = False,
        extra_fields: Any = (),
    ):
        self.loader = loader
        self.mesh = mesh
        self.depth = max(depth, 1)
        self.field = field
        self.dtype = dtype
        self.with_counts = with_counts
        # [(tuple_index, dtype)] of additional small fields (labels, ...) to
        # place sharded on device alongside the volume — keeps per-step H2D
        # RTTs out of the consumer's critical path.
        self.extra_fields = tuple(extra_fields)

    @classmethod
    def wrap(cls, loader: Any, mesh: Any, **kw) -> "DevicePrefetcher":
        return loader if isinstance(loader, cls) else cls(loader, mesh, **kw)

    def set_epoch(self, epoch: int) -> None:
        if hasattr(self.loader, "set_epoch"):
            self.loader.set_epoch(epoch)

    def __len__(self) -> int:
        return len(self.loader)

    # Transfers larger than this are split into concurrent chunks: multiple
    # in-flight copies pipeline the transport (PCIe DMA channels locally;
    # measured ~2-20x aggregate on a remote-attached chip's tunnel). 12 MB
    # re-measured best across chunk sweeps on this relay (1370 MB/s vs 1102
    # at 48 MB on a 57 MB hu16 batch) and matches the latency-path choice in
    # device_preprocess._chunked_put.
    CHUNK_BYTES = 12 << 20

    def _place(self, batch: Any) -> Any:
        if isinstance(batch, tuple):
            vol = batch[self.field]
            if isinstance(vol, jax.Array):
                # already device-resident (device-pool loaders): np.asarray
                # here would force a D2H+H2D round trip of the whole batch.
                # Still honor the dtype contract and the batch sharding —
                # a committed array on the wrong devices would otherwise
                # fail the jitted step's in_shardings check.
                dev, n = self._placed_device_array(vol), vol.shape[0]
            else:
                dev, n = self._put(np.asarray(vol))
            out = list(batch)
            out[self.field] = dev
            for idx, dt in self.extra_fields:
                extra, _ = shard_batch(np.asarray(out[idx]), self.mesh, dtype=dt)
                jax.block_until_ready(extra)
                out[idx] = extra
            out = tuple(out)
            return out + (n,) if self.with_counts else out
        if isinstance(batch, jax.Array):
            dev = self._placed_device_array(batch)
            return (dev, dev.shape[0]) if self.with_counts else dev
        dev, n = self._put(np.asarray(batch))
        return (dev, n) if self.with_counts else dev

    def _placed_device_array(self, vol: "jax.Array") -> "jax.Array":
        """dtype-cast + batch-sharding placement for an already-device-
        resident volume batch (device-to-device, never via host)."""
        if self.dtype is not None and vol.dtype != self.dtype:
            vol = vol.astype(self.dtype)
        vol = jax.device_put(vol, batch_sharding(self.mesh))
        jax.block_until_ready(vol)
        return vol

    def _put(self, vol: np.ndarray):
        """Host batch -> sharded device array, transfer completed HERE in the
        producer thread. device_put can be lazy (the copy otherwise lands
        inside the consumer's step time); blocking in the background thread
        is what actually overlaps the copy with device compute."""
        single = (
            jax.process_count() == 1
            and int(np.prod(list(self.mesh.shape.values()))) == 1
        )
        # Errors (incl. OOM during the transfer) propagate out of the
        # producer thread and re-raise at the consumer via the queue —
        # do NOT swallow them here.
        if single and vol.nbytes > self.CHUNK_BYTES:
            dev = chunked_device_put(vol, self.CHUNK_BYTES)
            if self.dtype is not None:
                dev = dev.astype(self.dtype)
            dev = jax.device_put(dev, batch_sharding(self.mesh))  # no-op view
            jax.block_until_ready(dev)
            return dev, vol.shape[0]
        dev, n = shard_batch(vol, self.mesh, dtype=self.dtype)
        jax.block_until_ready(dev)
        return dev, n

    def __iter__(self) -> Iterator[Any]:
        out_q: "queue.Queue" = queue.Queue(maxsize=self.depth)
        stop = threading.Event()

        def _producer():
            from headct_foundation_tpu.data.datasets import _put_or_stop

            try:
                for batch in self.loader:
                    if stop.is_set():
                        return
                    if not _put_or_stop(out_q, self._place(batch), stop):
                        return
            except Exception as e:
                _put_or_stop(out_q, e, stop)
            finally:
                _put_or_stop(out_q, None, stop)

        threading.Thread(target=_producer, daemon=True).start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
            try:
                while True:
                    out_q.get_nowait()
            except queue.Empty:
                pass
