"""Datasets, disk cache, samplers, and threaded host loaders.

Mirrors the reference's data layer (reference: src/data/datasets.py):

* ``PretrainDataset`` / ``FinetuneDataset`` — CSV manifests, per-item
  preprocessing through ``loading_transforms`` with a deterministic disk
  cache of the preprocessed volume (.npy files keyed by content hash,
  replacing MONAI ``PersistentDataset``; reference: datasets.py:42-46), and
  the same error shielding: corrupt/unreadable scans yield placeholder
  volumes instead of crashing (reference: datasets.py:70-96).
* Dataset-specific label-column maps for nyu/rsna/cq500 and inverse-frequency
  class weights (reference: datasets.py:248-253, 275-281).
* Samplers — per-process sharding (DistributedSampler semantics),
  weighted-random 500 samples/process/epoch for fine-tuning
  (reference: datasets.py:298-305), and few-shot groupby-sampling
  (reference: datasets.py:393-394).
* ``ThreadedLoader`` — a thread-pool loader that prefetches and collates
  batches on host while the TPU computes (replacing MONAI ThreadDataLoader).

Augmentation is NOT applied here: per-step random augs run on device
(data/augment.py) inside the engines — the TPU-native split of work.
"""

from __future__ import annotations

import hashlib
import logging
import os
import queue
import threading
from typing import Any, Callable, Dict, Iterator, List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd

from headct_foundation_tpu.data.transforms import load_and_preprocess

_PIPELINE_VERSION = "v1"  # bump to invalidate caches when preprocessing changes

# Label-column maps (reference: datasets.py:248-253).
CLASS_MAPPINGS = {
    "nyu": {"cancer": 1, "hydrocephalus": 2, "edema": 3, "dementia": 4, "IPH": 5,
            "IVH": 6, "SDH": 7, "EDH": 8, "SAH": 9, "ICH": 10, "fracture": 11},
    "longisland": {"cancer": 1, "hydrocephalus": 2, "edema": 3, "dementia": 4,
                   "IPH": 5, "IVH": 6, "SDH": 7, "EDH": 8, "SAH": 9, "ICH": 10,
                   "fracture": 11},
    "rsna": {"epidural": 1, "intraparenchymal": 2, "intraventricular": 3,
             "subarachnoid": 4, "subdural": 5, "any": 6},
    "cq500": {"ICH": 1, "IPH": 2, "IVH": 3, "SDH": 4, "EDH": 5, "SAH": 6,
              "BleedLocation-Left": 7, "BleedLocation-Right": 8, "ChronicBleed": 9,
              "Fracture": 10, "CalvarialFracture": 11, "OtherFracture": 12,
              "MassEffect": 13, "MidlineShift": 14},
}


def get_class_mapping(dataset: str) -> Dict[str, int]:
    if dataset not in CLASS_MAPPINGS:
        raise ValueError(f"Unrecognized dataset: {dataset}")
    return CLASS_MAPPINGS[dataset]


def _wire_format(config: Any) -> str:
    """Cache/wire tensor format from config (see config.py DATA.WIRE_FORMAT)."""
    return str(getattr(config.DATA, "WIRE_FORMAT", "windowed"))


def _process_info() -> Tuple[int, int]:
    try:
        import jax

        return jax.process_index(), jax.process_count()
    except Exception:
        return 0, 1


class PackedShardReader:
    """Memmapped reader for the packed cache format: volumes live
    contiguously in large shard files (``pack_*.bin``, each a flat
    [count, C, *roi] fp16 array) indexed by ``pack_index*.json``. One
    open+mmap per SHARD for the whole run replaces an open/stat/.npy-header
    parse per VOLUME — at production rates (hundreds of volumes/s/chip) the
    per-volume small-file path costs an fs metadata op + header decode each,
    while shard pages are served straight from the OS page cache.

    Multiple index files merge (rank-tagged parallel builds); later files
    win on key collisions. Index files with DIFFERENT geometries (shape or
    dtype) coexist — each shard file is memmapped with the geometry its own
    index recorded, so one cache dir can hold packed builds for e.g. 96^3
    3-channel pretrain volumes next to 1-channel downstream ones (cache
    keys already encode roi/channels/backend, so lookups never cross over).
    """

    def __init__(self, cache_dir: str, index_paths: Sequence[str]):
        import json

        self.cache_dir = cache_dir
        self.entries: Dict[str, Tuple[str, int]] = {}
        # per-shard geometry: name -> (count, shape, dtype); later index
        # files win if a shard name ever collides (rank tags make that a
        # same-build re-merge, not a conflict)
        self._shard_meta: Dict[str, Tuple[int, Tuple[int, ...], np.dtype]] = {}
        self._shards: Dict[str, np.memmap] = {}
        self._lock = threading.Lock()
        for ip in index_paths:
            with open(ip) as f:
                idx = json.load(f)
            meta = idx["meta"]
            shape = tuple(meta["shape"])
            dtype = np.dtype(meta.get("dtype", "float16"))
            for name, count in meta["shard_counts"].items():
                self._shard_meta[name] = (int(count), shape, dtype)
            for key, ent in idx["entries"].items():
                self.entries[key] = (ent[0], int(ent[1]))

    @classmethod
    def open(cls, cache_dir: str) -> Optional["PackedShardReader"]:
        import glob

        index_paths = sorted(
            glob.glob(os.path.join(cache_dir, "pack_index*.json"))
        )
        if not index_paths:
            return None
        return cls(cache_dir, index_paths)

    def _shard(self, name: str) -> np.memmap:
        mm = self._shards.get(name)
        if mm is None:
            with self._lock:
                mm = self._shards.get(name)
                if mm is None:
                    count, shape, dtype = self._shard_meta[name]
                    mm = np.memmap(
                        os.path.join(self.cache_dir, name), dtype=dtype,
                        mode="r", shape=(count,) + tuple(shape),
                    )
                    self._shards[name] = mm
        return mm

    def get(self, key: str) -> Optional[np.ndarray]:
        ent = self.entries.get(key)
        if ent is None:
            return None
        name, slot = ent
        # materialize HERE (worker-pool thread): a lazy memmap view would
        # defer the disk page-ins to the single collate/producer thread's
        # np.stack, serializing cold-cache I/O behind one thread
        return np.asarray(self._shard(name)[slot])

    def __len__(self) -> int:
        return len(self.entries)


class PackedCacheWriter:
    """Append-only packed-cache shard writer (see PackedShardReader).

    Volumes stream to ``pack_<tag><i>.bin`` in fixed-size shards; ``close``
    writes ``pack_index<tag>.json`` atomically. Rank-parallel builds pass a
    distinct ``tag`` per process and readers merge the indices.

    Re-opening over an existing same-tag index is an INCREMENTAL build: the
    old entries are carried into the new index, old shard files are never
    reopened or truncated (a concurrent reader may be serving memmapped
    pages from them), and new volumes land in fresh shard files.
    """

    def __init__(
        self,
        cache_dir: str,
        shape: Sequence[int],
        volumes_per_shard: int = 512,
        tag: str = "",
        dtype=np.float16,
    ):
        import json

        os.makedirs(cache_dir, exist_ok=True)
        self.cache_dir = cache_dir
        self.shape = tuple(shape)
        self.volumes_per_shard = volumes_per_shard
        self.tag = tag
        self.dtype = np.dtype(dtype)
        self.entries: Dict[str, Tuple[str, int]] = {}
        self.shard_counts: Dict[str, int] = {}
        self._shard_idx = -1
        self._slot = volumes_per_shard  # force a new shard on first add
        self._fh = None
        self._cur_name = ""
        prev = os.path.join(cache_dir, f"pack_index{tag}.json")
        if os.path.exists(prev):
            with open(prev) as f:
                idx = json.load(f)
            meta = idx["meta"]
            if tuple(meta["shape"]) != self.shape:
                raise ValueError(
                    f"existing packed index shape {meta['shape']} != {shape}"
                )
            if np.dtype(meta.get("dtype", "float16")) != self.dtype:
                raise ValueError(
                    f"existing packed index dtype {meta.get('dtype')} != "
                    f"{self.dtype.name}"
                )
            self.entries = {
                k: (v[0], int(v[1])) for k, v in idx["entries"].items()
            }
            self.shard_counts = dict(meta["shard_counts"])

    def _roll(self) -> None:
        if self._fh is not None:
            self._fh.close()
        while True:
            self._shard_idx += 1
            self._cur_name = f"pack_{self.tag}{self._shard_idx:05d}.bin"
            path = os.path.join(self.cache_dir, self._cur_name)
            if not os.path.exists(path):
                break
        # exclusive create: NEVER truncate a shard a reader may be mmapping
        self._fh = open(path, "xb")
        self._slot = 0

    def add(self, key: str, vol: np.ndarray) -> None:
        vol = np.ascontiguousarray(vol, dtype=self.dtype)
        assert vol.shape == self.shape, (vol.shape, self.shape)
        if self._slot >= self.volumes_per_shard:
            self._roll()
        self._fh.write(vol.tobytes())
        self.entries[key] = (self._cur_name, self._slot)
        self.shard_counts[self._cur_name] = self._slot + 1
        self._slot += 1

    def close(self) -> None:
        import json

        if self._fh is not None:
            self._fh.close()
            self._fh = None
        index = {
            "meta": {
                "shape": list(self.shape),
                "dtype": self.dtype.name,
                "shard_counts": self.shard_counts,
            },
            "entries": {k: [v[0], v[1]] for k, v in self.entries.items()},
        }
        path = os.path.join(self.cache_dir, f"pack_index{self.tag}.json")
        tmp = path + f".tmp{os.getpid()}"
        with open(tmp, "w") as f:
            json.dump(index, f)
        os.replace(tmp, path)

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        self.close()


class DiskCache:
    """Deterministic .npy cache of preprocessed volumes (PersistentDataset
    equivalent). Key = hash(img_path, roi, channels, pipeline version,
    preprocessing backend).

    When the cache dir holds a packed index (tools/build_cache.py --packed),
    hits are served from memmapped shard files (PackedShardReader) — the
    steady-state host path does zero per-volume file opens. Per-volume .npy
    files remain the write-through format for on-the-fly caching.

    NOTE: the backend became part of the key together with the v1 pipeline
    version — caches built by earlier revisions (unqualified keys) are
    orphaned and re-materialize on first use; rebuild with
    tools/build_cache.py."""

    def __init__(self, cache_dir: Optional[str], roi: Sequence[int], in_channels: int,
                 wire: str = "windowed"):
        assert wire in ("windowed", "hu16", "hu8"), wire
        self.roi = tuple(roi)
        self.in_channels = in_channels
        self.wire = wire
        if cache_dir:
            try:
                os.makedirs(cache_dir, exist_ok=True)
            except OSError:
                cache_dir = None  # unwritable cache dir -> run uncached
        self.cache_dir = cache_dir
        self._device_prep = None
        self._packed: Any = False  # False = not probed; None = no packed index

    @property
    def wire_shape(self) -> Tuple[int, ...]:
        """Shape of one cached/wire tensor (channel-first)."""
        if self.wire in ("hu16", "hu8"):
            return (1, *self.roi)
        return (self.in_channels, *self.roi)

    def placeholder(self) -> np.ndarray:
        """Error-shielding placeholder in the wire format: windows to
        all-zero channels either way (reference: datasets.py:70-96)."""
        from headct_foundation_tpu.data.transforms import (
            HU8_PLACEHOLDER,
            HU16_PLACEHOLDER,
        )

        if self.wire == "hu16":
            return np.full(self.wire_shape, HU16_PLACEHOLDER, dtype=np.int16)
        if self.wire == "hu8":
            return np.full(self.wire_shape, HU8_PLACEHOLDER, dtype=np.uint8)
        return np.zeros(self.wire_shape, dtype=np.float16)

    def _backend(self) -> str:
        """Which preprocessing backend _preprocess will take: 'device'
        (TPU, HEADCT_DEVICE_CACHE=1 — cubic resample/window/resize as
        on-device matmuls, for offline cache builds on TPU hosts), 'native'
        (C++), or 'python' (scipy). Part of the cache key — backends agree
        only to ~1e-5, so flipping one env var must not serve another
        backend's tensors."""
        if os.environ.get("HEADCT_DEVICE_CACHE", "0") == "1":
            return "device"
        if os.environ.get("HEADCT_NATIVE", "1") != "0" and len(set(self.roi)) == 1:
            from headct_foundation_tpu.data.native_loader import (
                native_available,
                native_supports_hu16,
            )

            if native_available() and (
                self.wire not in ("hu16", "hu8") or native_supports_hu16()
            ):
                return "native"
        return "python"

    def _key(self, path: str) -> str:
        # hu16 tensors are a different format entirely — tag the key (the
        # 'windowed' tag is omitted so existing caches stay valid)
        wire_tag = "" if self.wire == "windowed" else f"|{self.wire}"
        h = hashlib.sha1(
            f"{path}|{self.roi}|{self.in_channels}|{_PIPELINE_VERSION}"
            f"|{self._backend()}{wire_tag}".encode()
        ).hexdigest()
        return h

    def _preprocess(self, path: str) -> np.ndarray:
        """Native (C++) pipeline when available — ~100x faster than the
        scipy path and GIL-free, so loader threads parallelize; numerically
        matched to fp16 precision. HEADCT_NATIVE=0 forces the python path;
        HEADCT_DEVICE_CACHE=1 selects the on-device (TPU) pipeline in the
        training transform order."""
        backend = self._backend()
        if backend == "device":
            if self._device_prep is None:
                from headct_foundation_tpu.data.device_preprocess import (
                    DevicePreprocessor,
                )

                self._device_prep = DevicePreprocessor(
                    self.roi, self.in_channels,
                    order="hu16" if self.wire in ("hu16", "hu8") else "training",
                )
            out = np.asarray(self._device_prep(path))
            if self.wire == "hu16":
                from headct_foundation_tpu.data.transforms import hu16_encode

                return hu16_encode(out)
            if self.wire == "hu8":
                from headct_foundation_tpu.data.transforms import hu8_encode

                return hu8_encode(out)
            return out.astype(np.float16)
        if backend == "native":
            from headct_foundation_tpu.data.native_loader import (
                load_and_preprocess_native,
            )

            if self.wire == "hu8":
                # the native pipeline emits the hu16 raw-HU tensor; transcode
                # (the 0.05-HU intermediate is 10x below hu8's finest step)
                from headct_foundation_tpu.data.transforms import (
                    hu8_encode,
                    hu16_decode,
                )

                t = load_and_preprocess_native(
                    path, self.roi, self.in_channels, wire="hu16"
                )
                return hu8_encode(hu16_decode(t))
            return load_and_preprocess_native(
                path, self.roi, self.in_channels, wire=self.wire
            )
        if self.wire in ("hu16", "hu8"):
            from headct_foundation_tpu.data.transforms import (
                hu8_encode,
                hu16_decode,
                load_and_preprocess_hu16,
            )

            t = load_and_preprocess_hu16(path, self.roi)
            return hu8_encode(hu16_decode(t)) if self.wire == "hu8" else t
        return load_and_preprocess(path, self.roi, self.in_channels)

    def load(self, path: str) -> np.ndarray:
        if self.cache_dir:
            key = self._key(path)
            if self._packed is False:  # probe once (thread-safe: idempotent)
                try:
                    self._packed = PackedShardReader.open(self.cache_dir)
                except Exception as e:  # corrupt/partial index: a raise here
                    # would be swallowed by the datasets' error shielding and
                    # turn EVERY item into a zero placeholder — disable the
                    # packed path loudly and fall through to .npy/preprocess
                    logging.getLogger(__name__).warning(
                        "packed cache index unreadable in %s (%s); "
                        "falling back to per-volume .npy", self.cache_dir, e,
                    )
                    self._packed = None
            if self._packed is not None:
                vol = self._packed.get(key)
                if vol is not None:
                    return vol
            cpath = os.path.join(self.cache_dir, key + ".npy")
            if os.path.exists(cpath):
                return np.load(cpath)
        vol = self._preprocess(path)
        if self.cache_dir:
            # write-to-temp + atomic rename so concurrent workers never read
            # a partial file (np.save appends ".npy" to bare paths, so write
            # through an explicit handle)
            tmp = cpath + f".tmp{os.getpid()}.{threading.get_ident()}"
            with open(tmp, "wb") as f:
                np.save(f, vol)
            os.replace(tmp, cpath)
        return vol


class PretrainDataset:
    """CSV manifest ('img_path' column) -> preprocessed [C, *roi] volumes.

    Returns float16 numpy arrays; failures return a zero placeholder
    (reference: datasets.py:70-96 error shielding).
    """

    def __init__(self, config: Any, csv_file: str, cache_dir: Optional[str] = None):
        self.roi = tuple(config.MODEL.ROI)
        self.in_channels = config.MODEL.IN_CHANS
        self.data = pd.read_csv(csv_file)
        self.cache = DiskCache(
            cache_dir, self.roi, self.in_channels, wire=_wire_format(config)
        )
        self.placeholder = self.cache.placeholder()
        self.error_count = 0

    def __len__(self) -> int:
        return len(self.data)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, str]:
        path = self.data["img_path"].iloc[idx]
        try:
            vol = self.cache.load(path)
            if vol.shape != self.cache.wire_shape:
                print(f"Wrong shape in index {idx}: {vol.shape}")
                return self.placeholder, str(path)
            return vol, str(path)
        except Exception as e:  # data-level fault tolerance
            print(f"Error loading index {idx}: {e}")
            self.error_count += 1
            return self.placeholder, str(path)


class FinetuneDataset:
    """Labeled dataset: (image, label, fname) per item (reference:
    datasets.py:186-233)."""

    def __init__(
        self,
        config: Any,
        files: Sequence[str],
        label_dict: Dict[str, int],
        cache_dir: Optional[str] = None,
    ):
        self.roi = tuple(config.MODEL.ROI)
        self.in_channels = config.MODEL.IN_CHANS
        self.files = list(files)
        self.label_dict = label_dict
        self.cache = DiskCache(
            cache_dir, self.roi, self.in_channels, wire=_wire_format(config)
        )
        self.placeholder = self.cache.placeholder()

    def __len__(self) -> int:
        return len(self.files)

    def __getitem__(self, idx: int) -> Tuple[np.ndarray, int, Optional[str]]:
        path = self.files[idx]
        try:
            vol = self.cache.load(path)
            if vol.shape != self.cache.wire_shape:
                print(f"Wrong shape in index {idx}: {vol.shape}")
                return self.placeholder, 0, str(path)
            return vol, int(self.label_dict[path]), str(path)
        except Exception as e:
            print(f"Error loading index {idx}: {e}")
            return self.placeholder, 0, str(path)


# ---------------------------------------------------------------------------
# Samplers
# ---------------------------------------------------------------------------

def distributed_indices(
    n: int, rank: int, world: int, shuffle: bool, seed: int = 0, epoch: int = 0
) -> np.ndarray:
    """DistributedSampler semantics: pad to a multiple of world, shard."""
    order = np.arange(n)
    if shuffle:
        order = np.random.RandomState(seed + epoch).permutation(n)
    total = -(-n // world) * world
    padded = np.concatenate([order, order[: total - n]])
    return padded[rank::world]


def weighted_indices(
    weights: np.ndarray, num_samples: int, rank: int, seed: int = 0, epoch: int = 0
) -> np.ndarray:
    """DistributedWeightedRandomSampler semantics: each process draws
    ``num_samples`` indices with replacement by weight (reference:
    datasets.py:298-305, 500 samples/rank/epoch)."""
    p = np.asarray(weights, dtype=np.float64)
    p = p / p.sum()
    rng = np.random.RandomState(seed + 1000 * epoch + rank)
    return rng.choice(len(p), size=num_samples, replace=True, p=p)


# ---------------------------------------------------------------------------
# Threaded loader
# ---------------------------------------------------------------------------

def _drain(q: "queue.Queue") -> None:
    try:
        while True:
            q.get_nowait()
    except queue.Empty:
        pass


def _put_or_stop(q: "queue.Queue", item, stop: threading.Event) -> bool:
    """Blocking put that gives up once ``stop`` is set — an abandoned
    consumer (its one-shot drain may race further puts) must never leave the
    producer thread blocked forever on a full queue."""
    while True:
        try:
            q.put(item, timeout=0.1)
            return True
        except queue.Full:
            if stop.is_set():
                return False


class ThreadedLoader:
    """Persistent thread-pool prefetching loader yielding collated numpy
    batches.

    Iterating yields batches; items that failed load are placeholders (never
    None), so batch shapes are static — a TPU requirement (no recompiles).

    TPU-first pipelining (the reference hides this behind MONAI's
    ThreadDataLoader, src/data/datasets.py:115-120):

    * The worker pool is created ONCE and lives across epochs — no per-epoch
      thread startup, no cold pool while the TPU waits on the first batch.
    * Item futures are submitted in a sliding window that spans batch
      boundaries, so workers never idle between batches.
    * When an epoch's last batch is produced, the next epoch's production
      starts immediately (bounded by the prefetch queue) — checkpoint/val
      time at the epoch boundary doubles as loading time for the next epoch.
    """

    _cap_logged = False  # one worker-cap notice per process

    def __init__(
        self,
        dataset: Any,
        batch_size: int,
        indices_fn: Callable[[int], np.ndarray],
        num_workers: int = 4,
        drop_last: bool = False,
        prefetch: int = 4,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.indices_fn = indices_fn
        # Self-tuning worker cap: beyond ~4 threads per core the pool only
        # adds GIL handoffs and scheduler thrash — measured on a 1-core host
        # (packed cache, steady state): 2w 414, 4w 658-688, 8w 104-594,
        # 16w 310-673 vol/s — the >4x-cores points are never better in
        # expectation and wildly variant under any co-running CPU load.
        # HEADCT_LOADER_MAX_WORKERS overrides the cap for sweeps.
        cap = int(os.environ.get("HEADCT_LOADER_MAX_WORKERS", "0") or 0)
        if cap <= 0:
            cap = 4 * (os.cpu_count() or 1)
        self.num_workers = max(1, min(num_workers, cap))
        if self.num_workers < num_workers:
            # one line per process, not per loader — callers asking for more
            # threads than the cap should know they got fewer, and how to
            # override (HEADCT_LOADER_MAX_WORKERS)
            if not ThreadedLoader._cap_logged:
                ThreadedLoader._cap_logged = True
                logging.getLogger("headct_foundation_tpu.data").info(
                    "ThreadedLoader: capping num_workers %d -> %d "
                    "(4 threads/core; set HEADCT_LOADER_MAX_WORKERS to "
                    "override)", num_workers, self.num_workers,
                )
        self.drop_last = drop_last
        self.prefetch = prefetch
        self.epoch = 0
        self._pool = None
        self._lock = threading.Lock()
        self._epoch_driven = False  # True once a trainer calls set_epoch
        # epoch -> (queue, stop_event) produced ahead of a future __iter__
        self._pending: Dict[int, Tuple["queue.Queue", threading.Event]] = {}

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        self._epoch_driven = True

    def __len__(self) -> int:
        n = len(self.indices_fn(self.epoch))
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def close(self) -> None:
        with self._lock:
            for q, stop in self._pending.values():
                stop.set()
                _drain(q)
            self._pending.clear()
            if self._pool is not None:
                self._pool.shutdown(wait=False)
                self._pool = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass

    def _ensure_pool(self):
        if self._pool is None:
            from concurrent.futures import ThreadPoolExecutor

            self._pool = ThreadPoolExecutor(
                max_workers=self.num_workers, thread_name_prefix="headct-loader"
            )
        return self._pool

    def _start_epoch(self, epoch: int) -> Tuple["queue.Queue", threading.Event]:
        """Kick off background production of one epoch's batches."""
        out_q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        pool = self._ensure_pool()
        indices = self.indices_fn(epoch)
        n = len(indices)
        n_batches = n // self.batch_size if self.drop_last else -(-n // self.batch_size)
        batches = [
            indices[i * self.batch_size : (i + 1) * self.batch_size]
            for i in range(n_batches)
        ]

        def _producer():
            try:
                from collections import deque as _deque

                flat = iter(idx for b in batches for idx in b)
                futures: "_deque" = _deque()
                # enough in flight to cover the current batch plus busy workers
                target = self.batch_size + 2 * self.num_workers

                def _top_up():
                    while len(futures) < target:
                        try:
                            i = next(flat)
                        except StopIteration:
                            return
                        futures.append(pool.submit(self.dataset.__getitem__, i))

                _top_up()
                for batch_idx in batches:
                    if stop.is_set():
                        return
                    items = []
                    for _ in batch_idx:
                        items.append(futures.popleft().result())
                        _top_up()
                    if not _put_or_stop(out_q, _collate(items), stop):
                        return
            except Exception as e:  # surface loader errors to the consumer
                _put_or_stop(out_q, e, stop)
            finally:
                _put_or_stop(out_q, None, stop)

        threading.Thread(target=_producer, daemon=True).start()
        return out_q, stop

    def __iter__(self) -> Iterator[Any]:
        epoch = self.epoch
        with self._lock:
            pending = self._pending.pop(epoch, None)
            for q, stop in self._pending.values():  # stale lookaheads
                stop.set()
                _drain(q)
            self._pending.clear()
        if pending is None:
            pending = self._start_epoch(epoch)
        out_q, stop = pending
        try:
            while True:
                item = out_q.get()
                if item is None:
                    break
                if isinstance(item, Exception):
                    raise item
                yield item
            # Epoch drained: start loading the next one while the trainer
            # checkpoints/validates (bounded by the prefetch queue). Only for
            # epoch-driven (training) loaders — val/test loaders never call
            # set_epoch and would discard the lookahead every pass. Purely
            # opportunistic — an indices_fn that rejects epoch+1 skips it.
            if self._epoch_driven:
                try:
                    nxt = self._start_epoch(epoch + 1)
                except Exception:
                    nxt = None
                if nxt is not None:
                    with self._lock:
                        self._pending[epoch + 1] = nxt
        finally:
            stop.set()
            _drain(out_q)


def _collate(items: List[Any]) -> Any:
    """Stack tuple fields: arrays -> np.stack, ints -> array, strs -> list."""
    first = items[0]
    if isinstance(first, np.ndarray):
        return np.stack(items)
    assert isinstance(first, tuple)
    out = []
    for i, field in enumerate(first):
        column = [it[i] for it in items]
        if isinstance(field, np.ndarray):
            out.append(np.stack(column))
        elif isinstance(field, (int, np.integer)):
            out.append(np.asarray(column, dtype=np.int32))
        else:
            out.append(column)
    return tuple(out)


# ---------------------------------------------------------------------------
# Factories (reference: get_pretrain/finetune/fewshots_dataloaders)
# ---------------------------------------------------------------------------

def get_pretrain_dataloaders(config: Any) -> Tuple[ThreadedLoader, ThreadedLoader, ThreadedLoader]:
    """Train/val/test pretrain loaders, sharded per process
    (reference: datasets.py:99-183; DistributedSampler shuffle=False)."""
    rank, world = _process_info()

    def _make(csv_path: str) -> ThreadedLoader:
        ds = PretrainDataset(config, csv_path, cache_dir=config.DATA.CACHE_DIR)
        return ThreadedLoader(
            ds,
            batch_size=config.DATA.BATCH_SIZE,
            indices_fn=lambda epoch, n=len(ds): distributed_indices(
                n, rank, world, shuffle=False
            ),
            num_workers=config.DATA.NUM_WORKERS,
        )

    return (
        _make(config.DATA.TRAIN_CSV_PATH),
        _make(config.DATA.VAL_CSV_PATH),
        _make(config.DATA.TEST_CSV_PATH),
    )


def _label_dicts(config: Any):
    class_mapping = get_class_mapping(config.DATA.DATASET)
    if config.TRAIN.LABEL_NAME not in class_mapping:
        raise ValueError(
            f"Unknown label name {config.TRAIN.LABEL_NAME!r} for dataset "
            f"{config.DATA.DATASET!r}; choose one of {sorted(class_mapping)}"
        )
    class_idx = class_mapping[config.TRAIN.LABEL_NAME]
    df_train = pd.read_csv(config.DATA.TRAIN_CSV_PATH)
    df_val = pd.read_csv(config.DATA.VAL_CSV_PATH)
    df_test = pd.read_csv(config.DATA.TEST_CSV_PATH)
    return class_idx, df_train, df_val, df_test


def get_finetune_dataloaders(
    config: Any,
) -> Tuple[ThreadedLoader, ThreadedLoader, ThreadedLoader, Optional[np.ndarray]]:
    """Fine-tune loaders with inverse-frequency weighted sampling
    (500 samples/process/epoch) and class weights (reference:
    datasets.py:236-361)."""
    rank, world = _process_info()
    class_idx, df_train, df_val, df_test = _label_dicts(config)
    num_classes = config.DATA.NUM_CLASSES

    y_train = np.asarray(df_train.iloc[:, class_idx], dtype=np.int64)
    class_weights = None
    if num_classes != 1:
        counts = np.bincount(y_train, minlength=num_classes)
        total = len(y_train)
        class_weights = np.array(
            [total / max(c, 1) for c in counts], dtype=np.float32
        )

    def _dict(df) -> Dict[str, int]:
        return dict(zip(df["img_path"], df.iloc[:, class_idx]))

    train_ds = FinetuneDataset(
        config, list(df_train["img_path"]), _dict(df_train), config.DATA.CACHE_DIR
    )
    sample_weights = class_weights[y_train] if class_weights is not None else np.ones(len(y_train))
    sample_size = 500  # reference: datasets.py:298
    train_loader = ThreadedLoader(
        train_ds,
        batch_size=config.DATA.BATCH_SIZE,
        indices_fn=lambda epoch: weighted_indices(
            sample_weights, sample_size, rank, seed=config.SEED, epoch=epoch
        ),
        num_workers=config.DATA.NUM_WORKERS,
    )

    def _eval_loader(df) -> ThreadedLoader:
        ds = FinetuneDataset(
            config, list(df["img_path"]), _dict(df), config.DATA.CACHE_DIR
        )
        return ThreadedLoader(
            ds,
            batch_size=config.DATA.BATCH_SIZE,
            indices_fn=lambda epoch, n=len(ds): distributed_indices(
                n, rank, world, shuffle=False
            ),
            num_workers=config.DATA.NUM_WORKERS,
        )

    return train_loader, _eval_loader(df_val), _eval_loader(df_test), class_weights


def get_fewshots_dataloaders(
    config: Any,
) -> Tuple[ThreadedLoader, ThreadedLoader, ThreadedLoader, Optional[np.ndarray]]:
    """Few-shot loaders: k samples per class with replacement
    (reference: datasets.py:364-477)."""
    rank, world = _process_info()
    class_idx, df_train, df_val, df_test = _label_dicts(config)

    k = config.DATA.FEW_SHOTS
    df_train = (
        df_train.groupby(config.TRAIN.LABEL_NAME)
        .sample(n=k, replace=True, random_state=config.SEED)
        .reset_index(drop=True)
    )

    def _dict(df) -> Dict[str, int]:
        return dict(zip(df["img_path"], df.iloc[:, class_idx]))

    def _loader(df, shuffle: bool) -> ThreadedLoader:
        ds = FinetuneDataset(
            config, list(df["img_path"]), _dict(df), config.DATA.CACHE_DIR
        )
        return ThreadedLoader(
            ds,
            batch_size=config.DATA.BATCH_SIZE,
            indices_fn=lambda epoch, n=len(ds): distributed_indices(
                n, rank, world, shuffle=shuffle, seed=config.SEED, epoch=epoch
            ),
            num_workers=config.DATA.NUM_WORKERS,
        )

    return _loader(df_train, True), _loader(df_val, False), _loader(df_test, False), None
