"""Offline preprocessing cache builder.

Equivalent of the reference's ``cpu_caching.py`` + ``run_cache_data.py``
(reference: cpu_caching.py:13-65, run_cache_data.py:6-29), which shard a scan
manifest into Slurm CPU array jobs that materialize the MONAI
PersistentDataset cache. Here a single multi-threaded process (or N shard
invocations on any scheduler) materializes the .npy DiskCache used by the
datasets.

Usage:
  python tools/build_cache.py --csv manifest.csv --cache-dir cache/mae_cache \
      [--roi 96] [--in-chans 3] [--shard 0 --num-shards 10] [--workers 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd

from headct_foundation_tpu.data.datasets import DiskCache, PackedCacheWriter


def _respect_platform_env():
    try:
        from headct_foundation_tpu.parallel.mesh import respect_jax_platforms_env

        respect_jax_platforms_env()
    except Exception:
        pass


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--csv", required=True, help="manifest with img_path column")
    ap.add_argument("--cache-dir", required=True)
    ap.add_argument("--roi", type=int, default=96)
    ap.add_argument("--in-chans", type=int, default=3)
    ap.add_argument("--shard", type=int, default=0)
    ap.add_argument("--num-shards", type=int, default=1)
    ap.add_argument("--workers", type=int, default=os.cpu_count() or 8)
    ap.add_argument("--device", action="store_true",
                    help="preprocess on the attached TPU (on-device cubic "
                         "resample/window/resize; sets HEADCT_DEVICE_CACHE=1)")
    ap.add_argument("--packed", action="store_true",
                    help="also write the packed shard format (memmapped "
                         "pack_*.bin + pack_index*.json): the steady-state "
                         "loader then does zero per-volume file opens")
    ap.add_argument("--volumes-per-shard", type=int, default=512)
    ap.add_argument("--wire", choices=("windowed", "hu16", "hu8"),
                    default="windowed",
                    help="cache tensor format: 'windowed' fp16 [C, roi] "
                         "(reference parity); 'hu16' int16 [1, roi] "
                         "fixed-point HU (3x fewer wire bytes; the engines "
                         "window on device — set DATA.WIRE_FORMAT: hu16); "
                         "'hu8' uint8 companded HU (6x, opt-in lossy — see "
                         "data/transforms.py hu8 notes)")
    args = ap.parse_args()
    if args.device:
        os.environ["HEADCT_DEVICE_CACHE"] = "1"

    paths = list(pd.read_csv(args.csv)["img_path"])[args.shard :: args.num_shards]
    cache = DiskCache(args.cache_dir, (args.roi,) * 3, args.in_chans,
                      wire=args.wire)

    done = 0
    errors = 0
    t0 = time.time()

    def _one(path: str):
        try:
            return path, cache.load(path)
        except Exception as e:
            print(f"ERROR {path}: {e}", file=sys.stderr)
            return path, None

    packer = None
    if args.packed:
        # one shard series per manifest shard: rank-parallel builds merge at
        # read time via their pack_index<tag>.json files
        tag = f"r{args.shard}_" if args.num_shards > 1 else ""
        import numpy as _np

        packer = PackedCacheWriter(
            args.cache_dir, cache.wire_shape,
            volumes_per_shard=args.volumes_per_shard, tag=tag,
            dtype={"hu16": _np.int16, "hu8": _np.uint8}.get(
                args.wire, _np.float16
            ),
        )
        # incremental rebuild: entries carried over from an existing
        # same-tag index are already packed — don't re-copy them
        before = len(paths)
        paths = [p for p in paths if cache._key(p) not in packer.entries]
        if before != len(paths):
            print(f"skipping {before - len(paths)} already-packed volumes")

    # Sliding window instead of pool.map: map() submits every path up front
    # and buffers each completed result (a full preprocessed volume) until
    # the single-threaded packer consumes it — on a large manifest with fast
    # cache-hit loads that backlog grows without bound. The window caps
    # in-flight volumes at ~4x the worker count.
    from collections import deque

    window = max(2 * args.workers, 8)
    with ThreadPoolExecutor(max_workers=args.workers) as pool:
        path_iter = iter(paths)
        futures = deque()

        def _top_up():
            while len(futures) < window:
                p = next(path_iter, None)
                if p is None:
                    return
                futures.append(pool.submit(_one, p))

        _top_up()
        while futures:
            path, vol = futures.popleft().result()
            _top_up()
            done += 1
            if vol is None:
                errors += 1
            elif packer is not None:
                packer.add(cache._key(path), vol)  # writer thread = this one
            if done % 100 == 0:
                rate = done / (time.time() - t0)
                print(f"[{done}/{len(paths)}] {rate:.1f} scans/s, {errors} errors")

    if packer is not None:
        packer.close()
        print(f"packed index: {len(packer.entries)} volumes, "
              f"{len(packer.shard_counts)} shards")
    print(f"done: {done} scans, {errors} errors, {time.time() - t0:.0f}s")


if __name__ == "__main__":
    _respect_platform_env()
    main()
