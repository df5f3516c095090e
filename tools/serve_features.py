"""Production embedding server: NIfTI bytes in, CLS embeddings out.

The reference exposes feature extraction only as notebook cells
(SURVEY.md §3.4, notebook cells 7-12: load checkpoint -> preprocess ->
forward -> take CLS). This tool wraps the same pipeline —
``FeatureExtractor`` with on-device preprocessing — as a long-lived HTTP
service suitable for deployment behind a load balancer:

* the model is loaded and jitted ONCE at startup (first-request compile is
  absorbed by a warmup forward);
* request handler threads run the host side (gzip decode parallelizes
  across concurrent requests; the C++ decoder drops the GIL) and the
  on-device preprocess dispatch;
* a single dispatcher thread MICRO-BATCHES concurrent requests into one
  fixed-shape device forward (pad-to-max-batch keeps exactly one compiled
  executable), so throughput under load scales with the MXU batch dimension
  instead of serializing per-request forwards.

Endpoints:
  GET  /healthz       -> {"ok": true, "backend": ..., "hidden": ...}
  POST /embed         -> body: .nii.gz or .nii bytes
                         response: {"embedding": [hidden floats],
                                    "ms": total, "batched_with": n}

Usage:
  python tools/serve_features.py --checkpoint model.pt --port 8476
  curl -s --data-binary @scan.nii.gz localhost:8476/embed | jq .embedding
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class MicroBatcher:
    """Coalesce concurrent single-volume requests into one device forward.

    ``submit`` blocks the calling handler thread until its embedding is
    ready. The dispatcher waits up to ``window_ms`` after the first queued
    request for stragglers (bounded by ``max_batch``), stacks them, pads to
    the fixed ``max_batch`` shape — ONE compiled executable for every load
    level — and fans the CLS rows back out.
    """

    def __init__(self, extractor, max_batch: int = 8, window_ms: float = 5.0):
        self.extractor = extractor
        self.max_batch = max_batch
        self.window_s = window_ms / 1e3
        self._lock = threading.Lock()
        self._queue = []  # [(volume, slot)]
        self._wakeup = threading.Event()
        self._stop = False
        self.batches = 0
        self.requests = 0
        self._thread = threading.Thread(target=self._run, daemon=True,
                                        name="headct-batcher")
        self._thread.start()

    def submit(self, volume):
        slot = {"event": threading.Event()}
        with self._lock:
            self._queue.append((volume, slot))
        self._wakeup.set()
        slot["event"].wait()
        if "error" in slot:
            raise slot["error"]
        return slot["embedding"], slot["batched_with"]

    def close(self):
        self._stop = True
        self._wakeup.set()
        self._thread.join(timeout=5)

    def _run(self):
        import jax
        import jax.numpy as jnp

        while not self._stop:
            self._wakeup.wait()
            if self._stop:
                return
            # linger for stragglers: batch whatever arrives inside the window
            deadline = time.monotonic() + self.window_s
            while time.monotonic() < deadline:
                with self._lock:
                    if len(self._queue) >= self.max_batch:
                        break
                time.sleep(self.window_s / 5)
            with self._lock:
                batch, self._queue = (
                    self._queue[: self.max_batch],
                    self._queue[self.max_batch:],
                )
                if not self._queue:
                    self._wakeup.clear()
            if not batch:
                continue
            try:
                vols = jnp.stack([jnp.asarray(v) for v, _ in batch])
                n = len(batch)
                if n < self.max_batch:  # keep the compiled shape fixed
                    vols = jnp.concatenate(
                        [vols, jnp.repeat(vols[-1:], self.max_batch - n, 0)]
                    )
                out, _ = self.extractor(vols)
                cls = np.asarray(out[:n, 0, :], dtype=np.float32)
                self.batches += 1
                self.requests += n
                for i, (_, slot) in enumerate(batch):
                    slot["embedding"] = cls[i]
                    slot["batched_with"] = n
                    slot["event"].set()
            except Exception as e:  # surface to every waiting handler
                for _, slot in batch:
                    slot["error"] = e
                    slot["event"].set()


def make_handler(extractor, batcher):
    import jax

    backend = jax.default_backend()

    class Handler(BaseHTTPRequestHandler):
        protocol_version = "HTTP/1.1"

        def _json(self, code: int, payload: dict):
            body = json.dumps(payload).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def log_message(self, fmt, *args):  # quiet per-request stderr spam
            pass

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {
                    "ok": True,
                    "backend": backend,
                    "hidden": int(extractor.model.hidden_size),
                    "batches": batcher.batches,
                    "requests": batcher.requests,
                })
            else:
                self._json(404, {"error": "unknown path"})

        def do_POST(self):
            if self.path != "/embed":
                self._json(404, {"error": "unknown path"})
                return
            t0 = time.monotonic()
            try:
                length = int(self.headers.get("Content-Length", 0))
                if length <= 0:
                    self._json(400, {"error": "empty body"})
                    return
                blob = self.rfile.read(length)
                suffix = ".nii.gz" if blob[:2] == b"\x1f\x8b" else ".nii"
                # the decode paths (native C++ / python / device) are all
                # path-based; a tmpfile write is ~1 ms vs the ~200 ms decode
                fd, path = tempfile.mkstemp(suffix=suffix)
                try:
                    with os.fdopen(fd, "wb") as f:
                        f.write(blob)
                    vol = extractor.preprocess(path)
                finally:
                    os.unlink(path)
                emb, batched_with = batcher.submit(vol)
            except Exception as e:
                self._json(500, {"error": f"{type(e).__name__}: {e}"})
                return
            self._json(200, {
                "embedding": [float(x) for x in emb],
                "ms": round((time.monotonic() - t0) * 1e3, 1),
                "batched_with": batched_with,
            })

    return Handler


def build_server(extractor, host: str = "127.0.0.1", port: int = 8476,
                 max_batch: int = 8, window_ms: float = 5.0):
    """Returns (ThreadingHTTPServer, MicroBatcher) — caller runs
    serve_forever (the CLI) or drives it from a thread (tests)."""
    batcher = MicroBatcher(extractor, max_batch=max_batch, window_ms=window_ms)
    server = ThreadingHTTPServer((host, port),
                                 make_handler(extractor, batcher))
    return server, batcher


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", default=None,
                    help=".pt / .ckpt to load (random init if omitted)")
    ap.add_argument("--host", default="0.0.0.0")
    ap.add_argument("--port", type=int, default=8476)
    ap.add_argument("--max-batch", type=int, default=8)
    ap.add_argument("--window-ms", type=float, default=5.0)
    ap.add_argument("--img-size", type=int, default=96)
    ap.add_argument("--in-chans", type=int, default=3)
    ap.add_argument(
        "--warm-scan", action="append", default=[], metavar="HxWxD[@sx,sy,sz]",
        help="pre-compile the on-device preprocess for this raw scan shape "
        "and voxel spacing in mm (repeatable, e.g. --warm-scan 512x512x40 "
        "--warm-scan 220x220x140@0.5,0.5,1.0; spacing defaults to "
        "0.5,0.5,1.0). The compile bucket depends on BOTH shape and spacing "
        "(the resample operator's output size) — match your scanner's; "
        "without it the first request per bucket pays the preprocess "
        "compile (~minutes on a remote-attached chip)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.feature_extraction import FeatureExtractor

    extractor = FeatureExtractor(
        checkpoint_path=args.checkpoint, img_size=args.img_size,
        in_chans=args.in_chans,
    )
    # absorb the forward compile before accepting traffic
    warm = jnp.zeros(
        (args.max_batch, args.in_chans) + (args.img_size,) * 3, jnp.float32
    )
    out, _ = extractor(warm)
    out.block_until_ready()
    for spec in args.warm_scan:
        spec_l = spec.lower()
        spacing = (0.5, 0.5, 1.0)
        if "@" in spec_l:
            spec_l, sp = spec_l.split("@", 1)
            spacing = tuple(float(v) for v in sp.split(","))
            assert len(spacing) == 3, f"--warm-scan {spec}: expected sx,sy,sz"
        shape = tuple(int(s) for s in spec_l.split("x"))
        assert len(shape) == 3, f"--warm-scan {spec}: expected HxWxD"
        from headct_foundation_tpu.data.nifti import save_nifti

        t0 = time.monotonic()
        fd, path = tempfile.mkstemp(suffix=".nii")
        try:
            with os.fdopen(fd, "wb"):
                pass
            save_nifti(path, np.zeros(shape, np.float32),
                       np.diag(spacing + (1.0,)))
            # fence the PREPROCESS only: the serving forward always runs at
            # the padded max_batch shape already compiled above — a batch-1
            # forward here would compile a second, never-used executable
            import jax as _jax

            _jax.block_until_ready(extractor.preprocess(path))
        finally:
            os.unlink(path)
        print(f"warmed preprocess for {shape} @ {spacing} mm "
              f"({time.monotonic() - t0:.1f}s)")
    server, _ = build_server(extractor, args.host, args.port,
                             args.max_batch, args.window_ms)
    print(f"serving on {args.host}:{args.port} "
          f"(backend={jax.default_backend()}, max_batch={args.max_batch})")
    server.serve_forever()


if __name__ == "__main__":
    main()
