"""tools/serve_features: HTTP embedding server + micro-batcher.

The serving wrapper must produce EXACTLY the pipeline's embeddings (same
FeatureExtractor the notebooks/parity tests drive — SURVEY.md §3.4) while
coalescing concurrent requests into shared device forwards.
"""

import http.client
import json
import threading

import numpy as np
import pytest

from headct_foundation_tpu.data.nifti import save_nifti
from headct_foundation_tpu.feature_extraction import FeatureExtractor
from tools.serve_features import MicroBatcher, build_server

HIDDEN = 48


@pytest.fixture(scope="module")
def extractor():
    return FeatureExtractor(
        img_size=24, patch_size=12, in_chans=1, hidden_size=HIDDEN,
        mlp_dim=96, num_layers=2, num_heads=4,
    )


def _tiny_scan(tmp_path, name="scan.nii.gz"):
    vol = (np.random.RandomState(0).rand(30, 28, 26) * 80).astype(np.float32)
    p = str(tmp_path / name)
    save_nifti(p, vol, np.diag([1.0, 1.0, 1.0, 1.0]))
    return p, vol


def test_microbatcher_coalesces_and_matches_direct(extractor):
    """Concurrent submits share device forwards, and batched embeddings
    equal the direct (unbatched) pipeline output."""
    batcher = MicroBatcher(extractor, max_batch=4, window_ms=150.0)
    try:
        vols = [
            np.random.RandomState(i).rand(1, 24, 24, 24).astype(np.float32)
            for i in range(4)
        ]
        results = [None] * 4

        def _hit(i):
            results[i] = batcher.submit(vols[i])

        threads = [threading.Thread(target=_hit, args=(i,)) for i in range(4)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()

        # fewer device forwards than requests = coalescing happened
        assert batcher.requests == 4
        assert batcher.batches < 4, (batcher.batches, batcher.requests)
        for i, (emb, batched_with) in enumerate(results):
            assert emb.shape == (HIDDEN,)
            assert 1 <= batched_with <= 4
            direct = extractor.cls_embedding(vols[i][None])[0]
            np.testing.assert_allclose(emb, direct, rtol=2e-5, atol=2e-5)
    finally:
        batcher.close()


def test_http_embed_endpoint(extractor, tmp_path):
    """POST /embed with gzipped NIfTI bytes returns the pipeline embedding;
    /healthz reports the model; bad requests get 4xx not a wedged server."""
    server, batcher = build_server(extractor, host="127.0.0.1", port=0,
                                   max_batch=2, window_ms=2.0)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        path, _ = _tiny_scan(tmp_path)
        with open(path, "rb") as f:
            blob = f.read()

        conn = http.client.HTTPConnection("127.0.0.1", port, timeout=120)
        conn.request("GET", "/healthz")
        health = json.loads(conn.getresponse().read())
        assert health["ok"] and health["hidden"] == HIDDEN

        conn.request("POST", "/embed", body=blob)
        resp = conn.getresponse()
        assert resp.status == 200
        out = json.loads(resp.read())
        assert len(out["embedding"]) == HIDDEN
        assert np.isfinite(out["embedding"]).all()

        # same scan through the library directly -> identical embedding
        want = extractor.cls_embedding(
            np.asarray(extractor.preprocess(path))[None]
        )[0]
        np.testing.assert_allclose(out["embedding"], want, rtol=2e-5, atol=2e-5)

        # empty body -> 400; garbage body -> 500; server keeps serving
        conn.request("POST", "/embed", body=b"")
        resp = conn.getresponse()
        resp.read()  # keep-alive: drain before reusing the connection
        assert resp.status == 400
        conn.request("POST", "/embed", body=b"not a nifti at all")
        resp = conn.getresponse()
        assert resp.status == 500
        assert "error" in json.loads(resp.read())
        conn.request("GET", "/healthz")
        assert json.loads(conn.getresponse().read())["ok"]
        conn.close()
    finally:
        server.shutdown()
        batcher.close()
