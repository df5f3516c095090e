"""Benchmark: MAE 3D pretrain step throughput in volumes/sec/chip.

Runs the flagship config (ViT-B 3D, 96^3, patch 12, 3-channel, mask 0.75 —
configs/mae/mae_HeadCT.yaml) full training step on the available chip(s) and
prints ONE JSON line whose headline is the compute-only step rate and whose
``loader_in_loop`` object is the sustained cache-hit number with its
bottleneck decomposition (input_wait fraction, host-loader rate vs worker
count on the packed cache, measured H2D bandwidth):

  {"metric": ..., "value": N, "unit": "volumes/s/chip", "vs_baseline": N/B,
   "loader_in_loop": {"value": ..., "input_wait_frac": ..., ...}}

Baseline B = 3.1 volumes/s/GPU — the reference's measured pretrain step
throughput on A100s (BASELINE.md: DINO run wandb summary; the reference
publishes no MAE step time, this is its only measured pretrain throughput).

Compute-only measurement method: K sequential train steps are chained inside
ONE jitted ``lax.scan`` and the per-step losses are fetched by value. A
single dispatch + single value fetch amortizes the remote-relay round trip
across K steps, and fetching actual loss values defeats the relay's
unreliable async-completion signals (block_until_ready can return before the
chain finishes). The scan carries a true sequential dependency (state_k
feeds step k+1), so XLA cannot skip or overlap steps.

The loader-in-the-loop mode replays the production input path at cache-hit
steady state — the same state the reference trains in after MONAI
PersistentDataset materializes (reference: src/data/datasets.py:42-46,
115-120): packed memmapped DiskCache -> ThreadedLoader pool ->
DevicePrefetcher (H2D under compute) -> the jitted train step WITH on-device
augmentation.

Flags: --compute-only | --with-loader (each alone), --feature-latency,
--feature-throughput; default runs compute + loader and prints the combined
line.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

REFERENCE_VOLS_PER_SEC_PER_CHIP = 3.1  # BASELINE.md, 4xA100 DINO run

# Per-chip batch size. 32 volumes of 96^3 x 3ch bf16 activations fit
# comfortably in v5e 16 GB HBM alongside the 151M-param model + AdamW state.
BATCH_PER_CHIP = 32
# 30 steps per timed dispatch: the timed window holds ONE dispatch RTT and
# ONE value-fetch RTT over the (possibly WAN-tunneled) relay — at 10 steps a
# 100-300 ms relay round trip inflated the step time by up to 23% and swung
# readings with relay weather; 30 amortizes it to <8%.
SCAN_STEPS = 30
MEASURE_RUNS = 3


def _flagship_config():
    from headct_foundation_tpu.config import default_config

    cfg = default_config()
    cfg_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "configs/mae/mae_HeadCT.yaml")
    if os.path.exists(cfg_path):
        cfg.merge_from_file(cfg_path)
    else:
        cfg.MAE.PATCH_SIZE = 12
        cfg.MAE.USE_BIAS = True
    cfg.TRAIN.GRAD_CLIP = 0.0  # matches mae_HeadCT.yaml recipe
    # Production wire format: 1-ch int16 HU over the wire, window stack on
    # device inside the step (3x fewer H2D bytes than fp16 x 3ch — the
    # shipped path per the BASELINE north star). Override with
    # `--set DATA.WIRE_FORMAT windowed` to bench the parity format.
    cfg.DATA.WIRE_FORMAT = "hu16"
    # A/B experiment overrides: `--set KEY VALUE [KEY VALUE ...]`
    if "--set" in sys.argv:
        pairs = sys.argv[sys.argv.index("--set") + 1 :]
        for stop, tok in enumerate(pairs):  # other flags end the pair list
            if tok.startswith("--"):
                pairs = pairs[:stop]
                break
        if len(pairs) % 2:
            raise SystemExit(f"--set needs KEY VALUE pairs, got {pairs}")
        cfg.merge_from_list(pairs)
    return cfg


def _wire_batch(cfg, n: int) -> np.ndarray:
    """A batch in the production WIRE format — what the packed cache ships
    and DevicePrefetcher puts on device. 'windowed': [B, C, roi] fp16 in
    [0, 1]. 'hu16': [B, 1, roi] int16 HU (the step windows on device)."""
    rng = np.random.RandomState(0)
    roi = tuple(cfg.MODEL.ROI)
    if str(getattr(cfg.DATA, "WIRE_FORMAT", "windowed")) == "hu16":
        return rng.randint(-1000, 2800, size=(n, 1) + roi).astype(np.int16)
    return rng.rand(n, cfg.MAE.IN_CHANS, *roi).astype(np.float16)


def compute_only() -> dict:
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import batch_sharding, make_mesh, shard_batch

    cfg = _flagship_config()
    n_chips = len(jax.devices())
    mesh = make_mesh(data=n_chips)
    rng = jax.random.PRNGKey(42)

    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=10_000, num_warmup_steps=100
    )
    # THE production step object (main_pretrain_mae.py trains with
    # make_train_step(mesh, augment=True, config=cfg)) — unjitted here so K
    # steps chain inside one lax.scan (single dispatch + single value fetch
    # amortize the remote-relay RTT; the carried state forces true
    # sequential execution). The per-step math, including the on-device
    # augmentation and the wire-dtype cast, is exactly what training runs.
    step_fn = mae_engine.make_train_step(mesh, augment=True, config=cfg, jit=False)

    def multi_step(state, batch, rng):
        def body(st, _):
            st, metrics = step_fn(st, batch, rng)
            return st, metrics["loss"]

        return jax.lax.scan(body, state, None, length=SCAN_STEPS)

    multi_step = jax.jit(
        multi_step, in_shardings=(None, batch_sharding(mesh), None),
        donate_argnums=(0,),
    )

    # batch in the production wire dtype (what the packed cache ships)
    batch_np = _wire_batch(cfg, BATCH_PER_CHIP * n_chips)
    batch, _ = shard_batch(batch_np, mesh)

    # compile + warmup run
    state, losses = multi_step(state, batch, rng)
    jax.device_get(losses)

    best_dt = float("inf")
    for _ in range(MEASURE_RUNS):
        t0 = time.perf_counter()
        state, losses = multi_step(state, batch, rng)
        final_loss = float(np.asarray(jax.device_get(losses))[-1])
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert np.isfinite(final_loss), final_loss

    vols_per_sec_per_chip = BATCH_PER_CHIP * SCAN_STEPS / best_dt
    return {
        "metric": "volumes/sec/chip (MAE 3D pretrain step)",
        "value": round(vols_per_sec_per_chip, 2),
        "unit": "volumes/s/chip",
        "vs_baseline": round(
            vols_per_sec_per_chip / REFERENCE_VOLS_PER_SEC_PER_CHIP, 2
        ),
        # the headline measures the hu16 production path (window stack on
        # device inside the step); `--set DATA.WIRE_FORMAT windowed` benches
        # the reference-training-parity format (ADVICE r4: make the
        # non-default wire choice visible in the artifact itself)
        "wire_format": str(cfg.DATA.WIRE_FORMAT),
    }


def model_only() -> dict:
    """The r1-r3 headline: a hand-rolled model-only loss loop (no on-device
    augmentation, no wire-dtype cast — fp32 batch into the bf16 model).
    Kept verbatim from the round-3 bench so the cross-round trend in
    BENCH_r*.json stays interpretable next to the production-step headline
    (VERDICT r4: the r3->r4 redefinition read as a regression without it)."""
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import batch_sharding, make_mesh

    cfg = _flagship_config()
    n_chips = len(jax.devices())
    mesh = make_mesh(data=n_chips)
    rng = jax.random.PRNGKey(42)

    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=10_000, num_warmup_steps=100
    )

    def multi_step(state, batch, rng):
        def body(st, _):
            step_rng = jax.random.fold_in(rng, st.step)
            mask_rng, drop_rng = jax.random.split(step_rng)

            def loss_fn(params):
                loss, _, _ = st.apply_fn(
                    {"params": params}, batch, deterministic=False,
                    rngs={"mask": mask_rng, "dropout": drop_rng},
                )
                return loss

            loss, grads = jax.value_and_grad(loss_fn)(st.params)
            return st.apply_gradients(grads=grads), loss

        return jax.lax.scan(body, state, None, length=SCAN_STEPS)

    multi_step = jax.jit(
        multi_step, in_shardings=(None, batch_sharding(mesh), None),
        donate_argnums=(0,),
    )
    batch_np = np.random.RandomState(0).randn(
        BATCH_PER_CHIP * n_chips, cfg.MAE.IN_CHANS, 96, 96, 96
    ).astype(np.float32)
    batch = mae_engine._to_device_batch(batch_np, mesh)

    state, losses = multi_step(state, batch, rng)  # compile + warmup
    jax.device_get(losses)
    best_dt = float("inf")
    for _ in range(MEASURE_RUNS):
        t0 = time.perf_counter()
        state, losses = multi_step(state, batch, rng)
        final_loss = float(np.asarray(jax.device_get(losses))[-1])
        best_dt = min(best_dt, time.perf_counter() - t0)
    assert np.isfinite(final_loss), final_loss
    v = BATCH_PER_CHIP * SCAN_STEPS / best_dt
    return {
        "value": round(v, 2),
        "unit": "volumes/s/chip",
        "note": "r1-r3-comparable hand-rolled loss loop (no augment/wire cast)",
    }


def with_loader(epochs: int = 4, warm_epochs: int = 1,
                steps_per_epoch: int = 8) -> dict:
    """Sustained loader-in-the-loop MAE throughput on the PACKED cache."""
    import shutil
    import tempfile

    import pandas as pd

    from headct_foundation_tpu.data.datasets import (
        DiskCache, PackedCacheWriter, PretrainDataset, ThreadedLoader,
        distributed_indices,
    )
    from headct_foundation_tpu.data.pipeline import DevicePrefetcher
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = _flagship_config()
    wire = str(cfg.DATA.WIRE_FORMAT)
    n_chips = len(jax.devices())
    batch = BATCH_PER_CHIP * n_chips
    n_files = steps_per_epoch * batch  # distinct volumes per epoch
    tmpd = tempfile.mkdtemp(prefix="headct_bench_cache_")
    try:
        roi = (96, 96, 96)
        cache = DiskCache(tmpd, roi, cfg.MAE.IN_CHANS, wire=wire)
        rng_np = np.random.RandomState(0)
        paths = [f"/synthetic/vol{i:05d}.nii.gz" for i in range(n_files)]
        # pre-populate the PACKED cache in the wire format: steady state =
        # 100% packed hits
        wire_dtype = np.int16 if wire == "hu16" else np.float16
        with PackedCacheWriter(tmpd, cache.wire_shape, dtype=wire_dtype) as w:
            for p in paths:
                if wire == "hu16":
                    vol = rng_np.randint(
                        -8000, 20000, size=cache.wire_shape
                    ).astype(np.int16)
                else:
                    vol = rng_np.rand(*cache.wire_shape).astype(np.float16)
                w.add(cache._key(p), vol)
        csv_path = os.path.join(tmpd, "manifest.csv")
        pd.DataFrame({"img_path": paths}).to_csv(csv_path, index=False)

        def _loader(workers):
            return ThreadedLoader(
                PretrainDataset(cfg, csv_path, cache_dir=tmpd),
                batch_size=batch,
                indices_fn=lambda epoch, n=n_files: distributed_indices(
                    n, 0, 1, shuffle=False
                ),
                num_workers=workers,
            )

        def _h2d_probe():
            """H2D roofline probe via the SAME path the production
            DevicePrefetcher ships batches through — chunked concurrent
            puts (VERDICT r4: a single blocking device_put probed 7.4
            vol/s while the chunked pipeline achieved 9.35; a roofline the
            workload beats isn't a roofline). Best of 3."""
            from headct_foundation_tpu.data.pipeline import (
                DevicePrefetcher,
                chunked_device_put,
            )

            probe = _wire_batch(cfg, batch)
            best = float("inf")
            for _ in range(3):
                tp = time.perf_counter()
                jax.block_until_ready(
                    chunked_device_put(probe, DevicePrefetcher.CHUNK_BYTES)
                )
                best = min(best, time.perf_counter() - tp)
            return probe.nbytes / 1e6 / best, batch / best / n_chips

        # host-only loader throughput (packed cache -> threads -> collation,
        # no device) vs worker count: separates the input pipeline itself
        # from the H2D transport in the report. 4/8/16 requested workers all
        # self-cap to 4x cores; ONE uncapped 16-worker datapoint alongside
        # demonstrates the cap's rightness per-round on this host instead of
        # from the one measurement that set it (VERDICT r4 ask #8).
        host_rates = {}
        effective_workers = {}
        for workers in (4, 16, "16_uncapped"):
            if workers == "16_uncapped":
                prev = os.environ.get("HEADCT_LOADER_MAX_WORKERS")
                os.environ["HEADCT_LOADER_MAX_WORKERS"] = "16"
                try:
                    loader = _loader(16)
                finally:
                    if prev is None:
                        os.environ.pop("HEADCT_LOADER_MAX_WORKERS", None)
                    else:
                        os.environ["HEADCT_LOADER_MAX_WORKERS"] = prev
            else:
                loader = _loader(workers)
            # ThreadedLoader self-caps at 4 threads/core (measured: beyond
            # that only GIL thrash + variance) — report what actually ran
            effective_workers[workers] = loader.num_workers
            loader.set_epoch(0)
            for _ in loader:  # warm the page cache / pool
                pass
            # Time MULTIPLE epochs: the pool's cross-epoch lookahead means a
            # single epoch can be served partly from batches prefetched
            # before the clock starts (one round measured 431 vol/s on a
            # 1-core host that way); a 3-epoch window amortizes the
            # pre-buffered head into the steady-state rate.
            th0 = time.perf_counter()
            host_batches = 0
            for ep in range(1, 4):
                loader.set_epoch(ep)
                host_batches += sum(1 for _ in loader)
            host_rates[workers] = round(
                host_batches * batch / (time.perf_counter() - th0), 1
            )
            loader.close()

        # relay H2D varies minute-to-minute: probe BEFORE and AFTER the
        # timed region, report both; the roofline fraction uses the max
        h2d_pre_mbps, h2d_pre_bound = _h2d_probe()

        loader = _loader(8)
        mesh = make_mesh(data=n_chips)
        rng = jax.random.PRNGKey(42)
        state, _, _ = mae_engine.create_train_state(
            cfg, mesh, rng, total_steps=10_000, num_warmup_steps=100
        )
        train_step = mae_engine.make_train_step(mesh, augment=True, config=cfg)

        flush = 8  # batched loss fetches, like the engine loop
        t0 = None
        timed_vols = 0
        input_wait_s = 0.0  # time the train loop spends waiting on input
        pending = []
        final_loss = float("nan")
        for epoch in range(epochs):
            loader.set_epoch(epoch)
            it = iter(DevicePrefetcher(loader, mesh, depth=3))
            while True:
                tw = time.perf_counter()
                try:
                    vols, _fnames = next(it)
                except StopIteration:
                    break
                if t0 is not None:
                    input_wait_s += time.perf_counter() - tw
                if len(pending) >= flush:
                    final_loss = float(np.asarray(jax.device_get(pending))[-1])
                    pending = []
                state, metrics = train_step(state, vols, rng)
                pending.append(metrics["loss"])
                if t0 is not None:
                    timed_vols += batch
            if epoch == warm_epochs - 1:
                if pending:  # drain before the timed region
                    jax.device_get(pending)
                    pending = []
                t0 = time.perf_counter()
        if pending:
            final_loss = float(np.asarray(jax.device_get(pending))[-1])
        dt = time.perf_counter() - t0
        assert np.isfinite(final_loss), final_loss
        loader.close()  # stop the epoch-lookahead before the cache dir goes away

        # H2D roofline probe (chunked, production path — see _h2d_probe):
        # on a remote-attached chip (tunnel) this is the hard ceiling on
        # loader-in-the-loop throughput; on a real TPU host DMA makes the
        # same transfer ~200x faster and fully hidden by the prefetcher.
        h2d_post_mbps, h2d_post_bound = _h2d_probe()
        h2d_bound = max(h2d_pre_bound, h2d_post_bound)

        vols_per_sec_per_chip = timed_vols / dt / n_chips
        return {
            "value": round(vols_per_sec_per_chip, 2),
            "unit": "volumes/s/chip",
            "vs_baseline": round(
                vols_per_sec_per_chip / REFERENCE_VOLS_PER_SEC_PER_CHIP, 2
            ),
            "input_wait_frac": round(input_wait_s / dt, 3),
            "host_loader_vols_per_s_by_workers": host_rates,
            "host_loader_effective_workers": effective_workers,
            "packed_cache": True,
            "wire_format": wire,
            "wire_MB_per_vol": round(
                float(np.prod(cache.wire_shape)) * wire_dtype().nbytes / 1e6, 2
            ),
            "h2d_MB_per_s": round(max(h2d_pre_mbps, h2d_post_mbps), 1),
            "h2d_MB_per_s_pre": round(h2d_pre_mbps, 1),
            "h2d_MB_per_s_post": round(h2d_post_mbps, 1),
            "h2d_bound_vols_per_s": round(h2d_bound, 2),
            # relay-invariant efficiency: fraction of the measured transport
            # roofline the sustained loader-in-the-loop number achieves
            # (VERDICT r4: README relay-window claims need an
            # artifact-backed, weather-independent form). Read it next to
            # h2d_probe_swing = max/min of the pre/post probes: a swing
            # near 1 means the roofline held through the run and the
            # fraction is meaningful; a large swing means the relay's
            # weather changed mid-run and the fraction under-states
            # efficiency (one observed run: pre 1611 MB/s, post 21 MB/s).
            "frac_of_h2d_roofline": round(
                vols_per_sec_per_chip / h2d_bound, 3
            ) if h2d_bound > 0 else None,
            "h2d_probe_swing": round(
                max(h2d_pre_mbps, h2d_post_mbps)
                / max(min(h2d_pre_mbps, h2d_post_mbps), 1e-9), 2
            ),
        }
    finally:
        shutil.rmtree(tmpd, ignore_errors=True)


def _make_extractor():
    from headct_foundation_tpu.feature_extraction import FeatureExtractor

    extractor = FeatureExtractor(
        img_size=96, patch_size=12, in_chans=3, hidden_size=768, mlp_dim=3072,
        num_layers=12, num_heads=12, pos_embed="sincos", qkv_bias=True,
        dtype=jnp.bfloat16,
    )
    # warm the compiled forward
    extractor.cls_embedding(np.zeros((1, 3, 96, 96, 96), np.float32))
    return extractor


def _synth_scans(tmp, n):
    from headct_foundation_tpu.data.nifti import save_nifti

    rng = np.random.RandomState(0)
    paths = []
    for i in range(n):
        # integral HU like real CT (exercises the lossless int16 transfer)
        vol = np.round(rng.rand(220, 220, 140) * 3000 - 1000).astype(np.float32)
        p = os.path.join(tmp, f"s{i}.nii.gz")
        save_nifti(p, vol, np.diag([0.5, 0.5, 1.25, 1.0]))  # realistic CT grid
        paths.append(p)
    return paths


def feature_latency() -> dict:
    """p50 per-scan feature-extract latency (BASELINE.json's second metric):
    synthetic NIfTI -> notebook-order preprocessing -> ViT-B CLS embedding.

    Decomposed per stage (VERDICT r4 ask #4) so a target miss is
    attributable inside the artifact itself:

    * ``decode_ms``   — host NIfTI decode + RAS orient (gzip-bound)
    * ``h2d_ms``      — raw-volume wire transfer, blocked to completion
    * ``device_ms``   — pure device compute for preprocess + ViT-B forward,
                        measured once via an 8-deep jitted chain with a data
                        dependency (amortizes the dispatch RTT away)
    * ``dispatch_fetch_ms`` — p50(total) - decode - h2d - device: the
                        per-scan dispatch + value-fetch round trips. On a
                        locally attached chip this is sub-ms; on this mount
                        it is the WAN-tunnel share of the latency."""
    import tempfile

    from headct_foundation_tpu.data.device_preprocess import DevicePreprocessor

    tmp = tempfile.mkdtemp()
    paths = _synth_scans(tmp, 12)
    extractor = _make_extractor()
    prep = DevicePreprocessor((96, 96, 96), 3)

    lat, decode_s, h2d_s = [], [], []
    for p in paths:
        t0 = time.perf_counter()
        # same stages DevicePreprocessor.__call__ runs, timed individually
        data, affine = prep._decode(p)
        t1 = time.perf_counter()
        vox = np.linalg.norm(affine[:3, :3], axis=0)
        padded, ops, outs = prep._ship(data, vox)
        jax.block_until_ready(padded)  # wire transfer completed HERE
        t2 = time.perf_counter()
        from headct_foundation_tpu.data.device_preprocess import _fused_preprocess

        vol = _fused_preprocess(padded, *ops, np.asarray(outs, np.int32),
                                prep.roi, prep.in_channels, prep.order)
        emb = extractor.cls_embedding(vol[None])
        float(np.asarray(emb).sum())  # force value
        t3 = time.perf_counter()
        decode_s.append(t1 - t0)
        h2d_s.append(t2 - t1)
        lat.append(t3 - t0)
    p50 = float(np.percentile(lat, 50))
    decode_p50 = float(np.percentile(decode_s, 50))
    h2d_p50 = float(np.percentile(h2d_s, 50))

    # pure device compute, dispatch-RTT-free: K chained (preprocess +
    # forward) iterations with a data dependency — the async dispatch queue
    # overlaps the per-call RTTs; one value fetch fences the chain
    K = 8
    data, affine = prep._decode(paths[0])
    vox = np.linalg.norm(affine[:3, :3], axis=0)
    padded, ops, outs = prep._ship(data, vox)
    jax.block_until_ready(padded)

    from headct_foundation_tpu.data.device_preprocess import _fused_preprocess

    def _once(x):
        vol = _fused_preprocess(x, *ops, np.asarray(outs, np.int32),
                                prep.roi, prep.in_channels, prep.order)
        out, _ = extractor(vol[None])
        return out[:, 0, :]

    def _chain(x):
        emb = None
        for k in range(K):
            # data dependency: each iteration perturbs the input by the
            # previous embedding's mean, so XLA cannot skip or parallelize
            emb = _once(x + (0.0 if emb is None else emb.mean() * 1e-6))
        return emb

    _chain(padded).block_until_ready()  # compile
    tbest = float("inf")
    for _ in range(3):
        tc = time.perf_counter()
        float(np.asarray(_chain(padded)).sum())  # value fetch fence
        tbest = min(tbest, time.perf_counter() - tc)
    device_ms = tbest / K * 1e3

    return {
        "metric": "p50 per-scan feature-extract latency",
        "value": round(p50 * 1e3, 1),
        "unit": "ms",
        "vs_baseline": None,
        "decomposition_ms": {
            "decode": round(decode_p50 * 1e3, 1),
            "h2d": round(h2d_p50 * 1e3, 1),
            "device": round(device_ms, 1),
            "dispatch_fetch": round(
                (p50 - decode_p50 - h2d_p50) * 1e3 - device_ms, 1
            ),
        },
    }


def feature_throughput() -> None:
    """Batched feature-extraction rate (scans/s): decode/preprocess of scan
    i+1 overlapped with scan i's device forward via the pipelined
    extract_from_files."""
    import tempfile

    tmp = tempfile.mkdtemp()
    n = 16
    paths = _synth_scans(tmp, n)
    extractor = _make_extractor()

    # warm with the SAME batch size as the measured pass: the padded forward
    # compiles per batch shape, and a B=4 ViT-B compile inside the timed
    # window would be measured as throughput (observed: 0.98 vs the real
    # ~2.5-2.8 scans/s steady state)
    extractor.extract_from_files(paths[:4], batch_size=4)
    t0 = time.perf_counter()
    feats = extractor.extract_from_files(paths, batch_size=4)
    dt = time.perf_counter() - t0
    assert feats.shape[0] == n

    # Decompose the bound: each scan ships raw int16 over the tunnel
    # (220x220x140 x 2 B = 13.5 MB). Probe the H2D bandwidth RIGHT NOW
    # (it varies minute-to-minute on this mount, ROUND_NOTES) so the
    # scans/s number can be read against its transport ceiling.
    probe = np.zeros((220, 220, 140), np.int16)
    bws = []
    for _ in range(3):
        t1 = time.perf_counter()
        jax.block_until_ready(jnp.asarray(probe))
        bws.append(probe.nbytes / (time.perf_counter() - t1))
    h2d = max(bws)
    bound = h2d / probe.nbytes  # scans/s if transport were the only stage
    print(
        json.dumps(
            {
                "metric": "feature-extraction throughput (batched)",
                "value": round(n / dt, 2),
                "unit": "scans/s",
                "vs_baseline": None,
                "h2d_MB_per_s": round(h2d / 1e6, 1),
                "transport_bound_scans_per_s": round(bound, 2),
                "frac_of_transport_bound": round(n / dt / bound, 3),
            }
        )
    )


def _bounded_first_contact(deadline_s: float = 900.0) -> None:
    """Bound the first device contact so an unreachable remote-TPU relay
    cannot hang the bench forever (the relay's availability varies; a dead
    tunnel turns ``jax.devices()`` into an indefinite reconnect loop). On
    timeout, emit a diagnostic JSON line and exit nonzero so the driver
    records the failure instead of stalling."""
    import threading

    done = threading.Event()

    # label the failure with the metric this invocation would have produced
    if "--feature-latency" in sys.argv:
        metric, unit = "feature-extraction p50 latency", "ms/scan"
    elif "--feature-throughput" in sys.argv:
        metric, unit = "feature-extraction throughput (batched)", "scans/s"
    elif "--with-loader" in sys.argv:
        metric, unit = ("volumes/sec/chip (MAE pretrain, loader-in-the-loop)",
                        "volumes/s/chip")
    else:
        metric, unit = ("volumes/sec/chip (MAE 3D pretrain step)",
                        "volumes/s/chip")

    def _watch():
        if not done.wait(deadline_s):
            print(json.dumps({
                "metric": metric,
                "value": None,
                "unit": unit,
                "vs_baseline": None,
                "error": f"device backend unreachable after {deadline_s:.0f}s",
            }), flush=True)
            os._exit(2)

    threading.Thread(target=_watch, daemon=True).start()
    try:
        jax.devices()
        x = jnp.ones((8, 8))
        jax.block_until_ready(x @ x)
    finally:
        done.set()


if __name__ == "__main__":
    _bounded_first_contact()
    if "--feature-latency" in sys.argv:
        print(json.dumps(feature_latency()))
    elif "--feature-throughput" in sys.argv:
        feature_throughput()
    elif "--with-loader" in sys.argv:
        print(json.dumps({
            "metric": "volumes/sec/chip (MAE pretrain, loader-in-the-loop)",
            **with_loader(),
        }))
    elif "--compute-only" in sys.argv:
        print(json.dumps(compute_only()))
    elif "--model-only" in sys.argv:
        print(json.dumps(model_only()))
    else:
        # the full per-round record: production-step compute rate, the
        # r1-r3-comparable model-only rate, sustained loader-in-the-loop
        # rate, and the second headline metric (feature-extract p50, stage-
        # decomposed) in one machine-readable line
        result = compute_only()
        try:
            result["model_only"] = model_only()
        except Exception as e:
            result["model_only"] = {"value": None, "error": str(e)[:200]}
        result["loader_in_loop"] = with_loader()
        try:
            fl = feature_latency()
            result["feature_p50_ms"] = fl["value"]
            result["feature_p50_decomposition_ms"] = fl["decomposition_ms"]
        except Exception as e:  # feature path must never sink the bench line
            result["feature_p50_ms"] = None
            result["feature_p50_error"] = str(e)[:200]
        print(json.dumps(result))
