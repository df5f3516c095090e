"""hu16 wire format: 1-channel int16 fixed-point HU over the wire, window
stack expanded on device inside the jitted steps (data/transforms.py hu16
notes; window math contract: reference src/data/transforms.py:8-36)."""

import numpy as np
import pytest

from headct_foundation_tpu.data.transforms import (
    HU16_CLAMP,
    HU16_PLACEHOLDER,
    HU16_SCALE,
    hu16_decode,
    hu16_encode,
    hu16_window_stack,
    load_and_preprocess,
    load_and_preprocess_hu16,
    window_stack,
)


def test_hu16_encode_decode_roundtrip_and_clamp():
    hu = np.array([-2000.0, -800.05, -0.33, 40.0, 79.96, 1999.99, 3000.0],
                  np.float32)
    q = hu16_encode(hu)
    assert q.dtype == np.int16
    back = hu16_decode(q)
    clamped = np.clip(hu, *HU16_CLAMP)
    np.testing.assert_allclose(back, clamped, atol=0.5 / HU16_SCALE + 1e-6)
    # integral HU in range round-trips EXACTLY (CT voxels are integral HU)
    ints = np.arange(-800, 2001, dtype=np.float32)
    np.testing.assert_array_equal(hu16_decode(hu16_encode(ints)), ints)


def test_hu16_clamp_is_window_exact():
    """Clamping to HU16_CLAMP before windowing changes NOTHING: the clamp
    range is the union of every shipped window range."""
    rng = np.random.RandomState(0)
    hu = (rng.rand(4, 5, 6) * 40000 - 20000).astype(np.float32)  # wild HU
    clamped = np.clip(hu, *HU16_CLAMP)
    for ch in (1, 3):
        np.testing.assert_array_equal(
            window_stack(hu, ch), window_stack(clamped, ch)
        )


def test_hu16_placeholder_windows_to_zero():
    q = np.full((1, 3, 3, 3), HU16_PLACEHOLDER, np.int16)
    for ch in (1, 3):
        np.testing.assert_array_equal(
            hu16_window_stack(q, ch), np.zeros((ch, 3, 3, 3), np.float32)
        )


def test_device_hu16_window_matches_host():
    import jax.numpy as jnp

    from headct_foundation_tpu.data.device_preprocess import device_hu16_window

    rng = np.random.RandomState(1)
    q = rng.randint(-8000, 20001, size=(2, 1, 4, 4, 4)).astype(np.int16)
    for ch in (1, 3):
        dev = np.asarray(device_hu16_window(jnp.asarray(q), ch))
        host = np.stack([hu16_window_stack(q[b], ch) for b in range(2)])
        np.testing.assert_allclose(dev, host, atol=1e-6)
        assert dev.min() >= 0.0 and dev.max() <= 1.0


def _synth_scan(tmp_path, shape=(40, 40, 40), spacing=1.0, name="s.nii.gz"):
    from headct_foundation_tpu.data.nifti import save_nifti

    rng = np.random.RandomState(7)
    # integral HU with foreground (x > 0) structure and out-of-range extremes
    vol = np.round(rng.rand(*shape) * 4000 - 1200).astype(np.float32)
    vol[:5] = -1000.0  # background slab so CropForeground crops something
    p = str(tmp_path / name)
    save_nifti(p, vol, np.diag([spacing, spacing, spacing, 1.0]))
    return p


def test_hu16_pipeline_vs_windowed_identity_resize(tmp_path):
    """With no resample and no resize (volume already at ROI after the
    foreground crop), window-then-resize and resize-then-window coincide —
    the hu16 path must match the fp16 windowed cache exactly at fp16
    precision (integral HU makes hu16 itself exact)."""
    from headct_foundation_tpu.data.nifti import save_nifti

    rng = np.random.RandomState(3)
    roi = (12, 12, 12)
    vol = np.round(rng.rand(*roi) * 2800 - 800).astype(np.float32)
    vol[vol <= 0] += 1.0  # every voxel foreground -> crop is identity
    p = str(tmp_path / "exact.nii.gz")
    save_nifti(p, vol, np.eye(4))

    q = load_and_preprocess_hu16(p, roi)
    assert q.shape == (1, *roi) and q.dtype == np.int16
    windowed_fp16 = load_and_preprocess(p, roi, 3)
    from_hu = hu16_window_stack(q, 3)
    # fp16 cache rounds to 2^-11; the hu16 path here is exact
    np.testing.assert_allclose(
        from_hu, windowed_fp16.astype(np.float32), atol=5e-4
    )


def test_hu16_pipeline_with_resize_matches_float_chain(tmp_path):
    """General scans (resample + crop + area resize): hu16 equals the pure
    float resize-then-window chain within the fixed-point bound
    0.5/(HU16_SCALE * width) per window."""
    from headct_foundation_tpu.data.nifti import load_nifti, orientation_ras
    from headct_foundation_tpu.data.transforms import (
        area_resize,
        crop_foreground,
        resample_to_spacing,
    )

    p = _synth_scan(tmp_path, shape=(40, 36, 44), spacing=1.5)
    roi = (16, 16, 16)
    q = load_and_preprocess_hu16(p, roi)

    img = load_nifti(p)
    data, affine = orientation_ras(np.asarray(img.data, np.float32), img.affine)
    vox = np.linalg.norm(affine[:3, :3], axis=0)
    data = resample_to_spacing(data, vox)
    data, _, _ = crop_foreground(data)
    resized = area_resize(data[None], roi)[0]
    expect = window_stack(resized, 3)

    got = hu16_window_stack(q, 3)
    widths = np.array([80.0, 200.0, 2800.0])[:, None, None, None]
    bound = 0.5 / (HU16_SCALE * widths) + 1e-5
    assert (np.abs(got - expect) <= bound).all(), float(
        np.abs(got - expect).max()
    )


def test_disk_cache_hu16(tmp_path):
    from headct_foundation_tpu.data.datasets import DiskCache

    roi = (12, 12, 12)
    p = _synth_scan(tmp_path, shape=(20, 20, 20))
    cache_w = DiskCache(str(tmp_path / "c"), roi, 3)
    cache_h = DiskCache(str(tmp_path / "c"), roi, 3, wire="hu16")
    assert cache_w._key(p) != cache_h._key(p)  # formats never cross-serve
    assert cache_h.wire_shape == (1, *roi)
    v = cache_h.load(p)
    assert v.shape == (1, *roi) and v.dtype == np.int16
    v2 = cache_h.load(p)  # cached hit
    np.testing.assert_array_equal(v, v2)
    ph = cache_h.placeholder()
    assert ph.dtype == np.int16 and (ph == HU16_PLACEHOLDER).all()
    assert cache_w.placeholder().dtype == np.float16


def test_native_hu16_matches_python(tmp_path):
    from headct_foundation_tpu.data.native_loader import (
        load_and_preprocess_native,
        native_available,
        native_supports_hu16,
    )

    if not native_available():
        pytest.skip("native library unavailable")
    assert native_supports_hu16(), "rebuilt .so must expose ABI >= 4"
    p = _synth_scan(tmp_path, shape=(30, 30, 30), spacing=1.0)
    roi = (16, 16, 16)
    got = load_and_preprocess_native(p, roi, 3, wire="hu16")
    expect = load_and_preprocess_hu16(p, roi)
    assert got.dtype == np.int16 and got.shape == (1, *roi)
    # fixed-point rounding snaps both paths' float noise to the same grid;
    # allow 1 LSB (0.1 HU) where a value sits on a rounding boundary
    assert np.abs(got.astype(np.int32) - expect.astype(np.int32)).max() <= 1


def test_device_preprocessor_hu16_order(tmp_path):
    from headct_foundation_tpu.data.device_preprocess import DevicePreprocessor
    from headct_foundation_tpu.data.transforms import hu16_encode as enc

    p = _synth_scan(tmp_path, shape=(30, 30, 30), spacing=1.0)
    roi = (16, 16, 16)
    prep = DevicePreprocessor(roi, 3, order="hu16")
    hu = np.asarray(prep(p))
    assert hu.shape == (1, *roi)
    expect = load_and_preprocess_hu16(p, roi)
    assert np.abs(
        enc(hu).astype(np.int32) - expect.astype(np.int32)
    ).max() <= 1


def test_pretrain_dataset_hu16_and_placeholder(tmp_path):
    import pandas as pd

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.data.datasets import PretrainDataset

    cfg = default_config()
    cfg.MODEL.ROI = [12, 12, 12]
    cfg.MODEL.IN_CHANS = 3
    cfg.DATA.WIRE_FORMAT = "hu16"
    good = _synth_scan(tmp_path, shape=(20, 20, 20))
    csv = tmp_path / "m.csv"
    pd.DataFrame({"img_path": [good, str(tmp_path / "missing.nii.gz")]}).to_csv(
        csv, index=False
    )
    ds = PretrainDataset(cfg, str(csv), cache_dir=str(tmp_path / "cache"))
    vol, _ = ds[0]
    assert vol.shape == (1, 12, 12, 12) and vol.dtype == np.int16
    ph, _ = ds[1]  # unreadable -> placeholder (error shielding)
    assert (ph == HU16_PLACEHOLDER).all()
    # placeholder windows to all-zero channels, like the windowed format's
    np.testing.assert_array_equal(
        hu16_window_stack(ph, 3), np.zeros((3, 12, 12, 12), np.float32)
    )


def test_mae_train_step_hu16_equals_windowed():
    """The jitted MAE step fed an hu16 batch must compute the same loss as
    the fp16-windowed path on the same underlying HU field (identical mask
    rng; integral in-range HU makes hu16 exact, fp16 rounds)."""
    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = default_config()
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MAE.INPUT_SIZE = 24
    cfg.MAE.PATCH_SIZE = 12
    cfg.MAE.IN_CHANS = 3
    cfg.MAE.ENCODER_DEPTH = 1
    cfg.MAE.DECODER_DEPTH = 1
    cfg.MAE.ENCODER_EMBED_DIM = 48
    cfg.MAE.ENCODER_MLP_DIM = 96
    cfg.MAE.ENCODER_NUM_HEADS = 4
    cfg.MAE.DECODER_EMBED_DIM = 48
    cfg.MAE.DECODER_MLP_DIM = 96
    cfg.MAE.DECODER_NUM_HEADS = 4
    cfg.TRAIN.GRAD_CLIP = 0.0

    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=10, num_warmup_steps=1
    )

    hu = np.round(
        np.random.RandomState(0).rand(2, 1, 24, 24, 24) * 2800 - 800
    ).astype(np.float32)
    q = hu16_encode(hu)
    windowed = np.stack(
        [window_stack(hu[b, 0], 3) for b in range(2)]
    ).astype(np.float16)

    cfg_hu = cfg.clone()
    cfg_hu.DATA.WIRE_FORMAT = "hu16"
    step_hu = mae_engine.make_train_step(mesh, augment=True, config=cfg_hu)
    step_w = mae_engine.make_train_step(mesh, augment=True, config=cfg)

    state2 = jax.tree.map(jnp.copy, state)  # steps donate their state arg
    _, m_hu = step_hu(state, jnp.asarray(q), rng)
    _, m_w = step_w(state2, jnp.asarray(windowed), rng)
    l_hu = float(m_hu["loss"])
    l_w = float(m_w["loss"])
    assert np.isfinite(l_hu) and np.isfinite(l_w)
    # same rng stream -> same mask/augs; differ only by fp16-vs-exact input
    # quantization through a bf16 forward
    assert abs(l_hu - l_w) <= 2e-2 * max(1.0, abs(l_w)), (l_hu, l_w)


# ---------------------------------------------------------------------------
# hu8 wire format (opt-in lossy companded byte wire — transforms.py hu8 notes)
# ---------------------------------------------------------------------------

def test_hu8_table_and_roundtrip():
    from headct_foundation_tpu.data.transforms import (
        HU8_TABLE,
        hu8_decode,
        hu8_encode,
    )

    assert HU8_TABLE.shape == (256,)
    assert (np.diff(HU8_TABLE) > 0).all()  # strictly monotone levels
    assert HU8_TABLE[0] == -800.0 and HU8_TABLE[-1] == 2000.0
    # every code is a fixed point of decode->encode
    codes = np.arange(256, dtype=np.uint8)
    q = hu8_encode(hu8_decode(codes))
    assert q.dtype == np.uint8
    np.testing.assert_array_equal(q, codes)
    # out-of-range HU clamps to the table ends
    assert hu8_encode(np.float32(-5000)) == 0
    assert hu8_encode(np.float32(9000)) == 255


def test_hu8_error_bounds_per_segment_and_window():
    """The documented precision contract: 0.5-HU in [-20, 180] (both
    soft-tissue windows live entirely inside it), 15 HU below, 31.4 HU
    above; windowed-value error <= half-step/width per channel."""
    from headct_foundation_tpu.data.transforms import hu8_decode, hu8_encode

    rng = np.random.RandomState(3)
    hu = (rng.rand(50000) * 3600 - 1000).astype(np.float32)  # [-1000, 2600]
    back = hu8_decode(hu8_encode(hu))
    clamped = np.clip(hu, -800.0, 2000.0)
    err = np.abs(back - clamped)
    soft = (clamped >= -20) & (clamped <= 180)
    low = clamped < -20
    high = clamped > 180
    assert err[soft].max() <= 0.5 + 1e-4, err[soft].max()
    assert err[low].max() <= 15.0 + 1e-3, err[low].max()
    assert err[high].max() <= 31.4 + 1e-2, err[high].max()
    # windowed-value bounds (window contract: reference transforms.py:8-36)
    vol = clamped[: 27 * 27 * 27].reshape(27, 27, 27)
    volq = back[: 27 * 27 * 27].reshape(27, 27, 27)
    w_exact = window_stack(vol, 3)
    w_q = window_stack(volq, 3)
    derr = np.abs(w_q - w_exact).reshape(3, -1).max(axis=1)
    assert derr[0] <= 0.5 / 80 + 1e-6, derr    # brain (40, 80)
    assert derr[1] <= 0.5 / 200 + 1e-6, derr   # subdural (80, 200)
    assert derr[2] <= 31.4 / 2800 + 1e-6, derr  # bone (600, 2800)


def test_hu8_placeholder_windows_to_zero():
    from headct_foundation_tpu.data.transforms import (
        HU8_PLACEHOLDER,
        hu8_window_stack,
    )

    q = np.full((1, 3, 3, 3), HU8_PLACEHOLDER, np.uint8)
    for ch in (1, 3):
        np.testing.assert_array_equal(
            hu8_window_stack(q, ch), np.zeros((ch, 3, 3, 3), np.float32)
        )


def test_device_hu8_window_matches_host():
    import jax.numpy as jnp

    from headct_foundation_tpu.data.device_preprocess import device_hu8_window
    from headct_foundation_tpu.data.transforms import hu8_window_stack

    rng = np.random.RandomState(5)
    q = rng.randint(0, 256, size=(2, 1, 4, 4, 4)).astype(np.uint8)
    for ch in (1, 3):
        dev = np.asarray(device_hu8_window(jnp.asarray(q), ch))
        host = np.stack([hu8_window_stack(q[b], ch) for b in range(2)])
        np.testing.assert_allclose(dev, host, atol=1e-6)
        assert dev.min() >= 0.0 and dev.max() <= 1.0


def test_disk_cache_hu8(tmp_path):
    from headct_foundation_tpu.data.datasets import DiskCache
    from headct_foundation_tpu.data.transforms import (
        HU8_PLACEHOLDER,
        hu8_window_stack,
        load_and_preprocess_hu16,
    )

    roi = (12, 12, 12)
    p = _synth_scan(tmp_path, shape=(20, 20, 20))
    cache8 = DiskCache(str(tmp_path / "c"), roi, 3, wire="hu8")
    cache16 = DiskCache(str(tmp_path / "c"), roi, 3, wire="hu16")
    assert cache8._key(p) != cache16._key(p)  # formats never cross-serve
    assert cache8.wire_shape == (1, *roi)
    v = cache8.load(p)
    assert v.shape == (1, *roi) and v.dtype == np.uint8
    np.testing.assert_array_equal(v, cache8.load(p))  # cached hit
    ph = cache8.placeholder()
    assert ph.dtype == np.uint8 and (ph == HU8_PLACEHOLDER).all()
    # windowed values agree with the exact float chain within the hu8
    # precision contract per channel
    exact = hu16_window_stack(load_and_preprocess_hu16(p, roi), 3)
    got = hu8_window_stack(v, 3)
    derr = np.abs(got - exact).reshape(3, -1).max(axis=1)
    assert derr[0] <= 0.5 / 80 + 1e-4, derr
    assert derr[1] <= 0.5 / 200 + 1e-4, derr
    assert derr[2] <= 31.4 / 2800 + 1e-4, derr


def test_mae_train_step_hu8_close_to_windowed():
    """The jitted MAE step fed an hu8 batch computes a loss within the
    documented lossy tolerance of the fp16-windowed path (same rng -> same
    mask/augs; inputs differ by <= 1.2e-2 per voxel in windowed units)."""
    import jax
    import jax.numpy as jnp

    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.data.transforms import hu8_encode
    from headct_foundation_tpu.engines import mae_engine
    from headct_foundation_tpu.parallel.mesh import make_mesh

    cfg = default_config()
    cfg.MODEL.ROI = [24, 24, 24]
    cfg.MAE.INPUT_SIZE = 24
    cfg.MAE.PATCH_SIZE = 12
    cfg.MAE.IN_CHANS = 3
    cfg.MAE.ENCODER_DEPTH = 1
    cfg.MAE.DECODER_DEPTH = 1
    cfg.MAE.ENCODER_EMBED_DIM = 48
    cfg.MAE.ENCODER_MLP_DIM = 96
    cfg.MAE.ENCODER_NUM_HEADS = 4
    cfg.MAE.DECODER_EMBED_DIM = 48
    cfg.MAE.DECODER_MLP_DIM = 96
    cfg.MAE.DECODER_NUM_HEADS = 4
    cfg.TRAIN.GRAD_CLIP = 0.0

    mesh = make_mesh(data=1, devices=jax.devices()[:1])
    rng = jax.random.PRNGKey(0)
    state, _, _ = mae_engine.create_train_state(
        cfg, mesh, rng, total_steps=10, num_warmup_steps=1
    )

    hu = np.round(
        np.random.RandomState(0).rand(2, 1, 24, 24, 24) * 2800 - 800
    ).astype(np.float32)
    q8 = hu8_encode(hu)
    windowed = np.stack(
        [window_stack(hu[b, 0], 3) for b in range(2)]
    ).astype(np.float16)

    cfg8 = cfg.clone()
    cfg8.DATA.WIRE_FORMAT = "hu8"
    step8 = mae_engine.make_train_step(mesh, augment=True, config=cfg8)
    step_w = mae_engine.make_train_step(mesh, augment=True, config=cfg)

    state2 = jax.tree.map(jnp.copy, state)  # steps donate their state arg
    _, m8 = step8(state, jnp.asarray(q8), rng)
    _, m_w = step_w(state2, jnp.asarray(windowed), rng)
    l8, l_w = float(m8["loss"]), float(m_w["loss"])
    assert np.isfinite(l8) and np.isfinite(l_w)
    assert abs(l8 - l_w) <= 5e-2 * max(1.0, abs(l_w)), (l8, l_w)


def _skull_phantom(shape=(180, 180, 120), spacing=(0.5, 0.5, 1.25)):
    """Boundary-heavy head phantom in HU: air (-1000) outside, skull shell
    (~1500 HU) around soft brain tissue (30 +/- 15 HU smooth field) — the
    worst case for resize-then-window vs window-then-resize, because 'area'
    cells straddling the bone/tissue/air boundaries average HU across window
    clip bounds before (hu16) vs after (windowed cache) clipping."""
    from scipy.ndimage import zoom

    nx, ny, nz = shape
    ax = [(np.arange(n, dtype=np.float32) - n / 2) / (n / 2) for n in shape]
    d2 = (
        (ax[0][:, None, None] / 0.82) ** 2
        + (ax[1][None, :, None] / 0.82) ** 2
        + (ax[2][None, None, :] / 0.88) ** 2
    )
    vol = np.full(shape, -1000.0, np.float32)  # air
    rng = np.random.RandomState(11)
    smooth = zoom(rng.rand(6, 6, 5).astype(np.float32) - 0.5, 
                  (nx / 6.0, ny / 6.0, nz / 5.0), order=1)[:nx, :ny, :nz]
    vol[d2 < 1.0] = 1500.0 + 200.0 * smooth[d2 < 1.0]   # skull shell
    inner = d2 < 0.84
    vol[inner] = 30.0 + 30.0 * smooth[inner]            # brain tissue
    return np.round(vol), spacing


def test_hu16_vs_windowed_divergence_confined_to_window_boundaries(tmp_path):
    """ADVICE r4: quantify the hu16 (resize-then-window) vs windowed cache
    (window-then-resize) divergence on a skull phantom — not just identity-
    resize synthetic cases. Claims measured here and recorded in
    MIGRATION.md:

    1. On a boundary-heavy head phantom the two orders differ ONLY in a thin
       boundary shell: the affected voxel fraction stays small and the
       mean |diff| stays ~1e-3-level per channel.
    2. On an all-in-window volume (every HU inside every window's linear
       range) the two orders are IDENTICAL up to wire quantization — the
       windowing map is affine there, and affine maps commute with area
       averaging. This pins the divergence mechanism to window-bound
       clipping, per the wire-format module docstring.
    """
    from headct_foundation_tpu.data.nifti import save_nifti

    roi = (96, 96, 96)
    vol, spacing = _skull_phantom()
    p = str(tmp_path / "skull.nii.gz")
    save_nifti(p, vol, np.diag([*spacing, 1.0]))

    windowed = load_and_preprocess(p, roi, 3).astype(np.float32)
    from_hu = hu16_window_stack(load_and_preprocess_hu16(p, roi), 3)

    diff = np.abs(from_hu - windowed)
    stats = {}
    for c, name, width in ((0, "brain", 80.0), (1, "subdural", 200.0),
                           (2, "bone", 2800.0)):
        quant = 0.5 / (HU16_SCALE * width) + 2 ** -11  # wire + fp16 rounding
        affected = float(np.mean(diff[c] > quant + 1e-3))
        stats[name] = {
            "max": float(diff[c].max()),
            "mean": float(diff[c].mean()),
            "frac_gt_quant": affected,
        }
        # divergence is confined: a boundary shell, not the volume
        # (measured on this phantom: brain 10.6% affected / mean 0.030 /
        # max 0.81; the narrow brain window is the worst case — cells
        # averaging bone+tissue HU land mid-window in the hu16 order but
        # average two clipped values in the windowed order)
        assert affected < 0.25, (name, stats[name])
        assert stats[name]["mean"] < 0.05, (name, stats[name])
    print("hu16-vs-windowed skull-phantom divergence:", stats)

    # mechanism check: all-in-window tissue -> identical up to quantization
    nx, ny, nz = (120, 120, 90)
    from scipy.ndimage import zoom

    rng = np.random.RandomState(5)
    smooth = zoom(rng.rand(6, 6, 5).astype(np.float32), 
                  (nx / 6.0, ny / 6.0, nz / 5.0), order=1)[:nx, :ny, :nz]
    tissue = np.round(15.0 + 50.0 * smooth)  # HU in [15, 65]: inside all
    p2 = str(tmp_path / "tissue.nii.gz")     # windows' linear ranges
    save_nifti(p2, tissue, np.diag([0.7, 0.7, 1.0, 1.0]))
    w2 = load_and_preprocess(p2, roi, 3).astype(np.float32)
    h2 = hu16_window_stack(load_and_preprocess_hu16(p2, roi), 3)
    widths = np.array([80.0, 200.0, 2800.0])[:, None, None, None]
    bound = 0.5 / (HU16_SCALE * widths) + 2 ** -11 + 1e-5
    assert (np.abs(h2 - w2) <= bound).all(), float(np.abs(h2 - w2).max())


def test_resolve_wire_format_auto_picks_by_bandwidth():
    """DATA.WIRE_FORMAT='auto' resolves hu8 under a transport-starved
    mount, hu16 over a fast one; literal formats pass through unprobed."""
    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.data.pipeline import resolve_wire_format

    cfg = default_config()
    for literal in ("windowed", "hu16", "hu8"):
        cfg.DATA.WIRE_FORMAT = literal
        assert resolve_wire_format(cfg, probe_mbps=1.0) == literal

    cfg.DATA.WIRE_FORMAT = "auto"
    assert resolve_wire_format(cfg, probe_mbps=20.0) == "hu8"
    assert resolve_wire_format(cfg, probe_mbps=149.9) == "hu8"
    assert resolve_wire_format(cfg, probe_mbps=151.0) == "hu16"
    assert resolve_wire_format(cfg, probe_mbps=8000.0) == "hu16"
    # threshold is config-driven
    cfg.DATA.WIRE_AUTO_MBPS = 10.0
    assert resolve_wire_format(cfg, probe_mbps=20.0) == "hu16"
    assert resolve_wire_format(cfg, probe_mbps=5.0) == "hu8"


def test_resolve_wire_format_auto_probes_real_transport():
    """With no injected probe, 'auto' measures the live backend and returns
    a trainable format (CPU mesh: host 'transfer' is fast -> hu16)."""
    from headct_foundation_tpu.config import default_config
    from headct_foundation_tpu.data.pipeline import resolve_wire_format

    cfg = default_config()
    cfg.DATA.WIRE_FORMAT = "auto"
    assert resolve_wire_format(cfg) in ("hu8", "hu16")
