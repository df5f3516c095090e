"""MAE random-masking parity with the documented reference algorithm
(reference: src/models/mae.py:194-218)."""

import jax
import jax.numpy as jnp
import numpy as np

from headct_foundation_tpu.ops.masking import random_masking


def test_mask_counts_and_restore():
    rng = jax.random.PRNGKey(0)
    N, L, D = 4, 512, 16
    x = jnp.asarray(np.random.RandomState(0).randn(N, L, D), dtype=jnp.float32)
    x_masked, mask, ids_restore, ids_keep = random_masking(rng, x, 0.75)

    len_keep = int(L * 0.25)
    assert x_masked.shape == (N, len_keep, D)
    assert mask.shape == (N, L)
    # exactly L - len_keep masked per sample
    np.testing.assert_array_equal(np.asarray(mask.sum(axis=1)), L - len_keep)

    # kept tokens are the originals at ids_keep
    gathered = np.take_along_axis(
        np.asarray(x), np.asarray(ids_keep)[:, :, None], axis=1
    )
    np.testing.assert_array_equal(np.asarray(x_masked), gathered)

    # mask is 0 exactly at kept positions
    m = np.asarray(mask)
    for i in range(N):
        assert set(np.where(m[i] == 0)[0].tolist()) == set(
            np.asarray(ids_keep)[i].tolist()
        )

    # ids_restore inverts the shuffle: scattering [kept; masked] by
    # ids_restore reproduces original token order for the kept entries
    ids_shuffle = np.argsort(np.asarray(ids_restore), axis=1)
    np.testing.assert_array_equal(ids_shuffle[:, :len_keep], np.asarray(ids_keep))


def test_mask_uniformity_and_decorrelation():
    # each position masked ~75% of the time across many draws
    N, L = 256, 64
    x = jnp.zeros((N, L, 1))
    _, mask, _, _ = random_masking(jax.random.PRNGKey(1), x, 0.75)
    per_pos = np.asarray(mask).mean(axis=0)
    assert np.all(np.abs(per_pos - 0.75) < 0.15)
    # different keys give different masks
    _, mask2, _, _ = random_masking(jax.random.PRNGKey(2), x, 0.75)
    assert not np.array_equal(np.asarray(mask), np.asarray(mask2))
    # same key reproduces exactly
    _, mask3, _, _ = random_masking(jax.random.PRNGKey(1), x, 0.75)
    np.testing.assert_array_equal(np.asarray(mask), np.asarray(mask3))
