"""ops/transfer.upload_rows: chunked H2D with device-side padding."""

import jax.numpy as jnp
import numpy as np

from pyrope_tpu.ops.transfer import upload_rows


def test_roundtrip_identity():
    x = np.random.default_rng(0).standard_normal((100, 8)).astype(np.float32)
    out = upload_rows(x)
    assert out.shape == (100, 8)
    np.testing.assert_array_equal(np.asarray(out), x)


def test_multi_chunk_matches_monolithic():
    x = np.random.default_rng(1).standard_normal((1000, 16)).astype(np.float32)
    out = upload_rows(x, chunk_bytes=16 * 4 * 64)  # 64-row chunks
    np.testing.assert_array_equal(np.asarray(out), x)


def test_pad_to_appends_zero_rows():
    x = np.ones((10, 4), np.float32)
    out = upload_rows(x, pad_to=16)
    assert out.shape == (16, 4)
    np.testing.assert_array_equal(np.asarray(out[:10]), x)
    np.testing.assert_array_equal(np.asarray(out[10:]), np.zeros((6, 4)))


def test_pad_to_smaller_than_n_is_ignored():
    x = np.ones((10, 4), np.float32)
    assert upload_rows(x, pad_to=5).shape == (10, 4)


def test_dtype_conversion_per_chunk():
    x = np.random.default_rng(2).standard_normal((300, 8)).astype(np.float32)
    out = upload_rows(x, dtype=jnp.bfloat16, chunk_bytes=8 * 4 * 50, pad_to=320)
    assert out.dtype == jnp.bfloat16
    assert out.shape == (320, 8)
    np.testing.assert_array_equal(
        np.asarray(out[:300], np.float32),
        np.asarray(x.astype(jnp.bfloat16), np.float32),
    )


def test_empty_input():
    x = np.zeros((0, 4), np.float32)
    assert upload_rows(x).shape == (0, 4)
    out = upload_rows(x, pad_to=8)
    assert out.shape == (8, 4)
    np.testing.assert_array_equal(np.asarray(out), np.zeros((8, 4)))


def test_uint8_rows():
    x = np.arange(64, dtype=np.uint8).reshape(16, 4)
    out = upload_rows(x, chunk_bytes=16)
    assert out.dtype == jnp.uint8
    np.testing.assert_array_equal(np.asarray(out), x)
