"""ProductQuantizer + ADC op tests (mirrors the coverage implied by
Vector/ProductQuantizer.cs and IvfPqVectorIndexTests.cs)."""

import numpy as np
import pytest

from pyrope_tpu.ops.pq import (
    ProductQuantizer,
    adc_accumulate,
    adc_ip_table,
    adc_l2_table,
)


def test_requires_divisible_dim():
    with pytest.raises(ValueError):
        ProductQuantizer(m=3, ksub=256, dim=16)
    with pytest.raises(ValueError):
        ProductQuantizer(m=4, ksub=512, dim=16)


def test_encode_decode_reduces_error():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(500, 16)).astype(np.float32)
    pq = ProductQuantizer(m=4, ksub=64, dim=16)
    pq.train(x, seed=42)
    codes = pq.encode(x)
    assert codes.shape == (500, 4) and codes.dtype == np.uint8
    recon = pq.decode(codes)
    err = np.mean((x - recon) ** 2)
    base = np.mean(x**2)
    assert err < base * 0.6  # quantization must explain a chunk of variance


def test_train_deterministic():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(200, 8)).astype(np.float32)
    a = ProductQuantizer(m=2, ksub=16, dim=8)
    b = ProductQuantizer(m=2, ksub=16, dim=8)
    a.train(x, seed=42)
    b.train(x, seed=42)
    np.testing.assert_array_equal(a.codebooks, b.codebooks)


def test_adc_l2_table_matches_direct():
    rng = np.random.default_rng(2)
    q = rng.normal(size=(3, 8)).astype(np.float32)
    cb = rng.normal(size=(2, 5, 4)).astype(np.float32)
    tbl = np.asarray(adc_l2_table(q, cb))
    for b in range(3):
        for m in range(2):
            for k in range(5):
                direct = np.sum((q[b, m * 4 : (m + 1) * 4] - cb[m, k]) ** 2)
                assert tbl[b, m, k] == pytest.approx(direct, rel=1e-4, abs=1e-4)


def test_adc_accumulate_matches_loop():
    rng = np.random.default_rng(3)
    tbl = rng.normal(size=(2, 4, 16)).astype(np.float32)
    codes = rng.integers(0, 16, size=(2, 7, 4)).astype(np.uint8)
    out = np.asarray(adc_accumulate(tbl, codes))
    for b in range(2):
        for l in range(7):
            direct = sum(tbl[b, m, codes[b, l, m]] for m in range(4))
            assert out[b, l] == pytest.approx(direct, rel=1e-5, abs=1e-5)


def test_adc_estimates_true_l2():
    """ADC distance (query vs reconstruction) approximates true distance."""
    rng = np.random.default_rng(4)
    x = rng.normal(size=(300, 16)).astype(np.float32)
    pq = ProductQuantizer(m=4, ksub=64, dim=16)
    pq.train(x, seed=42)
    codes = pq.encode(x)
    q = rng.normal(size=(2, 16)).astype(np.float32)
    tbl = adc_l2_table(q, pq.codebooks)
    adc = np.asarray(adc_accumulate(tbl, np.asarray(codes)[None, :, :].repeat(2, 0)))
    recon = pq.decode(codes)
    true_d = ((q[:, None, :] - recon[None, :, :]) ** 2).sum(-1)
    np.testing.assert_allclose(adc, true_d, rtol=1e-3, atol=1e-3)


def test_ip_table():
    rng = np.random.default_rng(5)
    q = rng.normal(size=(2, 8)).astype(np.float32)
    cb = rng.normal(size=(2, 4, 4)).astype(np.float32)
    tbl = np.asarray(adc_ip_table(q, cb))
    assert tbl[1, 0, 2] == pytest.approx(float(q[1, :4] @ cb[0, 2]), rel=1e-4)


class TestAdcImpls:
    def test_onehot_matches_gather(self):
        import jax.numpy as jnp
        import numpy as np
        from pyrope_tpu.ops.pq import adc_accumulate

        rng = np.random.default_rng(0)
        b, l, m, ksub = 4, 64, 8, 256
        table = jnp.asarray(rng.random((b, m, ksub), np.float32))
        codes = jnp.asarray(rng.integers(0, ksub, (b, l, m)).astype(np.uint8))
        ref = adc_accumulate(table, codes, impl="gather")
        oh = adc_accumulate(table, codes, impl="onehot")
        # bf16 one-hot matmul: table values survive with ~1e-2 rel error
        assert np.allclose(np.asarray(ref), np.asarray(oh), rtol=2e-2, atol=2e-2)
