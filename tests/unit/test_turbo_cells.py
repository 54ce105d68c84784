import numpy as np
import pytest

import jax.numpy as jnp

from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
from tests.unit.test_turbo_decode import _encode_noisy


@pytest.mark.parametrize("early", ["none", "crc"])
def test_cells_loop_matches_scan_loop(early):
    K, B = 104, 3
    bits, noisy = _encode_noisy(K, B, seed=3, ebn0_db=1.5,
                                with_crc=early == "crc")
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    h1, i1, L1 = turbo_decode(*args, DecoderConfig(K=K, n_iters=4,
                                                   early_term=early))
    h2, i2, L2 = turbo_decode(*args, DecoderConfig(K=K, n_iters=4,
                                                   early_term=early,
                                                   siso="pallas"))
    assert (np.asarray(h1) == np.asarray(h2)).all()
    assert (np.asarray(i1) == np.asarray(i2)).all()
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L2),
                               rtol=1e-3, atol=1e-3)


def test_cells_loop_bf16_io():
    """bfloat16 LLR/extrinsic I/O (metrics stay fp32 in the kernel) must
    agree with the fp32 path on hard decisions and track L closely."""
    K, B = 168, 4
    bits, noisy = _encode_noisy(K, B, seed=7, ebn0_db=2.0)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    h32, _, L32 = turbo_decode(*args, DecoderConfig(
        K=K, n_iters=3, mode="maxlog", ext_scale=0.75, siso="pallas"))
    h16, _, L16 = turbo_decode(*args, DecoderConfig(
        K=K, n_iters=3, mode="maxlog", ext_scale=0.75, siso="pallas",
        io_dtype="bfloat16"))
    assert L16.dtype == jnp.float32  # outputs stay fp32
    assert (np.asarray(h16) == bits).all()
    assert (np.asarray(h16) == np.asarray(h32)).mean() > 0.999
    # bf16 has ~2-3 significant digits; Ls should agree to a few percent.
    denom = np.maximum(np.abs(np.asarray(L32)), 1.0)
    assert (np.abs(np.asarray(L16) - np.asarray(L32)) / denom).mean() < 0.05


def test_cells_loop_maxlog_umts():
    K, B = 80, 2
    bits, noisy = _encode_noisy(K, B, seed=5, ebn0_db=3.0,
                                interleaver="umts")
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    cfg = DecoderConfig(K=K, n_iters=3, mode="maxlog", ext_scale=0.75,
                        interleaver="umts", siso="pallas")
    h, i, L = turbo_decode(*args, cfg)
    assert (np.asarray(h) == bits).all()


def test_cells_loop_nii():
    """NII mode (stale per-window alpha starts, exact beta) must decode a
    moderate-SNR multi-window batch identically to the exact kernel on
    hard decisions, and exactly when there is a single window (K small)."""
    # window=32 at K=168 -> KTp=192 = 6 windows: NII is genuinely stale
    K, B = 168, 3
    bits, noisy = _encode_noisy(K, B, seed=11, ebn0_db=1.8)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    base = dict(K=K, n_iters=4, mode="maxlog", ext_scale=0.75,
                siso="pallas", window=32)
    hx, _, Lx = turbo_decode(*args, DecoderConfig(**base))
    hn, _, Ln = turbo_decode(*args, DecoderConfig(**base, nii=True))
    assert (np.asarray(hn) == bits).all()
    assert (np.asarray(hn) == np.asarray(hx)).all()
    # Soft outputs track closely (alpha staleness heals across iterations).
    denom = np.maximum(np.abs(np.asarray(Lx)), 1.0)
    assert (np.abs(np.asarray(Ln) - np.asarray(Lx)) / denom).mean() < 0.1


def test_cells_loop_nii_single_window_exact():
    K, B = 104, 2  # single window: NII == exact bit-for-bit
    bits, noisy = _encode_noisy(K, B, seed=2, ebn0_db=2.0)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    base = dict(K=K, n_iters=4, mode="maxlog", ext_scale=0.75, siso="pallas")
    hx, _, Lx = turbo_decode(*args, DecoderConfig(**base))
    hn, _, Ln = turbo_decode(*args, DecoderConfig(**base, nii=True))
    np.testing.assert_array_equal(np.asarray(hx), np.asarray(hn))
    np.testing.assert_allclose(np.asarray(Lx), np.asarray(Ln), atol=1e-5)


def test_cells_loop_nii_crc_early_term():
    K, B = 168, 3
    bits, noisy = _encode_noisy(K, B, seed=4, ebn0_db=2.5, with_crc=True)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    cfg = DecoderConfig(K=K, n_iters=6, mode="maxlog", ext_scale=0.75,
                        siso="pallas", early_term="crc", nii=True,
                        window=32)
    h, it, _ = turbo_decode(*args, cfg)
    assert (np.asarray(h) == bits).all()
    assert (np.asarray(it) < 6).all()  # early exit actually fired


@pytest.mark.parametrize("ext", [
    pytest.param("float8_e4m3fn", marks=pytest.mark.slow), "int8"])
def test_cells_loop_quantized_extrinsics(ext):
    """Narrow extrinsic HBM streams (ext_dtype) must decode correctly and
    track the bf16-extrinsic path: the extrinsic tensors are the only
    per-iteration HBM round trip, so f8/int8 halves that traffic; the
    quantization (saturating at +-448 / +-31.75) is the fixed-point
    representation hardware decoders use."""
    K, B = 168, 4
    bits, noisy = _encode_noisy(K, B, seed=9, ebn0_db=2.0)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    base = dict(K=K, n_iters=4, mode="maxlog", ext_scale=0.75,
                siso="pallas", io_dtype="bfloat16", nii=True, window=32)
    hb, _, Lb = turbo_decode(*args, DecoderConfig(**base))
    hq, _, Lq = turbo_decode(*args, DecoderConfig(**base, ext_dtype=ext))
    assert Lq.dtype == jnp.float32
    assert (np.asarray(hq) == bits).all()
    assert (np.asarray(hq) == np.asarray(hb)).mean() > 0.999
    denom = np.maximum(np.abs(np.asarray(Lb)), 1.0)
    assert (np.abs(np.asarray(Lq) - np.asarray(Lb)) / denom).mean() < 0.15


def test_cells_loop_quantized_extrinsics_crc():
    """int8 extrinsics through the CRC early-termination loop (the L
    dequantization path: L = ls + scale*qs*(le1 + le21))."""
    K, B = 168, 3
    bits, noisy = _encode_noisy(K, B, seed=4, ebn0_db=2.5, with_crc=True)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    cfg = DecoderConfig(K=K, n_iters=6, mode="maxlog", ext_scale=0.75,
                        siso="pallas", early_term="crc", nii=True,
                        window=32, ext_dtype="int8")
    h, it, _ = turbo_decode(*args, cfg)
    assert (np.asarray(h) == bits).all()
    assert (np.asarray(it) < 6).all()


def test_cells_loop_fold_gather_equivalence():
    """fold_gather (the in-kernel per-row-DMA interleave, kept in-tree as
    the round-4 benchmark-decides evidence -- it LOST 2x on hardware) must
    stay bit-identical to the materialized-gather path: the la bytes the
    kernel consumes are the same either way."""
    K, B = 168, 4
    bits, noisy = _encode_noisy(K, B, seed=13, ebn0_db=1.5)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    base = dict(K=K, n_iters=4, mode="maxlog", ext_scale=0.75,
                siso="pallas", io_dtype="bfloat16", nii=True, window=32)
    h0, _, L0 = turbo_decode(*args, DecoderConfig(**base))
    h1, _, L1 = turbo_decode(*args, DecoderConfig(**base, fold_gather=True))
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(L0), np.asarray(L1))


@pytest.mark.slow
def test_cells_loop_fold_gather_crc_early_term():
    """fold + CRC early termination (one g_inv per iteration remains for
    the natural-order convergence check)."""
    K, B = 168, 3
    bits, noisy = _encode_noisy(K, B, seed=4, ebn0_db=2.5, with_crc=True)
    f32 = lambda x: jnp.asarray(x, jnp.float32)
    args = [f32(x) for x in noisy]
    base = dict(K=K, n_iters=6, mode="maxlog", ext_scale=0.75,
                siso="pallas", early_term="crc", nii=True, window=32)
    h0, i0, _ = turbo_decode(*args, DecoderConfig(**base))
    h1, i1, _ = turbo_decode(*args, DecoderConfig(**base, fold_gather=True))
    assert (np.asarray(h1) == bits).all()
    np.testing.assert_array_equal(np.asarray(h0), np.asarray(h1))
    np.testing.assert_array_equal(np.asarray(i0), np.asarray(i1))
