"""numpy golden == C++ golden, encoder and decoder (SURVEY.md section 5)."""

import numpy as np
import pytest

from turbotpu.golden import cpp_ref, numpy_ref
from turbotpu.spec.qpp import qpp_inv, qpp_perm
from turbotpu.spec.umts import umts_inv, umts_perm


@pytest.mark.parametrize("K,which", [(40, "lte"), (64, "lte"), (512, "lte"),
                                     (40, "umts"), (160, "umts")])
def test_encoders_match(K, which):
    rng = np.random.default_rng(K)
    bits = rng.integers(0, 2, K).astype(np.int8)
    perm = qpp_perm(K) if which == "lte" else umts_perm(K)
    a = numpy_ref.turbo_encode(bits, perm)
    b = cpp_ref.turbo_encode(bits, perm)
    for x, y in zip(a, b):
        assert (x == y).all()


def _noisy_llrs(K, seed, ebn0_db=1.0):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, K).astype(np.int8)
    perm, inv = qpp_perm(K), qpp_inv(K)
    parts = numpy_ref.turbo_encode(bits, perm)
    enc = np.concatenate(parts).astype(np.float64)
    sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
    y = (1 - 2 * enc) + sigma * rng.normal(size=enc.shape)
    llr = 2 * y / sigma ** 2
    ofs = np.cumsum([0, K, K, K, 6, 6])
    return bits, perm, inv, [llr[ofs[i]:ofs[i + 1]] for i in range(5)]


@pytest.mark.parametrize("mode", ["logmap", "maxlog"])
@pytest.mark.parametrize("K", [40, 104])
def test_decoders_match(K, mode):
    bits, perm, inv, p = _noisy_llrs(K, seed=3)
    h1, _, L1 = numpy_ref.turbo_decode(*p, perm, inv, n_iters=4, mode=mode)
    h2, _, L2 = cpp_ref.turbo_decode(*p, perm, inv, n_iters=4, mode=mode)
    assert (h1 == h2).all()
    np.testing.assert_allclose(L1, L2, atol=1e-9)


@pytest.mark.parametrize("K", [512])
def test_decoders_match_k512(K):
    # SURVEY section 5 golden tests name K in {40, 512, 6144}; 512 runs in
    # the fast suite, 6144 lives in the slow full-chain test below.
    bits, perm, inv, p = _noisy_llrs(K, seed=5)
    h1, _, L1 = numpy_ref.turbo_decode(*p, perm, inv, n_iters=2)
    h2, _, L2 = cpp_ref.turbo_decode(*p, perm, inv, n_iters=2)
    assert (h1 == h2).all()
    np.testing.assert_allclose(L1, L2, atol=1e-9)


def test_crc_early_termination_matches_numpy():
    from turbotpu.spec.crc import CRC24A_POLY, crc_attach
    K = 104
    rng = np.random.default_rng(11)
    bits = crc_attach(rng.integers(0, 2, K - 24).astype(np.int8),
                      CRC24A_POLY)
    perm, inv = qpp_perm(K), qpp_inv(K)
    parts = numpy_ref.turbo_encode(bits, perm)
    enc = np.concatenate(parts).astype(np.float64)
    sigma = np.sqrt(1 / (2 * 10 ** (3.0 / 10) / 3))
    y = (1 - 2 * enc) + sigma * rng.normal(size=enc.shape)
    llr = 2 * y / sigma ** 2
    ofs = np.cumsum([0, K, K, K, 6, 6])
    p = [llr[ofs[i]:ofs[i + 1]] for i in range(5)]
    h1, it1, _ = numpy_ref.turbo_decode(*p, perm, inv, n_iters=8,
                                        crc_poly=CRC24A_POLY)
    h2, it2, _ = cpp_ref.turbo_decode(*p, perm, inv, n_iters=8,
                                      crc_poly=CRC24A_POLY)
    assert (h1 == h2).all() and (h1 == bits).all()
    assert it1 == it2 < 8  # early exit engaged, same iteration


def test_cpp_crc_check_matches_spec():
    from turbotpu.spec import crc as crc_mod
    rng = np.random.default_rng(12)
    for poly in (crc_mod.CRC24A_POLY, crc_mod.CRC24B_POLY):
        bits = rng.integers(0, 2, 100).astype(np.int8)
        ok = crc_mod.crc_attach(bits, poly)
        assert cpp_ref.crc_check(ok, poly)
        bad = ok.copy()
        bad[3] ^= 1
        assert not cpp_ref.crc_check(bad, poly)


def test_umts_mux_demux_match_numpy():
    K = 80
    rng = np.random.default_rng(13)
    bits = rng.integers(0, 2, K).astype(np.int8)
    parts = numpy_ref.turbo_encode(bits, umts_perm(K))
    w_np = numpy_ref.umts_mux(*parts).astype(np.float64)
    w_cc = cpp_ref.umts_mux(*parts)
    np.testing.assert_array_equal(w_np, w_cc)
    got = cpp_ref.umts_demux(w_cc)
    for a, b in zip(parts, got):
        np.testing.assert_array_equal(a.astype(np.float64), b)


@pytest.mark.slow
def test_full_chain_equivalence_k6144():
    """SURVEY section 5: K=6144 full-chain golden comparison across ALL
    implementations -- numpy fp64, C++ fp64, JAX scan fp32, Pallas fused
    kernel (fp32 and bfloat16 I/O) -- at 6144 the fp32 renorm cadence and
    bf16 I/O must still track the fp64 golden."""
    import jax.numpy as jnp
    from turbotpu.decoder.turbo import DecoderConfig, turbo_decode

    K = 6144
    n_iters = 2
    bits, perm, inv, p = _noisy_llrs(K, seed=8, ebn0_db=1.2)
    h_np, _, L_np = numpy_ref.turbo_decode(*p, perm, inv, n_iters=n_iters)
    h_cc, _, L_cc = cpp_ref.turbo_decode(*p, perm, inv, n_iters=n_iters)
    # fp64 vs fp64: tight.
    assert (h_np == h_cc).all()
    np.testing.assert_allclose(L_np, L_cc, atol=1e-9)

    f32 = lambda x: jnp.asarray(x, jnp.float32)[None]
    h_jx, _, L_jx = turbo_decode(*[f32(x) for x in p],
                                 DecoderConfig(K=K, n_iters=n_iters))
    # fp32 scan vs fp64 golden: LLR magnitudes at this SNR are O(10-100);
    # fp32 accumulation over 6147 steps tracks to ~1e-2 relative.
    assert (np.asarray(h_jx)[0] == h_np).mean() > 0.999
    np.testing.assert_allclose(np.asarray(L_jx)[0], L_np,
                               rtol=2e-2, atol=0.35)

    h_pl, _, L_pl = turbo_decode(
        *[f32(x) for x in p],
        DecoderConfig(K=K, n_iters=n_iters, siso="pallas"))
    assert (np.asarray(h_pl)[0] == h_np).mean() > 0.999
    np.testing.assert_allclose(np.asarray(L_pl)[0], L_np,
                               rtol=2e-2, atol=0.35)

    h_bf, _, _ = turbo_decode(
        *[f32(x) for x in p],
        DecoderConfig(K=K, n_iters=n_iters, siso="pallas",
                      io_dtype="bfloat16"))
    # bf16 LLR I/O: hard decisions still track the fp64 golden.
    assert (np.asarray(h_bf)[0] == h_np).mean() > 0.995


def test_noiseless_roundtrip_umts():
    K = 80
    rng = np.random.default_rng(7)
    bits = rng.integers(0, 2, K).astype(np.int8)
    perm, inv = umts_perm(K), umts_inv(K)
    parts = numpy_ref.turbo_encode(bits, perm)
    C = 5.0
    llrs = [C * (1 - 2 * x.astype(np.float64)) for x in parts]
    hard, _, _ = numpy_ref.turbo_decode(*llrs, perm, inv, n_iters=2)
    assert (hard == bits).all()


@pytest.mark.slow
def test_cpp_golden_linlog_mode():
    """The C++ golden's linlog mode (round 4) against the JAX scan
    decoder.  linlog's clipped correction is NOT associative, and the
    scalar model folds sequentially while JAX reduces in tree order, so
    the cross-check is statistical (near-total hard agreement + clean
    decode), unlike the exact logmap check."""
    import numpy as np
    import jax.numpy as jnp
    from turbotpu.golden import cpp_ref
    from turbotpu.golden import numpy_ref as npr
    from turbotpu.spec.qpp import qpp_inv, qpp_perm
    from turbotpu.decoder.turbo import DecoderConfig, turbo_decode

    K, B = 104, 8
    rng = np.random.default_rng(21)
    perm, inv = qpp_perm(K), qpp_inv(K)
    sigma = 0.85
    agree = total = 0
    streams_b = [[] for _ in range(5)]
    bits_b = []
    for b in range(B):
        bits = rng.integers(0, 2, K).astype(np.int8)
        bits_b.append(bits)
        for i, s in enumerate(npr.turbo_encode(bits, perm)):
            y = (1 - 2 * s.astype(np.float64)) \
                + sigma * rng.normal(size=s.shape)
            streams_b[i].append(2 * y / sigma ** 2)
    cfg = DecoderConfig(K=K, n_iters=4, mode="linlog", siso="scan")
    args = [jnp.asarray(np.stack(s), jnp.float32) for s in streams_b]
    hard_j, _, _ = turbo_decode(*args, cfg)
    hard_j = np.asarray(hard_j)
    for b in range(B):
        hard_c, _, _ = cpp_ref.turbo_decode(
            *[s[b] for s in streams_b], perm, inv, n_iters=4,
            mode="linlog")
        agree += int((hard_c == hard_j[b]).sum())
        total += K
    assert agree / total > 0.995, agree / total
