"""TRUE mixed-K decoding via per-codeword embedded interleaver tables
(decoder/bucketing.embedded_perm_tables + turbo_decode(perm_b=, inv_b=)).

The key property: a codeword transmitted as a REAL K-bit turbo codeword
(own interleaver, own 3K+12 mother-rate length) decodes identically
whether decoded natively at K or embedded into a larger bucket with
leading known-filler steps -- so a heterogeneous batch in one compiled
call costs nothing in accuracy.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from turbotpu.decoder.bucketing import embedded_perm_tables
from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
from turbotpu.harness.ber import BIG_LLR, SimConfig, make_step
from turbotpu.tx import chain
from turbotpu.tx.rate_match_jax import lte_demux_jax, lte_mux_jax


def test_embedded_tables_are_bijections():
    phi, inv = embedded_perm_tables([40, 104, 64], 104, "lte")
    assert phi.shape == (3, 104) and inv.shape == (3, 104)
    for r in range(3):
        assert sorted(phi[r]) == list(range(104))
        np.testing.assert_array_equal(phi[r][inv[r]], np.arange(104))
    # Filler prefix maps to itself; data region carries the true perm.
    from turbotpu.spec.qpp import qpp_perm
    F = 104 - 40
    np.testing.assert_array_equal(phi[0][:F], np.arange(F))
    np.testing.assert_array_equal(phi[0][F:], F + np.asarray(qpp_perm(40)))


def _tx_rx(K, B, esn0_db, seed):
    """Encode+channel one batch at true K; return (bits, canonical parts)."""
    kp, kn = jax.random.split(jax.random.key(seed))
    from turbotpu.spec.qpp import qpp_perm
    bits = chain.gen_payload(kp, B, K)
    d = lte_mux_jax(*chain.turbo_encode(bits, qpp_perm(K))).astype(jnp.float32)
    y = chain.awgn(kn, chain.modulate_bpsk(d.astype(jnp.int8)), esn0_db)
    llr = chain.demap_bpsk(y, esn0_db)
    return bits, lte_demux_jax(llr)


def _embed(parts, K_true, K_bucket):
    ls, lp1, lp2, t1, t2 = parts
    F = K_bucket - K_true
    ls = jnp.pad(ls, ((0, 0), (F, 0)), constant_values=BIG_LLR)
    lp1 = jnp.pad(lp1, ((0, 0), (F, 0)))
    lp2 = jnp.pad(lp2, ((0, 0), (F, 0)))
    return ls, lp1, lp2, t1, t2


@pytest.mark.parametrize("siso", ["scan", "pallas"])
def test_embedded_decode_equals_native(siso):
    K_true, K_bucket, B = 40, 104, 8
    bits, parts = _tx_rx(K_true, B, esn0_db=1.0, seed=0)
    cfg_n = DecoderConfig(K=K_true, n_iters=3, mode="logmap", siso=siso)
    hard_n, it_n, L_n = turbo_decode(*parts, cfg_n)

    phi, inv = embedded_perm_tables([K_true] * B, K_bucket, "lte")
    cfg_e = dataclasses.replace(cfg_n, K=K_bucket)
    hard_e, it_e, L_e = turbo_decode(*_embed(parts, K_true, K_bucket), cfg_e,
                                     perm_b=jnp.asarray(phi),
                                     inv_b=jnp.asarray(inv))
    F = K_bucket - K_true
    np.testing.assert_array_equal(np.asarray(hard_e)[:, F:],
                                  np.asarray(hard_n))
    # Filler positions decode to the known zeros.
    assert not np.asarray(hard_e)[:, :F].any()
    # A-posteriori LLRs on the data region agree to fp32 tolerance (the
    # filler steps are pinned at state 0 with certainty, so the embedded
    # trellis is the native one up to renormalization noise).
    np.testing.assert_allclose(np.asarray(L_e)[:, F:], np.asarray(L_n),
                               rtol=2e-3, atol=2e-2)


def test_embedded_heterogeneous_single_call():
    """Three true block sizes decoded in one call, each against its own
    native decode."""
    K_bucket, B = 104, 4
    sizes = [40, 64, 104]
    all_parts, all_bits, natives = [], [], []
    for i, K in enumerate(sizes):
        bits, parts = _tx_rx(K, B, esn0_db=1.5, seed=10 + i)
        all_bits.append(bits)
        all_parts.append(parts)
        cfg = DecoderConfig(K=K, n_iters=4)
        natives.append(np.asarray(turbo_decode(*parts, cfg)[0]))

    Ks = sum(([K] * B for K in sizes), [])
    phi, inv = embedded_perm_tables(Ks, K_bucket, "lte")
    emb = [_embed(p, K, K_bucket) for p, K in zip(all_parts, sizes)]
    cat = lambda j: jnp.concatenate([e[j] for e in emb], axis=0)
    cfg_e = DecoderConfig(K=K_bucket, n_iters=4)
    hard, _, _ = turbo_decode(cat(0), cat(1), cat(2), cat(3), cat(4), cfg_e,
                              perm_b=jnp.asarray(phi), inv_b=jnp.asarray(inv))
    hard = np.asarray(hard)
    for g, K in enumerate(sizes):
        F = K_bucket - K
        np.testing.assert_array_equal(hard[g * B:(g + 1) * B, F:], natives[g])


@pytest.mark.parametrize("interleaver,k_mix,bucket", [
    ("lte", (40, 64, 104), 104),
    ("umts", (40, 80, 160), 160),
])
def test_harness_mixed_k_end_to_end(interleaver, k_mix, bucket):
    """The BER harness's honest mixed-K path: per-group tx at true K,
    per-group Es/N0, one embedded decode; clean at high Eb/N0."""
    cfg = SimConfig(
        name="mix", K=bucket, K_mix=k_mix, B=6, use_crc=True,
        decoder=DecoderConfig(K=bucket, n_iters=6, mode="logmap",
                              interleaver=interleaver, early_term="crc"))
    step = make_step(cfg)
    from turbotpu.harness.ber import _ebn0_to_esn0_db
    esn0 = jnp.float32(_ebn0_to_esn0_db(cfg, 6.0))
    be, fe, it, _ = step(jax.random.key(3), esn0)
    assert int(be) == 0 and int(fe) == 0
    # CRC early termination engaged well before the cap.
    assert int(it) < 6 * cfg.B


def test_harness_mixed_k_pallas_matches_scan():
    """Same mixed batch through the Pallas cells path and the scan path."""
    common = dict(name="mixp", K=104, K_mix=(40, 104), B=4, use_crc=False,
                  seed=9)
    esn0 = jnp.float32(3.0 + 10 * np.log10(1.0))
    outs = []
    for siso in ("scan", "pallas"):
        cfg = SimConfig(decoder=DecoderConfig(K=104, n_iters=2, siso=siso),
                        **common)
        step = make_step(cfg)
        outs.append(tuple(int(x) for x in step(jax.random.key(5), esn0)))
    assert outs[0] == outs[1]


@pytest.mark.parametrize("siso,interleaver", [
    ("scan", "lte"), ("pallas", "lte"), ("pallas", "umts")])
def test_grouped_tables_match_per_codeword(siso, interleaver):
    """The grouped mixed-K path (G shared row gathers + select -- the
    fast TPU form, round-5) must be BIT-IDENTICAL to the general
    per-codeword take_along_axis path on the same batch."""
    from turbotpu.decoder.bucketing import grouped_perm_tables
    K_bucket, B = 104, 4
    sizes = [40, 64, 104]
    emb = []
    for i, K in enumerate(sizes):
        _, parts = _tx_rx(K, B, esn0_db=1.5, seed=20 + i)
        emb.append(_embed(parts, K, K_bucket))
    cat = lambda j: jnp.concatenate([e[j] for e in emb], axis=0)
    args = (cat(0), cat(1), cat(2), cat(3), cat(4))

    Ks = sum(([K] * B for K in sizes), [])
    cfg = DecoderConfig(K=K_bucket, n_iters=4, siso=siso,
                        interleaver=interleaver,
                        early_term="crc" if siso == "pallas" else "none")
    phi, inv = embedded_perm_tables(Ks, K_bucket, interleaver)
    h_b, it_b, L_b = turbo_decode(*args, cfg, perm_b=jnp.asarray(phi),
                                  inv_b=jnp.asarray(inv))
    pg, ig, gid = grouped_perm_tables(Ks, K_bucket, interleaver)
    h_g, it_g, L_g = turbo_decode(
        *args, cfg, group_tables=(jnp.asarray(pg), jnp.asarray(ig),
                                  jnp.asarray(gid)))
    np.testing.assert_array_equal(np.asarray(h_b), np.asarray(h_g))
    np.testing.assert_array_equal(np.asarray(it_b), np.asarray(it_g))
    np.testing.assert_array_equal(np.asarray(L_b), np.asarray(L_g))
