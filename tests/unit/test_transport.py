"""Transport-block pipeline: CRC-24A + segmentation + per-block turbo
coding, end to end (TS 36.212 section 5.1)."""

import numpy as np
import pytest

from turbotpu.spec.crc import CRC_LEN
from turbotpu.spec.segmentation import segment_params
from turbotpu.transport import (decode_transport_block,
                                encode_transport_block,
                                transmit_transport_block)


def _roundtrip(A, ebn0_db, seed=0, **dec_kw):
    rng = np.random.default_rng(seed)
    info = rng.integers(0, 2, A).astype(np.int8)
    llr_blocks, seg = transmit_transport_block(info, ebn0_db, seed=seed + 1)
    out, crc_ok, details = decode_transport_block(llr_blocks, seg.B, **dec_kw)
    return info, out, crc_ok, details


def test_single_block_roundtrip():
    info, out, crc_ok, d = _roundtrip(1000, ebn0_db=4.0)
    assert d["seg"].C == 1 and d["seg"].F == 0
    assert crc_ok and (out == info).all()


def test_multi_block_roundtrip():
    A = 13000  # B = 13024 -> C = 3 code blocks
    info, out, crc_ok, d = _roundtrip(A, ebn0_db=1.5, n_iters=8)
    assert d["seg"].C == 3
    assert all(d["block_crc_ok"]) and crc_ok
    assert (out == info).all()
    # CRC early termination engaged per block.
    assert (d["iters"] < 8).all()


def test_filler_bits_handled():
    A = 6145 - CRC_LEN  # B = 6145 -> two blocks with F = 15 filler bits
    seg = segment_params(6145)
    assert seg.F > 0 and seg.C == 2 and seg.K_minus > 0
    info, out, crc_ok, d = _roundtrip(A, ebn0_db=1.5, n_iters=8)
    assert crc_ok and (out == info).all()


def test_mixed_k_groups_decode_batched():
    """B = 6145 yields one K- and one K+ block: two distinct decode
    shapes, each a batch of one."""
    A = 6145 - CRC_LEN
    info, out, crc_ok, d = _roundtrip(A, ebn0_db=2.0)
    assert len(set(d["seg"].sizes)) == 2
    assert crc_ok and (out == info).all()


def test_crc_detects_garbage():
    info, out, crc_ok, d = _roundtrip(13000, ebn0_db=-6.0, n_iters=2)
    assert not crc_ok
    assert not all(d["block_crc_ok"])


def test_per_block_e_allocation():
    from turbotpu.transport import per_block_e
    es = per_block_e(10000, 3)
    assert sum(es) == 10000
    assert es == (3333, 3333, 3334)
    assert per_block_e(9999, 3) == (3333, 3333, 3333)


def test_rate_matched_puncturing_roundtrip():
    """Multi-block TB punctured to ~rate 1/2 end to end."""
    rng = np.random.default_rng(10)
    A = 13000
    info = rng.integers(0, 2, A).astype(np.int8)
    seg = segment_params(A + CRC_LEN)
    G = 2 * seg.B
    llr_blocks, seg = transmit_transport_block(info, ebn0_db=2.2, seed=11,
                                               G=G, rv=0)
    assert all(np.ndim(b) == 1 for b in llr_blocks)
    assert sum(len(b) for b in llr_blocks) == G
    out, crc_ok, d = decode_transport_block(llr_blocks, seg.B, n_iters=8,
                                            rate_matched=True, rv=0)
    assert crc_ok and (out == info).all()


def test_rate_matched_repetition_roundtrip():
    """Repetition (E_r > 3K+12) combines LLRs; decodes at low SNR."""
    rng = np.random.default_rng(12)
    A = 13000
    info = rng.integers(0, 2, A).astype(np.int8)
    seg = segment_params(A + CRC_LEN)
    G = 4 * seg.B
    llr_blocks, seg = transmit_transport_block(info, ebn0_db=1.0, seed=13,
                                               G=G, rv=0)
    out, crc_ok, d = decode_transport_block(llr_blocks, seg.B, n_iters=8,
                                            rate_matched=True, rv=0)
    assert crc_ok and (out == info).all()


def test_rate_matched_filler_null_roundtrip():
    """F > 0 under rate matching: filler bits are <NULL>, never transmitted
    (TS 36.212 s5.1.4.1.1), and the receiver still decodes cleanly."""
    from turbotpu.spec.rate_match import select_indices
    A = 6145 - CRC_LEN  # seg: C=2, F=15
    seg = segment_params(A + CRC_LEN)
    assert seg.F > 0
    rng = np.random.default_rng(20)
    info = rng.integers(0, 2, A).astype(np.int8)
    G = 2 * seg.B
    llr_blocks, seg = transmit_transport_block(info, ebn0_db=2.2, seed=21,
                                               G=G, rv=0)
    # Block 0's selection must exclude every filler index in d0 and d1.
    from turbotpu.transport import per_block_e
    E0 = per_block_e(G, seg.C)[0]
    idx = select_indices(seg.sizes[0], E0, rv=0, F=seg.F)
    D0 = seg.sizes[0] + 4
    filler = set(range(seg.F)) | set(range(D0, D0 + seg.F))
    assert not (set(idx.tolist()) & filler)
    out, crc_ok, d = decode_transport_block(llr_blocks, seg.B, n_iters=8,
                                            rate_matched=True, rv=0)
    assert crc_ok and (out == info).all()


def test_harq_ir_gain():
    """Incremental redundancy: FER over seeds is monotone non-increasing in
    the number of retransmissions, with a strict gain from 1 -> 4 tx.
    Heavily punctured mother code at low per-transmission SNR so single-shot
    decoding mostly fails; rv sequence 0,2,3,1 per the LTE default."""
    A = 1000
    seg = segment_params(A + CRC_LEN)
    G = int(1.15 * (A + CRC_LEN))  # rate ~0.87 single-shot: very weak
    fails = {1: 0, 2: 0, 4: 0}
    n_seeds = 8
    rv_seq = (0, 2, 3, 1)
    for seed in range(n_seeds):
        rng = np.random.default_rng(100 + seed)
        info = rng.integers(0, 2, A).astype(np.int8)
        # One 4-transmission realization; prefixes give the 1- and 2-tx
        # receivers (same noise, fewer transmissions seen).
        llr_blocks, seg = transmit_transport_block(
            info, ebn0_db=3.0, seed=200 + seed, G=G, rv=rv_seq)
        for n_tx in fails:
            blocks_n = [txs[:n_tx] for txs in llr_blocks]
            out, crc_ok, _ = decode_transport_block(
                blocks_n, seg.B, n_iters=8, rate_matched=True,
                rv=rv_seq[:n_tx])
            if not (crc_ok and (out == info).all()):
                fails[n_tx] += 1
    assert fails[1] >= fails[2] >= fails[4]
    assert fails[1] > fails[4]
    assert fails[4] == 0  # 4-fold IR at 3 dB decodes every seed


def test_encode_block_sizes_legal():
    blocks, seg = encode_transport_block(
        np.zeros(20000, np.int8))
    assert seg.C == 4
    for parts, K in zip(blocks, seg.sizes):
        sys, p1, p2, t1, t2 = parts
        assert sys.shape == (K,) and p1.shape == (K,) and p2.shape == (K,)
        assert t1.shape == (6,) and t2.shape == (6,)
