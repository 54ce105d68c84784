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


def test_encode_block_sizes_legal():
    blocks, seg = encode_transport_block(
        np.zeros(20000, np.int8))
    assert seg.C == 4
    for parts, K in zip(blocks, seg.sizes):
        sys, p1, p2, t1, t2 = parts
        assert sys.shape == (K,) and p1.shape == (K,) and p2.shape == (K,)
        assert t1.shape == (6,) and t2.shape == (6,)
