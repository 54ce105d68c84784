import numpy as np
import pytest

from turbotpu.spec.crc import (CRC24A_POLY, CRC24B_POLY, CRC_LEN, crc24,
                               crc_attach, crc_check, crc_matrix)


@pytest.mark.parametrize("poly", [CRC24A_POLY, CRC24B_POLY])
def test_attach_check_roundtrip(poly):
    rng = np.random.default_rng(0)
    for K in (8, 40, 129, 1000):
        b = rng.integers(0, 2, K).astype(np.int8)
        att = crc_attach(b, poly)
        assert len(att) == K + CRC_LEN
        assert crc_check(att, poly)
        for flip in (0, K // 2, K + CRC_LEN - 1):
            bad = att.copy()
            bad[flip] ^= 1
            assert not crc_check(bad, poly)


def test_all_zero_crc_is_zero():
    # CRC of the zero message with zero initial register is zero.
    assert (crc24(np.zeros(50, np.int8), CRC24A_POLY) == 0).all()


def test_single_bit_crc_is_poly_shift():
    # Message '1': remainder = x^24 mod g = g - x^24 = low 24 bits of poly.
    out = crc24(np.array([1], np.int8), CRC24A_POLY)
    val = int("".join(map(str, out)), 2)
    assert val == CRC24A_POLY & 0xFFFFFF


@pytest.mark.parametrize("poly", [CRC24A_POLY, CRC24B_POLY])
def test_matrix_form_matches_scalar(poly):
    rng = np.random.default_rng(1)
    for K in (24, 40, 512):
        G = crc_matrix(K, poly)
        for _ in range(5):
            b = rng.integers(0, 2, K).astype(np.int64)
            assert (crc24(b, poly) == (b @ G.astype(np.int64)) % 2).all()


def test_linearity():
    rng = np.random.default_rng(2)
    a = rng.integers(0, 2, 100).astype(np.int8)
    b = rng.integers(0, 2, 100).astype(np.int8)
    assert (crc24(a ^ b, CRC24A_POLY)
            == crc24(a, CRC24A_POLY) ^ crc24(b, CRC24A_POLY)).all()
