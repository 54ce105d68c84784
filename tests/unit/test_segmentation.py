import numpy as np
import pytest

from turbotpu.spec.crc import CRC24B_POLY, crc_check
from turbotpu.spec.qpp import LEGAL_K
from turbotpu.spec.segmentation import desegment, segment, segment_params


def test_single_block():
    p = segment_params(100)
    assert p.C == 1 and p.sizes == (104,) and p.F == 4


def test_max_single_block():
    p = segment_params(6144)
    assert p.C == 1 and p.sizes == (6144,) and p.F == 0


def test_two_blocks():
    p = segment_params(6145)
    assert p.C == 2
    assert all(k in LEGAL_K for k in p.sizes)
    total = sum(p.sizes)
    assert total == 6145 + 2 * 24 + p.F


@pytest.mark.parametrize("B", [40, 100, 6144, 6145, 10000, 20000])
def test_roundtrip(B):
    rng = np.random.default_rng(B)
    bits = rng.integers(0, 2, B).astype(np.int8)
    blocks = segment(bits)
    p = segment_params(B)
    assert len(blocks) == p.C
    for blk, K in zip(blocks, p.sizes):
        assert len(blk) == K
        if p.C > 1:
            assert crc_check(blk, CRC24B_POLY)
    back = desegment(blocks, B)
    assert (back == bits).all()
