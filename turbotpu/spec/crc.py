"""3GPP CRC-24A / CRC-24B (TS 36.212 section 5.1.1).

gCRC24A(D) = D^24 + D^23 + D^18 + D^17 + D^14 + D^11 + D^10 + D^7 + D^6
           + D^5 + D^4 + D^3 + D + 1                       (0x864CFB)
gCRC24B(D) = D^24 + D^23 + D^6 + D^5 + D + 1               (0x800063)

Initial register 0, no final XOR, MSB-first bit order (the spec's systematic
polynomial division).  CRC-24A frames the transport block; CRC-24B frames
each code block after segmentation; either serves as the early-termination
oracle (SURVEY.md section 3, components 4 and 20).

Besides the scalar bit-loop golden path, this module precomputes the GF(2)
generator matrix G[K, 24] with G[i] = remainder of x^(K-1-i+24) mod g(x), so
the on-device batched CRC check is a single int matmul + mod 2 -- the
TPU-native replacement for the reference's per-codeword CRC kernel.
"""

from __future__ import annotations

import functools

import numpy as np

CRC24A_POLY = 0x864CFB
CRC24B_POLY = 0x800063
CRC_LEN = 24


def crc24(bits: np.ndarray, poly: int) -> np.ndarray:
    """Scalar golden CRC: 24 parity bits (MSB first) for a 0/1 bit vector."""
    reg = 0
    for b in np.asarray(bits, dtype=np.int64):
        reg = ((reg << 1) | int(b)) & 0x1FFFFFF
        if reg >> 24:
            reg ^= (1 << 24) | poly
    # Flush 24 zero bits.
    for _ in range(CRC_LEN):
        reg = (reg << 1) & 0x1FFFFFF
        if reg >> 24:
            reg ^= (1 << 24) | poly
    return np.array([(reg >> (23 - i)) & 1 for i in range(CRC_LEN)], dtype=np.int8)


def crc24a(bits: np.ndarray) -> np.ndarray:
    return crc24(bits, CRC24A_POLY)


def crc24b(bits: np.ndarray) -> np.ndarray:
    return crc24(bits, CRC24B_POLY)


def crc_attach(bits: np.ndarray, poly: int = CRC24A_POLY) -> np.ndarray:
    return np.concatenate([np.asarray(bits, dtype=np.int8), crc24(bits, poly)])


def crc_check(bits_with_crc: np.ndarray, poly: int = CRC24A_POLY) -> bool:
    """True iff the trailing 24 bits are a valid CRC of the rest."""
    b = np.asarray(bits_with_crc)
    return bool((crc24(b[:-CRC_LEN], poly) == b[-CRC_LEN:]).all())


@functools.lru_cache(maxsize=None)
def crc_matrix(K: int, poly: int = CRC24A_POLY) -> np.ndarray:
    """G[K, 24] over GF(2): crc(bits) == (bits @ G) % 2 for len-K bits.

    Row i is the CRC of the unit vector e_i, i.e. x^(K-1-i+24) mod g(x).
    Computed in O(K) by stepping a single remainder register.
    """
    G = np.zeros((K, CRC_LEN), dtype=np.int8)
    # remainder of x^24 mod g for the last message bit (i = K-1): shift 1 by
    # 24 and reduce once.
    rem = (1 << 24) ^ ((1 << 24) | poly)  # == poly
    G[K - 1] = [(rem >> (23 - j)) & 1 for j in range(CRC_LEN)]
    for i in range(K - 2, -1, -1):
        rem = (rem << 1) & 0x1FFFFFF
        if rem >> 24:
            rem ^= (1 << 24) | poly
        G[i] = [(rem >> (23 - j)) & 1 for j in range(CRC_LEN)]
    return G
