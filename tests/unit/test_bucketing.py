import numpy as np
import pytest

from turbotpu.decoder.bucketing import bucket_ceilings, decode_mixed
from turbotpu.decoder.turbo import DecoderConfig
from turbotpu.golden import numpy_ref as npr
from turbotpu.spec.qpp import LEGAL_K, qpp_perm
from turbotpu.spec.umts import umts_perm


def _make(K, seed, interleaver="umts", ebn0_db=3.0):
    rng = np.random.default_rng(seed)
    bits = rng.integers(0, 2, K).astype(np.int8)
    perm = umts_perm(K) if interleaver == "umts" else qpp_perm(K)
    parts = npr.turbo_encode(bits, perm)
    enc = np.concatenate(parts).astype(np.float64)
    sigma = np.sqrt(1 / (2 * 10 ** (ebn0_db / 10) / 3))
    y = (1 - 2 * enc) + sigma * rng.normal(size=enc.shape)
    llr = 2 * y / sigma ** 2
    ofs = np.cumsum([0, K, K, K, 6, 6])
    keys = ("ls", "lp1", "lp2", "tail1", "tail2")
    return bits, {k: llr[ofs[i]:ofs[i + 1]] for i, k in enumerate(keys)}


def test_mixed_umts_sizes_decode():
    """C3-style workload: UMTS codewords of different K in one call."""
    sizes = [40, 80, 160, 40, 320, 80]
    bits, cws = zip(*[_make(K, 10 + i) for i, K in enumerate(sizes)])
    cfg = DecoderConfig(K=0, n_iters=6, interleaver="umts")
    out = decode_mixed(list(cws), cfg)
    for i, K in enumerate(sizes):
        assert out.hard[i].shape == (K,)
        assert (out.hard[i] == bits[i]).all(), f"codeword {i} (K={K})"


def test_mixed_matches_uniform():
    sizes = [104, 104, 104]
    bits, cws = zip(*[_make(K, 20 + i, "lte") for i, K in enumerate(sizes)])
    cfg = DecoderConfig(K=0, n_iters=4)
    out = decode_mixed(list(cws), cfg)
    from turbotpu.decoder.turbo import turbo_decode
    import jax.numpy as jnp
    stack = lambda k: jnp.asarray(np.stack([np.asarray(c[k], np.float32)
                                            for c in cws]))
    h, _, _ = turbo_decode(stack("ls"), stack("lp1"), stack("lp2"),
                           stack("tail1"), stack("tail2"),
                           DecoderConfig(K=104, n_iters=4))
    for i in range(3):
        assert (out.hard[i] == np.asarray(h)[i]).all()


def test_bucket_ceilings():
    m = bucket_ceilings([40, 41, 100, 6144], LEGAL_K)
    assert m[40] == 40 and m[41] == 48 and m[100] == 104 and m[6144] == 6144
    with pytest.raises(ValueError):
        bucket_ceilings([9999], LEGAL_K)
