"""RSC trellis tables for the 3GPP turbo constituent code.

Both LTE (TS 36.212 section 5.1.3.2.1) and UMTS (TS 25.212 section 4.2.3.1)
turbo codes use the same 8-state recursive systematic convolutional (RSC)
constituent encoder with transfer function

    G(D) = [1, g1(D)/g0(D)],   g0(D) = 1 + D^2 + D^3  (octal 13, feedback)
                               g1(D) = 1 + D  + D^3  (octal 15, feedforward)

Capability parity note: the CUDA reference (xinxu27/turbo_decoder_cuda,
unavailable -- see SURVEY.md section 0) would hold these as C++ const arrays;
here they are small numpy constants baked into JAX/Pallas kernels at trace
time (SURVEY.md section 3 component 1).

State convention: state s = (a_{k-1} << 2) | (a_{k-2} << 1) | a_{k-3} where
a are the feedback-register bits.  For input u:
    fb      = a_{k-2} ^ a_{k-3}           (taps of g0 minus the input term)
    a_k     = u ^ fb
    parity  = a_k ^ a_{k-1} ^ a_{k-3}     (taps of g1)
    s'      = (a_k << 2) | (a_{k-1} << 1) | a_{k-2}
"""

from __future__ import annotations

import dataclasses

import numpy as np

N_STATES = 8


@dataclasses.dataclass(frozen=True)
class Trellis:
    """Static trellis tables. All arrays are int8/int32 numpy constants.

    next_state[s, u]  : state reached from s with information bit u
    parity[s, u]      : parity (encoded second output) bit emitted
    prev_state[s, u]  : state s' such that next_state[s', u] == s
    prev_parity[s, u] : parity bit on the branch prev_state[s,u] -> s
    tail_bit[s]       : input that drives the encoder toward state 0
                        (termination: u = fb so that a_k = 0)
    """

    next_state: np.ndarray
    parity: np.ndarray
    prev_state: np.ndarray
    prev_parity: np.ndarray
    tail_bit: np.ndarray


def _step(state: int, u: int) -> tuple[int, int]:
    a1 = (state >> 2) & 1  # a_{k-1}
    a2 = (state >> 1) & 1  # a_{k-2}
    a3 = state & 1         # a_{k-3}
    fb = a2 ^ a3
    ak = u ^ fb
    parity = ak ^ a1 ^ a3
    nxt = (ak << 2) | (a1 << 1) | a2
    return nxt, parity


def build_trellis() -> Trellis:
    next_state = np.zeros((N_STATES, 2), dtype=np.int32)
    parity = np.zeros((N_STATES, 2), dtype=np.int32)
    tail_bit = np.zeros((N_STATES,), dtype=np.int32)
    for s in range(N_STATES):
        for u in (0, 1):
            nxt, p = _step(s, u)
            next_state[s, u] = nxt
            parity[s, u] = p
        a2 = (s >> 1) & 1
        a3 = s & 1
        tail_bit[s] = a2 ^ a3  # u = fb makes a_k = 0

    prev_state = np.zeros((N_STATES, 2), dtype=np.int32)
    prev_parity = np.zeros((N_STATES, 2), dtype=np.int32)
    seen = np.zeros((N_STATES, 2), dtype=bool)
    for s in range(N_STATES):
        for u in (0, 1):
            ns = next_state[s, u]
            assert not seen[ns, u], "trellis not u-invertible"
            prev_state[ns, u] = s
            prev_parity[ns, u] = parity[s, u]
            seen[ns, u] = True
    assert seen.all()
    return Trellis(next_state, parity, prev_state, prev_parity, tail_bit)


TRELLIS = build_trellis()
