import numpy as np

from turbotpu.spec.trellis import N_STATES, TRELLIS, build_trellis


def test_shapes():
    t = TRELLIS
    assert t.next_state.shape == (N_STATES, 2)
    assert t.prev_state.shape == (N_STATES, 2)


def test_next_prev_consistency():
    t = TRELLIS
    for s in range(N_STATES):
        for u in (0, 1):
            assert t.prev_state[t.next_state[s, u], u] == s
            assert t.prev_parity[t.next_state[s, u], u] == t.parity[s, u]


def test_each_state_has_two_predecessors():
    t = TRELLIS
    for u in (0, 1):
        assert sorted(t.next_state[:, u]) == list(range(N_STATES))


def test_termination_reaches_zero():
    t = TRELLIS
    for s0 in range(N_STATES):
        s = s0
        for _ in range(3):
            s = t.next_state[s, t.tail_bit[s]]
        assert s == 0


def test_impulse_response():
    # From state 0, input 1: feedback makes the register recirculate; the
    # parity of the first step for u=1 from s=0 is g1 applied to a_k=1 -> 1.
    t = TRELLIS
    assert t.parity[0, 0] == 0
    assert t.parity[0, 1] == 1
    assert t.next_state[0, 0] == 0
    assert t.next_state[0, 1] == 4  # a_k=1 -> state (1,0,0) = 4
