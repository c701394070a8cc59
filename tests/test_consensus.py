"""Ouroboros Samasika chain-selection rule vectors (negative paths).

Each case cites the rule it pins down in the reference spec
(/root/reference/README.md:606-778). Pure host logic — no device code.
"""

from mina_bridge_tpu.bridge.consensus import (
    GRACE_PERIOD_END,
    SLOTS_PER_SUB_WINDOW,
    SUB_WINDOWS_PER_WINDOW,
    ConsensusState,
    EpochData,
    candidate_wins,
    is_short_range,
    project_window,
    relative_min_window_density,
    select_longer_chain,
    select_secure_chain,
)


def epoch(lock: int, start: int = 11) -> EpochData:
    return EpochData(
        ledger_hash=1,
        seed=2,
        start_checkpoint=start,
        lock_checkpoint=lock,
        epoch_length=100,
    )


def cs(
    length=100,
    epoch_count=5,
    min_density=20,
    densities=None,
    vrf=b"\x01" * 32,
    slot=20_000,
    staking_lock=111,
    next_lock=222,
    state_hash=1,
):
    return ConsensusState(
        blockchain_length=length,
        epoch_count=epoch_count,
        min_window_density=min_density,
        sub_window_densities=list(
            densities if densities is not None else [7] * SUB_WINDOWS_PER_WINDOW
        ),
        last_vrf_output=vrf,
        global_slot=slot,
        global_slot_since_genesis=slot,
        staking_epoch_data=epoch(staking_lock),
        next_epoch_data=epoch(next_lock),
        state_hash=state_hash,
    )


# --- decentralized checkpointing / short-range detection (README:633-651) --

def test_same_epoch_same_lock_is_short_range():
    a = cs(staking_lock=99)
    b = cs(staking_lock=99, next_lock=333)
    assert is_short_range(a, b)


def test_same_epoch_different_lock_is_long_range():
    a = cs(staking_lock=99)
    b = cs(staking_lock=98)
    assert not is_short_range(a, b)


def test_candidate_one_epoch_ahead_short_range_both_orders():
    """Fork point in the previous epoch: the newer block's staking
    (previous-epoch) lock checkpoint must equal the older block's
    in-progress (next) lock checkpoint — checked in BOTH argument
    orders (README:646-651)."""
    older = cs(epoch_count=5, next_lock=777)
    newer = cs(epoch_count=6, staking_lock=777)
    assert is_short_range(newer, older)
    assert is_short_range(older, newer)


def test_candidate_one_epoch_ahead_wrong_lock_is_long_range():
    older = cs(epoch_count=5, next_lock=777)
    newer = cs(epoch_count=6, staking_lock=778)
    assert not is_short_range(newer, older)
    assert not is_short_range(older, newer)


def test_epoch_gap_two_is_always_long_range():
    """A >=2 epoch gap can never be short-range, even with matching
    checkpoints everywhere (README:640-645)."""
    a = cs(epoch_count=5, staking_lock=777, next_lock=777)
    b = cs(epoch_count=7, staking_lock=777, next_lock=777)
    assert not is_short_range(a, b)


# --- selectLongerChain tiebreaks (README:766) ------------------------------

def test_short_range_longer_candidate_wins():
    tip = cs(length=100)
    cand = cs(length=101)
    assert select_longer_chain(tip, cand) is cand
    assert candidate_wins(tip, cand)


def test_short_range_shorter_candidate_loses():
    tip = cs(length=100)
    cand = cs(length=99)
    assert not candidate_wins(tip, cand)


def test_equal_length_vrf_tiebreak_both_directions():
    tip = cs(vrf=b"\x05" + b"\x00" * 31)
    win = cs(vrf=b"\x06" + b"\x00" * 31)
    lose = cs(vrf=b"\x04" + b"\x00" * 31)
    assert select_longer_chain(tip, win) is win
    assert select_longer_chain(tip, lose) is tip


def test_equal_length_equal_vrf_state_hash_tiebreak():
    tip = cs(state_hash=10)
    win = cs(state_hash=11)
    lose = cs(state_hash=9)
    assert select_longer_chain(tip, win) is win
    assert select_longer_chain(tip, lose) is tip
    # exact tie keeps the tip (candidate must strictly win)
    assert select_longer_chain(tip, cs(state_hash=10)) is tip


# --- sliding-window projection (README:698-735) ----------------------------

def test_projection_same_sub_window_no_shift():
    """k = 0 -> shift_count = 0: window unchanged."""
    st = cs(densities=list(range(11)), slot=77 * SLOTS_PER_SUB_WINDOW)
    assert project_window(st, st.global_slot + 3) == list(range(11))


def test_projection_adjacent_sub_window_keeps_all():
    """k = 1 -> shift_count = max(k-1, 0) = 0: the most recent previous
    sub-window is kept (README:717-719)."""
    st = cs(densities=list(range(11)), slot=77 * SLOTS_PER_SUB_WINDOW)
    assert (
        project_window(st, st.global_slot + SLOTS_PER_SUB_WINDOW)
        == list(range(11))
    )


def test_projection_k4_zeroes_three():
    """The README's worked example: k = 4 -> shift 3 zeros in
    (README:723-729)."""
    base = 11 * SLOTS_PER_SUB_WINDOW  # sub-window 11 -> rel index 0
    st = cs(densities=[5] * 11, slot=base)
    out = project_window(st, (11 + 4) * SLOTS_PER_SUB_WINDOW)
    assert out == [5, 0, 0, 0] + [5] * 7


def test_projection_ring_wraparound():
    """Eviction index wraps modulo 11: starting at rel index 9, a k = 4
    projection zeroes rel indices 10, 0, 1."""
    base = 9 * SLOTS_PER_SUB_WINDOW
    st = cs(densities=list(range(11)), slot=base)
    out = project_window(st, (9 + 4) * SLOTS_PER_SUB_WINDOW)
    expect = list(range(11))
    expect[10] = 0
    expect[0] = 0
    expect[1] = 0
    assert out == expect


def test_projection_beyond_window_zeroes_everything():
    """k > 11 sub-windows ahead: shift_count caps at 11 and the whole
    window empties (README:721)."""
    st = cs(densities=[7] * 11, slot=0)
    out = project_window(st, 100 * SLOTS_PER_SUB_WINDOW)
    assert out == [0] * 11


# --- relative minimum window density / long-range rule (README:737-766) ----

def test_grace_period_uses_raw_min_density():
    """Before GRACE_PERIOD_END the projection is skipped entirely."""
    tip = cs(min_density=3, densities=[0] * 11, slot=GRACE_PERIOD_END - 10)
    cand = cs(min_density=2, slot=GRACE_PERIOD_END - 5)
    assert relative_min_window_density(tip, cand) == 3


def test_grace_period_boundary_activates_projection():
    """At exactly GRACE_PERIOD_END the rule activates: a stale tip's
    projected window (all zeros) drags its density to 0."""
    tip = cs(min_density=30, densities=[7] * 11, slot=100)
    cand = cs(slot=max(GRACE_PERIOD_END, 100 * SLOTS_PER_SUB_WINDOW))
    assert relative_min_window_density(tip, cand) == 0


def test_long_range_denser_candidate_wins_even_if_shorter():
    """Long-range fork: density decides, not length (README:758-764)."""
    slot = 30_000
    tip = cs(
        length=500, min_density=5, densities=[0] * 11,
        staking_lock=1, slot=slot,
    )
    cand = cs(
        length=400, min_density=20, densities=[7] * 11,
        staking_lock=2, slot=slot + 1,
    )
    assert not is_short_range(tip, cand)
    assert candidate_wins(tip, cand)


def test_long_range_sparser_candidate_loses_even_if_longer():
    slot = 30_000
    tip = cs(
        length=400, min_density=20, densities=[7] * 11,
        staking_lock=1, slot=slot + 1,
    )
    cand = cs(
        length=500, min_density=5, densities=[0] * 11,
        staking_lock=2, slot=slot,
    )
    assert not candidate_wins(tip, cand)


def test_long_range_equal_density_falls_back_to_length():
    slot = 30_000
    tip = cs(
        length=400, min_density=10, densities=[7] * 11,
        staking_lock=1, slot=slot,
    )
    cand = cs(
        length=401, min_density=10, densities=[7] * 11,
        staking_lock=2, slot=slot,
    )
    assert candidate_wins(tip, cand)
    shorter = cs(
        length=399, min_density=10, densities=[7] * 11,
        staking_lock=2, slot=slot,
    )
    assert not candidate_wins(tip, shorter)


def test_stale_tip_projection_asymmetry():
    """The whole point of the RELATIVE density (README:741-748): a tip
    that has been offline for many windows projects to zero density and
    loses to a live candidate with normal density, even though its
    stored min_window_density is higher."""
    old_slot = 20_000
    new_slot = old_slot + 20 * SLOTS_PER_SUB_WINDOW
    tip = cs(
        length=1000, min_density=25, densities=[7] * 11,
        staking_lock=1, slot=old_slot,
    )
    cand = cs(
        length=900, min_density=15, densities=[2] * 11,
        staking_lock=2, slot=new_slot,
    )
    # tip's window projected 20 sub-windows forward -> all zeros
    assert relative_min_window_density(tip, cand) == 0
    # candidate is at the max slot already -> keeps its own density
    assert relative_min_window_density(cand, tip) == min(15, 22)
    assert candidate_wins(tip, cand)
