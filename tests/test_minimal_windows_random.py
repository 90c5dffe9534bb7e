"""Randomized differential test for the unordered sloppy-phrase kernel:
``_minimal_windows_freq`` (streaming scan with the same-left/same-right
reduction) vs an independent brute-force specification — enumerate EVERY
slot-position combination, keep containment-minimal intervals, weight
1/(1+width) summed in increasing window order. Hundreds of random cases
across slot counts, occurrence densities, shared positions, and slops;
no Spark involved, so this runs in milliseconds."""

from itertools import product

import numpy as np

from bitcoin_ledger_2es_spark.operators.phrase import _minimal_windows_freq


def _brute_force_freq(occ: list[list[int]], slop: int) -> float:
    wins = {(min(c), max(c)) for c in product(*occ)}
    minimal = sorted(
        (l, r)
        for l, r in wins
        if not any((l2, r2) != (l, r) and l2 >= l and r2 <= r for l2, r2 in wins)
    )
    freq = 0.0
    for l, r in minimal:
        if r - l <= slop:
            freq += 1.0 / (1.0 + (r - l))
    return freq


def _kernel_freq(occ: list[list[int]], slop: int) -> float:
    events = sorted(
        (p, s) for s, ps in enumerate(occ) for p in ps
    )
    pos = np.array([p for p, _ in events], dtype=np.int64)
    slot = np.array([s for _, s in events], dtype=np.int64)
    return _minimal_windows_freq(pos, slot, len(occ), slop)


def test_hand_cases():
    # worked examples from the kernel's design notes: two width-2 minimal
    # windows (1,3) and (3,5), each weighted 1/3
    got = _kernel_freq([[1, 5], [3]], 2)
    assert got == _brute_force_freq([[1, 5], [3]], 2)
    assert abs(got - 2.0 / 3.0) < 1e-12
    assert _kernel_freq([[1, 3], [2, 3]], 1) == _brute_force_freq([[1, 3], [2, 3]], 1)
    assert _kernel_freq([[2, 4], [2]], 0) == _brute_force_freq([[2, 4], [2]], 0) == 1.0
    # transposition: adjusted positions [1], [-1] -> width 2 -> 1/3
    assert abs(_kernel_freq([[1], [-1]], 2) - 1.0 / 3.0) < 1e-12
    assert _kernel_freq([[1], [-1]], 1) == 0.0


def test_random_differential():
    rng = np.random.default_rng(42)
    n_checked = 0
    for _ in range(400):
        n_slots = int(rng.integers(2, 5))
        occ = []
        for _s in range(n_slots):
            k = int(rng.integers(1, 6))
            # adjusted positions may be negative and may coincide across slots
            occ.append(sorted(int(x) for x in rng.integers(-3, 15, k)))
        slop = int(rng.integers(0, 8))
        a = _kernel_freq(occ, slop)
        b = _brute_force_freq(occ, slop)
        assert a == b, (occ, slop, a, b)
        n_checked += 1
    assert n_checked == 400


def test_dense_duplicate_positions():
    """Heavy position collisions (every slot occupying the same few spots)
    stress the same-left/same-right reduction rules."""
    rng = np.random.default_rng(7)
    for _ in range(200):
        n_slots = int(rng.integers(2, 4))
        occ = [sorted(int(x) for x in rng.integers(0, 4, int(rng.integers(1, 5))))
               for _ in range(n_slots)]
        # duplicate positions WITHIN one slot's list collapse (sets in both)
        occ = [sorted(set(ps)) for ps in occ]
        for slop in (0, 1, 3):
            assert _kernel_freq(occ, slop) == _brute_force_freq(occ, slop), (occ, slop)
