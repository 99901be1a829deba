"""Unit tests for bench.py's scaling-round estimator helpers.

No Spark: `_drop_episodes` is pure arithmetic over round dicts. The
fixture numbers replay the round-4 evidence run recorded in BASELINE.md
(addendum 3): five steal-clean rounds at efficiencies 0.42 / 0.49 /
0.90 / 0.78 / 0.79, where the two collapses were single-sided (the
8-core window uniformly ~2x slow at <=0.4% steal while the 2-core side
simultaneously ran its fastest) — invisible to the steal filter.
"""

import importlib.util
from pathlib import Path


def _load_bench():
    spec = importlib.util.spec_from_file_location(
        "bench", Path(__file__).resolve().parent.parent / "bench.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _round(eps_small, eps_large):
    return {
        "eps_small": eps_small,
        "eps_large": eps_large,
        "efficiency": round(eps_large / (4 * eps_small), 4),
    }


EVIDENCE_RUN = [
    _round(95_000, 160_000),  # 0.42: large side collapsed, small fastest
    _round(90_000, 176_000),  # 0.49: same episode
    _round(80_000, 288_000),  # 0.90
    _round(82_000, 256_000),  # 0.78
    _round(81_000, 256_000),  # 0.79
]


def test_rejects_single_sided_slow_episode():
    bench = _load_bench()
    kept, n = bench._drop_episodes(EVIDENCE_RUN)
    assert n == 2
    assert sorted(r["efficiency"] for r in kept) == [0.7805, 0.7901, 0.9]


def test_direction_neutral_rejects_fast_side_too():
    bench = _load_bench()
    rounds = EVIDENCE_RUN[2:] + [
        _round(80_000, 480_000),  # large side implausibly FAST (eff 1.5)
        _round(80_000, 256_000),
    ]
    kept, n = bench._drop_episodes(rounds)
    assert n == 1
    assert all(r["efficiency"] <= 1.0 for r in kept)


def test_small_sets_and_insufficient_survivors_untouched():
    bench = _load_bench()
    # <4 rounds: no rejection even when one round is clearly an episode
    kept, n = bench._drop_episodes(EVIDENCE_RUN[:3])
    assert n == 0 and len(kept) == 3
    # rejection that would leave <3 survivors is refused wholesale
    rounds = [
        _round(95_000, 160_000),
        _round(90_000, 176_000),
        _round(80_000, 288_000),
        _round(20_000, 288_000),  # small side off-median too
    ]
    kept, n = bench._drop_episodes(rounds)
    assert n == 0 and len(kept) == 4


def test_peak_eff_is_symmetric_best_of_both_sides():
    bench = _load_bench()
    rounds = [
        _round(100_000, 300_000),  # 0.75
        _round(105_000, 340_000),  # 0.81: small side's best round
        _round(100_000, 356_000),  # 0.89: large side's best round
    ]
    # peak pairs each side's own best (356k / (4 * 105k)), NOT the best
    # single-round ratio (0.89) — a fast small-side window lowers it
    assert bench._peak_eff(rounds) == round(356_000 / (4 * 105_000), 4)
    # degenerate single-round set: peak == that round's efficiency
    assert bench._peak_eff(rounds[:1]) == 0.75
