"""Bench measurement-integrity guard (bench.py).

BENCH_r04 archived a physically impossible throughput row (204.8M f/s =
1110% of the bf16 roofline) because one corrupted timing block — the
tunneled runtime's ``block_until_ready`` returning without waiting — won the
best-of-blocks min. These tests pin the guard that makes that impossible:
any block faster than the roofline bound for its known FLOP count is
discarded and re-measured, and an all-suspect run raises instead of
reporting a number.
"""

import pytest

import bench as B


def _script(durations):
    it = iter(durations)
    return lambda: next(it)


def test_plausible_floor_matches_roofline():
    # 197 TFLOP/s peak: 197e12 FLOPs can't finish in under a second.
    assert B.plausible_floor_s(B.PEAK_BF16_TFLOPS * 1e12) == pytest.approx(1.0)
    assert B.plausible_floor_s(None) is None
    assert B.plausible_floor_s(0) is None


def test_suspect_block_discarded_and_remeasured():
    # Block 2 claims 197e12 FLOPs in 1.6 ms (the BENCH_r04 failure shape);
    # it must be dropped, re-measured, and counted — and must NOT win min.
    floor = B.plausible_floor_s(B.PEAK_BF16_TFLOPS * 1e12)  # 1.0 s
    times, n_suspect = B.timed_blocks(
        _script([1.9, 2.0, 0.0016, 2.1, 2.05]), repeats=4, min_plausible_s=floor)
    assert n_suspect == 1
    assert len(times) == 4
    assert min(times) == 1.9
    assert all(t >= floor for t in times)


def test_no_guard_without_flops():
    # Unknown FLOP count -> no floor -> every block kept (backwards compat).
    times, n_suspect = B.timed_blocks(
        _script([0.001, 0.002, 0.003]), repeats=3, min_plausible_s=None)
    assert times == [0.001, 0.002, 0.003] and n_suspect == 0


def test_partial_suspects_keep_valid_blocks():
    # More suspects than the retry budget: report the valid blocks found.
    times, n_suspect = B.timed_blocks(
        _script([0.1] * 5 + [2.0] + [0.1] * 10), repeats=3,
        min_plausible_s=1.0, max_extra=4)
    assert times == [2.0]
    assert n_suspect >= 5


def test_all_suspect_raises():
    # A systematically broken runtime must fail loudly, not archive garbage.
    with pytest.raises(RuntimeError, match="roofline"):
        B.timed_blocks(_script([1e-4] * 20), repeats=3, min_plausible_s=1.0)


def test_roofline_pct_bounded_by_construction():
    # Any fps derived from a guarded block implies <= 100% of roofline.
    flops_per_frame = 12_800_000
    frames = 64 * 256 * 20
    floor = B.plausible_floor_s(flops_per_frame * frames)
    times, _ = B.timed_blocks(
        _script([floor * 0.01, floor * 1.5, floor * 2.0, floor * 1.8]),
        repeats=3, min_plausible_s=floor)
    fps = frames / min(times)
    rows = B._efficiency_rows(flops_per_frame, fps)
    assert rows["pct_of_bf16_roofline"] <= 100.0
