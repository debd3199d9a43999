"""Cross-round bench drift detection (bench.py helpers): the reference
time a query is judged against must be the MIN of its warm times over
the last rounds, so sub-threshold creep compounds into an alarm
(VERDICT r11 "what's wrong" #1 — dedup_funnel grew 1.65x over two
rounds while each single-round step stayed under the 1.5x gate)."""

from __future__ import annotations

import importlib.util
import json
import os

_spec = importlib.util.spec_from_file_location(
    "bench", os.path.join(os.path.dirname(__file__), "..", "bench.py")
)
bench = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(bench)


def test_two_step_creep_trips_the_min_based_gate():
    # 1.4x per round: each step is under the 1.5x prev-round gate, but
    # vs the min-of-rounds reference the compounded 1.96x must flag
    r9 = {"q": 1.0}
    r10 = {"q": 1.4}
    r11 = {"q": 1.96}
    ref = bench._reference_times([r11, r10, r9])
    assert ref == {"q": 1.0}
    now = 1.96 * 1.4  # a third 1.4x step
    assert now > 1.5 * ref["q"]  # the gate fires
    # the old prev-round-only comparison would NOT have fired
    assert now <= 1.5 * r11["q"]


def test_reference_is_per_query_min_across_rounds():
    rounds = [
        {"a": 3.0, "b": 1.0},
        {"a": 2.0, "c": 5.0},
        {"a": 4.0, "b": 2.0, "c": 4.0},
    ]
    assert bench._reference_times(rounds) == {"a": 2.0, "b": 1.0, "c": 4.0}
    assert bench._reference_times([]) is None


def test_round_warm_times_prefers_suspect_cold_warm_min():
    data = {
        "queries": {"hot": 10.0, "steady": 2.0},
        "suspect_cold": {"hot": {"prev": 4.0, "cold": 10.0, "warm_min": 4.1}},
    }
    assert bench._round_warm_times(data) == {"hot": 4.1, "steady": 2.0}


def test_prior_round_benches_reads_newest_rounds_and_skips_current(
    tmp_path, monkeypatch
):
    # lay out three prior rounds + a same-round LOCAL file that must be
    # excluded (it would absorb this round's own slowdown)
    def write(name, rnd, times, suspect=None):
        body = {"sf": 0.1, "queries": times}
        if suspect:
            body["suspect_cold"] = suspect
        with open(tmp_path / name.format(rnd), "w") as fh:
            json.dump(body, fh)

    write("BENCH_r{:02d}.json", 9, {"q": 1.0})
    write("BENCH_r{:02d}.json", 10, {"q": 1.4})
    write(
        "BENCH_LOCAL_r{}.json", 11, {"q": 9.0},
        suspect={"q": {"prev": 1.4, "cold": 9.0, "warm_min": 1.9}},
    )
    write("BENCH_r{:02d}.json", 11, {"q": 1.96})  # stamped same round
    write("BENCH_LOCAL_r{}.json", 12, {"q": 0.1})  # current round: excluded
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    rounds = bench._prior_round_benches(0.1)
    # newest first; r11 resolves to the LOCAL file's WARM time (1.9,
    # full map + warm_min override beats the stamped 1.96), one dict per
    # round, r12's own local run never enters the baseline
    assert rounds == [{"q": 1.9}, {"q": 1.4}, {"q": 1.0}]
    assert bench._reference_times(rounds) == {"q": 1.0}
    # the shim keeps the old entry point alive
    assert bench._latest_prior_bench(0.1) == {"q": 1.0}


def test_flags_need_same_round_reproduction_to_alarm():
    flagged = {"a": {"prev": 1.0, "now": 2.0}, "b": {"prev": 1.0, "now": 1.8}}
    # first run of the round: nothing alarms, everything is recorded
    conf, unconf = bench._confirm_flags(flagged, None)
    assert conf == {} and unconf == flagged
    # second run: only the flag seen before graduates
    conf, unconf = bench._confirm_flags(flagged, {"a", "zz"})
    assert set(conf) == {"a"} and set(unconf) == {"b"}


def test_unconfirmed_flag_from_prior_round_alarms_next_round(
    tmp_path, monkeypatch
):
    # round 12's run left "slow_q" unconfirmed; round 13's FIRST run
    # (no same-round prior file) trips the gate on it again → it must
    # alarm, not re-park as unconfirmed (VERDICT r12 what's-wrong #2)
    with open(tmp_path / "BENCH_r12.json", "w") as fh:
        json.dump({"sf": 0.1, "queries": {}}, fh)  # driver stamp → current=13
    with open(tmp_path / "BENCH_LOCAL_r12.json", "w") as fh:
        json.dump(
            {
                "sf": 0.1,
                "queries": {"slow_q": 3.0},
                "unconfirmed_regressions": {
                    "slow_q": {"prev": 2.0, "now": 3.0}
                },
            },
            fh,
        )
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    here = str(tmp_path)
    assert bench._next_round(here) == 13
    assert bench._same_round_prior_flags(here) is None  # round's 1st run
    cross = bench._prior_round_unconfirmed(here)
    assert cross == {"slow_q"}
    flagged = {
        "slow_q": {"prev": 2.0, "now": 3.1},
        "fresh": {"prev": 1.0, "now": 1.9},
    }
    conf, unconf = bench._confirm_flags(flagged, set() | cross)
    assert set(conf) == {"slow_q"}  # two independent rounds = confirmed
    assert set(unconf) == {"fresh"}  # first sighting still parks


def test_prior_round_unconfirmed_respects_window_and_current(
    tmp_path, monkeypatch
):
    def write(rnd, unconf):
        with open(tmp_path / f"BENCH_LOCAL_r{rnd}.json", "w") as fh:
            json.dump(
                {"sf": 0.1, "queries": {},
                 "unconfirmed_regressions": {u: {} for u in unconf}},
                fh,
            )

    with open(tmp_path / "BENCH_r12.json", "w") as fh:
        json.dump({"sf": 0.1, "queries": {}}, fh)  # driver stamp → current=13
    write(8, ["too_old"])    # outside the 3-round window (current=13)
    write(10, ["in_window"])
    write(12, ["recent"])
    write(13, ["own_round"])  # current round: must be excluded
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    here = str(tmp_path)
    assert bench._next_round(here) == 13
    assert bench._prior_round_unconfirmed(here) == {"in_window", "recent"}


def test_same_round_prior_flags_reads_current_local_file(
    tmp_path, monkeypatch
):
    with open(tmp_path / "BENCH_r11.json", "w") as fh:
        json.dump({"sf": 0.1, "queries": {"q": 1.0}}, fh)
    with open(tmp_path / "BENCH_LOCAL_r12.json", "w") as fh:
        json.dump(
            {
                "sf": 0.1,
                "queries": {"q": 1.0},
                "regressions": {"x": {}},
                "unconfirmed_regressions": {"y": {}},
            },
            fh,
        )
    monkeypatch.setattr(
        bench.os.path, "abspath", lambda p: str(tmp_path / "bench.py")
    )
    assert bench._same_round_prior_flags(str(tmp_path)) == {"x", "y"}
    (tmp_path / "BENCH_LOCAL_r12.json").unlink()
    assert bench._same_round_prior_flags(str(tmp_path)) is None


def test_noise_floor_blocks_subsecond_ratio_only_flags():
    """A warm-min over the 1.5x ratio gate but within NOISE_FLOOR_S of
    the reference is scheduler jitter (the r13 quality_filter_rules
    case: ref 0.156s was a one-off warm re-time; 0.25s is the query's
    normal range) — it must NOT alarm; a genuine regression clearing
    both gates must."""
    assert bench.NOISE_FLOOR_S == 0.3
    prev, best = 0.156, 0.25
    assert best > 1.5 * prev  # ratio gate alone would have flagged
    assert not (best - prev > bench.NOISE_FLOOR_S)  # floor blocks it
    prev, best = 1.0, 1.6
    assert best > 1.5 * prev and best - prev > bench.NOISE_FLOOR_S
