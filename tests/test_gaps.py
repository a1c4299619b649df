"""Gap/silence detection (operators/gaps.py): bucketed decomposition must
equal the naive sorted-series definition, including across bucket
boundaries and for NULL groups."""

from datetime import datetime, timedelta

import pytest

from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators import gaps as G

T0 = datetime(2026, 1, 1, 0, 0, 0)


def _ts(minutes):
    return T0 + timedelta(minutes=minutes)


def _naive_gaps(minute_lists, min_gap_minutes):
    """Reference implementation: sorted distinct series, consecutive diffs."""
    out = []
    for g, mins in minute_lists.items():
        s = sorted(set(mins))
        for a, b in zip(s, s[1:]):
            if (b - a) * 60 > min_gap_minutes * 60:
                out.append((g, a, b))
    return sorted(out, key=lambda t: (t[0] is None, t[0] or "", t[1]))


@pytest.fixture(scope="module")
def series(spark):
    # feed A: minute cadence with a 3h outage; feed B: steady; NULL feed:
    # sparse with a 2h hole; duplicate timestamps sprinkled in
    rows = []
    a = list(range(0, 60)) + list(range(240, 300))  # hole 59..240 (181 min)
    b = list(range(0, 300, 5))
    n = [0, 30, 150, 160]  # hole 30..150 (120 min)
    for m in a:
        rows.append(("A", _ts(m)))
    rows += [("A", _ts(10)), ("A", _ts(10))]  # dup ts
    for m in b:
        rows.append(("B", _ts(m)))
    for m in n:
        rows.append((None, _ts(m)))
    rows.append(("C", _ts(7)))  # single-ts group: no pairs
    rows.append(("A", None))  # NULL ts out of scope
    df = spark.createDataFrame(rows, "feed string, ts timestamp").cache()
    df.count()
    yield df
    df.unpersist()


def _got(df, **kw):
    return sorted(
        (
            (
                r["feed"],
                int((r["prev_epoch_ms"] - T0.timestamp() * 1000) // 60000),
                int((r["next_epoch_ms"] - T0.timestamp() * 1000) // 60000),
            )
            for r in G.time_gap_report(
                df, "ts", group_by=("feed",), **kw
            ).collect()
        ),
        key=lambda t: (t[0] is None, t[0] or "", t[1]),
    )


def test_gap_report_matches_naive_definition(spark, series):
    want = _naive_gaps(
        {"A": list(range(0, 60)) + list(range(240, 300)) + [10],
         "B": list(range(0, 300, 5)),
         None: [0, 30, 150, 160],
         "C": [7]},
        60,
    )
    got = _got(series, min_gap_seconds=3600)
    assert got == want
    # the two holes: A 59->240, NULL-feed 30->150
    assert (None, 30, 150) in got and ("A", 59, 240) in got


def test_bucket_size_never_changes_the_result(spark, series):
    """Boundary stitching: tiny buckets force every gap across buckets."""
    base = _got(series, min_gap_seconds=3600)
    for bucket in (60, 600, 3600, 86_400):
        assert _got(series, min_gap_seconds=3600, bucket_seconds=bucket) == base


def test_gap_seconds_value_and_threshold_strictness(spark, series):
    rep = G.time_gap_report(
        series, "ts", group_by=("feed",), min_gap_seconds=10_860
    ).collect()
    # only A's 181-minute hole exceeds 181min=10860s strictly? 10860 == gap
    # -> strict > excludes it
    assert rep == []
    rep = G.time_gap_report(
        series, "ts", group_by=("feed",), min_gap_seconds=10_859
    ).collect()
    assert len(rep) == 1 and rep[0]["gap_seconds"] == 10_860.0


def test_gap_stats_rollup(spark, series):
    st = {
        r["feed"]: r
        for r in G.time_gap_stats(
            series, "ts", group_by=("feed",), min_gap_seconds=3600
        ).collect()
    }
    assert set(st) == {"A", "B", "C", None}
    assert st["A"]["n_gaps"] == 1 and st["A"]["max_gap_seconds"] == 10_860.0
    assert st["B"]["n_gaps"] == 0 and st["B"]["max_gap_seconds"] is None
    assert st["C"]["n_distinct_ts"] == 1 and st["C"]["n_gaps"] == 0
    assert st[None]["n_gaps"] == 1 and st[None]["max_gap_seconds"] == 7200.0
    assert st["A"]["n_distinct_ts"] == 120  # dups collapsed


def test_gap_ungrouped_global_series(spark, series):
    st = G.time_gap_stats(series, "ts", min_gap_seconds=3600).collect()
    assert len(st) == 1
    # global distinct series over all feeds: B fills A's hole every 5 min,
    # so no global gap > 1h
    assert st[0]["n_gaps"] == 0


def test_fractional_threshold_is_rounded_not_truncated(spark):
    # 32.3 * 1000 = 32299.999999999996: int() would truncate to 32299 ms
    # and report a gap of EXACTLY 32300 ms, breaking strict-> semantics
    rows = [("A", _ts(0)), ("A", T0 + timedelta(milliseconds=32_300))]
    df = spark.createDataFrame(rows, "feed string, ts timestamp")
    rep = G.time_gap_report(
        df, "ts", group_by=("feed",), min_gap_seconds=32.3
    ).collect()
    assert rep == []  # gap == threshold -> not a silence
    rep = G.time_gap_report(
        df, "ts", group_by=("feed",), min_gap_seconds=32.299
    ).collect()
    assert len(rep) == 1 and rep[0]["gap_seconds"] == 32.3


def test_gap_stats_shares_one_distinct_frame(spark, series):
    # the extent agg and the gap decomposition must consume the SAME
    # persisted distinct frame (one scan + one dedup shuffle, not two)
    out = G.time_gap_stats(
        series, "ts", group_by=("feed",), min_gap_seconds=3600
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "InMemoryTableScan" in plan  # tiny test frame; leak is fine here


def test_gap_lints(spark, series):
    with pytest.raises(SchemaError, match="min_gap_seconds"):
        G.time_gap_report(series, "ts", min_gap_seconds=0)
    with pytest.raises(SchemaError, match="bucket_seconds"):
        G.time_gap_report(series, "ts", min_gap_seconds=60, bucket_seconds=0)


# ---------------------------------------------------------------- sessions


def test_sessionize_exact(spark):
    from mdvalidate_spark.operators.gaps import sessionize

    base = T0
    rows = [
        # user u1: two sessions split by a 2h gap; a ts TIE inside
        ("e1", "u1", _ts(0)),
        ("e2", "u1", _ts(5)),
        ("e0", "u1", _ts(5)),  # tie with e2 — id breaks order: e0 < e2
        ("e3", "u1", _ts(150)),  # 145 min after → new session at gap=60min
        # user u2: single event; NULL ts dropped
        ("e4", "u2", _ts(1)),
        ("e5", "u2", None),
    ]
    df = spark.createDataFrame(rows, "event_id string, user_id string, ts timestamp")
    got = {
        r.event_id: (r.session_index, r.is_session_start, r.prev_gap_us)
        for r in sessionize(df, "ts", 3600, key_cols=("user_id",), id_col="event_id").collect()
    }
    assert got["e1"] == (1, True, None)
    assert got["e0"] == (1, False, 5 * 60 * 1_000_000)
    assert got["e2"] == (1, False, 0)  # tie: zero gap, same session
    assert got["e3"] == (2, True, 145 * 60 * 1_000_000)
    assert got["e4"] == (1, True, None)
    assert "e5" not in got  # NULL ts out of scope


def test_sessionize_boundary_is_strict(spark):
    """gap EXACTLY equal to the threshold does NOT split — the split
    condition is strictly greater (silence must exceed the gap)."""
    from mdvalidate_spark.operators.gaps import sessionize

    df = spark.createDataFrame(
        [("a", "u", _ts(0)), ("b", "u", _ts(60)), ("c", "u", _ts(121))],
        "event_id string, user_id string, ts timestamp",
    )
    got = {
        r.event_id: r.session_index
        for r in sessionize(df, "ts", 3600, key_cols=("user_id",), id_col="event_id").collect()
    }
    assert got == {"a": 1, "b": 1, "c": 2}  # 60min == gap stays; 61min splits


def test_session_stats_rollup_and_null_key(spark):
    from mdvalidate_spark.operators.gaps import session_stats

    df = spark.createDataFrame(
        [
            ("a", "u", _ts(0)),
            ("b", "u", _ts(10)),
            ("c", "u", _ts(200)),
            ("d", None, _ts(0)),  # NULL key participates under NULL
            ("e", None, _ts(500)),
        ],
        "event_id string, user_id string, ts timestamp",
    )
    rows = {
        (r.user_id, r.session_index): (r.n_events, r.duration_us)
        for r in session_stats(df, "ts", 3600, key_cols=("user_id",), id_col="event_id").collect()
    }
    assert rows[("u", 1)] == (2, 10 * 60 * 1_000_000)
    assert rows[("u", 2)] == (1, 0)
    assert rows[(None, 1)] == (1, 0)
    assert rows[(None, 2)] == (1, 0)


def test_sessionize_refusals_and_single_shuffle(spark):
    from mdvalidate_spark.operators.gaps import sessionize

    df = spark.createDataFrame(
        [("a", "u", _ts(0))], "event_id string, user_id string, ts timestamp"
    )
    with pytest.raises(SchemaError, match="gap_seconds"):
        sessionize(df, "ts", 0)
    with pytest.raises(SchemaError, match="not in"):
        sessionize(df, "ts", 60, key_cols=("nope",))
    # both window passes share (partition, order): exactly ONE Exchange
    plan = (
        sessionize(df, "ts", 60, key_cols=("user_id",), id_col="event_id")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Exchange") == 1
    assert "Python" not in plan
