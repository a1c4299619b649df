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
