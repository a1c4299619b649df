"""Benford first-significant-digit conformance: a forged/degenerate-data
tripwire for organically-generated numeric columns.

Naturally-occurring magnitudes spanning several orders (file sizes, order
totals, view counts, crawl byte lengths) follow Benford's law — digit d
leads with probability log10(1 + 1/d). Synthetic padding, a constant-fill
bug, truncation at an ingest boundary, or duplicated records all bend the
first-digit histogram long before a mean/quantile gate moves, which is why
the check is a forensic-accounting staple. Here it is a corpus-level data
gate: ONE scan, groupBy over at most 9 groups (map-side combined — the
shuffle moves ≤ 9·P rows), O(9) driver arithmetic. Scale-safe at any row
count by construction.

Parity discipline: the first significant digit is extracted from a FIXED
'%.6f' rendering (format_string in Spark, printf in DuckDB) — never via
log10/pow, whose floating-point at exact powers of ten can disagree
between engines (log10(1000) = 2.9999999… → digit 9 instead of 1).
Values that render without a nonzero digit (0, NULL, |x| < 5e-7) are out
of scope, and that exclusion is visible in ``n_scoped`` vs ``rows``.

Applicability is the caller's judgment: ID sequences, bounded scores, and
assigned values (prices ending .99) are NOT Benford-distributed — the
docs promise a tripwire for organic magnitude columns, not a universal
gate. ``min_rows`` refuses statistically-meaningless inputs loudly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..errors import SchemaError
from .util import round6 as _r6

# round(log10(1 + 1/d), 6) — fixed literals, identical in both engines
BENFORD_EXPECTED = {
    1: 0.30103,
    2: 0.176091,
    3: 0.124939,
    4: 0.09691,
    5: 0.079181,
    6: 0.066947,
    7: 0.057992,
    8: 0.051153,
    9: 0.045757,
}

#: Nigrini's conformity bands for the mean absolute deviation of the
#: first-digit distribution: <= 0.006 close, <= 0.012 acceptable,
#: <= 0.015 marginally acceptable, above = nonconformity.
MAD_MARGINAL = 0.015

MIN_BENFORD_ROWS = 1000


def first_digit_expr(column: str):
    """First significant digit of ``column`` as an int (NULL when none):
    the first [1-9] in the fixed 6-decimal rendering of |x| — rendering,
    not log10 math, so Spark and any ANSI-SQL oracle agree bit-for-bit."""
    d = F.regexp_extract(
        F.format_string("%.6f", F.abs(F.col(column).cast("double"))),
        "[1-9]",
        0,
    )
    return F.when(d != "", d.cast("int"))


def benford_report(
    df: DataFrame,
    column: str,
    *,
    tol: float = 0.015,
    min_rows: int = MIN_BENFORD_ROWS,
) -> DataFrame:
    """Nine rows (digit 1..9, zero-count digits included): observed count
    and share vs the Benford expectation, per-digit absolute deviation,
    and the digit-level verdict at ``tol`` (default = Nigrini's marginal
    MAD band, reused as a per-digit gate). ``n_scoped`` (non-NULL, nonzero
    values) and ``rows`` ride along so the exclusion is auditable.

    Refuses loudly when fewer than ``min_rows`` values are in scope — a
    digit histogram over a handful of rows asserts noise, not conformity.
    """
    if not (0.0 < tol < 1.0):
        raise SchemaError(
            f"benford tol must be in (0, 1) (a share deviation), got {tol}"
        )
    agg = df.agg(
        F.count(F.lit(1)).alias("_rows"),
        *[
            F.sum(
                F.when(first_digit_expr(column) == d, F.lit(1)).otherwise(0)
            ).alias(f"_d{d}")
            for d in range(1, 10)
        ],
    ).collect()[0]
    rows = int(agg["_rows"])
    counts = {d: int(agg[f"_d{d}"]) for d in range(1, 10)}
    scoped = sum(counts.values())
    if scoped < min_rows:
        raise SchemaError(
            f"benford_report({column!r}): only {scoped} values in scope "
            f"(non-NULL, nonzero) of {rows} rows — below min_rows="
            f"{min_rows}; a first-digit histogram this small asserts "
            "noise, not conformity (lower min_rows deliberately for "
            "fixtures)"
        )
    out = []
    for d in range(1, 10):
        share = _r6(counts[d] / scoped)
        exp = BENFORD_EXPECTED[d]
        dev = _r6(abs(share - exp))
        out.append((d, rows, scoped, counts[d], share, exp, dev, dev <= tol))
    return df.sparkSession.createDataFrame(
        out,
        "digit int, rows long, n_scoped long, n long, observed_share double, "
        "expected_share double, abs_dev double, within_tol boolean",
    )


def benford_mad(
    df: DataFrame,
    column: str,
    *,
    min_rows: int = MIN_BENFORD_ROWS,
) -> DataFrame:
    """One-row summary: the mean absolute deviation of the observed
    first-digit distribution from Benford, plus Nigrini's conformity
    verdict at the marginal band (mad <= 0.015). The scalar gate form of
    ``benford_report`` for spec-style pass/fail plumbing."""
    rep = benford_report(df, column, tol=MAD_MARGINAL, min_rows=min_rows)
    rows = rep.collect()
    mad = _r6(sum(r["abs_dev"] for r in rows) / 9.0)
    return df.sparkSession.createDataFrame(
        [(column, rows[0]["rows"], rows[0]["n_scoped"], mad, mad <= MAD_MARGINAL)],
        "column string, rows long, n_scoped long, mad double, conforms boolean",
    )
