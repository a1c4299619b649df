"""Custom stateful streaming operator: cross-micro-batch uniqueness.

The batch engine finds duplicates with a salted two-phase groupBy at
finalize (operators/agg_rules.py). On an unbounded stream there is no
finalize — "have I seen this key before?" needs per-key STATE that outlives
the micro-batch. Spark's built-in `dropDuplicates` silently drops the
repeats; a validator must instead EMIT a violation row for every occurrence
after the first, so this is the one place the engine needs
``applyInPandasWithState`` (per-key GroupState, Arrow-batched — still no
per-row Python crossing).

Reference lineage: the `{1,1}`-per-key repetition bound
(reference: walkers/validators/lists.rs:168-264) evaluated under the
streaming read loop (cmd.rs:88-133) — the reference re-walks from a
checkpoint instead of keeping key state because its input is one document;
a keyed table stream makes per-key state the natural checkpoint.

State size note (10^12-key scale): state is one long per key, partitioned
by the groupBy hash across executors. On an UNBOUNDED key space that state
grows forever — pass ``ttl_seconds`` to evict keys idle longer than the
TTL (ProcessingTimeTimeout). The precision trade is explicit: a duplicate
arriving AFTER its key was evicted counts as occurrence 1 again (a false
negative), which is the correct posture when uniqueness is itself
time-scoped (session ids, ingest-day image ids); leave ttl_seconds=None
for exact lifetime uniqueness when the key space is bounded.
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..errors import KIND_DUPLICATE

_OUT_SCHEMA = "key string, occurrence long"
_STATE_SCHEMA = "seen long"


def _make_dup_fn(ttl_ms: int | None):
    """Build the per-key state function; a closure because the TTL must be
    re-armed on every invocation (GroupState timeouts reset per update)."""

    def _dup_fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if ttl_ms is not None and state.hasTimedOut:
            # idle past the TTL: evict. A later re-arrival of this key is
            # occurrence 1 again — the documented precision trade. The
            # (empty) Arrow batch iterator MUST still be drained — bailing
            # out early desyncs the worker's Arrow stream protocol and
            # kills the Python worker.
            for _ in pdfs:
                pass
            state.remove()
            return
        (seen,) = state.get if state.exists else (0,)
        new = sum(len(p) for p in pdfs)
        total = seen + new
        state.update((total,))
        if ttl_ms is not None:
            state.setTimeoutDuration(ttl_ms)
        # duplicates start right after the LAST occurrence already emitted:
        # at occurrence max(seen+1, 2) — occurrence 1 is always legitimate,
        # and everything up to `seen` was handled by earlier batches
        first_dup = max(seen + 1, 2)
        if total >= first_dup:
            yield pd.DataFrame(
                {
                    "key": [key[0]] * (total - first_dup + 1),
                    "occurrence": list(range(first_dup, total + 1)),
                }
            )

    return _dup_fn


def stream_duplicate_violations(
    stream_df: DataFrame,
    key_column: str,
    rule_id: str,
    run_id: str,
    ttl_seconds: float | None = None,
) -> DataFrame:
    """Streaming uniqueness: one violation row per duplicate occurrence of
    ``key_column`` across the lifetime of the stream (state-backed).

    ``ttl_seconds`` bounds state on unbounded key spaces: a key idle longer
    than the TTL is evicted (ProcessingTimeTimeout fires on a subsequent
    micro-batch), and a re-arrival after eviction counts as occurrence 1 —
    see the module docstring for the precision trade."""
    keyed = stream_df.select(F.col(key_column).cast("string").alias("key"))
    if ttl_seconds is not None and ttl_seconds <= 0:
        from ..errors import SchemaError

        raise SchemaError(
            f"stream uniqueness {rule_id!r}: ttl_seconds must be > 0, "
            f"got {ttl_seconds}"
        )
    ttl_ms = None if ttl_seconds is None else max(1, int(ttl_seconds * 1000))
    dups = keyed.groupBy("key").applyInPandasWithState(
        _make_dup_fn(ttl_ms),
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.NoTimeout
            if ttl_ms is None
            else GroupStateTimeout.ProcessingTimeTimeout
        ),
    )
    return dups.select(
        F.lit(run_id).alias("run_id"),
        F.lit(None).cast("int").alias("partition_id"),
        F.lit(rule_id).alias("rule_id"),
        F.col("key").alias("image_id"),
        F.lit(key_column).alias("column"),
        F.lit("unique").alias("expected"),
        F.concat(F.lit("occurrence="), F.col("occurrence").cast("string")).alias(
            "actual"
        ),
        F.lit(KIND_DUPLICATE).alias("kind"),
    )
