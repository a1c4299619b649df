"""Sequence packing: greedy fill of documents into fixed token budgets.

The step between a validated corpus and a training run: concatenate
documents into context-window-sized packs so the trainer sees dense
batches. Exact greedy fill is intrinsically sequential (each decision
depends on the running fill), so it cannot be a pure relational plan —
this module confines the sequential part to the smallest possible scope
and keeps everything around it relational:

- Documents are assigned to ``n_shards`` HASH-derived shards
  (``pmod(xxhash64(id), n_shards)``) — a pure column, so the assignment is
  deterministic, parallelism-invariant, and append-stable per doc. One
  shuffle groups each shard.
- Within a shard, docs are packed in ``id`` order by ONE Arrow-batched
  ``applyInPandas`` kernel: running fill, new pack when adding a doc would
  overflow a non-empty pack. A doc longer than the budget gets a pack of
  its own (flagged ``oversize``) — packing never drops or truncates rows;
  gating oversize docs is a validation rule's job, upstream.
- Pack identity is (shard, pack_id) — pack ids restart per shard, so no
  global sequence/coordination exists anywhere.

Scale shape: the kernel is O(shard rows) with a numpy loop per Arrow
batch; shards are hash-uniform so no shard is hot, and ``n_shards`` sets
the shard footprint (pick rows/n_shards ≈ a few hundred MB). The
trade-off vs bin-packing heuristics (first-fit-decreasing) is declared:
greedy-in-id-order is single-pass, deterministic, and reproducible in any
engine — the properties a 10^12-row corpus and a DuckDB oracle both need
— at a few percent packing density loss.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    *,
    id_col: str = "doc_id",
    n_shards: int = 256,
    shard_method: str = "xxhash64",
) -> DataFrame:
    """Assign every row a (shard, pack_id) so that each pack's total
    ``token_col`` stays within ``budget`` (except single oversize docs).
    Returns (id, tokens, shard, pack_id, oversize); pack fill totals are a
    one-line groupBy downstream. NULL/negative token counts pack as 0 —
    the doc still lands in a pack, and a MetricBoundRule on ``token_col``
    is the place to reject such rows. ``shard_method='md5'`` swaps the
    shard hash to a 60-bit md5 prefix reproducible in any engine (the
    DuckDB oracle re-derives the same shards); xxhash64 stays the cheap
    JVM default for production.

    Contract: ``id_col`` must be unique — packing order within a shard is
    (id ascending), so duplicate ids would make pack composition depend on
    arrival order and break the determinism this operator exists to
    provide (a UniqueRule on the id upstream is the enforcement point)."""
    from ..errors import SchemaError

    if budget <= 0:
        raise SchemaError(f"pack budget must be positive, got {budget}")
    if n_shards <= 0:
        raise SchemaError(f"n_shards must be positive, got {n_shards}")
    if shard_method == "md5":
        shard = F.pmod(
            F.conv(
                F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
            ).cast("long"),
            F.lit(n_shards),
        )
    elif shard_method == "xxhash64":
        shard = F.pmod(
            F.xxhash64(F.col(id_col).cast("string")), F.lit(n_shards)
        )
    else:
        raise SchemaError(
            f"unknown shard_method {shard_method!r}; use 'xxhash64' or 'md5'"
        )

    base = df.select(
        F.col(id_col),
        F.greatest(
            F.coalesce(F.col(token_col).cast("long"), F.lit(0)), F.lit(0)
        ).alias("__tok"),
        shard.cast("int").alias("shard"),
    )
    id_type = base.schema[id_col].dataType.simpleString()
    out_schema = (
        f"{id_col} {id_type}, n_tokens long, shard int, "
        "pack_id long, oversize boolean"
    )
    b = int(budget)

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(id_col, kind="mergesort").reset_index(drop=True)
        toks = pdf["__tok"].to_numpy()
        pack_ids = [0] * len(toks)
        pack, fill = 1, 0
        for i, t in enumerate(toks):
            t = int(t)
            if fill > 0 and fill + t > b:
                pack += 1
                fill = 0
            fill += t
            pack_ids[i] = pack
        return pd.DataFrame(
            {
                id_col: pdf[id_col],
                "n_tokens": toks,
                "shard": pdf["shard"],
                "pack_id": pack_ids,
                "oversize": toks > b,
            }
        )

    return base.groupBy("shard").applyInPandas(_pack, schema=out_schema)


def pack_stats(packed: DataFrame, budget: int) -> DataFrame:
    """Packing density diagnostics over ``pack_sequences`` output: one row
    per shard with pack count, mean fill fraction, and oversize count —
    the numbers that tell you whether the budget/tokenizer combination is
    wasting context window."""
    per_pack = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("fill"),
        F.max(F.col("oversize").cast("int")).alias("has_oversize"),
    )
    return (
        per_pack.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.round(F.avg(F.col("fill") / F.lit(float(budget))), 6).alias(
                "mean_fill_frac"
            ),
            F.sum("has_oversize").alias("oversize_packs"),
        )
        .orderBy("shard")
    )
