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


#: in-kernel shard-size refusal (rows): a shard arrives at the packing
#: kernel as ONE pandas frame, so an undersized n_shards at corpus scale
#: is an executor OOM waiting to happen — refuse loudly before it is.
_MAX_SHARD_ROWS = 5_000_000


def pack_sequences(
    df: DataFrame,
    token_col: str,
    budget: int,
    *,
    id_col: str = "doc_id",
    n_shards: int = 256,
    rows_per_shard: int | None = None,
    max_shard_rows: int = _MAX_SHARD_ROWS,
    precheck_shards: bool = False,
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
    provide (a UniqueRule on the id upstream is the enforcement point).

    Shard sizing is ENFORCED, not advisory (each shard is one in-memory
    pandas frame inside the kernel), with three layers:

    - ``rows_per_shard`` derives ``n_shards = ceil(count/rows_per_shard)``
      from one count() of the input, and must sit at or below 90% of
      ``max_shard_rows``: the derivation targets MEAN occupancy, and hash
      skew puts real shards above the mean (binomial spread is
      ~sqrt(rows/shard), so 10% headroom is orders of magnitude beyond
      what xxhash skew produces — a derived sizing can never trip its own
      cap).
    - ``precheck_shards=True`` (opt-in: it costs one eager map-side
      combined groupBy(shard).count() scan of the input) refuses BEFORE
      any kernel group materializes — at extreme scale an oversized group
      can OOM the executor during applyInPandas buffering, before any
      in-kernel check runs, so the only refusal that is loud by
      construction is one that happens before the shuffle. Recommended
      whenever ``n_shards`` was chosen by hand for a corpus-scale input;
      derived sizing doesn't need it (the headroom makes an overflow
      impossible by construction).
    - The kernel itself still refuses any shard over ``max_shard_rows``
      with a sizing hint (covers the lazy path, where the frame fits
      memory but exceeds the declared budget)."""
    from ..errors import SchemaError

    if budget <= 0:
        raise SchemaError(f"pack budget must be positive, got {budget}")
    if max_shard_rows <= 0:
        raise SchemaError(
            f"max_shard_rows must be positive, got {max_shard_rows}"
        )
    if rows_per_shard is not None:
        if rows_per_shard <= 0:
            raise SchemaError(
                f"rows_per_shard must be positive, got {rows_per_shard}"
            )
        if rows_per_shard > 0.9 * max_shard_rows:
            raise SchemaError(
                f"rows_per_shard={rows_per_shard} exceeds max_shard_rows="
                f"{max_shard_rows} minus the 10% skew headroom — the "
                "derivation targets mean shard occupancy, so shards above "
                "the mean would refuse by construction; lower "
                "rows_per_shard or raise max_shard_rows"
            )
        n_shards = max(1, -(-df.count() // rows_per_shard))
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

    cap = int(max_shard_rows)
    ns = int(n_shards)

    if precheck_shards:
        over = (
            base.groupBy("shard")
            .agg(F.count(F.lit(1)).alias("n"))
            .where(F.col("n") > cap)
            .orderBy(F.col("n").desc())
            .limit(5)
            .collect()
        )
        if over:
            worst = ", ".join(f"shard {r['shard']}={r['n']}" for r in over)
            raise SchemaError(
                f"pack_sequences: {len(over)}+ shard(s) exceed "
                f"max_shard_rows={cap} with n_shards={ns} ({worst}) — "
                "raise n_shards (or lower rows_per_shard); refused before "
                "any kernel group materializes"
            )

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        if len(pdf) > cap:
            raise ValueError(
                f"pack_sequences: shard {int(pdf['shard'].iloc[0])} holds "
                f"{len(pdf)} rows > max_shard_rows={cap} with n_shards="
                f"{ns} — raise n_shards (or pass rows_per_shard to derive "
                "it); each shard is one in-memory kernel group"
            )
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


def chunk_text(
    df: DataFrame,
    text_col: str,
    window: int,
    stride: int,
    *,
    id_col: str = "doc_id",
    unit: str = "char",
) -> DataFrame:
    """Deterministic sliding-window chunking — the SPLITTING side of
    context-window prep (``pack_sequences`` is the assembly side): every
    document longer than ``window`` units becomes overlapping chunks that
    start every ``stride`` units, so a downstream trainer/embedder sees
    bounded inputs with no text ever dropped. (An empty-but-non-null
    document keeps one empty chunk — rows are never silently lost.)

    Semantics (identical for both units):

    - ``n_chunks = 1 + max(0, ceil((len - window) / stride))`` — one chunk
      for anything that fits, and chunk ``i`` covers ``[i*stride,
      i*stride + window)``; the last chunk may be shorter
      and always reaches the end of the document (full coverage).
    - ``unit='char'``: positions are characters, pure ``substring``.
    - ``unit='token'``: the text is whitespace-tokenized
      (``split(trim(text), '[ \\t\\n\\r]+')`` — an explicit ASCII class,
      reproducible in any regex engine), windows slide over tokens, and
      chunks re-join with single spaces (whitespace runs are NOT
      preserved — documented normalization, same family as
      ``normalize_text``).
    - NULL text produces no chunks (nothing to train on, and a
      NotNullRule upstream is where missing text is policed).

    Scale shape: one map-only pass — ``explode(sequence(0, n_chunks-1))``
    fans each doc out to its chunk indices WITHOUT a shuffle, and the
    fan-out per row is bounded by ``len/stride`` (a 1 MB doc at
    window=2048/stride=1536 is ~680 rows), so there is no hot key and no
    aggregation buffer; the plan stays whole-stage codegen with zero
    Python. ``1 <= stride <= window`` is enforced — a stride beyond the
    window would silently leave unvalidated gaps between chunks, which is
    exactly the failure mode a validation engine must refuse.

    Returns (id, chunk_index, n_chunks, start, chunk_len, chunk) with
    ``start`` in the chosen unit, 0-based.
    """
    from ..errors import SchemaError

    if window <= 0:
        raise SchemaError(f"chunk window must be positive, got {window}")
    if not (1 <= stride <= window):
        raise SchemaError(
            f"chunk stride must be in [1, window={window}], got {stride} "
            "(stride > window would leave uncovered gaps between chunks)"
        )
    if unit not in ("char", "token"):
        raise SchemaError(f"unknown chunk unit {unit!r}; use 'char' or 'token'")
    for c in (id_col, text_col):
        if c not in df.columns:
            raise SchemaError(f"chunk column {c!r} not in {sorted(df.columns)}")

    w, s = int(window), int(stride)
    if unit == "char":
        ln = F.length(F.col(text_col))
    else:
        # split('') yields one empty token — a blank doc is 1 token long,
        # one empty chunk, never a divide-by-zero or a dropped row
        tokens = F.split(F.trim(F.col(text_col)), "[ \t\n\r]+")
        ln = F.size(tokens)
    # ceil((ln-w)/s) as pure integer math: trunc-vs-floor division only
    # disagrees on negatives, and greatest(0, ...) erases exactly those
    n_extra = F.greatest(
        F.lit(0), ((ln - w + s - 1).cast("long") / s).cast("long")
    )
    base = df.where(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        F.col(text_col),
        *([tokens.alias("__toks")] if unit == "token" else []),
        ln.cast("long").alias("__len"),
        (F.lit(1) + n_extra).alias("n_chunks"),
    )
    idx = F.explode(F.sequence(F.lit(0).cast("long"), F.col("n_chunks") - 1))
    exploded = base.select(
        F.col(id_col),
        F.col("n_chunks"),
        F.col("__len"),
        *([F.col("__toks")] if unit == "token" else [F.col(text_col)]),
        idx.alias("chunk_index"),
    )
    start = (F.col("chunk_index") * s).alias("start")
    if unit == "char":
        chunk = F.substring(F.col(text_col), F.col("chunk_index") * s + 1, w)
    else:
        chunk = F.array_join(
            F.slice(F.col("__toks"), F.col("chunk_index") * s + 1, w), " "
        )
    return exploded.select(
        F.col(id_col),
        F.col("chunk_index"),
        F.col("n_chunks"),
        start,
        F.least(F.lit(w).cast("long"), F.col("__len") - F.col("chunk_index") * s)
        .alias("chunk_len"),
        chunk.alias("chunk"),
    )
