"""Incremental dedup: a persisted index of the known corpus, probed by new
ingestion batches.

The batch dedup operators (operators/dedup.py) answer "which documents in
THIS table duplicate each other". A growing 100 TB corpus asks a different
question every day: "which of today's N new documents duplicate anything in
the trillion we already kept?" — and rescanning the kept corpus per batch
is not an option. The answer is the standard two-part index, both parts
tiny relative to the corpus:

- ``exact``:  (doc_id, fp) — md5 of normalized text, 1 row/doc.
- ``bands``:  (band, bucket, doc_id, sig) — MinHash banded-LSH buckets plus
  the num_hashes×8-byte signature, ~band rows/doc. The signature rides
  along so near-dup probes verify with the MinHash ESTIMATE (matching
  signature fraction) without touching the corpus text at all.

Probing is then: fingerprint/sign the new batch (one scan of the BATCH),
join against the index — the exact probe is a join on ``fp``, the near
probe a join on ``(band, bucket)`` with estimate verification. The batch
side is BROADCAST (it is the small side by construction), so the index
streams map-side through a broadcast hash join: index files are read, but
nothing corpus-sized is ever shuffled — and the corpus TEXT is never read
at all. New-vs-new
duplicates inside a batch are the batch operators' job; after filtering,
``write_dedup_index(mode="append")`` grows the index by exactly the kept
rows — the same manifest-style incrementality as the validation checkpoint
(run.py), applied to dedup state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import minhash_signature
from .text import fingerprint_md5, shingles


def _exact_rows(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    return df.select(
        F.col(id_col).alias("doc_id"),
        fingerprint_md5(F.col(text_col)).alias("fp"),
    )


def _band_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    k_shingle: int,
    num_hashes: int,
    bands: int,
) -> DataFrame:
    assert num_hashes % bands == 0
    r = num_hashes // bands
    # filter on the SHINGLE count, not the signature length: a shingle-less
    # doc (shorter than k words) yields array_min(empty)=null per permutation
    # — a size-num_hashes all-null signature that would put every short doc
    # in one identical null-derived bucket per band (a mega-bucket that
    # explodes the probe join and verifies to nothing)
    from .util import ensure_parallelism

    sigs = (
        # signature work is CPU-bound per row — spread an unsplittable
        # input before it (no-op on real multi-split corpora)
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("doc_id"),
            shingles(F.col(text_col), k_shingle).alias("sh"),
        )
        .where(F.size("sh") > 0)
        .select("doc_id", minhash_signature(F.col("sh"), num_hashes).alias("sig"))
    )
    band_structs = F.array(
        *[
            F.struct(
                F.lit(b).alias("band"),
                F.xxhash64(
                    F.lit(b), *[F.element_at("sig", b * r + j + 1) for j in range(r)]
                ).alias("bucket"),
            )
            for b in range(bands)
        ]
    )
    return sigs.select(
        "doc_id", "sig", F.explode(band_structs).alias("bb")
    ).select("doc_id", "sig", F.col("bb.band").alias("band"), F.col("bb.bucket").alias("bucket"))


def write_dedup_index(
    df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    mode: str = "overwrite",
    arms: tuple[str, ...] = ("exact", "bands"),
) -> None:
    """Persist (or with ``mode="append"`` grow) the dedup index under
    ``index_dir``: ``exact/`` fingerprints and ``bands/`` LSH buckets.
    ``arms`` selects which arms to build — a pipeline that only probes
    exact twins should not pay the minhash signature pass for a bands arm
    it never reads (guide §1.2: don't compute things you throw away)."""
    if "exact" in arms:
        _exact_rows(df, text_col, id_col).write.mode(mode).parquet(
            f"{index_dir}/exact"
        )
    if "bands" in arms:
        _band_rows(df, text_col, id_col, k_shingle, num_hashes, bands).write.mode(
            mode
        ).parquet(f"{index_dir}/bands")


def probe_exact(
    new_df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """New documents whose normalized text already exists in the corpus:
    (doc_id, known_id, fp), one row per (new doc, known twin). A join on
    the 16-byte fingerprint — batch rows + matched index rows shuffle, the
    corpus text never moves."""
    spark = new_df.sparkSession
    idx = spark.read.parquet(f"{index_dir}/exact").select(
        F.col("doc_id").alias("known_id"), "fp"
    )
    # the BATCH side broadcasts (it's the small side by the module's own
    # premise) — without the hint Spark would shuffle the corpus-scale index
    # every probe, the exact rescan this module exists to avoid
    return (
        F.broadcast(_exact_rows(new_df, text_col, id_col))
        .join(idx, "fp")
        .select("doc_id", "known_id", "fp")
    )


def probe_near(
    new_df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.7,
) -> DataFrame:
    """New documents near-duplicating an indexed document:
    (doc_id, known_id, est_jaccard). Candidates come from (band, bucket)
    collisions; verification is the MinHash ESTIMATE (fraction of matching
    signature components — expected error ~1/√num_hashes, so 32 hashes ⇒
    ±0.18 at 95%; raise num_hashes for tighter verdicts). The corpus text
    is never read: the index is self-sufficient for probing.

    The banding parameters MUST match the ones the index was written with —
    signatures are permutation-seeded, so a mismatch yields silent misses;
    keep them in the caller's config, not per-call guesses."""
    spark = new_df.sparkSession
    idx = spark.read.parquet(f"{index_dir}/bands").select(
        F.col("doc_id").alias("known_id"),
        F.col("sig").alias("known_sig"),
        "band",
        "bucket",
    )
    probes = F.broadcast(
        _band_rows(new_df, text_col, id_col, k_shingle, num_hashes, bands)
    )
    cand = (
        probes.join(idx, ["band", "bucket"])
        .select("doc_id", "known_id", "sig", "known_sig")
        .dropDuplicates(["doc_id", "known_id"])
    )
    matches = F.size(
        F.filter(
            F.zip_with("sig", "known_sig", lambda a, b: (a == b).cast("int")),
            lambda x: x == 1,
        )
    )
    est = F.round(matches.cast("double") / F.lit(float(num_hashes)), 6)
    return cand.select(
        "doc_id", "known_id", est.alias("est_jaccard")
    ).where(F.col("est_jaccard") >= threshold)


def _span_rows(
    df: DataFrame,
    text_col: str,
    id_col: str,
    span_k: int,
    span_window: int,
) -> DataFrame:
    """Narrow (doc_id, fp) winnow-span postings for the index — the span
    text/pos columns are probe-side concerns and stay out of the persisted
    rows."""
    from .dedup import _span_postings

    return _span_postings(df, text_col, id_col, span_k, span_window).select(
        "doc_id", "fp"
    )


def write_span_index(
    df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_k: int = 16,
    span_window: int = 32,
    mode: str = "overwrite",
) -> None:
    """Persist (or grow, ``mode="append"``) the SPAN-level arm of the dedup
    index under ``index_dir/spans``: one (doc_id, fp) row per distinct
    winnow fingerprint per kept document, so later batches can be probed
    for span-level contamination (licence headers, quoted paragraphs,
    templated boilerplate shared with the kept corpus) without ever
    rescanning corpus text.

    Cost is declared, not hidden: winnowing selects ~2/(window+1)
    fingerprints per character, so this arm is roughly corpus-text-scale
    on disk (parquet fp dictionaries compress it well) — the trade is
    storage once vs a 100 TB text rescan per ingestion batch. It is
    therefore a SEPARATE writer from write_dedup_index, opted into where
    span-level dedup is actually run. Raw postings (not per-fp aggregates)
    so append mode stays trivially correct: new kept docs append exactly
    their own rows. ``span_k``/``span_window`` must match between writer
    and probe — fingerprints are window-parameterized, a mismatch yields
    silent misses."""
    _span_rows(df, text_col, id_col, span_k, span_window).write.mode(
        mode
    ).parquet(f"{index_dir}/spans")


def probe_spans(
    new_df: DataFrame,
    index_dir: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    span_k: int = 16,
    span_window: int = 32,
) -> DataFrame:
    """New documents sharing winnow-span fingerprints with the indexed
    corpus: one row per batch doc with ≥1 known span — (doc_id, n_fps,
    n_known, known_frac, n_known_postings, example_fp/known_id/pos/span).
    The batch side is winnowed once (staged evaluation, dedup.py) and
    BROADCAST; the index streams map-side through the join on ``fp`` — the
    corpus text is never read, only the narrow postings. ``n_known`` counts
    the batch doc's distinct fingerprints found in the index,
    ``n_known_postings`` how many (fp, corpus doc) rows they matched; the
    example is the lexicographically first (fp, known_id) witness with the
    batch-side span slice for triage."""
    from .dedup import _attach_span, _span_postings

    spark = new_df.sparkSession
    idx = spark.read.parquet(f"{index_dir}/spans").select(
        F.col("doc_id").alias("known_id"), "fp"
    )
    bp = _span_postings(new_df, text_col, id_col, span_k, span_window)
    totals = bp.groupBy("doc_id").agg(F.count(F.lit(1)).alias("n_fps"))
    hits = F.broadcast(bp).join(idx, "fp")
    per_doc = hits.groupBy("doc_id").agg(
        F.count_distinct("fp").alias("n_known"),
        F.count(F.lit(1)).alias("n_known_postings"),
        F.min(F.struct("fp", "known_id", "pos")).alias("__ex"),
    )
    result = per_doc.join(totals, "doc_id")
    # batch-side witness span re-derived for winner rows only — postings
    # stay narrow through the broadcast join and both aggregations
    joined, span = _attach_span(
        result, new_df, text_col, id_col, span_k, span_window, "doc_id",
        F.col("__ex.pos"),
    )
    return joined.select(
        "doc_id",
        "n_fps",
        "n_known",
        F.round(F.col("n_known") / F.col("n_fps"), 6).alias("known_frac"),
        "n_known_postings",
        F.col("__ex.fp").alias("example_fp"),
        F.col("__ex.known_id").alias("example_known_id"),
        F.col("__ex.pos").alias("example_pos"),
        span.alias("example_span"),
    )
