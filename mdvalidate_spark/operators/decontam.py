"""Benchmark decontamination: flag corpus documents that share word n-grams
with an evaluation/benchmark set.

The standard guard before training on web text (the GPT-3 appendix-C /
Pile / FineWeb "13-gram decontamination" pattern): any document sharing a
long-enough word n-gram with a benchmark document leaks eval data and must
be dropped or stripped. It is the cross-SET cousin of the engine's n-gram
Jaccard dedup (dedup.py) and reuses the same shingle kernel
(text.shingles — array primitives, codegen, no UDF; the same regex/split
primitives as the reference's matchers, walkers/validators/matchers.rs).

Scale design (the asymmetry IS the design):

- The benchmark side is small by nature (eval suites are MBs, not TBs) →
  its distinct shingle set is computed once and **broadcast**; the 100 TB
  corpus side then streams through a broadcast-hash semi-join at scan
  speed — zero shuffle of corpus data, nothing to skew.
- Corpus shingles are exploded to posting ROWS, never collected into
  per-shingle arrays (the dedup.py count-first lesson): a boilerplate
  shingle shared by 10⁹ docs costs rows, not one aggregation buffer.
- Per-document outputs are fixed-width (counts + one example gram via
  ``min``), so result size is O(contaminated docs) regardless of how hot
  any single n-gram is.
- ``broadcast_benchmark=False`` is the escape hatch for a genuinely huge
  "benchmark" (e.g. decontaminating split A against split B): the same
  plan runs as a shuffle hash join on the shingle key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .text import shingles


def benchmark_shingles(
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
) -> DataFrame:
    """Distinct (shingle, bench_id) posting rows of the benchmark set.
    Precompute + persist this when decontaminating many corpus shards
    against one benchmark."""
    # rows are unique by construction — shingles() is array_distinct per doc,
    # so exploding yields one row per (bench doc, shingle); no dedup pass
    return benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.explode(shingles(F.col(text_col), k)).alias("shingle"),
    )


def contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination report: documents sharing ≥1 word k-gram
    with the benchmark set.

    Returns (id_col, n_hit_grams = distinct shared k-grams,
    n_bench_docs = distinct benchmark docs hit, example_gram = lexicographic
    min shared k-gram). Clean documents emit nothing.
    """
    from .util import ensure_parallelism

    bench = benchmark_shingles(benchmark, text_col, id_col, k)
    if broadcast_benchmark:
        bench = F.broadcast(bench)
    # the corpus-side shingle explode is CPU-bound per row — spread an
    # unsplittable input first (no-op on real multi-split corpora)
    postings = ensure_parallelism(docs).select(
        F.col(id_col), F.explode(shingles(F.col(text_col), k)).alias("shingle")
    )
    return (
        postings.join(bench, "shingle")
        .groupBy(id_col)
        .agg(
            F.countDistinct("shingle").alias("n_hit_grams"),
            F.countDistinct("bench_id").alias("n_bench_docs"),
            F.min("shingle").alias("example_gram"),
        )
    )


def contamination_violations(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 13,
    min_hits: int = 1,
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Engine-shape violation rows for contaminated documents (those with
    at least ``min_hits`` distinct shared k-grams)."""
    rep = contamination(docs, benchmark, text_col, id_col, k, broadcast_benchmark)
    return rep.where(F.col("n_hit_grams") >= min_hits).select(
        F.col(id_col),
        F.lit(f"contamination_{k}gram").alias("rule_id"),
        F.lit(text_col).alias("column"),
        F.lit(f"shared {k}-grams < {min_hits}").alias("expected"),
        F.concat(
            F.col("n_hit_grams").cast("string"),
            F.lit(" grams across "),
            F.col("n_bench_docs").cast("string"),
            F.lit(" bench docs, e.g. '"),
            F.col("example_gram"),
            F.lit("'"),
        ).alias("actual"),
        F.lit("contamination").alias("kind"),
    )


def semantic_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Embedding-space decontamination: corpus docs whose embedding sits at
    cosine ≥ ``threshold`` to ANY benchmark item — the paraphrase /
    translation / near-rewrite contamination the k-gram pass above cannot
    see (the semantic analog modern pipelines run next to n-gram
    decontamination).

    Scale shape: a benchmark is an eval set — 10³–10⁵ rows against a 10¹²
    corpus — so the bench side BROADCASTS and the corpus pays ONE map-only
    scan with per-doc aggregation: no corpus shuffle, no LSH. (That
    asymmetry is the design: contamination is corpus × small-benchmark;
    corpus × corpus near-dup belongs to dedup.embedding_near_duplicates'
    SRP-LSH.) Cosines round to 6dp BEFORE thresholding so a replayed run
    and the DuckDB oracle agree at the boundary.

    Returns one row per CONTAMINATED corpus doc: (corpus_id, n_bench_hits,
    max_cos, nearest_bench_id) — nearest = min bench id among max-cos ties,
    deterministic under any parallelism. Clean docs emit nothing.
    Mismatched-dimension or NULL vectors drop out via NULL-cosine
    propagation (never a fabricated 0-similarity verdict)."""
    from .dedup import cosine

    c = docs.select(
        F.col(id_col).alias("corpus_id"),
        F.col(vec_col).cast("array<double>").alias("cv"),
    )
    b = benchmark.select(
        F.col(id_col).alias("bench_id"),
        F.col(vec_col).cast("array<double>").alias("bv"),
    )
    from pyspark.storagelevel import StorageLevel

    scored = (
        c.join(F.broadcast(b))
        .select(
            "corpus_id",
            "bench_id",
            F.round(cosine(F.col("cv"), F.col("bv")), 6).alias("cos_r"),
        )
        .where(F.col("cos_r") >= threshold)
        # both the hits aggregate and the nearest tie-break read this frame:
        # persist the (small, post-threshold) scores so the corpus×bench
        # cosine scan runs ONCE, not once per consumer
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    hits = scored.groupBy("corpus_id").agg(
        F.count(F.lit(1)).alias("n_bench_hits"),
        F.max("cos_r").alias("max_cos"),
    )
    # ties broken toward the smallest bench id: a second pass over the
    # (tiny, already-thresholded) hits frame, never over the corpus
    nearest = (
        scored.join(hits.select("corpus_id", "max_cos"), "corpus_id")
        .where(F.col("cos_r") == F.col("max_cos"))
        .groupBy("corpus_id")
        .agg(F.min("bench_id").alias("nearest_bench_id"))
    )
    return hits.join(nearest, "corpus_id")


def split_leakage(
    df: DataFrame,
    key_cols,
    holdout_fraction: float,
    *,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "",
    method: str = "xxhash64",
) -> DataFrame:
    """Split-integrity guard: holdout documents whose EXACT (normalized)
    content also appears on the train side of the same hash split. The
    hash split freezes membership per key, but duplicated CONTENT under
    different keys still straddles the boundary — the leak that quietly
    inflates eval scores. Run after dedup as a zero-tolerance assertion,
    or before it to measure what dedup must remove.

    One row per contaminated holdout doc: (id, fp, n_train_twins,
    train_example). Plan: project fingerprints (codegen), split flag is
    the sample_hash predicate (map-only), aggregate the TRAIN side per
    fingerprint (uniform hash key, bounded two-column output), then one
    join on fp — no arrays, no skew (a viral doc costs one train-side
    count row). Near-dup leakage is the same query with dedup.py cluster
    ids in place of fp."""
    from .text import fingerprint_md5
    from .sampling import holdout_split

    flagged = holdout_split(
        df, key_cols, holdout_fraction, salt=salt, method=method
    )
    fp = flagged.select(
        F.col(id_col),
        fingerprint_md5(F.col(text_col)).alias("fp"),
        F.col("is_holdout"),
    )
    train = (
        fp.where(~F.col("is_holdout"))
        .groupBy("fp")
        .agg(
            F.count(F.lit(1)).alias("n_train_twins"),
            F.min(id_col).alias("train_example"),
        )
    )
    return (
        fp.where(F.col("is_holdout"))
        .join(train, "fp")
        .select(id_col, "fp", "n_train_twins", "train_example")
    )
