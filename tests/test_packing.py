"""Sequence packing (operators/packing.py): greedy token-budget fill —
budget invariant, determinism, parallelism invariance, oversize handling."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.errors import SchemaError
from mdvalidate_spark.operators.packing import pack_sequences, pack_stats


@pytest.fixture(scope="module")
def docs(spark):
    df = (
        spark.range(1200)
        .select(
            F.col("id").alias("doc_id"),
            (F.col("id") * 37 % 190 + 10).alias("n_tok"),
        )
        .cache()
    )
    df.count()
    yield df
    df.unpersist()


def test_budget_invariant_and_no_row_lost(docs):
    packed = pack_sequences(docs, "n_tok", 256, n_shards=16).cache()
    assert packed.count() == 1200
    fills = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n")
    )
    # every multi-doc pack respects the budget; only single oversize docs may exceed
    assert fills.where("fill > 256 AND n > 1").count() == 0
    assert packed.where("oversize").count() == 0  # max doc is 199 tokens
    packed.unpersist()


def test_greedy_matches_bruteforce_per_shard(docs):
    packed = pack_sequences(docs, "n_tok", 256, n_shards=4, shard_method="md5")
    rows = packed.orderBy("shard", "doc_id").collect()
    by_shard = {}
    for r in rows:
        by_shard.setdefault(r.shard, []).append(r)
    for shard, members in by_shard.items():
        pack, fill = 1, 0
        for r in members:  # already id-ordered
            t = r.n_tokens
            if fill > 0 and fill + t > 256:
                pack, fill = pack + 1, 0
            fill += t
            assert r.pack_id == pack, (shard, r.doc_id)


def test_parallelism_invariant(docs):
    a = sorted(
        (r.doc_id, r.shard, r.pack_id)
        for r in pack_sequences(docs, "n_tok", 256, n_shards=8).collect()
    )
    b = sorted(
        (r.doc_id, r.shard, r.pack_id)
        for r in pack_sequences(
            docs.repartition(23), "n_tok", 256, n_shards=8
        ).collect()
    )
    assert a == b


def test_oversize_doc_gets_own_pack(spark):
    df = spark.createDataFrame(
        [(1, 50), (2, 900), (3, 60), (4, 70)], "doc_id long, n_tok int"
    )
    packed = pack_sequences(df, "n_tok", 256, n_shards=1)
    rows = {r.doc_id: r for r in packed.collect()}
    assert rows[2].oversize and not rows[1].oversize
    # the 900-token doc shares its pack with nobody
    mates = [d for d, r in rows.items() if r.pack_id == rows[2].pack_id]
    assert mates == [2]


def test_null_and_negative_tokens_pack_as_zero(spark):
    df = spark.createDataFrame(
        [(1, None), (2, -5), (3, 100)], "doc_id long, n_tok int"
    )
    packed = pack_sequences(df, "n_tok", 256, n_shards=1)
    assert packed.count() == 3
    assert packed.agg(F.min("n_tokens")).first()[0] == 0


def test_pack_stats_shape(docs):
    packed = pack_sequences(docs, "n_tok", 256, n_shards=8)
    stats = pack_stats(packed, 256)
    got = stats.collect()
    assert len(got) == 8
    for r in got:
        assert 0 < r.mean_fill_frac <= 1.0
        assert r.oversize_packs == 0


def test_refusals(docs):
    with pytest.raises(SchemaError, match="budget"):
        pack_sequences(docs, "n_tok", 0)
    with pytest.raises(SchemaError, match="n_shards"):
        pack_sequences(docs, "n_tok", 256, n_shards=0)
    with pytest.raises(SchemaError, match="shard_method"):
        pack_sequences(docs, "n_tok", 256, shard_method="crc")
    with pytest.raises(SchemaError, match="rows_per_shard"):
        pack_sequences(docs, "n_tok", 256, rows_per_shard=0)
    with pytest.raises(SchemaError, match="max_shard_rows"):
        pack_sequences(docs, "n_tok", 256, max_shard_rows=0)
    with pytest.raises(SchemaError, match="exceeds max_shard_rows"):
        pack_sequences(
            docs, "n_tok", 256, rows_per_shard=100, max_shard_rows=50
        )


def test_rows_per_shard_derives_n_shards(docs):
    """Shard count derived from a rows-per-shard target: 1200 rows at
    rows_per_shard=100 → 12 hash shards, packing semantics unchanged."""
    packed = pack_sequences(
        docs, "n_tok", 256, rows_per_shard=100, max_shard_rows=1000
    ).cache()
    assert packed.count() == 1200
    shards = {r["shard"] for r in packed.select("shard").distinct().collect()}
    assert shards <= set(range(12)) and len(shards) > 1
    fills = packed.groupBy("shard", "pack_id").agg(
        F.sum("n_tokens").alias("fill"), F.count("*").alias("n")
    )
    assert fills.where("fill > 256 AND n > 1").count() == 0
    packed.unpersist()


def test_shard_over_row_budget_refuses_loudly(docs):
    """An undersized n_shards must die with a sizing hint, not OOM: one
    shard holding all 1200 rows against max_shard_rows=500 refuses inside
    the kernel (the short_block_cap precedent: enforced, not a docstring
    promise)."""
    packed = pack_sequences(docs, "n_tok", 256, n_shards=1, max_shard_rows=500)
    with pytest.raises(Exception) as ei:
        packed.collect()
    assert "max_shard_rows" in str(ei.value)


def test_precheck_refuses_before_kernel(docs):
    """precheck_shards=True refuses EAGERLY (one groupBy(shard).count(),
    before any kernel group materializes) — the only refusal that stays
    loud when a shard is too big to even buffer; names the worst shards."""
    with pytest.raises(SchemaError, match="refused before"):
        pack_sequences(
            docs, "n_tok", 256, n_shards=1, max_shard_rows=500,
            precheck_shards=True,
        )
    # derived sizing runs the precheck by default and passes when sized
    packed = pack_sequences(
        docs, "n_tok", 256, rows_per_shard=100, max_shard_rows=1000
    )
    assert packed.count() == 1200


# ---------------------------------------------------------------- chunking


def _chunk_fixture(spark):
    return spark.createDataFrame(
        [
            ("a", "abcdefghij"),  # len 10 → 3 chunks at w=4, s=3
            ("b", "abc"),  # fits in one window
            ("c", ""),  # empty-but-non-null: one empty chunk
            ("d", None),  # NULL: no chunks
            ("e", "abcdefgh"),  # len 8: short tail chunk
        ],
        "doc_id string, body string",
    )


def test_chunk_char_exact(spark):
    from mdvalidate_spark.operators.packing import chunk_text

    got = [
        tuple(r)
        for r in chunk_text(_chunk_fixture(spark), "body", 4, 3)
        .orderBy("doc_id", "chunk_index")
        .collect()
    ]
    assert got == [
        ("a", 0, 3, 0, 4, "abcd"),
        ("a", 1, 3, 3, 4, "defg"),
        ("a", 2, 3, 6, 4, "ghij"),
        ("b", 0, 1, 0, 3, "abc"),
        ("c", 0, 1, 0, 0, ""),
        ("e", 0, 3, 0, 4, "abcd"),
        ("e", 1, 3, 3, 4, "defg"),
        ("e", 2, 3, 6, 2, "gh"),
    ]


def test_chunk_token_exact(spark):
    from mdvalidate_spark.operators.packing import chunk_text

    df = spark.createDataFrame(
        [("x", "  one two  three four five ")],  # messy whitespace
        "doc_id string, body string",
    )
    got = [
        tuple(r)
        for r in chunk_text(df, "body", 3, 2, unit="token")
        .orderBy("chunk_index")
        .collect()
    ]
    assert got == [
        ("x", 0, 2, 0, 3, "one two three"),
        ("x", 1, 2, 2, 3, "three four five"),
    ]


@pytest.mark.parametrize("window,stride", [(4, 3), (5, 5), (7, 2), (16, 9)])
def test_chunk_full_coverage_and_overlap(spark, window, stride):
    """Every character of every doc lands in ≥1 chunk, consecutive chunks
    abut or overlap (no gaps), and the final chunk reaches the end."""
    from mdvalidate_spark.operators.packing import chunk_text

    docs = spark.createDataFrame(
        [(f"d{n}", "x" * n) for n in (1, 2, 5, 7, 16, 17, 33)],
        "doc_id string, body string",
    )
    rows = (
        chunk_text(docs, "body", window, stride)
        .orderBy("doc_id", "chunk_index")
        .collect()
    )
    by_doc: dict = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert len(by_doc) == 7
    for did, chunks in by_doc.items():
        n = len(chunks[0].body) if hasattr(chunks[0], "body") else None
        ln = int(did[1:])
        assert [c.chunk_index for c in chunks] == list(range(len(chunks)))
        assert chunks[0].start == 0
        for prev, cur in zip(chunks, chunks[1:]):
            assert cur.start <= prev.start + prev.chunk_len  # no gap
        last = chunks[-1]
        assert last.start + last.chunk_len == ln  # reaches the end
        for c in chunks:
            assert len(c.chunk) == c.chunk_len


def test_chunk_refusals(spark):
    from mdvalidate_spark.operators.packing import chunk_text

    df = _chunk_fixture(spark)
    with pytest.raises(SchemaError, match="window"):
        chunk_text(df, "body", 0, 1)
    with pytest.raises(SchemaError, match="stride"):
        chunk_text(df, "body", 4, 5)  # stride > window → coverage gaps
    with pytest.raises(SchemaError, match="stride"):
        chunk_text(df, "body", 4, 0)
    with pytest.raises(SchemaError, match="unit"):
        chunk_text(df, "body", 4, 3, unit="byte")
    with pytest.raises(SchemaError, match="not in"):
        chunk_text(df, "nope", 4, 3)


def test_chunk_plan_is_map_only(spark):
    """The fan-out is explode(sequence(...)) — one map-only codegen stage:
    no Exchange (shuffle) and no Python anywhere in the plan."""
    from mdvalidate_spark.operators.packing import chunk_text

    out = chunk_text(_chunk_fixture(spark), "body", 4, 3)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan
