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
