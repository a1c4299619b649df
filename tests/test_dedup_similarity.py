"""Dedup + similarity operator tests: planted duplicates must be found,
approximate methods validated against exact ones, plan-shape checks."""

import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import dedup as D
from mdvalidate_spark.operators import similarity as S

BASE = (
    "spark shuffles data between stages when wide dependencies appear in the plan "
    "and the optimizer tries to minimize exchanges by reusing partitioning"
)


@pytest.fixture(scope="module")
def corpus(spark):
    """60 genuinely distinct docs + planted near/exact duplicates. Docs use
    per-doc vocabularies so cross-doc shingle overlap is zero — only the
    planted pairs are similar."""
    import random

    rnd = random.Random(13)
    rows = []
    for i in range(60):
        words = [f"w{i}x{rnd.randint(0, 9)}t{j}" for j in range(25)]
        rows.append((i, " ".join(words)))
    rows.append((100, rows[0][1]))                       # exact dup of 0
    near = rows[1][1].split()
    near[10] = "CHANGED"                                 # one-word edit of 1
    rows.append((101, " ".join(near)))
    rows.append((102, "UNIQUE totally different tiny"))  # unrelated
    return spark.createDataFrame(rows, "doc_id long, text string").cache()


def test_exact_duplicates(spark, corpus):
    groups = D.exact_duplicates(corpus).collect()
    assert len(groups) == 1
    assert groups[0]["representative"] == 0
    assert groups[0]["member_sample"] == [0, 100]
    assert groups[0]["group_size"] == 2


def test_ngram_jaccard_finds_planted_pairs(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]): r["jaccard"] for r in D.ngram_jaccard_pairs(corpus, threshold=0.5).collect()}
    assert pairs.get((0, 100)) == 1.0
    # one-word edit in 25 tokens flips 3 of 23 shingles → J = 20/26 ≈ 0.77
    assert (1, 101) in pairs and pairs[(1, 101)] == pytest.approx(20 / 26, abs=1e-4)


def test_minhash_lsh_recall_vs_exact(spark, corpus):
    exact = {
        (r["id_a"], r["id_b"])
        for r in D.ngram_jaccard_pairs(corpus, threshold=0.7).collect()
    }
    approx = {
        (r["id_a"], r["id_b"])
        for r in D.minhash_lsh_duplicates(corpus, threshold=0.7, num_hashes=32, bands=8).collect()
    }
    assert exact, "fixture must contain >=1 high-jaccard pair"
    # verification step guarantees precision; banding should give high recall
    assert approx.issubset(exact) or approx == exact
    recall = len(approx & exact) / len(exact)
    assert recall >= 0.9, (recall, exact - approx)


def test_minhash_hashed_base_signature_identical_to_string_path(spark, corpus):
    """Round-6 optimization invariant: the int64 hashed-shingle pipeline must
    produce BIT-IDENTICAL minhash signatures to the original string-shingle
    path — that equality is what keeps banding (and candidate recall)
    unchanged. array_min over re-hashed base values is invariant under
    array_distinct, so both columns below must agree on every doc."""
    from mdvalidate_spark.operators.dedup import (
        _MINHASH_SEED,
        _minhash_sig_from_hashes_cached,
        minhash_signature,
    )
    from mdvalidate_spark.operators.text import shingles

    docs = corpus.select(
        "doc_id",
        shingles(F.col("text"), 3).alias("sh"),
        F.array_distinct(
            F.transform(
                shingles(F.col("text"), 3),
                lambda s: F.xxhash64(s, F.lit(_MINHASH_SEED)),
            )
        ).alias("shh"),
    ).where(F.size("sh") > 0)
    cmp = docs.select(
        minhash_signature(F.col("sh"), 32).alias("sig_str"),
        _minhash_sig_from_hashes_cached("shh", 32).alias("sig_hash"),
    )
    assert cmp.where(F.col("sig_str") != F.col("sig_hash")).count() == 0
    assert cmp.count() > 0


def test_minhash_no_false_positives_below_threshold(spark, corpus):
    pairs = D.minhash_lsh_duplicates(corpus, threshold=0.7).collect()
    for r in pairs:
        assert r["jaccard"] >= 0.7


def test_simhash_identical_and_near(spark, corpus):
    pairs = {(r["id_a"], r["id_b"]): r["hamming"] for r in D.simhash_duplicates(corpus, max_hamming=6).collect()}
    assert pairs.get((0, 100)) == 0  # identical text → identical simhash
    assert (1, 101) in pairs  # one-word edit → few bits


def test_simhash_banding_full_recall(spark, corpus):
    """The pigeonhole bound needs bands > max_hamming; simhash_duplicates
    must auto-raise an undersized bands so the banded set EQUALS the exact
    all-pairs Hamming set (here computed by brute-force cross join)."""
    for portable in (False, True):
        sigs = corpus.where(F.length(F.col("text")) > 0).select(
            "doc_id", D.simhash64(F.col("text"), portable=portable).alias("sim")
        )
        a = sigs.select(F.col("doc_id").alias("id_a"), F.col("sim").alias("sa"))
        b = sigs.select(F.col("doc_id").alias("id_b"), F.col("sim").alias("sb"))
        exact = {
            (r["id_a"], r["id_b"])
            for r in a.crossJoin(b)
            .where(F.col("id_a") < F.col("id_b"))
            .where(F.bit_count(F.col("sa").bitwiseXOR(F.col("sb"))) <= 6)
            .collect()
        }
        # bands=4 is undersized for max_hamming=6 → must be auto-raised to 8
        banded = {
            (r["id_a"], r["id_b"])
            for r in D.simhash_duplicates(
                corpus, max_hamming=6, bands=4, portable=portable
            ).collect()
        }
        assert banded == exact


def test_simhash_portable_matches_duckdb(spark):
    """portable=True must be bit-for-bit reproducible outside Spark: the
    md5-derived token hash and sign-vector packing are recomputed in DuckDB
    (the driver's oracle engine) and the pair sets compared."""
    duckdb = pytest.importorskip("duckdb")
    import sys
    from pathlib import Path

    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    if not Path(sf, "documents.parquet").exists():
        pytest.skip("testdata not present")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet'")
    oracle = {
        (r[0], r[1]): r[2]
        for r in con.sql(entry.oracle_sql()["simhash_documents"]).fetchall()
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in entry.queries()["simhash_documents"](spark, sf).collect()
    }
    assert got == oracle


def test_embedding_near_duplicates_planted(spark):
    import random

    rnd = random.Random(7)
    rows = []
    for i in range(40):
        rows.append((i, [rnd.uniform(-1, 1) for _ in range(16)]))
    # plant: 900 ≈ scaled copy of 0 (cosine 1.0), 901 = slightly noised 1
    rows.append((900, [2.0 * x for x in rows[0][1]]))
    rows.append((901, [x + 0.01 for x in rows[1][1]]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in D.embedding_near_duplicates(df, threshold=0.95, n_planes=16, bands=8).collect()
    }
    assert pairs.get((0, 900)) == pytest.approx(1.0)
    assert (1, 901) in pairs and pairs[(1, 901)] > 0.99


def test_topk_bruteforce_matches_numpy(spark):
    import numpy as np

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    data = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64) for r in emb.collect()}
    queries = emb.where(F.col("vec_id") < 3)
    got = S.topk_bruteforce(emb, queries, k=5).collect()
    by_q = {}
    for r in got:
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"], r["cosine"]))
    for qid, lst in by_q.items():
        qv = data[qid]
        sims = sorted(
            (
                (float(qv @ v / (np.linalg.norm(qv) * np.linalg.norm(v))), -nid)
                for nid, v in data.items()
                if nid != qid
            ),
            reverse=True,
        )[:5]
        expect_ids = [-n for _, n in sims]
        got_ids = [nid for _, nid, _ in sorted(lst)]
        assert got_ids == expect_ids, qid
        for (rank, nid, cos), (s, n) in zip(sorted(lst), sims):
            assert cos == pytest.approx(s, abs=1e-5)


def test_topk_query_side_broadcast(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = (
        S.topk_bruteforce(emb, emb.limit(2), k=3)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastHashJoin" in plan


def test_ivf_recall_vs_bruteforce(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.where(F.col("vec_id") < 10)
    exact = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_bruteforce(emb, queries, k=5).collect()
    }
    approx = {
        (r["query_id"], r["neighbor_id"])
        for r in S.topk_ivf(emb, queries, k=5, n_cells=8, nprobe=4).collect()
    }
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.5, recall  # random embeddings are a worst case for IVF


def test_count_above_threshold_nonneg(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = S.count_above_threshold(emb, emb.limit(5), 0.2).collect()
    assert len(out) == 5
    assert all(r["n_similar"] >= 0 for r in out)


def test_connected_components_transitive(spark):
    """A~B, B~C, D~E → clusters {A,B,C} and {D,E}; A never paired with C
    directly. Labels converge to the min id of each component."""
    from mdvalidate_spark.operators.dedup import connected_components, duplicate_clusters

    pairs = spark.createDataFrame(
        [("b", "a"), ("b", "c"), ("d", "e"), ("x", "y"), ("y", "z"), ("x", "z")],
        "id_a string, id_b string",
    )
    cc = {r["node"]: r["component"] for r in connected_components(pairs).collect()}
    assert cc == {"a": "a", "b": "a", "c": "a", "d": "d", "e": "d",
                  "x": "x", "y": "x", "z": "x"}

    clusters = {r["representative"]: (r["size"], r["member_sample"])
                for r in duplicate_clusters(pairs).collect()}
    assert clusters == {
        "a": (3, ["a", "b", "c"]),
        "d": (2, ["d", "e"]),
        "x": (3, ["x", "y", "z"]),
    }
    # bounded output: a big cluster reports full size but a capped sample
    capped = {r["representative"]: r
              for r in duplicate_clusters(pairs, sample_size=2).collect()}
    assert capped["x"]["size"] == 3 and capped["x"]["member_sample"] == ["x", "y"]


def test_connected_components_long_chain(spark):
    """VERDICT r3 #5: a path graph with diameter FAR beyond the round cap
    (200 ≫ max_iter=20, i.e. 10× the old O(diameter) bar and 10× the 2×-cap
    done-bar) must converge — pointer doubling makes rounds O(log diameter)
    (reach 2^k−1 after k rounds → ~8 rounds + confirmation here)."""
    from mdvalidate_spark.operators.dedup import connected_components

    n = 200
    pairs = spark.createDataFrame(
        [(f"n{i:03d}", f"n{i+1:03d}") for i in range(n)], "id_a string, id_b string"
    )
    cc = connected_components(pairs)  # default max_iter=20
    comps = {r["component"] for r in cc.collect()}
    assert comps == {"n000"}
    assert cc.count() == n + 1


def test_minhash_full_recall_on_fixture(spark):
    """The minhash_pairs_documents driver oracle asserts set equality with the
    exact n-gram operator — valid only while the deterministic banded LSH has
    FULL recall on the fixture pair set. Lock that invariant here so a future
    parameter change that silently drops recall fails a test instead of the
    driver's correctness gate."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    exact = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(docs, threshold=0.5).collect()
    }
    mh = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in D.minhash_lsh_duplicates(
            docs, threshold=0.5, num_hashes=32, bands=8
        ).collect()
    }
    assert mh == exact


def test_connected_components_raises_when_unconverged(spark):
    """A chain longer than max_iter rounds must refuse (split components are
    silently WRONG) rather than return."""
    import pytest

    n = 8
    pairs = spark.createDataFrame(
        [(f"d{i:02d}", f"d{i+1:02d}") for i in range(n)], "id_a string, id_b string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        D.connected_components(pairs, max_iter=2).collect()


def test_topk_two_phase_bounds_and_exactness(spark):
    """Scale-safe top-k (VERDICT: corpus-sized window partitions): phase 1
    bounds candidates to k per (query, input partition) — ≤ k·P rows per
    query reach the global window — and the two-phase result is IDENTICAL to
    the naive single-window ranking."""
    from pyspark.sql import Window

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    corpus = emb.repartition(8)
    queries = emb.where(F.col("vec_id") < 5)
    k = 3

    c = corpus.select(F.col("vec_id").alias("neighbor_id"),
                      F.col("embedding").cast("array<double>").alias("cv"))
    q = queries.select(F.col("vec_id").alias("query_id"),
                       F.col("embedding").cast("array<double>").alias("qv"))
    scored = (
        c.join(F.broadcast(q))
        .where(F.col("neighbor_id") != F.col("query_id"))
        .select("query_id", "neighbor_id",
                D.cosine(F.col("qv"), F.col("cv")).alias("cos_full"))
    )

    # phase-1 bound: ≤ k · num input partitions rows per query
    local = S.local_topk(scored, k)
    n_parts = scored.rdd.getNumPartitions()
    per_query = {r["query_id"]: r["n"] for r in
                 local.groupBy("query_id").agg(F.count("*").alias("n")).collect()}
    assert all(n <= k * n_parts for n in per_query.values())

    # exactness: two-phase == naive single window
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_full").desc(), F.col("neighbor_id").asc())
    naive = (scored.withColumn("rank", F.row_number().over(w))
             .where(F.col("rank") <= k)
             .select("query_id", "neighbor_id",
                     F.round("cos_full", 6).alias("cosine"), "rank"))
    got = sorted(tuple(r) for r in S.topk_bruteforce(corpus, queries, k=k).collect())
    want = sorted(tuple(r) for r in naive.collect())
    assert got == want


def test_connected_components_converges_at_the_wire(spark):
    """A path graph needing exactly max_iter label-changing rounds must be
    ACCEPTED (the confirming round observes fixpoint), not refused — the
    failure was raising 'did not converge' on correct labels."""
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4)], "id_a long, id_b long"
    )
    cc = {r["node"]: r["component"]
          for r in D.connected_components(pairs, max_iter=3).collect()}
    assert cc == {1: 1, 2: 1, 3: 1, 4: 1}


def test_simhash_max_hamming_bound(spark, corpus):
    with pytest.raises(ValueError, match="64-bit signature"):
        D.simhash_duplicates(corpus, max_hamming=64)


def test_ivf_index_persisted_matches_in_memory(spark, tmp_path):
    """The persisted IVF index must return exactly what the in-memory IVF
    returns for the same centroids, and the scan of the probed cells must
    show a PARTITION filter on cell (pruning, not full-corpus read)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").cache()
    queries = emb.where(F.col("vec_id") < 5)
    path = str(tmp_path / "ivf")

    cents = S.ivf_index_write(emb, path, n_cells=8)
    got = S.topk_ivf_indexed(spark, path, queries, k=3, nprobe=3)
    want = S.topk_ivf(emb, queries, k=3, nprobe=3, n_cells=8, centroids=cents)
    as_set = lambda df: {  # noqa: E731
        (r["query_id"], r["neighbor_id"], r["rank"]) for r in df.collect()
    }
    assert as_set(got) == as_set(want)

    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cell" in plan.split("PartitionFilters")[1][:200]


def test_ivf_assignment_arrow_matches_literal(spark):
    """The Arrow-batched cell assignment (the scale path for large
    n_cells × dim) must agree with the unrolled literal expression on both
    the corpus argmin and the query-side nprobe probe set (VERDICT r2 #2)."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    v = emb.select(
        F.col("vec_id"), F.col("embedding").cast("array<double>").alias("cv")
    )
    cents = S.ivf_build_centroids(emb, n_cells=8)

    lit = {r["vec_id"]: r["cell"]
           for r in S._assign_cells(v, cents, "cv", force="literal").collect()}
    arw = {r["vec_id"]: r["cell"]
           for r in S._assign_cells(v, cents, "cv", force="arrow").collect()}
    assert lit == arw

    q = v.where(F.col("vec_id") < 20)
    plit = {(r["vec_id"], r["cell"])
            for r in S._probe_cells(q, cents, 3, "cv", force="literal").collect()}
    parw = {(r["vec_id"], r["cell"])
            for r in S._probe_cells(q, cents, 3, "cv", force="arrow").collect()}
    assert plit == parw


def test_ivf_large_cell_count_bounded_plan(spark, tmp_path):
    """n_cells=256 × dim=64 (≈16k would-be literals — past the documented
    Catalyst/Janino blowup point) must build an index and answer queries in
    bounded time via the Arrow assignment path, with NO unrolled centroid
    literals in the plan."""
    import time

    import numpy as np

    rng = np.random.default_rng(7)
    n, dim, n_cells = 2048, 64, 256
    rows = [(int(i), rng.standard_normal(dim).tolist()) for i in range(n)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [rng.standard_normal(dim).tolist() for _ in range(n_cells)]

    t0 = time.time()
    assigned = S._assign_cells(
        emb.select("vec_id", F.col("embedding").cast("array<double>").alias("cv")),
        cents, "cv",
    )
    # plan must be the kernel, not an unrolled expression forest
    plan = assigned._jdf.queryExecution().analyzed().toString()
    assert len(plan) < 100_000
    n_cells_seen = assigned.select("cell").distinct().count()
    assert n_cells_seen > 1

    q = emb.where(F.col("vec_id") < 3)
    got = S.topk_ivf(emb, q, k=3, n_cells=n_cells, nprobe=8, centroids=cents)
    assert got.count() == 9
    # generous wall cap: analysis blowup at this size was minutes, not seconds
    assert time.time() - t0 < 120, "IVF at 256 cells should not blow up analysis"


def test_ngram_hot_shingle_10k_docs_completes(spark):
    """One shingle shared by 10k documents must not blow up a single task:
    it exceeds max_df (stop-shingle) and is dropped from candidate
    generation; every other shingle is unique. Completes fast, zero pairs
    (the array-side combos form built a ~df²/2-struct value in ONE row)."""
    docs = spark.range(10_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma u"), F.col("id").cast("string"),
            F.lit(" v"), F.col("id").cast("string"),
            F.lit(" w"), F.col("id").cast("string"),
        ).alias("text"),
    )
    assert D.ngram_jaccard_pairs(docs, threshold=0.2).count() == 0


def test_ngram_no_posting_arrays_50k_hot_shingle(spark):
    """VERDICT r3 #1: the stop-shingle filter must run COUNT-FIRST. A
    shingle present in 50k docs (at corpus scale: 10^8-10^9) must never
    materialize its doc-id set as one aggregation-buffer array — the plan
    must contain NO collect_set/collect_list anywhere, and the job must
    complete with zero pairs (the hot shingle is a dropped stop-shingle,
    every other shingle is unique)."""
    docs = spark.range(50_000).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma u"), F.col("id").cast("string"),
            F.lit(" v"), F.col("id").cast("string"),
            F.lit(" w"), F.col("id").cast("string"),
        ).alias("text"),
    )
    out = D.ngram_jaccard_pairs(docs, threshold=0.2)
    plan = out._jdf.queryExecution().toString()
    assert "collect_set" not in plan and "collect_list" not in plan, (
        "posting arrays are back on the ngram candidate path"
    )
    assert out.count() == 0


def test_ngram_boundary_shingle_pairs_via_join(spark):
    """A shingle shared by MANY docs but under max_df must still produce the
    full exact candidate set through the posting self-join (correctness of
    the de-fused pair generation): 120 docs sharing 'alpha beta gamma',
    each with 3 shingles (1 shared, 2 unique) → J = 1/5 for every pair."""
    n = 120
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.concat(
            F.lit("alpha beta gamma d"), F.col("id").cast("string"),
            F.lit(" e"), F.col("id").cast("string"),
        ).alias("text"),
    )
    got = D.ngram_jaccard_pairs(docs, threshold=0.2, max_df=200).collect()
    assert len(got) == n * (n - 1) // 2
    assert all(abs(r["jaccard"] - 0.2) < 1e-9 for r in got)


def test_exact_duplicates_bounded_mega_group(spark):
    """A mega duplicate group (one text copied 5000x) must emit bounded
    output: representative + full count + a sample capped at sample_size —
    never the whole member array in one row (VERDICT r2 #7)."""
    docs = spark.range(5_000).select(
        F.col("id").alias("doc_id"), F.lit("same exact text here").alias("text")
    ).unionByName(
        spark.createDataFrame(
            [(100_000, "unique text one"), (100_001, "unique text two")],
            "doc_id long, text string",
        )
    )
    got = D.exact_duplicates(docs, sample_size=16).collect()
    assert len(got) == 1
    r = got[0]
    assert r["group_size"] == 5_000
    assert r["representative"] == 0
    assert r["member_sample"] == list(range(16))


# ------------------------------------------------- phash hamming near-dup


def test_hamming_near_duplicates_planted(spark):
    """Planted signature fixture: groups of near signatures (<=2 bit flips
    apart), hot signatures with multiplicity, far-apart groups. Banded
    result must EQUAL brute-force popcount(xor) over distinct signatures."""
    import itertools

    base_a = 0x0F0F0F0F0F0F0F0F
    base_b = 0x123456789ABCDEF0
    rows = []
    # group A: base + 1-bit and 2-bit flips, ids 0..3; id 4 repeats base
    rows.append((0, base_a))
    rows.append((1, base_a ^ (1 << 5)))
    rows.append((2, base_a ^ (1 << 40) ^ (1 << 41)))
    rows.append((3, base_a ^ (1 << 63)))  # sign-bit flip: negative long
    rows.append((4, base_a))              # exact dup -> count 2, no pair
    # group B: far from A (differs ~32 bits)
    rows.append((10, base_b))
    rows.append((11, base_b ^ (1 << 7)))
    rows.append((20, None))               # NULL sig must be ignored
    import numpy as np

    df = spark.createDataFrame(
        [(i, np.int64(np.uint64(s)).item() if s is not None else None) for i, s in rows],
        "image_id long, phash long",
    )
    got = {
        (r["sig_a"], r["sig_b"]): (r["rep_a"], r["rep_b"], r["count_a"], r["count_b"], r["hamming"])
        for r in D.hamming_near_duplicates(df, max_hamming=3, bands=2).collect()
    }
    # brute force over distinct sigs
    sigs = {}
    for i, s in rows:
        if s is None:
            continue
        v = int(np.int64(np.uint64(s)))
        sigs.setdefault(v, []).append(i)
    want = {}
    for a, b in itertools.combinations(sorted(sigs), 2):
        h = bin((a ^ b) & 0xFFFFFFFFFFFFFFFF).count("1")
        if 1 <= h <= 3:
            want[(a, b)] = (min(sigs[a]), min(sigs[b]), len(sigs[a]), len(sigs[b]), h)
    assert got == want
    assert len(got) >= 4  # group A yields C(4,2)=6 minus any >3... sanity
    # counts carried: the hot signature (base_a, ids 0+4) has count 2
    hot = [v for v in got.values() if v[2] == 2 or v[3] == 2]
    assert hot, "hot signature multiplicity must be carried"


def test_hamming_near_duplicates_hot_key_collapse(spark):
    """10k rows sharing ONE signature plus one near neighbor: output is ONE
    signature-level pair with count 10000 — not 10^8 id pairs."""
    rows = [(i, 42) for i in range(10_000)] + [(99_999, 42 ^ 3)]
    df = spark.createDataFrame(rows, "image_id long, phash long")
    out = D.hamming_near_duplicates(df, max_hamming=2, bands=4).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["count_a"], r["count_b"]) in {(10_000, 1), (1, 10_000)}
    assert r["hamming"] == 2


def test_hamming_near_duplicates_on_synthetic_images(spark, tmp_path):
    """End-to-end over the synthetic images table (hot-keyed phash by
    design): completes, exact-equal signatures never pair, all pairs within
    bound."""
    from mdvalidate_spark.sources.synthetic import synthetic_images

    df = synthetic_images(spark, rows=2_000, with_bytes=False, n_partitions=4)
    out = D.hamming_near_duplicates(df, sig_col="phash", id_col="image_id", max_hamming=8).collect()
    for r in out:
        assert 1 <= r["hamming"] <= 8
        assert r["sig_a"] < r["sig_b"]


def test_srp_literal_arrow_parity(spark):
    """The two SRP physical strategies must emit identical pair sets."""
    from mdvalidate_spark.operators.dedup import embedding_near_duplicates

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    lit = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(emb, threshold=0.9, force="literal").collect()
    }
    arw = {
        (r["id_a"], r["id_b"], r["cosine"])
        for r in embedding_near_duplicates(emb, threshold=0.9, force="arrow").collect()
    }
    assert lit == arw


# ------------------------------------------------- edit-distance near-dup


def _lev(a, b):
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[-1] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _edit_docs():
    base = [
        "the quick brown fox jumps over the lazy dog tonight",
        "a completely different caption about mountain lakes",
        "validation engines compare rows against declared rules",
    ]
    docs = []
    for i, t in enumerate(base):
        docs.append((i * 10, t))
        docs.append((i * 10 + 1, t.replace("o", "0", 1)))          # 1 edit
        docs.append((i * 10 + 2, "x" + t[1:-1] + "zz"))            # 3 edits
    # short strings (below the q-gram guarantee): recall must come from
    # the all-pairs short block
    docs += [(900, "cat"), (901, "cot"), (902, "dog"), (903, "dogs")]
    return docs


def test_edit_distance_matches_bruteforce(spark):
    from mdvalidate_spark.operators.dedup import edit_distance_duplicates
    from mdvalidate_spark.operators.text import normalize_text

    docs = _edit_docs()
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"], r["dist"])
        for r in edit_distance_duplicates(df, max_dist=2, max_df=10_000).collect()
    }
    norm = {i: " ".join(t.lower().split()) for i, t in docs}
    want = set()
    for i in sorted(norm):
        for j in sorted(norm):
            if i < j:
                d = _lev(norm[i], norm[j])
                if d <= 2:
                    want.add((i, j, d))
    assert got == want
    assert (900, 901, 1) in got and (902, 903, 1) in got  # short block
    assert (0, 1, 1) in got
    assert not any(a == 0 and b == 2 for a, b, _ in got)  # 3 edits pruned


def test_edit_distance_short_cap_refusal(spark):
    from mdvalidate_spark.operators.dedup import edit_distance_duplicates

    df = spark.createDataFrame(
        [(i, "ab%d" % (i % 7)) for i in range(50)], "doc_id long, text string"
    )
    with pytest.raises(ValueError, match="short_block_cap"):
        edit_distance_duplicates(df, short_block_cap=10).collect()


def test_edit_distance_plan_no_posting_arrays(spark):
    from mdvalidate_spark.operators.dedup import edit_distance_duplicates

    df = spark.createDataFrame(
        [(i, "caption number %d with shared words" % i) for i in range(100)],
        "doc_id long, text string",
    )
    out = edit_distance_duplicates(df, max_dist=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "collect_set" not in plan  # count-first postings, never arrays


# ----------------------------------------------------------- survivors


def test_dedup_survivors_default_min_id(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, "b"), (4, "c"), (5, "c"), (6, "c")],
        "doc_id long, text string",
    )
    clusters = df.select("doc_id", F.md5("text").alias("cluster_id"))
    surv = D.dedup_survivors(df, clusters)
    assert sorted(r.doc_id for r in surv.collect()) == [1, 3, 4]
    assert surv.columns == df.columns  # full rows survive, not just ids


def test_dedup_survivors_prefer_and_tiebreak(spark):
    df = spark.createDataFrame(
        [(1, "g1", 5), (2, "g1", 9), (3, "g1", 9), (4, "g2", 1)],
        "doc_id long, grp string, score int",
    )
    clusters = df.select("doc_id", F.col("grp").alias("cluster_id"))
    surv = D.dedup_survivors(df, clusters, prefer_col="score")
    # highest score wins; the 9-vs-9 tie goes to the LARGEST id (3, not 2)
    assert sorted(r.doc_id for r in surv.collect()) == [3, 4]


def test_dedup_survivors_null_prefer_loses(spark):
    df = spark.createDataFrame(
        [(1, "g", None), (2, "g", 3)], "doc_id long, grp string, score int"
    )
    clusters = df.select("doc_id", F.col("grp").alias("cluster_id"))
    surv = D.dedup_survivors(df, clusters, prefer_col="score")
    assert [r.doc_id for r in surv.collect()] == [2]


def test_dedup_survivors_unclustered_rows_pass_through(spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (7, "z")], "doc_id long, text string"
    )
    # membership only covers the duplicate pair; 7 is absent → survives
    clusters = spark.createDataFrame(
        [(1, "c1"), (2, "c1")], "doc_id long, cluster_id string"
    )
    assert sorted(r.doc_id for r in D.dedup_survivors(df, clusters).collect()) == [1, 7]


def test_dedup_survivors_composes_with_exact_fingerprints(corpus):
    from mdvalidate_spark.operators.text import fingerprint_md5

    clusters = corpus.select(
        "doc_id", fingerprint_md5(F.col("text")).alias("cluster_id")
    )
    surv = D.dedup_survivors(corpus, clusters)
    # the only exact dup group is {0, 100} → 100 dropped, everyone else kept
    assert surv.count() == corpus.count() - 1
    assert surv.where("doc_id = 100").count() == 0
    assert surv.where("doc_id = 0").count() == 1


def test_dedup_survivors_stale_clusters_never_orphan(spark):
    # regression: an id present in clusters but filtered out of df must not
    # be elected representative (that dropped the whole surviving cluster)
    df = spark.createDataFrame([(2, "a"), (3, "a")], "doc_id long, text string")
    clusters = spark.createDataFrame(
        [(1, "c"), (2, "c"), (3, "c")], "doc_id long, cluster_id string"
    )
    surv = D.dedup_survivors(df, clusters)
    assert [r.doc_id for r in surv.collect()] == [2]


def test_cross_field_duplicates_both_directions(spark):
    df = spark.createDataFrame(
        [
            (1, "capA", 10),
            (2, "capA", 10),   # same caption, same image → clean
            (3, "capB", 20),
            (4, "capB", 21),   # same caption, DIFFERENT images → flagged
            (5, None, 30),     # NULL group ignored
            (6, "capC", 20),   # phash 20 under two captions (B and C)
        ],
        "doc_id long, caption string, phash long",
    )
    from mdvalidate_spark.operators.dedup import cross_field_duplicates

    by_cap = {r.caption: r for r in cross_field_duplicates(df, "caption", "phash").collect()}
    assert set(by_cap) == {"capB"}
    assert by_cap["capB"].n_rows == 2 and by_cap["capB"].n_distinct == 2
    assert (by_cap["capB"].example_lo, by_cap["capB"].example_hi) == (20, 21)

    by_ph = {r.phash: r for r in cross_field_duplicates(df, "phash", "caption").collect()}
    assert set(by_ph) == {20}  # image 20 carries captions capB and capC


def test_cross_field_duplicates_null_distinct_ignored(spark):
    from mdvalidate_spark.operators.dedup import cross_field_duplicates

    df = spark.createDataFrame(
        [(1, "c", 5), (2, "c", None), (3, "c", 5)], "k long, g string, v int"
    )
    # only one non-NULL distinct value → clean
    assert cross_field_duplicates(df, "g", "v").count() == 0


def test_boilerplate_line_removal_strips_corpus_frequent_lines(spark):
    """CCNet-style line dedup: a footer present in >max_df docs is stripped
    from every doc (all its copies), rarer lines survive in order, blank
    lines are exempt, and a doc whose every line was boilerplate comes back
    empty (still one output row)."""
    docs = spark.createDataFrame(
        [
            (1, "alpha\nFooter Line\n\nbody one\nfooter line"),
            (2, "beta\nfooter line\n\nbody two"),
            (3, "gamma\nFOOTER LINE \nbody three"),
            (4, "footer line"),
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in D.boilerplate_line_removal(
            docs, "text", "doc_id", max_df=2, min_chars=1
        ).collect()
    }
    # normalization: case/trim variants all count as ONE line, df=4 > 2
    assert out[1]["cleaned_text"] == "alpha\n\nbody one"
    assert out[1]["n_lines"] == 5 and out[1]["n_removed"] == 2
    assert out[2]["cleaned_text"] == "beta\n\nbody two"
    assert out[3]["cleaned_text"] == "gamma\nbody three"
    # all-boilerplate doc: present, empty, fully counted
    assert out[4]["cleaned_text"] == "" and out[4]["n_removed"] == 1
    # blank lines exempt: df of "" is 2 docs but they were never counted
    assert "\n\n" in out[1]["cleaned_text"]


def test_boilerplate_line_removal_respects_max_df(spark):
    """A line in exactly max_df docs is KEPT (strictly-greater contract)."""
    docs = spark.createDataFrame(
        [(1, "shared\nu1"), (2, "shared\nu2"), (3, "solo\nu3")],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r["cleaned_text"]
        for r in D.boilerplate_line_removal(
            docs, "text", "doc_id", max_df=2
        ).collect()
    }
    assert out[1] == "shared\nu1" and out[2] == "shared\nu2"
    assert out[3] == "solo\nu3"


def test_boilerplate_line_removal_crlf_and_null(spark):
    """CRLF twins of a line share the LF line's frequency key (split is
    \\r?\\n and keys come from normalize_text, so '\\tfooter' == 'footer'),
    CRLF blank lines stay exempt, and a NULL-text document is returned as
    one blank-line row — never silently dropped from the output corpus."""
    docs = spark.createDataFrame(
        [
            (1, "footer\r\n\r\nkeep one"),   # CRLF doc, CRLF blank line
            (2, "\tfooter \nkeep two"),      # LF doc, tab-indented footer
            (3, "Footer\nkeep three"),
            (4, None),                       # NULL text
        ],
        "doc_id long, text string",
    )
    out = {
        r["doc_id"]: r
        for r in D.boilerplate_line_removal(
            docs, "text", "doc_id", max_df=2, min_chars=1
        ).collect()
    }
    assert len(out) == 4  # NULL doc present
    # footer df=3 across CRLF/tab/case variants -> stripped everywhere
    assert out[1]["cleaned_text"] == "\nkeep one" and out[1]["n_removed"] == 1
    assert out[2]["cleaned_text"] == "keep two"
    assert out[3]["cleaned_text"] == "keep three"
    # CRLF blank line exempt (not counted, kept): n_lines counts it
    assert out[1]["n_lines"] == 3
    # NULL text -> one exempt blank line, nothing removed
    assert out[4]["n_lines"] == 1 and out[4]["n_removed"] == 0
    assert out[4]["cleaned_text"] == ""


# ------------------------------------------------- repeated spans (winnow)


def _py_span_fps(text, k, window):
    """Independent Python replica of span_fingerprints (md5 winnowing)."""
    import hashlib
    import re

    t = re.sub(r"[ \t\r\n]+", " ", (text or "").lower()).strip()
    n = len(t)
    if n < k + window - 1:
        return {}
    hs = [
        hashlib.md5(t[i : i + k].encode()).hexdigest()[:15]
        for i in range(n - k + 1)
    ]
    out = {}
    for j in range(len(hs) - window + 1):
        fp = min(hs[j : j + window])
        out.setdefault(fp, j + 1)  # first window pos, 1-based
    return out


def test_span_fingerprints_match_python_replica(spark):
    import random

    rnd = random.Random(41)
    rows = [
        (i, " ".join(f"t{rnd.randint(0, 50)}" for _ in range(40)))
        for i in range(6)
    ] + [(6, "Tabs\tand\r\nnewlines   collapse  HERE exactly once in a doc")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = (
        df.select(
            "doc_id",
            F.explode(D.span_fingerprints(F.col("text"), 5, 7)).alias("w"),
        )
        .groupBy("doc_id", "w.fp")
        .agg(F.min("w.pos").alias("pos"))
        .collect()
    )
    eng = {}
    for r in got:
        eng.setdefault(r["doc_id"], {})[r["fp"]] = r["pos"]
    for i, text in rows:
        assert eng.get(i, {}) == _py_span_fps(text, 5, 7), i


def test_repeated_spans_winnowing_guarantee(spark):
    """Plant a shared span of EXACTLY window+k-1 normalized chars at
    different offsets inside otherwise-disjoint random docs: detection is
    guaranteed by the winnowing theorem, not probabilistic."""
    import random

    k, w = 8, 12
    rnd = random.Random(99)

    def junk(n, tag):
        return " ".join(f"{tag}{rnd.randint(0, 9999)}" for _ in range(n))

    span = "x" * 5
    while len(span) < w + k - 1:
        span += f" y{rnd.randint(0, 9)}"
    span = span[: w + k - 1]
    rows = [
        (1, junk(10, "a") + " " + span + " " + junk(3, "b")),
        (2, junk(2, "c") + " " + span + " " + junk(12, "d")),
        (3, junk(20, "e")),
        (4, None),
        (5, "tiny"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.repeated_spans(df, k=k, window=w).collect()}
    assert set(out) == {1, 2}  # only the planted pair; no false positives
    for r in out.values():
        assert r["n_repeated"] >= 1 and r["max_span_docs"] == 2
        assert 0 < r["repeated_frac"] <= 1
    # both docs elect the same (lexicographically first) repeated fp
    assert out[1]["example_fp"] == out[2]["example_fp"]
    # the example span is a real slice of the normalized text at example_pos
    norm1 = " ".join((rows[0][1]).lower().split())
    p = out[1]["example_pos"]
    assert out[1]["example_span"] == norm1[p - 1 : p - 1 + w + k - 1]


def test_span_postings_kernel_parity(spark):
    """The numpy winnow kernel (_span_postings) must produce EXACTLY the
    postings of the semantic spec (span_fingerprints / _py_span_fps):
    same fingerprints, same first-window positions — across ASCII text,
    repetitive text (the distinct-gram fast path), non-ASCII text (the
    per-character fallback), and too-short/NULL docs."""
    import random

    rnd = random.Random(17)
    rows = [
        (i, " ".join(f"t{rnd.randint(0, 30)}" for _ in range(40)))
        for i in range(5)
    ] + [
        (5, "abab" * 30),  # highly repetitive: few distinct grams
        (6, "café naïve résumé " * 12),  # non-ASCII chars
        (7, "Tabs\tand\r\nnewlines   collapse  HERE exactly once in a doc"),
        (8, "tiny"),
        (9, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = D._span_postings(df, "text", "doc_id", 5, 7).collect()
    eng = {}
    for r in got:
        eng.setdefault(r["doc_id"], {})[r["fp"]] = r["pos"]
    for i, text in rows:
        assert eng.get(i, {}) == _py_span_fps(text, 5, 7), i


def test_repeated_spans_no_arrays_and_min_docs(spark):
    import random

    rnd = random.Random(7)
    shared = "this exact licence header paragraph is repeated verbatim"
    rows = [
        (i, shared + " " + " ".join(f"u{i}v{rnd.randint(0,99)}" for _ in range(8)))
        for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.repeated_spans(df, k=8, window=12, min_docs=5)
    plan = out._jdf.queryExecution().executedPlan().toString()
    # count-first postings: never a per-fingerprint doc-id array
    assert "collect_set" not in plan and "collect_list" not in plan
    assert out.count() == 5  # shared by all 5 -> passes min_docs=5
    assert D.repeated_spans(df, k=8, window=12, min_docs=6).count() == 0
    with pytest.raises(ValueError):
        D.repeated_spans(df, min_docs=1)


def test_repeated_span_report_top_and_ties(spark):
    a = "alpha beta gamma delta epsilon zeta eta theta"
    b = "one two three four five six seven eight nine ten"
    rows = [
        (1, a + " filler11 filler12"),
        (2, a + " filler21 filler22"),
        (3, a + " " + b),
        (4, b + " tailword41"),
        (5, b + " tailword51"),
        (6, "nothing shared here at all qq ww ee rr tt yy uu ii"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rep = D.repeated_span_report(df, k=8, window=12, top_n=3).collect()
    assert len(rep) == 3
    # ordered by n_docs desc then fp asc; every row names a real witness
    assert [r["n_docs"] for r in rep] == sorted(
        [r["n_docs"] for r in rep], reverse=True
    )
    assert all(r["n_docs"] >= 2 for r in rep)
    fps = [r["fp"] for r in rep]
    same = [r["fp"] for r in rep if r["n_docs"] == rep[0]["n_docs"]]
    assert same == sorted(same)
    assert len(set(fps)) == 3


def test_span_param_guards(spark):
    df = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    with pytest.raises(ValueError):
        D.repeated_spans(df, k=1, window=12)
    with pytest.raises(ValueError):
        D.repeated_span_report(df, k=8, window=1)


# ---------------------------------------------- embedding-matrix health


@pytest.fixture(scope="module")
def health_vecs(spark):
    """8 hand-built dim-4 vectors: one NULL, one wrong-dim, one NaN element
    (all three excluded), dim 2 constant 0.5 across every usable row (dead),
    the rest spread."""
    rows = [
        (0, [1.0, 0.0, 0.5, 2.0]),
        (1, [-1.0, 2.0, 0.5, 0.0]),
        (2, [3.0, -2.0, 0.5, 1.0]),
        (3, [0.0, 4.0, 0.5, -1.0]),
        (4, [2.0, 1.0, 0.5, 3.0]),
        (5, None),                          # NULL vector
        (6, [9.0, 9.0]),                    # wrong dim
        (7, [1.0, float("nan"), 0.5, 1.0]), # non-finite element
    ]
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_embedding_health_exact_values(spark, health_vecs):
    import numpy as np

    prof = {r["dim_idx"]: r for r in S.embedding_health(health_vecs, dim=4).collect()}
    M = np.array(
        [[1, 0, 0.5, 2], [-1, 2, 0.5, 0], [3, -2, 0.5, 1], [0, 4, 0.5, -1], [2, 1, 0.5, 3]],
        dtype=np.float64,
    )
    means, var = M.mean(0), (M * M).mean(0) - M.mean(0) ** 2
    assert set(prof) == {0, 1, 2, 3}
    for i in range(4):
        assert prof[i]["mean"] == pytest.approx(round(means[i], 6), abs=1e-6)
        assert prof[i]["variance"] == pytest.approx(round(var[i], 6), abs=1e-6)
    # the constant dimension is dead, the spread ones are not
    assert prof[2]["dead"] is True
    assert [prof[i]["dead"] for i in (0, 1, 3)] == [False, False, False]


def test_embedding_anisotropy_summary(spark, health_vecs):
    import numpy as np

    row = S.embedding_anisotropy(health_vecs, dim=4).collect()[0]
    M = np.array(
        [[1, 0, 0.5, 2], [-1, 2, 0.5, 0], [3, -2, 0.5, 1], [0, 4, 0.5, -1], [2, 1, 0.5, 3]],
        dtype=np.float64,
    )
    assert row["rows_used"] == 5 and row["rows_excluded"] == 3
    assert row["dead_dims"] == 1
    mean_norm = np.linalg.norm(M, axis=1).mean()
    mv = np.linalg.norm(M.mean(0))
    assert row["mean_norm"] == pytest.approx(round(mean_norm, 6), abs=1e-6)
    assert row["mean_vector_norm"] == pytest.approx(round(mv, 6), abs=1e-6)
    assert row["anisotropy"] == pytest.approx(round(mv / mean_norm, 6), abs=1e-6)


def test_embedding_health_collapse_detected(spark):
    """A collapsed encoder (every vector = one direction + tiny jitter)
    drives anisotropy toward 1; a spread corpus stays low."""
    import hashlib

    def jit(i, j):  # deterministic tiny jitter
        return (hashlib.md5(f"{i}:{j}".encode()).digest()[0] / 255.0 - 0.5) * 0.01

    collapsed = spark.createDataFrame(
        [(i, [1.0 + jit(i, 0), 2.0 + jit(i, 1), -1.0 + jit(i, 2)]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    spread = spark.createDataFrame(
        [(i, [jit(i, 0) * 100, jit(i, 1) * 100, jit(i, 2) * 100]) for i in range(40)],
        "vec_id long, embedding array<double>",
    )
    a_col = S.embedding_anisotropy(collapsed, dim=3).collect()[0]["anisotropy"]
    a_spr = S.embedding_anisotropy(spread, dim=3).collect()[0]["anisotropy"]
    assert a_col > 0.99
    assert a_spr < 0.5


def test_embedding_health_empty_and_guards(spark):
    from mdvalidate_spark.errors import SchemaError

    empty = spark.createDataFrame([], "vec_id long, embedding array<double>")
    prof = S.embedding_health(empty, dim=3).collect()
    assert len(prof) == 3
    assert all(r["mean"] is None and r["variance"] is None and r["dead"] for r in prof)
    row = S.embedding_anisotropy(empty, dim=3).collect()[0]
    assert row["rows_used"] == 0 and row["dead_dims"] == 3
    assert row["anisotropy"] is None
    with pytest.raises(SchemaError):
        S.embedding_health(empty, dim=0)
    # 513..8192 now dispatches to the wide Arrow-kernel path; beyond the
    # absolute cap the refusal stays loud
    with pytest.raises(SchemaError):
        S.embedding_anisotropy(empty, dim=8193)
    with pytest.raises(SchemaError):
        S.embedding_health(empty, dim=8193)


def test_embedding_health_rule_clean_and_fires(spark):
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.spec import EmbeddingHealthRule, Spec

    spec = Spec(
        key_column="image_id",
        rules=(
            EmbeddingHealthRule(
                "emb_health", column="embedding", dim=3,
                max_dead_dims=0, max_anisotropy=0.99, min_rows=5,
            ),
        ),
    )
    import hashlib

    def jit(i, j):
        return (hashlib.md5(f"{i}:{j}".encode()).digest()[0] / 255.0 - 0.5) * 2

    healthy = spark.createDataFrame(
        [(str(i), [jit(i, 0), jit(i, 1), jit(i, 2)]) for i in range(20)],
        "image_id string, embedding array<double>",
    )
    rep = validate_table(spark, healthy, spec)
    assert rep.exit_code == 0
    mets = {
        r["metric"]: r["value"]
        for r in rep.metrics.where(F.col("rule_id") == "emb_health").collect()
    }
    assert mets["health_rows_used"] == 20.0
    assert mets["health_dead_dims"] == 0.0

    # dim 1 pinned constant (dead) + heavy common direction (anisotropy up)
    bad = spark.createDataFrame(
        [
            (str(i), [5.0 + jit(i, 0) * 0.01, 0.25, 3.0 + jit(i, 1) * 0.01])
            for i in range(20)
        ],
        "image_id string, embedding array<double>",
    )
    rep2 = validate_table(spark, bad, spec)
    assert rep2.exit_code == 1
    viols = rep2.violations.collect()
    kinds = {v["expected"] for v in viols}
    assert "dead_dims <= 0" in kinds
    assert "anisotropy <= 0.99" in kinds
    assert all(v["kind"] == "embedding_health" for v in viols)


def test_embedding_health_rule_unmeasurable_loud(spark):
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.spec import EmbeddingHealthRule, Spec

    few = spark.createDataFrame(
        [("a", [1.0, 2.0]), ("b", None)],
        "image_id string, embedding array<double>",
    )
    rep = validate_table(
        spark,
        few,
        Spec(
            key_column="image_id",
            rules=(
                EmbeddingHealthRule(
                    "emb_health", column="embedding", dim=2,
                    max_dead_dims=0, min_rows=100,
                ),
            ),
        ),
    )
    assert rep.exit_code == 1
    v = rep.violations.collect()
    assert len(v) == 1 and "unmeasurable" in v[0]["actual"]
    # the NULL vector is excluded and reported, not silently averaged
    mets = {r["metric"]: r["value"] for r in rep.metrics.collect()}
    assert mets["health_rows_excluded"] == 1.0


def test_embedding_health_rule_lints_and_roundtrip(spark):
    from mdvalidate_spark import validate_table
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import EmbeddingHealthRule, Spec
    from mdvalidate_spark.spec_io import rule_from_dict, rule_to_dict

    df = spark.createDataFrame(
        [("a", [1.0, 2.0])], "image_id string, embedding array<double>"
    )
    for bad in (
        EmbeddingHealthRule("x", column="embedding", dim=2),  # boundless
        EmbeddingHealthRule("x", column="embedding", dim=0, max_dead_dims=0),
        EmbeddingHealthRule("x", column="embedding", dim=2, max_anisotropy=1.5),
        EmbeddingHealthRule("x", column="embedding", dim=2, max_dead_dims=3),
        EmbeddingHealthRule("x", column="image_id", dim=2, max_dead_dims=0),
        EmbeddingHealthRule("x", column="embedding", dim=2, max_dead_dims=0, min_rows=0),
    ):
        with pytest.raises(SchemaError):
            validate_table(spark, df, Spec(key_column="image_id", rules=(bad,)))

    rule = EmbeddingHealthRule(
        "emb_health", column="embedding", dim=2,
        max_dead_dims=1, max_anisotropy=0.9, min_rows=7, when="1=1",
    )
    assert rule_from_dict(rule_to_dict(rule)) == rule


def test_embedding_health_incremental_through_run_and_resume(spark, tmp_path):
    """incremental=True rides the manifest-partial lifecycle: per-batch
    matrix partials persist under the checkpoint, a RESUMED run reloads the
    validated partitions' partials and finalizes without rescanning them,
    and the merged verdict + metrics equal the full-scan rule's (same
    summary arithmetic; double sums merged in a different order are rounded
    at 6 dp before any verdict). The BenfordRule incremental contract,
    applied to the embedding matrix."""
    import hashlib

    from mdvalidate_spark.run import ValidationRun, validate_table
    from mdvalidate_spark.spec import EmbeddingHealthRule, Spec

    def jit(i, j):
        return (hashlib.md5(f"{i}:{j}".encode()).digest()[0] / 255.0 - 0.5) * 2

    df = spark.createDataFrame(
        [
            (str(i), [jit(i, 0), jit(i, 1), 0.25, jit(i, 2)])
            for i in range(200)
        ]
        + [(str(900), None), (str(901), [1.0, float("nan"), 0.25, 1.0])],
        "image_id string, embedding array<double>",
    )

    def rules(inc):
        return (
            EmbeddingHealthRule(
                "emb_inc", column="embedding", dim=4,
                max_dead_dims=0, max_anisotropy=0.9, min_rows=10,
                incremental=inc,
            ),
        )

    spec = Spec(key_column="image_id", n_partitions=8, rules=rules(True))
    ckpt = str(tmp_path / "ck")

    run1 = ValidationRun(spark, spec, df, run_id="r-eh", checkpoint_dir=ckpt)
    pending = run1.pending_partitions()
    run1._validate_batch(pending[:3])
    assert sorted(run1.pending_partitions()) == sorted(pending[3:])

    # resume in a NEW run object: reloads the 3 persisted matrix partials,
    # validates the rest, merges at finalize
    run2 = ValidationRun(spark, spec, df, run_id="r-eh", checkpoint_dir=ckpt)
    assert sorted(run2.pending_partitions()) == sorted(pending[3:])
    report = run2.validate()

    full = validate_table(
        spark, df,
        Spec(key_column="image_id", n_partitions=8, rules=rules(False)),
        run_id="r-eh-full",
    )

    def mm(rep):
        return sorted(
            (r["metric"], r["value"])
            for r in rep.metrics.collect()
            if r["rule_id"] == "emb_inc"
        )

    assert mm(report) == mm(full)
    # the planted dead dim (index 2) fires identically on both paths
    assert report.exit_code == full.exit_code == 1
    v_inc = sorted(r["expected"] for r in report.violations.collect()
                   if r["rule_id"] == "emb_inc")
    v_full = sorted(r["expected"] for r in full.violations.collect()
                    if r["rule_id"] == "emb_inc")
    assert v_inc == v_full == ["dead_dims <= 0"]
    mets = dict(mm(report))
    assert mets["health_rows_used"] == 200.0
    assert mets["health_rows_excluded"] == 2.0


def test_embedding_health_partials_merge_matches_full_scan(spark):
    """Operator-level parity: partials summed across partitions feed the
    same summary arithmetic as the one-pass aggregation — identical rounded
    statistics on a multi-partition frame."""
    import hashlib

    from mdvalidate_spark.spec import EmbeddingHealthRule

    def jit(i, j):
        return (hashlib.md5(f"{i}:{j}".encode()).digest()[0] / 255.0 - 0.5) * 2

    rule = EmbeddingHealthRule(
        "eh", column="embedding", dim=3, max_dead_dims=0, min_rows=1
    )
    df = spark.createDataFrame(
        [(i, i % 7, [jit(i, 0), jit(i, 1), jit(i, 2)]) for i in range(140)],
        "id long, partition_id int, embedding array<double>",
    ).repartition(5)
    parts = S.embedding_health_partials(df, rule)
    assert parts.count() == 7  # one row per data partition id
    merged = S._anisotropy_from_one(
        S._merge_health_partials(parts, 3), 3, 0.0
    ).collect()[0]
    full = S.embedding_anisotropy(df, dim=3).collect()[0]
    assert merged.asDict() == full.asDict()


def test_embedding_health_incremental_empty_scope_first_batch(spark, tmp_path):
    """A `when`-scoped incremental rule whose first validated batch has
    ZERO in-scope rows writes a part-file-less partials directory; resume
    must reload it via the explicit dim-dependent schema (never inference)
    and finalize on the degrade path instead of crashing."""
    from mdvalidate_spark.run import ValidationRun
    from mdvalidate_spark.spec import EmbeddingHealthRule, Spec

    df = spark.createDataFrame(
        [(str(i), i, [1.0 * i, 2.0]) for i in range(40)],
        "image_id string, seq long, embedding array<double>",
    )
    spec = Spec(
        key_column="image_id", n_partitions=4,
        rules=(
            EmbeddingHealthRule(
                "eh_w", column="embedding", dim=2, max_dead_dims=2,
                min_rows=100, when="seq >= 10000",  # nothing in scope
                incremental=True,
            ),
        ),
    )
    ckpt = str(tmp_path / "ck")
    run1 = ValidationRun(spark, spec, df, run_id="r-ew", checkpoint_dir=ckpt)
    pending = run1.pending_partitions()
    run1._validate_batch(pending[:1])

    run2 = ValidationRun(spark, spec, df, run_id="r-ew", checkpoint_dir=ckpt)
    report = run2.validate()
    # zero in-scope vectors < min_rows: loud unmeasurable, never a pass
    v = [r for r in report.violations.collect() if r["rule_id"] == "eh_w"]
    assert len(v) == 1 and "unmeasurable" in v[0]["actual"]


def test_embedding_health_rule_boundless_refused_at_operator_api(spark):
    """The results builders are public operator APIs callable without
    compile_spec — a boundless rule must be a typed SchemaError on BOTH
    paths, not an empty-expected no-op (the metric_bounds precedent)."""
    from mdvalidate_spark.errors import SchemaError
    from mdvalidate_spark.spec import EmbeddingHealthRule

    df = spark.createDataFrame(
        [("a", 0, [1.0, 2.0])],
        "image_id string, partition_id int, embedding array<double>",
    )
    rule = EmbeddingHealthRule("x", column="embedding", dim=2)
    with pytest.raises(SchemaError):
        S.embedding_health_rule_results(df, rule, "r")
    with pytest.raises(SchemaError):
        S.embedding_health_rule_results_from_partials(
            S.embedding_health_partials(df, rule), rule, "r"
        )


def test_payload_duplicates_byte_exact(spark):
    """Byte-exact payload dedup: identical blobs group regardless of id;
    near-identical bytes (one bit off) do NOT; NULL payloads are out of
    scope; member sample bounded and sorted."""
    rows = [
        (1, bytes([1, 2, 3, 4])),
        (2, bytes([1, 2, 3, 4])),     # exact dup of 1
        (7, bytes([1, 2, 3, 4])),     # and another
        (3, bytes([1, 2, 3, 5])),     # one byte off: NOT a dup
        (4, None),
        (5, b""),                      # empty payloads...
        (6, b""),                      # ...are byte-identical to each other
    ]
    df = spark.createDataFrame(rows, "image_id long, bytes binary")
    got = {
        r["representative"]: r
        for r in D.payload_duplicates(df, sample_size=2).collect()
    }
    assert set(got) == {1, 5}
    assert got[1]["group_size"] == 3
    assert got[1]["member_sample"] == [1, 2]  # bounded to sample_size, sorted
    assert got[5]["group_size"] == 2
    # text normalization must NOT apply: case-differing text bytes stay distinct
    tdf = spark.createDataFrame(
        [(1, b"ABC"), (2, b"abc")], "image_id long, bytes binary"
    )
    assert D.payload_duplicates(tdf).collect() == []


# ------------------------------------- wide (dim > 512) health path


def _wide_fixture(spark, dim=600, n=50):
    """Deterministic n×dim matrix in exact-double rational arithmetic:
    value(i, j) = ((i*31 + j*7) % 97) / 97, dim 17 pinned constant (dead),
    plus one NULL row, one wrong-dim row, one NaN row (excluded)."""
    rows = []
    for i in range(n):
        v = [0.5 if j == 17 else ((i * 31 + j * 7) % 97) / 97.0 for j in range(dim)]
        rows.append((i, v))
    rows.append((n, None))
    rows.append((n + 1, [1.0] * (dim - 1)))
    bad = [1.0] * dim
    bad[3] = float("nan")
    rows.append((n + 2, bad))
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_wide_health_matches_numpy(spark):
    import numpy as np

    dim, n = 600, 50
    df = _wide_fixture(spark, dim, n)
    row = S.embedding_anisotropy(df, dim=dim).collect()[0]
    M = np.array(
        [[0.5 if j == 17 else ((i * 31 + j * 7) % 97) / 97.0 for j in range(dim)]
         for i in range(n)]
    )
    assert row["rows_used"] == n and row["rows_excluded"] == 3
    assert row["dead_dims"] == 1
    mean_norm = np.linalg.norm(M, axis=1).mean()
    mv = np.linalg.norm(M.mean(0))
    assert row["mean_norm"] == pytest.approx(round(mean_norm, 6), abs=1e-6)
    assert row["mean_vector_norm"] == pytest.approx(round(mv, 6), abs=1e-6)
    assert row["anisotropy"] == pytest.approx(round(mv / mean_norm, 6), abs=1e-6)

    prof = {r["dim_idx"]: r for r in S.embedding_health(df, dim=dim).collect()}
    assert len(prof) == dim
    assert prof[17]["dead"] is True and prof[17]["variance"] == 0.0
    for j in (0, 299, 599):
        assert prof[j]["mean"] == pytest.approx(round(M[:, j].mean(), 6), abs=1e-6)
        assert prof[j]["dead"] is False


def test_wide_kernel_parity_with_unrolled_path(spark, health_vecs):
    """The wide Arrow kernel run at a NARROW dim must reproduce the
    unrolled codegen aggregation bit-for-bit (same validity contract, same
    formulas, same 6 dp HALF_UP rounding) — the guarantee that 512 is a
    plan boundary, not a semantics boundary."""
    narrow = S.embedding_anisotropy(health_vecs, dim=4).collect()[0].asDict()
    wide = S._wide_summary_row(
        health_vecs.sparkSession,
        *S._merge_wide_partial_rows(
            S._wide_health_partials_scan(health_vecs, "embedding", 4), 4
        ),
        4,
        0.0,
    )
    # tolerance, not dict equality (round-6 ADVICE): both paths round to
    # 6 dp, but a value landing ON a rounding-tie boundary could flip with
    # partitioning/BLAS summation-order differences — compare post-round
    # values within 1e-9 so the test locks semantics, not fp addition order
    assert set(wide) == set(narrow)
    for k, v in narrow.items():
        if isinstance(v, float):
            assert wide[k] == pytest.approx(v, abs=1e-9), k
        else:
            assert wide[k] == v, k


def test_wide_health_rule_and_partials(spark):
    """EmbeddingHealthRule at dim=600 compiles, fires on the planted dead
    dim through BOTH the full-scan and the merged-partials path, and the
    two paths agree exactly."""
    from mdvalidate_spark.spec import EmbeddingHealthRule

    dim = 600
    rule = EmbeddingHealthRule(
        "eh_wide", column="embedding", dim=dim,
        max_dead_dims=0, max_anisotropy=1.0, min_rows=10, incremental=True,
    )
    df = _wide_fixture(spark, dim).withColumn(
        "partition_id", (F.col("vec_id") % 4).cast("int")
    )
    viol_full, met_full = S.embedding_health_rule_results(df, rule, "r")
    parts = S.embedding_health_partials(df, rule)
    # one partial row per (Arrow batch x partition) — multiple rows per
    # partition merge by summation; all 4 partitions must be represented
    assert parts.count() >= 4
    pids = {r["partition_id"] for r in parts.select("partition_id").collect()}
    assert pids == {0, 1, 2, 3}
    viol_inc, met_inc = S.embedding_health_rule_results_from_partials(
        parts, rule, "r"
    )
    vf = sorted(r.asDict() for r in viol_full.collect())
    vi = sorted(r.asDict() for r in viol_inc.collect())
    assert vf == vi
    assert len(vf) == 1 and "dead_dims=1 of 600" in vf[0]["actual"]
    mf = {r["metric"]: r["value"] for r in met_full.collect()}
    mi = {r["metric"]: r["value"] for r in met_inc.collect()}
    assert mf == mi and mf["health_dead_dims"] == 1.0

    # partials round-trip through the explicit wide DDL (parquet reload)
    import tempfile

    with tempfile.TemporaryDirectory() as td:
        parts.write.parquet(f"{td}/p")
        re = spark.read.schema(S.health_partials_ddl(dim)).parquet(f"{td}/p")
        viol_re, met_re = S.embedding_health_rule_results_from_partials(
            re, rule, "r"
        )
        assert sorted(r.asDict() for r in viol_re.collect()) == vf


def test_anisotropy_only_rule_all_zero_corpus_is_loud(spark):
    """ADVICE r4: an anisotropy-only rule over an all-zero corpus (the most
    collapsed corpus possible) must emit an 'unmeasurable: mean_norm=0'
    violation, not silently pass on the NULL anisotropy."""
    from mdvalidate_spark.spec import EmbeddingHealthRule

    df = spark.createDataFrame(
        [(i, [0.0, 0.0, 0.0]) for i in range(20)],
        "vec_id long, embedding array<double>",
    )
    rule = EmbeddingHealthRule(
        "eh_zero", column="embedding", dim=3, max_anisotropy=0.5, min_rows=5
    )
    viol, _ = S.embedding_health_rule_results(df, rule, "r")
    v = viol.collect()
    assert len(v) == 1
    assert "unmeasurable: mean_norm=0" in v[0]["actual"]
    assert "20 usable vectors" in v[0]["actual"]
