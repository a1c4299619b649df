"""PII detection/redaction: pinned values on crafted strings, DuckDB regex
parity probes, plan shape (one narrow scan, no shuffle, no Python)."""

import duckdb
import pytest
from pyspark.sql import functions as F

from mdvalidate_spark.operators import pii as P

DOCS = [
    (1, "reach me at jane.doe+x@sub.example.org or bob@corp.io today"),
    (2, "server 10.0.0.1 and 192.168.254.3 are up, version 1.2.3 too"),
    (3, "call +1 555 123 4567 or (415) 555-0199 after lunch"),
    (4, "ssn 123-45-6789 card 4111 1111 1111 1111 and 4111-1111-1111-1111"),
    (5, "see https://example.com/a?b=c#d and http://x.io/y, then stop"),
    (6, "clean text with no identifiers at all"),
    (7, ""),
    (8, None),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id int, text string")


@pytest.fixture(scope="module")
def prof(docs):
    return {r["doc_id"]: r for r in P.pii_profile(docs).collect()}


def test_email_counts(prof):
    assert prof[1]["n_email"] == 2
    assert prof[6]["n_email"] == 0


def test_ipv4_counts(prof):
    # version string "1.2.3" must NOT count; the two dotted quads must
    assert prof[2]["n_ipv4"] == 2


def test_phone_counts(prof):
    assert prof[3]["n_phone"] == 2


def test_ssn_cc_counts(prof):
    d = prof[4]
    assert d["n_ssn"] == 1
    assert d["n_cc"] == 2


def test_url_counts_and_total(prof):
    assert prof[5]["n_url"] == 2
    # URLs excluded from pii_total
    assert prof[5]["pii_total"] == 0
    assert prof[1]["pii_total"] == 2
    for i in (6, 7, 8):
        assert prof[i]["pii_total"] == 0 and prof[i]["n_url"] == 0


def test_redaction(spark, docs):
    red = {
        r["doc_id"]: r["red"]
        for r in docs.select("doc_id", P.redact(F.col("text")).alias("red")).collect()
    }
    assert red[1] == "reach me at <EMAIL> or <EMAIL> today"
    assert red[2] == "server <IP> and <IP> are up, version 1.2.3 too"
    assert red[3] == "call <PHONE> or <PHONE> after lunch"
    assert red[4] == "ssn <SSN> card <CC> and <CC>"
    assert red[5] == "see <URL> and <URL>, then stop"
    assert red[6] == DOCS[5][1]
    assert red[8] == ""


def test_violations_shape(spark, docs):
    rows = P.pii_violations(docs).collect()
    assert {r["doc_id"] for r in rows} == {1, 2, 3, 4}
    by_id = {r["doc_id"]: r for r in rows}
    assert by_id[4]["actual"] == "3 (ssn=1,cc=2)"
    assert by_id[2]["actual"] == "2 (ipv4=2)"
    assert all(r["rule_id"] == "pii_max_total" and r["kind"] == "pii" for r in rows)
    # raising the threshold silences the 2-hit docs
    assert {r["doc_id"] for r in P.pii_violations(docs, max_total=2).collect()} == {4}


def test_duckdb_regex_parity(spark, docs):
    """The oracle contract: DuckDB's RE2 must count the same spans as
    Spark's Java regex for every pattern on every crafted doc — non-URL
    kinds on the URL-masked text, mirroring pii_counts."""
    spark_counts = {
        (r["doc_id"], name): r[f"n_{name}"]
        for r in P.pii_profile(docs).collect()
        for name in P.PII_KINDS
    }
    con = duckdb.connect()
    for name, pat, _ in P.PII_PATTERNS:
        for doc_id, text in DOCS:
            base = "coalesce(?, '')"
            if name != "url":
                base = f"regexp_replace({base}, ?, ' ', 'g')"
                args = [text, P.URL_RE, pat]
            else:
                args = [text, pat]
            got = con.execute(
                f"SELECT len(regexp_extract_all({base}, ?))", args
            ).fetchone()[0]
            assert got == spark_counts[(doc_id, name)], (name, doc_id)


def test_pii_inside_urls_counts_as_url(spark):
    """An email/IP that exists only INSIDE a URL is a URL, not loose PII —
    counts agree with what redact() leaves behind."""
    df = spark.createDataFrame(
        [(1, "visit http://10.1.2.3/unsub?email=bob@x.com now")],
        "doc_id int, text string",
    )
    r = P.pii_profile(df).collect()[0]
    assert r["n_url"] == 1 and r["n_ipv4"] == 0 and r["n_email"] == 0
    assert r["pii_total"] == 0
    red = df.select(P.redact(F.col("text")).alias("t")).collect()[0]["t"]
    assert red == "visit <URL> now"


def test_plan_is_one_narrow_pass(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    for frame in (P.pii_profile(docs), P.pii_violations(docs)):
        plan = frame._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan and "PythonUDF" not in plan


# ------------------------------------------------ URL / domain hygiene

DOM_DOCS = [
    (1, "see https://Ads.Example.org/x and https://ads.example.org/y ok"),
    (2, "read http://blog.example.net:8080/post#frag and https://ads.example.org/z"),
    (3, "no links at all here"),
    (4, None),
]


@pytest.fixture(scope="module")
def dom_docs(spark):
    return spark.createDataFrame(DOM_DOCS, "doc_id int, text string")


def test_url_hosts_extraction(spark, dom_docs):
    rows = {
        r["doc_id"]: r["h"]
        for r in dom_docs.select(
            "doc_id", P.url_hosts(F.col("text")).alias("h")
        ).collect()
    }
    assert rows[1] == ["ads.example.org"]  # case-folded, deduped
    assert rows[2] == ["blog.example.net", "ads.example.org"]  # port stripped
    assert rows[3] == [] and rows[4] == []
    # userinfo decoys resolve to the real host
    evil = spark.createDataFrame(
        [(9, "go http://tracker@blocked.com/p and https://u:p@x.io/q")],
        "doc_id int, text string",
    )
    got = evil.select(P.url_hosts(F.col("text")).alias("h")).collect()[0]["h"]
    assert got == ["blocked.com", "x.io"]


def test_domain_counts(spark, dom_docs):
    got = {r["domain"]: r for r in P.domain_counts(dom_docs).collect()}
    assert got["ads.example.org"]["n_docs"] == 2
    assert got["ads.example.org"]["n_mentions"] == 3  # doc 1 cites it twice
    assert got["blog.example.net"]["n_docs"] == 1


def test_blocklist_violations_broadcast(spark, dom_docs):
    bl = spark.createDataFrame([("ADS.example.org",)], "domain string")
    v = P.blocklist_violations(dom_docs, bl)
    rows = v.collect()
    assert {r["doc_id"] for r in rows} == {1, 2}
    assert all(r["actual"] == "ads.example.org" and r["kind"] == "blocklist" for r in rows)
    plan = v._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


# ------------------------------------------------- URL canonicalization


def test_canonical_url_cases(spark):
    from mdvalidate_spark.operators.pii import canonical_url

    cases = [
        ("HTTP://WWW.Example.COM:80/Path/To?a=1&utm_source=x&b=2#frag",
         "http://example.com/Path/To?a=1&b=2"),
        ("https://example.com:443/", "https://example.com"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        ("http://user:pw@example.com/x?utm_campaign=z", "http://example.com/x"),
        ("http://example.com/path/?fbclid=abc", "http://example.com/path"),
        ("http://example.com/?utm_a=1&utm_b=2", "http://example.com"),
        ("ftp://example.com/x", None),      # non-http(s) -> NULL, not partial
        ("not a url", None),
        (None, None),
        ("http://sub.www.example.com/x?ref_src=tw&q=1",
         "http://sub.www.example.com/x?q=1"),  # www stripped at prefix only
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [r[0] for r in df.select(canonical_url(F.col("url"))).collect()]
    for (u, want), g in zip(cases, got):
        assert g == want, (u, g, want)


def test_url_duplicates_groups(spark):
    from mdvalidate_spark.operators.pii import url_duplicates

    rows = [
        (1, "http://www.a.com/p?utm_source=x"),
        (2, "HTTP://A.com:80/p"),
        (3, "http://a.com/p"),          # 1,2,3 -> same canonical, 3 raws
        (4, "http://b.com/q"),
        (5, "http://b.com/q"),          # 4,5 -> same canonical, 1 raw
        (6, "http://c.com/solo"),       # singleton -> excluded
        (7, "garbage"),                 # NULL canonical -> excluded
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = {r["canonical"]: r for r in url_duplicates(df).collect()}
    assert set(out) == {"http://a.com/p", "http://b.com/q"}
    a = out["http://a.com/p"]
    assert a["n_rows"] == 3 and a["n_raw_variants"] == 3
    assert a["representative"] == 1
    b = out["http://b.com/q"]
    assert b["n_rows"] == 2 and b["n_raw_variants"] == 1
    plan = url_duplicates(df)._jdf.queryExecution().executedPlan().toString()
    assert "PythonUDF" not in plan and "collect_set" not in plan
