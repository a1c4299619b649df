"""PII detection and redaction for training-data pipelines.

Before a web corpus can train anything, PII has to be found (for filtering
decisions) and scrubbed (for what's kept). These operators are the engine's
analog of its row matchers (reference walkers/validators/matchers.rs:38-431 —
the same "regex over a text column, emit verdicts" kernel) applied to the
standard pipeline patterns: email addresses, bare IPv4s, phone-shaped and
SSN/credit-card-shaped digit runs, and URLs.

Design, per the repo's two rules:

1. *Spark-first*: detection is `regexp_extract_all`/`regexp_count` column
   algebra and redaction is chained `regexp_replace` — JVM codegen, zero
   Python, ONE narrow scan. At 100 TB this runs at parquet-scan speed with
   no shuffle; there is no per-row Python and nothing to skew.
2. *Oracle-parity*: patterns use explicit ASCII classes only (no `\\d`,
   `\\w`, `\\b`) so Java regex (Spark) and RE2 (DuckDB) agree byte-for-byte.
   Word-ish boundaries are expressed structurally (what may precede/follow)
   rather than with `\\b`, whose semantics differ at string edges across
   engines.

The pattern set is deliberately high-precision/typed rather than exhaustive —
the point at corpus scale is a cheap, deterministic first pass whose verdicts
are reproducible; an ML-based NER pass would ride the same `mapInPandas`
plumbing as the multimodal kernels.
"""

from __future__ import annotations

from functools import lru_cache

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# --- patterns: ASCII classes only, structural boundaries, RE2-safe ---------
#: e.g. jane.doe+spam@sub.example.org — local part conservative ASCII
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9-]+(\\.[A-Za-z0-9-]+)+"
#: dotted-quad SHAPE: a two-dot version string ("1.2.3") has too few dots to
#: match, but a longer dotted run ("10.1.2.3.4") DOES match its first quad —
#: RE2 has no lookarounds, so structural run-boundary guards would change
#: match spans and break count parity; octet-range checking and run-boundary
#: judgment are the consumer's job. Shape, not validity.
IPV4_RE = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
#: +international (8-15 digits, optional separators) or US 3-3-4 with
#: required separators — bare 10-digit runs are left to CC/SSN shapes
PHONE_RE = (
    "\\+[0-9]{1,3}[ .-]?[0-9]{3}[ .-]?[0-9]{3}[ .-]?[0-9]{2,4}"
    "|\\(?[0-9]{3}\\)?[ .-][0-9]{3}[ .-][0-9]{4}"
)
#: US SSN shape: 3-2-4 with dashes (dashless is indistinguishable from ids)
SSN_RE = "[0-9]{3}-[0-9]{2}-[0-9]{4}"
#: 16-digit card shape in 4-4-4-4 groups, each gap optionally ' ' or '-'
#: (uniformity would need backreferences, which RE2 lacks — parity first)
CC_RE = "[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}[ -]?[0-9]{4}"
#: URLs: scheme to first whitespace/quote/closing-bracket/list-delimiter
#: (comma/semicolon are legal in URLs but far likelier to be prose — this is
#: a high-precision shape detector, not an RFC parser)
URL_RE = "https?://[^ \\t\\r\\n\"'<>,;)\\]]+"

#: (metric name, pattern, redaction token) — redaction applies IN ORDER:
#: URLs first (a URL may embed an email/digits), then email, then the digit
#: shapes from most to least specific so CC doesn't half-eat an SSN.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("url", URL_RE, "<URL>"),
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ssn", SSN_RE, "<SSN>"),
    ("cc", CC_RE, "<CC>"),
    ("phone", PHONE_RE, "<PHONE>"),
    ("ipv4", IPV4_RE, "<IP>"),
)

PII_KINDS: tuple[str, ...] = tuple(name for name, _, _ in PII_PATTERNS)


def pii_count(text: Column, pattern: str) -> Column:
    """Non-overlapping leftmost match count (identical strategy in Java
    regex and RE2, so Spark and DuckDB counts agree)."""
    return F.size(
        F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(pattern), F.lit(0))
    ).cast("long")


def mask_urls(text: Column) -> Column:
    """Text with every URL span replaced by a single space — the counting
    base for the non-URL detectors, so an email or IP that exists only
    INSIDE a URL is judged the way redact() treats it (a URL, not loose
    PII). A space, not '', so the text on either side never fuses into a
    new accidental match."""
    return F.regexp_replace(F.coalesce(text, F.lit("")), URL_RE, " ")


def pii_counts(text: Column) -> dict[str, Column]:
    """All typed counts for one text column: ``url`` on the raw text, the
    PII kinds on the URL-masked text (consistent with redact(), which masks
    URLs first). Shared by pii_profile, PiiRule, and the suggest ratchet."""
    masked = mask_urls(text)
    return {
        name: pii_count(text if name == "url" else masked, pat)
        for name, pat, _ in PII_PATTERNS
    }


@lru_cache(maxsize=64)
def pii_counts_for(col_name: str) -> dict[str, Column]:
    """``pii_counts`` over a NAMED column, memoized at module level: the
    six-pattern expression tree costs ~100 py4j round trips to build, and
    Column trees are immutable — one instance serves every plan (pure
    construction-latency fix, identical expressions)."""
    return pii_counts(F.col(col_name))


def pii_total_from_counts(counts: dict[str, Column]) -> Column:
    """The canonical non-URL total — the ONE definition shared by
    pii_profile, PiiRule's executor, and the suggest ratchet, so the
    URL-is-a-signal exclusion can never drift between them."""
    total = None
    for name in PII_KINDS:
        if name == "url":
            continue
        total = counts[name] if total is None else total + counts[name]
    return total


def pii_profile(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII counts, one scan: n_url, n_email, n_ssn, n_cc,
    n_phone, n_ipv4 plus pii_total (URLs excluded from the total — a URL is
    a signal, not PII per se, and PII shapes inside URLs count as URL)."""
    counts = pii_counts(F.col(text_col))
    return df.select(
        F.col(id_col),
        *[counts[name].alias(f"n_{name}") for name in PII_KINDS],
        pii_total_from_counts(counts).alias("pii_total"),
    )


def redact(text: Column) -> Column:
    """Replace every PII span with its typed token, in PII_PATTERNS order.
    Chained regexp_replace — still one codegen'd expression."""
    out = F.coalesce(text, F.lit(""))
    for _, pat, token in PII_PATTERNS:
        out = F.regexp_replace(out, pat, token)
    return out


def pii_violations(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_total: int = 0,
) -> DataFrame:
    """Engine-shape violation rows for documents whose pii_total exceeds
    ``max_total`` (default: any PII at all is a violation). Same single-scan
    plan as pii_profile; clean documents emit nothing."""
    prof = pii_profile(df, text_col, id_col)
    detail = F.concat_ws(
        ",",
        *[
            F.when(
                F.col(f"n_{name}") > 0,
                F.concat(F.lit(f"{name}="), F.col(f"n_{name}").cast("string")),
            )
            for name in PII_KINDS
            if name != "url"
        ],
    )
    return prof.where(F.col("pii_total") > max_total).select(
        F.col(id_col),
        F.lit("pii_max_total").alias("rule_id"),
        F.lit(text_col).alias("column"),
        F.lit(f"pii_total <= {max_total}").alias("expected"),
        F.concat(
            F.col("pii_total").cast("string"), F.lit(" ("), detail, F.lit(")")
        ).alias("actual"),
        F.lit("pii").alias("kind"),
    )


# ------------------------------------------------------ URL / domain hygiene
# Web-corpus content filtering by source domain: extract URL hosts, profile
# per-domain volumes, and gate documents that cite blocklisted domains. The
# extraction is the same codegen'd regexp algebra as the detectors above;
# the blocklist check is a BROADCAST inner join (blocklists are KBs-MBs, the
# corpus streams — the exact shape of the engine's referential-integrity
# stage, operators/ref_rules.py, with the verdict inverted: a HIT is the
# violation).


def url_hosts(text: Column, distinct: bool = True) -> Column:
    """Lowercased hosts of every URL in the text (port stripped), distinct
    per document by default. Pure array algebra: regexp_extract_all →
    per-element host extraction."""
    urls = F.regexp_extract_all(
        F.coalesce(text, F.lit("")), F.lit(URL_RE), F.lit(0)
    )
    # optional userinfo ([^/@?#]*@) is skipped so http://evil@blocked.com
    # resolves to blocked.com, not the decoy userinfo
    hosts = F.transform(
        urls,
        lambda u: F.lower(
            F.regexp_extract(u, "https?://(?:[^/@?#]*@)?([^/:?#]+)", 1)
        ),
    )
    return F.array_distinct(hosts) if distinct else hosts


def domain_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-domain corpus profile: how many documents cite each host and how
    many URL mentions it gets. One scan → explode to (doc, host) posting
    rows → one partial-aggregated groupBy; no per-domain arrays, so a
    megadomain (half the web links the same CDN) costs rows, not memory."""
    posts = df.select(
        F.col(id_col),
        F.explode(url_hosts(F.col(text_col), distinct=False)).alias("domain"),
    )
    return posts.groupBy("domain").agg(
        F.countDistinct(id_col).alias("n_docs"),
        F.count(F.lit(1)).alias("n_mentions"),
    )


def blocklist_violations(
    df: DataFrame,
    blocklist: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    domain_col: str = "domain",
    broadcast_blocklist: bool = True,
) -> DataFrame:
    """Engine-shape violation rows for documents citing a blocklisted
    domain: one row per (document, blocked domain cited). ``blocklist`` is
    a one-column frame of lowercase hosts, broadcast by default."""
    posts = df.select(
        F.col(id_col), F.explode(url_hosts(F.col(text_col))).alias("domain")
    )
    bl = blocklist.select(F.lower(F.col(domain_col)).alias("domain")).dropDuplicates()
    if broadcast_blocklist:
        bl = F.broadcast(bl)
    return posts.join(bl, "domain").select(
        F.col(id_col),
        F.lit("domain_blocklist").alias("rule_id"),
        F.lit(text_col).alias("column"),
        F.lit("no blocklisted domains").alias("expected"),
        F.col("domain").alias("actual"),
        F.lit("blocklist").alias("kind"),
    )


# ------------------------------------------------- URL canonicalization

#: query params that never change the resource: analytics/click-tracking ids.
#: One alternation fragment shared by engine and oracle (RE2- and Java-safe:
#: no lookaround, plain classes only).
TRACKING_PARAMS = "(?:utm_[a-z]+|fbclid|gclid|msclkid|mc_eid|igshid|ref_src)"

# component extractors — (?i) inline flag works in both Java regex and RE2
_SCHEME_RE = "^(?i)(https?)://"
_HOST_RE = "^(?i)https?://(?:[^/@?#]*@)?([^/:?#]+)"
_PORT_RE = "^(?i)https?://(?:[^/@?#]*@)?[^/:?#]+:([0-9]+)"
_REST_RE = "^(?i)https?://(?:[^/@?#]*@)?[^/?#]*(.*)$"


def canonical_url(url: Column) -> Column:
    """Canonical form of an http(s) URL — the dedup key of every web-corpus
    pipeline (the same page arrives via tracking links, mixed-case hosts,
    default ports, and fragments; URL-level dedup without canonicalization
    undercounts duplicates by whole crawl batches).

    Steps, all pure column algebra over shared RE2/Java-parity regexes (no
    lookaround, so the identical patterns replay in DuckDB): lowercase
    scheme + host, drop userinfo, drop a leading ``www.``, drop the scheme's
    default port (http:80 / https:443, other ports kept), drop the
    ``#fragment``, strip tracking query params (TRACKING_PARAMS), drop an
    emptied ``?``, and strip trailing slashes at the end of the result
    (a pre-query trailing slash is kept — RE2 has no lookahead; declared).
    Percent-encoding and path dot-segments are NOT normalized (that needs a
    real parser; documented limit). Non-http(s) / unparseable input → NULL,
    never a half-canonical value."""
    scheme = F.lower(F.regexp_extract(url, _SCHEME_RE, 1))
    host = F.regexp_replace(
        F.lower(F.regexp_extract(url, _HOST_RE, 1)), "^www\\.", ""
    )
    port = F.regexp_extract(url, _PORT_RE, 1)
    default_port = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    portpart = F.when(
        (port == "") | default_port, F.lit("")
    ).otherwise(F.concat(F.lit(":"), port))
    rest = F.regexp_extract(url, _REST_RE, 1)
    rest = F.regexp_replace(rest, "#.*$", "")  # fragment first
    # tracking params: mid-query '&p=v', leading '?p=v&', then a sole '?p=v'
    rest = F.regexp_replace(rest, "&" + TRACKING_PARAMS + "=[^&]*", "")
    rest = F.regexp_replace(rest, "\\?" + TRACKING_PARAMS + "=[^&]*&", "?")
    rest = F.regexp_replace(rest, "\\?" + TRACKING_PARAMS + "=[^&]*$", "")
    rest = F.regexp_replace(rest, "\\?$", "")
    out = F.concat(scheme, F.lit("://"), host, portpart, rest)
    out = F.regexp_replace(out, "/+$", "")
    return F.when((scheme != "") & (host != ""), out)


def url_duplicates(
    df: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
) -> DataFrame:
    """Canonical-URL duplicate groups: rows whose URLs canonicalize to the
    same resource. One groupBy on the canonical key (uniform hash — the
    canonical string), bounded fixed-width output per group (count,
    distinct raw variants, min/max raw examples, min id as representative)
    — a viral URL costs one row, never a member array. Rows whose URL does
    not canonicalize (NULL) are excluded: un-parseable URLs are a
    FormatRule/PiiRule concern, not a dedup key."""
    canon = canonical_url(F.col(url_col))
    return (
        df.select(F.col(id_col).alias("doc_id"), F.col(url_col).alias("__raw"),
                  canon.alias("canonical"))
        .where(F.col("canonical").isNotNull())
        .groupBy("canonical")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.count_distinct(F.col("__raw")).alias("n_raw_variants"),
            F.min("doc_id").alias("representative"),
            F.min("__raw").alias("example_lo"),
            F.max("__raw").alias("example_hi"),
        )
        .where(F.col("n_rows") > 1)
    )
