"""Property-based checks for the text-quality signal families.

The repetition metrics are a linear run-length walk over sorted arrays (an
optimization that has to agree with the obvious O(n²) counting definition),
and the PII counts assume Java-regex ≡ Python-re ≡ RE2 for the ASCII-only
patterns. Both equivalences are pinned here as properties over generated
text: each hypothesis example is a BATCH of strings evaluated in one Spark
job (per-example jobs would make 300 examples unusable)."""

import re

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mdvalidate_spark.operators import pii as P
from mdvalidate_spark.operators import text as T

# words drawn from a small vocabulary so repeats/ngram collisions actually
# happen; separators include the whitespace the operators must normalize
_word = st.sampled_from(["a", "bb", "ccc", "the", "cat", "x1", "Yy", "zz."])
_sep = st.sampled_from([" ", "  ", "\t", "\n", "\r\n", " \n "])


@st.composite
def _doc(draw):
    n = draw(st.integers(0, 12))
    parts = []
    for _ in range(n):
        parts.append(draw(_word))
        parts.append(draw(_sep))
    return "".join(parts)


def _ref_repetition(text):
    """Brute-force Python re-derivation of repetition_metrics."""
    t = text or ""
    norm = re.sub(r"[ \t\r\n]+", " ", t.lower()).strip()
    ws = [w for w in norm.split(" ") if w]
    lines = [ln for ln in re.split(r"\r?\n", t) if ln]

    def frac(num, den):
        return num / den if den > 0 else 0.0

    def grams(k):
        return [" ".join(ws[i : i + k]) for i in range(len(ws) - k + 1)]

    def top_chars(gs):
        # most-frequent gram's coverage, ties broken by the longest gram
        if not gs:
            return 0
        mc = max(gs.count(g) for g in set(gs))
        return mc * max(len(g) for g in set(gs) if gs.count(g) == mc)

    dup_line_chars = sum(
        (lines.count(ln) - 1) * len(ln) for ln in set(lines)
    )
    return {
        "n_words": len(ws),
        "n_lines": len(lines),
        "dup_word_frac": frac(len(ws) - len(set(ws)), len(ws)),
        "top_word_frac": frac(max((ws.count(w) for w in set(ws)), default=0), len(ws)),
        "top_2gram_char_frac": frac(top_chars(grams(2)), len(norm)),
        "top_3gram_char_frac": frac(top_chars(grams(3)), len(norm)),
        "dup_line_frac": frac(len(lines) - len(set(lines)), len(lines)),
        "dup_line_char_frac": frac(dup_line_chars, sum(len(ln) for ln in lines)),
    }


@settings(max_examples=15, deadline=None)
@given(docs=st.lists(_doc(), min_size=1, max_size=12))
def test_repetition_matches_bruteforce(spark, docs):
    df = spark.createDataFrame(
        [(i, d) for i, d in enumerate(docs)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in T.repetition_profile(df).collect()}
    for i, d in enumerate(docs):
        want = _ref_repetition(d)
        for k, v in want.items():
            assert got[i][k] == pytest.approx(v, abs=1e-6), (k, repr(d))


# PII fuzz alphabet: the characters the patterns are built from, plus noise
_pii_text = st.text(
    alphabet="abcXY019@.+-()/:, \t\nhtps#%_", min_size=0, max_size=60
)


@settings(max_examples=15, deadline=None)
@given(texts=st.lists(_pii_text, min_size=1, max_size=16))
def test_pii_counts_match_python_re(spark, texts):
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id int, text string"
    )
    got = {r["doc_id"]: r for r in P.pii_profile(df).collect()}
    for i, t in enumerate(texts):
        masked = re.sub(P.URL_RE, " ", t)  # non-URL kinds count URL-masked
        for name, pat, _ in P.PII_PATTERNS:
            base = t if name == "url" else masked
            want = sum(1 for _ in re.finditer(pat, base))
            assert got[i][f"n_{name}"] == want, (name, repr(t))
