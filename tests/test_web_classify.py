"""URL canonicalization / URL dedup (llm/web.py) and hashed-n-gram
classifier inference (llm/classify.py): exact-value goldens, survivor
policies, hashing-trick collision semantics, partitioning invariance,
and plan-quality assertions."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from gcpde_spark.catalog import load_table
from gcpde_spark.llm.classify import (
    classifier_weights,
    hashed_classifier_score,
)
from gcpde_spark.llm.web import canonical_url, dedup_by_url, with_canonical_url
from gcpde_spark.plans import audit
from tests.conftest import SF_SMALL


# -- canonical_url -------------------------------------------------------------

CANON_CASES = [
    # scheme/host folding, www strip, default port, dot segments,
    # tracker strip, query sort, fragment removal — the kitchen sink
    (
        "HTTP://WWW.Example.COM:80/a/./b/../c/?utm_source=x&b=2&a=1#frag",
        "http://example.com/a/c?a=1&b=2",
    ),
    # non-default port kept; https default port dropped
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("https://example.com:443/x", "https://example.com/x"),
    # empty path -> "/", duplicate slashes collapse
    ("https://example.com", "https://example.com/"),
    ("https://example.com/a//b///c", "https://example.com/a/b/c"),
    # userinfo dropped
    ("https://user:pw@example.com/p", "https://example.com/p"),
    # all-tracker query disappears entirely (no dangling "?");
    # tracker keys match case-insensitively
    ("https://example.com/?gclid=1&PHPSESSID=2", "https://example.com/"),
    ("https://example.com/?UTM_Source=1&k=v", "https://example.com/?k=v"),
    # duplicate keys both survive, sorted
    ("https://example.com/?b=2&a=2&a=1", "https://example.com/?a=1&a=2&b=2"),
    # leading ".." cannot climb above root
    ("https://example.com/../../x", "https://example.com/x"),
    # unparseable / relative / NULL -> NULL
    ("not a url", None),
    ("/relative/path", None),
    (None, None),
]


def test_canonical_url_golden_cases(spark):
    df = spark.createDataFrame(
        [(i, u) for i, (u, _) in enumerate(CANON_CASES)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, (u, expected) in enumerate(CANON_CASES):
        assert got[i] == expected, f"case {i}: {u!r} -> {got[i]!r} != {expected!r}"


def test_canonical_url_keep_www(spark):
    df = spark.createDataFrame([(1, "https://www.example.com/a")], "i int, url string")
    got = df.select(canonical_url("url", strip_www=False).alias("c")).first()["c"]
    assert got == "https://www.example.com/a"


def test_with_canonical_url_is_shuffle_free(spark):
    df = spark.createDataFrame([(1, "https://example.com/a")], "doc_id int, url string")
    r = audit(with_canonical_url(df))
    assert r.shuffles == 0
    assert not r.python_row_udfs


# -- dedup_by_url --------------------------------------------------------------


@pytest.fixture()
def url_docs(spark):
    rows = [
        (1, "https://example.com/a?utm_source=x", "full text of page a"),
        (2, "https://WWW.example.com:443/a", "page a"),  # alias of 1
        (3, "https://example.com/b", "page b"),
        (4, None, "no url"),
        (5, None, "also no url"),
        (6, "not a url", "junk url"),
    ]
    return spark.createDataFrame(rows, "doc_id int, url string, text string")


def test_dedup_by_url_min_id(url_docs):
    kept = sorted(r["doc_id"] for r in dedup_by_url(url_docs).collect())
    # 1 beats its alias 2; NULL/junk URLs (4, 5, 6) all survive
    assert kept == [1, 3, 4, 5, 6]


def test_dedup_by_url_longest(url_docs):
    kept = sorted(r["doc_id"] for r in dedup_by_url(url_docs, keep="longest").collect())
    assert kept == [1, 3, 4, 5, 6]  # doc 1's text is longer than doc 2's


def test_dedup_by_url_rejects_unknown_policy(url_docs):
    with pytest.raises(ValueError, match="keep must be one of"):
        dedup_by_url(url_docs, keep="newest")


def test_dedup_by_url_single_shuffle(url_docs):
    r = audit(dedup_by_url(url_docs))
    assert r.shuffles == 1
    assert not r.python_row_udfs


# -- hashed classifier ---------------------------------------------------------

W = {"good": 2.0, "bad": -3.0, "very good": 1.0}


def _sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


@pytest.fixture(scope="module")
def weights(spark):
    return classifier_weights(spark, W).cache()


def test_classifier_exact_scores(spark, weights):
    df = spark.createDataFrame(
        [
            (1, "Good good BAD"),  # terms: good,good,bad + 2 bigrams -> N=5
            (2, "very good"),  # very,good + "very good" -> N=3
            (3, ""),  # no terms -> sigmoid(bias)
            (4, "zzz"),  # 1 term, no hits
        ],
        "doc_id int, text string",
    )
    got = {
        r["doc_id"]: r["clf_score"]
        for r in hashed_classifier_score(df, weights).collect()
    }
    assert got[1] == round(_sigmoid((2.0 + 2.0 - 3.0) / 5), 4)
    assert got[2] == round(_sigmoid((2.0 + 1.0) / 3), 4)
    assert got[3] == round(_sigmoid(0.0), 4)
    assert got[4] == round(_sigmoid(0.0), 4)


def test_classifier_normalize_none_and_bias(spark, weights):
    df = spark.createDataFrame([(2, "very good")], "doc_id int, text string")
    got = hashed_classifier_score(df, weights, normalize="none", bias=-1.0).first()
    assert got["clf_score"] == round(_sigmoid(3.0 - 1.0), 4)


def test_classifier_collisions_sum(spark):
    # n_buckets=1: every term lands in bucket 0, whose weight is the
    # SUM of all model weights — the hashing-trick contract
    w1 = classifier_weights(spark, {"a": 1.0, "b": 2.0}, n_buckets=1)
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    got = hashed_classifier_score(df, w1, n_buckets=1).first()
    assert got["clf_score"] == round(_sigmoid(3.0), 4)


def test_classifier_unigrams_only(spark, weights):
    df = spark.createDataFrame([(1, "very good")], "doc_id int, text string")
    got = hashed_classifier_score(df, weights, ngram_sizes=(1,)).first()
    assert got["clf_score"] == round(_sigmoid(2.0 / 2), 4)  # bigram feature off


def test_classifier_validates_args(spark, weights):
    df = spark.createDataFrame([(1, "x")], "doc_id int, text string")
    with pytest.raises(ValueError, match="normalize"):
        hashed_classifier_score(df, weights, normalize="l2")
    with pytest.raises(ValueError, match="ngram_sizes"):
        hashed_classifier_score(df, weights, ngram_sizes=())
    with pytest.raises(ValueError, match="non-empty"):
        classifier_weights(df.sparkSession, {})


def test_classifier_partitioning_invariant(spark, weights):
    docs = load_table(spark, SF_SMALL, "documents").limit(60)
    a = {
        r["doc_id"]: r["clf_score"]
        for r in hashed_classifier_score(docs, weights).collect()
    }
    b = {
        r["doc_id"]: r["clf_score"]
        for r in hashed_classifier_score(docs.repartition(7), weights).collect()
    }
    assert a == b
    assert len(a) == 60


def test_classifier_plan_quality(spark, weights):
    docs = load_table(spark, SF_SMALL, "documents")
    r = audit(hashed_classifier_score(docs, weights))
    assert not r.python_row_udfs
    assert r.broadcasts >= 1  # the weight table never shuffles data-side
    assert not r.unkeyed_joins


# -- canonical_url differential property ----------------------------------------

import re as _re

from hypothesis import given, settings
from hypothesis import strategies as st

from gcpde_spark.llm.web import _TRACKER_RE

_TRACKER_MODEL = _re.compile(_TRACKER_RE.removeprefix("(?i)"), _re.IGNORECASE)
_LABEL = st.from_regex(r"[a-z][a-z0-9]{0,7}", fullmatch=True)
_SEG = st.one_of(
    st.just("."), st.just(".."), st.from_regex(r"[A-Za-z0-9_\-.]{1,8}", fullmatch=True)
)
_KEY = st.one_of(
    st.from_regex(r"[A-Za-z0-9]{1,6}", fullmatch=True),
    st.sampled_from(["utm_source", "UTM_Medium", "gclid", "REF", "b", "a"]),
)


@st.composite
def _url_parts(draw):
    scheme = draw(st.sampled_from(["http", "https", "HTTP", "Https", "ftp"]))
    host = ".".join(draw(st.lists(_LABEL, min_size=2, max_size=4)))
    if draw(st.booleans()):
        host = "www." + host
    port = draw(st.one_of(st.none(), st.sampled_from([80, 443, 8080, 8443])))
    segs = draw(st.lists(_SEG, min_size=0, max_size=6))
    pairs = draw(
        st.lists(
            st.tuples(_KEY, st.from_regex(r"[A-Za-z0-9]{0,5}", fullmatch=True)),
            min_size=0,
            max_size=5,
        )
    )
    frag = draw(st.one_of(st.none(), st.just("sec1")))
    return scheme, host, port, segs, pairs, frag


def _assemble(parts) -> str:
    scheme, host, port, segs, pairs, frag = parts
    url = f"{scheme}://{host}"
    if port is not None:
        url += f":{port}"
    url += "/" + "/".join(segs)
    if pairs:
        url += "?" + "&".join(f"{k}={v}" for k, v in pairs)
    if frag is not None:
        url += f"#{frag}"
    return url


def _model_canonical(parts) -> str:
    """Pure-Python model of canonical_url's documented semantics."""
    scheme, host, port, segs, pairs, _frag = parts
    scheme, host = scheme.lower(), host.lower()
    if host.startswith("www."):
        host = host[4:]
    default = {"http": 80, "https": 443}.get(scheme)
    portpart = "" if port is None or port == default else f":{port}"
    out: list[str] = []
    for s in segs:
        if s in ("", "."):
            continue
        if s == "..":
            if out:
                out.pop()
            continue
        out.append(s)
    path = "/" + "/".join(out)
    kept = sorted(
        f"{k}={v}" for k, v in pairs if not _TRACKER_MODEL.match(f"{k}={v}")
    )
    q = ("?" + "&".join(kept)) if kept else ""
    return f"{scheme}://{host}{portpart}{path}{q}"


@settings(max_examples=6, deadline=None)
@given(st.lists(_url_parts(), min_size=1, max_size=40))
def test_canonical_url_matches_python_model(spark, parts_list):
    df = spark.createDataFrame(
        [(i, _assemble(p)) for i, p in enumerate(parts_list)], "i int, url string"
    )
    got = {
        r["i"]: r["c"]
        for r in df.select("i", canonical_url("url").alias("c")).collect()
    }
    for i, p in enumerate(parts_list):
        expected = _model_canonical(p)
        assert got[i] == expected, f"{_assemble(p)!r}: {got[i]!r} != {expected!r}"


# -- pipeline classifier gate ----------------------------------------------------


def test_pipeline_classifier_gate(spark):
    from gcpde_spark.llm.pipeline import curate_documents

    good = "the quick brown fox jumps over the lazy dog and runs far away " * 3
    # enough English stopwords that the base language gate keeps it —
    # only the classifier should reject this one
    junk = "buy cheap pills now and the best of the offers to win money " * 3
    df = spark.createDataFrame(
        [(1, good), (2, junk), (3, good + " extra")],
        "doc_id int, text string",
    )
    w = classifier_weights(spark, {"buy cheap": -4.0, "pills": -4.0, "fox": 1.0})
    base = curate_documents(df, min_tokens=5, min_quality=0.0)
    gated = curate_documents(
        df,
        min_tokens=5,
        min_quality=0.0,
        classifier_weights=w,
        classifier_min_score=0.45,
    )
    assert gated.columns == base.columns  # gate is schema-invariant
    kept = sorted(r["doc_id"] for r in gated.collect())
    assert kept == [1, 3]  # the spam doc fails the model gate
    assert sorted(r["doc_id"] for r in base.collect()) == [1, 2, 3]
