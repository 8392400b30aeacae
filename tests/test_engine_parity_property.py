"""Property-based Spark-vs-DuckDB parity over generated documents tables.

The driver's correctness gate runs both engines over FIXED testdata; the
short-doc suite (tests/test_short_doc_parity.py) covers the sub-K-word
corner. This module closes the remaining gap: hypothesis-generated corpora
whose TEXT content is adversarial — mixed-script unicode (accents,
precomposed AND decomposed forms, CJK), digits, punctuation runs, long and
single-word documents — driven through the text-analysis oracle pairs most
exposed to engine-semantic divergence (regex dialects, length() units,
NFC normalization, the numpy winnowing kernel's utf-32 path).

Each example materializes a parquet documents table, runs the Spark query
and its DuckDB twin, and requires row-identical results (floats to 1e-9).
Example count is small (Spark jobs are slow) but every example covers many
documents, and failures shrink to a minimal corpus.
"""

import math

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pdf_extraction_spark.operators import textops

# mixed-script alphabet: ascii, digits, punctuation the quality regex
# counts, accents in composed AND decomposed form, CJK, an astral emoji
# (code-point-count semantics must agree across Python/Spark/DuckDB)
_CHARS = (
    "abcdez019.,!?;:'-"
    "éüñ"          # é ü ñ precomposed
    "é"                     # e + combining acute (decomposed)
    "東京안녕"    # 東京안녕
    "\U0001f600"                  # astral emoji
)

_word = st.text(alphabet=_CHARS, min_size=1, max_size=8).filter(
    lambda w: " " not in w
)
_text = st.lists(_word, min_size=1, max_size=30).map(" ".join)
_corpus = st.lists(_text, min_size=3, max_size=12)

PAIRS = [
    (textops.q_quality_score, textops.SQL_QUALITY_SCORE),
    (textops.q_token_count, textops.SQL_TOKEN_COUNT),
    (textops.q_normalize_text, textops.SQL_NORMALIZE_TEXT),
    (textops.q_pii_scrub, textops.SQL_PII_SCRUB),
    (textops.q_fingerprint_winnow, textops.SQL_FINGERPRINT_WINNOW),
]


def _norm(row):
    out = []
    for v in row:
        if isinstance(v, float):
            out.append(round(v, 9) if not math.isnan(v) else "NaN")
        else:
            out.append(v)
    return tuple(out)


@pytest.mark.parametrize("fn,sql", PAIRS, ids=[p[0].__name__ for p in PAIRS])
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_generated_corpus_parity(spark, tmp_path_factory, fn, sql, texts):
    # guarantee one document past every operator's minimum (winnowing emits
    # zero rows for sub-k-gram docs — correctly, on BOTH engines; the
    # non-empty guard below needs at least one fingerprintable doc)
    texts = list(texts) + ["the quick brown fox 東京 jumps über 01234 lazy dogs"]
    sf = tmp_path_factory.mktemp("gencorpus") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }),
        sf / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff={set(srows) ^ set(orows)}"
    )
    assert srows


# Second group: ordering- and float-sensitive pairs. Ties (top_terms
# saliency), libm logs (ccnet), interpolated percentiles
# (host_length_quantiles), bit votes (simhash) are exactly where two
# engines drift on inputs the fixed testdata never explores.
from pdf_extraction_spark.operators import corpusops, dedup  # noqa: E402

PAIRS2 = [
    (textops.q_top_terms, textops.SQL_TOP_TERMS),
    (corpusops.q_repetition_score, corpusops.SQL_REPETITION_SCORE),
    (corpusops.q_span_dup_fraction, corpusops.SQL_SPAN_DUP_FRACTION),
    (corpusops.q_ccnet_perplexity, corpusops.SQL_CCNET_PERPLEXITY),
    (corpusops.q_host_length_quantiles, corpusops.SQL_HOST_LENGTH_QUANTILES),
    (corpusops.q_url_dedup, corpusops.SQL_URL_DEDUP),
    (dedup.q_dedup_exact, dedup.SQL_DEDUP_EXACT),
    (dedup.q_dedup_simhash, dedup.SQL_DEDUP_SIMHASH),
]


@pytest.mark.parametrize("fn,sql", PAIRS2, ids=[p[0].__name__ for p in PAIRS2])
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_generated_corpus_parity_ranked(spark, tmp_path_factory, fn, sql, texts):
    texts = list(texts) + ["the quick brown fox 東京 jumps über 01234 lazy dogs"]
    sf = tmp_path_factory.mktemp("gencorpus2") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en" if i % 2 else "de" for i in range(len(texts))],
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }),
        sf / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff={set(srows) ^ set(orows)}"
    )
    assert srows


# Third group: embeddings-table pairs. Float accumulation ORDER is the
# classic cross-engine divergence; these queries claim order-independent
# (dimension-sequential) arithmetic, which random vectors stress far
# harder than the smooth fixture embeddings.
import numpy as np  # noqa: E402

from pdf_extraction_spark.operators import similarity  # noqa: E402

_component = st.integers(min_value=-1000, max_value=1000).map(lambda i: i / 512.0)
_vectors = st.lists(
    st.lists(_component, min_size=8, max_size=8),
    min_size=20, max_size=40,
)

PAIRS3 = [
    (similarity.q_ann_topk_cosine, similarity.SQL_ANN_TOPK_COSINE),
    (similarity.q_embedding_cosine_pairs, similarity.SQL_EMBEDDING_COSINE_PAIRS),
    (similarity.q_ann_lsh_bucketed, similarity.SQL_ANN_LSH_BUCKETED),
    (similarity.q_ann_ivf, similarity.SQL_ANN_IVF),
]


@pytest.mark.parametrize("fn,sql", PAIRS3, ids=[p[0].__name__ for p in PAIRS3])
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(vecs=_vectors)
def test_generated_embeddings_parity(spark, tmp_path_factory, fn, sql, vecs):
    # a zero vector would make cosine undefined; nudge any all-zero row
    arr = [v if any(v) else v[:-1] + [1 / 512.0] for v in vecs]
    sf = tmp_path_factory.mktemp("genembed") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "vec_id": list(range(len(arr))),
            "embedding": pa.array(
                [np.asarray(v, dtype=np.float32).tolist() for v in arr],
                pa.list_(pa.float32()),
            ),
            "label": [i % 4 for i in range(len(arr))],
        }),
        sf / "embeddings.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{sf}/embeddings.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff={set(srows) ^ set(orows)}"
    )


# Fourth group: events-table relational pairs. Tie-breaks (duplicate
# (user, t) pairs resolved by event_id), the sessionization gap's exact
# boundary, epoch flooring of microsecond timestamps, and NULL-feature
# normalization are the semantics a fixed fixture barely brushes.
import datetime as _dt  # noqa: E402

from pdf_extraction_spark.operators import relational  # noqa: E402

_EPOCH0 = _dt.datetime(2024, 1, 1)
_event = st.tuples(
    st.integers(min_value=1, max_value=5),                    # user_id
    st.integers(min_value=0, max_value=3000),                 # whole seconds
    st.sampled_from([0, 1, 123456, 999999]),                  # microseconds
    st.sampled_from(["view", "purchase", "click", "signup", "error"]),
    st.integers(min_value=0, max_value=40000).map(lambda c: c / 100.0),
)
_events = st.lists(_event, min_size=10, max_size=60)

PAIRS4 = [
    (relational.q_sessionize_events, relational.SQL_SESSIONIZE_EVENTS),
    (relational.q_band_join, relational.SQL_BAND_JOIN),
    (relational.q_asof_nearest_prior, relational.SQL_ASOF_NEAREST_PRIOR),
    (relational.q_interval_overlap_dedup, relational.SQL_INTERVAL_OVERLAP_DEDUP),
    (relational.q_evidence_classifier, relational.SQL_EVIDENCE_CLASSIFIER),
]


@pytest.mark.parametrize("fn,sql", PAIRS4, ids=[p[0].__name__ for p in PAIRS4])
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(evs=_events)
def test_generated_events_parity(spark, tmp_path_factory, fn, sql, evs):
    sf = tmp_path_factory.mktemp("genevents") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "event_id": list(range(len(evs))),
            "ts": pa.array(
                [_EPOCH0 + _dt.timedelta(seconds=s, microseconds=us)
                 for _u, s, us, _k, _v in evs],
                pa.timestamp("us"),
            ),
            "user_id": [u for u, *_ in evs],
            "event_type": [k for _u, _s, _us, k, _v in evs],
            "value": [v for *_x, v in evs],
            "props": ['{"k": 1}'] * len(evs),
        }),
        sf / "events.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{sf}/events.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff={set(srows) ^ set(orows)}"
    )


# Fifth group: generated orders/lineitem (FK-consistent). Interpolated
# group medians on even/tied samples, the top-10 LIMIT boundary under
# price ties, ROLLUP levels, double-sum rounding at 2dp, and the
# shipdate boundary predicate.
_li_row = st.tuples(
    st.integers(min_value=1, max_value=8),                    # l_orderkey
    st.integers(min_value=1, max_value=50),                   # l_quantity
    st.sampled_from(["A", "N", "R"]),                         # l_returnflag
    st.sampled_from(["F", "O"]),                              # l_linestatus
    st.integers(min_value=100, max_value=500000).map(lambda c: c / 100.0),
    st.integers(min_value=0, max_value=10).map(lambda c: c / 100.0),
    st.integers(min_value=-40, max_value=40),                 # days around boundary
)
_lineitem = st.lists(_li_row, min_size=15, max_size=60)
_ord_row = st.tuples(
    st.sampled_from(["O", "F", "P"]),
    # coarse prices force ties at the top-10 boundary
    st.integers(min_value=1, max_value=6).map(lambda c: c * 50000.0),
)
_orders = st.lists(_ord_row, min_size=8, max_size=15)

PAIRS5 = [
    (relational.q_pricing_summary, relational.SQL_PRICING_SUMMARY),
    (relational.q_group_median, relational.SQL_GROUP_MEDIAN),
    (relational.q_theta_selfjoin, relational.SQL_THETA_SELFJOIN),
    (relational.q_semi_join_validation, relational.SQL_SEMI_JOIN_VALIDATION),
    (relational.q_top_orders, relational.SQL_TOP_ORDERS),
    (relational.q_rollup_counts, relational.SQL_ROLLUP_COUNTS),
]

_SHIP0 = _dt.datetime(1998, 9, 2)


@pytest.mark.parametrize("fn,sql", PAIRS5, ids=[p[0].__name__ for p in PAIRS5])
@settings(
    max_examples=3,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(lis=_lineitem, ords=_orders)
def test_generated_tpch_parity(spark, tmp_path_factory, fn, sql, lis, ords):
    sf = tmp_path_factory.mktemp("gentpch") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "l_orderkey": [r[0] for r in lis],
            # unique within the order stream — i keeps pairs i<j total
            "l_linenumber": list(range(1, len(lis) + 1)),
            "l_quantity": [float(r[1]) for r in lis],
            "l_returnflag": [r[2] for r in lis],
            "l_linestatus": [r[3] for r in lis],
            "l_extendedprice": [r[4] for r in lis],
            "l_discount": [r[5] for r in lis],
            "l_shipdate": pa.array(
                [_SHIP0 + _dt.timedelta(days=r[6]) for r in lis], pa.timestamp("us")
            ),
        }),
        sf / "lineitem.parquet",
    )
    pq.write_table(
        pa.table({
            "o_orderkey": list(range(1, len(ords) + 1)),
            "o_orderstatus": [s for s, _p in ords],
            "o_totalprice": [p for _s, p in ords],
        }),
        sf / "orders.parquet",
    )
    con = duckdb.connect()
    for t in ("lineitem", "orders"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff={set(srows) ^ set(orows)}"
    )


# Sixth group: the dedup family, corpus curation, and retrieval — toward
# full-registry coverage. The corpus gets explicit duplicate structure
# (verbatim and one-word-mutated copies) so MinHash/Jaccard/components
# exercise real collision paths, not just the no-pair fast path.
PAIRS6 = [
    (dedup.q_dedup_minhash_lsh, dedup.SQL_DEDUP_MINHASH_LSH),
    (dedup.q_dedup_ngram_jaccard, dedup.SQL_DEDUP_NGRAM_JACCARD),
    (dedup.q_dedup_components, dedup.SQL_DEDUP_COMPONENTS),
    (dedup.q_dedup_keep_best, dedup.SQL_DEDUP_KEEP_BEST),
    (corpusops.q_paragraph_dedup, corpusops.SQL_PARAGRAPH_DEDUP),
    (corpusops.q_decontaminate, corpusops.SQL_DECONTAMINATE),
    (corpusops.q_domain_cap, corpusops.SQL_DOMAIN_CAP),
    (corpusops.q_stratified_sample, corpusops.SQL_STRATIFIED_SAMPLE),
    (corpusops.q_indexable_filter, corpusops.SQL_INDEXABLE_FILTER),
    (corpusops.q_filter_funnel, corpusops.SQL_FILTER_FUNNEL),
    (corpusops.q_host_quality, corpusops.SQL_HOST_QUALITY),
    (corpusops.q_dup_span_extract, corpusops.SQL_DUP_SPAN_EXTRACT),
    (textops.q_lang_id_stopwords, textops.SQL_LANG_ID_STOPWORDS),
    (textops.q_regex_counts, textops.SQL_REGEX_COUNTS),
    (textops.q_chunk_split, textops.SQL_CHUNK_SPLIT),
    (textops.q_chunk_split_recursive, textops.SQL_CHUNK_SPLIT_RECURSIVE),
    (textops.q_rag_retrieval, textops.SQL_RAG_RETRIEVAL),
    (textops.q_bm25_retrieval, textops.SQL_BM25_RETRIEVAL),
]


@pytest.mark.parametrize("fn,sql", PAIRS6, ids=[p[0].__name__ for p in PAIRS6])
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_generated_corpus_parity_dedup_retrieval(
    spark, tmp_path_factory, fn, sql, texts
):
    base = list(texts) + [
        "the quick brown fox 東京 jumps über 01234 lazy dogs and keeps running"
    ]
    # duplicate structure: one verbatim clone + one single-word mutant of
    # the guaranteed-long document
    long = base[-1]
    texts = base + [long, long.replace("fox", "wolf", 1)]
    sf = tmp_path_factory.mktemp("gencorpus6") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en" if i % 2 else "ja" for i in range(len(texts))],
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }),
        sf / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff={set(srows) ^ set(orows)}"
    )


# Seventh group: link-graph and export-layout pairs — these synthesize
# HTML corpora / URL sets from the documents table, so random text flows
# through anchor extraction, URL resolution, PageRank's integer
# arithmetic, SURT keying, and md5 sharding.
from pdf_extraction_spark.operators import links  # noqa: E402

PAIRS7 = [
    (links.q_extract_outlinks, links.SQL_EXTRACT_OUTLINKS),
    (links.q_link_host_degree, links.SQL_LINK_HOST_DEGREE),
    (links.q_host_pagerank, links.SQL_HOST_PAGERANK),
    (links.q_cdx_index, links.SQL_CDX_INDEX),
    (corpusops.q_shard_balance, corpusops.SQL_SHARD_BALANCE),
]


@pytest.mark.parametrize("fn,sql", PAIRS7, ids=[p[0].__name__ for p in PAIRS7])
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus)
def test_generated_corpus_parity_links(spark, tmp_path_factory, fn, sql, texts):
    texts = list(texts) + ["the quick brown fox 東京 jumps über 01234 lazy dogs"]
    sf = tmp_path_factory.mktemp("gencorpus7") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }),
        sf / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff={set(srows) ^ set(orows)}"
    )


# Eighth group: the extraction suite itself on generated text — random
# unicode flows through the article template, the full HTML boilerplate
# stripper, the deterministic PDF WRITER and the from-scratch PDF PARSER
# (font-variant lanes rotate by doc_id), the span tiler, and the WET
# sink/source cycle; every byte must come back equal to documents.text.
from pdf_extraction_spark.operators import extraction  # noqa: E402

PAIRS8 = [
    (extraction.q_extraction_suite, extraction.SQL_EXTRACTION_SUITE),
]

# The byte-identity invariant is defined over documents that pass the
# extractor's content gates — hypothesis immediately found the boundary:
# a lone paragraph under MIN_CONTENT_CHARS (10, the boilerplate gate
# kernels/html_extract.py:560) is chrome-ambiguous BY DESIGN and falls to
# the all-chrome fallback ('0' and '0 1 2 3 4' both shrink there).
# Generate documents shaped like the north rule's domain: >=5 words, each
# with an alnum, >=12 chars total.
_word8 = _word.filter(lambda w: any(c.isalnum() for c in w))
_text8 = (
    st.lists(_word8, min_size=5, max_size=30)
    .map(" ".join)
    .filter(lambda t: len(t) >= 12)
)
_corpus8 = st.lists(_text8, min_size=3, max_size=10)


@pytest.mark.parametrize("fn,sql", PAIRS8, ids=["extraction_suite"])
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus8)
def test_generated_corpus_extraction_suite(spark, tmp_path_factory, fn, sql, texts):
    texts = list(texts) + ["the quick brown fox 東京 jumps über 01234 lazy dogs"]
    sf = tmp_path_factory.mktemp("gencorpus8") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }),
        sf / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"extraction_suite: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff sample={list(set(srows) ^ set(orows))[:6]}"
    )


# Ninth group: the docmeta and crawl suites end-to-end on generated text.
# Random words flow through the PDF writer's outline/attachment/form
# lanes, JSON-LD and OpenGraph head builders, container codecs, the
# charset lanes, sitemap/robots/feed XML builders AND their parsers, the
# frontier composition, and the new canonical/redirect parts — every
# value cell checked against the generated DuckDB twin.
from pdf_extraction_spark.operators import suites  # noqa: E402

PAIRS9 = [
    (suites.q_docmeta_suite, suites.SQL_DOCMETA_SUITE),
    (suites.q_crawl_suite, suites.SQL_CRAWL_SUITE),
]


@pytest.mark.parametrize("fn,sql", PAIRS9, ids=["docmeta_suite", "crawl_suite"])
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus8)
def test_generated_corpus_suites_parity(spark, tmp_path_factory, fn, sql, texts):
    texts = list(texts) + ["the quick brown fox 東京 jumps über 01234 lazy dogs"]
    sf = tmp_path_factory.mktemp("gencorpus9") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }),
        sf / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff sample={list(set(srows) ^ set(orows))[:6]}"
    )


# Tenth group: the element-layer queries — generated words drive the PDF
# writer's table/figure/caption layouts and the HTML table builder, then
# the from-scratch parsers reconstruct cells, reading order, spatial
# relations, hierarchy, and the confidence gate; invariant rows are
# value-checked against the generated twins.
from pdf_extraction_spark.operators import elements  # noqa: E402

PAIRS10 = [
    (elements.q_table_cells, elements.SQL_TABLE_CELLS),
    (elements.q_html_table_cells, elements.SQL_HTML_TABLE_CELLS),
    (elements.q_reading_order, elements.SQL_ELEMENTS_READING_ORDER),
    (elements.q_spatial_relations, elements.SQL_ELEMENTS_SPATIAL_RELATIONS),
    (elements.q_element_hierarchy, elements.SQL_ELEMENT_HIERARCHY),
    (elements.q_confidence_gate, elements.SQL_CONFIDENCE_GATE),
]


@pytest.mark.parametrize("fn,sql", PAIRS10, ids=[p[0].__name__ for p in PAIRS10])
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(texts=_corpus8)
def test_generated_corpus_elements_parity(spark, tmp_path_factory, fn, sql, texts):
    texts = list(texts) + ["the quick brown fox 東京 jumps über 01234 lazy dogs"]
    sf = tmp_path_factory.mktemp("gencorpus10") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 3}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }),
        sf / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{fn.__name__}: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff sample={list(set(srows) ^ set(orows))[:6]}"
    )


# Eleventh group: the full relational suite (13 parts) plus its dimension
# joins over a COMPLETE generated mini-TPC-H (region→nation→customer FK
# chain, part sizes for 1-D clustering, orders/lineitem, events) — every
# unpivoted cell of every part checked in one shot.
PAIRS11 = [
    (suites.q_relational_suite, suites.SQL_RELATIONAL_SUITE),
]


@pytest.mark.parametrize("fn,sql", PAIRS11, ids=["relational_suite"])
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)
@given(lis=_lineitem, ords=_orders, evs=_events, data=st.data())
def test_generated_tpch_relational_suite(
    spark, tmp_path_factory, fn, sql, lis, ords, evs, data
):
    n_cust = data.draw(st.integers(min_value=5, max_value=20))
    sizes = data.draw(
        st.lists(st.tuples(st.integers(min_value=1, max_value=4),
                           st.integers(min_value=1, max_value=30)),
                 min_size=5, max_size=25)
    )
    sf = tmp_path_factory.mktemp("gentpch11") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({"r_regionkey": [0, 1], "r_name": ["EAST", "WEST"]}),
        sf / "region.parquet",
    )
    pq.write_table(
        pa.table({
            "n_nationkey": list(range(4)),
            "n_name": [f"N{i}" for i in range(4)],
            "n_regionkey": [i % 2 for i in range(4)],
        }),
        sf / "nation.parquet",
    )
    pq.write_table(
        pa.table({
            "c_custkey": list(range(n_cust)),
            "c_name": [f"C{i}" for i in range(n_cust)],
            "c_nationkey": [i % 4 for i in range(n_cust)],
            "c_acctbal": [round(i * 137.91 % 5000, 2) for i in range(n_cust)],
            "c_mktsegment": ["BUILDING" if i % 2 else "AUTO" for i in range(n_cust)],
        }),
        sf / "customer.parquet",
    )
    pq.write_table(
        pa.table({
            "p_partkey": list(range(len(sizes))),
            "p_name": [f"P{i}" for i in range(len(sizes))],
            "p_brand": [f"Brand#{b}" for b, _s in sizes],
            "p_type": ["STANDARD"] * len(sizes),
            "p_size": [s for _b, s in sizes],
            "p_retailprice": [100.0 + i for i in range(len(sizes))],
        }),
        sf / "part.parquet",
    )
    pq.write_table(
        pa.table({
            "l_orderkey": [r[0] for r in lis],
            "l_linenumber": list(range(1, len(lis) + 1)),
            "l_quantity": [float(r[1]) for r in lis],
            "l_returnflag": [r[2] for r in lis],
            "l_linestatus": [r[3] for r in lis],
            "l_extendedprice": [r[4] for r in lis],
            "l_discount": [r[5] for r in lis],
            "l_shipdate": pa.array(
                [_SHIP0 + _dt.timedelta(days=r[6]) for r in lis], pa.timestamp("us")
            ),
        }),
        sf / "lineitem.parquet",
    )
    pq.write_table(
        pa.table({
            "o_orderkey": list(range(1, len(ords) + 1)),
            "o_orderstatus": [s for s, _p in ords],
            "o_totalprice": [p for _s, p in ords],
        }),
        sf / "orders.parquet",
    )
    pq.write_table(
        pa.table({
            "event_id": list(range(len(evs))),
            "ts": pa.array(
                [_EPOCH0 + _dt.timedelta(seconds=s, microseconds=us)
                 for _u, s, us, _k, _v in evs],
                pa.timestamp("us"),
            ),
            "user_id": [u for u, *_ in evs],
            "event_type": [k for _u, _s, _us, k, _v in evs],
            "value": [v for *_x, v in evs],
            "props": ['{"k": 1}'] * len(evs),
        }),
        sf / "events.parquet",
    )
    con = duckdb.connect()
    for t in ("region", "nation", "customer", "part", "lineitem", "orders", "events"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')"
        )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"relational_suite: {len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff sample={list(set(srows) ^ set(orows))[:8]}"
    )


# Deterministic large-corpus soak: one seeded 150-document random corpus
# through the three end-to-end suites. The per-example hypothesis corpora
# are small (<=13 docs); this catches the collision/edge mass that only
# shows up at scale (a 300-doc ad-hoc soak found the Atom-href quote
# truncation the small examples never hit). Seeded -> CI-stable.
import random as _random  # noqa: E402

from pdf_extraction_spark.operators import extraction as _extraction  # noqa: E402


@pytest.mark.parametrize(
    "fn,sql",
    [
        (_extraction.q_extraction_suite, _extraction.SQL_EXTRACTION_SUITE),
        (suites.q_docmeta_suite, suites.SQL_DOCMETA_SUITE),
        (suites.q_crawl_suite, suites.SQL_CRAWL_SUITE),
    ],
    ids=["extraction_suite", "docmeta_suite", "crawl_suite"],
)
def test_seeded_soak_suites(spark, tmp_path_factory, fn, sql):
    rng = _random.Random(20260821)

    def word():
        return "".join(rng.choice(_CHARS) for _ in range(rng.randint(1, 8)))

    def text():
        while True:
            t = " ".join(word() for _ in range(rng.randint(5, 40)))
            if len(t) >= 12 and any(c.isalnum() for c in t):
                return t

    texts = [text() for _ in range(150)]
    sf = tmp_path_factory.mktemp("soak") / "sf"
    sf.mkdir()
    pq.write_table(
        pa.table({
            "doc_id": list(range(len(texts))),
            "text": texts,
            "lang": ["en"] * len(texts),
            "source": [f"s{i % 5}" for i in range(len(texts))],
            "n_chars": [len(t) for t in texts],
        }),
        sf / "documents.parquet",
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{sf}/documents.parquet')"
    )
    srows = sorted(_norm(tuple(r)) for r in fn(spark, str(sf)).collect())
    orows = sorted(_norm(tuple(r)) for r in con.execute(sql).fetchall())
    assert srows == orows, (
        f"{len(srows)} spark vs {len(orows)} oracle rows; "
        f"diff sample={list(set(srows) ^ set(orows))[:6]}"
    )
    assert len(srows) > 1000
