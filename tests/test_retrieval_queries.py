"""Unit tests for the retrieval-query building blocks on synthetic
docs (the registry oracle checks them against DuckDB on the test
corpus; these pin edge cases the corpus can't express — sub-chunk
docs, odd token counts, heavy intra-doc repetition, ties in top-k)."""

from __future__ import annotations

import pytest

from pyspark.sql import functions as F


def _chunk_dedup_model(text: str, width: int = 2):
    toks = text.split(" ")
    chunks = [
        " ".join(toks[i * width : (i + 1) * width])
        for i in range(len(toks) // width)
    ]
    seen, kept = set(), []
    for c in chunks:
        if c not in seen:
            seen.add(c)
            kept.append(c)
    return len(chunks), len(kept), " ".join(kept)


@pytest.mark.parametrize(
    "text",
    [
        "a b a b a b c d",  # heavy repetition
        "a b c",  # odd token count: trailing token dropped
        "x",  # sub-chunk doc: zero chunks
        "a b c d e f g h",  # no repetition
        "a a a a",  # chunk 'a a' repeated
    ],
)
def test_repetition_chunk_dedup_matches_model(spark, tmp_path, text):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    pq.write_table(
        pa.table(
            {
                "doc_id": [1],
                "text": [text],
                "lang": ["en"],
                "source": ["s"],
                "n_chars": [len(text)],
            }
        ),
        f"{sf}/documents.parquet",
    )
    from polars_readstat_spark.queries.retrieval import (
        repetition_chunk_dedup,
    )

    rows = repetition_chunk_dedup(spark, sf).collect()
    n_chunks, n_kept, cleaned = _chunk_dedup_model(text)
    if n_chunks == 0:
        # zero-chunk docs drop out of the explode entirely (the
        # oracle's UNNEST(RANGE(1,1)) does the same)
        assert rows == []
        return
    assert len(rows) == 1
    r = rows[0]
    assert (r.n_chunks, r.n_kept, r.cleaned) == (n_chunks, n_kept, cleaned)


def test_tfidf_topk_tie_breaks_on_term(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    # two docs; in doc 1 'b' and 'c' tie exactly (same tf, same df) —
    # the term-asc tie-break must order b before c deterministically
    pq.write_table(
        pa.table(
            {
                "doc_id": [1, 2],
                "text": ["b c b c a", "a a"],
                "lang": ["en", "en"],
                "source": ["s", "s"],
                "n_chars": [9, 3],
            }
        ),
        f"{sf}/documents.parquet",
    )
    from polars_readstat_spark.queries.retrieval import tfidf_topk_terms

    got = {
        (r.doc_id, r.rnk): (r.term, r.score)
        for r in tfidf_topk_terms(spark, sf).collect()
    }
    # doc 1: tf(b)=tf(c)=2, df(b)=df(c)=1, N=2 → score 4.0 each;
    # tf(a)=1, df(a)=2 → score 1.0
    assert got[(1, 1)] == ("b", 4.0)
    assert got[(1, 2)] == ("c", 4.0)
    assert got[(1, 3)] == ("a", 1.0)
    # doc 2 has a single distinct term → exactly one ranked row
    assert got[(2, 1)] == ("a", 2.0)
    assert (2, 2) not in got


def test_inverted_index_postings_caps_at_50(spark, tmp_path):
    import pyarrow as pa
    import pyarrow.parquet as pq

    sf = str(tmp_path)
    # 'rare' appears in 60 of 2000 docs (3% < 5% cap, df >= 3):
    # postings must be the FIRST 50 doc_ids ascending
    n = 2000
    texts = [
        ("rare filler" if i % 33 == 0 else "filler only") for i in range(n)
    ]
    pq.write_table(
        pa.table(
            {
                "doc_id": list(range(n)),
                "text": texts,
                "lang": ["en"] * n,
                "source": ["s"] * n,
                "n_chars": [len(t) for t in texts],
            }
        ),
        f"{sf}/documents.parquet",
    )
    from polars_readstat_spark.queries.retrieval import (
        inverted_index_postings,
    )

    rows = {r.term: r for r in inverted_index_postings(spark, sf).collect()}
    assert "rare" in rows
    hit_ids = [i for i in range(n) if i % 33 == 0]
    assert rows["rare"].df == len(hit_ids)
    assert rows["rare"].postings == ",".join(str(i) for i in hit_ids[:50])
    # 'filler' is in every doc — excluded by the relative df cap
    assert "filler" not in rows
