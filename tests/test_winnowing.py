"""Winnowing fingerprints: the Schleimer-Wilkerson-Aiken guarantee —
any shared token span of at least w + k - 1 tokens shares at least one
selected fingerprint — plus the df-cap behavior of the pair query."""

from __future__ import annotations

import pytest

from polars_readstat_spark.queries.dedup import _WIN_K, _WIN_W


def _docs_table(spark, tmp_path, rows):
    import os

    p = str(tmp_path / "docs")
    os.makedirs(p, exist_ok=True)
    spark.createDataFrame(
        rows, "doc_id bigint, text string, lang string, source string, n_chars bigint"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(p, "documents.parquet")
    )
    return p


@pytest.fixture()
def corpus(spark, tmp_path):
    # doc 0 and 1 share a (w + k - 1)-token span inside otherwise
    # unrelated text; doc 2 is unrelated filler
    span = " ".join(f"shared{i}" for i in range(_WIN_W + _WIN_K - 1))
    rows = [
        (0, f"alpha beta gamma delta {span} eps zeta eta theta", "en", "a", 0),
        (1, f"one two three four five {span} six seven eight nine", "en", "b", 0),
        (2, "lorem ipsum dolor sit amet consectetur adipiscing elit sed do", "en", "c", 0),
    ]
    rows = [(d, t, lg, s, len(t)) for d, t, lg, s, _ in rows]
    return _docs_table(spark, tmp_path, rows)


def test_shared_span_shares_fingerprint(spark, corpus):
    from polars_readstat_spark.queries.dedup import _winnow_fp_build

    fp = _winnow_fp_build(spark, corpus)
    by_doc = {
        d: {r.fingerprint for r in g}
        for d, g in __import__("itertools").groupby(
            sorted(fp.collect(), key=lambda r: r.doc_id),
            key=lambda r: r.doc_id,
        )
    }
    assert by_doc[0] & by_doc[1], "guaranteed shared fingerprint missing"
    assert not (by_doc[0] & by_doc[2])
    assert not (by_doc[1] & by_doc[2])


def test_copy_pairs_df_cap_drops_boilerplate(spark, tmp_path):
    from polars_readstat_spark.queries.dedup import winnowing_copy_pairs
    from polars_readstat_spark.queries import _cache

    # 12 docs all sharing one long boilerplate span (df > 8 for its
    # fingerprints) -> the cap drops them and NO pairs are reported;
    # two docs additionally share a genuine span -> exactly one pair
    boiler = " ".join(f"nav{i}" for i in range(20))
    # long enough that the copied span yields >= 3 DISTINCT selected
    # fingerprints (the pair query's threshold); a minimal w+k-1 span
    # guarantees only one
    real = " ".join(f"copy{i}" for i in range(40))
    rows = []
    for d in range(12):
        extra = f" uniq{d}a uniq{d}b uniq{d}c uniq{d}d"
        text = boiler + extra + (f" {real}" if d in (3, 7) else "")
        rows.append((d, text, "en", "s", len(text)))
    p = _docs_table(spark, tmp_path, rows)
    _cache.release_all()
    got = {
        (r.doc_a, r.doc_b): r.n_shared
        for r in winnowing_copy_pairs(spark, p).collect()
    }
    assert set(got) == {(3, 7)}, got
    _cache.release_all()


def test_copy_pairs_relative_cap_keeps_popular_copies(spark, tmp_path):
    """VERDICT r09 missing#3: a genuinely copied span replicated
    across 10 documents must SURVIVE when the corpus is large enough
    (the old absolute df<=8 silently dropped it). N=700 docs puts the
    relative cap at 700/62 = 11 >= 10, so all C(10,2)=45 pairs among
    the copies are reported; per-doc filler stays unique."""
    from polars_readstat_spark.queries import _cache
    from polars_readstat_spark.queries.dedup import winnowing_copy_pairs

    span = " ".join(f"lic{i}" for i in range(40))  # >= 3 fingerprints
    rows = []
    for d in range(700):
        filler = " ".join(f"u{d}w{j}" for j in range(12))
        text = (span + " " + filler) if d < 10 else filler
        rows.append((d, text, "en", "s", len(text)))
    p = _docs_table(spark, tmp_path, rows)
    _cache.release_all()
    got = {
        (r.doc_a, r.doc_b)
        for r in winnowing_copy_pairs(spark, p).collect()
    }
    assert got == {(a, b) for a in range(10) for b in range(a + 1, 10)}
    _cache.release_all()


def test_copy_pairs_small_corpus_multiway_copy_survives(spark, tmp_path):
    """Review r10: on corpora smaller than 8*62 docs the df<=8 floor
    must keep the old absolute behavior — a 4-way copied span in a
    150-doc corpus is a copy, not boilerplate."""
    from polars_readstat_spark.queries import _cache
    from polars_readstat_spark.queries.dedup import winnowing_copy_pairs

    span = " ".join(f"quad{i}" for i in range(40))
    rows = []
    for d in range(150):
        filler = " ".join(f"v{d}w{j}" for j in range(12))
        text = (span + " " + filler) if d < 4 else filler
        rows.append((d, text, "en", "s", len(text)))
    p = _docs_table(spark, tmp_path, rows)
    _cache.release_all()
    got = {
        (r.doc_a, r.doc_b)
        for r in winnowing_copy_pairs(spark, p).collect()
    }
    assert got == {(a, b) for a in range(4) for b in range(a + 1, 4)}
    _cache.release_all()
