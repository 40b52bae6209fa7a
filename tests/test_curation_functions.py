"""Unit tests for the DataFrame-level curation library on synthetic
frames (the registry queries exercise the same code against the
DuckDB oracle; these pin the library semantics on corpora the test
tables can't express — known overlaps, exact bin edges, zero-hit
patterns, single-group mixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_spark.functions.curation import (
    mixture_weights,
    ngram_overlap,
    pack_sequences,
    pattern_scan,
    word_ngrams,
)


def test_word_ngrams_short_doc_is_empty(spark):
    df = spark.createDataFrame(
        [("a b c",), ("a b c d",), ("",)], ["text"]
    ).select(word_ngrams(F.split("text", " "), 4).alias("g"))
    got = [r.g for r in df.collect()]
    assert got[0] == []  # 3 tokens < n=4 (sequence(1,0) guard)
    assert got[1] == ["a b c d"]
    assert got[2] == []


def test_ngram_overlap_finds_known_contamination(spark):
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely unrelated words here nothing shared at all"),
        ],
        ["doc_id", "text"],
    )
    ev = spark.createDataFrame(
        [(100, "quick brown fox jumps"), (101, "over the lazy dog")],
        ["doc_id", "text"],
    )
    rows = {r.doc_id: r for r in ngram_overlap(train, ev, n=4).collect()}
    assert set(rows) == {1}  # doc 2 shares nothing
    # doc 1 contains both eval docs' full 4-grams
    assert rows[1].n_eval_docs_hit == 2
    assert rows[1].n_shared_ngrams == 2


def test_pack_sequences_exact_bin_edges(spark):
    # budget 10, tokens 4+4+4+4: exclusive cumsums 0,4,8,12 → bins 0,0,0,1
    df = spark.createDataFrame(
        [(i, "s", 4) for i in range(4)], ["doc_id", "source", "n_tokens"]
    )
    packed = pack_sequences(df, budget=10)
    bins = [r.bin_id for r in packed.orderBy("doc_id").collect()]
    assert bins == [0, 0, 0, 1]
    # shards pack independently
    df2 = df.union(
        spark.createDataFrame(
            [(10, "t", 9), (11, "t", 9)], ["doc_id", "source", "n_tokens"]
        )
    )
    by_shard = {
        (r.source, r.doc_id): r.bin_id
        for r in pack_sequences(df2, budget=10).collect()
    }
    assert by_shard[("t", 10)] == 0 and by_shard[("t", 11)] == 0


def test_pattern_scan_counts_hits_and_rows(spark):
    df = spark.createDataFrame(
        [("mail me at a@b.co or c@d.org",), ("no contacts here",)],
        ["text"],
    )
    pats = [("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
            ("ssn", r"\b\d{3}-\d{2}-\d{4}\b")]
    got = {r.pattern_name: (r.n_hits, r.n_docs_hit)
           for r in pattern_scan(df, pats).collect()}
    assert got["email"] == (2, 1)
    assert got["ssn"] == (0, 0)


def test_mixture_weights_sum_to_one_and_upsample_small(spark):
    df = spark.createDataFrame(
        [("big",)] * 100 + [("small",)] * 4, ["source"]
    )
    rows = {r.source: r for r in mixture_weights(df).collect()}
    # floor(sqrt(100))=10, floor(sqrt(4))=2 → weights 10/12, 2/12
    assert rows["big"].w_raw == 10 and rows["small"].w_raw == 2
    assert abs(rows["big"].mix_weight - 10 / 12) < 1e-15
    # temperature sampling upsamples the small source vs raw share
    assert rows["small"].mix_weight > 4 / 104
    assert abs(sum(r.mix_weight for r in rows.values()) - 1.0) < 1e-12


def test_redact_real_pii_shapes(spark):
    from polars_readstat_spark.functions.curation import redact
    from polars_readstat_spark.queries.curation import _REDACTIONS

    df = spark.createDataFrame(
        [
            (1, "mail me at jane.doe+x@example.co.uk or call 555-123-4567"),
            (2, "ssn 123-45-6789 and key hash keyhash"),
            (3, "nothing sensitive here"),
        ],
        ["doc_id", "text"],
    )
    got = {
        r.doc_id: (r.redacted, r.n_redactions)
        for r in redact(df, _REDACTIONS).collect()
    }
    assert got[1] == ("mail me at <EMAIL> or call <PHONE>", 2)
    # 'keyhash' has no word boundary — must survive
    assert got[2] == ("ssn <SSN> and <TERM> <TERM> keyhash", 3)
    assert got[3] == ("nothing sensitive here", 0)


def test_redact_chain_order_is_fixed(spark):
    # ssn pattern is a subset of phone_us's shape: the phone pattern
    # runs first and must claim xxx-xx-xxxx? no — phone is
    # ddd-ddd-dddd, ssn ddd-dd-dddd; they never overlap. Pin instead
    # that an email whose local part contains digits is NOT re-hit by
    # the phone pattern after replacement (placeholders are opaque).
    from polars_readstat_spark.functions.curation import redact
    from polars_readstat_spark.queries.curation import _REDACTIONS

    df = spark.createDataFrame(
        [(1, "x 555-123-4567@mail.com y")], ["doc_id", "text"]
    )
    row = redact(df, _REDACTIONS).collect()[0]
    assert row.redacted == "x <EMAIL> y"
    # n_redactions is ORIGINAL-text match density, not substitutions
    # performed: the email consumed the digits so only ONE replacement
    # happened, but the phone pattern also matched the original text —
    # the documented semantic reports 2 (see redact()'s docstring).
    assert row.n_redactions == 2


def test_training_sequence_pack_properties(spark):
    """Packing invariants: every document lands in exactly one
    sequence, per-shard sequence indices are contiguous from 0 (the
    windows are cut from a continuous cumsum), and no sequence except
    a shard's last can be under-filled by more than one document's
    spillover."""
    from polars_readstat_spark.queries.curation import (
        training_sequence_pack,
    )
    from polars_readstat_spark.tables import load_table

    sf = "/root/testdata/sf0.001"
    out = training_sequence_pack(spark, sf).collect()
    total_docs = load_table(spark, sf, "documents").count()
    assert sum(r.n_docs for r in out) == total_docs
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r.seq_idx)
    for shard, idxs in by_shard.items():
        assert sorted(idxs) == list(range(max(idxs) + 1)), shard
