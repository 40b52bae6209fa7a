"""Corpus-curation library: the DataFrame-level generalizations of
queries/curation.py, usable on any corpus DataFrame.

Everything is pure Catalyst (no UDFs) and keeps the 100 TB shapes of
the registry queries: eval-set broadcast for decontamination,
per-shard window cumsum for packing, broadcast pattern table +
codegen regexp_count for the PII scan, integer-weight temperature
mixing. See queries/curation.py docstrings for the scale analysis;
the registry queries now delegate here.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def word_ngrams(arr, n: int):
    """Contiguous word n-grams of an array<string> column expression.

    Spark's sequence(1, k) is DESCENDING for k < 1 (it would emit
    [1, 0] rather than an empty array), so short documents need the
    explicit size guard.
    """
    arr = F.col(arr) if isinstance(arr, str) else arr
    grams = F.transform(
        F.sequence(F.lit(1), F.size(arr) - (n - 1)),
        lambda i: F.concat_ws(" ", F.slice(arr, i, n)),
    )
    return F.when(F.size(arr) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


def ngram_overlap(
    train: DataFrame,
    eval_set: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: per training doc, the distinct
    n-grams it shares with any eval doc and how many eval docs it
    hits. The eval side (fixed-size at any corpus scale) broadcasts,
    so the training corpus is probed map-side — no corpus shuffle
    before the per-doc aggregate. Output: (id, n_shared_ngrams,
    n_eval_docs_hit); training docs with no overlap are absent.
    """

    def grams_of(df: DataFrame, out_id: str) -> DataFrame:
        # project the token array ONCE: passing the split() expression
        # into the transform lambda re-splits the text per gram index
        # (Catalyst does not hoist deterministic subexpressions out of
        # higher-order-function lambdas — O(len^2) per document)
        return (
            df.select(
                F.col(id_col).alias(out_id),
                F.split(F.col(text_col), " ").alias("__toks"),
            )
            .select(
                out_id,
                F.explode(word_ngrams(F.col("__toks"), n)).alias("gram"),
            )
            .distinct()
        )

    eg = grams_of(eval_set, "eval_id")
    tg = grams_of(train, id_col)
    return (
        tg.join(F.broadcast(eg), "gram")
        .groupBy(id_col)
        .agg(
            F.countDistinct("gram").alias("n_shared_ngrams"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
        )
    )


def pack_sequences(
    df: DataFrame,
    budget: int,
    shard_col: str = "source",
    order_col: str = "doc_id",
    tokens_col: str = "n_tokens",
) -> DataFrame:
    """Assign each row a token-budget bin: contiguous fill-to-budget
    packing within each shard, in order_col order (the distributed
    variant of greedy concat-and-chunk — one window cumsum keyed by
    the shard, each shard packs independently). Adds a bigint
    `bin_id` column; the first row of a shard lands in bin 0.
    """
    w = (
        Window.partitionBy(shard_col)
        .orderBy(order_col)
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return df.withColumn(
        "bin_id",
        F.coalesce(
            F.floor(
                F.sum(tokens_col).over(w).cast("double") / F.lit(float(budget))
            ),
            F.lit(0),
        ).cast("bigint"),
    )


def pattern_scan(
    df: DataFrame,
    patterns: Iterable[tuple[str, str]],
    text_col: str = "text",
) -> DataFrame:
    """Regex-pattern scan (the PII / sensitive-content pre-pass):
    per pattern, total hit count and number of rows hit. `patterns`
    is (name, regex) pairs — a compliance regex set is tiny, so the
    pattern table broadcasts and the scan is one linear codegen pass.
    """
    spark = df.sparkSession
    pats = spark.createDataFrame(list(patterns), ["pattern_name", "pat"])
    hits = df.crossJoin(F.broadcast(pats)).select(
        "pattern_name",
        F.regexp_count(F.col(text_col), F.col("pat")).alias("c"),
    )
    return hits.groupBy("pattern_name").agg(
        F.sum("c").cast("bigint").alias("n_hits"),
        F.sum(F.when(F.col("c") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_hit"),
    )


def redact(
    df: DataFrame,
    patterns: Iterable[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "redacted",
) -> DataFrame:
    """PII redaction rewrite: replace every match of each pattern with
    its placeholder token, applied in the given FIXED order (later
    patterns see earlier placeholders — order is part of the contract,
    as overlapping patterns redact differently if chained differently).
    `patterns` is (regex, placeholder) pairs. One linear codegen pass
    per row, no shuffle: the cleaned-corpus write stays partitioned
    exactly like the input at any scale.

    `n_redactions` counts regex MATCHES against the ORIGINAL text,
    summed across patterns — NOT replacements performed. When patterns
    overlap (e.g. "555-123-4567@mail.com": the email pattern consumes
    the digits first, so the phone pattern never fires in the rewrite)
    the count exceeds the number of substitutions actually made. This
    original-text semantic is deliberate: it is order-independent,
    cheap (no second scan of the rewritten text), and matches what a
    SQL oracle computes with per-pattern regexp-count over the source
    column; treat it as "PII signal density", not an edit count.
    """
    col = F.col(text_col)
    n = F.lit(0).cast("bigint")
    for pat, token in patterns:
        n = n + F.regexp_count(F.col(text_col), F.lit(pat))
        col = F.regexp_replace(col, pat, token)
    return df.withColumn(out_col, col).withColumn("n_redactions", n)


def mixture_weights(
    df: DataFrame,
    group_col: str = "source",
) -> DataFrame:
    """Temperature-sampled (α = 0.5) data-mixture weights per group:
    w_g ∝ floor(sqrt(n_g)) normalized over groups — integer weights so
    the proportions are exact under any summation order. Output:
    (group, n_docs, w_raw, mix_weight); |groups| rows at any corpus
    size, with the 1-row total broadcast back for the normalization.
    """
    counts = df.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs")
    ).withColumn("w_raw", F.floor(F.sqrt(F.col("n_docs"))).cast("bigint"))
    total = counts.agg(F.sum("w_raw").alias("total"))
    return counts.crossJoin(F.broadcast(total)).select(
        group_col,
        "n_docs",
        "w_raw",
        (F.col("w_raw").cast("double") / F.col("total")).alias("mix_weight"),
    )
