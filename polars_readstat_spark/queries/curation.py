"""Training-corpus curation operators: decontamination, sequence
packing, PII-pattern scanning.

The pieces of a large-scale LLM data pipeline that sit between dedup
(queries/dedup.py) and export: removing benchmark contamination,
packing documents into fixed token budgets, and counting sensitive-
pattern hits before redaction. All pure Catalyst — no UDFs — and each
shape is chosen for the 100 TB case (see docstrings).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table, spread

#: n-gram width for decontamination. Real pipelines use 8–13 tokens
#: (e.g. GPT-3's 13-gram eval scrub); the synthetic word-salad corpus
#: has no 8-gram collisions at all, so 4 keeps the overlap set real
#: (non-empty, still selective) at test SF. The width is a constant,
#: not a semantic: the plan is identical at any n.
NGRAM_N = 4


# DuckDB twin of functions.curation.word_ngrams: list slice
# a[i:i+n-1] is 1-based and
# end-inclusive (n elements); generate_series(1, k) is empty for k < 1,
# so no guard is needed on that side.
_DUCK_NGRAMS = (
    "list_transform(generate_series(1, len(arr) - {nm1}),"
    " i -> array_to_string(arr[i:i+{nm1}], ' '))"
).format(nm1=NGRAM_N - 1)


@query(
    "decontaminate_ngram_overlap",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ),
    grams AS (
      SELECT doc_id, UNNEST({_DUCK_NGRAMS}) AS gram FROM tok
    ),
    eval_grams AS (
      SELECT DISTINCT gram, doc_id AS eval_id FROM grams
      WHERE doc_id % 97 = 0
    ),
    train_grams AS (
      SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 97 <> 0
    )
    SELECT t.doc_id,
           COUNT(DISTINCT t.gram) AS n_shared_ngrams,
           COUNT(DISTINCT e.eval_id) AS n_eval_docs_hit
    FROM train_grams t JOIN eval_grams e ON e.gram = t.gram
    GROUP BY t.doc_id
    """,
)
def decontaminate_ngram_overlap(spark, sf_dir):
    """Benchmark decontamination: training docs sharing an NGRAM_N-gram
    with the eval set.

    The eval set (stand-in: doc_id % 97 == 0 — a real pipeline unions
    its benchmark suites here) explodes to distinct (gram, eval_id)
    pairs and BROADCASTS: benchmarks are fixed-size (~10⁷ n-grams for
    every major suite combined, a few hundred MB hashed), so at 100 TB
    the contamination scan is one map-side hash probe per training
    n-gram — no shuffle of the corpus, cost linear in corpus tokens.
    Per-doc distinct counts partial-aggregate on doc_id.
    Delegates to functions.curation.ngram_overlap.
    """
    from polars_readstat_spark.functions.curation import ngram_overlap

    docs = spread(load_table(spark, sf_dir, "documents"))
    return ngram_overlap(
        docs.filter(F.col("doc_id") % 97 != 0),
        docs.filter(F.col("doc_id") % 97 == 0),
        n=NGRAM_N,
    )


@query(
    "decontaminate_hash_prefilter",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, string_split(text, ' ') AS arr FROM documents
    ),
    grams AS (
      SELECT doc_id, UNNEST({_DUCK_NGRAMS}) AS gram FROM tok
    ),
    eval_grams AS (
      SELECT DISTINCT gram, doc_id AS eval_id FROM grams
      WHERE doc_id % 97 = 0
    ),
    train_grams AS (
      SELECT DISTINCT doc_id, gram FROM grams WHERE doc_id % 97 <> 0
    )
    SELECT t.doc_id,
           COUNT(DISTINCT t.gram) AS n_shared_ngrams,
           COUNT(DISTINCT e.eval_id) AS n_eval_docs_hit
    FROM train_grams t JOIN eval_grams e ON e.gram = t.gram
    GROUP BY t.doc_id
    """,
)
def decontaminate_hash_prefilter(spark, sf_dir):
    """Decontamination for benchmark sets too big to broadcast as
    strings: a two-phase probe whose OUTPUT is exactly the exact-join
    answer (the oracle is decontaminate_ngram_overlap's — the
    prefilter is semantics-free).

    Phase 1 broadcasts only an 8-byte xxhash64 DICTIONARY of the eval
    n-grams (~4-5x smaller than the gram strings — a combined-suite
    eval set of 10^7 grams fits in ~80 MB hashed where the strings
    would strain the broadcast) and semi-joins the training gram
    stream against it map-side: no corpus shuffle, and everything
    except true overlaps + rare 64-bit hash collisions drops here.
    Phase 2 exact-joins ONLY the surviving candidate grams against
    the (gram, eval_id) pairs, so hash collisions are eliminated and
    the expensive string comparison runs on a candidate set ~the size
    of the real contamination, not the corpus. This is the public-API
    equivalent of the Bloom-prefilter + exact-confirm pattern (Spark's
    bloom_filter_agg/might_contain are optimizer-internal and not in
    the SQL registry — checked 4.1).
    """
    from polars_readstat_spark.functions.curation import word_ngrams

    docs = spread(load_table(spark, sf_dir, "documents"))

    def grams_of(df, out_id):
        # token array projected once — the split() expression inside
        # the gram transform's slice would re-split per gram index
        return (
            df.select(
                F.col("doc_id").alias(out_id),
                F.split(F.col("text"), " ").alias("__toks"),
            )
            .select(
                out_id,
                F.explode(word_ngrams(F.col("__toks"), NGRAM_N)).alias(
                    "gram"
                ),
            )
            .distinct()
        )

    eg = grams_of(docs.filter(F.col("doc_id") % 97 == 0), "eval_id")
    tg = grams_of(docs.filter(F.col("doc_id") % 97 != 0), "doc_id")
    # phase 1: compact hash dictionary, map-side semi-join
    hdict = eg.select(F.xxhash64("gram").alias("h")).distinct()
    cand = tg.withColumn("h", F.xxhash64("gram")).join(
        F.broadcast(hdict), "h", "left_semi"
    )
    # phase 2: exact confirm on the candidate set only. NO broadcast
    # hint here — shipping the full (gram, eval_id) STRING table to
    # every executor would re-introduce exactly the oversized
    # broadcast phase 1 exists to avoid. Unhinted, this is a shuffle
    # join of the contamination-sized candidate set against ONE pass
    # over the eval set (the corpus itself never shuffles — phase 1
    # is map-side); at small scale AQE broadcasts it anyway.
    return (
        cand.join(eg, "gram")
        .groupBy("doc_id")
        .agg(
            F.countDistinct("gram").alias("n_shared_ngrams"),
            F.countDistinct("eval_id").alias("n_eval_docs_hit"),
        )
    )


@query(
    "sequence_packing_bins",
    oracle="""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ),
    packed AS (
      SELECT doc_id, source, n_tokens,
             CAST(FLOOR(
               CAST(SUM(n_tokens) OVER (
                 PARTITION BY source ORDER BY doc_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS DOUBLE) / 256.0) AS BIGINT) AS bin_id
      FROM tok
    )
    SELECT source, COALESCE(bin_id, 0) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS bin_tokens
    FROM packed
    GROUP BY source, COALESCE(bin_id, 0)
    """,
)
def sequence_packing_bins(spark, sf_dir):
    """Sequence packing: assign documents to fixed token-budget bins.

    The distributed variant of greedy concat-and-chunk packing: within
    each source shard, docs pack contiguously in doc_id order and the
    bin is floor(exclusive-running-token-count / budget) — one window
    pass, one shuffle on the shard key. True first-fit bin packing is
    inherently sequential; contiguous packing is what production
    pipelines actually run because it preserves shard locality and
    needs no coordination — each source partition packs independently,
    so 100 TB packs in one pass regardless of executor count. The
    first row's exclusive cumsum is NULL → bin 0 on both engines.
    Delegates to functions.curation.pack_sequences.
    """
    from polars_readstat_spark.functions.curation import pack_sequences

    docs = spread(load_table(spark, sf_dir, "documents")).select(
        "doc_id",
        "source",
        F.size(F.split(F.col("text"), " ")).cast("bigint").alias("n_tokens"),
    )
    packed = pack_sequences(docs, budget=256)
    return packed.groupBy("source", "bin_id").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("bin_tokens"),
    )


#: Stand-in sensitive patterns. The synthetic corpus has no real
#: emails/SSNs, so alongside the real-shaped patterns (which must
#: legitimately return 0) one term pattern exercises the nonzero path.
#: A production run swaps this table for its compliance regex set.
PII_PATTERNS = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"),
    ("phone_us", r"\b\d{3}[-.]\d{3}[-.]\d{4}\b"),
    ("ssn", r"\b\d{3}-\d{2}-\d{4}\b"),
    ("secret_term", r"\b(key|hash)\b"),
)


@query(
    "pii_pattern_counts",
    oracle="""
    SELECT p.pattern_name,
           CAST(SUM(len(regexp_extract_all(d.text, p.pat))) AS BIGINT)
             AS n_hits,
           CAST(SUM(CASE WHEN len(regexp_extract_all(d.text, p.pat)) > 0
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs_hit
    FROM documents d
    CROSS JOIN (VALUES
      ('email', '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}'),
      ('phone_us', '\\b\\d{3}[-.]\\d{3}[-.]\\d{4}\\b'),
      ('ssn', '\\b\\d{3}-\\d{2}-\\d{4}\\b'),
      ('secret_term', '\\b(key|hash)\\b')
    ) AS p(pattern_name, pat)
    GROUP BY p.pattern_name
    """,
)
def pii_pattern_counts(spark, sf_dir):
    """PII scan: per-pattern hit counts across the corpus.

    The redaction pre-pass: every document is scanned against the
    pattern table (broadcast — compliance regex sets are tiny) and
    per-pattern totals partial-aggregate map-side, so the whole scan
    is one linear pass with a 4-row shuffle. regexp_count runs in
    codegen (JVM regex); both engines use RE2-class syntax on these
    patterns, so hit counts match exactly.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    from polars_readstat_spark.functions.curation import pattern_scan

    return pattern_scan(docs, PII_PATTERNS)


# redaction chain: (pattern, placeholder) in FIXED application order —
# the order is part of the semantics (later patterns see earlier
# placeholders) and both engines apply the same chain
_REDACTIONS = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    (r"\b\d{3}-\d{2}-\d{4}\b", "<SSN>"),
    (r"\b(key|hash)\b", "<TERM>"),
)


@query(
    "pii_redact",
    oracle=r"""
    SELECT doc_id,
      REGEXP_REPLACE(
        REGEXP_REPLACE(
          REGEXP_REPLACE(
            REGEXP_REPLACE(text,
              '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}',
              '<EMAIL>', 'g'),
            '\b\d{3}[-.]\d{3}[-.]\d{4}\b', '<PHONE>', 'g'),
          '\b\d{3}-\d{2}-\d{4}\b', '<SSN>', 'g'),
        '\b(key|hash)\b', '<TERM>', 'g') AS redacted,
      CAST(LEN(REGEXP_EXTRACT_ALL(text,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
         + LEN(REGEXP_EXTRACT_ALL(text, '\b\d{3}[-.]\d{3}[-.]\d{4}\b'))
         + LEN(REGEXP_EXTRACT_ALL(text, '\b\d{3}-\d{2}-\d{4}\b'))
         + LEN(REGEXP_EXTRACT_ALL(text, '\b(key|hash)\b'))
        AS BIGINT) AS n_redactions
    FROM documents
    """,
)
def pii_redact(spark, sf_dir):
    """PII redaction REWRITE (pii_pattern_counts is the scan half):
    each document's text with every pattern match replaced by its
    placeholder, plus the match count over the ORIGINAL text. The
    replace chain applies in a fixed order on both engines — chain
    order is semantic when patterns could overlap.

    Scale shape: pure per-row codegen expressions, no shuffle at all —
    the cleaned corpus writes back with the input's partitioning, so
    at 100 TB this is a map-only pass at scan throughput.
    """
    docs = spread(load_table(spark, sf_dir, "documents"))
    from polars_readstat_spark.functions.curation import redact

    return redact(docs, _REDACTIONS).select(
        "doc_id", "redacted", "n_redactions"
    )


@query(
    "source_mixing_weights",
    oracle="""
    WITH counts AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_chars) AS BIGINT) AS n_chars,
             CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT) AS w_raw
      FROM documents GROUP BY source
    )
    SELECT source, n_docs, n_chars,
           CAST(w_raw AS DOUBLE) / t.total AS mix_weight
    FROM counts, (SELECT SUM(w_raw) AS total FROM counts) t
    """,
)
def source_mixing_weights(spark, sf_dir):
    """Data-mixture weights: temperature-sampled source proportions
    (α = 0.5, the multilingual/multi-source upsampling standard — raw
    proportions starve small sources, uniform over-trains them).

    w_s ∝ n_s^α via integer sqrt so the weights come from exact
    BIGINT arithmetic on both engines (a float Σ n^α would wobble in
    the last ulp with summation order); the final normalization is one
    bigint/bigint divide. Per-source counts partial-aggregate; the
    1-row total broadcasts back — the output is |sources| rows no
    matter the corpus size, and the weights drive the downstream
    per-source sampling rates.
    """
    from polars_readstat_spark.functions.curation import mixture_weights

    docs = spread(load_table(spark, sf_dir, "documents"))
    chars = docs.groupBy("source").agg(
        F.sum("n_chars").cast("bigint").alias("n_chars")
    )
    return (
        mixture_weights(docs)
        .join(F.broadcast(chars), "source")
        .select("source", "n_docs", "n_chars", "mix_weight")
    )


@query(
    "curation_funnel_stage_counts",
    oracle="""
    WITH s0 AS (SELECT doc_id, text, lang, n_chars FROM documents),
    s1 AS (SELECT * FROM s0 WHERE lang = 'en'),
    s2 AS (
      SELECT * FROM s1
      WHERE n_chars BETWEEN 64 AND 100000
        AND (' ' || text || ' ') LIKE '% the %'
    ),
    s3 AS (
      SELECT * FROM (
        SELECT doc_id,
               ROW_NUMBER() OVER (PARTITION BY MD5(text)
                                  ORDER BY doc_id) AS rn
        FROM s2
      ) WHERE rn = 1
    )
    SELECT * FROM (VALUES
      (0, 'ingested'), (1, 'lang_en'), (2, 'quality'), (3, 'exact_dedup')
    ) stages(stage, stage_name)
    JOIN (
      SELECT 0 AS stage, COUNT(*) AS n_docs FROM s0
      UNION ALL SELECT 1, COUNT(*) FROM s1
      UNION ALL SELECT 2, COUNT(*) FROM s2
      UNION ALL SELECT 3, COUNT(*) FROM s3
    ) counts USING (stage)
    ORDER BY stage
    """,
)
def curation_funnel_stage_counts(spark, sf_dir):
    """End-to-end curation funnel: per-stage survivor counts for the
    canonical pre-train chain (ingest → language gate → rule-based
    quality gate → exact dedup keep-first). The operational dashboard
    query every corpus pipeline runs after each build.

    Shape at 100 TB: ONE corpus scan — the stage predicates become
    per-row flags (naively counting each stage separately re-scans
    the corpus once per stage), the dedup keep-first flag is a
    row_number window keyed on MD5(text) restricted to quality
    survivors (same one shuffle as dedup_keep_first_records), and the
    four counts are conditional sums that partial-aggregate map-side.
    MD5 and the LIKE-based stopword probe are engine-portable, so
    both engines agree exactly."""
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    s1 = F.col("lang") == "en"
    s2 = s1 & F.col("n_chars").between(64, 100000) & F.concat(
        F.lit(" "), F.col("text"), F.lit(" ")
    ).like("% the %")
    # rank within MD5 groups of quality survivors only; non-survivors
    # must NOT share one null partition (that single partition would
    # hold most of a 100 TB corpus) — they get unique per-row keys,
    # so every window partition stays tiny
    w = Window.partitionBy(
        F.when(s2, F.md5(F.col("text"))).otherwise(
            F.concat(F.lit("#"), F.col("doc_id"))
        )
    ).orderBy("doc_id")
    flags = d.select(
        s1.alias("f1"),
        s2.alias("f2"),
        (s2 & (F.row_number().over(w) == 1)).alias("f3"),
    )
    counts = flags.agg(
        F.count(F.lit(1)).alias("c0"),
        F.sum(F.col("f1").cast("bigint")).alias("c1"),
        F.sum(F.col("f2").cast("bigint")).alias("c2"),
        F.sum(F.col("f3").cast("bigint")).alias("c3"),
    )
    stages = spark.createDataFrame(
        [(0, "ingested"), (1, "lang_en"), (2, "quality"),
         (3, "exact_dedup")],
        "stage int, stage_name string",
    )
    return stages.crossJoin(counts).select(
        "stage",
        "stage_name",
        F.when(F.col("stage") == 0, F.col("c0"))
        .when(F.col("stage") == 1, F.col("c1"))
        .when(F.col("stage") == 2, F.col("c2"))
        .otherwise(F.col("c3"))
        .cast("bigint")
        .alias("n_docs"),
    )


@query(
    "sequence_length_histogram",
    oracle="""
    SELECT CAST(FLOOR(LOG2(GREATEST(LEN(STRING_SPLIT(text, ' ')), 1)))
                AS BIGINT) AS len_bucket,
           COUNT(*) AS n_docs,
           CAST(SUM(CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT))
                AS BIGINT) AS total_tokens
    FROM documents
    GROUP BY 1 ORDER BY 1
    """,
)
def sequence_length_histogram(spark, sf_dir):
    """Token-length distribution in power-of-two buckets — the
    planning input for context-length choice and packing efficiency
    (what fraction of documents fragment at 2k/8k/128k contexts).
    Whitespace token counts keep the oracle engine-portable; the
    log2 bucket is exact integer-valued for the bucket boundaries in
    play. One scan, partial-aggregated on ≤40 bucket keys."""
    d = spread(load_table(spark, sf_dir, "documents"))
    ntok = F.size(F.split("text", " ")).cast("bigint")
    bucket = F.floor(F.log2(F.greatest(ntok, F.lit(1)))).cast("bigint")
    return (
        d.select(bucket.alias("len_bucket"), ntok.alias("nt"))
        .groupBy("len_bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("nt").cast("bigint").alias("total_tokens"),
        )
    )


@query(
    "source_cap_topk",
    oracle="""
    WITH ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    )
    SELECT doc_id, source, CAST(rk AS BIGINT) AS rk
    FROM ranked WHERE rk <= 50
    """,
)
def source_cap_topk(spark, sf_dir):
    """Per-domain document caps — the standard guard against a single
    crawl domain dominating a training mix: keep only the best K docs
    per source, ranked by length with doc_id as the deterministic
    tiebreak.

    100 TB shape: one hash-partition by source feeding a bounded
    per-partition window (row_number needs no full sort of the corpus,
    only a per-source ordering); a skewed mega-domain is exactly the
    case the cap exists for, and its window input can additionally be
    pre-truncated per partition since any row below rank K in ANY
    partition-local ordering can never enter the global per-source
    top K."""
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    w = Window.partitionBy("source").orderBy(
        F.col("n_chars").desc(), F.col("doc_id")
    )
    return (
        d.select(
            "doc_id",
            "source",
            F.row_number().over(w).cast("bigint").alias("rk"),
        )
        .filter(F.col("rk") <= 50)
    )


#: char budget for the mixture fill below — fixed, so the selected
#: fraction shrinks as the corpus grows (a budget is an absolute
#: target, not a rate)
MIX_BUDGET_CHARS = 50_000


@query(
    "mixture_budget_fill",
    oracle=f"""
    WITH q AS (
      SELECT CAST({MIX_BUDGET_CHARS} AS DOUBLE)
             / COUNT(DISTINCT source) AS quota
      FROM documents
    ),
    ord AS (
      SELECT doc_id, source, n_chars,
             SUM(n_chars) OVER (
               PARTITION BY source
               ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id
             ) AS cum
      FROM documents
    )
    SELECT o.source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(o.n_chars) AS BIGINT) AS chars_taken
    FROM ord o, q
    WHERE o.cum <= q.quota
    GROUP BY o.source
    """,
)
def mixture_budget_fill(spark, sf_dir):
    """Fill a fixed training-token budget EVENLY across sources: each
    source gets budget/n_sources chars, and docs are taken in
    deterministic content-hash order (md5 of the key — both engines
    emit identical hex, so the same docs are picked on any cluster
    or partitioning) until the running total would pass the quota.

    100 TB shape: one tiny aggregate broadcasts the quota; the window
    cumsum shuffles once on source; selection is map-side after the
    window. The hash order also makes incremental refills stable:
    re-running with a larger budget keeps every previously selected
    doc."""
    from pyspark.sql import Window

    d = spread(load_table(spark, sf_dir, "documents"))
    quota = d.agg(
        (
            F.lit(float(MIX_BUDGET_CHARS))
            / F.countDistinct("source")
        ).alias("quota")
    )
    w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
    )
    ordd = d.select(
        "doc_id", "source", "n_chars", F.sum("n_chars").over(w).alias("cum")
    )
    return (
        ordd.crossJoin(F.broadcast(quota))
        .filter(F.col("cum") <= F.col("quota"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("chars_taken"),
        )
    )


@query(
    "chunk_documents_overlap",
    oracle="""
    WITH t AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks,
             LEN(STRING_SPLIT(text, ' ')) AS n
      FROM documents
      WHERE text IS NOT NULL
    ),
    x AS (
      SELECT doc_id, toks, n,
             UNNEST(RANGE(0, (GREATEST(n - 16, 0) + 11) // 12 + 1)) AS i
      FROM t
    )
    SELECT doc_id,
           CAST(i AS INT) AS chunk_idx,
           CAST(LEAST(16, n - i * 12) AS BIGINT) AS n_tokens,
           ARRAY_TO_STRING(toks[i * 12 + 1 : i * 12 + 16], ' ')
             AS chunk_text
    FROM x
    """,
)
def chunk_documents_overlap(spark, sf_dir):
    """Sliding-window document chunking — the context-window prep step
    of a training pipeline: window 16 tokens, stride 12 (25% overlap),
    every chunk tagged with its ordinal and exact token count. The
    window/stride are data-scale knobs (production: ~1k-token windows
    against a real tokenizer; the whitespace tokens here are the
    engine-parity stand-in, queries/text.py convention).

    Scale shape: map-only — tokenize, compute the chunk count
    arithmetically, explode a sequence, slice. ZERO shuffles, no
    state; per-row fan-out is bounded by document length, so the op
    keeps the input's partitioning at any corpus size (the cleaned
    chunk table writes out exactly as partitioned as the corpus came
    in).
    """
    W, S = 16, 12
    d = spread(load_table(spark, sf_dir, "documents"))
    # NULL-text docs are dropped on BOTH engines: Spark's
    # size(split(NULL)) is -1 (legacy sizeOfNull) while DuckDB's
    # UNNEST(RANGE(NULL)) emits zero rows — pin identical semantics.
    t = d.filter(F.col("text").isNotNull()).select(
        "doc_id", F.split("text", " ").alias("toks")
    ).withColumn("n", F.size("toks"))
    t = t.withColumn(
        "i",
        F.explode(
            F.sequence(
                F.lit(0),
                F.expr(f"CAST((GREATEST(n - {W}, 0) + {S - 1}) DIV {S} AS INT)"),
            )
        ),
    )
    return t.select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        F.least(F.lit(W), F.col("n") - F.col("i") * S)
        .cast("bigint")
        .alias("n_tokens"),
        F.array_join(
            F.slice(F.col("toks"), F.col("i") * S + 1, W), " "
        ).alias("chunk_text"),
    )


@query(
    "train_val_test_split",
    oracle="""
    WITH s AS (
      SELECT source, n_chars, doc_id,
             CASE WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) < 'c'
                    THEN 'train'
                  WHEN SUBSTRING(MD5(CAST(doc_id AS VARCHAR)), 1, 1) < 'e'
                    THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
    )
    SELECT source, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id
    FROM s GROUP BY source, split
    """,
)
def train_val_test_split(spark, sf_dir):
    """Deterministic 3-way corpus split by content-stable hash ranges
    (first md5 hex nibble: 0-b train ~75%, c-d val ~12.5%, e-f test
    ~12.5%), summarized per source × split. Hash-range splitting is
    the production norm because membership is a pure function of the
    row — re-runs, late-arriving shards, and incremental appends land
    each doc in the SAME split with no coordination, no stored
    assignment table, and no RNG seed to version.

    Scale shape: one map-side expression plus one combinable
    aggregation; output is |sources| × 3 rows at any corpus size.
    """
    d = load_table(spark, sf_dir, "documents")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    split = (
        F.when(nib < "c", "train").when(nib < "e", "val").otherwise("test")
    )
    return (
        d.withColumn("split", split)
        .groupBy("source", "split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
        )
    )


@query(
    "training_sequence_pack",
    oracle="""
    WITH k AS (
      SELECT doc_id,
             GREATEST(n_chars // 4, 1) AS tokens,
             ((doc_id % 1000003) * 2654435761 + 12345) % 4294967296
               AS skey
      FROM documents
    ),
    s AS (
      SELECT doc_id, tokens, skey, skey % 32 AS shard,
             SUM(tokens) OVER (PARTITION BY skey % 32
                               ORDER BY skey, doc_id
                               ROWS UNBOUNDED PRECEDING) AS cum
      FROM k
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST((cum - tokens) // 8192 AS BIGINT) AS seq_idx,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(tokens) AS BIGINT) AS sum_tokens,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM s GROUP BY shard, (cum - tokens) // 8192
    """,
)
def training_sequence_pack(spark, sf_dir):
    """Context-window sequence packing — the step between a shuffled
    corpus and a trainer's fixed-length batches: documents are laid
    end-to-end in deterministic shard order and cut into 8192-token
    sequences; each document belongs to the sequence where it STARTS
    (cross-boundary docs span into the next window, the standard
    packed-pretraining layout). No global sort: the same
    multiplicative-hash sharding as training_shard_shuffle gives 32
    independent streams, and the within-shard running token total is
    one window cumsum per shard — one shuffle, local sorts, linear in
    corpus size. Token counts use the n_chars/4 proxy in exact
    integer arithmetic so the oracle replays bit-for-bit; a real
    tokenizer drops in by swapping the tokens expression. Output is
    one row per packed sequence (fill accounting + first doc), the
    manifest a data loader consumes."""
    from pyspark.sql import Window

    docs = load_table(spark, sf_dir, "documents")
    skey = (
        (F.col("doc_id") % F.lit(1000003)) * F.lit(2654435761)
        + F.lit(12345)
    ) % F.lit(4294967296)
    d = docs.select(
        "doc_id",
        F.greatest(
            F.expr("n_chars div 4"), F.lit(1).cast("long")
        ).alias("tokens"),
        skey.alias("skey"),
        (skey % 32).alias("shard"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("skey", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    d = d.withColumn("cum", F.sum("tokens").over(w))
    d = d.withColumn(
        "seq_idx", F.expr("(cum - tokens) div 8192").cast("bigint")
    )
    return d.groupBy("shard", "seq_idx").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("tokens").cast("bigint").alias("sum_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


@query(
    "training_shard_shuffle",
    oracle="""
    WITH k AS (
      SELECT doc_id, n_chars,
             ((doc_id % 1000003) * 2654435761 + 12345) % 4294967296
               AS skey
      FROM documents
    ),
    s AS (
      SELECT doc_id, n_chars, skey, skey % 32 AS shard,
             ROW_NUMBER() OVER (PARTITION BY skey % 32
                                ORDER BY skey, doc_id) AS pos
      FROM k
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
           CAST(SUM(pos * (doc_id % 100000)) AS BIGINT) AS order_checksum
    FROM s GROUP BY shard
    """,
)
def training_shard_shuffle(spark, sf_dir):
    """Deterministic seeded training-order shuffle WITHOUT a global
    sort: shard = multiplicative-hash(doc_id) % 32, training order
    within a shard = (hash, doc_id). A 100 TB corpus can't pay a
    total orderBy (one range-partitioned sort of everything) just to
    randomize epoch order — but it doesn't need to: hash-partition
    into shard files and sort WITHIN each shard (one shuffle + local
    sorts), which is exactly this plan's shape. The hash is Knuth's
    multiplicative scheme in pure int64 arithmetic ((id % 1000003) *
    2654435761 + 12345, mod 2^32), so the permutation is
    reproducible across engines and runs — no rand() seeds, no
    engine-specific hash — and uniform enough that shards stay
    balanced (the oracle's n_docs spread shows <2% skew at sf0.01).

    The result pins the ORDER, not just membership: order_checksum =
    SUM(position_in_shard * (doc_id % 100000)) changes when two
    documents with distinct weights (doc_id % 100000) swap places —
    a swap is invisible only if the pair shares a weight, a ~1e-5
    per-pair coincidence, so the oracle verifies the permutation a
    trainer would consume to that tolerance, per shard (membership
    and shard sizing are pinned exactly by n_docs/sum_chars)."""
    docs = load_table(spark, sf_dir, "documents")
    from pyspark.sql import Window

    skey = (
        (F.col("doc_id") % F.lit(1000003)) * F.lit(2654435761)
        + F.lit(12345)
    ) % F.lit(4294967296)
    d = docs.select(
        "doc_id",
        "n_chars",
        skey.alias("skey"),
        (skey % 32).alias("shard"),
    )
    w = Window.partitionBy("shard").orderBy("skey", "doc_id")
    d = d.withColumn("pos", F.row_number().over(w))
    return d.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("sum_chars"),
        F.sum(F.col("pos") * (F.col("doc_id") % 100000))
        .cast("bigint")
        .alias("order_checksum"),
    )
