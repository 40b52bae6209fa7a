"""Text-analysis queries over the `documents` table.

Training-data-pipeline operators (project north star, beyond reference
parity): token counting, quality scoring, language-ID scoring, and
document fingerprinting — all as built-in-function expressions (no
Python UDFs in the hot path; everything stays in WholeStageCodegen).
Ratios are computed as double divisions of exact integer aggregates so
Spark and DuckDB agree bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from polars_readstat_spark.queries._cache import scoped_persist
from polars_readstat_spark.queries.registry import query
from polars_readstat_spark.tables import load_table, spread

_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")
_SW_SQL = "('" + "','".join(_STOPWORDS) + "')"


@query(
    "text_token_count",
    oracle="""
    SELECT doc_id, LENGTH(text) AS n_chars_calc,
           LEN(STRING_SPLIT(text, ' ')) AS n_tokens
    FROM documents
    """,
)
def text_token_count(spark, sf_dir):
    """Whitespace tokenization + counts (pipeline token-count op)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars_calc"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )


# BPE-ish pre-tokenizer: letter runs | digit runs | any single
# non-alphanumeric non-space mark. Plain character classes only, so
# Java regex (Spark) and RE2 (DuckDB) agree exactly.
_BPE_RE = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9 ]"


@query(
    "text_bpe_token_count",
    oracle=f"""
    SELECT doc_id,
           LEN(REGEXP_EXTRACT_ALL(text, '{_BPE_RE}')) AS n_bpe_tokens,
           LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(text, '{_BPE_RE}'))) AS n_distinct_tokens
    FROM documents
    """,
)
def text_bpe_token_count(spark, sf_dir):
    """BPE-style pre-tokenization count — the token-budget estimator a
    training pipeline runs before paying for a real BPE pass: letter
    runs, digit runs, and punctuation marks each count as one token
    (the GPT-2 pre-tokenizer's shape, minus the contractions table).
    Pure regexp codegen, no UDF; distinct-token count doubles as a
    cheap vocabulary-size proxy.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.regexp_extract_all("text", F.lit(_BPE_RE), 0)
    return d.select(
        "doc_id",
        F.size(toks).alias("n_bpe_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct_tokens"),
    )


@query(
    "text_quality_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, LENGTH(text) AS n_chars,
             STRING_SPLIT(text, ' ') AS toks
      FROM documents
    )
    SELECT doc_id, n_chars,
           LEN(toks) AS n_tokens,
           CAST(LEN(LIST_FILTER(toks, x -> x IN {_SW_SQL})) AS DOUBLE)
               / LEN(toks) AS stopword_ratio,
           CAST(LEN(LIST_DISTINCT(toks)) AS DOUBLE) / LEN(toks) AS distinct_ratio,
           CAST(n_chars - (LEN(toks) - 1) AS DOUBLE) / LEN(toks) AS avg_token_len
    FROM t
    """,
)
def text_quality_score(spark, sf_dir):
    """Quality scoring: stopword ratio, vocabulary diversity, average
    token length — the usual pre-training corpus filters."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    n_tok = F.size(toks)
    sw = F.array([F.lit(s) for s in _STOPWORDS])
    n_sw = F.size(F.filter(toks, lambda x: F.array_contains(sw, x)))
    n_distinct = F.size(F.array_distinct(toks))
    return d.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tok.alias("n_tokens"),
        (n_sw.cast("double") / n_tok).alias("stopword_ratio"),
        (n_distinct.cast("double") / n_tok).alias("distinct_ratio"),
        ((F.length("text") - (n_tok - F.lit(1))).cast("double") / n_tok).alias(
            "avg_token_len"
        ),
    )


@query(
    "text_lang_id_score",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks FROM documents
    )
    SELECT doc_id, lang,
           CAST(LEN(LIST_FILTER(toks, x -> x IN {_SW_SQL})) AS DOUBLE)
               / LEN(toks) AS en_score,
           CASE WHEN CAST(LEN(LIST_FILTER(toks, x -> x IN {_SW_SQL})) AS DOUBLE)
                     / LEN(toks) >= 0.02 THEN 'en' ELSE 'und' END AS pred_lang
    FROM t
    """,
)
def text_lang_id_score(spark, sf_dir):
    """Language-ID scoring: English function-word hit rate → threshold
    classifier. (The synthetic corpus shares one vocabulary across its
    `lang` tags, so accuracy against `lang` is meaningless here; the
    deterministic scoring pipeline is what's under test — swap the
    stopword array for per-language function-word or n-gram profiles
    to extend it to more languages.)"""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    sw = F.array([F.lit(s) for s in _STOPWORDS])
    score = F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast(
        "double"
    ) / F.size(toks)
    return d.select(
        "doc_id",
        "lang",
        score.alias("en_score"),
        F.when(score >= 0.02, F.lit("en")).otherwise(F.lit("und")).alias("pred_lang"),
    )


@query(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           MD5(ARRAY_TO_STRING(STRING_SPLIT(text, ' ')[1:8], ' ')
               || ':' || CAST(CAST(FLOOR(LENGTH(text) / 100.0) AS BIGINT) AS VARCHAR))
               AS fingerprint
    FROM documents
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Document fingerprint: hash of the leading-token prefix plus a
    length bucket (cheap near-dup prefilter)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    prefix = F.array_join(F.slice(F.split("text", " "), 1, 8), " ")
    bucket = F.floor(F.length("text") / F.lit(100.0)).cast("bigint").cast("string")
    return d.select(
        "doc_id", F.md5(F.concat(prefix, F.lit(":"), bucket)).alias("fingerprint")
    )


@query(
    "text_ngram_topk",
    oracle="""
    WITH tok AS (SELECT STRING_SPLIT(text, ' ') AS t FROM documents),
    bg AS (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t)),
                    i -> ARRAY_TO_STRING(t[i:i+1], ' '))) AS bigram
      FROM tok
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg GROUP BY bigram
    ORDER BY n DESC, bigram
    LIMIT 20
    """,
)
def text_ngram_topk(spark, sf_dir):
    """Corpus-level top-k n-grams (bigrams): the vocabulary/phrase
    statistic every corpus build reports. Explode adjacent-token
    pairs, hash-aggregate counts (map-side combinable: the shuffle
    carries one row per distinct bigram per partition), then a global
    TakeOrderedAndProject for the top 20 — no single-partition window,
    so the plan survives any corpus size. Ties break on the bigram
    string for engine-exact ordering.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    # project the token array ONCE before the gram lambda: Catalyst
    # does not hoist a deterministic split() out of a higher-order-
    # function body, so the inline form re-split the text for every
    # gram index — O(len²) per document, measured 3.7× slower on a
    # 200-token synthetic corpus (guide §1.1/§4.2: per-task work).
    toks = d.select(F.split("text", " ").alias("t"))
    bigrams = F.expr(
        "CASE WHEN size(t) < 2 THEN array() "
        "ELSE transform(sequence(1, size(t) - 1), "
        "i -> concat_ws(' ', slice(t, i, 2))) END"
    )
    return (
        toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "bigram")
        .limit(20)
    )


@query(
    "text_rare_token_ratio",
    oracle="""
    WITH tok AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS t FROM documents
    ),
    vocab AS (SELECT t, COUNT(*) AS freq FROM tok GROUP BY t)
    SELECT tok.doc_id,
           CAST(COUNT(CASE WHEN vocab.freq <= 2 THEN 1 END) AS BIGINT)
               AS n_rare,
           CAST(COUNT(*) AS BIGINT) AS n_tok,
           COUNT(CASE WHEN vocab.freq <= 2 THEN 1 END)
               / CAST(COUNT(*) AS DOUBLE) AS rare_ratio
    FROM tok JOIN vocab ON tok.t = vocab.t
    GROUP BY tok.doc_id
    """,
)
def text_rare_token_ratio(spark, sf_dir):
    """OOV/rare-token-rate quality filter (the deterministic stand-in
    for a perplexity gate): per document, the fraction of tokens whose
    corpus frequency is ≤ 2 — high ratios flag gibberish, boilerplate
    mangling, or wrong-language text. Two map-side-combinable
    aggregations plus one token equi-join; the vocabulary table is
    the only shuffle that grows with corpus size, and the final ratio
    is a double division of exact integer counts so both engines agree
    bit-for-bit (no transcendental log-prob in the compare surface)."""
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("t")
    )
    vocab = tok.groupBy("t").agg(F.count(F.lit(1)).alias("freq"))
    rare = F.count(F.when(F.col("freq") <= 2, 1))
    return (
        tok.join(vocab, "t")
        .groupBy("doc_id")
        .agg(
            rare.cast("bigint").alias("n_rare"),
            F.count(F.lit(1)).cast("bigint").alias("n_tok"),
            (rare / F.count(F.lit(1)).cast("double")).alias("rare_ratio"),
        )
    )


@query(
    "text_gopher_quality_rules",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents
    ),
    stats AS (
      SELECT doc_id,
             CAST(LEN(toks) AS BIGINT) AS n_words,
             CAST(LEN(LIST_FILTER(toks, t -> LEN(t) >= 3)) AS BIGINT)
               AS n_longish,
             CAST(LEN(LIST_FILTER(toks, t -> t IN {_SW_SQL})) AS BIGINT)
               AS n_stop
      FROM tok
    ),
    tri AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(RANGE(1, GREATEST(LEN(toks) - 2, 0) + 1),
                    i -> ARRAY_TO_STRING(toks[i:i+2], ' '))) AS tg
      FROM tok
    ),
    rep AS (
      SELECT doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_tri,
             CAST(COUNT(DISTINCT tg) AS BIGINT) AS n_tri_distinct
      FROM tri GROUP BY doc_id
    )
    SELECT s.doc_id, s.n_words,
           s.n_longish / CAST(s.n_words AS DOUBLE) AS longish_ratio,
           s.n_stop / CAST(s.n_words AS DOUBLE) AS stop_ratio,
           1.0 - (r.n_tri_distinct / CAST(r.n_tri AS DOUBLE))
             AS dup_trigram_ratio,
           (s.n_words BETWEEN 50 AND 100000
            AND s.n_longish * 5 >= s.n_words * 2
            AND s.n_stop > 0
            AND (r.n_tri_distinct * 10) >= (r.n_tri * 7)) AS keep
    FROM stats s JOIN rep r ON r.doc_id = s.doc_id
    """,
)
def text_gopher_quality_rules(spark, sf_dir):
    """Gopher-style rule-based quality gate — the standard pre-train
    corpus filter, as one Catalyst pass: word-count bounds, a
    short-word ratio (≥40% of words ≥3 chars), stopword presence, and
    a repetition rule (≤30% duplicate trigrams). All ratios are
    double divisions of exact integer counts; the keep flag is pure
    integer arithmetic, so both engines agree bit-for-bit. Shapes:
    one explode + two partial aggregations per doc, no joins beyond
    the per-doc stats merge — linear at any corpus size."""
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    stats = d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_words"),
        F.size(F.filter(toks, lambda t: F.length(t) >= 3))
        .cast("bigint")
        .alias("n_longish"),
        F.size(F.filter(toks, lambda t: t.isin(*_STOPWORDS)))
        .cast("bigint")
        .alias("n_stop"),
    )
    # pre-projected token array: split() inside the transform lambda
    # is re-evaluated per gram index (O(len²) per doc; see
    # text_ngram_topk note)
    tri = d.select("doc_id", toks.alias("tk")).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, greatest(size(tk) - 2, 0)),"
                " i -> concat_ws(' ', slice(tk, i, 3)))"
            )
        ).alias("tg"),
    )
    rep = tri.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_tri"),
        F.countDistinct("tg").cast("bigint").alias("n_tri_distinct"),
    )
    return stats.join(rep, "doc_id").select(
        "doc_id",
        "n_words",
        (F.col("n_longish") / F.col("n_words").cast("double")).alias(
            "longish_ratio"
        ),
        (F.col("n_stop") / F.col("n_words").cast("double")).alias(
            "stop_ratio"
        ),
        (
            F.lit(1.0)
            - F.col("n_tri_distinct") / F.col("n_tri").cast("double")
        ).alias("dup_trigram_ratio"),
        (
            F.col("n_words").between(50, 100000)
            & (F.col("n_longish") * 5 >= F.col("n_words") * 2)
            & (F.col("n_stop") > 0)
            & (F.col("n_tri_distinct") * 10 >= F.col("n_tri") * 7)
        ).alias("keep"),
    )


@query(
    "boilerplate_ngram_filter",
    oracle="""
    WITH tok AS (SELECT doc_id, STRING_SPLIT(text, ' ') AS t FROM documents),
    g AS (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(t) - 3),
                    i -> ARRAY_TO_STRING(t[i:i+4], ' '))) AS gram
      FROM tok
    ),
    bp AS (
      SELECT gram FROM g GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 3
    )
    SELECT g.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN bp.gram IS NOT NULL THEN 1 ELSE 0 END)
             AS BIGINT) AS n_bp,
           CAST(SUM(CASE WHEN bp.gram IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS bp_frac,
           (SUM(CASE WHEN bp.gram IS NOT NULL THEN 1 ELSE 0 END)
             * 2 < COUNT(*)) AS keep
    FROM g LEFT JOIN bp ON g.gram = bp.gram
    GROUP BY g.doc_id
    """,
)
def boilerplate_ngram_filter(spark, sf_dir):
    """C4-style boilerplate filtering: a word 5-gram that appears in
    >= 3 DISTINCT documents is boilerplate (navigation chrome, legal
    footers, templated text); each document reports its boilerplate
    gram fraction and a keep flag (< 50% boilerplate).

    Plan shape: one explode + two shuffles — the gram
    document-frequency aggregation (map-side combinable: one row per
    distinct gram per partition) and the per-doc rollup. Grams hash
    to 64-bit (xxhash64) BEFORE the first exchange, so both shuffles
    and the boilerplate equi-join carry 8-byte keys instead of
    ~40-byte strings — the r6 docstring's 100 TB plan, now the
    implemented plan. A 64-bit collision would merge two grams'
    document frequencies (p ≈ n²/2⁶⁵; ~10⁻⁹ at 10⁹ distinct grams),
    an accepted trade at corpus scale — and deterministic, so the
    DuckDB oracle still matches value-for-value. At 100 TB also
    publish `bp` as a broadcast side table when the boilerplate set
    is small (it usually is — boilerplate is heavy-tailed). The keep
    flag is an exact integer comparison (n_bp*2 < n_grams) so both
    engines agree without float thresholds."""
    d = spread(load_table(spark, sf_dir, "documents"))
    # pre-projected token array: split() inside the transform lambda
    # is re-evaluated per gram index (O(len²) per doc; see
    # text_ngram_topk note)
    grams = F.expr(
        "CASE WHEN size(t) < 5 THEN array() "
        "ELSE transform(sequence(1, size(t) - 4), "
        "i -> concat_ws(' ', slice(t, i, 5))) END"
    )
    g = (
        d.select("doc_id", F.split("text", " ").alias("t"))
        .select("doc_id", F.explode(grams).alias("gram_s"))
        .select("doc_id", F.xxhash64("gram_s").alias("gram"))
    )
    bp = (
        g.groupBy("gram")
        .agg(F.countDistinct("doc_id").alias("df"))
        .filter(F.col("df") >= 3)
        .select("gram", F.lit(1).alias("is_bp"))
    )
    return (
        g.join(bp, "gram", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("is_bp"), F.lit(0))).alias("n_bp"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_bp",
            (F.col("n_bp").cast("double") / F.col("n_grams")).alias("bp_frac"),
            (F.col("n_bp") * 2 < F.col("n_grams")).alias("keep"),
        )
    )


@query(
    "bpe_merge_candidates",
    oracle="""
    WITH w AS (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS word FROM documents
    ),
    p AS (
      SELECT UNNEST(LIST_TRANSFORM(RANGE(1, LENGTH(word)),
                    i -> word[i:i+1])) AS pair
      FROM w WHERE LENGTH(word) >= 2
    )
    SELECT pair, COUNT(*) AS n
    FROM p GROUP BY pair
    ORDER BY n DESC, pair
    LIMIT 20
    """,
)
def bpe_merge_candidates(spark, sf_dir):
    """One real BPE-training merge step: count adjacent character
    pairs across every word occurrence in the corpus and return the
    top-20 merge candidates — the statistic a tokenizer trainer
    computes per merge round (text_bpe_token_count only APPLIES a
    fixed pre-tokenizer; this produces the next merge).

    Plan shape: explode words, explode char bigrams, one map-side
    combinable hash aggregation, TakeOrderedAndProject for the top
     20 — no single-partition window, so one merge round scales to
    any corpus. (A full BPE trainer iterates this with the winning
    pair merged into the symbol stream; each round is this exact
    job over the rewritten symbols.) Ties break on the pair string
    for engine-exact ordering."""
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = F.expr(
        "CASE WHEN length(word) < 2 THEN array() "
        "ELSE transform(sequence(1, length(word) - 1), "
        "i -> substring(word, i, 2)) END"
    )
    return (
        d.select(F.explode(F.split("text", " ")).alias("word"))
        .select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.col("n").desc(), "pair")
        .limit(20)
    )


@query(
    "vocab_oov_rate",
    oracle="""
    WITH tok AS (
      SELECT lang, UNNEST(STRING_SPLIT(text, ' ')) AS term FROM documents
    ),
    vocab AS (
      SELECT term FROM (
        SELECT term, COUNT(*) AS c FROM tok
        GROUP BY term ORDER BY c DESC, term ASC LIMIT 12
      )
    ),
    j AS (
      SELECT t.lang,
             CASE WHEN v.term IS NULL THEN 1 ELSE 0 END AS oov
      FROM tok t LEFT JOIN vocab v ON v.term = t.term
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(oov) AS BIGINT) AS n_oov,
           CAST(SUM(oov) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
             AS oov_rate
    FROM j GROUP BY lang
    """,
)
def vocab_oov_rate(spark, sf_dir):
    """Tokenizer-vocabulary coverage check: build the top-k vocabulary
    by corpus frequency (deterministic tie-break: count desc, term
    asc) and measure the out-of-vocabulary token rate per language —
    the go/no-go metric before committing a tokenizer to a training
    run (a language with high OOV gets shredded into bytes and
    under-trains). k=12 fits the synthetic corpus's 31-term
    vocabulary; production k is 30k-100k and changes nothing
    structurally.

    Scale shape: the vocab is a corpus-frequency top-k
    (TakeOrderedAndProject over a combinable count — never a global
    sort of the term table) and is broadcast to the token stream, so
    the coverage pass is map-side; the per-lang rollup ships three
    counters per language. The single bigint/bigint division happens
    once per output row, keeping the double exact for the oracle
    compare. The token stream is persisted across its two uses
    (vocab build + coverage scan) rather than re-exploded.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    tok = scoped_persist(
        d.select("lang", F.explode(F.split("text", " ")).alias("term"))
    )
    vocab = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
        .orderBy(F.col("c").desc(), F.col("term").asc())
        .limit(12)
        .select("term", F.lit(1).alias("in_vocab"))
    )
    j = tok.join(F.broadcast(vocab), "term", "left")
    oov = F.when(F.col("in_vocab").isNull(), 1).otherwise(0)
    return j.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(oov).cast("bigint").alias("n_oov"),
        (
            F.sum(oov).cast("double") / F.count(F.lit(1)).cast("double")
        ).alias("oov_rate"),
    )


@query(
    "lang_id_confusion",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, lang, STRING_SPLIT(text, ' ') AS toks FROM documents
      WHERE text IS NOT NULL
    ),
    p AS (
      SELECT lang,
             CASE WHEN CAST(LEN(LIST_FILTER(toks, x -> x IN {_SW_SQL}))
                       AS DOUBLE) / LEN(toks) >= 0.02
                  THEN 'en' ELSE 'und' END AS pred_lang
      FROM t
    )
    SELECT lang, pred_lang, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM p GROUP BY lang, pred_lang
    """,
)
def lang_id_confusion(spark, sf_dir):
    """Language-ID confusion matrix: stored `lang` tag × predicted
    label, the eval table every lang-ID deployment reports before the
    classifier gates a corpus. Reuses text_lang_id_score's
    deterministic predictor; output is |langs| × |preds| rows.

    Scale shape: one map-side predictor expression + one combinable
    count aggregation — the matrix stays tiny at any corpus size.
    """
    d = spread(load_table(spark, sf_dir, "documents"))
    toks = F.split("text", " ")
    sw = F.array([F.lit(s) for s in _STOPWORDS])
    score = F.size(F.filter(toks, lambda x: F.array_contains(sw, x))).cast(
        "double"
    ) / F.size(toks)
    pred = F.when(score >= 0.02, F.lit("en")).otherwise(F.lit("und"))
    # NULL-text pin (ADVICE r08 class): Spark's size(split(NULL)) is
    # -1, scoring (-1)/(-1)=1.0 -> 'en'; DuckDB's NULL score falls to
    # the CASE ELSE -> 'und'. Drop NULL texts on BOTH sides.
    return (
        d.filter(F.col("text").isNotNull())
        .select("lang", pred.alias("pred_lang"))
        .groupBy("lang", "pred_lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    )
