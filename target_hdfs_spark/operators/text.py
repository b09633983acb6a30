"""Text-analysis operators for LLM-corpus pipelines (SURVEY.md §2B.2
L4/L6): token statistics, language-ID heuristic, quality scoring and
filtering, document fingerprinting, n-gram statistics. All pure
JVM-side column expressions (no Python in the hot path) and all
exactly oracle-checkable — counts are integers, ratios are single
double divisions of integers, hashes use the portable md5 family.
"""

from __future__ import annotations

import pandas as pd  # noqa: F401  (pandas_udf type-hint resolution)
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from target_hdfs_spark.functions.hashing import (
    MERSENNE_P,
    hash_coeffs,
    md5_hash32,
    md5_hash32_sql,
)
from target_hdfs_spark.functions.textfuncs import TOKENS_SQL, tokens
from target_hdfs_spark.operators.prefix import banded_cumsum
from target_hdfs_spark.registry import query
from target_hdfs_spark.sources.readers import fan_out, load_table

_TOK = TOKENS_SQL.format(expr="text")

# Tiny per-language marker-token lists for the lang-ID heuristic. The
# mechanism (vote counting + deterministic argmax) is the operator; on
# real corpora these lists are the top-N stopwords per language.
_LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "value", "row"),
    "es": ("el", "la", "de", "y", "valor", "fila"),
    "fr": ("le", "la", "de", "et", "valeur", "ligne"),
    "de": ("der", "die", "das", "und", "wert", "zeile"),
}


# ---------------------------------------------------------------------------
# L4a: corpus token statistics by language/source
# ---------------------------------------------------------------------------


@query(
    "q50_token_stats",
    oracle=f"""
    SELECT lang, source,
           COUNT(*) AS n_docs,
           CAST(SUM(len({_TOK})) AS BIGINT) AS total_tokens,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars,
           CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
    FROM documents
    GROUP BY lang, source
    """,
    tags=("text", "agg"),
)
def q50_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus shape by (lang, source): doc counts, token totals,
    char-length stats. Integer sums -> exact; avg is one double
    division at the end."""
    docs = load_table(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(tokens("text"))).alias("total_tokens"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
        (F.sum("n_chars").cast("double") / F.count(F.lit(1))).alias("avg_chars"),
    )


# ---------------------------------------------------------------------------
# L4b: per-token frequency (the explode path at corpus scale)
# ---------------------------------------------------------------------------


@query(
    "q51_token_frequencies",
    oracle=f"""
    SELECT token, COUNT(*) AS tf, COUNT(DISTINCT doc_id) AS df
    FROM (SELECT doc_id, unnest({_TOK}) AS token FROM documents)
    GROUP BY token
    """,
    tags=("text", "explode", "agg"),
)
def q51_token_frequencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Term frequency + document frequency per token — the building
    block for TF-IDF and vocabulary pruning.

    Scale: explode is pipelined; tf combines map-side; df is the
    distinct-heavy part (Spark expands (token, doc_id) once).
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    return tok.groupBy("token").agg(
        F.count(F.lit(1)).alias("tf"),
        F.count_distinct("doc_id").alias("df"),
    )


# ---------------------------------------------------------------------------
# L4c: TF-IDF (SQL-expressible doc-frequency join formulation)
# ---------------------------------------------------------------------------


@query(
    "q52_tfidf",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
    tf AS (SELECT doc_id, token, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
    df AS (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT tf.doc_id, tf.token, tf.tf, df.df,
           CAST(tf.tf AS DOUBLE) * (1.0 + n.n_docs) / (1.0 + df.df) AS tfidf
    FROM tf JOIN df USING (token) CROSS JOIN n
    WHERE df.df >= 50
    """,
    tags=("text", "tfidf", "join"),
)
def q52_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF via the doc-frequency join, with a *rational* idf
    (tf * (1+N)/(1+df)) instead of the usual log-idf: the ranking is
    order-equivalent (x -> ln is monotone) and the arithmetic is three
    exact integer-derived doubles — JVM Math.log and libm log disagree
    in the last ulp, so transcendentals are banned from checkable
    outputs engine-wide.

    Scale: two shuffles (tf, df) + a broadcast of the df table; the
    corpus-size scalar is a literal cross join, not a collect.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = tok.groupBy("doc_id", "token").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("token").agg(F.count_distinct("doc_id").alias("df"))
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    return (
        tf.join(F.broadcast(df.filter(F.col("df") >= 50)), "token")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                F.col("tf").cast("double")
                * (F.lit(1.0) + F.col("n_docs"))
                / (F.lit(1.0) + F.col("df"))
            ).alias("tfidf"),
        )
    )


# ---------------------------------------------------------------------------
# L4d: language-ID heuristic (marker-token voting)
# ---------------------------------------------------------------------------


def _score_sql(lang: str) -> str:
    markers = ", ".join(f"'{m}'" for m in _LANG_MARKERS[lang])
    return f"len(list_filter({_TOK}, x -> x IN ({markers})))"


@query(
    "q53_lang_id",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS actual_lang,
             {", ".join(f"{_score_sql(lang)} AS score_{lang}" for lang in _LANG_MARKERS)}
      FROM documents
    )
    SELECT doc_id, actual_lang,
      CASE
        WHEN score_en = 0 AND score_es = 0 AND score_fr = 0 AND score_de = 0 THEN 'unknown'
        WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
        WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
        WHEN score_fr >= score_de THEN 'fr'
        ELSE 'de'
      END AS predicted_lang
    FROM scored
    """,
    tags=("text", "langid"),
)
def q53_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-ID heuristic: marker-token votes per language,
    deterministic priority-ordered argmax. Scan-side array expressions
    only — at 100 TB this is a free pass over the corpus."""
    # bind tokens once: each score re-uses the materialized array
    # instead of re-tokenizing per language (see shingles() contract)
    with_toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens("text").alias("_toks")
    )

    def _is_marker(ms: tuple[str, ...]):
        # closure factory — a default-arg lambda would become a
        # two-parameter (element, index) array lambda
        return lambda x: x.isin(list(ms))

    scores = {
        lang: F.size(F.filter(F.col("_toks"), _is_marker(ms)))
        for lang, ms in _LANG_MARKERS.items()
    }
    scored = with_toks.select(
        "doc_id",
        F.col("lang").alias("actual_lang"),
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
    )
    s = {lang: F.col(f"score_{lang}") for lang in _LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] == 0) & (s["es"] == 0) & (s["fr"] == 0) & (s["de"] == 0),
            "unknown",
        )
        .when(
            (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]), "en"
        )
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]), "es")
        .when(s["fr"] >= s["de"], "fr")
        .otherwise("de")
    )
    return scored.select("doc_id", "actual_lang", predicted.alias("predicted_lang"))


# ---------------------------------------------------------------------------
# L6: quality scoring + filter
# ---------------------------------------------------------------------------


@query(
    "q54_quality_filter",
    oracle=f"""
    WITH m AS (
      SELECT doc_id, lang, n_chars,
             len({_TOK}) AS n_tokens,
             len(list_distinct({_TOK})) AS n_unique_tokens
      FROM documents
    )
    SELECT doc_id, lang, n_chars, n_tokens, n_unique_tokens,
           CAST(n_unique_tokens AS DOUBLE) / n_tokens AS unique_ratio,
           CAST(n_chars AS DOUBLE) / n_tokens AS avg_token_len
    FROM m
    WHERE n_tokens >= 20
      AND n_chars BETWEEN 100 AND 10000
      AND CAST(n_unique_tokens AS DOUBLE) / n_tokens >= 0.2
    """,
    tags=("text", "quality", "filter"),
)
def q54_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LLM-corpus quality gate: length bounds, minimum token count,
    minimum unique-token ratio (the classic repetition filter).
    Integer counts + single double divisions -> exact.

    Scale: pure scan-side filter — no shuffle at all; this is the
    first pass that typically drops half the raw corpus.
    """
    docs = load_table(spark, sf_dir, "documents")
    m = docs.select(
        "doc_id", "lang", "n_chars", tokens("text").alias("_toks")
    ).select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.col("_toks")).alias("n_tokens"),
        F.size(F.array_distinct(F.col("_toks"))).alias("n_unique_tokens"),
    )
    unique_ratio = F.col("n_unique_tokens").cast("double") / F.col("n_tokens")
    return (
        m.select(
            "doc_id",
            "lang",
            "n_chars",
            "n_tokens",
            "n_unique_tokens",
            unique_ratio.alias("unique_ratio"),
            (F.col("n_chars").cast("double") / F.col("n_tokens")).alias("avg_token_len"),
        )
        .filter(
            (F.col("n_tokens") >= 20)
            & (F.col("n_chars").between(100, 10000))
            & (F.col("unique_ratio") >= 0.2)
        )
    )


# ---------------------------------------------------------------------------
# L4e: document fingerprint (rolling polynomial hash)
# ---------------------------------------------------------------------------


@query(
    "q55_fingerprint",
    oracle=f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform({_TOK}, t -> {md5_hash32_sql('t')})),
             (acc, x) -> (acc * 31 + x) % {MERSENNE_P}
           ) AS fingerprint
    FROM documents
    """,
    tags=("text", "fingerprint"),
)
def q55_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive document fingerprint: left-fold rolling
    polynomial hash over token hashes (same fold, same modulus on both
    engines -> exact). Unlike content-hash dedup this is stable under
    whitespace normalization."""
    docs = load_table(spark, sf_dir, "documents")
    fp = F.aggregate(
        F.transform(tokens("text"), md5_hash32),
        F.lit(0).cast("bigint"),
        lambda acc, x: (acc * 31 + x) % MERSENNE_P,
    )
    return docs.select("doc_id", fp.alias("fingerprint"))


# ---------------------------------------------------------------------------
# L4f: word-bigram statistics
# ---------------------------------------------------------------------------


@query(
    "q56_bigram_counts",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
    bg AS (
      SELECT unnest(
        CASE WHEN len(ts) >= 2 THEN
          list_transform(generate_series(1, len(ts) - 1),
                         i -> array_to_string(ts[i:i+1], ' '))
        ELSE [] END
      ) AS bigram
      FROM tok
    )
    SELECT bigram, COUNT(*) AS n
    FROM bg
    GROUP BY bigram
    HAVING COUNT(*) >= 5
    """,
    tags=("text", "ngram"),
)
def q56_bigram_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Word-bigram frequencies (>= 5 occurrences) — n-gram language
    statistics over the corpus, built from the shared shingling
    primitive."""
    with_toks = load_table(spark, sf_dir, "documents").select(
        tokens("text").alias("_toks")
    )
    tok = F.col("_toks")
    bigrams = F.when(
        F.size(tok) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tok) - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(tok, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        with_toks.select(F.explode(bigrams).alias("bigram"))
        .groupBy("bigram")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= 5)
    )


# ---------------------------------------------------------------------------
# L4g: document chunking (fixed-size token windows with overlap) — the
# operator every LLM training/RAG pipeline runs over the whole corpus
# ---------------------------------------------------------------------------

_CHUNK = 64
_STRIDE = 48  # 16-token overlap


@query(
    "q57_document_chunks",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
    chunks AS (
      SELECT doc_id,
             unnest(
               CASE WHEN len(ts) <= {_CHUNK}
                 THEN [array_to_string(ts, ' ')]
                 ELSE list_transform(
                   generate_series(0, CAST(ceil((len(ts) - {_CHUNK})
                                              / {_STRIDE}.0) AS BIGINT)),
                   i -> array_to_string(ts[(i * {_STRIDE} + 1):(i * {_STRIDE} + {_CHUNK})], ' '))
               END
             ) AS chunk_text,
             generate_subscripts(
               CASE WHEN len(ts) <= {_CHUNK}
                 THEN [array_to_string(ts, ' ')]
                 ELSE list_transform(
                   generate_series(0, CAST(ceil((len(ts) - {_CHUNK})
                                              / {_STRIDE}.0) AS BIGINT)),
                   i -> array_to_string(ts[(i * {_STRIDE} + 1):(i * {_STRIDE} + {_CHUNK})], ' '))
               END, 1
             ) - 1 AS chunk_idx
      FROM tok
    )
    SELECT doc_id, CAST(chunk_idx AS INT) AS chunk_idx, chunk_text,
           len(string_split(chunk_text, ' ')) AS n_tokens
    FROM chunks
    """,
    tags=("text", "chunking", "llm"),
)
def q57_document_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window document chunking: {_CHUNK}-token chunks with
    {_CHUNK - _STRIDE}-token overlap (stride {_STRIDE}); short docs
    yield one whole-doc chunk. The tokenizer-agnostic shape of
    training-corpus and RAG-index construction.

    Scale: pure scan-side array expressions + one explode — linear,
    shuffle-free; chunk boundaries are deterministic functions of the
    token array, so resharding the corpus cannot change the output.
    """
    with_toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", tokens("text").alias("_toks")
    )
    ts = F.col("_toks")
    n_chunks_tail = F.ceil(
        (F.size(ts) - F.lit(_CHUNK)) / F.lit(float(_STRIDE))
    ).cast("int")
    chunk_arr = F.when(
        F.size(ts) <= _CHUNK, F.array(F.concat_ws(" ", ts))
    ).otherwise(
        F.transform(
            F.sequence(F.lit(0), n_chunks_tail),
            lambda i: F.concat_ws(" ", F.slice(ts, i * _STRIDE + 1, _CHUNK)),
        )
    )
    return (
        with_toks.select("doc_id", F.posexplode(chunk_arr).alias("chunk_idx", "chunk_text"))
        .select(
            "doc_id",
            "chunk_idx",
            "chunk_text",
            F.size(F.split("chunk_text", " ")).alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# L6b: PII-style redaction (regex scrubbing pass)
# ---------------------------------------------------------------------------


@query(
    "q58_redacted_documents",
    oracle="""
    SELECT doc_id,
           regexp_replace(
             regexp_replace(text, '[0-9][0-9]+', '<NUM>', 'g'),
             'value', '<VAL>', 'g'
           ) AS redacted,
           len(regexp_extract_all(text, '[0-9][0-9]+')) AS n_num_hits
    FROM documents
    WHERE doc_id < 200
    """,
    tags=("text", "redaction", "llm"),
)
def q58_redacted_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus scrubbing pass: global regex replacement of sensitive
    patterns (multi-digit numbers, a term blacklist) plus a hit count
    for auditing. Patterns are kept to the regex subset with identical
    semantics in Java regex and RE2 (no lookaround, no backrefs).

    Scale: scan-side regexp_replace chain, shuffle-free; at 100 TB
    this is one linear pass fused into whatever else reads the corpus.
    """
    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), "[0-9][0-9]+", "<NUM>"),
        "value",
        "<VAL>",
    )
    return docs.select(
        "doc_id",
        redacted.alias("redacted"),
        F.size(F.regexp_extract_all(F.col("text"), F.lit("[0-9][0-9]+"))).alias(
            "n_num_hits"
        ),
    )


# ---------------------------------------------------------------------------
# L4h: Unicode normalization (NFC + accent folding) — the text-prep
# pass multilingual corpora need before hashing/dedup
# ---------------------------------------------------------------------------

# deterministic non-ASCII suffix so the operator has real work on this
# ASCII corpus: decomposed e+accent, precomposed é, ß, CJK, ligature
_UNI_SUFFIX = " café café straße 中文 ﬁne"


@query(
    "q59_unicode_normalize",
    oracle=f"""
    SELECT doc_id,
           nfc_normalize(text || '{_UNI_SUFFIX}') AS nfc_text,
           strip_accents(nfc_normalize(text || '{_UNI_SUFFIX}')) AS folded_text,
           length(nfc_normalize(text || '{_UNI_SUFFIX}')) AS n_chars_nfc
    FROM documents
    WHERE doc_id < 100
    """,
    tags=("text", "unicode", "udf"),
)
def q59_unicode_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC normalization + accent folding via an Arrow
    pandas_udf over Python's unicodedata — value-checked against
    DuckDB's native nfc_normalize/strip_accents (both implement the
    Unicode standard, so a *Python* UDF still gets an exact oracle).
    A deterministic non-ASCII suffix gives the operator real
    decomposed/precomposed/ligature cases on this ASCII corpus.

    Scale: Arrow-batched, map-only — the canonical text-prep pass
    before any hashing/dedup so visually-identical strings collide.
    """
    import unicodedata

    from pyspark.sql.functions import pandas_udf

    @pandas_udf("string")
    def nfc(s: "pd.Series") -> "pd.Series":
        return s.map(lambda x: unicodedata.normalize("NFC", x))

    @pandas_udf("string")
    def fold_accents(s: "pd.Series") -> "pd.Series":
        def fold(x: str) -> str:
            return "".join(
                c for c in unicodedata.normalize("NFD", x)
                if not unicodedata.combining(c)
            )
        # NFC at the end: strip_accents returns recomposed text
        return s.map(lambda x: unicodedata.normalize("NFC", fold(x)))

    docs = load_table(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    with_suffix = F.concat(F.col("text"), F.lit(_UNI_SUFFIX))
    return docs.select(
        "doc_id",
        nfc(with_suffix).alias("nfc_text"),
        fold_accents(nfc(with_suffix)).alias("folded_text"),
        F.length(nfc(with_suffix)).alias("n_chars_nfc"),
    )


# ---------------------------------------------------------------------------
# Deterministic hash-based dataset splitting — the reproducible
# train/val/test split every training-data build needs (seeded
# sample() is partition-order-dependent and engine-specific; a
# content-hash bucket is stable across engines, reruns, and cluster
# layouts, and new data lands in splits without reshuffling old rows)
# ---------------------------------------------------------------------------


@query(
    "q100_hash_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, lang, n_chars,
             {md5_hash32_sql("'split:' || CAST(doc_id AS VARCHAR)")} % 100 AS bucket
      FROM documents
    ),
    s AS (
      SELECT *,
             CASE WHEN bucket < 80 THEN 'train'
                  WHEN bucket < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM b
    )
    SELECT split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           MIN(doc_id) AS min_doc_id,
           MAX(doc_id) AS max_doc_id
    FROM s
    GROUP BY split
    """,
    tags=("sample", "split", "hash"),
)
def q100_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """80/10/10 train/val/test split by md5 bucket of a salted doc key.

    Why a hash split and not sample(): the assignment is a pure
    function of the row's identity — identical on every engine, every
    rerun, every partitioning, and stable as the corpus grows (new
    docs never move old docs between splits). The salt prefix
    decorrelates this split from any other hash use of doc_id.

    Scale: the bucket is a scan-side expression (no shuffle to assign);
    the summary is one hash aggregate.
    """
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        md5_hash32(F.concat(F.lit("split:"), F.col("doc_id").cast("string"))) % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return (
        docs.select("doc_id", "n_chars", split.alias("split"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("total_chars"),
            F.min("doc_id").alias("min_doc_id"),
            F.max("doc_id").alias("max_doc_id"),
        )
    )


# ---------------------------------------------------------------------------
# L4h: sub-word (BPE-ish) token counting — tokenizer fertility metrics
# ---------------------------------------------------------------------------

# Class-only pattern (letter runs | digit runs | single symbol) keeps
# Java-regex and RE2 semantics identical; it is the skeleton of the
# GPT-2 pre-tokenizer with the lookahead/contraction cases removed
# (those are not portable across regex engines).
_SUBTOK_RE = "[a-z]+|[0-9]+|[^a-z0-9 ]"


@query(
    "q110_subword_token_counts",
    oracle=f"""
    SELECT doc_id,
           CAST(len({_TOK}) AS BIGINT) AS n_ws_tokens,
           CAST(len(regexp_extract_all(lower(trim(text)), '{_SUBTOK_RE}'))
                AS BIGINT) AS n_sub_tokens,
           CAST(len(regexp_extract_all(lower(trim(text)), '{_SUBTOK_RE}'))
                AS DOUBLE) / len({_TOK}) AS fertility
    FROM documents
    WHERE len({_TOK}) > 0
    """,
    tags=("text", "tokenize"),
)
def q110_subword_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting with BOTH tokenizers the mandate names:
    whitespace words and a BPE-ish regex sub-word pass; fertility =
    sub-tokens per word (the standard tokenizer-cost metric used to
    budget training compute). Map-side regex only, no shuffle."""
    docs = load_table(spark, sf_dir, "documents")
    lowered = F.lower(F.trim(F.col("text")))
    n_ws = F.size(tokens("text")).cast("bigint")
    n_sub = F.size(
        F.regexp_extract_all(lowered, F.lit(_SUBTOK_RE), 0)
    ).cast("bigint")
    # Two-stage select so the regex pass and the tokenizer run once
    # per row (both feed two output columns; see q103 for the
    # interpreted-projection recompute note).
    staged = docs.where(F.size(tokens("text")) > 0).select(
        "doc_id",
        n_ws.alias("n_ws_tokens"),
        n_sub.alias("n_sub_tokens"),
    )
    return staged.select(
        "doc_id",
        "n_ws_tokens",
        "n_sub_tokens",
        (
            F.col("n_sub_tokens").cast("double") / F.col("n_ws_tokens")
        ).alias("fertility"),
    )


# ---------------------------------------------------------------------------
# L4i: out-of-vocabulary rate against a corpus-derived top-K vocabulary
# ---------------------------------------------------------------------------

_VOCAB_K = 20


@query(
    "q111_oov_rate",
    oracle=f"""
    WITH tf AS (
      SELECT token, COUNT(*) AS tf
      FROM (SELECT unnest({_TOK}) AS token FROM documents)
      GROUP BY token
    ),
    vocab AS (
      SELECT token FROM tf
      ORDER BY tf DESC, token
      LIMIT {_VOCAB_K}
    ),
    doc_tokens AS (
      SELECT doc_id, unnest({_TOK}) AS token FROM documents
    )
    SELECT doc_id,
           COUNT(*) AS n_tokens,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS BIGINT)
             AS n_oov,
           CAST(SUM(CASE WHEN v.token IS NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS oov_rate
    FROM doc_tokens d LEFT JOIN vocab v ON d.token = v.token
    GROUP BY doc_id
    """,
    tags=("text", "quality", "join"),
)
def q111_oov_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per document against the corpus's own
    top-K token vocabulary (ties broken lexicographically — exact).
    The two-phase shape is the scale pattern: the vocabulary is a
    corpus-wide aggregate that collapses to K rows, broadcast back
    into a map-side membership probe; only the tiny vocab and the
    per-doc aggregation shuffle."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    toks = fan_out(docs, "doc_id").select(
        "doc_id", F.explode(tokens("text")).alias("token")
    )
    vocab = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("tf"))
        .orderBy(F.col("tf").desc(), "token")
        .limit(_VOCAB_K)
        .select("token", F.lit(1).alias("_in_vocab"))
    )
    joined = toks.join(F.broadcast(vocab), "token", "left")
    oov = F.sum(F.when(F.col("_in_vocab").isNull(), 1).otherwise(0))
    return joined.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        oov.cast("bigint").alias("n_oov"),
        (oov.cast("double") / F.count(F.lit(1))).alias("oov_rate"),
    )


# ---------------------------------------------------------------------------
# L6c: per-source calibrated quality gate — percentile thresholds, not
# absolute ones (each source has its own score distribution; a global
# cutoff over- or under-prunes whole sources)
# ---------------------------------------------------------------------------


@query(
    "q117_quality_percentile_filter",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, source,
             CAST(len(list_distinct({_TOK})) AS DOUBLE) / len({_TOK}) AS uniq_ratio
      FROM documents
      WHERE len({_TOK}) > 0
    )
    SELECT doc_id, source, uniq_ratio,
           PERCENT_RANK() OVER (PARTITION BY source ORDER BY uniq_ratio, doc_id)
             AS pct_rank,
           (PERCENT_RANK() OVER (PARTITION BY source ORDER BY uniq_ratio, doc_id)
             >= 0.5) AS selected
    FROM scored
    """,
    tags=("text", "quality", "window"),
)
def q117_quality_percentile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-calibrated quality gate: score every document
    (unique-token ratio), rank it WITHIN its source with percent_rank,
    and select the top half of each source — the per-source percentile
    thresholding real pipelines use because score distributions differ
    by source (a global cutoff would drop whole domains). Tie-break on
    doc_id keeps the rank — hence the selection — deterministic.

    Exactness: uniq_ratio is one double division of integers and
    percent_rank is (rank-1)/(n-1), both computed identically by the
    two engines.

    Scale shape: one hash partition on source + per-partition sort; no
    global sort. Skew note: sources are size-bounded corpus domains;
    for a pathological mega-source, swap percent_rank for an
    approx-quantile threshold join (same selection semantics, no
    per-source sort).
    """
    docs = load_table(spark, sf_dir, "documents")
    toks = tokens("text")
    scored = docs.where(F.size(toks) > 0).select(
        "doc_id",
        "source",
        (
            F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
        ).alias("uniq_ratio"),
    )
    from pyspark.sql import Window

    w = Window.partitionBy("source").orderBy("uniq_ratio", "doc_id")
    pct = F.percent_rank().over(w)
    return scored.select(
        "doc_id",
        "source",
        "uniq_ratio",
        pct.alias("pct_rank"),
        (pct >= 0.5).alias("selected"),
    )


# ---------------------------------------------------------------------------
# L4/L6: unigram-LM quality score (model-based quality signal)
# ---------------------------------------------------------------------------


@query(
    "q119_unigram_lm_quality",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
    cf AS (SELECT token, COUNT(*) AS cf FROM tok GROUP BY 1),
    n AS (SELECT COUNT(*) AS n_tok FROM tok)
    SELECT tok.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(cf.cf) AS DOUBLE) / (n.n_tok * COUNT(*)) AS avg_tok_prob,
           MIN(CAST(cf.cf AS DOUBLE) / n.n_tok) AS min_tok_prob
    FROM tok JOIN cf USING (token) CROSS JOIN n
    GROUP BY tok.doc_id, n.n_tok
    """,
    tags=("text", "quality", "lm"),
)
def q119_unigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based document quality: score each document under the
    corpus's own unigram language model — the mean and minimum corpus
    probability of its tokens. Gibberish / OOV-heavy documents score
    low on both; boilerplate scores high. This is the SQL-expressible
    core of perplexity filtering (CCNet-style): the mean is arithmetic
    rather than geometric because transcendentals (ln) are banned from
    checkable outputs engine-wide (q52's rationale) — the ranking
    signal is the same rare-token sensitivity.

    Scale: one explode + two token-keyed shuffles (corpus frequency,
    per-doc aggregate); the corpus token total rides as a broadcast
    scalar, never a collect.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    cf = tok.groupBy("token").agg(F.count(F.lit(1)).alias("cf"))
    n = tok.agg(F.count(F.lit(1)).alias("n_tok"))
    prob = F.col("cf").cast("double") / F.col("n_tok")
    return (
        tok.join(cf, "token")
        .crossJoin(F.broadcast(n))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            # mean prob as a ratio of EXACT integer sums — avg(double)
            # is summation-order-dependent and engines partial-agg in
            # different orders, so the naive AVG can drift an ulp
            (
                F.sum("cf").cast("double")
                / (F.first("n_tok") * F.count(F.lit(1)))
            ).alias("avg_tok_prob"),
            F.min(prob).alias("min_tok_prob"),
        )
    )


# ---------------------------------------------------------------------------
# L4j: inverted-index construction (block-sharded posting lists)
# ---------------------------------------------------------------------------


@query(
    "q125_inverted_index",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
    tfd AS (
      SELECT token, doc_id, doc_id % 8 AS block, COUNT(*) AS tf
      FROM tok GROUP BY 1, 2, 3
    )
    SELECT token, block,
           COUNT(*) AS df_block,
           CAST(SUM(tf) AS BIGINT) AS tf_block,
           md5(array_to_string(list_sort(list(doc_id)), ',')) AS posting_md5
    FROM tfd
    GROUP BY token, block
    """,
    tags=("text", "index", "skew"),
)
def q125_inverted_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inverted-index construction with BLOCK-SHARDED posting lists:
    every (token, doc_id % 8) shard aggregates its documents into a
    posting fingerprint (md5 over the sorted doc_id list) plus
    document/term frequencies. The fingerprint makes the posting list
    itself value-checkable against the oracle without emitting array
    cells (a driver-canonicalizer hazard).

    Scale: a naive token-keyed index is the textbook skew bomb — a
    stopword's posting list lands on ONE reducer ('the' at 100 TB is
    billions of entries). Sharding the aggregation key to
    (token, doc_id % B) bounds every reducer at 1/B of the hottest
    token and is exactly how production inverted indexes shard long
    posting lists; readers merge the B sorted blocks. Both shuffles
    combine map-side, and collect_list only ever sees one block.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tfd = tok.groupBy("token", "doc_id").agg(F.count(F.lit(1)).alias("tf"))
    return (
        tfd.withColumn("block", F.col("doc_id") % 8)
        .groupBy("token", "block")
        .agg(
            F.count(F.lit(1)).alias("df_block"),
            F.sum("tf").alias("tf_block"),
            F.md5(
                F.concat_ws(
                    ",",
                    F.transform(
                        F.sort_array(F.collect_list("doc_id")),
                        lambda d: d.cast("string"),
                    ),
                )
            ).alias("posting_md5"),
        )
    )


# ---------------------------------------------------------------------------
# L4k: BM25 ranked retrieval — the scoring half of the inverted index
# (q125 builds the index; this runs the classic probabilistic ranking
# over it). Every RAG / retrieval pipeline's baseline ranker.
# ---------------------------------------------------------------------------

_BM25_TERMS = ("merge", "window", "stream", "vector")
_BM25_TOPK = 20
# k1 = 1.2, b = 0.75 (the standard Robertson defaults). The idf is the
# RATIONAL Robertson form (N - df + 0.5)/(df + 0.5) WITHOUT the log:
# ln is monotone, so per-term ranking is order-equivalent, and
# transcendentals are banned from checkable outputs engine-wide (q52's
# rationale). All remaining arithmetic is correctly-rounded IEEE ops
# on integer-derived doubles evaluated in one FIXED expression order
# on both engines, so the scores are bit-identical.


def _bm25_score_sql(t: str) -> str:
    # numeric literals are CAST to DOUBLE: DuckDB types a bare `2.2`
    # as DECIMAL and would evaluate `tf * 2.2` exactly where Spark
    # rounds the double product — a 1-ulp divergence.
    idf = (
        f"((n_docs - df_{t}) + CAST(0.5 AS DOUBLE)) / (df_{t} + CAST(0.5 AS DOUBLE))"
    )
    denom = (
        f"tf_{t} + CAST(1.2 AS DOUBLE) * (CAST(0.25 AS DOUBLE) + "
        f"(CAST(0.75 AS DOUBLE) * dl) / avgdl)"
    )
    return (
        f"CASE WHEN tf_{t} > 0 THEN ({idf}) * (tf_{t} * CAST(2.2 AS DOUBLE)) "
        f"/ ({denom}) ELSE CAST(0.0 AS DOUBLE) END"
    )


@query(
    "q129_bm25_topk",
    oracle=f"""
    WITH tok AS (SELECT doc_id, unnest({_TOK}) AS token FROM documents),
    tf AS (
      SELECT doc_id, token, COUNT(*) AS tf FROM tok
      WHERE token IN ({", ".join(f"'{t}'" for t in _BM25_TERMS)})
      GROUP BY 1, 2
    ),
    pvt AS (
      SELECT doc_id,
             {", ".join(
                 f"COALESCE(MAX(CASE WHEN token = '{t}' THEN tf END), 0) AS tf_{t}"
                 for t in _BM25_TERMS)}
      FROM tf GROUP BY doc_id
    ),
    dfs AS (
      SELECT {", ".join(
          f"COALESCE(MAX(CASE WHEN token = '{t}' THEN df END), 0) AS df_{t}"
          for t in _BM25_TERMS)}
      FROM (SELECT token, COUNT(DISTINCT doc_id) AS df FROM tf GROUP BY 1)
    ),
    stats AS (
      SELECT COUNT(*) AS n_docs,
             CAST(SUM(len({_TOK})) AS DOUBLE) / COUNT(*) AS avgdl
      FROM documents
    ),
    scored AS (
      SELECT p.doc_id, {", ".join(f"p.tf_{t}" for t in _BM25_TERMS)},
             len(d.ts) AS dl,
             {" + ".join(f"({_bm25_score_sql(t)})" for t in _BM25_TERMS)}
               AS bm25
      FROM pvt p
      JOIN (SELECT doc_id, {_TOK} AS ts FROM documents) d USING (doc_id)
      CROSS JOIN dfs CROSS JOIN stats
    )
    SELECT doc_id, {", ".join(f"tf_{t}" for t in _BM25_TERMS)}, dl, bm25, rn
    FROM (
      SELECT *, row_number() OVER (ORDER BY bm25 DESC, doc_id) AS rn
      FROM scored
    )
    WHERE rn <= {_BM25_TOPK}
    """,
    tags=("text", "retrieval", "bm25", "topk"),
)
def q129_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 ranked retrieval for a fixed 4-term query: per-document
    term frequencies pivot to one row per matching document, document
    frequencies and corpus stats ride along as broadcast single-row
    frames, and the score is the standard k1/b-saturated BM25 sum
    (rational idf — see note above on transcendentals). Top-20 by
    score with doc_id tiebreak.

    Scale: the posting scan touches only documents containing a query
    term (inner join on the tf table — at 100 TB this is the q125
    index's posting lists for 4 terms, not a corpus scan); the
    per-term pivot is a conditional aggregate (one shuffle, map-side
    combined); df and corpus stats are scalar broadcasts; the final
    top-k is TakeOrderedAndProject, never a global sort. The per-term
    score sum is a FIXED-ORDER expression (s_t1 + s_t2 + ...), not a
    SUM over rows — double addition is not associative, so an
    order-unspecified aggregation would not be bit-reproducible.
    """
    docs = load_table(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    tf = (
        tok.filter(F.col("token").isin(*_BM25_TERMS))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    pvt = tf.groupBy("doc_id").agg(
        *[
            F.coalesce(
                F.max(F.when(F.col("token") == t, F.col("tf"))), F.lit(0).cast("long")
            ).alias(f"tf_{t}")
            for t in _BM25_TERMS
        ]
    )
    dfs = (
        tf.groupBy("token")
        .agg(F.count_distinct("doc_id").alias("df"))
        .groupBy()
        .agg(
            *[
                F.coalesce(
                    F.max(F.when(F.col("token") == t, F.col("df"))),
                    F.lit(0).cast("long"),
                ).alias(f"df_{t}")
                for t in _BM25_TERMS
            ]
        )
    )
    stats = docs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(tokens("text"))).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    dl = docs.select(
        "doc_id", F.size(tokens("text")).cast("long").alias("dl")
    )

    def score(t: str):
        tf_t = F.col(f"tf_{t}")
        idf = ((F.col("n_docs") - F.col(f"df_{t}")) + F.lit(0.5)) / (
            F.col(f"df_{t}") + F.lit(0.5)
        )
        denom = tf_t + F.lit(1.2) * (
            F.lit(0.25) + (F.lit(0.75) * F.col("dl")) / F.col("avgdl")
        )
        return F.when(tf_t > 0, idf * (tf_t * F.lit(2.2)) / denom).otherwise(
            F.lit(0.0)
        )

    scored = (
        pvt.join(dl, "doc_id")
        .crossJoin(F.broadcast(dfs))
        .crossJoin(F.broadcast(stats))
        .select(
            "doc_id",
            *[f"tf_{t}" for t in _BM25_TERMS],
            "dl",
            sum(
                (score(t) for t in _BM25_TERMS[1:]), start=score(_BM25_TERMS[0])
            ).alias("bm25"),
        )
    )
    # orderBy+limit compiles to TakeOrderedAndProject (no global sort,
    # no single-partition window over the full match set); the rank
    # column is then a window over the surviving k rows only.
    top = scored.orderBy(F.col("bm25").desc(), F.col("doc_id")).limit(_BM25_TOPK)
    w = Window.orderBy(F.col("bm25").desc(), F.col("doc_id"))
    return top.withColumn("rn", F.row_number().over(w).cast("long"))


# ---------------------------------------------------------------------------
# Reciprocal-rank fusion (hybrid retrieval)
# ---------------------------------------------------------------------------

_RRF_K = 60  # the standard Cormack/Clarke constant
_RRF_TOPK = 20


@query(
    "q142_rank_fusion",
    oracle=None,  # installed below: embeds q129's oracle as a CTE
    tags=("text", "retrieval", "fusion", "topk"),
)
def q142_rank_fusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two retrieval lists — the standard
    hybrid-search combiner (lexical BM25 + a second signal) used by
    RAG pipelines: rrf(d) = Σ_lists 1/(k + rank_d), k = 60, docs
    absent from a list contribute 0.

    List 1 is the BM25 top-20 (q129's ranking, reused verbatim);
    list 2 is a length-prior ranking (n_chars DESC — the stand-in for
    an embedding-similarity list; the fusion algebra is identical).

    Determinism: ranks are integers; each contribution 1/(k + r) is a
    single correctly-rounded IEEE division and the fused score is a
    FIXED two-term sum (COALESCE(t1, 0) + COALESCE(t2, 0)), never an
    order-unspecified aggregate — bit-identical across engines.

    Scale: both input lists are top-k (bounded) frames, so the fusion
    join touches ≤ 2k rows regardless of corpus size; the heavy work
    is inside the upstream retrieval queries, which are the plan-
    audited q129 / WindowGroupLimit shapes.
    """
    from target_hdfs_spark.registry import REGISTRY

    bm = REGISTRY["q129_bm25_topk"].fn(spark, sf_dir).select(
        F.col("doc_id").alias("b_id"), F.col("rn").alias("r_bm")
    )
    docs = load_table(spark, sf_dir, "documents")
    top_len = (
        docs.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
        .limit(_RRF_TOPK)
        .select("doc_id", "n_chars")
    )
    w = Window.orderBy(F.col("n_chars").desc(), F.col("doc_id"))
    ln = top_len.withColumn("r_len", F.row_number().over(w).cast("long")).select(
        F.col("doc_id").alias("l_id"), "r_len"
    )
    fused = bm.join(ln, bm.b_id == ln.l_id, "full_outer").select(
        F.coalesce(F.col("b_id"), F.col("l_id")).alias("doc_id"),
        "r_bm",
        "r_len",
        (
            F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("r_bm").cast("double")),
                F.lit(0.0),
            )
            + F.coalesce(
                F.lit(1.0) / (F.lit(float(_RRF_K)) + F.col("r_len").cast("double")),
                F.lit(0.0),
            )
        ).alias("rrf"),
    )
    wf = Window.orderBy(F.col("rrf").desc(), F.col("doc_id"))
    return (
        fused.orderBy(F.col("rrf").desc(), F.col("doc_id"))
        .limit(_RRF_TOPK)
        .withColumn("fused_rank", F.row_number().over(wf).cast("long"))
    )


def _install_rrf_oracle() -> None:
    """q142's oracle reuses q129's oracle text as a CTE (single source
    of truth for the BM25 ranking — the two queries can never drift)."""
    from dataclasses import replace

    from target_hdfs_spark.registry import REGISTRY

    bm25_sql = REGISTRY["q129_bm25_topk"].oracle
    oracle = f"""
    WITH bm AS ({bm25_sql}),
    ln AS (
      SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id) AS r_len
      FROM (
        SELECT doc_id, n_chars FROM documents
        ORDER BY n_chars DESC, doc_id LIMIT {_RRF_TOPK}
      )
    ),
    fused AS (
      SELECT
        COALESCE(bm.doc_id, ln.doc_id) AS doc_id,
        bm.rn AS r_bm,
        ln.r_len,
        COALESCE(CAST(1 AS DOUBLE) / ({float(_RRF_K)!r} + CAST(bm.rn AS DOUBLE)), CAST(0 AS DOUBLE))
          + COALESCE(CAST(1 AS DOUBLE) / ({float(_RRF_K)!r} + CAST(ln.r_len AS DOUBLE)), CAST(0 AS DOUBLE)) AS rrf
      FROM bm FULL OUTER JOIN ln ON bm.doc_id = ln.doc_id
    )
    SELECT doc_id, r_bm, r_len, rrf,
           row_number() OVER (ORDER BY rrf DESC, doc_id) AS fused_rank
    FROM fused
    ORDER BY rrf DESC, doc_id LIMIT {_RRF_TOPK}
    """
    REGISTRY["q142_rank_fusion"] = replace(
        REGISTRY["q142_rank_fusion"], oracle=oracle
    )


_install_rrf_oracle()


# ---------------------------------------------------------------------------
# Token co-occurrence lift (word-association mining)
# ---------------------------------------------------------------------------

_LIFT_DF_MIN = 20   # vocabulary floor: tokens in >= 20 documents
_LIFT_MIN_AB = 5    # pair support floor


@query(
    "q144_token_lift",
    oracle=f"""
    WITH dt AS (
      SELECT DISTINCT doc_id, unnest({_TOK}) AS token FROM documents
    ),
    v AS (
      SELECT token, COUNT(*) AS n_t FROM dt GROUP BY token
      HAVING COUNT(*) >= {_LIFT_DF_MIN}
    ),
    vd AS (SELECT dt.doc_id, dt.token FROM dt JOIN v USING (token)),
    pairs AS (
      SELECT a.token AS token_a, b.token AS token_b, COUNT(*) AS n_ab
      FROM vd a JOIN vd b ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY 1, 2
      HAVING COUNT(*) >= {_LIFT_MIN_AB}
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents)
    SELECT token_a, token_b, va.n_t AS n_a, vb.n_t AS n_b, n_ab,
           CAST(n_ab * n_docs AS DOUBLE) / CAST(va.n_t * vb.n_t AS DOUBLE)
             AS lift
    FROM pairs
    JOIN v va ON va.token = pairs.token_a
    JOIN v vb ON vb.token = pairs.token_b
    CROSS JOIN n
    """,
    tags=("text", "statistics", "cooccurrence"),
)
def q144_token_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document-level token association lift — PMI's exact-arithmetic
    core: lift(a,b) = P(a,b) / (P(a)P(b)) = (n_ab · N) / (n_a · n_b),
    computed as ONE double division of two exact int64 products (no
    logarithm, so bit-reproducible; log-PMI is monotone in lift, so
    ranking/thresholding behavior is identical).

    Scale: the all-pairs step is the textbook skew bomb, bounded here
    the standard two ways — a document-frequency floor prunes the
    vocabulary BEFORE the self-join, and pairs generate per-document
    (cost Σ_docs k_d², k_d = distinct frequent tokens in the doc,
    never |vocab|²). The df table is small and broadcasts; the only
    big shuffle is the pair groupBy, map-side combined.
    """
    docs = load_table(spark, sf_dir, "documents")
    # dt feeds the vocabulary aggregate AND (twice, via vd) the pair
    # self-join; checkpoint it so the tokenize+explode+distinct pass
    # runs once, not three times (the q128/q146 multi-reference rule)
    dt = (
        fan_out(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", F.explode(tokens("text")).alias("token"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    v = (
        dt.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_t"))
        .filter(F.col("n_t") >= _LIFT_DF_MIN)
    )
    vd = dt.join(F.broadcast(v.select("token")), "token")
    a = vd.select(F.col("doc_id"), F.col("token").alias("token_a"))
    b = vd.select(F.col("doc_id").alias("b_doc"), F.col("token").alias("token_b"))
    pairs = (
        a.join(
            b,
            (F.col("doc_id") == F.col("b_doc"))
            & (F.col("token_a") < F.col("token_b")),
        )
        .groupBy("token_a", "token_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .filter(F.col("n_ab") >= _LIFT_MIN_AB)
    )
    n = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    va = v.select(F.col("token").alias("token_a"), F.col("n_t").alias("n_a"))
    vb = v.select(F.col("token").alias("token_b"), F.col("n_t").alias("n_b"))
    return (
        pairs.join(F.broadcast(va), "token_a")
        .join(F.broadcast(vb), "token_b")
        .crossJoin(F.broadcast(n))
        .select(
            "token_a",
            "token_b",
            "n_a",
            "n_b",
            "n_ab",
            (
                (F.col("n_ab") * F.col("n_docs")).cast("double")
                / (F.col("n_a") * F.col("n_b")).cast("double")
            ).alias("lift"),
        )
    )


# ---------------------------------------------------------------------------
# Distributed heavy hitters (Misra-Gries candidates + exact verify)
# ---------------------------------------------------------------------------

_HH_FRACTION = 30  # report tokens with count > n_tokens / 30


@query(
    "q146_heavy_hitters",
    oracle=f"""
    WITH tok AS (SELECT unnest({_TOK}) AS token FROM documents),
    n AS (SELECT COUNT(*) AS n_tok FROM tok)
    SELECT token, COUNT(*) AS cnt
    FROM tok CROSS JOIN n
    GROUP BY token, n_tok
    HAVING COUNT(*) * {_HH_FRACTION} > n_tok
    """,
    tags=("text", "sketch", "heavy-hitters", "udf"),
)
def q146_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frequent-token detection by the two-phase heavy-hitter pattern:
    each partition summarizes its token stream with a Misra-Gries
    sketch of k = 30 counters (mapInPandas — per-partition imperative
    state, the documented UDF use case), the union of surviving
    candidates is exactly counted, and the threshold cnt · k > n
    filters.

    Correctness guarantee (why the sketch phase loses nothing): if a
    token's GLOBAL count exceeds n/k, then by averaging its local
    count exceeds n_p/k in at least one partition p, and a Misra-Gries
    summary with k counters undercounts any item by at most n_p/(k+1)
    < n_p/k — so every true heavy hitter survives with a positive
    counter and reaches the exact phase, which then discards the
    sketch's false positives. The result is bit-identical to the
    brute-force GROUP BY (the oracle).

    The sketch is built BATCH-AT-A-TIME, not token-at-a-time: each
    Arrow chunk is reduced with vectorized ``value_counts`` (an exact
    summary), merged into the running counters, and the merged
    summary is trimmed by the standard MG merge rule — subtract the
    (k+1)-th largest counter value from all, drop the non-positive
    (Agarwal et al., "Mergeability of Summaries"). Each trim removes
    ≥ (k+1)x the subtracted offset of total mass, so the summed
    offset — every item's worst-case undercount — stays ≤ n_p/(k+1),
    the same bound the sequential decrement loop gives, without
    paying Python per-element cost.

    Scale: phase 1 reduces each partition to ≤ k+1 rows WITHOUT any
    shuffle (the full token stream never moves), and emits the
    partition's token count from the SAME pass (no separate COUNT
    scan); phase 2 shuffles only candidate-matching rows. At 100 TB
    this is the difference between shuffling ~10¹² token rows and
    shuffling a few thousand candidates.
    """
    from collections.abc import Iterator

    docs = load_table(spark, sf_dir, "documents")
    tok = fan_out(docs.select("doc_id", "text"), "doc_id").select(
        F.explode(tokens("text")).alias("token")
    )

    k = _HH_FRACTION

    def mg_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        counters = pd.Series(dtype="int64")
        n_part = 0
        for pdf in batches:
            n_part += len(pdf)
            vc = pdf["token"].value_counts()
            counters = counters.add(vc, fill_value=0).astype("int64")
            if len(counters) > k:
                # MG merge trim: subtract the (k+1)-th largest value,
                # keep the (≤ k) strictly-positive survivors
                offset = counters.nlargest(k + 1).iloc[-1]
                counters = counters[counters > offset] - offset
        # candidates ride with token set; the partition's token count
        # rides as one sentinel row (token NULL) so no extra scan
        yield pd.DataFrame(
            {
                "token": list(counters.index) + [None],
                "n_part": [0] * len(counters) + [n_part],
            }
        )

    # EAGER checkpoint: candidates and n both derive from `summary`,
    # and Catalyst does not share unaliased subtrees — without this the
    # corpus-wide explode + Misra-Gries pass would execute TWICE (the
    # q132/q151 multi-reference convention). The materialized frame is
    # ≤ (k+1)·partitions rows.
    summary = tok.mapInPandas(
        mg_partition, "token string, n_part long"
    ).localCheckpoint(eager=True)
    candidates = summary.filter(F.col("token").isNotNull()).select("token").distinct()
    n = summary.filter(F.col("token").isNull()).agg(
        F.sum("n_part").alias("n_tok")
    )
    return (
        tok.join(F.broadcast(candidates), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .crossJoin(F.broadcast(n))
        .filter(F.col("cnt") * _HH_FRACTION > F.col("n_tok"))
        .select("token", "cnt")
    )


# ---------------------------------------------------------------------------
# L4m: bigram language-model quality scoring (integer fixed-point)
# ---------------------------------------------------------------------------

_LM_SCALE = 1_000_000_000  # fixed-point: P(w2|w1) -> int64 per bigram


@query(
    "q166_bigram_lm_quality",
    oracle=f"""
    WITH tok AS (SELECT doc_id, {_TOK} AS ts FROM documents),
    uni AS (SELECT unnest(ts) AS token FROM tok),
    c1 AS (SELECT token, COUNT(*) AS c1 FROM uni GROUP BY token),
    v AS (SELECT COUNT(DISTINCT token) AS v FROM uni),
    bg AS (
      SELECT doc_id, unnest(
        CASE WHEN len(ts) >= 2 THEN
          list_transform(generate_series(1, len(ts) - 1),
                         i -> array_to_string(ts[i:i+1], ' '))
        ELSE [] END
      ) AS bigram
      FROM tok
    ),
    c2 AS (SELECT bigram, COUNT(*) AS c2 FROM bg GROUP BY bigram)
    SELECT b.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_bigrams,
           CAST(SUM(((c2.c2 + 1) * {_LM_SCALE}) // (c1.c1 + v.v))
                AS BIGINT) AS lm_score
    FROM bg b
    JOIN c2 ON c2.bigram = b.bigram
    JOIN c1 ON c1.token = string_split(b.bigram, ' ')[1]
    CROSS JOIN v
    GROUP BY b.doc_id
    """,
    tags=("text", "ngram", "lm", "quality"),
)
def q166_bigram_lm_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram language-model quality score per document: the corpus
    itself is the LM (c(w1 w2), c(w1), vocabulary V), and each doc
    scores the sum over its bigram instances of the add-one-smoothed
    conditional P(w2|w1) = (c(w1w2)+1)/(c(w1)+V) in _LM_SCALE
    fixed-point — the q78/q151 trick: one integer truncated division
    per bigram, then an int64 sum, so the score is
    aggregation-order-independent and exactly oracle-checkable
    (log-probability scoring is banned transcendental territory; the
    linear-probability sum ranks fluent-vs-junk documents the same
    way for fixed doc length and is what a deterministic engine can
    actually pin). Docs with < 2 tokens have no bigrams and are
    absent, matching the oracle's inner join.

    Scale: one tokenize pass feeds the unigram and bigram explodes;
    counts combine map-side; the two probability joins key on bigram
    and first-word (both LM tables are corpus-vocabulary-sized, AQE
    broadcasts them when they fit); V rides as a broadcast 1-row
    cross join. Headroom: (c2+1)*SCALE needs c2 < 9.2e9 — at larger
    bigram counts drop _LM_SCALE a decade per 10x corpus growth.
    """
    docs = load_table(spark, sf_dir, "documents")
    # ONE tokenize pass for four consumers (bigram instances, bigram
    # counts, unigram counts, vocabulary) — Catalyst does not share
    # unaliased subtrees, so without the checkpoint the regex split
    # would run 4x over the corpus (q144 convention).
    toks = (
        fan_out(docs.select("doc_id", "text"), "doc_id")
        .select("doc_id", tokens("text").alias("toks"))
        .localCheckpoint(eager=True)
    )
    tok_col = F.col("toks")
    bigrams = F.when(
        F.size(tok_col) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(tok_col) - F.lit(1)),
            lambda i: F.concat_ws(" ", F.slice(tok_col, i, 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    bg = toks.select("doc_id", F.explode(bigrams).alias("bigram"))
    uni = toks.select(F.explode("toks").alias("token"))
    c1 = uni.groupBy("token").agg(F.count(F.lit(1)).alias("c1"))
    vocab = uni.agg(F.count_distinct("token").alias("v"))
    c2 = bg.groupBy("bigram").agg(F.count(F.lit(1)).alias("c2"))
    scored = (
        bg.join(c2, "bigram")
        .join(c1, F.split(F.col("bigram"), " ").getItem(0) == F.col("token"))
        .crossJoin(F.broadcast(vocab))
        .select(
            "doc_id",
            F.expr(f"((c2 + 1) * {_LM_SCALE}) div (c1 + v)").alias("p_scaled"),
        )
    )
    return scored.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_bigrams"),
        F.sum("p_scaled").alias("lm_score"),
    )


# ---------------------------------------------------------------------------
# L4: BPE merge-candidate statistics (the tokenizer-training inner loop)
# ---------------------------------------------------------------------------

_BPE_TOPK = 20


# Shared BPE trainer kernels (r8 verdict item 4: the argmax/merge
# block was pasted five times across q200/q237/q247/q248 — one copy
# drifting would silently fork the trainer's tiebreak semantics, the
# constant-shadowing failure class the q252 incident proved real).
# Every kernel is plan-shaped, not just code-shaped: the argmax's
# rn=1 compiles to WindowGroupLimit and the merge application
# broadcasts the 1-row argmax (both plan-pinned by the BPE tests).


def _bpe_char_pairs(wf: DataFrame) -> DataFrame:
    """Adjacent CHARACTER pairs over a (w, freq) word-frequency frame
    (rounds-one statistic: symbols are single characters)."""
    return (
        wf.filter(F.length("w") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, length(w) - 1),"
                    " i -> struct(substr(w, i, 1) AS a,"
                    " substr(w, i + 1, 1) AS b))"
                )
            ).alias("p"),
        )
        .select("p.a", "p.b", "freq")
    )


def _bpe_marked_pairs(seqs: DataFrame) -> DataFrame:
    """Adjacent SYMBOL pairs over a (seq, freq) frame in the
    boundary-marked rendering ('|t| |h| |e|'), markers stripped."""
    return (
        seqs.select(F.split("seq", " ").alias("s"), "freq")
        .filter(F.size("s") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1),"
                    " i -> struct("
                    "replace(element_at(s, i), '|', '') AS a,"
                    " replace(element_at(s, i + 1), '|', '') AS b))"
                )
            ).alias("p"),
        )
        .select("p.a", "p.b", "freq")
    )


def _bpe_argmax_merge(
    pairs: DataFrame, keep_freq: bool = False, checkpoint: bool = False
) -> DataFrame:
    """THE trainer argmax: highest corpus-weighted pair frequency,
    ties broken lexicographically on (a, b) — q200's pinned tiebreak,
    identical in the generated oracle SQL. rn=1 over the global
    window compiles to WindowGroupLimit (each task keeps its local
    top row before the shuffle), and the input frame is
    |alphabet+rounds|²-bounded, so the argmax never sorts more than
    a vocab-of-symbols-squared frame."""
    w_top = Window.orderBy(F.col("pair_freq").desc(), "a", "b")
    m = (
        pairs.groupBy("a", "b")
        .agg(F.sum("freq").alias("pair_freq"))
        .withColumn("rn", F.row_number().over(w_top))
        .filter(F.col("rn") == 1)
        .select(*(("a", "b", "pair_freq") if keep_freq else ("a", "b")))
    )
    # eager checkpoint when the 1-row argmax feeds BOTH an output
    # frame and the merge pass (the unrolled trainers), so the plan
    # stays round-sized instead of compounding
    return m.localCheckpoint(eager=True) if checkpoint else m


def _bpe_apply_marked_merge(seqs: DataFrame, m: DataFrame) -> DataFrame:
    """Apply the 1-row argmax merge (a, b) -> ab to every
    boundary-marked symbol sequence: plain SQL replace over the
    '|a| |b|' pattern IS the greedy left-to-right non-overlapping
    merge rule in both engines; the marker wrapping keeps the
    pattern from matching inside multi-character symbols. The 1-row
    merge frame broadcasts; the pass is map-side over vocab rows."""
    return (
        seqs.crossJoin(F.broadcast(m.select("a", "b")))
        .select(
            F.expr(
                "replace(seq, concat('|', a, '| |', b, '|'),"
                " concat('|', a, b, '|'))"
            ).alias("seq"),
            "freq",
        )
        .localCheckpoint(eager=True)
    )


def _bpe_rank_pairs(pairs: DataFrame, topk: int) -> DataFrame:
    """Ranked merge-candidate table: pair_freq (corpus-weighted) and
    n_word_types per pair, top `topk` under the argmax tiebreak."""
    cnt = pairs.groupBy("a", "b").agg(
        F.sum("freq").alias("pair_freq"),
        F.count(F.lit(1)).alias("n_word_types"),
    )
    w_rank = Window.orderBy(F.col("pair_freq").desc(), "a", "b")
    return (
        cnt.withColumn("rnk", F.row_number().over(w_rank).cast("long"))
        .filter(F.col("rnk") <= topk)
    )


@query(
    "q200_bpe_merge_candidates",
    oracle=f"""
    WITH wf AS (
      SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest({TOKENS_SQL.format(expr="text")}) AS tok
        FROM documents
      ) GROUP BY tok
    ),
    pairs AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, freq
      FROM wf, unnest(generate_series(1, length(w) - 1)) AS t(i)
      WHERE length(w) >= 2
    ),
    cnt AS (
      SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_freq,
             CAST(COUNT(*) AS BIGINT) AS n_word_types
      FROM pairs GROUP BY a, b
    ),
    ranked AS (
      SELECT a, b, pair_freq, n_word_types,
             row_number() OVER (ORDER BY pair_freq DESC, a, b) AS rnk
      FROM cnt
    )
    SELECT a, b, pair_freq, n_word_types, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_BPE_TOPK}
    """,
    tags=("text", "tokenizer", "agg"),
)
def q200_bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training, iteration-one statistic: the
    corpus-weighted adjacent-CHARACTER-pair counts over the word
    frequency table, ranked — the exact argmax a byte-pair-encoding
    trainer merges first, plus the next {_BPE_TOPK - 1} candidates
    (subsequent iterations repeat this count over the merged symbol
    sequences; the statistic, its weighting, and its (freq, pair)
    tiebreak are what this query pins). pair_freq weights each pair
    by its words' corpus frequencies; n_word_types counts the
    distinct word shapes containing the pair — both drive real merge
    heuristics.

    Scale — the key structural point: pairs are counted over the
    WORD-FREQUENCY TABLE, not the corpus. One corpus pass collapses
    text to |vocab| (freq, word) rows; the character-pair explode
    (map-side, transform over substr) touches vocab-sized data, so
    100 TB of text costs one token count — exactly how production
    BPE trainers (and q110's subword surface) are built. Final
    ranking is a global top-{_BPE_TOPK} over the |alphabet|²-bounded
    pair frame (TakeOrderedAndProject-scale).

    Exactness: substr/length are codepoint-based in both engines
    (the corpus is ASCII-safe by construction; byte-level BPE would
    swap in octet functions); counts and ranks are exact int64 with
    full tiebreaks.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wf = (
        fan_out(docs, "doc_id")
        .select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    return _bpe_rank_pairs(_bpe_char_pairs(wf), _BPE_TOPK)


# ---------------------------------------------------------------------------
# L4m: vocabulary growth / type-token profile per source
# ---------------------------------------------------------------------------


@query(
    "q220_vocab_growth",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOK}) AS tok FROM documents
    ),
    types AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tok
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS n_types,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(COUNT(*) * 1000000 // SUM(c) AS BIGINT) AS ttr_ppm,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000
                // COUNT(*) AS BIGINT) AS hapax_ppm
    FROM types GROUP BY source
    """,
    tags=("text", "vocabulary", "profile"),
)
def q220_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source vocabulary profile: token volume, distinct types,
    hapax legomena (once-only types), type-token ratio and hapax
    share — the Heaps-law readouts that tell a corpus curator whether
    a source is lexically RICH (high TTR, healthy hapax tail:
    natural text) or DEGENERATE (low TTR: templated boilerplate;
    hapax spikes: OCR noise / mojibake). The acquisition-side triage
    signal next to q53's language-ID and q54's quality gates.

    Exactness: exact counts; two truncated ppm divisions.

    Scale: one tokenize+explode pass into a (source, token)
    aggregation (map-side combined — the per-mapper partial is
    bounded by vocabulary, not corpus), then a |sources x types|
    frame reduced to |sources| rows. Both shuffles carry type-level
    rows; nothing is corpus-quadratic.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    from target_hdfs_spark.sources.readers import fan_out

    # fan out on doc_id (high cardinality) so the tokenize explosion
    # uses every core; "source" has too few values to rebalance on
    tok = (
        fan_out(docs, "doc_id")
        .select("source", F.explode(tokens("text")).alias("tok"))
    )
    types = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    return types.groupBy("source").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("long")
        .alias("n_hapax"),
        F.expr("count(1) * 1000000 div sum(c)").cast("long").alias("ttr_ppm"),
        F.expr(
            "sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) * 1000000 div count(1)"
        )
        .cast("long")
        .alias("hapax_ppm"),
    )


# ---------------------------------------------------------------------------
# L4m2: dyadic frequency spectrum (Zipf/Heaps diagnostics, log-free)
# ---------------------------------------------------------------------------


@query(
    "q238_frequency_spectrum",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOK}) AS tok FROM documents
    ),
    types AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tok
    )
    SELECT source,
           CAST(length(bin(c)) - 1 AS BIGINT) AS bucket,
           CAST(SUM(CAST(1 AS BIGINT)) AS BIGINT) AS n_types,
           CAST(SUM(c) AS BIGINT) AS n_tokens
    FROM types
    GROUP BY source, length(bin(c)) - 1
    """,
    tags=("text", "vocabulary", "zipf", "profile"),
)
def q238_frequency_spectrum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source DYADIC FREQUENCY SPECTRUM: how many word types (and
    how much token mass) occur 1x, 2-3x, 4-7x, ... — the
    corpus-linguistics rank-frequency diagnostic that reads Zipf
    shape and vocabulary saturation without a single transcendental:
    the bucket is floor(log2(freq)) computed as the binary-string
    length minus one (`bin()` agrees across both engines, verified),
    so the whole readout stays integer-exact (the log-free discipline
    q175/q213 use for decay applied to the frequency axis). A healthy
    natural-language source shows geometrically decaying n_types per
    bucket; a machine-generated or boilerplate-heavy source shows
    mass piled in few buckets — the triage signal next to q220's
    TTR/hapax profile.

    Scale: one corpus token count (map-side combined) collapses to
    the |source x vocab| type frame; the bucket is a map-side
    expression on it and the spectrum is a second tiny aggregation —
    |sources| x ~40 output rows. Nothing beyond the two stacked
    aggregations q220 already prices.
    """
    docs = load_table(spark, sf_dir, "documents").select("source", "text")
    types = (
        docs.select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return (
        types.groupBy(
            "source",
            (F.length(F.bin("c")) - 1).cast("long").alias("bucket"),
        )
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_types"),
            F.sum("c").cast("long").alias("n_tokens"),
        )
    )


# ---------------------------------------------------------------------------
# L4n2: BPE iteration TWO — apply the argmax merge, recount (q200's
# trainer loop actually turned one crank)
# ---------------------------------------------------------------------------

_BPE2_TOPK = 5


@query(
    "q237_bpe_apply_merge",
    oracle=f"""
    WITH wf AS (
      SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest({TOKENS_SQL.format(expr="text")}) AS tok
        FROM documents
      ) GROUP BY tok
    ),
    cpairs AS (
      SELECT substr(w, i, 1) AS a, substr(w, i + 1, 1) AS b, freq
      FROM wf, unnest(generate_series(1, length(w) - 1)) AS t(i)
      WHERE length(w) >= 2
    ),
    top1 AS (
      SELECT a, b FROM (
        SELECT a, b, row_number() OVER (ORDER BY SUM(freq) DESC, a, b) AS rn
        FROM cpairs GROUP BY a, b
      ) WHERE rn = 1
    ),
    merged AS (
      SELECT replace(
               array_to_string(
                 list_transform(generate_series(1, length(w)),
                                i -> substr(w, i, 1)), ' '),
               a || ' ' || b, a || b) AS seq,
             freq
      FROM wf CROSS JOIN top1
    ),
    syms AS (SELECT string_split(seq, ' ') AS s, freq FROM merged),
    spairs AS (
      SELECT s[i] AS sym_a, s[i + 1] AS sym_b, freq
      FROM syms, unnest(generate_series(1, len(s) - 1)) AS t(i)
      WHERE len(s) >= 2
    ),
    cnt AS (
      SELECT sym_a, sym_b, CAST(SUM(freq) AS BIGINT) AS pair_freq,
             CAST(COUNT(*) AS BIGINT) AS n_word_types
      FROM spairs GROUP BY sym_a, sym_b
    ),
    ranked AS (
      SELECT sym_a, sym_b, pair_freq, n_word_types,
             row_number() OVER (ORDER BY pair_freq DESC, sym_a, sym_b) AS rnk
      FROM cnt
    )
    SELECT sym_a, sym_b, pair_freq, n_word_types, CAST(rnk AS BIGINT) AS rnk
    FROM ranked WHERE rnk <= {_BPE2_TOPK}
    """,
    tags=("text", "tokenizer", "iterative"),
)
def q237_bpe_apply_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE training iteration TWO: take q200's argmax character pair,
    APPLY the merge to every word's symbol sequence, and recount
    adjacent SYMBOL pairs over the merged sequences — the trainer
    loop actually advanced one step, so the iteration-2 candidates
    can contain the new two-character symbol. The merge-application
    trick: a symbol sequence rendered as a space-joined string makes
    plain SQL `replace(seq, 'a b', 'ab')` EXACTLY the BPE merge —
    both engines' replace scans left-to-right non-overlapping, which
    is the trainer's greedy rule ('a a a' under merge (a,a) becomes
    ['aa','a'], never ['a','aa']).

    Exactness: the argmax merge is unique under the (freq desc, a, b)
    tiebreak q200 pins; replace semantics match across engines;
    counts and ranks are exact int64.

    Scale: q200's structural point carries through — every stage
    after the one corpus token count runs on the |vocab|-bounded
    word-frequency table: the merge application is one map-side
    string pass over vocab rows (the 1-row argmax broadcasts), the
    symbol-pair explode is vocab-bounded, and the final ranking is a
    top-{_BPE2_TOPK} over an |alphabet+1|²-bounded frame. A full
    trainer unrolls this block per merge (q151's unrolled-iteration
    discipline), one vocab-sized pass each.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wf = (
        fan_out(docs, "doc_id")
        .select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint()  # feeds the argmax AND the merge pass
    )
    top1 = _bpe_argmax_merge(_bpe_char_pairs(wf))
    merged = wf.crossJoin(F.broadcast(top1)).select(
        F.expr(
            "replace(array_join(transform(sequence(1, length(w)),"
            " i -> substr(w, i, 1)), ' '),"
            " concat(a, ' ', b), concat(a, b))"
        ).alias("seq"),
        "freq",
    )
    # the round-1 sequences are unmarked single-space joins (symbols
    # are 1-2 chars and '|'-free here), so the plain element_at
    # explode is correct; the output keeps q237's sym_a/sym_b names
    spairs = (
        merged.select(F.split("seq", " ").alias("s"), "freq")
        .filter(F.size("s") >= 2)
        .select(
            "freq",
            F.explode(
                F.expr(
                    "transform(sequence(1, size(s) - 1),"
                    " i -> struct(element_at(s, i) AS a,"
                    " element_at(s, i + 1) AS b))"
                )
            ).alias("p"),
        )
        .select("p.a", "p.b", "freq")
    )
    return _bpe_rank_pairs(spairs, _BPE2_TOPK).select(
        F.col("a").alias("sym_a"),
        F.col("b").alias("sym_b"),
        "pair_freq",
        "n_word_types",
        "rnk",
    )


# ---------------------------------------------------------------------------
# L4n3: the full N-round BPE trainer loop (q200 is round 1's statistic,
# q237 is one crank — this unrolls the trainer and emits the learned
# merge TABLE, the artifact a tokenizer ships)
# ---------------------------------------------------------------------------

_BPE_TRAIN_ROUNDS = 8

# Symbol-sequence rendering for exact merge application via plain SQL
# replace: each symbol is wrapped in '|' boundary markers and symbols
# are space-joined ('|t| |h| |e|'), so the merge pattern
# '|a| |b|' -> '|ab|' can only match two complete adjacent symbols.
# The naive unmarked rendering ('a b' -> 'ab') is correct ONLY while
# every symbol is one character (q237's single crank): from round 2 a
# pattern could match a multi-char symbol's suffix across a boundary
# ('xa b' would merge under (a, b)). And a single-space delimiter
# CANNOT be part of the pattern on both sides (' a b ' -> ' ab ')
# because consecutive matches share the delimiter: 'a a a a' would
# greedily merge only once. Boundary markers solve both exactly; the
# corpus alphabet is space + [a-y] (verified), and words containing
# the marker are excluded identically on both sides for portability.


def _bpe_trainer_oracle(rounds: int = _BPE_TRAIN_ROUNDS) -> str:
    """Unrolled DuckDB oracle: one MATERIALIZED CTE chain per round
    (the q236 lesson — inlined round CTEs re-evaluate exponentially),
    each round = split -> pair count -> deterministic argmax
    (freq DESC, a, b) -> merge application to the next vocab frame."""
    parts = [
        f"""
    WITH wf AS MATERIALIZED (
      SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest({TOKENS_SQL.format(expr="text")}) AS tok
        FROM documents
      ) WHERE tok NOT LIKE '%|%' GROUP BY tok
    ),
    seq0 AS MATERIALIZED (
      SELECT array_to_string(
               list_transform(generate_series(1, length(w)),
                              i -> '|' || substr(w, i, 1) || '|'),
               ' ') AS seq,
             freq
      FROM wf
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    y{r} AS MATERIALIZED (
      SELECT string_split(seq, ' ') AS s, freq FROM seq{r - 1}
    ),
    p{r} AS MATERIALIZED (
      SELECT replace(s[i], '|', '') AS a,
             replace(s[i + 1], '|', '') AS b, freq
      FROM y{r}, unnest(generate_series(1, len(s) - 1)) AS t(i)
      WHERE len(s) >= 2
    ),
    m{r} AS MATERIALIZED (
      SELECT a, b, CAST(SUM(freq) AS BIGINT) AS pair_freq
      FROM p{r} GROUP BY a, b
      ORDER BY SUM(freq) DESC, a, b LIMIT 1
    ),
    seq{r} AS MATERIALIZED (
      SELECT replace(seq, '|' || a || '| |' || b || '|',
                     '|' || a || b || '|') AS seq, freq
      FROM seq{r - 1} CROSS JOIN m{r}
    )"""
        )
    finals = "\nUNION ALL\n".join(
        f"SELECT CAST({r} AS BIGINT) AS merge_round, a AS sym_a,"
        f" b AS sym_b, pair_freq FROM m{r}"
        for r in range(1, rounds + 1)
    )
    return "".join(parts) + "\n" + finals


@query(
    "q247_bpe_trainer",
    oracle=_bpe_trainer_oracle(),
    tags=("text", "tokenizer", "iterative"),
)
def q247_bpe_trainer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FULL BPE trainer loop, {_BPE_TRAIN_ROUNDS} merges unrolled:
    per round, count adjacent symbol pairs over the vocab frame, take
    the deterministic argmax (freq DESC, then pair — q200's tiebreak),
    APPLY it to every word's symbol sequence, repeat — emitting the
    learned merge table (merge_round, sym_a, sym_b, pair_freq), the
    artifact a tokenizer actually ships (q200 pinned round 1's
    statistic, q237 one application; this is the loop composed,
    r7 verdict item 6).

    Exact greedy-merge semantics at every round: symbols are rendered
    with '|' boundary markers (see _bpe_trainer_oracle's comment — the
    unmarked rendering is wrong once multi-char symbols exist, and
    space-delimited patterns under-merge runs), and both engines'
    replace scans left-to-right non-overlapping, which IS the
    trainer's greedy rule.

    Scale (q151's unrolled-iteration discipline): after ONE corpus
    token count, every round runs on the |vocab|-bounded frequency
    frame — pair explode (map-side), an |alphabet+r|²-bounded
    aggregation with a 1-row argmax, and a map-side string pass with
    the argmax broadcast. Each round's vocab frame is eagerly
    localCheckpointed so the plan stays round-sized instead of
    compounding {_BPE_TRAIN_ROUNDS} crossJoin+replace layers into one
    exponential tree; 100 TB of text costs one token count plus
    {_BPE_TRAIN_ROUNDS} vocab-sized passes.

    Cites reference behavior: none (beyond-reference operator; the
    reference has no tokenizer surface).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wf = (
        fan_out(docs, "doc_id")
        .select(F.explode(tokens("text")).alias("w"))
        .filter(~F.col("w").contains("|"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    seqs = wf.select(
        F.expr(
            "array_join(transform(sequence(1, length(w)),"
            " i -> concat('|', substr(w, i, 1), '|')), ' ')"
        ).alias("seq"),
        "freq",
    ).localCheckpoint(eager=True)
    merge_frames = []
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        # checkpointed argmax: the 1-row frame feeds the output AND
        # the merge pass
        m = _bpe_argmax_merge(
            _bpe_marked_pairs(seqs), keep_freq=True, checkpoint=True
        )
        merge_frames.append(
            m.select(
                F.lit(r).cast("long").alias("merge_round"),
                F.col("a").alias("sym_a"),
                F.col("b").alias("sym_b"),
                F.col("pair_freq").cast("long").alias("pair_freq"),
            )
        )
        seqs = _bpe_apply_marked_merge(seqs, m)
    out = merge_frames[0]
    for mf in merge_frames[1:]:
        out = out.unionByName(mf)
    return out


# ---------------------------------------------------------------------------
# L4n4: BPE compression curve — the trainer's learning curve (what you
# actually tune N on)
# ---------------------------------------------------------------------------


def _bpe_compression_oracle(rounds: int = _BPE_TRAIN_ROUNDS) -> str:
    """q247's unrolled MATERIALIZED chain, read out as the per-round
    corpus-weighted symbol count instead of the merge table."""
    parts = [
        f"""
    WITH wf AS MATERIALIZED (
      SELECT tok AS w, CAST(COUNT(*) AS BIGINT) AS freq FROM (
        SELECT unnest({TOKENS_SQL.format(expr="text")}) AS tok
        FROM documents
      ) WHERE tok NOT LIKE '%|%' GROUP BY tok
    ),
    seq0 AS MATERIALIZED (
      SELECT array_to_string(
               list_transform(generate_series(1, length(w)),
                              i -> '|' || substr(w, i, 1) || '|'),
               ' ') AS seq,
             freq
      FROM wf
    ),
    chars AS MATERIALIZED (
      SELECT CAST(SUM(freq * length(w)) AS BIGINT) AS chars_total FROM wf
    )"""
    ]
    for r in range(1, rounds + 1):
        parts.append(
            f""",
    y{r} AS MATERIALIZED (
      SELECT string_split(seq, ' ') AS s, freq FROM seq{r - 1}
    ),
    p{r} AS MATERIALIZED (
      SELECT replace(s[i], '|', '') AS a,
             replace(s[i + 1], '|', '') AS b, freq
      FROM y{r}, unnest(generate_series(1, len(s) - 1)) AS t(i)
      WHERE len(s) >= 2
    ),
    m{r} AS MATERIALIZED (
      SELECT a, b FROM p{r} GROUP BY a, b
      ORDER BY SUM(freq) DESC, a, b LIMIT 1
    ),
    seq{r} AS MATERIALIZED (
      SELECT replace(seq, '|' || a || '| |' || b || '|',
                     '|' || a || b || '|') AS seq, freq
      FROM seq{r - 1} CROSS JOIN m{r}
    )"""
        )
    finals = "\nUNION ALL\n".join(
        f"""SELECT CAST({r} AS BIGINT) AS merge_round,
           CAST(SUM(freq * len(string_split(seq, ' '))) AS BIGINT)
             AS symbols_total,
           (SELECT chars_total FROM chars) AS chars_total,
           CAST(SUM(freq * len(string_split(seq, ' '))) * 1000000
                // (SELECT chars_total FROM chars) AS BIGINT)
             AS compression_ppm
    FROM seq{r}"""
        for r in range(0, rounds + 1)
    )
    return "".join(parts) + "\n" + finals


@query(
    "q248_bpe_compression",
    oracle=_bpe_compression_oracle(),
    tags=("text", "tokenizer", "iterative", "observability"),
)
def q248_bpe_compression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE COMPRESSION CURVE: the corpus-weighted total symbol count
    after each of q247's {_BPE_TRAIN_ROUNDS} merge rounds (round 0 =
    raw characters), with compression in ppm of the character
    baseline — the tokenizer trainer's LEARNING CURVE, i.e. the
    readout you actually choose the merge count N on (marginal
    compression per merge flattens; train until it's not worth a
    vocab slot). Composes q247's artifact into the decision metric
    the way q203 turns dedup pairs into ROI.

    Exactness: the merge chain is q247's verbatim (same argmax
    tiebreak, same boundary-marker rendering), and the readout is an
    integer weighted count per round; one truncated ppm division.

    Scale: identical posture to q247 — one corpus token count, then
    {_BPE_TRAIN_ROUNDS} vocab-bounded rounds over eagerly
    checkpointed frames; the per-round readout is a single
    sum(freq * size) aggregation on the frame the trainer already
    materialized, so the curve costs {_BPE_TRAIN_ROUNDS + 1} scalar
    aggregations over vocab-sized data.

    Cites reference behavior: none (beyond-reference operator).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    wf = (
        fan_out(docs, "doc_id")
        .select(F.explode(tokens("text")).alias("w"))
        .filter(~F.col("w").contains("|"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)  # feeds seq0 AND the chars total
    )
    chars = wf.agg(
        F.sum(F.col("freq") * F.length("w")).cast("long").alias("chars_total")
    )
    seqs = wf.select(
        F.expr(
            "array_join(transform(sequence(1, length(w)),"
            " i -> concat('|', substr(w, i, 1), '|')), ' ')"
        ).alias("seq"),
        "freq",
    ).localCheckpoint(eager=True)

    def round_row(r: int, frame: DataFrame) -> DataFrame:
        return (
            frame.agg(
                F.sum(F.col("freq") * F.size(F.split("seq", " ")))
                .cast("long")
                .alias("symbols_total")
            )
            .crossJoin(F.broadcast(chars))
            .select(
                F.lit(r).cast("long").alias("merge_round"),
                "symbols_total",
                "chars_total",
                F.expr("symbols_total * 1000000 div chars_total")
                .cast("long")
                .alias("compression_ppm"),
            )
        )

    rows = [round_row(0, seqs)]
    for r in range(1, _BPE_TRAIN_ROUNDS + 1):
        m = _bpe_argmax_merge(_bpe_marked_pairs(seqs), checkpoint=True)
        seqs = _bpe_apply_marked_merge(seqs, m)
        rows.append(round_row(r, seqs))
    out = rows[0]
    for fr in rows[1:]:
        out = out.unionByName(fr)
    return out


# ---------------------------------------------------------------------------
# L4n: multi-keyword scan (policy/PII-style literal matching, exact)
# ---------------------------------------------------------------------------

# Literal keywords only: occurrence counting via length arithmetic
# ((len(text) - len(replace(text, kw))) / len(kw)) is exact and
# engine-portable, where regex engines (Java vs RE2) are not.
_SCAN_KEYWORDS = ("data", "model", "spark", "quality", "token")


@query(
    "q224_keyword_scan",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{kw}' AS keyword,
           CAST(SUM(CASE WHEN contains(lower(text), '{kw}')
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_docs,
           CAST(SUM((length(lower(text))
                     - length(replace(lower(text), '{kw}', '')))
                    // {len(kw)}) AS BIGINT) AS n_occurrences
    FROM documents
    """
        for kw in _SCAN_KEYWORDS
    ),
    tags=("text", "scan", "policy"),
)
def q224_keyword_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-keyword LITERAL scan over the corpus: per keyword, how
    many documents contain it and how many total occurrences — the
    policy/blocklist/PII-shaped pass every curation pipeline runs
    (contraband terms, license markers, eval-set canaries). Literal
    matching by length arithmetic ((len - len(text with kw removed))
    / len(kw)) instead of regex, because regex dialects diverge
    across engines while replace() is exact everywhere.

    Scale: ONE corpus scan evaluates every keyword map-side (the
    conditional aggregates all ride the same pass — adding a keyword
    adds zero scans); output is |keywords| rows. At thousands of
    keywords, switch the expression to an Aho-Corasick pandas_udf;
    the plan shape (scan-side scoring, tiny agg) is unchanged.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        F.lower(F.col("text")).alias("t")
    )
    aggs = []
    for kw in _SCAN_KEYWORDS:
        # integer `div`, matching the oracle's `//` exactly: float
        # division then cast is only exact below 2^53 per-doc lengths
        # — a latent divergence for very large documents (ADVICE r6)
        occ = F.expr(
            f"(length(t) - length(replace(t, '{kw}', ''))) div {len(kw)}"
        ).cast("long")
        aggs.append(
            F.struct(
                F.lit(kw).alias("keyword"),
                F.sum(F.when(F.col("t").contains(kw), 1).otherwise(0))
                .cast("long")
                .alias("n_docs"),
                F.sum(occ).cast("long").alias("n_occurrences"),
            ).alias(f"_{kw}")
        )
    row = docs.agg(*aggs)
    return row.select(
        F.explode(F.array(*[F.col(f"_{kw}") for kw in _SCAN_KEYWORDS])).alias(
            "s"
        )
    ).select("s.keyword", "s.n_docs", "s.n_occurrences")


# ---------------------------------------------------------------------------
# L4o: inter-source unigram similarity (corpus redundancy telemetry)
# ---------------------------------------------------------------------------


@query(
    "q225_source_similarity",
    oracle=f"""
    WITH tok AS (
      SELECT source, unnest({_TOK}) AS tok FROM documents
    ),
    tc AS (
      SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY source, tok
    ),
    norms AS (
      SELECT source, CAST(SUM(c * c) AS BIGINT) AS n2 FROM tc GROUP BY source
    ),
    dots AS (
      SELECT a.source AS src_a, b.source AS src_b,
             CAST(COUNT(*) AS BIGINT) AS n_common,
             CAST(SUM(a.c * b.c) AS BIGINT) AS dot
      FROM tc a JOIN tc b ON b.tok = a.tok AND b.source > a.source
      GROUP BY 1, 2
    )
    SELECT d.src_a, d.src_b, d.n_common, d.dot,
           CAST(d.dot AS DOUBLE) / (sqrt(CAST(na.n2 AS DOUBLE))
                                    * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
    FROM dots d
    JOIN norms na ON na.source = d.src_a
    JOIN norms nb ON nb.source = d.src_b
    """,
    tags=("text", "similarity", "profile"),
)
def q225_source_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise SOURCE similarity on unigram count vectors: for every
    source pair, shared vocabulary size, exact integer dot product,
    and cosine similarity — the inter-source redundancy matrix that
    tells a mixture designer which sources are near-copies of each
    other (q114/q126 weight sources; this says when two "different"
    sources shouldn't count twice).

    Exactness: counts and dots are exact int64; cosine is a fixed
    IEEE tree (int64 -> double casts, two sqrts, one multiply, one
    divide — identical operand order both engines, q198's
    discipline).

    Scale: the corpus reduces to the (source, token) count frame
    first (map-side combined, vocabulary-bounded); the pair join is
    token-keyed over that REDUCED frame — never over documents — and
    the output is |sources|² rows. Hot tokens contribute one row per
    source, so the join's fan-out per token is bounded by |sources|.
    """
    docs = load_table(spark, sf_dir, "documents").select(
        "doc_id", "source", "text"
    )
    from target_hdfs_spark.sources.readers import fan_out

    tc = (
        fan_out(docs, "doc_id")
        .select("source", F.explode(tokens("text")).alias("tok"))
        .groupBy("source", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint()  # feeds norms and both pair-join sides
    )
    norms = tc.groupBy("source").agg(F.sum(F.col("c") * F.col("c")).alias("n2"))
    a, b = tc.alias("a"), tc.alias("b")
    dots = (
        a.join(
            b,
            (F.col("b.tok") == F.col("a.tok"))
            & (F.col("b.source") > F.col("a.source")),
        )
        .groupBy(
            F.col("a.source").alias("src_a"), F.col("b.source").alias("src_b")
        )
        .agg(
            F.count(F.lit(1)).alias("n_common"),
            F.sum(F.col("a.c") * F.col("b.c")).cast("long").alias("dot"),
        )
    )
    na = norms.select(F.col("source").alias("src_a"), F.col("n2").alias("na2"))
    nb = norms.select(F.col("source").alias("src_b"), F.col("n2").alias("nb2"))
    return (
        dots.join(F.broadcast(na), "src_a")
        .join(F.broadcast(nb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            "dot",
            (
                F.col("dot").cast("double")
                / (
                    F.sqrt(F.col("na2").cast("double"))
                    * F.sqrt(F.col("nb2").cast("double"))
                )
            ).alias("cos_sim"),
        )
    )


# ---------------------------------------------------------------------------
# L4p: vocabulary coverage curve (tokenizer sizing readout)
# ---------------------------------------------------------------------------

_COV_SIZES = (10, 100, 1000, 10000)


@query(
    "q226_vocab_coverage",
    oracle=f"""
    WITH tc AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest({_TOK}) AS tok FROM documents)
      GROUP BY tok
    ),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, tok) AS rnk,
             CAST(SUM(c) OVER () AS BIGINT) AS total
      FROM tc
    )
    SELECT CAST(k AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN rnk <= k THEN c ELSE 0 END) AS BIGINT)
             AS covered_tokens,
           CAST(ANY_VALUE(total) AS BIGINT) AS total_tokens,
           CAST(SUM(CASE WHEN rnk <= k THEN c ELSE 0 END) * 1000000
                // ANY_VALUE(total) AS BIGINT) AS coverage_ppm
    FROM ranked
    CROSS JOIN (SELECT unnest([{", ".join(str(k) for k in _COV_SIZES)}]) AS k)
    GROUP BY k
    """,
    tags=("text", "vocabulary", "tokenizer"),
)
def q226_vocab_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary COVERAGE curve: for each candidate vocab size k,
    the share of all corpus token occurrences covered by the k most
    frequent types — the readout that sizes a tokenizer vocabulary
    ("32k types cover 99.2% of occurrences; the tail is OOV") and
    complements q111's fixed-vocab OOV rate by sweeping the size
    axis. Frequency rank ties break by token text (total order).

    Exactness: exact counts; coverage is one ppm truncated division
    per k.

    Scale: the corpus reduces to the type-count frame first
    (vocabulary-bounded, map-side combined); the frequency rank over
    that frame is a ``banded_cumsum`` pass (operators/prefix.py) —
    even a web-scale vocabulary (1e8+ types, half of them
    count-1 ties) never funnels through one window task; the total is
    a 1-row broadcast; the k-sweep is a broadcast of
    {len(_COV_SIZES)} constants, so adding a size costs nothing.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    from target_hdfs_spark.sources.readers import fan_out

    tc = (
        fan_out(docs, "doc_id")
        .select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .localCheckpoint(eager=False)  # feeds total, rank x3 (kernel)
    )
    tot = tc.agg(F.sum("c").alias("total"))
    # frequency rank via the banded prefix sum — a web-scale vocabulary
    # (1e8+ types) never funnels through one window task. The tie key
    # routes a tied count run into sub-bands by the first two code
    # points (monotone in binary collation: UTF-8 byte order == code
    # point order, and a prefix keys <= its extensions via ascii('')=0)
    # cast BEFORE multiplying: ascii() is int32 and any first char
    # with codepoint >= 1928 (CJK, Devanagari, emoji, ...) overflows
    # 32-bit at *0x110000 — an ANSI-mode crash on exactly the
    # multilingual vocabulary this path exists for
    tie_key = F.ascii("tok").cast("long") * F.lit(0x110000) + F.ascii(
        F.substring("tok", 2, 1)
    ).cast("long")
    ranked = banded_cumsum(
        tc,
        F.lit(1),
        "c",
        "rnk",
        tie_col="tok",
        descending=True,
        tie_key=tie_key,
    ).crossJoin(F.broadcast(tot)).select("c", "rnk", "total")
    ks = F.explode(
        F.array(*[F.lit(k) for k in _COV_SIZES])
    ).alias("vocab_size")
    return (
        ranked.select("c", "rnk", "total", ks)
        .groupBy("vocab_size")
        .agg(
            F.sum(F.when(F.col("rnk") <= F.col("vocab_size"), F.col("c")).otherwise(0))
            .cast("long")
            .alias("covered_tokens"),
            F.any_value("total").cast("long").alias("total_tokens"),
            F.expr(
                "sum(CASE WHEN rnk <= vocab_size THEN c ELSE 0 END)"
                " * 1000000 div any_value(total)"
            )
            .cast("long")
            .alias("coverage_ppm"),
        )
        .select(
            F.col("vocab_size").cast("long").alias("vocab_size"),
            "covered_tokens",
            "total_tokens",
            "coverage_ppm",
        )
    )


# ---------------------------------------------------------------------------
# L4q: language-ID confusion matrix (classifier eval on the truth label)
# ---------------------------------------------------------------------------

_CONF_PRED_SQL = f"""
      CASE
        WHEN score_en = 0 AND score_es = 0 AND score_fr = 0 AND score_de = 0 THEN 'unknown'
        WHEN score_en >= score_es AND score_en >= score_fr AND score_en >= score_de THEN 'en'
        WHEN score_es >= score_fr AND score_es >= score_de THEN 'es'
        WHEN score_fr >= score_de THEN 'fr'
        ELSE 'de'
      END"""


@query(
    "q231_langid_confusion",
    oracle=f"""
    WITH scored AS (
      SELECT doc_id, lang AS actual_lang,
             {", ".join(f"{_score_sql(lang)} AS score_{lang}" for lang in _LANG_MARKERS)}
      FROM documents
    ),
    pred AS (
      SELECT actual_lang, {_CONF_PRED_SQL} AS predicted_lang FROM scored
    ),
    cells AS (
      SELECT actual_lang, predicted_lang, CAST(COUNT(*) AS BIGINT) AS n
      FROM pred GROUP BY 1, 2
    ),
    per_actual AS (
      SELECT actual_lang, CAST(SUM(n) AS BIGINT) AS n_actual FROM cells
      GROUP BY actual_lang
    )
    SELECT c.actual_lang, c.predicted_lang, c.n,
           CAST(c.n * 1000000 // p.n_actual AS BIGINT) AS recall_ppm
    FROM cells c JOIN per_actual p ON p.actual_lang = c.actual_lang
    """,
    tags=("text", "langid", "eval", "calibration"),
)
def q231_langid_confusion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONFUSION MATRIX for the q53 language-ID heuristic against the
    corpus truth label: per (actual, predicted) cell, the count and
    the per-class recall share — the eval readout that turns a
    classifier from "deployed" into "measured" (q188 value-pins the
    retrieval eval, q214 the dedup sketch, q230 the quantile sketch;
    this closes the loop on the classification surface). The diagonal
    is per-language recall; off-diagonal mass names the confusable
    pairs; the 'unknown' column is the coverage gap.

    Exactness: identical marker scoring + identical priority-ordered
    argmax on both sides (q53's pinned expressions reused verbatim),
    exact counts, one ppm division.

    Scale: scan-side scoring (array filters over the bound token
    array) + one map-side-combined aggregation onto the
    |langs|x(|langs|+1) cell frame; the per-actual totals roll up
    from the cells, never rescanning the corpus.
    """
    with_toks = load_table(spark, sf_dir, "documents").select(
        "doc_id", "lang", tokens("text").alias("_toks")
    )

    def _is_marker(ms: tuple[str, ...]):
        return lambda x: x.isin(list(ms))

    scores = {
        lang: F.size(F.filter(F.col("_toks"), _is_marker(ms)))
        for lang, ms in _LANG_MARKERS.items()
    }
    scored = with_toks.select(
        F.col("lang").alias("actual_lang"),
        *[c.alias(f"score_{lang}") for lang, c in scores.items()],
    )
    s = {lang: F.col(f"score_{lang}") for lang in _LANG_MARKERS}
    predicted = (
        F.when(
            (s["en"] == 0) & (s["es"] == 0) & (s["fr"] == 0) & (s["de"] == 0),
            "unknown",
        )
        .when(
            (s["en"] >= s["es"]) & (s["en"] >= s["fr"]) & (s["en"] >= s["de"]), "en"
        )
        .when((s["es"] >= s["fr"]) & (s["es"] >= s["de"]), "es")
        .when(s["fr"] >= s["de"], "fr")
        .otherwise("de")
    )
    cells = (
        scored.select("actual_lang", predicted.alias("predicted_lang"))
        .groupBy("actual_lang", "predicted_lang")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("actual_lang")
    return cells.select(
        "actual_lang",
        "predicted_lang",
        "n",
        F.expr("n * 1000000").cast("long").alias("_num"),
        F.sum("n").over(w).alias("_den"),
    ).select(
        "actual_lang",
        "predicted_lang",
        "n",
        F.expr("_num div _den").cast("long").alias("recall_ppm"),
    )


# ---------------------------------------------------------------------------
# L4p: CountMin sketch calibration — deterministic, exactly
# oracle-checkable (the frequency-sketch counterpart of q239's KMV)
# ---------------------------------------------------------------------------

_CM_ROWS = 4
_CM_WIDTH = 512
_CM_TOPK = 20
_CM_COEFFS = hash_coeffs(_CM_ROWS)


def _cm_bucket_sql(i: int) -> str:
    a, b = _CM_COEFFS[i]
    return f"(({a} * h + {b}) % {MERSENNE_P}) % {_CM_WIDTH}"


@query(
    "q240_countmin_calibration",
    oracle=f"""
    WITH tok AS (
      SELECT unnest({_TOK}) AS tok FROM documents
    ),
    vf AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c,
             {md5_hash32_sql("tok")} AS h
      FROM tok GROUP BY tok
    ),
    cells AS (
      {" UNION ALL ".join(
          f"SELECT {i} AS r, {_cm_bucket_sql(i)} AS bkt,"
          f" CAST(SUM(c) AS BIGINT) AS cell FROM vf GROUP BY 2"
          for i in range(_CM_ROWS))}
    ),
    top AS (
      SELECT tok, c, h,
             row_number() OVER (ORDER BY c DESC, tok) AS rnk
      FROM vf
    ),
    probes AS (
      SELECT t.tok, t.c, t.rnk, x.r,
             CASE x.r {" ".join(
                 f"WHEN {i} THEN {_cm_bucket_sql(i).replace('h', 't.h')}"
                 for i in range(_CM_ROWS))} END AS bkt
      FROM top t CROSS JOIN (SELECT unnest(generate_series(0, {_CM_ROWS - 1})) AS r) x
      WHERE t.rnk <= {_CM_TOPK}
    )
    SELECT p.tok, p.c AS exact_c, CAST(p.rnk AS BIGINT) AS rnk,
           CAST(MIN(cl.cell) AS BIGINT) AS est_c,
           CAST((MIN(cl.cell) - p.c) * 1000000 // p.c AS BIGINT) AS over_ppm
    FROM probes p JOIN cells cl ON cl.r = p.r AND cl.bkt = p.bkt
    GROUP BY p.tok, p.c, p.rnk
    """,
    tags=("sketch", "text", "calibration", "observability"),
)
def q240_countmin_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT-MIN sketch calibration: a {_CM_ROWS}x{_CM_WIDTH}
    CountMin built from the engine's portable hash family (the
    minhash coefficient table over the md5-32 base hash), point-probed
    for the exact top-{_CM_TOPK} tokens — estimate vs truth with the
    one-sided overestimate in ppm. Like q239 (KMV) this retires the
    "sketches are engine-specific" caveat for a second family: every
    cell and every probe is a deterministic integer, so the DuckDB
    oracle rebuilds the identical sketch and the calibration is
    value-checked end-to-end (q214 does this for minhash-vs-Jaccard;
    q230 for histogram quantiles). CountMin never underestimates —
    over_ppm >= 0 is a structural invariant the oracle enforces by
    value.

    Scale: ONE corpus token pass collapses to the |vocab| frequency
    frame; the sketch build is a map-side bucket expression + an
    aggregation onto the {_CM_ROWS}x{_CM_WIDTH}-bounded cell frame
    per row (union of {_CM_ROWS} vocab-frame passes over one
    checkpointed frame); probes touch {_CM_TOPK} tokens x {_CM_ROWS}
    cells with a broadcast join. Nothing after the token count scales
    with the corpus.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    vf = (
        fan_out(docs, "doc_id")
        .select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
        .select("tok", "c", md5_hash32(F.col("tok")).alias("h"))
        .localCheckpoint()  # feeds the sketch build AND the probes
    )
    cells = None
    for i, (a, b) in enumerate(_CM_COEFFS):
        part = vf.groupBy(
            ((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P % _CM_WIDTH).alias(
                "bkt"
            )
        ).agg(F.sum("c").alias("cell")).select(
            F.lit(i).alias("r"), "bkt", "cell"
        )
        cells = part if cells is None else cells.unionByName(part)
    w_rank = Window.orderBy(F.col("c").desc(), "tok")
    top = (
        vf.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") <= _CM_TOPK)
    )
    probes = None
    for i, (a, b) in enumerate(_CM_COEFFS):
        p = top.select(
            "tok",
            F.col("c").alias("exact_c"),
            F.col("rnk").cast("long").alias("rnk"),
            F.lit(i).alias("r"),
            ((F.lit(a) * F.col("h") + F.lit(b)) % MERSENNE_P % _CM_WIDTH).alias(
                "bkt"
            ),
        )
        probes = p if probes is None else probes.unionByName(p)
    return (
        cells.join(F.broadcast(probes), ["r", "bkt"])
        .groupBy("tok", "exact_c", "rnk")
        .agg(F.min("cell").cast("long").alias("est_c"))
        .select(
            "tok",
            "exact_c",
            "rnk",
            "est_c",
            F.expr("(est_c - exact_c) * 1000000 div exact_c")
            .cast("long")
            .alias("over_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# L4q: top-k vocabulary stability (drift telemetry between corpus
# halves — the "did the distribution move" gate)
# ---------------------------------------------------------------------------

_STAB_DEPTHS = (10, 25, 50)


@query(
    "q244_topk_stability",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id % 2 AS half, unnest({_TOK}) AS tok FROM documents
    ),
    tc AS (
      SELECT half, tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM tok GROUP BY half, tok
    ),
    ranked AS (
      SELECT half, tok,
             row_number() OVER (PARTITION BY half
                                ORDER BY c DESC, tok) AS rn
      FROM tc
    ),
    joined AS (
      SELECT a.rn AS rn_a, b.rn AS rn_b
      FROM (SELECT tok, rn FROM ranked WHERE half = 0
              AND rn <= {max(_STAB_DEPTHS)}) a
      JOIN (SELECT tok, rn FROM ranked WHERE half = 1
              AND rn <= {max(_STAB_DEPTHS)}) b
        ON b.tok = a.tok
    )
    {" UNION ALL ".join(
        f"SELECT CAST({d} AS BIGINT) AS depth,"
        f" CAST(COUNT(CASE WHEN rn_a <= {d} AND rn_b <= {d}"
        f" THEN 1 END) AS BIGINT) AS n_common,"
        f" CAST(COUNT(CASE WHEN rn_a <= {d} AND rn_b <= {d}"
        f" THEN 1 END) * 1000000 // {d} AS BIGINT) AS overlap_ppm"
        f" FROM joined"
        for d in _STAB_DEPTHS)}
    """,
    tags=("text", "drift", "topk", "observability"),
)
def q244_topk_stability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-K VOCABULARY STABILITY between two deterministic corpus
    halves (doc_id parity): the overlap of each half's top-d tokens
    at depths {_STAB_DEPTHS} — the cheap drift gate that answers
    "did the token distribution move between these two slices"
    before anything expensive retrains (swap the parity split for
    yesterday/today partitions and this is the production daily
    check; q197 gates on volume anomalies, this gates on CONTENT
    rank movement). overlap_ppm = |top_d(A) ∩ top_d(B)| / d.

    Exactness: exact counts, total-order (count desc, token) ranks,
    integer overlap ratios — both engines agree bit-for-bit.

    Scale: one corpus token pass to the |half x vocab| count frame;
    ranking compiles to WindowGroupLimit (each task keeps its local
    top-{max(_STAB_DEPTHS)} per half before the shuffle); the depth
    rollup is a conditional aggregation over a <= {max(_STAB_DEPTHS)}
    -row join.
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    tc = (
        fan_out(docs, "doc_id")
        .select(
            (F.col("doc_id") % 2).alias("half"),
            F.explode(tokens("text")).alias("tok"),
        )
        .groupBy("half", "tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    w = Window.partitionBy("half").orderBy(F.col("c").desc(), "tok")
    ranked = (
        tc.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= max(_STAB_DEPTHS))
        .localCheckpoint()  # both join sides read it
    )
    a = ranked.filter(F.col("half") == 0).select("tok", F.col("rn").alias("rn_a"))
    b = ranked.filter(F.col("half") == 1).select("tok", F.col("rn").alias("rn_b"))
    joined = a.join(b, "tok")
    out = None
    for d in _STAB_DEPTHS:
        hit = F.when((F.col("rn_a") <= d) & (F.col("rn_b") <= d), 1)
        row = joined.agg(
            F.count(hit).cast("long").alias("n_common")
        ).select(
            F.lit(d).cast("long").alias("depth"),
            "n_common",
            F.expr(f"n_common * 1000000 div {d}")
            .cast("long")
            .alias("overlap_ppm"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# Split balance audit: is the 80/10/10 hash split distributionally
# representative per slice, or did a small split draw a skewed sample?
# ---------------------------------------------------------------------------

_SPLIT_SQL = f"""
      SELECT doc_id, source, n_chars,
             CASE WHEN {md5_hash32_sql("'split:' || CAST(doc_id AS VARCHAR)")}
                       % 100 < 80 THEN 'train'
                  WHEN {md5_hash32_sql("'split:' || CAST(doc_id AS VARCHAR)")}
                       % 100 < 90 THEN 'val'
                  ELSE 'test' END AS split
      FROM documents
"""


@query(
    "q297_split_balance_audit",
    oracle=f"""
    WITH s AS ({_SPLIT_SQL}),
    g AS (
      SELECT split, source, CAST(SUM(n_chars) AS HUGEINT) AS chars
      FROM s GROUP BY split, source
    )
    SELECT split, source,
           CAST(chars AS BIGINT) AS split_chars,
           CAST(chars * 1000000 // SUM(chars) OVER (PARTITION BY split)
               AS BIGINT) AS split_share_ppm,
           CAST(SUM(chars) OVER (PARTITION BY source) * 1000000
                // SUM(chars) OVER () AS BIGINT) AS corpus_share_ppm,
           CAST(abs(chars * 1000000 // SUM(chars) OVER (PARTITION BY split)
                    - SUM(chars) OVER (PARTITION BY source) * 1000000
                      // SUM(chars) OVER ()) AS BIGINT) AS dev_ppm
    FROM g
    """,
    tags=("sample", "split", "drift"),
)
def q297_split_balance_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SPLIT BALANCE audit over q100's 80/10/10 hash split: per
    (split, source), the source's char share WITHIN the split vs its
    share of the whole corpus, and the absolute deviation in ppm —
    the representativeness check a leaderboard run needs before
    trusting val/test numbers (a 10% split can draw a skewed sample
    of a small source; large dev_ppm rows say WHERE the skew is and
    whether stratified assignment — q104's rule — is warranted).
    Shares are exact integer ppm; the split rule is q100's salted
    md5 bucket, so the audit describes precisely the split a training
    run would materialize.

    Scale: one scan-side split assignment (no shuffle to assign), one
    |splits| x |sources| (~60-row) aggregation; every window runs on
    that bounded frame (GLOBAL_WINDOW_BOUNDS waiver for the corpus
    total)."""
    docs = load_table(spark, sf_dir, "documents")
    bucket = (
        md5_hash32(
            F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
        )
        % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    g = (
        docs.select(
            split.alias("split"), "source", F.col("n_chars").cast("long")
        )
        .groupBy("split", "source")
        .agg(F.sum("n_chars").cast("decimal(38,0)").alias("chars"))
    )
    return g.select(
        "split",
        "source",
        F.col("chars").cast("long").alias("split_chars"),
        F.expr(
            "CAST(chars * 1000000 div SUM(chars)"
            " OVER (PARTITION BY split) AS BIGINT)"
        ).alias("split_share_ppm"),
        F.expr(
            "CAST(SUM(chars) OVER (PARTITION BY source) * 1000000"
            " div SUM(chars) OVER () AS BIGINT)"
        ).alias("corpus_share_ppm"),
        F.expr(
            "CAST(abs(chars * 1000000 div SUM(chars)"
            " OVER (PARTITION BY split)"
            " - SUM(chars) OVER (PARTITION BY source) * 1000000"
            " div SUM(chars) OVER ()) AS BIGINT)"
        ).alias("dev_ppm"),
    )
