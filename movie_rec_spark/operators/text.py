"""Text-analysis operators over the documents table.

Training-data-pipeline surface: token counting, quality scoring,
language-ID heuristic, document fingerprinting. Everything is built-in
Catalyst expressions (split/filter/transform/md5) — no Python in the hot
path, so at 100 TB these run inside whole-stage codegen right on top of
the parquet scan with column pruning down to (doc_id, text).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword sets for the n-gram/stopword heuristic.
STOP_EN = ("the", "a", "of", "and")
STOP_ROMANCE = ("el", "la", "de", "le", "et")


def _tokens(text: Column) -> Column:
    return F.split(text, " ")


def q_text_stats(documents: DataFrame) -> DataFrame:
    """Per-document quality stats: token count, char count, average token
    length, stopword ratio. The quality-score building blocks a filtering
    pipeline thresholds on."""
    w = _tokens(F.col("text"))
    n_tokens = F.size(w).cast("int")
    n_chars = F.length("text").cast("int")
    n_stop = F.size(F.filter(w, lambda t: t.isin(*STOP_EN))).cast("int")
    # Ratios stay UNROUNDED: per-row int/int division is bit-deterministic
    # across engines, while round() near an exact .xx5 tie diverges
    # (Spark rounds the shortest decimal repr, DuckDB the raw double).
    return documents.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        n_chars.alias("n_chars_calc"),
        (F.length(F.replace(F.col("text"), F.lit(" "), F.lit(""))) / n_tokens
         ).alias("avg_token_len"),
        n_stop.alias("n_stopwords"),
        (n_stop / n_tokens).alias("stopword_ratio"),
    )


def q_token_counts(documents: DataFrame) -> DataFrame:
    """Token counting two ways: whitespace split and a BPE-ish
    alphanumeric-run regex split — the two standard pre-tokenizers."""
    return documents.select(
        "doc_id",
        F.size(F.split(F.col("text"), " ")).cast("int").alias("n_ws_tokens"),
        F.size(F.split(F.col("text"), "[^a-zA-Z0-9]+")).cast("int").alias("n_re_tokens"),
    )


def q_lang_id(documents: DataFrame) -> DataFrame:
    """Language-ID heuristic: stopword-set hit counts → argmax with a
    deterministic tie order. (The synthetic corpus shares one vocabulary,
    so the point is the operator shape, not detector quality.)"""
    w = _tokens(F.col("text"))
    hits_en = F.size(F.filter(w, lambda t: t.isin(*STOP_EN)))
    hits_ro = F.size(F.filter(w, lambda t: t.isin(*STOP_ROMANCE)))
    guessed = (
        F.when((hits_en >= hits_ro) & (hits_en > 0), F.lit("en"))
        .when(hits_ro > 0, F.lit("ro"))
        .otherwise(F.lit("other"))
    )
    return documents.select(
        "doc_id",
        "lang",
        guessed.alias("guessed_lang"),
        (guessed == F.col("lang")).alias("is_match"),
    )


def q_doc_fingerprint(documents: DataFrame) -> DataFrame:
    """Document fingerprinting: full-content md5 plus a normalized
    (lowercased, space-squeezed) fingerprint — the keys exact and
    near-exact dedup bucket on."""
    norm = F.lower(F.regexp_replace(F.col("text"), " +", " "))
    return documents.select(
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("fp"),
        F.md5(norm.cast("binary")).alias("fp_norm"),
        F.substring(F.md5(F.col("text").cast("binary")), 1, 8).alias("fp_prefix"),
    )


def q_tfidf_top_terms(documents: DataFrame, top_k: int = 3) -> DataFrame:
    """TF-IDF as pure relational algebra (no MLlib HashingTF — exact
    terms, SQL-oracle-checkable): term frequency per (doc, term),
    document frequency per term, smoothed idf = ln((N+1)/(df+1)) + 1,
    top-k terms per doc by score with a deterministic (score, term)
    tie-break.

    Plan shape at scale: one shuffle for tf (doc, term), one tiny df
    agg broadcast back, WindowGroupLimit for the per-doc top-k. The
    score is rounded to 4 decimals BEFORE ranking so the cut is
    reproducible across engines (ln differs in the last ulp).
    """
    from pyspark.sql.window import Window

    toks = documents.select(
        "doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(
        F.count(F.lit(1)).alias("tf"))
    n_docs = documents.select(
        F.countDistinct("doc_id").alias("n_docs"))
    df_ = toks.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df"))
    scored = (
        tf.join(F.broadcast(df_), "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn(
            "tfidf",
            F.round(
                F.col("tf")
                * (F.log((F.col("n_docs") + 1.0) / (F.col("df") + 1.0)) + 1.0),
                4,
            ),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(
        F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top_k)
        .select("doc_id", "term", F.col("tf").cast("long").alias("tf"),
                "tfidf", F.col("rn").cast("int").alias("rn"))
    )
