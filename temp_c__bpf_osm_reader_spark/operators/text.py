"""Text-analysis operators over the `documents` table — the training-data
pipeline layer (language-ID heuristic, quality scoring, token counting,
fingerprinting, exact dedup). All JVM-side built-ins; the fingerprint uses
md5 (identical semantics in Spark and DuckDB → oracle-exact).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

STOPWORDS = {
    "en": ["the", "a", "of"],
    "fr": ["le", "la", "et"],
    "de": ["der", "die", "und"],
    "es": ["el", "los", "de"],
}


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))


def _count_token(col, word):
    """# of occurrences of ' word ' in ' text ' — length-difference trick,
    expressible identically in DuckDB."""
    padded = F.concat(F.lit(" "), col, F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.regexp_replace(padded, needle, " ")))
        / (len(needle) - 1)
    ).cast("bigint")


def token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, n_tokens, n_chars2, punct_ratio, upper_ratio) — quality raw signals."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_punct = F.length(F.col("text")) - F.length(
        F.regexp_replace(F.col("text"), "[.,;:!?]", "")
    )
    return d.select(
        "doc_id",
        F.size(toks).cast("bigint").alias("n_tokens"),
        F.length("text").cast("bigint").alias("n_chars2"),
        F.round(n_punct / F.length("text"), 6).alias("punct_ratio"),
    )


def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frozen heuristic language ID: CJK chars → zh; else argmax stopword votes
    with priority order en > fr > de > es; all-zero votes → 'und'.

    (The driver's `lang` column is a synthetic label over a shared vocabulary —
    the operator's contract is the deterministic heuristic, not label recovery.)
    """
    d = _docs(spark, sf_dir)
    votes = {
        lang: sum((_count_token(F.col("text"), w) for w in ws), F.lit(0).cast("bigint"))
        for lang, ws in STOPWORDS.items()
    }
    best = F.greatest(*votes.values())
    pred = (
        F.when(F.col("text").rlike("[一-鿿]"), "zh")
        .when(best == 0, "und")
        .when(votes["en"] == best, "en")
        .when(votes["fr"] == best, "fr")
        .when(votes["de"] == best, "de")
        .otherwise("es")
    )
    return d.select("doc_id", pred.alias("pred_lang"))


def quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite quality score in [0,1]: length band + mean token length band +
    punctuation penalty. Frozen formula; rounded to 6."""
    d = _docs(spark, sf_dir)
    toks = F.split(F.col("text"), " ")
    n_tok = F.size(toks).cast("double")
    mean_tok_len = (F.length("text") - n_tok + 1) / n_tok
    len_score = F.least(n_tok / 64.0, F.lit(1.0))
    tok_score = F.when((mean_tok_len >= 3.0) & (mean_tok_len <= 8.0), 1.0).otherwise(0.5)
    n_punct = F.length("text") - F.length(F.regexp_replace(F.col("text"), "[.,;:!?]", ""))
    punct_pen = F.least(n_punct / F.length("text") * 5.0, F.lit(0.5))
    score = F.round(0.5 * len_score + 0.5 * tok_score - punct_pen, 6)
    return d.select("doc_id", score.alias("quality"))


def fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint: md5(lower(text) stripped of [.,;:!?]).

    md5 is byte-identical across Spark and DuckDB — a genuinely shared spec
    (the role the rolling hash plays in single-node dedup pipelines)."""
    d = _docs(spark, sf_dir)
    norm = F.regexp_replace(F.lower(F.col("text")), "[.,;:!?]", "")
    return d.select("doc_id", F.md5(norm).alias("fp"))


def exact_dedup_groups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate groups: same md5(text) — (fp, n_dups, canonical_doc_id).
    Scale path: hash-groupBy (map-side partial agg; no full-text shuffle)."""
    d = _docs(spark, sf_dir)
    return (
        d.select("doc_id", F.md5("text").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("doc_id").alias("canonical_doc_id"))
        .filter(F.col("n_dups") > 1)
    )


def caption_exact_dedup(spark: SparkSession, sf_dir: str, images_path: str) -> DataFrame:
    """Exact caption dedup over the images fixture (dup clusters by design)."""
    images = spark.read.parquet(images_path)
    return (
        images.select("image_id", F.md5("caption").alias("fp"))
        .groupBy("fp")
        .agg(F.count(F.lit(1)).alias("n_dups"), F.min("image_id").alias("canonical"))
        .filter(F.col("n_dups") > 1)
    )


def ngram_jaccard_pairs(
    spark: SparkSession, sf_dir: str, n: int = 3, threshold: float = 0.5
) -> DataFrame:
    """Near-dup pairs by exact word-n-gram Jaccard ≥ threshold.

    Plan: distinct n-gram shingles per doc (JVM transform over split tokens) →
    self-equi-join on shingle → per-pair intersection counts → Jaccard.
    At scale the shingle join shuffles on the shingle hash — the standard
    exact-verification stage after LSH prefiltering (dedup.py)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    grams = d.select(
        "doc_id",
        F.explode(
            F.array_distinct(
                F.expr(
                    # greatest(..., 1): short docs yield one whole-text gram,
                    # and sequence(1, 0) in Spark would count DOWN, not empty
                    f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 1)), "
                    f"i -> concat_ws(' ', slice(split(text, ' '), i, {n})))"
                )
            )
        ).alias("gram"),
    )
    sizes = grams.groupBy("doc_id").agg(F.count(F.lit(1)).alias("sz"))
    g1 = grams.alias("g1")
    g2 = grams.alias("g2")
    inter = (
        g1.join(g2, (F.col("g1.gram") == F.col("g2.gram")) & (F.col("g1.doc_id") < F.col("g2.doc_id")))
        .groupBy(F.col("g1.doc_id").alias("doc1"), F.col("g2.doc_id").alias("doc2"))
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    s1 = sizes.select(F.col("doc_id").alias("doc1"), F.col("sz").alias("sz1"))
    s2 = sizes.select(F.col("doc_id").alias("doc2"), F.col("sz").alias("sz2"))
    jac = F.col("inter") / (F.col("sz1") + F.col("sz2") - F.col("inter"))
    return (
        inter.join(s1, "doc1")
        .join(s2, "doc2")
        .withColumn("jaccard", F.round(jac, 6))
        .filter(F.col("jaccard") >= threshold)
        .select("doc1", "doc2", "jaccard")
    )


def decontaminate(
    spark: SparkSession, sf_dir: str, n: int = 5, bench_mod: int = 97
) -> DataFrame:
    """Benchmark decontamination — the training-corpus hygiene step every
    LLM data pipeline runs before training: flag corpus documents that
    share any word n-gram with a held-out benchmark set, so eval data
    can't leak into the training set.

    The benchmark here is the deterministic slice doc_id % bench_mod == 0
    (standing in for an external eval set); a corpus doc is contaminated
    when any of its distinct n-grams appears in any benchmark doc.  Output
    (doc_id, n_hits, witness_gram): number of distinct leaked n-grams and
    the lexicographically-first one as the auditable witness.

    Plan: in production the benchmark is a FIXED external eval set (its
    gram count does not grow with the corpus), so its distinct-gram set
    broadcasts and the join is map-side — no shuffle of the corpus grams
    at any corpus size.  Here the benchmark is derived as a 1/bench_mod
    slice of the corpus, which DOES grow linearly, so the broadcast hint
    is size-gated: above `max_broadcast_bench_docs` estimated benchmark
    docs the hint is dropped and Catalyst plans a shuffle join instead
    (same rows, no 8 GB-broadcast / driver-OOM hazard).  The 100-TB-safe
    bound is therefore the eval set's size, never the corpus.
    """
    d = _docs(spark, sf_dir).select("doc_id", "text")
    gram_expr = (
        f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i, {n})))"
    )
    grams = d.select(
        "doc_id", F.explode(F.array_distinct(F.expr(gram_expr))).alias("gram")
    )
    is_bench = F.col("doc_id") % bench_mod == 0
    bench_grams = grams.where(is_bench).select("gram").distinct()
    # estimate the benchmark-doc count from parquet footer metadata (no
    # Spark action): gate the forced broadcast on it
    max_broadcast_bench_docs = 200_000
    try:
        import pyarrow.parquet as _pq

        n_docs = _pq.ParquetFile(
            os.path.join(sf_dir, "documents.parquet")
        ).metadata.num_rows
    except Exception:  # noqa: BLE001 — metadata probe is best-effort
        n_docs = None
    small_bench = n_docs is not None and n_docs // bench_mod <= max_broadcast_bench_docs
    bench_side = F.broadcast(bench_grams) if small_bench else bench_grams
    return (
        grams.where(~is_bench)
        .join(bench_side, "gram")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_hits"),
            F.min("gram").alias("witness_gram"),
        )
    )


def repetition_stats(spark: SparkSession, sf_dir: str, n: int = 2) -> DataFrame:
    """Repetition quality signal (the Gopher-rules "fraction of characters
    in the most common n-gram" family): per document, the total n-gram
    count and the single most frequent n-gram with its multiplicity —
    heavy repetition (top_gram_n / n_grams high) marks boilerplate and
    degenerate generations a training pipeline filters out.

    Determinism: the top gram ties break by (count DESC, gram DESC) via
    one window row_number — identical ordering semantics in the DuckDB
    oracle, so the winner is engine-independent. Exact integers only.

    Plan: non-distinct gram explode (same JVM transform/slice expression
    as the dedup family) → map-side-combinable groupBy (doc_id, gram) →
    per-doc window on the gram-count table (state bounded by distinct
    grams per doc, ≤ tokens). Two doc-keyed shuffles, text never shuffles
    beyond its own grams.
    """
    from pyspark.sql import Window

    d = _docs(spark, sf_dir).select("doc_id", "text")
    gram_expr = (
        f"transform(sequence(1, greatest(size(split(text, ' ')) - {n - 1}, 1)), "
        f"i -> concat_ws(' ', slice(split(text, ' '), i, {n})))"
    )
    counts = (
        d.select("doc_id", F.explode(F.expr(gram_expr)).alias("gram"))
        .groupBy("doc_id", "gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("cnt"), F.desc("gram"))
    return (
        counts.withColumn("total", F.sum("cnt").over(Window.partitionBy("doc_id")))
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "doc_id",
            F.col("total").alias("n_grams"),
            F.col("cnt").alias("top_gram_n"),
            F.col("gram").alias("top_gram"),
        )
    )
