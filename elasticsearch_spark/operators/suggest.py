"""Suggesters + the `_explain` API analog.

- **term suggester** (``server/src/main/java/org/elasticsearch/search/
  suggest/term/TermSuggestionBuilder.java``): edit-distance candidates from
  the term dictionary (the build-time stats table = the live term dict),
  ranked like the reference: exact-match terms are skipped unless
  ``suggest_mode='always'``; candidates sorted by (edit distance ASC,
  doc frequency DESC, term ASC).
- **phrase suggester** (lite): per-token best correction joined back into
  the phrase (the reference's candidate-generator layer without the
  language-model rescoring).
- **explain** (``server/.../action/explain/TransportExplainAction.java``):
  per-(query-term, doc) score breakdown — tf, df, idf, quantized dl, and
  the BM25 contribution, reproducing exactly what the scorer computes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions import analysis
from ..sources import index_store as store


def term_suggest(
    spark: SparkSession,
    index_dir: str,
    text: str,
    max_edits: int = 2,
    size: int = 3,
    suggest_mode: str = "missing",
) -> DataFrame:
    """Per input token: up to `size` corrections from the term dictionary.

    Returns (token, suggestion, distance, df) — one row per suggestion,
    ordered (token, distance ASC, df DESC, suggestion ASC)."""
    meta = store.IndexMeta.load(index_dir)
    tokens = list(dict.fromkeys(analysis.analyze(text, meta.analyzer)))
    terms = spark.read.parquet(store.term_stats_path(index_dir)).select("term", "df")
    toks_df = spark.createDataFrame([(t,) for t in tokens], "token string")
    existing = {
        r["token"]
        for r in toks_df.join(terms, F.col("token") == F.col("term"), "left_semi").collect()
    }
    if suggest_mode == "missing":
        tokens = [t for t in tokens if t not in existing]
        toks_df = spark.createDataFrame([(t,) for t in tokens], "token string") if tokens else None
    if not tokens or toks_df is None:
        return spark.createDataFrame([], "token string, suggestion string, distance int, df long")

    # candidate join: length-banded crossJoin (|len(a)-len(b)| ≤ max_edits
    # bounds Levenshtein) keeps the term-dict scan tight
    cand = (
        terms.join(F.broadcast(toks_df))
        .where(F.abs(F.length("term") - F.length("token")) <= max_edits)
        .withColumn("distance", F.levenshtein("term", "token"))
        .where((F.col("distance") <= max_edits) & (F.col("distance") > 0))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("token").orderBy(
        F.asc("distance"), F.desc("df"), F.asc("term")
    )
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= size)
        .select("token", F.col("term").alias("suggestion"), "distance", "df")
        .orderBy("token", "distance", F.desc("df"), "suggestion")
    )


def build_completion_index(
    spark: SparkSession,
    index_dir: str,
    suggestions: DataFrame,
    input_col: str = "suggestion",
    weight_col: str | None = None,
) -> None:
    """Materialize a completion-suggester table (the ``completion`` field
    mapping, ``server/.../search/suggest/completion/CompletionFieldMapper
    .java``): (suggestion, weight) sorted by suggestion so a prefix probe
    is a range scan over parquet row-group stats — the FST-prefix-walk
    analog. weight defaults to 1 (ES's default when no weight supplied)."""
    import os

    w = F.col(weight_col).cast("long") if weight_col else F.lit(1).cast("long")
    out = (
        suggestions.select(F.col(input_col).alias("suggestion"), w.alias("weight"))
        .groupBy("suggestion")
        .agg(F.max("weight").alias("weight"))
        .repartition(1)
        .sortWithinPartitions("suggestion")
    )
    path = os.path.join(index_dir, "completion")
    out.write.mode("overwrite").parquet(path)


def completion_suggest(
    spark: SparkSession,
    index_dir: str,
    prefix: str,
    size: int = 5,
    fuzziness: int = 0,
) -> DataFrame:
    """Completion suggester (``server/.../search/suggest/completion/
    CompletionSuggestionBuilder.java:46``): search-as-you-type prefix →
    top-``size`` suggestions by (weight DESC, suggestion ASC — the
    reference's sortedWeight comparator with a deterministic tie-break).

    Source table: the dedicated completion table when built
    (``build_completion_index``), else the live TERM DICTIONARY with df as
    the weight (the stats table doubles as the suggestion FST, the same
    reuse as the term suggester).

    Exact prefix (default) compiles to a RANGE predicate on the
    suggestion-sorted parquet — row-group pruning makes the probe
    O(matching range), the scan analog of an FST prefix walk. fuzziness>0
    (FuzzyOptions, Levenshtein over the typed prefix) relaxes the probe to
    an edit-distance filter on the prefix-length head of each entry; the
    first character must still match (ES's default
    ``prefix_length=1``-style transposition guard), preserving a 1-char
    range prune."""
    import os

    comp_path = os.path.join(index_dir, "completion")
    if os.path.isdir(comp_path):
        src = spark.read.parquet(comp_path)
    else:
        src = (
            spark.read.parquet(store.term_stats_path(index_dir))
            .select(F.col("term").alias("suggestion"), F.col("df").cast("long").alias("weight"))
        )
    if fuzziness <= 0:
        hit = src.where(F.col("suggestion").startswith(prefix))
    else:
        head = F.substring("suggestion", 1, len(prefix))
        hit = src.where(
            F.col("suggestion").startswith(prefix[:1])
            & (F.levenshtein(head, F.lit(prefix)) <= fuzziness)
        )
    return (
        hit.orderBy(F.desc("weight"), F.asc("suggestion"))
        .limit(size)
        .select("suggestion", "weight")
    )


def phrase_suggest(
    spark: SparkSession, index_dir: str, text: str, max_edits: int = 2
) -> str:
    """Phrase correction: each token replaced by its best dictionary
    candidate (kept verbatim when in-dictionary)."""
    meta = store.IndexMeta.load(index_dir)
    tokens = analysis.analyze(text, meta.analyzer)
    best = {
        r["token"]: r["suggestion"]
        for r in term_suggest(spark, index_dir, text, max_edits=max_edits, size=1).collect()
    }
    return " ".join(best.get(t, t) for t in tokens)


def explain(
    spark: SparkSession, index_dir: str, query_terms: list[str], url: str
) -> DataFrame:
    """Score breakdown for one doc: per matching query term — tf, df, idf,
    quantized dl, avgdl, and the BM25 contribution (sums to the hit's
    score; the `_explain` API shape)."""
    meta = store.IndexMeta.load(index_dir)
    docs = spark.read.parquet(*store.docs_glob(index_dir))
    row = docs.where(F.col("url") == url).select("doc_id", "text", "dl").first()
    if row is None:
        return spark.createDataFrame(
            [], "term string, tf long, df long, idf double, ql double, contribution double"
        )
    toks = analysis.analyze(row["text"], meta.analyzer)
    from collections import Counter

    from ..functions import bm25
    from ..functions.smallfloat import quantize_length

    c = Counter(toks)
    ql = float(quantize_length(int(row["dl"])))
    stats = {
        r["term"]: int(r["df"])
        for r in spark.read.parquet(store.term_stats_path(index_dir))
        .where(F.col("term").isin(list(dict.fromkeys(query_terms))))
        .collect()
    }
    out = []
    for t in dict.fromkeys(query_terms):
        tf = c.get(t, 0)
        if tf == 0 or t not in stats:
            continue
        df_ = stats[t]
        idf = float(bm25.idf(df_, meta.doc_count))
        contrib = (
            idf * (meta.k1 + 1.0) * tf / (tf + meta.k1 * (1 - meta.b + meta.b * ql / meta.avgdl))
        )
        out.append((t, tf, df_, idf, ql, contrib))
    return spark.createDataFrame(
        out, "term string, tf long, df long, idf double, ql double, contribution double"
    )
