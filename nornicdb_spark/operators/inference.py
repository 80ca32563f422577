"""Automatic relationship inference — batch twins of the reference's
inference engine (pkg/inference/inference.go: similarity / co-access /
temporal proximity / transitive methods; co-access + temporal live in
streaming/sessions.py).

Suggestions carry (src, dst, rel_type, confidence, method) matching the
reference's EdgeSuggestion (inference.go:95-101).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def score_to_confidence(score: F.Column) -> F.Column:
    """Similarity score → edge confidence band (reference
    inference.go:784-797 scoreToConfidence)."""
    return (
        F.when(score >= 0.95, 0.9)
        .when(score >= 0.90, 0.7)
        .when(score >= 0.85, 0.5)
        .otherwise(0.3)
    )


def similarity_edges(
    embeddings: DataFrame,
    threshold: float = 0.85,
    top_k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exact: bool = True,
) -> DataFrame:
    """Similarity-based RELATES_TO suggestions: for each node, its top-k
    cosine neighbors scoring ≥ threshold (reference inference.go:505-525
    OnStore similarity pass). Pair generation reuses the block-grid /
    LSH machinery of the dedup family (no CartesianProduct; ``exact=
    False`` is the sublinear 100 TB path), then orients each undirected
    pair both ways and keeps the per-source top-k by a keyed window.
    Returns (src, dst, rel_type, score, confidence, method)."""
    from nornicdb_spark.operators.dedup import embedding_near_duplicates

    pairs = embedding_near_duplicates(
        embeddings, threshold=threshold, id_col=id_col, vec_col=vec_col,
        exact=exact,
    ).select("a", "b", F.col("cosine").alias("score"))
    both = pairs.unionByName(
        pairs.select(
            F.col("b").alias("a"), F.col("a").alias("b"), "score"
        )
    )
    w = Window.partitionBy("a").orderBy(F.desc("score"), F.asc("b"))
    return (
        both.withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= top_k)
        .select(
            F.col("a").alias("src"),
            F.col("b").alias("dst"),
            F.lit("RELATES_TO").alias("rel_type"),
            "score",
            score_to_confidence(F.col("score")).alias("confidence"),
            F.lit("similarity").alias("method"),
        )
    )


def transitive_edges(
    edges: DataFrame,
    min_confidence: float = 0.3,
    src_col: str = "src",
    dst_col: str = "dst",
    conf_col: str = "confidence",
) -> DataFrame:
    """Transitive inference: A→B, B→C ⇒ A→C with confidence
    conf(AB)·conf(BC), skipping cycles back to the origin (reference
    inference.go:740-772). Batch form aggregates the best path per
    (A, C): max confidence + supporting-path count. One self-join on the
    shared midpoint — shuffles on B, never materializes the closure.
    Returns (src, dst, rel_type, confidence, n_paths, method)."""
    e1 = edges.select(
        F.col(src_col).alias("a"),
        F.col(dst_col).alias("b"),
        F.col(conf_col).alias("c1"),
    )
    e2 = edges.select(
        F.col(src_col).alias("b"),
        F.col(dst_col).alias("c"),
        F.col(conf_col).alias("c2"),
    )
    return (
        e1.join(e2, "b")
        .filter(F.col("a") != F.col("c"))
        .withColumn("conf", F.col("c1") * F.col("c2"))
        .filter(F.col("conf") >= min_confidence)
        .groupBy(F.col("a").alias("src"), F.col("c").alias("dst"))
        .agg(
            F.max("conf").alias("confidence"),
            F.count(F.lit(1)).cast("long").alias("n_paths"),
        )
        .select(
            "src", "dst", F.lit("RELATES_TO").alias("rel_type"),
            "confidence", "n_paths", F.lit("transitive").alias("method"),
        )
    )
