"""Maintained incremental near-dup index — the 100 TB ingest loop.

``stream_dedup_near_dup`` (queries/temporal.py) probes a STATIC banded
snapshot; production ingest needs accepted-new-documents appended to the
index so later batches can match them (reference dedup behavior on
ingest: pkg/embeddings/dedup.go near-duplicate gate runs against the
live store, not a frozen one). :class:`MaintainedBandIndex` is that
loop as Structured Streaming ``foreachBatch`` over a parquet-backed,
band-partitioned index table.

Layout (normalized — band rows do NOT duplicate the hash sets):

- ``<path>/bands``  : (doc, band, band_key)   — written partitionBy(band)
- ``<path>/hashes`` : (doc, hs array<bigint>) — the exact-verify side
- ``<path>/matches``: (stream_doc, corpus_doc, jaccard, batch_id)

Per micro-batch of n_b docs against a corpus of N docs:
  probe      = equi-join n_b·B band rows against the bands table —
               touches ~n_b·B/buckets of it, never the full corpus
  verify     = exact Jaccard on candidate pairs only (semi-join pulls
               just the candidate docs' hash sets)
  maintain   = append accepted (non-dup) docs' B band rows + 1 hash row;
               cost O(n_b), independent of N
so steady-state ingest is O(n_b) work per batch with a probe that scales
with bucket occupancy, not corpus size (see SCALING.md cost model).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nornicdb_spark.operators import scope
from nornicdb_spark.sources.layout import write_partitioned
from nornicdb_spark.operators.dedup import (
    N_BANDS,
    N_PERMS,
    minhash_band_keys_col,
    shingle_hashes_col,
)

__all__ = ["MaintainedBandIndex"]


class MaintainedBandIndex:
    """Parquet-backed MinHash band index with dedup-gated ingest.

    New documents are near-dup-checked against the CURRENT index (which
    includes docs accepted in earlier batches); matches are recorded and
    rejected, novel docs are appended to the index. Intra-batch pairs are
    deliberately not compared — each doc is judged against the accepted
    corpus as of its batch, the reference's ingest-time semantics.
    """

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        threshold: float = 0.5,
        shingle_n: int = 3,
        n_perms: int = N_PERMS,
        n_bands: int = N_BANDS,
        id_col: str = "doc_id",
        text_col: str = "text",
        max_per_bucket: int | None = 128,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.threshold = float(threshold)
        self.shingle_n = shingle_n
        self.n_perms = n_perms
        self.n_bands = n_bands
        self.id_col = id_col
        self.text_col = text_col
        # Hot-bucket ceiling (the hub-cap discipline of
        # dedup.max_shingle_df / sessions.max_keys_per_window): a massive
        # duplicate cluster makes its band buckets hot, and an uncapped
        # probe join would emit candidates ∝ cluster size for every
        # probing doc. Bucket members are near-identical by construction,
        # so the index retains a deterministic md5-order sample of
        # ``max_per_bucket`` docs per (band, band_key) — any future
        # near-dup of the cluster still collides with the retained
        # members, so detection recall is preserved while the candidate
        # stream is bounded at B·max_per_bucket per probing doc.
        # ``None`` disables the cap.
        self.max_per_bucket = max_per_bucket

    # -- paths ------------------------------------------------------------
    @property
    def bands_path(self) -> str:
        return f"{self.path}/bands"

    @property
    def hashes_path(self) -> str:
        return f"{self.path}/hashes"

    @property
    def matches_path(self) -> str:
        return f"{self.path}/matches"

    # -- schemas (explicit on every read-back: an appended empty batch
    #    leaves a fileless dir Spark cannot infer a schema from) ----------
    def _id_type(self, docs: DataFrame) -> str:
        return docs.schema[self.id_col].dataType.simpleString()

    def _read(self, path: str, schema: str) -> DataFrame:
        return self.spark.read.schema(schema).parquet(path)

    # -- index-row derivation (per-row narrow expressions, no explode
    #    state, no groupBy — safe inside a micro-batch) -------------------
    def _rows(self, docs: DataFrame) -> DataFrame:
        """(doc, hs, band, band_key) for each doc with ≥1 shingle."""
        hs = docs.select(
            F.col(self.id_col).alias("doc"),
            shingle_hashes_col(self.text_col, n=self.shingle_n).alias("hs"),
        ).filter(F.size("hs") > 0)
        return hs.select(
            "doc",
            "hs",
            F.posexplode(
                minhash_band_keys_col(
                    F.col("hs"), n_perms=self.n_perms, n_bands=self.n_bands
                )
            ).alias("band", "band_key"),
        )

    def _bucket_cap(self, rows: DataFrame, headroom: DataFrame | None = None) -> DataFrame:
        """Drop band rows beyond the per-bucket ceiling, keeping the
        md5(doc)-order sample (deterministic, id-uncorrelated). With
        ``headroom`` — (band, band_key, _occ) occupancy of the CURRENT
        index for the touched buckets — appended rows only fill what's
        left of each bucket."""
        if self.max_per_bucket is None:
            return rows
        from pyspark.sql import Window as W

        w = W.partitionBy("band", "band_key").orderBy(
            F.md5(F.col("doc").cast("string")), F.col("doc")
        )
        ranked = rows.withColumn("_r", F.row_number().over(w))
        if headroom is not None:
            ranked = ranked.join(headroom, ["band", "band_key"], "left")
            keep = F.col("_r") + F.coalesce(F.col("_occ"), F.lit(0)) <= F.lit(
                self.max_per_bucket
            )
        else:
            keep = F.col("_r") <= F.lit(self.max_per_bucket)
        return ranked.filter(keep).drop("_r", "_occ")

    def _rows_batch(self, docs: DataFrame) -> DataFrame:
        """Batch twin of :meth:`_rows` for large static corpora: the
        explode+collect_set shingle pipeline (spread across cores,
        vectorized) is ~5× faster than the per-row nested expression,
        which only micro-batches need (no explode/groupBy inside a
        stream). Same distinct-hash sets, same band keys."""
        from nornicdb_spark.operators.dedup import shingles

        hs = (
            shingles(docs, id_col=self.id_col, text_col=self.text_col,
                     n=self.shingle_n)
            .groupBy("doc_id")
            .agg(F.collect_set("h").alias("hs"))
            .select(F.col("doc_id").alias("doc"), "hs")
        )
        return hs.select(
            "doc",
            "hs",
            F.posexplode(
                minhash_band_keys_col(
                    F.col("hs"), n_perms=self.n_perms, n_bands=self.n_bands
                )
            ).alias("band", "band_key"),
        )

    # -- bootstrap --------------------------------------------------------
    def bootstrap(self, docs: DataFrame) -> None:
        """(Re)build the index from a static corpus. ``partitionBy(band)``
        so a cluster write lays the table out for band-key probes and the
        per-band append files stay parallel."""
        rows = self._bucket_cap(self._rows_batch(docs))
        write_partitioned(
            rows.select("doc", "band", "band_key"), self.bands_path, "band"
        )
        # a doc whose every bucket was full keeps no band rows and can
        # never be a candidate — its hash row would be dead weight
        rows.groupBy("doc").agg(F.first("hs").alias("hs")).write.mode(
            "overwrite"
        ).parquet(self.hashes_path)

    # -- probe ------------------------------------------------------------
    def probe(self, docs: DataFrame) -> DataFrame:
        """Near-dup matches of ``docs`` against the current index:
        (stream_doc, corpus_doc, jaccard). Batch-side hash sets ride the
        band rows (n_b is small); corpus-side sets come from a keyed join
        against the hashes table — only candidate docs are pulled."""
        sb = self._rows(docs).select(
            F.col("doc").alias("stream_doc"),
            F.col("hs").alias("s_hs"),
            "band",
            "band_key",
        )
        it = self._id_type(docs)
        bands = self._read(
            self.bands_path, f"doc {it}, band_key string, band int"
        ).select(F.col("doc").alias("corpus_doc"), "band", "band_key")
        hashes = self._read(
            self.hashes_path, f"doc {it}, hs array<bigint>"
        ).select(F.col("doc").alias("corpus_doc"), F.col("hs").alias("c_hs"))
        cand = (
            sb.join(bands, ["band", "band_key"])
            .select("stream_doc", "corpus_doc", "s_hs")
            .dropDuplicates(["stream_doc", "corpus_doc"])
            .join(hashes, "corpus_doc")
        )
        inter = F.size(F.array_intersect("s_hs", "c_hs")).cast("double")
        jac = inter / (
            F.size("s_hs").cast("double")
            + F.size("c_hs").cast("double")
            - inter
        )
        return (
            cand.withColumn("jaccard", jac)
            .filter(F.round("jaccard", 9) >= F.lit(round(self.threshold, 9)))
            .select(
                "stream_doc", "corpus_doc", F.round("jaccard", 9).alias("jaccard")
            )
        )

    # -- maintained ingest ------------------------------------------------
    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """foreachBatch body: probe → record matches → append accepted.

        Matches are materialized to parquet FIRST, then read back for the
        reject set — the anti-join never recomputes the probe, and the
        reject set streams through a join (no driver collect)."""
        matches = self.probe(batch_df)
        matches.withColumn("batch_id", F.lit(int(batch_id))).write.mode(
            "append"
        ).parquet(self.matches_path)
        it = self._id_type(batch_df)
        rejected = (
            self._read(
                self.matches_path,
                f"stream_doc {it}, corpus_doc {it}, jaccard double,"
                " batch_id bigint",
            )
            .filter(F.col("batch_id") == int(batch_id))
            .select(F.col("stream_doc").alias("doc"))
            .distinct()
        )
        accepted = self._rows(batch_df).join(rejected, "doc", "left_anti")
        if self.max_per_bucket is not None:
            # occupancy of ONLY the buckets this batch touches (semi-join
            # pruned — O(touched buckets), not O(index))
            touched = accepted.select("band", "band_key").distinct()
            occ = (
                self._read(
                    self.bands_path,
                    f"doc {it}, band_key string, band int",
                )
                .join(touched, ["band", "band_key"], "left_semi")
                .groupBy("band", "band_key")
                .agg(F.count(F.lit(1)).alias("_occ"))
            )
            accepted = self._bucket_cap(accepted, headroom=occ)
        # pin accepted before the writes: the bands append below changes
        # the very table the occupancy join reads, so the hashes write
        # must NOT recompute the plan against post-append state
        accepted = accepted.localCheckpoint(eager=True)
        write_partitioned(
            accepted.select("doc", "band", "band_key"),
            self.bands_path,
            "band",
            mode="append",
        )
        accepted.groupBy("doc").agg(F.first("hs").alias("hs")).write.mode(
            "append"
        ).parquet(self.hashes_path)
        scope.escape_frame(accepted)  # per-batch block: deferred release

    def ingest(self, stream_df: DataFrame, query_name: str):
        """Attach the maintained-ingest loop to a document stream; returns
        the StreamingQuery (caller drives/stops it)."""
        os.makedirs(self.path, exist_ok=True)
        return (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .queryName(query_name)
            .start()
        )

    def matches(self, id_type: str = "bigint") -> DataFrame:
        """All recorded near-dup matches. ``id_type`` supplies the doc-id
        type for the explicit schema (a match-less run leaves a file-less
        dir that Spark cannot infer from)."""
        return self._read(
            self.matches_path,
            f"stream_doc {id_type}, corpus_doc {id_type}, jaccard double,"
            " batch_id bigint",
        )
