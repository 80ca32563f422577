"""Maintained approximate-distinct index — the streaming form of
``operators/sketches.approx_distinct_gate``: one HLL++ sketch row per
(group, batch) in a partitioned parquet log, serve-time register union.

The state story is the family's best: HLL registers are pure max-merge
state, so per-batch sketches are O(2^lg_k) BYTES per group regardless
of how many distinct values the batch carries, the union is
batch-order-invariant AND idempotent (re-unioning a duplicate sketch
is a no-op on the registers), and serving cost is groups x batches tiny
rows — a 10^10-distinct-users live counter that never materializes a
set anywhere. Removals are structurally impossible (registers cannot
subtract) — :meth:`remove` refuses loudly rather than degrading.

Reference scope: the reference has no approximate or incremental
distinct counting (exact Cypher aggregates only) — beyond-reference
capability for the interactive-at-scale north star, same posture as
operators/sketches.py.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nornicdb_spark.operators import scope
from nornicdb_spark.sources.layout import (
    DEFAULT_N_PK as N_PK,
)
from nornicdb_spark.sources.layout import (
    read_or_empty,
    write_partitioned,
)


class MaintainedDistinctIndex:
    """Live distinct-count-per-group over an append-only stream.

    Layout: ``<path>/sketches`` — one row per (grp, src_batch),
    (grp string, sketch binary, src_batch bigint, gk int),
    partitionBy(gk), ``gk = pmod(xxhash64(grp), n_pk)`` — a bounded
    group probe (:meth:`counts_for`) reads only its groups' gk buckets
    (literal ``isin`` -> ``PartitionFilters``).

    Replay (foreachBatch at-least-once): the guard high-water refuses
    stale batches; a replayed current batch anti-joins its own already
    -present (grp, src_batch) rows away — and even a torn duplicate row
    is harmless by construction (register max is idempotent), the only
    index in the family whose payload self-heals semantically as well
    as mechanically."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_col: str,
        value_col: str,
        lg_k: int = 12,
        n_pk: int = N_PK,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.group_col = group_col
        self.value_col = value_col
        self.lg_k = int(lg_k)
        self.n_pk = int(n_pk)

    @property
    def sketches_path(self) -> str:
        return f"{self.path}/sketches"

    _SCHEMA = "grp string, sketch binary, src_batch bigint, gk int"

    def _gk(self):
        return F.pmod(F.xxhash64("grp"), F.lit(self.n_pk)).cast("int")

    def _stored(self) -> DataFrame:
        return read_or_empty(self.spark, self.sketches_path, self._SCHEMA)

    def _rows(self, batch_df: DataFrame) -> DataFrame:
        return (
            batch_df.select(
                F.col(self.group_col).cast("string").alias("grp"),
                F.col(self.value_col).alias("_v"),
            )
            .groupBy("grp")
            .agg(F.hll_sketch_agg("_v", F.lit(self.lg_k)).alias("sketch"))
            .withColumn("gk", self._gk())
        )

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Append this batch's per-group sketch rows. Replay-idempotent
        twice over: the anti-join drops rows a torn first run already
        landed, and a duplicate that slipped through would union to the
        identical registers anyway."""
        from nornicdb_spark.streaming import guard

        guard.check_batch(self.path, batch_id)
        rows = self._rows(batch_df).localCheckpoint(eager=True)
        gks = [r.gk for r in rows.select("gk").distinct().collect()]
        if gks:
            mine = (
                self._stored()
                .filter(
                    F.col("gk").isin(gks)
                    & (F.col("src_batch") == int(batch_id))
                )
                .select("grp")
            )
            fresh = rows.join(mine, "grp", "left_anti")
            write_partitioned(
                fresh.withColumn(
                    "src_batch", F.lit(int(batch_id)).cast("bigint")
                ).select("grp", "sketch", "src_batch", "gk"),
                self.sketches_path,
                "gk",
                mode="append",
            )
        guard.record_batch(self.path, batch_id)
        scope.escape_frame(rows)

    def ingest(self, stream_df: DataFrame, query_name: str):
        os.makedirs(self.path, exist_ok=True)
        return (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .queryName(query_name)
            .start()
        )

    def counts(self) -> DataFrame:
        """(grp, approx_distinct) over everything ingested — union of
        the per-batch registers, one tiny shuffle of sketch rows."""
        return (
            self._stored()
            .groupBy("grp")
            .agg(
                F.hll_sketch_estimate(
                    F.hll_union_agg("sketch", F.lit(False))
                )
                .cast("long")
                .alias("approx_distinct")
            )
        )

    def counts_for(self, groups: list[str]) -> DataFrame:
        """Bounded probe: estimates for the given groups only, reading
        only their gk partitions (literal isin -> PartitionFilters)."""
        if not groups:
            return self.spark.createDataFrame(
                [], "grp string, approx_distinct long"
            )
        gks = sorted(
            {
                r.gk
                for r in self.spark.createDataFrame(
                    [(g,) for g in groups], "grp string"
                )
                .select(self._gk().alias("gk"))
                .collect()
            }
        )
        return (
            self._stored()
            .filter(F.col("gk").isin(gks) & F.col("grp").isin(list(groups)))
            .groupBy("grp")
            .agg(
                F.hll_sketch_estimate(
                    F.hll_union_agg("sketch", F.lit(False))
                )
                .cast("long")
                .alias("approx_distinct")
            )
        )

    def remove(self, *_args, **_kwargs) -> None:
        """HLL registers cannot subtract — a maintained distinct count
        with removals needs a different sketch family entirely (e.g.
        exact per-group sets or linear counting with counters). Refuse
        loudly instead of silently over-counting."""
        raise NotImplementedError(
            "MaintainedDistinctIndex is append-only: HLL register state "
            "cannot subtract a value. Rebuild the index without the "
            "removed rows, or keep an exact membership log if removal "
            "is a requirement."
        )

    def compact(self) -> None:
        """Fold the per-batch sketch rows to ONE row per group
        (src_batch=-2) — bounded file count after any number of
        batches. MUST run in a maintenance window (stream stopped,
        checkpoint committed); the guard epoch advances BEFORE the fold
        so a crash mid-rewrite leaves the latest batch's replay refused,
        not double-counted (double-union is semantically harmless here,
        but the family contract is uniform)."""
        from nornicdb_spark.sources.layout import (
            recover_interrupted_swap,
            rewrite_partitioned,
        )
        from nornicdb_spark.streaming import guard

        recover_interrupted_swap(self.sketches_path)
        guard.advance_epoch(self.path)
        rewrite_partitioned(
            self.spark,
            self.sketches_path,
            self._SCHEMA,
            lambda df: df.groupBy("grp", "gk")
            .agg(F.hll_union_agg("sketch", F.lit(False)).alias("sketch"))
            .withColumn("src_batch", F.lit(-2).cast("bigint"))
            .select("grp", "sketch", "src_batch", "gk"),
            "gk",
        )
