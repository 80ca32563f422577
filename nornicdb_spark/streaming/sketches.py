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
from nornicdb_spark.operators.localframe import literal_df

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
            return literal_df(self.spark, 
                [], "grp string, approx_distinct long"
            )
        gks = sorted(
            {
                r.gk
                for r in literal_df(self.spark, 
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


class MaintainedHistogramIndex:
    """Live fixed-width histogram per group — the quantile twin of
    :class:`MaintainedDistinctIndex`, and its structural contrast: bucket
    COUNTS subtract, so this index SUPPORTS removal (negative count
    rows, the fulltext stats-row convention — serving stays a pure sum
    with no subtract-then-clear crash window), where HLL registers
    cannot and :meth:`MaintainedDistinctIndex.remove` refuses.

    Layout: ``<path>/hist`` — (grp string, bucket bigint, n bigint,
    src_batch bigint, gk int), partitionBy(gk); ``bucket =
    floor(value / width)``. State is O(value range / width) rows per
    group — cardinality-independent like the HLL twin, and every
    serve-time read is a sum, so batch order and interleaved removals
    cannot change any answer.

    Quantile contract: :meth:`quantile` returns the MIDPOINT of the
    first bucket whose cumulative net count reaches q * total — a
    deterministic estimate with error <= width/2 + (bucket population
    spread), fully reproducible in SQL (the driver row carries a real
    DuckDB oracle, not a gate). Removal is observation-level, not
    identity-level: the caller asserts the removed values were
    previously ingested (a histogram keeps no identities to check);
    over-removal leaves negative net buckets, which :meth:`audit`
    surfaces."""

    def __init__(
        self,
        spark: SparkSession,
        path: str,
        group_col: str,
        value_col: str,
        width: float = 1.0,
        n_pk: int = N_PK,
    ):
        self.spark = spark
        self.path = path.rstrip("/")
        self.group_col = group_col
        self.value_col = value_col
        self.width = float(width)
        self.n_pk = int(n_pk)

    @property
    def hist_path(self) -> str:
        return f"{self.path}/hist"

    _SCHEMA = "grp string, bucket bigint, n bigint, src_batch bigint, gk int"

    def _gk(self):
        return F.pmod(F.xxhash64("grp"), F.lit(self.n_pk)).cast("int")

    def _stored(self) -> DataFrame:
        return read_or_empty(self.spark, self.hist_path, self._SCHEMA)

    def _rows(self, batch_df: DataFrame, sign: int) -> DataFrame:
        return (
            batch_df.select(
                F.col(self.group_col).cast("string").alias("grp"),
                F.floor(
                    F.col(self.value_col).cast("double") / F.lit(self.width)
                ).alias("bucket"),
            )
            .groupBy("grp", "bucket")
            .agg((F.lit(sign) * F.count(F.lit(1))).cast("long").alias("n"))
            .withColumn("gk", self._gk())
        )

    def _append(self, batch_df: DataFrame, batch_id: int, sign: int) -> None:
        from nornicdb_spark.streaming import guard

        guard.check_batch(self.path, batch_id)
        # a batch_id is EITHER ingest or removal: the replay anti-join
        # keys on (grp, bucket, src_batch), so a removal reusing an
        # ingest's id would be silently eaten as a "replay" and the
        # histogram would over-count forever. Record each id's kind and
        # refuse a mismatch loudly (driver-local marker, the guard's
        # filesystem discipline; rewriting the same kind is the normal
        # replay path and stays allowed).
        op = "ingest" if sign > 0 else "remove"
        os.makedirs(self.path, exist_ok=True)
        marker = os.path.join(self.path, f"_op_{int(batch_id)}")
        if os.path.exists(marker):
            with open(marker) as f:
                prev = f.read().strip()
            if prev != op:
                raise ValueError(
                    f"batch_id {batch_id} was already used for a '{prev}' "
                    f"batch on this index and cannot be reused for "
                    f"'{op}': ingest and removal streams must not share "
                    "batch ids (the replay anti-join would silently drop "
                    "this batch's rows). Use a fresh batch id."
                )
        else:
            with open(marker, "w") as f:
                f.write(op)
        rows = self._rows(batch_df, sign).localCheckpoint(eager=True)
        gks = [r.gk for r in rows.select("gk").distinct().collect()]
        if gks:
            mine = (
                self._stored()
                .filter(
                    F.col("gk").isin(gks)
                    & (F.col("src_batch") == int(batch_id))
                )
                .select("grp", "bucket")
            )
            fresh = rows.join(mine, ["grp", "bucket"], "left_anti")
            write_partitioned(
                fresh.withColumn(
                    "src_batch", F.lit(int(batch_id)).cast("bigint")
                ).select("grp", "bucket", "n", "src_batch", "gk"),
                self.hist_path,
                "gk",
                mode="append",
            )
        guard.record_batch(self.path, batch_id)
        scope.escape_frame(rows)

    def process_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Append this batch's (grp, bucket) counts. A batch_id is
        either an ingest or a removal, never both (the replay anti-join
        heals on (grp, bucket, src_batch))."""
        self._append(batch_df, batch_id, sign=1)

    def remove_batch(self, values_df: DataFrame, batch_id: int) -> None:
        """Subtract previously-ingested observations: appends NEGATIVE
        count rows under this batch_id — serving remains a pure sum.
        Observation-level semantics: the caller asserts these (group,
        value) observations were ingested before; the index keeps no
        identities to verify against (use the fulltext/IVF indexes'
        tombstones when identity-level removal is needed)."""
        self._append(values_df, batch_id, sign=-1)

    def ingest(self, stream_df: DataFrame, query_name: str):
        os.makedirs(self.path, exist_ok=True)
        return (
            stream_df.writeStream.outputMode("append")
            .foreachBatch(self.process_batch)
            .queryName(query_name)
            .start()
        )

    def totals(self) -> DataFrame:
        """(grp, bucket, n) net histogram — the serving primitive."""
        return (
            self._stored()
            .groupBy("grp", "bucket")
            .agg(F.sum("n").cast("long").alias("n"))
            .filter(F.col("n") != 0)
        )

    def audit(self) -> DataFrame:
        """Net-negative buckets (over-removal evidence) — empty on a
        correctly operated index."""
        return self.totals().filter(F.col("n") < 0)

    def quantile(self, q: float) -> DataFrame:
        """(grp, q_est, total): midpoint of the first bucket whose
        cumulative net count reaches q * total. One tiny shuffle of
        net bucket rows; deterministic, SQL-reproducible."""
        from pyspark.sql import Window as W

        net = self.totals()
        w = (
            W.partitionBy("grp")
            .orderBy("bucket")
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        cum = net.withColumn("cum", F.sum("n").over(w))
        tot = net.groupBy("grp").agg(F.sum("n").cast("long").alias("total"))
        return (
            cum.join(tot, "grp")
            .filter(F.col("cum") >= F.lit(float(q)) * F.col("total"))
            .groupBy("grp")
            .agg(
                F.min("bucket").alias("_b"),
                F.first("total", ignorenulls=True).alias("total"),
            )
            .select(
                "grp",
                ((F.col("_b") + F.lit(0.5)) * F.lit(self.width)).alias(
                    "q_est"
                ),
                "total",
            )
        )

    def compact(self) -> None:
        """Fold per-batch rows to net (grp, bucket) rows (zero nets
        dropped, src_batch=-2). Epoch fence BEFORE the fold — family
        contract (a replayed batch after its rows folded would
        re-append them; refused instead)."""
        from nornicdb_spark.sources.layout import (
            recover_interrupted_swap,
            rewrite_partitioned,
        )
        from nornicdb_spark.streaming import guard

        recover_interrupted_swap(self.hist_path)
        guard.advance_epoch(self.path)
        rewrite_partitioned(
            self.spark,
            self.hist_path,
            self._SCHEMA,
            lambda df: df.groupBy("grp", "bucket", "gk")
            .agg(F.sum("n").cast("long").alias("n"))
            .filter(F.col("n") != 0)
            .withColumn("src_batch", F.lit(-2).cast("bigint"))
            .select("grp", "bucket", "n", "src_batch", "gk"),
            "gk",
        )


class MaintainedSampleIndex:
    """Live weighted reservoir WITHOUT replacement over an append-only
    stream — the streaming form of ``operators/textops.weighted_sample``
    and the family's third sketch member. Because the A-Res key
    (u^(1/w), u hash-derived from the doc id) is a pure per-row
    function, per-batch top-n candidate sets are MERGEABLE: any global
    winner present in a batch survives that batch's local top-n, so
    the global top-n over the union of per-batch top-ns is EXACTLY the
    batch operator's answer over the whole ingested corpus —
    :meth:`sample` is byte-identical to ``weighted_sample`` on the
    same rows (the driver row shares the batch oracle verbatim, the
    stream_dedup_exact posture).

    Layout: ``<path>/cands`` — (doc_id bigint, weight double,
    key double, src_batch bigint) per retained candidate, <= n rows per
    batch; serving re-ranks candidates only (n x batches tiny rows),
    compaction folds to the global top-n. Replay-idempotent via the
    guard + (doc_id, src_batch) anti-join, and semantically via key
    determinism (a duplicate candidate row cannot change a top-n that
    de-duplicates by doc_id). Removal is refused loudly: evicting a
    winner cannot restore the candidate that its batch's local top-n
    dropped — rebuild from the surviving corpus instead."""

    def __init__(self, spark: SparkSession, path: str, n: int):
        self.spark = spark
        self.path = path.rstrip("/")
        self.n = int(n)

    @property
    def cands_path(self) -> str:
        return f"{self.path}/cands"

    _SCHEMA = "doc_id bigint, weight double, key double, src_batch bigint"

    def _stored(self) -> DataFrame:
        return read_or_empty(self.spark, self.cands_path, self._SCHEMA)

    def process_batch(
        self,
        batch_df: DataFrame,
        batch_id: int,
        weight_col: str = "weight",
        id_col: str = "doc_id",
    ) -> None:
        from nornicdb_spark.operators.textops import weighted_sample
        from nornicdb_spark.streaming import guard

        guard.check_batch(self.path, batch_id)
        rows = weighted_sample(
            batch_df, n=self.n, weight_col=weight_col, id_col=id_col
        ).localCheckpoint(eager=True)
        mine = (
            self._stored()
            .filter(F.col("src_batch") == int(batch_id))
            .select("doc_id")
        )
        fresh = rows.join(mine, "doc_id", "left_anti").withColumn(
            "src_batch", F.lit(int(batch_id)).cast("bigint")
        )
        os.makedirs(self.cands_path, exist_ok=True)
        fresh.select("doc_id", "weight", "key", "src_batch").write.mode(
            "append"
        ).parquet(self.cands_path)
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

    def sample(self) -> DataFrame:
        """(doc_id, weight, key): the n winners over everything ingested
        — identical to the batch weighted_sample over the same corpus.
        Candidates de-duplicate by doc_id first (replay hygiene), then
        the rounded-key/id tie-break ranks."""
        return (
            self._stored()
            .groupBy("doc_id")
            .agg(F.first("weight").alias("weight"), F.max("key").alias("key"))
            .orderBy(F.desc("key"), F.asc("doc_id"))
            .limit(self.n)
        )

    def remove(self, *_args, **_kwargs) -> None:
        """Removal cannot be honored: a batch's local top-n already
        dropped the candidates that would back-fill an evicted winner.
        Rebuild the index over the surviving corpus instead."""
        raise NotImplementedError(
            "MaintainedSampleIndex is append-only: evicting a sampled "
            "winner cannot restore candidates its batch's local top-n "
            "discarded. Rebuild from the surviving corpus."
        )

    def compact(self) -> None:
        """Fold all candidate rows to the current global top-n
        (src_batch=-2). Epoch fence BEFORE the fold (family contract)."""
        from nornicdb_spark.sources.layout import recover_interrupted_swap
        from nornicdb_spark.streaming import guard

        recover_interrupted_swap(self.cands_path)
        guard.advance_epoch(self.path)
        import shutil

        top = (
            self.sample()
            .withColumn("src_batch", F.lit(-2).cast("bigint"))
            .select("doc_id", "weight", "key", "src_batch")
        )
        stage = f"{self.cands_path}.stage"
        top.coalesce(1).write.mode("overwrite").parquet(stage)
        old = f"{self.cands_path}.old"
        shutil.rmtree(old, ignore_errors=True)
        os.rename(self.cands_path, old)
        os.rename(stage, self.cands_path)
        shutil.rmtree(old, ignore_errors=True)
