package graft.sink

import graft.Constants
import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

/** Non-MERGE sinks (SURVEY §2.2). */
object Sinks {
  /** K2: append sink — create-if-missing then insert
    * (clients/shared/append.go:14-85). For parquet paths this is a plain
    * append write; for catalog tables use `df.writeTo(t).append()`.
    */
  def appendParquet(df: DataFrame, path: String): Unit =
    df.write.mode("append").parquet(path)

  /** K3: S3/GCS-style partitioned parquet sink with the reference's
    * date-partitioned layout `prefix/db.schema.table/date=YYYY-MM-DD/`
    * (clients/s3/s3.go:95-219). Compression matches the reference (gzip).
    */
  def partitionedParquet(df: DataFrame, basePrefix: String, fqTableName: String,
                         tsCol: String): Unit =
    df.withColumn("date", date_format(col(tsCol), "yyyy-MM-dd"))
      .write
      .mode("append")
      .option("compression", "gzip")
      .partitionBy("date")
      .parquet(s"$basePrefix/$fqTableName")

  /** K7/K8 shape: key/value fan-out to an external system (Redis SET /
    * SQS publish in the reference). `clientFactory` runs once per
    * partition (connection amortized), `send` once per row — the
    * foreachPartition idiom the reference's row-loop maps onto. Publishes
    * run under a jittered-retry envelope when the caller passes one
    * (lib/retry shape: full-jitter backoff, retryable-error predicate) so
    * a transient broker error doesn't fail the whole Spark task. The
    * DEFAULT is NO retry (maxAttempts = 1): retrying is opt-in because a
    * deterministic poison row would otherwise burn the full backoff
    * budget times Spark's own task retries, and a non-idempotent send
    * that errors after its side effect would duplicate per attempt —
    * callers who opt in should pass an isRetryable that recognizes their
    * client's transient errors.
    */
  def foreachPartitionSink[C](df: DataFrame, keyCols: Seq[String],
                              retry: graft.Retries.RetryConfig =
                                graft.Retries.RetryConfig(maxAttempts = 1))
                             (clientFactory: () => C)
                             (send: (C, String, Row) => Unit)
                             (close: C => Unit = (_: C) => ()): Unit = {
    val keyIdx = keyCols.map(df.schema.fieldIndex)
    df.foreachPartition { (rows: Iterator[Row]) =>
      val client = clientFactory()
      try rows.foreach { r =>
        val key = keyIdx.map(i => String.valueOf(r.get(i))).mkString(":")
        graft.Retries.withRetries(retry)(send(client, key, r))
      } finally close(client)
    }
  }

  /** Bucketed table write: pre-shuffles once on the bucket columns so
    * later equi-joins/aggregations on those columns are co-located
    * (no Exchange in the join plan). The table lands in the session
    * warehouse via saveAsTable — bucketing metadata needs a catalog.
    */
  def writeBucketed(df: DataFrame, table: String, bucketCols: Seq[String],
                    numBuckets: Int): Unit =
    df.write
      .mode("overwrite")
      .bucketBy(numBuckets, bucketCols.head, bucketCols.tail: _*)
      .sortBy(bucketCols.head, bucketCols.tail: _*)
      .saveAsTable(table)

  /** Canonical-string projection used for file/KV sinks: every column to
    * its reference string form, NULL -> placeholder
    * (lib/typing/converters/string_converter.go:33-68).
    */
  def canonicalStrings(df: DataFrame): DataFrame =
    df.select(df.schema.fields.toSeq.map { f =>
      graft.functions.Converters.canonicalString(col(f.name), f.dataType).as(f.name)
    }: _*)

  /** P12 wired to a sink: route each row to `base<suffix>` by the
    * soft-partition suffix of its timestamp (`_yyyy_MM`, future ->
    * `_default`) — the reference routes to suffixed TABLES, not partition
    * dirs (models/event/soft_partition.go:13-47), so each suffix gets its
    * own append target. The distinct-suffix collect is bounded by the
    * batch's month span.
    */
  def softPartitionedAppend(df: DataFrame, base: String, tsCol: String,
                            batchId: Option[Long] = None): Seq[String] = {
    // a NULL timestamp routes to the default partition (same bucket the
    // reference uses for out-of-range events) instead of NPE-ing the batch
    val withSfx = df.withColumn("__sfx",
      coalesce(graft.operators.CdcOps.softPartitionSuffix(col(tsCol)), lit("_default")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val suffixes = withSfx.select("__sfx").distinct().collect().map(_.getString(0)).sorted
      suffixes.foreach { sfx =>
        val slice = withSfx.filter(col("__sfx") === sfx).drop("__sfx")
        batchId match {
          // the replay marker is PER SUFFIX TARGET: one marker for the
          // whole loop would re-append every suffix on a replayed batch
          // that crashed mid-loop, duplicating the targets written before
          // the crash — per-target markers narrow the duplication window
          // to the single append the plain-append sink already has
          case Some(id) => graft.streaming.CdcPipeline
            .runOncePerBatch(df.sparkSession, base + sfx, id)(appendParquet(slice, base + sfx))
          case None => appendParquet(slice, base + sfx)
        }
      }
      suffixes.map(base + _).toSeq
    } finally { withSfx.unpersist(); () }
  }
}

/** K9: destination registry — the sink-side twin of `cdc.FormatRegistry`
  * (ref lib/destination/utils/load.go:29-66 switches cfg.Output over the
  * same label space). Warehouse wire protocols (Snowflake/BigQuery/...)
  * are out of scope per SURVEY §7.5 — their capability here is the
  * MERGE-snapshot path plus MergeSqlBuilder text against a catalog.
  */
object SinkRegistry {
  /** A sink applies one micro-batch DataFrame (with its batch id — needed
    * by the replay marker and history partitioning) to a target path.
    */
  type Sink = (DataFrame, Long, String) => Unit

  def sink(label: String, cfg: graft.streaming.CdcPipeline.Config,
           softPartitionTsCol: String = "ts"): Sink = label match {
    case "merge" | "snapshot" =>
      (df, batchId, target) => graft.streaming.CdcPipeline.applyBatch(df, batchId, cfg, target)
    case "append" =>
      (df, batchId, target) =>
        graft.streaming.CdcPipeline.runOncePerBatch(df.sparkSession, target, batchId) {
          Sinks.appendParquet(df, target)
        }
    case "history" =>
      (df, batchId, target) => graft.streaming.CdcPipeline.applyBatch(
        df, batchId, cfg.copy(historyMode = true), target)
    case "soft-partitioned" =>
      // per-suffix replay markers live INSIDE the append loop — see
      // softPartitionedAppend; no outer whole-batch marker
      (df, batchId, target) =>
        { Sinks.softPartitionedAppend(df, target, softPartitionTsCol, Some(batchId)); () }
    case other => throw new IllegalArgumentException(
      s"unsupported sink label: $other (expected merge | snapshot | append | history | soft-partitioned)")
  }
}
