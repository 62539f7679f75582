package graft.streaming

import graft.Constants
import graft.functions.Converters
import graft.operators.CdcOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming orchestration (SURVEY §3.1): Kafka source -> envelope decode ->
  * foreachBatch { dedupe -> merge } with checkpoint-based at-least-once +
  * idempotent merge — the Spark-native collapse of the reference's
  * consumer/flusher/Livy pipeline (processes/consumer/kafka.go,
  * clients/iceberg/store.go:170-233).
  */
object CdcPipeline {
  /** Per-pipeline knobs (subset of the reference's ~30-knob TopicConfig,
    * lib/kafkalib/topic.go:170-227). `msmSteps` > 1 enables multi-step
    * merge (D8): N flushes accumulate into a staging snapshot before one
    * final merge into the target (clients/shared/multi_step_merge.go).
    */
  case class Config(
      primaryKeys: Seq[String],
      orderCol: String = "offset",
      softDelete: Boolean = false,
      toastCols: Seq[String] = Nil,
      historyMode: Boolean = false,
      flushInterval: String = "10 seconds", // reference default (config.go:18-26)
      skippedOperations: Set[String] = Set.empty,
      columnsToExclude: Seq[String] = Nil,
      columnsToHash: Seq[String] = Nil,
      columnsToEncrypt: Seq[String] = Nil,
      encryptionKey: Option[String] = None,
      staticColumns: Map[String, String] = Map.empty,
      msmSteps: Int = 1,
  ) {
    // encryption is non-deterministic (AES-GCM) and would break PK joins —
    // banned on primary keys like the reference (topic.go:297-314)
    require(!primaryKeys.exists(columnsToEncrypt.contains),
      s"primary keys cannot be encrypted: ${primaryKeys.intersect(columnsToEncrypt)}")
    require(columnsToEncrypt.isEmpty || encryptionKey.nonEmpty,
      "columnsToEncrypt requires encryptionKey")
  }

  /** Kafka source (S1). Requires the kafka connector on the classpath; the
    * decode/merge stages below are source-agnostic and are tested with
    * MemoryStream.
    */
  def fromKafka(spark: SparkSession, servers: String, topics: String): DataFrame =
    spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest")
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "offset", "partition", "timestamp")

  /** P1-P5: operation skip filter, column exclusion, hashing, encryption,
    * static column injection.
    */
  def applyRowTransforms(df: DataFrame, cfg: Config): DataFrame = {
    val skipped =
      if (cfg.skippedOperations.isEmpty) df
      else df.filter(!col(Constants.OperationCol).isin(cfg.skippedOperations.toSeq: _*))
    val excluded = cfg.columnsToExclude.foldLeft(skipped)(_ drop _)
    val hashed = cfg.columnsToHash.foldLeft(excluded) { (acc, c) =>
      if (acc.columns.contains(c)) acc.withColumn(c, sha2(col(c).cast("string"), 256)) else acc
    }
    val encrypted = cfg.columnsToEncrypt.foldLeft(hashed) { (acc, c) =>
      if (acc.columns.contains(c))
        acc.withColumn(c, Converters.encryptColumn(col(c), lit(cfg.encryptionKey.get)))
      else acc
    }
    cfg.staticColumns.foldLeft(encrypted) { case (acc, (name, value)) =>
      acc.withColumn(name, lit(value))
    }
  }

  /** Resolve the live snapshot dir, recovering from a crash that happened
    * mid-swap (live dir renamed away but the new one not yet promoted).
    */
  private[streaming] def resolveSnapshot(spark: SparkSession, path: String): Option[Path] = {
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val dst = new Path(path)
    val prev = new Path(path + "__prev")
    if (fs.exists(dst)) {
      if (fs.exists(prev)) fs.delete(prev, true) // completed swap, old copy left over
      Some(dst)
    } else if (fs.exists(prev)) {
      fs.rename(prev, dst) // crashed between demote and promote: roll back
      Some(dst)
    } else None
  }

  /** Merge a change frame into the parquet snapshot at `path` using a
    * backup-rename swap: write new -> demote live to `__prev` -> promote
    * new -> drop `__prev`. Every crash window leaves either the old or the
    * new snapshot recoverable (see [[resolveSnapshot]]); a MERGE-capable
    * catalog would run MergeSqlBuilder.buildMerge and get atomicity from
    * the table format instead.
    */
  private def mergeIntoSnapshot(changes: DataFrame, cfg: Config, path: String,
                                soft: Boolean): Unit = {
    val spark = changes.sparkSession
    val fs = new Path(path).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseCols = changes.columns.filterNot(c =>
      c == Constants.DeleteCol || c == Constants.OnlySetDeleteCol)
    val live = resolveSnapshot(spark, path)
    val base = live match {
      case Some(p) => spark.read.parquet(p.toString)
      case None =>
        val cols = if (soft) baseCols :+ Constants.DeleteCol else baseCols
        changes.select(cols.distinct.map(col).toSeq: _*).limit(0)
    }
    val merged = CdcOps.mergeApply(base, changes, cfg.primaryKeys,
      Seq(col(cfg.orderCol)), soft, cfg.toastCols)
    val tmp = new Path(path + "__staging")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(path)
    val prev = new Path(path + "__prev")
    if (fs.exists(dst)) fs.rename(dst, prev)
    fs.rename(tmp, dst)
    if (fs.exists(prev)) fs.delete(prev, true)
  }

  /** Marker recording the highest applied batch id next to the snapshot:
    * replays after checkpoint recovery become true no-ops (the merge is
    * idempotent anyway — the marker just skips the work, the
    * at-least-once + idempotent-merge contract of flush.go:67-147).
    */
  private def lastAppliedBatch(spark: SparkSession, targetPath: String): Long = {
    val p = new Path(targetPath + "__batch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) -1L
    else {
      val in = fs.open(p)
      try new String(in.readAllBytes(), "UTF-8").trim.toLong
      catch { case _: Exception => -1L }
      finally in.close()
    }
  }

  private def recordBatch(spark: SparkSession, targetPath: String, batchId: Long): Unit = {
    val p = new Path(targetPath + "__batch")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val out = fs.create(p, true)
    out.write(batchId.toString.getBytes("UTF-8"))
    out.close()
  }

  /** One micro-batch flush. With msmSteps > 1, batches accumulate in a
    * soft-merged staging snapshot (delete markers preserved); every Nth
    * batch the staging set merges into the target and the staging snapshot
    * resets (D8).
    */
  def applyBatch(batch: DataFrame, batchId: Long, cfg: Config, targetPath: String): Unit = {
    if (batch.isEmpty) return
    if (batchId <= lastAppliedBatch(batch.sparkSession, targetPath)) return // replay: no-op
    val transformed = applyRowTransforms(batch, cfg)
    if (cfg.historyMode) {
      // idempotent append: each batch owns a partition dir it OVERWRITES,
      // so a replay rewrites the same files instead of duplicating them
      // (a plain append + marker would leave a crash window between the
      // two writes)
      CdcOps.historyProjection(transformed, col(Constants.OperationCol))
        .write.mode("overwrite").parquet(s"$targetPath/batch=$batchId")
      return // no marker needed: the per-batch overwrite IS the idempotency
    }
    val changes = transformed.drop(Constants.OperationCol)
    observeColumnDrops(transformed, batchId, cfg, targetPath)
    if (cfg.msmSteps <= 1) {
      mergeIntoSnapshot(changes, cfg, targetPath, cfg.softDelete)
    } else {
      val stagingPath = targetPath + "__msm"
      mergeIntoSnapshot(changes, cfg, stagingPath, soft = true)
      if ((batchId + 1) % cfg.msmSteps == 0) {
        val spark = batch.sparkSession
        val staged = spark.read.parquet(stagingPath)
        mergeIntoSnapshot(staged, cfg, targetPath, cfg.softDelete)
        val fs = new Path(stagingPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
        fs.delete(new Path(stagingPath), true)
      }
    }
    recordBatch(batch.sparkSession, targetPath, batchId)
  }

  /** D3 wired end-to-end: per batch, record which snapshot columns the
    * change set no longer carries; a column absent for the full grace
    * window (and never off the back of a delete-only batch) is reported
    * droppable. State lives in a sidecar next to the snapshot so the
    * window survives restarts. Returns the columns safe to drop now —
    * the caller (or a catalog integration) issues the actual DROP.
    */
  def observeColumnDrops(batch: DataFrame, batchId: Long, cfg: Config,
                         targetPath: String,
                         now: java.time.Instant = java.time.Instant.now(),
                         graceHours: Long = 4): Seq[String] = {
    val spark = batch.sparkSession
    val live = resolveSnapshot(spark, targetPath).getOrElse(return Nil)
    val snapshotCols = spark.read.parquet(live.toString).columns.toSet
    val batchCols = batch.columns.toSet
    val absent = snapshotCols.diff(batchCols)
      .filterNot(c => c.startsWith("__artie") || cfg.primaryKeys.contains(c))
    val containsOtherOps =
      !batch.columns.contains(Constants.DeleteCol) ||
        batch.filter(!col(Constants.DeleteCol)).limit(1).count() > 0
    // local-fs sidecar; an object-store deployment would keep this state
    // in a catalog table instead
    val sidecar = java.nio.file.Paths.get(
      new Path(targetPath + "__dropstate").toUri.getPath)
    val dc = graft.schema.SchemaEvolution.DropConfidence.load(sidecar, graceHours)
    val droppable = dc.observe(absent, now, containsOtherOps)
    dc.save(sidecar)
    if (droppable.nonEmpty)
      System.err.println(s"[graft] columns past drop-confidence for $targetPath: ${droppable.mkString(", ")}")
    droppable
  }

  /** Wire a decoded change stream into the micro-batch merge sink. The
    * trigger interval is the flush-interval analog; checkpointing gives
    * the offset-commit-after-flush semantics (flush.go:67-147).
    */
  def start(decoded: DataFrame, cfg: Config, targetPath: String,
            checkpoint: String): StreamingQuery =
    decoded.writeStream
      .trigger(Trigger.ProcessingTime(cfg.flushInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) => applyBatch(batch, id, cfg, targetPath) }
      .start()
}
