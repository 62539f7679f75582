package graft.streaming

import graft.Constants
import graft.operators.CdcOps
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Streaming orchestration (SURVEY §3.1): Kafka source -> envelope decode ->
  * foreachBatch { dedupe -> merge } with checkpoint-based at-least-once +
  * idempotent merge — the Spark-native collapse of the reference's
  * consumer/flusher/Livy pipeline (processes/consumer/kafka.go,
  * clients/iceberg/store.go:170-233).
  */
object CdcPipeline {
  /** Per-pipeline knobs (subset of the reference's ~30-knob TopicConfig,
    * lib/kafkalib/topic.go:170-227).
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
  )

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

  /** P1-P3: operation skip filter, column exclusion, column hashing. */
  def applyRowTransforms(df: DataFrame, cfg: Config): DataFrame = {
    val skipped =
      if (cfg.skippedOperations.isEmpty) df
      else df.filter(!col(Constants.OperationCol).isin(cfg.skippedOperations.toSeq: _*))
    val excluded = cfg.columnsToExclude.foldLeft(skipped)(_ drop _)
    cfg.columnsToHash.foldLeft(excluded) { (acc, c) =>
      if (acc.columns.contains(c)) acc.withColumn(c, sha2(col(c).cast("string"), 256)) else acc
    }
  }

  /** One micro-batch flush: dedupe the batch last-wins, then merge into the
    * parquet snapshot at `targetPath` (write-new-then-swap keeps readers
    * consistent; a MERGE-capable catalog would run
    * MergeSqlBuilder.buildMerge instead).
    */
  def applyBatch(batch: DataFrame, cfg: Config, targetPath: String): Unit = {
    if (batch.isEmpty) return
    val spark = batch.sparkSession
    val transformed = applyRowTransforms(batch, cfg)
    if (cfg.historyMode) {
      CdcOps.historyProjection(transformed, col(Constants.OperationCol))
        .write.mode("append").parquet(targetPath)
      return
    }
    val changes = transformed
    val fs = new Path(targetPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseCols = changes.columns.filterNot(c =>
      c == Constants.DeleteCol || c == Constants.OnlySetDeleteCol || c == Constants.OperationCol)
    val base =
      if (fs.exists(new Path(targetPath))) spark.read.parquet(targetPath)
      else changes.select(baseCols.map(col).toSeq: _*).limit(0)
    val merged = CdcOps.mergeApply(
      base, changes.drop(Constants.OperationCol), cfg.primaryKeys,
      Seq(col(cfg.orderCol)), cfg.softDelete, cfg.toastCols)
    val tmp = new Path(targetPath + "__staging")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(targetPath)
    if (fs.exists(dst)) fs.delete(dst, true)
    fs.rename(tmp, dst)
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
      .foreachBatch { (batch: DataFrame, _: Long) => applyBatch(batch, cfg, targetPath) }
      .start()
}
