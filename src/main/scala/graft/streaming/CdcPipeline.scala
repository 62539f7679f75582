package graft.streaming

import graft.{Constants, Heartbeats}
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
      columnsToInclude: Seq[String] = Nil, // non-empty = allow-list (event_util.go:56-83)
      columnsToHash: Seq[String] = Nil,
      columnsToEncrypt: Seq[String] = Nil,
      encryptionKey: Option[String] = None,
      staticColumns: Map[String, String] = Map.empty,
      // config PKs take precedence over key-derived ones (topic.go:170-227)
      primaryKeysOverride: Seq[String] = Nil,
      includeArtieUpdatedAt: Boolean = false, // inject __artie_updated_at (P6)
      includeDatabaseUpdatedAt: Boolean = false, // inject __artie_db_updated_at (P6)
      msmSteps: Int = 1,
      // > 0: snapshot is split into PK-hash buckets and a flush rewrites
      // only the buckets its rows land in — merge I/O scales with batch
      // size, not table size
      numBuckets: Int = 0,
  ) {
    /** PK override wins over (key-derived) primaryKeys — topic.go:170-227. */
    def effectivePrimaryKeys: Seq[String] =
      if (primaryKeysOverride.nonEmpty) primaryKeysOverride else primaryKeys

    // a keyless config dies at definition time with an actionable message
    // (round-13 review: an empty PK list previously survived to the first
    // merge and failed as an opaque empty.reduceLeft deep in mergeApply,
    // after lastWins had already built a GLOBAL one-partition window)
    require(effectivePrimaryKeys.nonEmpty,
      "Config needs at least one primary key (primaryKeys or primaryKeysOverride)")

    // encryption is non-deterministic (AES-GCM) and would break PK joins —
    // banned on primary keys like the reference (topic.go:297-314)
    require(!effectivePrimaryKeys.exists(columnsToEncrypt.contains),
      s"primary keys cannot be encrypted: ${effectivePrimaryKeys.intersect(columnsToEncrypt)}")
    require(columnsToEncrypt.isEmpty || encryptionKey.nonEmpty,
      "columnsToEncrypt requires encryptionKey")
  }

  /** Kafka source (S1). Requires the kafka connector on the classpath; the
    * decode/merge stages below are source-agnostic and are tested with
    * MemoryStream. `maxRecordsPerFlush` bounds the records admitted per
    * trigger (maxOffsetsPerTrigger) — Spark's rate-based analog of the
    * reference's byte/row flush thresholds (config.go:18-26): the flush
    * unit is capped at the source instead of by buffer accounting.
    */
  def fromKafka(spark: SparkSession, servers: String, topics: String,
                maxRecordsPerFlush: Option[Long] = None): DataFrame = {
    val base = spark.readStream.format("kafka")
      .option("kafka.bootstrap.servers", servers)
      .option("subscribe", topics)
      .option("startingOffsets", "earliest")
    maxRecordsPerFlush.foldLeft(base)((b, n) => b.option("maxOffsetsPerTrigger", n))
      .load()
      .selectExpr("CAST(key AS STRING) AS key", "CAST(value AS STRING) AS value",
        "offset", "partition", "timestamp")
  }

  /** P1-P6: operation skip filter, column exclusion, include allow-list,
    * hashing, encryption, static column injection, updated-at markers.
    */
  def applyRowTransforms(df: DataFrame, cfg: Config): DataFrame = {
    // ambiguous ordering guard (round-13 review): when the SOURCE row
    // schema has its own `offset` column, decode renames the Kafka
    // offset to `__kafka_offset` — the default orderCol="offset" would
    // then bind to the DATA column and last-wins/merge would pick
    // winners by data values instead of log order, silently and
    // nondeterministically on ties. Fail loudly with the fix.
    require(!(cfg.orderCol == "offset" && df.columns.contains("__kafka_offset")),
      "orderCol=\"offset\" is ambiguous: the row schema carries its own " +
        "`offset` column, so the Kafka offset rode through as " +
        "`__kafka_offset` — set orderCol=\"__kafka_offset\" to order by log " +
        "position, or rename the source column if you really mean the data")
    val skipped =
      if (cfg.skippedOperations.isEmpty) df
      else df.filter(!col(Constants.OperationCol).isin(cfg.skippedOperations.toSeq: _*))
    val excluded = cfg.columnsToExclude.foldLeft(skipped)(_ drop _)
    // include allow-list keeps artie/meta columns, static columns, and the
    // PK/order machinery regardless (event_util.go:60-83)
    val included =
      if (cfg.columnsToInclude.isEmpty) excluded
      else {
        val keep = (cfg.columnsToInclude ++ cfg.staticColumns.keys ++
          cfg.effectivePrimaryKeys ++ Seq(cfg.orderCol, "__source_ts_ms")).toSet
        excluded.select(excluded.columns.filter(c =>
          keep.contains(c) || c.startsWith("__artie")).map(col).toSeq: _*)
      }
    val hashed = cfg.columnsToHash.foldLeft(included) { (acc, c) =>
      if (acc.columns.contains(c)) acc.withColumn(c, sha2(col(c).cast("string"), 256)) else acc
    }
    val encrypted = cfg.columnsToEncrypt.foldLeft(hashed) { (acc, c) =>
      if (acc.columns.contains(c))
        acc.withColumn(c, Converters.encryptColumn(col(c), lit(cfg.encryptionKey.get)))
      else acc
    }
    val withStatic = cfg.staticColumns.foldLeft(encrypted) { case (acc, (name, value)) =>
      acc.withColumn(name, lit(value))
    }
    // P6 metadata markers (models/event/event.go + event_util.go:217-232):
    // __artie_updated_at = processing time; __artie_db_updated_at = the
    // source event time already decoded into __source_ts_ms
    val withUpdatedAt =
      if (cfg.includeArtieUpdatedAt)
        withStatic.withColumn(Constants.UpdatedAtCol, current_timestamp())
      else withStatic
    if (cfg.includeDatabaseUpdatedAt && withUpdatedAt.columns.contains("__source_ts_ms"))
      withUpdatedAt.withColumn(Constants.DbUpdatedAtCol,
        timestamp_millis(col("__source_ts_ms")))
    else withUpdatedAt
  }

  /** Hadoop FileSystem.rename signals most failures by RETURNING FALSE
    * (HDFS destination-exists / parent-missing, S3A copy failure) rather
    * than throwing — an unchecked swap rename would silently drop a
    * flush while the batch marker still advances. Every rename in the
    * snapshot-swap and marker protocols goes through this guard.
    */
  private def renameOrFail(fs: org.apache.hadoop.fs.FileSystem,
                           src: Path, dst: Path): Unit =
    require(fs.rename(src, dst),
      s"filesystem rename $src -> $dst returned false (destination exists, " +
        "parent missing, or store-side copy failure) — failing the flush " +
        "loudly so the batch replays instead of silently losing its changes")

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
      renameOrFail(fs, prev, dst) // crashed between demote and promote: roll back
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
    val merged = CdcOps.mergeApply(base, changes, cfg.effectivePrimaryKeys,
      Seq(col(cfg.orderCol)), soft, cfg.toastCols)
    val tmp = new Path(path + "__staging")
    merged.write.mode("overwrite").parquet(tmp.toString)
    val dst = new Path(path)
    val prev = new Path(path + "__prev")
    // resolveSnapshot above already cleared any leftover __prev, so both
    // renames have a free destination; a false return is a real failure
    if (fs.exists(dst)) renameOrFail(fs, dst, prev)
    renameOrFail(fs, tmp, dst)
    if (fs.exists(prev)) fs.delete(prev, true)
  }

  /** PK-hash bucket id — deterministic across runs (murmur3). */
  private[streaming] def bucketId(pks: Seq[String], n: Int): org.apache.spark.sql.Column =
    pmod(hash(pks.map(col): _*), lit(n))

  private def bucketDir(path: String, b: Int) = s"$path/bucket$b/live"

  /** Recorded bucket count of a bucketed snapshot, None if absent or
    * unreadable (a crash mid-create is treated as absent — the marker is
    * written atomically via temp+rename, so this only covers legacy/
    * corrupted files).
    */
  private[streaming] def recordedNumBuckets(spark: SparkSession, path: String): Option[Int] = {
    val marker = new Path(path + "/__nbuckets")
    val fs = marker.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      // corrupt marker -> LOUD (round-13 review): treating it as None let
      // an un-bucketed merge (numBuckets=0) pass the reverse-transition
      // guard and destroy the bucketed layout; the bucketed branch
      // already refuses on the same corruption
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toInt)
      catch { case e: Exception =>
        throw new IllegalStateException(
          s"corrupt bucket-count marker $marker — restore it to the " +
            "snapshot's real bucket count (or rebuild the snapshot); " +
            "refusing to guess a layout", e)
      }
      finally in.close()
    }
  }

  /** Bucketed merge: route batch rows to their PK-hash bucket and run the
    * snapshot swap ONLY for touched buckets — per-flush I/O is
    * O(batch x table/numBuckets), not O(table). Each bucket is its own
    * crash-safe snapshot (same swap + [[resolveSnapshot]] recovery, one
    * level down at `path/bucket<i>/live`); a replayed batch re-merges
    * idempotently. The touched-bucket collect is bounded by numBuckets.
    */
  private def mergeIntoBucketedSnapshot(changes: DataFrame, cfg: Config,
                                        path: String, soft: Boolean): Unit = {
    val pks = cfg.effectivePrimaryKeys
    // the bucket count is part of the on-disk layout: changing it would
    // route a PK to a different bucket and leave its old row stranded, so
    // it is recorded on first write and enforced afterwards
    val spark0 = changes.sparkSession
    recordedNumBuckets(spark0, path) match {
      case Some(recorded) =>
        require(recorded == cfg.numBuckets,
          s"snapshot at $path was written with numBuckets=$recorded; " +
            s"refusing to merge with numBuckets=${cfg.numBuckets} (would strand rows in stale buckets)")
      case None =>
        // None now means truly ABSENT: recordedNumBuckets throws on a
        // corrupt marker (round-13 review — previously only this bucketed
        // branch distinguished corrupt-from-absent, so the UN-bucketed
        // reverse-transition guard read corruption as "no marker" and an
        // numBuckets=0 merge could destroy the bucketed layout)
        // mode transition guard: an existing UN-bucketed snapshot here would
        // become invisible to bucketed reads — rows silently stranded
        require(resolveSnapshot(spark0, path).isEmpty,
          s"snapshot at $path exists un-bucketed; refusing to merge with " +
            s"numBuckets=${cfg.numBuckets} (rebuild the snapshot to change layout)")
        val marker = new Path(path + "/__nbuckets")
        val fs0 = marker.getFileSystem(spark0.sparkContext.hadoopConfiguration)
        // temp + rename so a crash never leaves a half-written marker;
        // checked, because a false rename would leave the layout guard
        // disabled and a later numBuckets change would strand rows
        val tmp = new Path(path + "/__nbuckets.tmp")
        val out = fs0.create(tmp, true)
        out.write(cfg.numBuckets.toString.getBytes("UTF-8"))
        out.close()
        fs0.delete(marker, false) // corrupt leftover would block the rename
        renameOrFail(fs0, tmp, marker)
    }
    val withB = changes.withColumn("__bucket", bucketId(pks, cfg.numBuckets))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val touched = withB.select("__bucket").distinct().collect()
        .map(_.getInt(0)).sorted
      // Touched-bucket merges are INDEPENDENT snapshot-swap units
      // (disjoint bucket dirs, disjoint PK spaces by the routing hash),
      // so they are submitted concurrently: the previous sequential loop
      // ran one Spark job-depth PER bucket, making flush latency
      // O(touched) — the latency ceiling for a wide batch at
      // numBuckets ~ 1e4. A bounded pool keeps the scheduler saturated
      // without queueing thousands of driver threads; each merge's
      // crash-safety story is unchanged (per-bucket staging + rename).
      // All submissions are AWAITED (even after a failure) before the
      // backing batch is unpersisted, then the first failure propagates.
      if (touched.length <= 1) {
        touched.foreach { b =>
          mergeIntoSnapshot(withB.filter(col("__bucket") === b).drop("__bucket"),
            cfg, bucketDir(path, b), soft)
        }
      } else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        val pool = java.util.concurrent.Executors.newFixedThreadPool(
          math.min(touched.length, MaxConcurrentBucketMerges))
        implicit val ec: ExecutionContext = ExecutionContext.fromExecutorService(pool)
        try {
          val attempts = touched.toSeq.map { b =>
            Future {
              mergeIntoSnapshot(withB.filter(col("__bucket") === b).drop("__bucket"),
                cfg, bucketDir(path, b), soft)
            }.transform(scala.util.Success(_)) // capture, never fail the sequence
          }
          val results = Await.result(Future.sequence(attempts),
            scala.concurrent.duration.Duration.Inf)
          results.collectFirst { case scala.util.Failure(e) => throw e }
        } finally { pool.shutdown() }
      }
      ()
    } finally { withB.unpersist(); () }
  }

  /** Concurrency cap for per-bucket snapshot merges within one flush —
    * enough in-flight jobs to saturate the cluster scheduler, few enough
    * that a wide batch doesn't queue thousands of driver threads.
    */
  private val MaxConcurrentBucketMerges = 8

  /** Read a bucketed snapshot: resolve any crashed per-bucket swaps, then
    * scan all live bucket dirs (mergeSchema because schema evolution only
    * rewrites touched buckets).
    */
  def readBucketedSnapshot(spark: SparkSession, path: String): Option[DataFrame] = {
    val root = new Path(path)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return None
    val lives = fs.listStatus(root).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("bucket"))
      .flatMap(s => resolveSnapshot(spark, s.getPath.toString + "/live"))
    if (lives.isEmpty) None
    else Some(spark.read.option("mergeSchema", "true").parquet(lives.map(_.toString): _*))
  }

  /** S7 wired: snapshot-schema lookups go through the 24 h TTL
    * TableConfigCache (one per session) instead of re-listing parquet
    * footers every micro-batch — the reference caches destination schemas
    * the same way (destination_table_config.go:13-31). Invalidated when a
    * batch introduces columns the cached schema lacks (= the merge will
    * evolve the snapshot), mirroring the reference's wipe-on-ALTER.
    */
  private val snapshotSchemaCaches =
    scala.collection.concurrent.TrieMap.empty[SparkSession, graft.sources.TableConfigCache]

  private[streaming] def snapshotSchemaCache(spark: SparkSession): graft.sources.TableConfigCache = {
    // drop caches of stopped sessions so session churn can't leak them
    snapshotSchemaCaches.filterInPlace((s, _) => !s.sparkContext.isStopped)
    snapshotSchemaCaches.getOrElseUpdate(spark,
      new graft.sources.TableConfigCache(spark, fetcher = Some { path =>
        // bucketed layout first: its root exists as a dir of bucket<i>/live
        // subdirs, which a plain parquet read cannot infer
        readBucketedSnapshot(spark, path) match {
          case Some(df) => df.schema
          case None => resolveSnapshot(spark, path) match {
            case Some(p) => spark.read.parquet(p.toString).schema
            case None => org.apache.spark.sql.types.StructType(Nil)
          }
        }
      }))
  }

  /** Marker recording the highest applied batch id next to the snapshot:
    * replays after checkpoint recovery become true no-ops (the merge is
    * idempotent anyway — the marker just skips the work, the
    * at-least-once + idempotent-merge contract of flush.go:67-147).
    */
  private def lastAppliedBatch(spark: SparkSession, targetPath: String,
                               marker: String = "__batch"): Long = {
    val p = new Path(targetPath + marker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readId(path: Path): Long =
      if (!fs.exists(path)) -1L
      else {
        val in = fs.open(path)
        try new String(in.readAllBytes(), "UTF-8").trim.toLong
        catch { case _: Exception => -1L }
        finally in.close()
      }
    // recordBatch's delete-then-rename leaves a crash window where the
    // main marker is ABSENT while the .tmp sibling holds the id of work
    // that already ran (the marker is always written AFTER the batch
    // body) — read both and take the max, else an absent marker reads
    // as -1 and re-opens the append-duplication replay window the
    // temp+rename scheme exists to close (ADVICE r13). A torn .tmp
    // parses to -1 and is ignored.
    math.max(readId(p), readId(new Path(targetPath + marker + ".tmp")))
  }

  /** Marker suffix for the byte-capped path's SYNTHETIC sub-batch ids.
    * Kept DISTINCT from the plain `__batch` marker because the two id
    * spaces do not compare: a synthetic id (`batchId * 1e6 + chunk`) is
    * always far above every real batch id, so if the byte-capped path
    * ever wrote it into `__batch`, a later switch back to plain
    * [[applyBatch]] would see every real batch id below the recorded
    * marker and silently skip ALL future batches — unbounded data loss
    * with no error. With separate markers the reverse switch instead
    * fails loudly (see the guard in [[applyBatch]]).
    */
  private[streaming] val SubBatchMarker = "__subbatch"

  /** At-most-once-per-batch guard for non-idempotent sinks (plain
    * appends): replayed batch ids after checkpoint recovery become no-ops
    * via the same marker the merge path uses. A crash between the sink
    * write and the marker still duplicates that one batch — append has no
    * idempotent form without a transactional format; this narrows the
    * window to the same one the reference's append path has.
    */
  def runOncePerBatch(spark: SparkSession, targetPath: String, batchId: Long)
                     (body: => Unit): Unit = {
    if (batchId <= lastAppliedBatch(spark, targetPath)) return
    body
    recordBatch(spark, targetPath, batchId)
  }

  private def recordBatch(spark: SparkSession, targetPath: String, batchId: Long,
                          marker: String = "__batch"): Unit = {
    // checked temp+rename like every other sidecar write (round-13
    // review: this was the one marker written with a plain overwrite —
    // a torn __batch file parses to -1 and re-opens the
    // append-duplication window runOncePerBatch exists to narrow)
    val p = new Path(targetPath + marker)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val tmp = new Path(targetPath + marker + ".tmp")
    val out = fs.create(tmp, true)
    out.write(batchId.toString.getBytes("UTF-8"))
    out.close()
    fs.delete(p, false)
    require(fs.rename(tmp, p),
      s"marker rename $tmp -> $p returned false — failing loudly instead of " +
        "losing the replay marker")
    ()
  }

  /** One micro-batch flush. With msmSteps > 1, batches accumulate in a
    * soft-merged staging snapshot (delete markers preserved); every Nth
    * batch the staging set merges into the target and the staging snapshot
    * resets (D8).
    */
  def applyBatch(batch: DataFrame, batchId: Long, cfg: Config, targetPath: String): Unit = {
    // id-scheme guard (the other half of [[SubBatchMarker]]'s contract):
    // once a target has been driven by the byte-capped path, its replay
    // state lives in synthetic sub-batch ids — resuming it with plain
    // batch ids has no defined ordering against that state, so fail
    // loudly instead of silently double-applying or skipping. Migrating
    // back is an explicit operator action: remove `<target>__subbatch`
    // (the snapshot itself is scheme-agnostic; the merge is idempotent).
    val spark = batch.sparkSession
    require(lastAppliedBatch(spark, targetPath, SubBatchMarker) < 0,
      s"snapshot at $targetPath was last written by applyBatchByteCapped " +
        s"(marker $targetPath$SubBatchMarker exists); plain batch ids do not " +
        "compare with its synthetic sub-batch ids — continue with " +
        "applyBatchByteCapped, or delete the __subbatch marker to migrate back")
    applyBatchMarked(batch, batchId, cfg, targetPath, "__batch")
  }

  private def applyBatchMarked(batch: DataFrame, batchId: Long, cfg: Config,
                               targetPath: String, marker: String,
                               observeDrops: Boolean = true): Unit = {
    if (batch.isEmpty) return
    if (batchId <= lastAppliedBatch(batch.sparkSession, targetPath, marker)) return // replay: no-op
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
    // the byte-capped path observes ONCE per micro-batch before the chunk
    // loop — every chunk shares the batch's column set, so per-chunk
    // observation would repeat the delete-only probe job and sidecar IO
    if (observeDrops) observeColumnDrops(transformed, batchId, cfg, targetPath)
    // bucketed mode touches only the buckets the batch lands in
    def dispatch(chg: DataFrame, soft: Boolean): Unit =
      if (cfg.numBuckets > 0) mergeIntoBucketedSnapshot(chg, cfg, targetPath, soft)
      else {
        // reverse mode-transition guard: an un-bucketed merge over a
        // bucketed root would misread the bucket dirs as a plain snapshot
        require(recordedNumBuckets(batch.sparkSession, targetPath).isEmpty,
          s"snapshot at $targetPath is bucketed; refusing un-bucketed merge " +
            "(set numBuckets to the recorded value or rebuild the snapshot)")
        mergeIntoSnapshot(chg, cfg, targetPath, soft)
      }
    // watchdog around the merge proper (merge.go:34-40 wraps every
    // warehouse merge the same way): a flush that outlives the
    // reference's 30 min initial delay logs a liveness line every 2 min
    // — the breadcrumb that separates a deadlocked merge from a slow one
    Heartbeats.monitored("merge", Map("table" -> targetPath)) {
      if (cfg.msmSteps <= 1) {
        dispatch(changes, cfg.softDelete)
      } else {
        // the msm staging snapshot stays un-bucketed: it holds at most
        // msmSteps flushes, so rewriting it whole is already O(batch)
        val stagingPath = targetPath + "__msm"
        mergeIntoSnapshot(changes, cfg.copy(numBuckets = 0), stagingPath, soft = true)
        if ((batchId + 1) % cfg.msmSteps == 0) {
          val spark = batch.sparkSession
          val staged = spark.read.parquet(stagingPath)
          dispatch(staged, cfg.softDelete)
          val fs = new Path(stagingPath).getFileSystem(spark.sparkContext.hadoopConfiguration)
          fs.delete(new Path(stagingPath), true)
        }
      }
    }
    recordBatch(batch.sparkSession, targetPath, batchId, marker)
    // drop the cached snapshot schema when this merge created the snapshot
    // or evolved it with new columns; otherwise the TTL entry stays valid.
    // __artie markers are excluded: hard-delete snapshots never store
    // __artie_delete, so counting it would invalidate on every batch.
    val cache = snapshotSchemaCache(batch.sparkSession)
    val cached = cache.schemaOf(targetPath).fieldNames.toSet
    val dataCols = changes.columns.filterNot(_.startsWith("__artie"))
    if (cached.isEmpty || !dataCols.forall(cached.contains))
      cache.invalidate(targetPath)
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
    val snapshotSchema = snapshotSchemaCache(spark).schemaOf(targetPath)
    if (snapshotSchema.isEmpty) return Nil
    val snapshotCols = snapshotSchema.fieldNames.toSet
    val batchCols = batch.columns.toSet
    val absent = snapshotCols.diff(batchCols)
      .filterNot(c => c.startsWith("__artie") || cfg.effectivePrimaryKeys.contains(c))
    val containsOtherOps =
      !batch.columns.contains(Constants.DeleteCol) ||
        batch.filter(coalesce(col(Constants.DeleteCol).cast("boolean"),
          lit(false)) === false).limit(1).count() > 0
    // the sidecar lives on the SNAPSHOT's filesystem (hadoop path, like
    // every other marker here) — a nio local path would strip an
    // hdfs://… scheme and fork the drop window per driver host
    val sidecar = targetPath + "__dropstate"
    val before = graft.sink.EmitSink.readSidecarLines(batch, sidecar)
    val dc = graft.schema.SchemaEvolution.DropConfidence.fromLines(before, graceHours)
    val droppable = dc.observe(absent, now, containsOtherOps)
    if (dc.toLines != before)
      graft.sink.EmitSink.writeSidecarLines(batch, sidecar, dc.toLines)
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

  /** Sub-batch id stride for [[applyBatchByteCapped]]: synthetic ids are
    * `batchId * stride + chunk`, monotonic across batches while a single
    * micro-batch stays under stride chunks (at the reference's 25 MB cap
    * that is a 25 TB micro-batch — far past any trigger's ingest).
    */
  private val SubBatchStride = 1000000L

  /** T2 closed: the reference's byte-size flush trigger
    * (lib/config/config.go:20 — flush when the buffer reaches 25 MB) as
    * an admission-control `foreachBatch` splitter. The micro-batch is
    * chunked by [[CdcOps.byteCappedChunks]] (estimated bytes, contiguous
    * in `cfg.orderCol` order) and each chunk merges INDEPENDENTLY in
    * stream order under its own synthetic sub-batch marker — so a crash
    * mid-batch resumes at the first unapplied chunk on replay, exactly
    * the bounded-buffer durability the reference's byte trigger buys
    * (no chunk ever re-merges; the merge itself is idempotent anyway).
    * With `byteEstimate` unset, rows are costed by their JSON length
    * ([[CdcOps.approxRowBytes]]).
    *
    * Replay state lives under the DISTINCT [[SubBatchMarker]] (not the
    * plain `__batch` marker) so the synthetic ids can never poison a
    * later plain-applyBatch resume — that switch now fails loudly
    * instead of silently skipping every real batch id below the huge
    * recorded synthetic one.
    */
  def applyBatchByteCapped(batch: DataFrame, batchId: Long, cfg: Config,
                           targetPath: String, maxBytes: Long,
                           byteEstimate: Option[org.apache.spark.sql.Column] = None): Unit = {
    // msmSteps keys its staging flush on (batchId + 1) % msmSteps; the
    // synthetic sub-batch ids here are sparse (chunk ids are prefix
    // divisions), so the modular cadence would fire at arbitrary chunks
    // — or never — and staging would grow unboundedly. The two buffer
    // disciplines don't compose; pick one.
    require(cfg.msmSteps <= 1,
      s"applyBatchByteCapped does not compose with msmSteps=${cfg.msmSteps}: " +
        "the multi-step staging flush keys on contiguous batch ids, which " +
        "synthetic sub-batch ids are not")
    // persist across the pre-chunk probes (round-13 review): isEmpty,
    // the drop-observation flags, and the chunker each re-scanned the
    // un-persisted source — ~3 redundant broker reads per micro-batch on
    // the hot flush path (applyBatchWithDeadLetter already pins its
    // batch the same way)
    val pinned = batch.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      // history targets skip drop observation like the plain path does
      // (round-13 review: observing a history dir diffs against its
      // partition-discovery schema and emits bogus drop advice)
      if (!cfg.historyMode && !pinned.isEmpty)
        observeColumnDrops(applyRowTransforms(pinned, cfg), batchId, cfg, targetPath)
      forEachByteCappedChunk(pinned, cfg, maxBytes, byteEstimate) { (chunk, c) =>
        applyBatchMarked(chunk, batchId * SubBatchStride + c, cfg, targetPath,
          SubBatchMarker, observeDrops = false)
      }
    } finally { pinned.unpersist(); () }
  }

  /** The byte-capped splitter generalized over the per-chunk SINK — the
    * composition that IS the reference's real flush: byte-TRIGGERED
    * (config.go:20's 25 MB buffer cap) and statement-EMITTING
    * (clients/shared/merge.go). Each chunk lands through `sink` under its
    * synthetic sub-batch id in stream order, e.g.
    * `SinkRegistry.sink("emit:snowflake", cfg)` stages + plans one
    * statement series per ≤ maxBytes chunk — exactly one warehouse
    * round-trip per buffer-cap crossing, like the reference. Idempotence
    * is the sink's own contract (the emit sink's per-batch overwrite;
    * merge sinks should come through [[applyBatchByteCapped]], whose
    * sub-batch markers also guard the plain-resume switch).
    */
  def applyBatchByteCappedWith(batch: DataFrame, batchId: Long, cfg: Config,
                               target: String, maxBytes: Long,
                               sink: (DataFrame, Long, String) => Unit,
                               byteEstimate: Option[org.apache.spark.sql.Column] = None): Unit = {
    // scheme pin (round-13 review): generic sinks here receive SYNTHETIC
    // sub-batch ids. A marker-based merge sink composed by mistake would
    // record them into the plain __batch marker, and a later switch back
    // to plain applyBatch would silently skip every real batch id below
    // the huge recorded one — unbounded loss. Writing the sub-batch
    // scheme marker BEFORE dispatch (one below this batch's first chunk
    // id, so no chunk reads as already-applied) makes such a sink fail
    // loudly through applyBatch's scheme guard on the next batch instead;
    // merge sinks must come through applyBatchByteCapped, as documented.
    recordBatch(batch.sparkSession, target, batchId * SubBatchStride - 1, SubBatchMarker)
    forEachByteCappedChunk(batch, cfg, maxBytes, byteEstimate) { (chunk, c) =>
      sink(chunk, batchId * SubBatchStride + c, target)
    }
  }

  /** Shared chunk loop: split on estimated bytes in `cfg.orderCol` order
    * WITH the primary keys as tiebreakers, persist once, hand each chunk
    * (in chunk order — stream order) to `f` with its CHUNK id (callers
    * fold the batch id into the synthetic sub-batch id). Chunk count is
    * bounded by batch bytes / maxBytes.
    *
    * The tiebreakers are replay-correctness, not cosmetics: `orderCol`
    * alone ('offset') collides across Kafka partitions, and rows tied in
    * the running-sum window would get shuffle-fetch-order-dependent
    * prefix sums — chunk membership could differ between the original
    * run and a crash replay, letting a row drift into an already-marked
    * chunk and never merge. (orderCol, pks) is unique for CDC streams,
    * so chunk assignment is a pure function of the data.
    */
  private def forEachByteCappedChunk(batch: DataFrame, cfg: Config, maxBytes: Long,
                                     byteEstimate: Option[org.apache.spark.sql.Column])
                                    (f: (DataFrame, Long) => Unit): Unit = {
    if (batch.isEmpty) return
    val est = byteEstimate.getOrElse(CdcOps.approxRowBytes(batch))
    val orderCols = col(cfg.orderCol) +:
      cfg.effectivePrimaryKeys.filterNot(_ == cfg.orderCol).map(col)
    val chunked = CdcOps.byteCappedChunks(batch, orderCols, est, maxBytes)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val chunks = chunked.select(col("__chunk")).distinct()
        .collect().map(_.getLong(0)).sorted
      chunks.foreach { c =>
        f(chunked.filter(col("__chunk") === c).drop("__chunk"), c)
      }
    } finally { chunked.unpersist(); () }
  }

  /** [[start]]'s byte-capped twin — T2 reachable from a RUNNING stream:
    * each micro-batch is admission-split by [[CdcOps.byteCappedChunks]]
    * and merged chunk-by-chunk under sub-batch replay markers, so a crash
    * mid-batch resumes at the first unapplied chunk after checkpoint
    * recovery (the reference's 25 MB buffer-flush trigger, config.go:20,
    * as a streaming sink mode rather than a hand-rolled foreachBatch).
    */
  def startByteCapped(decoded: DataFrame, cfg: Config, targetPath: String,
                      checkpoint: String, maxBytes: Long,
                      byteEstimate: Option[org.apache.spark.sql.Column] = None): StreamingQuery =
    decoded.writeStream
      .trigger(Trigger.ProcessingTime(cfg.flushInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatchByteCapped(batch, id, cfg, targetPath, maxBytes, byteEstimate)
      }
      .start()

  /** [[startByteCapped]] over an arbitrary per-chunk sink (see
    * [[applyBatchByteCappedWith]]) — with an `emit:` sink this is the
    * reference's COMPLETE operating loop from a running stream: consume,
    * buffer to the byte cap, and emit one staged batch + ordered
    * statement plan per cap crossing.
    */
  def startByteCappedWith(decoded: DataFrame, cfg: Config, target: String,
                          checkpoint: String, maxBytes: Long,
                          sink: (DataFrame, Long, String) => Unit,
                          byteEstimate: Option[org.apache.spark.sql.Column] = None): StreamingQuery =
    decoded.writeStream
      .trigger(Trigger.ProcessingTime(cfg.flushInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatchByteCappedWith(batch, id, cfg, target, maxBytes, sink, byteEstimate)
      }
      .start()

  /** Single-table micro-batch with poison-message dead-lettering: frames
    * whose envelope fails to decode land under `deadLetterDir/batch=<id>`
    * (idempotent per-batch overwrite, same shape as the multi-table
    * `__unrouted` sidecar) instead of being silently dropped by the decode
    * filter; the batch's decodable rows still merge. Mirrors the
    * reference's surfaced per-record processing errors
    * (processes/consumer/process.go).
    */
  def applyBatchWithDeadLetter(frames: DataFrame, batchId: Long,
                               rowSchema: org.apache.spark.sql.types.StructType,
                               cfg: Config, targetPath: String,
                               deadLetterDir: String,
                               bare: Boolean = false): Unit = {
    // the batch feeds three consumers (dead-letter probe + write, decode +
    // merge) — persist once so each pass reads blocks instead of
    // re-scanning the source and re-running from_json
    val pinned = frames.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      if (pinned.isEmpty) return
      val dead = graft.cdc.Envelope.malformedRelational(pinned, rowSchema, bare)
      if (!dead.isEmpty)
        dead.write.mode("overwrite").parquet(s"$deadLetterDir/batch=$batchId")
      val decoded =
        if (bare) graft.cdc.Envelope.decodeBareRelational(pinned, rowSchema)
        else graft.cdc.Envelope.decodeRelational(pinned, rowSchema)
      applyBatch(decoded, batchId, cfg, targetPath)
    } finally { pinned.unpersist(); () }
  }

  /** [[start]] over RAW frames with dead-lettering: decode happens inside
    * the batch (where the raw value is still available to preserve), not
    * upstream in the stream plan. `bare` must match the topic's envelope
    * shape (schemas.enable=false drops the payload wrapper) — probe with
    * Envelope.decodeInferred's sample logic when unknown.
    */
  def startWithDeadLetter(frames: DataFrame,
                          rowSchema: org.apache.spark.sql.types.StructType,
                          cfg: Config, targetPath: String, checkpoint: String,
                          deadLetterDir: String,
                          bare: Boolean = false): StreamingQuery =
    frames.writeStream
      .trigger(Trigger.ProcessingTime(cfg.flushInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyBatchWithDeadLetter(batch, id, rowSchema, cfg, targetPath,
          deadLetterDir, bare)
      }
      .start()

  /** Source table name from the decoded source-metadata JSON — the routing
    * id for multi-table topics (processes/consumer/process.go:28-102 keys
    * its in-memory buffers the same way).
    */
  def sourceTableName: org.apache.spark.sql.Column =
    get_json_object(col(Constants.SourceMetadataCol), "$.table")

  /** One micro-batch of a MIXED multi-table stream: split by table id and
    * merge each slice into its own target under `targetRoot/<table>`.
    * The distinct-table collect is bounded by the table count (the
    * reference buffers per table in memory the same way); the batch is
    * persisted once so the per-table filters don't rescan the source.
    */
  def applyMultiTableBatch(batch: DataFrame, batchId: Long,
                           cfgFor: String => Config, targetRoot: String): Unit =
    applyMultiTableBatchWith(batch, batchId, targetRoot,
      t => (slice, id, target) => applyBatch(slice, id, cfgFor(t), target))

  /** [[applyMultiTableBatch]] generalized over the per-table SINK — the
    * reference flushes EVERY table of a topic through whatever client the
    * destination is (processes/consumer/flush.go:67-147), so the demux
    * composes with any registry label: `sinkFor(t)` returning an
    * `emit:<dialect>` sink stages + plans per table (each table gets its
    * own workspace dir, `__destschema` sidecar, and plan series under
    * `targetRoot/<table>`), a merge sink snapshots per table, etc.
    */
  def applyMultiTableBatchWith(batch: DataFrame, batchId: Long, targetRoot: String,
                               sinkFor: String => (DataFrame, Long, String) => Unit): Unit = {
    if (batch.isEmpty) return
    val withTable = batch.withColumn("__table", sourceTableName)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val tables = withTable.select("__table").distinct().collect()
        .map(_.getString(0)).sorted(Ordering[String].on[String](s => if (s == null) "" else s))
      tables.foreach {
        case null =>
          // rows without a source table id cannot be routed — dead-letter
          // them per batch (idempotent overwrite) instead of silently
          // dropping data the marker would never let a replay recover
          withTable.filter(col("__table").isNull).drop("__table")
            .write.mode("overwrite").parquet(s"$targetRoot/__unrouted/batch=$batchId")
        case t =>
          sinkFor(t)(withTable.filter(col("__table") === t).drop("__table"),
            batchId, s"$targetRoot/${tableDirName(t)}")
      }
    } finally { withTable.unpersist(); () }
  }

  /** Filesystem-safe directory name for a routed table id: P7 sanitization
    * (strips '/', quoting, case) plus a suffix when the sanitized name
    * would collide with the pipeline's sidecar suffixes (`users__batch`
    * the table vs `users` the table's replay marker).
    */
  private[graft] def tableDirName(t: String): String = {
    val s = Converters.sanitizeName(t)
    // __execclock/__msmschema/__msmflush joined the sidecar family in
    // rounds 12-13. Known residual (documented, round-13 review): the
    // soft-partitioned sink's DYNAMIC `_yyyy_MM`/`_default` suffix targets
    // cannot be enumerated here — month-shard-named sibling TABLES (an
    // `events` table next to an `events_2024_01` table) would collide
    // with `events`'s partition targets; route such topics to per-table
    // roots (or non-soft-partitioned sinks) instead.
    if (s.matches(".*__(batch|subbatch|msm|msmschema|msmflush|prev|staging|dropstate|nbuckets|unrouted|destschema|execclock)$")) s + "_t" else s
  }

  /** S1+demux: route one decoded stream carrying many tables into
    * per-table snapshots (ref processes/consumer/process.go:28-102,
    * models/memory.go:53-104 — per-table buffering/flush collapsed into
    * the per-table micro-batch merge).
    */
  def startMultiTable(decoded: DataFrame, cfgFor: String => Config,
                      targetRoot: String, checkpoint: String,
                      flushInterval: String = "10 seconds"): StreamingQuery =
    startMultiTableWith(decoded, targetRoot, checkpoint,
      t => (slice, id, target) => applyBatch(slice, id, cfgFor(t), target),
      flushInterval)

  /** [[startMultiTable]] over an arbitrary per-table sink (see
    * [[applyMultiTableBatchWith]]) — e.g.
    * `t => SinkRegistry.sink("emit:snowflake", cfgFor(t), emitTable = Some(t))`
    * runs the statement-emitting flush for every table of the topic.
    */
  def startMultiTableWith(decoded: DataFrame, targetRoot: String, checkpoint: String,
                          sinkFor: String => (DataFrame, Long, String) => Unit,
                          flushInterval: String = "10 seconds"): StreamingQuery =
    decoded.writeStream
      .trigger(Trigger.ProcessingTime(flushInterval))
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, id: Long) =>
        applyMultiTableBatchWith(batch, id, targetRoot, sinkFor)
      }
      .start()
}
