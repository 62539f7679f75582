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
                         tsCol: String): Unit = {
    // the derived partition key would silently CLOBBER a row column named
    // `date` (common in relational sources) and fold it into the
    // directory key — fail loudly like the other reserved-column guards
    require(!df.columns.contains("date") || tsCol == "date",
      "partitionedParquet derives a `date` partition column but the frame " +
        "already carries one — rename it (or pass tsCol = \"date\" to " +
        "partition by the existing column as-is)")
    // tsCol == "date" honors the guard message's promise and partitions
    // by the existing column AS-IS (round-13 review: re-deriving it with
    // date_format nulled any value not parseable as a date and silently
    // routed those rows to __HIVE_DEFAULT_PARTITION__)
    val keyed =
      if (tsCol == "date") df
      else df.withColumn("date", date_format(col(tsCol), "yyyy-MM-dd"))
    keyed
      .write
      .mode("append")
      .option("compression", "gzip")
      .partitionBy("date")
      .parquet(s"$basePrefix/$fqTableName")
  }

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

  /** Read-or-record the routing clock for one batch: attempt 1 records
    * `(batchId, Instant.now)` in the SINGLE `base__execclock` marker
    * (overwritten per batch — only the latest batch can ever replay
    * after checkpoint recovery, so one file bounds the state; the
    * `__batch` replay marker has the same design); a crash-replay of the
    * SAME batch id reads attempt 1's clock back and re-routes with it,
    * so a boundary-straddling replay cannot reclassify suffixes (the
    * future→current duplication documented on [[softPartitionedAppend]]).
    *
    * The write is temp+rename (a torn marker must not fabricate a
    * clock) and the read falls back to re-pinning on any parse failure —
    * safe, because the clock is recorded BEFORE any append of that
    * attempt: a torn or missing marker means attempt 1 died before
    * routing anything, so a fresh clock re-routes a batch nothing of
    * which has landed. A poison marker therefore can never wedge the
    * stream (fail→replay→fail), unlike a strict parse.
    */
  private def pinnedBatchClock(spark: org.apache.spark.sql.SparkSession,
                               base: String, batchId: Long): java.time.Instant = {
    val p = new org.apache.hadoop.fs.Path(s"${base}__execclock")
    val hadoopFs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val recorded: Option[java.time.Instant] =
      if (!hadoopFs.exists(p)) None
      else {
        val in = hadoopFs.open(p)
        try {
          val Array(id, ms) = new String(in.readAllBytes(), "UTF-8").trim.split("\t", 2)
          if (id.toLong == batchId) Some(java.time.Instant.ofEpochMilli(ms.toLong))
          else None // a NEW batch id: pin a fresh clock below
        }
        catch { case scala.util.control.NonFatal(_) => None }
        finally in.close()
      }
    recorded.getOrElse {
      val now = java.time.Instant.now()
      val tmp = new org.apache.hadoop.fs.Path(s"${base}__execclock.tmp")
      val out = hadoopFs.create(tmp, true)
      out.write(s"$batchId\t${now.toEpochMilli}".getBytes("UTF-8"))
      out.close()
      hadoopFs.delete(p, false)
      // checked: a silently-false rename would lose the pinned clock and
      // re-open the boundary-straddling replay duplication the pin closes
      require(hadoopFs.rename(tmp, p),
        s"routing-clock rename $tmp -> $p returned false — failing the batch " +
          "loudly so the replay re-pins instead of routing unpinned")
      now
    }
  }

  /** P12 wired to a sink: route each row to `base<suffix>` by the
    * soft-partition suffix of its timestamp (`_yyyy_MM`) — the reference
    * routes to suffixed TABLES, not partition dirs
    * (models/event/soft_partition.go:13-47), so each suffix gets its own
    * append target. The full reference routing policy:
    *
    *   - a FUTURE partition (vs `executionTime`, at partition
    *     granularity — topic.go:126-143 sign) REJECTS the batch with an
    *     error naming the offending suffixes (soft_partition.go:29-32);
    *   - a PAST partition whose target does not already exist routes to
    *     the COMPACTED table `base_default` (soft_partition.go:33-43 —
    *     partition tables are only created while their partition is
    *     current, so late data for a never-created partition lands in
    *     the compacted table instead of resurrecting it);
    *   - the CURRENT partition always writes to its own target,
    *     creating it if absent.
    *
    * Documented deviations: a NULL timestamp routes to `base_default`
    * instead of erroring the batch (the reference would fail the event;
    * the compacted table is the conservative landing zone that keeps a
    * poison row from wedging the stream), and `rejectFuture = false`
    * extends the same stream-survival treatment to FUTURE partitions —
    * the streaming sink ([[SinkRegistry]]) uses it because a single
    * clock-skewed producer would otherwise fail the batch, replay, and
    * fail again forever (the reference surfaces the error to its
    * consumer loop, which has a human retry; a structured-streaming
    * query does not). The default keeps reference semantics.
    *
    * Replay caveat: `executionTime` defaults to processing time, so a
    * replay that STRADDLES a partition boundary (crash Aug 31, restart
    * Sep 1) can reclassify suffixes. Current→past lands rows in
    * `base_default` instead of the (never-created) partition target —
    * rows are never lost, only routed to the compacted table, exactly
    * where the reference sends past rows whose table is missing. In
    * stream-survival mode (`rejectFuture = false`) there is a worse
    * crossing: future→current. Attempt 1 folded the future rows into
    * `base_default` (marker written THERE); the replay routes the same
    * rows to the now-current `base<sfx>` target, whose own marker is
    * absent — the rows land in BOTH targets, i.e. a boundary-straddling
    * replay can DUPLICATE future-classified rows across two targets,
    * not merely reroute them. Pin `executionTime` when byte-exact replay
    * routing matters — or set `pinExecutionTime = true` (needs
    * `batchId`), which records the FIRST attempt's clock in a per-batch
    * `__execclock` sidecar and replays against it, so a
    * boundary-straddling replay classifies every suffix exactly as
    * attempt 1 did and the per-target markers hold.
    *
    * The distinct-suffix collect is bounded by the batch's partition
    * span; the existence probes are one FileSystem call per distinct
    * suffix.
    */
  def softPartitionedAppend(df: DataFrame, base: String, tsCol: String,
                            batchId: Option[Long] = None,
                            executionTime: Option[java.time.Instant] = None,
                            rejectFuture: Boolean = true,
                            rejectNullTs: Boolean = false,
                            pinExecutionTime: Boolean = false): Seq[String] = {
    val spark = df.sparkSession
    val pattern = "_yyyy_MM"
    val execInstant = executionTime.getOrElse {
      batchId match {
        case Some(id) if pinExecutionTime => pinnedBatchClock(spark, base, id)
        case _ =>
          require(!pinExecutionTime,
            "pinExecutionTime needs a batchId to key the per-batch clock sidecar")
          java.time.Instant.now()
      }
    }
    val nowSfx = java.time.format.DateTimeFormatter.ofPattern(pattern)
      .withZone(java.time.ZoneId.of(spark.conf.get("spark.sql.session.timeZone", "UTC")))
      .format(execInstant)
    val withSfx = df.withColumn("__sfx",
      coalesce(graft.operators.CdcOps.softPartitionSuffix(col(tsCol), pattern),
        lit("_default")))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val suffixes0 = withSfx.select("__sfx").distinct().collect().map(_.getString(0)).sorted
      // strict reference mode: a NULL/unparseable partition time FAILS the
      // batch (soft_partition.go errors on unparseable times) — the
      // `_default` suffix can only arise from the NULL coalesce above, so
      // its presence IS the NULL-ts signal. Default stays the documented
      // deviation: NULLs route to the compacted `_default` table.
      if (rejectNullTs)
        require(!suffixes0.contains("_default"),
          s"batch contains NULL $tsCol partition timestamps and rejectNullTs is set " +
            "(soft_partition.go fails events whose partition time cannot be derived)")
      val future = suffixes0.filter(s => s != "_default" &&
        graft.operators.CdcOps.softPartitionDistanceSign(s, nowSfx) < 0)
      if (rejectFuture)
        require(future.isEmpty,
          s"partition time(s) ${future.mkString(", ")} for column $tsCol are in the " +
            s"future of execution time $nowSfx (soft_partition.go:29-32 rejects future partitions)")
      val futureSet = future.toSet // non-empty only in stream-survival mode
      val hadoopFs = new org.apache.hadoop.fs.Path(base)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      // suffix -> final target after the compacted-table fallback (and,
      // in stream-survival mode, the future->compacted fold); rows are
      // then appended once per distinct TARGET (two suffixes both
      // falling back to _default must share one append + marker)
      val targetOf: Map[String, String] = suffixes0.map { s =>
        val past = s != "_default" &&
          graft.operators.CdcOps.softPartitionDistanceSign(s, nowSfx) > 0
        val t =
          if (futureSet.contains(s)) base + "_default"
          else if (past && !hadoopFs.exists(new org.apache.hadoop.fs.Path(base + s)))
            base + "_default"
          else base + s
        s -> t
      }.toMap
      val targets = targetOf.values.toSeq.distinct.sorted
      targets.foreach { t =>
        val sfxs = targetOf.collect { case (s, tt) if tt == t => s }.toSeq
        val slice = withSfx.filter(col("__sfx").isin(sfxs.map(x => x: Any): _*)).drop("__sfx")
        batchId match {
          // the replay marker is PER TARGET: one marker for the whole
          // loop would re-append every target on a replayed batch that
          // crashed mid-loop, duplicating the targets written before
          // the crash — per-target markers narrow the duplication window
          // to the single append the plain-append sink already has
          case Some(id) => graft.streaming.CdcPipeline
            .runOncePerBatch(spark, t, id)(appendParquet(slice, t))
          case None => appendParquet(slice, t)
        }
      }
      targets
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
           softPartitionTsCol: String = "ts",
           emitTable: Option[String] = None,
           emitDefaults: Map[String, Any] = Map.empty,
           softPartitionPinClock: Boolean = true): Sink = label match {
    // `emit:<dialect>` — the statement-emitting mode (the reference's real
    // operating shape: stage the batch, emit the warehouse's ordered
    // statement plan — clients/shared/merge.go:28-212). The target path is
    // the emit workspace dir; the destination table name defaults to the
    // path basename (override via emitTable). The `spark`/`merge` labels
    // above still EXECUTE; emit labels stage + record.
    case l if l.startsWith("emit:") =>
      val dialect = l.stripPrefix("emit:")
      require(DdlDialects.registry.contains(dialect),
        s"unknown emit dialect: $dialect (known: ${DdlDialects.registry.keys.toSeq.sorted.mkString(", ")})")
      // construction-time (not per-batch) warning: msm mode drops
      // configured defaults — the reference's MSM merge path has no
      // backfill (multi_step_merge.go:145 TODO)
      if (cfg.msmSteps > 1 && emitDefaults.nonEmpty)
        System.err.println("[graft] emit MSM mode ignores column defaults " +
          s"(no backfill in the reference's MSM path); dropping: ${emitDefaults.keys.mkString(", ")}")
      (df, batchId, target) => {
        val table = emitTable.getOrElse(
          graft.functions.Converters.sanitizeName(target.split('/').last))
        // msmSteps > 1 switches the emit plan to the reference's
        // multi-step merge statement protocol (accumulate msmSteps
        // flushes in the reusable msm staging table, merge once)
        if (cfg.msmSteps > 1)
          EmitSink.emitBatchMsm(df, batchId, cfg, dialect, target, table)
        else
          EmitSink.emitBatch(df, batchId, cfg, dialect, target, table,
            defaults = emitDefaults)
        ()
      }
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
      // per-target replay markers live INSIDE the append loop — see
      // softPartitionedAppend; no outer whole-batch marker.
      // rejectFuture = false: a structured-streaming sink must not wedge
      // on one clock-skewed producer (fail -> replay -> fail forever);
      // future rows fold into the compacted _default table instead
      // (documented deviation in softPartitionedAppend's scaladoc).
      // The routing clock is PINNED per batch by default: streaming is
      // exactly where crash-replays are routine, and an unpinned replay
      // straddling a partition boundary can duplicate future-classified
      // rows across two targets (see softPartitionedAppend's replay
      // caveat) — softPartitionPinClock = false restores wall-clock
      // routing per attempt.
      (df, batchId, target) =>
        { Sinks.softPartitionedAppend(df, target, softPartitionTsCol, Some(batchId),
          rejectFuture = false, pinExecutionTime = softPartitionPinClock); () }
    case other => throw new IllegalArgumentException(
      s"unsupported sink label: $other (expected merge | snapshot | append | history | soft-partitioned | emit:<dialect>)")
  }
}
