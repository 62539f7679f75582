package graft.sink

import graft.Constants
import graft.operators.CdcOps
import graft.streaming.CdcPipeline
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DataType, StructType}

/** The statement-emitting sink mode: the reference's ACTUAL operating
  * shape — stage the micro-batch as files, reconcile destination DDL,
  * emit the ordered per-dialect statement plan that an external warehouse
  * executes (clients/shared/merge.go:28-212: GetTableConfig →
  * CreateTable/AlterTableAddColumns → LoadDataIntoTable(temp table, gzip
  * TSV) → BuildMergeQueries → ExecContextStatements → drop temp).
  *
  * This engine has no warehouse connection (env-blocked, SURVEY §7.5), so
  * the sink produces the two artifacts that protocol needs and records
  * them durably per batch:
  *
  *  - the STAGED BATCH: last-wins-deduped canonical-string gzip TSV under
  *    `destDir/_staging/batch=<id>/` — the reference's
  *    WriteTemporaryTableFile (temp_table.go:81-127) re-expressed as a
  *    distributed write (a directory of gzip parts instead of one local
  *    file; same delimiter, same NULL placeholder, readable back through
  *    [[graft.sources.Sources.csvStagingView]]);
  *  - the ORDERED PLAN: DDL-reconcile statements + temp-staging-table
  *    CREATE + the dialect's merge statements + the temp DROP, written as
  *    JSON to `destDir/_plans/batch=<id>.json`.
  *
  * Both writes are per-batch OVERWRITES, so a replayed batch after
  * checkpoint recovery rewrites identical artifacts instead of
  * duplicating them — the same idempotence story as the history sink.
  *
  * Destination schema state lives in a sidecar (`destDir/__destschema`)
  * holding the column list the destination is known to have: absent →
  * the plan opens with CREATE TABLE; present with missing columns → the
  * plan opens with one ADD COLUMN per new column (merge.go:55-63's
  * create-vs-alter split), followed by DROP COLUMN for destination
  * columns confirmed absent through the 4 h confidence window (whose
  * clock lives in the `__dropstate` sidecar and never advances off a
  * delete-only batch — table.go:130-162). Added columns carrying a
  * source default also plan the dialect's backfill statements
  * (merge.go:109-144). The sidecar is advanced via temp+rename so a
  * crash never half-writes it; it advances AFTER the plan lands, so a
  * crash between the two replays the ADD COLUMN — destinations treat
  * added-column replays as benign (reference: IsColumnAlreadyExistsErr
  * is swallowed; most dialects emit IF NOT EXISTS).
  *
  * At 100 TB the per-batch cost is one PK-window dedup shuffle plus one
  * file write of the batch — nothing scales with destination size; the
  * driver only touches schemas and statement text.
  */
object EmitSink {
  /** One emitted flush: where the batch was staged, the staging table
    * reference the statements use, and the ordered statement plan
    * (`ddl` reconciles the DESTINATION table; `plan` is staging-create →
    * merge → staging-drop).
    */
  case class EmittedBatch(batchId: Long, stagedPath: String, stagingTable: String,
                          ddl: Seq[String], plan: Seq[String])

  private def fs(df: DataFrame, p: String) =
    new Path(p).getFileSystem(df.sparkSession.sparkContext.hadoopConfiguration)

  /** Parse the `__destschema` sidecar: destination columns as
    * `name	<spark type json>` lines, plus an optional `#plan` header
    * (see [[writeDestSchema]]) carrying the batch that last advanced the
    * schema and the exact DDL/backfill statements it planned. Header
    * lines start `#` so older sidecars (no header) parse unchanged.
    */
  private def parseDestSchema(lines: Seq[String]):
      (Option[Seq[(String, DataType)]], Option[(Long, Seq[String], Seq[String])]) = {
    if (lines.isEmpty) (None, None)
    else {
      val cols = lines.filterNot(_.startsWith("#")).map { line =>
        val Array(n, tj) = line.split("\t", 2)
        n -> DataType.fromJson(tj)
      }
      val planned = lines.find(_.startsWith("#plan\t")).map { h =>
        val parts = h.split("\t", 4)
        (parts(1).toLong, decodeStmts(parts(2)), decodeStmts(parts(3)))
      }
      (Some(cols), planned)
    }
  }

  // statement lists ride the header base64(UTF-8)-per-statement,
  // comma-joined — statement text is arbitrary (tabs, newlines, quotes),
  // base64 sidesteps all sidecar-format escaping
  private def encodeStmts(ss: Seq[String]): String =
    ss.map(s => java.util.Base64.getEncoder.encodeToString(s.getBytes("UTF-8"))).mkString(",")
  private def decodeStmts(s: String): Seq[String] =
    if (s.isEmpty) Nil
    else s.split(",").toSeq.map(b => new String(java.util.Base64.getDecoder.decode(b), "UTF-8"))

  /** Advance the known-destination-schema sidecar. The `#plan` header
    * records WHICH batch planned the schema-changing statements and their
    * exact text: a crash after this write but before the streaming
    * checkpoint commits replays the same batchId, whose recompute against
    * the advanced sidecar finds no diff — without the header the replay
    * would OVERWRITE the per-batch plan file with the DDL and backfills
    * missing, and an external executor that had not yet consumed the
    * original plan would lose them silently (ADVICE r12). [[emitBatch]]
    * re-emits the recorded statements verbatim on that replay.
    */
  private def writeDestSchema(df: DataFrame, sidecar: String,
                              cols: Seq[(String, DataType)], planBatch: Long,
                              ddl: Seq[String], backfills: Seq[String]): Unit = {
    // '#' marks header lines in this sidecar — a column that collides
    // with the marker would silently vanish from the recorded schema on
    // the next read, so reject it loudly here (no wire source emits one)
    val bad = cols.collect { case (n, _) if n.startsWith("#") => n }
    require(bad.isEmpty,
      s"column names may not start with '#' (sidecar header marker): ${bad.mkString(", ")}")
    writeSidecarLines(df, sidecar,
      s"#plan\t$planBatch\t${encodeStmts(ddl)}\t${encodeStmts(backfills)}" +:
        cols.map { case (n, t) => s"$n\t${t.json}" })
  }

  /** Generic line-sidecar read (empty when absent) — shared by the
    * drop-confidence state, whose serialization DropConfidence owns;
    * also used by [[graft.streaming.CdcPipeline.observeColumnDrops]] so
    * drop-window state follows the SNAPSHOT's filesystem (a nio local
    * path would silently strip an hdfs://... scheme and fork the state
    * per driver host).
    */
  private[graft] def readSidecarLines(df: DataFrame, sidecar: String): Seq[String] = {
    val p = new Path(sidecar)
    val f = fs(df, sidecar)
    if (!f.exists(p)) Nil
    else {
      val in = f.open(p)
      try new String(in.readAllBytes(), "UTF-8").split("\n").toSeq.filter(_.nonEmpty)
      finally in.close()
    }
  }

  /** Temp+rename line-sidecar write (a torn sidecar could fabricate
    * schema or drop-clock state). The rename is CHECKED: Hadoop
    * filesystems report most failures by returning false, and the old
    * sidecar is already deleted by then — an unchecked false would
    * silently destroy the recorded state (schema → spurious CREATE
    * TABLE replans; drop clocks → reset windows).
    */
  private[graft] def writeSidecarLines(df: DataFrame, sidecar: String,
                                       lines: Seq[String]): Unit = {
    val f = fs(df, sidecar)
    val tmp = new Path(sidecar + ".tmp")
    val out = f.create(tmp, true)
    out.write(lines.mkString("\n").getBytes("UTF-8"))
    out.close()
    f.delete(new Path(sidecar), false)
    require(f.rename(tmp, new Path(sidecar)),
      s"sidecar rename $tmp -> $sidecar returned false — failing loudly " +
        "instead of losing the recorded state")
    ()
  }

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""

  /** Temp staging-table name (temp_table.go:24-43): `{table}___artie_b{id}_
    * {expiryUnix}` — MySQL drops the table prefix (its 64-char identifier
    * cap, mirrored from the reference's MySQL special case).
    */
  private[graft] def stagingTableName(label: String, targetTable: String, batchId: Long,
                                     now: java.time.Instant): String = {
    val expiry = now.plus(java.time.Duration.ofHours(6)).getEpochSecond
    if (label == "mysql") s"__artie_b${batchId}_$expiry"
    else s"${targetTable}___artie_b${batchId}_$expiry"
  }

  /** Emit one micro-batch: stage + plan (see object doc). Returns None on
    * an empty batch (ShouldSkipUpdate analog). `targetTable` is the
    * destination's fully-qualified name as the dialect expects it.
    *
    * `defaults` carries source-declared column defaults (the wire
    * envelope's `default` field, D7): a column whose ADD COLUMN lands
    * this batch and has a default gets the dialect's backfill statements
    * (`UPDATE … WHERE col IS NULL` + backfilled marker) in the plan,
    * positioned where the reference runs them — after the staging load,
    * before the merge (clients/shared/merge.go:109-144).
    *
    * Destination-only columns enter the 4 h drop-confidence window
    * ([[graft.schema.SchemaEvolution.DropConfidence]], persisted in the
    * `__dropstate` sidecar): a column absent from every batch for the
    * full window — with at least one of those batches carrying non-delete
    * rows (delete events may only ship PKs, table.go:130-141) — emits
    * DROP COLUMN (clients/shared/table.go:130-162,
    * destination_table_config.go:103-129).
    */
  def emitBatch(batch: DataFrame, batchId: Long, cfg: CdcPipeline.Config,
                label: String, destDir: String, targetTable: String,
                now: java.time.Instant = java.time.Instant.now(),
                defaults: Map[String, Any] = Map.empty): Option[EmittedBatch] = {
    import org.apache.spark.sql.functions.{count, lit, max}
    val dialect = DdlDialects(label) // fail fast on unknown labels
    val pks = cfg.effectivePrimaryKeys
    // persisted: the flags aggregation and the dedup+staging write are
    // separate actions — unpersisted, each re-evaluated the transform
    // chain AND re-read the micro-batch source (two full passes per
    // flush); the try/finally releases the block on every exit
    val transformed = CdcPipeline.applyRowTransforms(batch, cfg)
      .drop(Constants.OperationCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    // One pass over the raw buffer for the reference's per-row flags
    // (table_data.go:210-221): any hard-delete row (when the topic is not
    // soft-delete) arms the merge's DELETE arm; any NON-delete row is the
    // "contains other operations" evidence the drop-confidence window
    // needs (delete events may only carry PKs). Doubles as the
    // empty-batch probe (ShouldSkipUpdate).
    val hasDeleteCol = transformed.columns.contains(Constants.DeleteCol)
    // NULL delete flags mean NOT deleted — the same COALESCE(…, false)
    // every merge dialect applies to the marker; without it a NULL-flag
    // upsert batch would count as neither delete nor "other operation"
    // (max skips NULLs) and read as delete-only
    val delFlag = org.apache.spark.sql.functions.coalesce(
      if (hasDeleteCol) col(Constants.DeleteCol).cast("boolean") else lit(false),
      lit(false))
    val flagsRow = transformed
      .agg(count(lit(1)), max(delFlag.cast("int")), max((!delFlag).cast("int"))).head()
    if (flagsRow.getLong(0) == 0L) return None
    val anyDelete = !flagsRow.isNullAt(1) && flagsRow.getInt(1) == 1
    val containsHardDeletes = anyDelete && !cfg.softDelete
    val containsOtherOperations = !flagsRow.isNullAt(2) && flagsRow.getInt(2) == 1
    // the reference dedupes in its in-memory buffer before staging
    // (table_data.go:169-222); warehouse MERGE requires one row per PK
    val deduped = CdcOps.lastWins(transformed, pks, Seq(col(cfg.orderCol)))

    // ---- DDL reconcile (merge.go:43-68: create-or-add, then drop) ----
    val sidecar = s"$destDir/__destschema"
    val dropState = s"$destDir/__dropstate"
    val batchCols: Seq[(String, DataType)] =
      deduped.schema.fields.toSeq.map(f => f.name -> f.dataType)
    val (known, plannedBy) = parseDestSchema(readSidecarLines(deduped, sidecar))
    val added: Seq[(String, DataType)] = known match {
      case None => Nil
      case Some(existing) =>
        val have = existing.map(_._1).toSet
        batchCols.filterNot { case (n, _) => have.contains(n) }
    }
    // confirmed-absent destination columns after the confidence window;
    // artie metadata columns never drop (diff.go:29-82)
    val dropped: Seq[String] = known match {
      case None => Nil
      case Some(existing) =>
        val inBatch = batchCols.map(_._1).toSet
        val absent = existing.map(_._1)
          .filterNot(n => inBatch.contains(n) || n.startsWith("__artie")).toSet
        val before = readSidecarLines(deduped, dropState)
        val dc = graft.schema.SchemaEvolution.DropConfidence.fromLines(before)
        val safe = dc.observe(absent, now, containsOtherOperations)
        // steady-state schemas leave the candidate set untouched batch
        // after batch — skip the 3-FS-op rewrite unless it changed
        if (dc.toLines != before) writeSidecarLines(deduped, dropState, dc.toLines)
        safe
    }
    val ddl: Seq[String] = known match {
      case None =>
        Seq(dialect.createTable(targetTable,
          batchCols.map { case (n, t) => dialect.colDef(n, t, pks.contains(n)) } ++
            dialect.primaryKeyClause(pks),
          temporary = false, now = now))
      case Some(_) =>
        // one ADD COLUMN per new column, like AlterTableAddColumns' loop,
        // then the confirmed drops (merge.go:55-68's order)
        added.map { case (n, t) => dialect.addColumn(targetTable, dialect.colDef(n, t)) } ++
          dropped.map(dialect.dropColumn(targetTable, _))
    }
    val evolved = known match {
      case None => batchCols
      case Some(existing) =>
        existing.filterNot { case (n, _) => dropped.contains(n) } ++ added
    }
    // destination-is-source-of-truth typing (MergeColumnsFromDestination,
    // merge.go:71-73 / table_data.go:317-381): a batch column whose TYPE
    // drifted from the recorded destination keeps the DESTINATION's type
    // in the staging create — the reference never alters destination
    // types on source drift; it loads into destination-typed staging and
    // the warehouse parses the canonical strings. Name-keyed, like the
    // reference's diff.
    val destTypeOf = known.getOrElse(Nil).toMap
    val stagingCols = batchCols.map { case (n, t) => n -> destTypeOf.getOrElse(n, t) }
    // backfills run against the DESTINATION table for columns added this
    // batch that carry a source default (merge.go:109-144); dialects whose
    // strategy is Native/NotImplemented contribute nothing
    val backfills: Seq[String] = added.flatMap { case (n, t) =>
      defaults.get(n).toSeq.flatMap(v =>
        dialect.backfillStatements(targetTable, n, dialect.defaultValueSql(v, t)))
    }
    // crash-replay guard (ADVICE r12): if THIS batchId is the one recorded
    // as having advanced the schema sidecar, its DDL/backfills were
    // consumed into the sidecar before the streaming checkpoint committed
    // — the recompute above finds no diff and the per-batch plan-file
    // overwrite below would silently LOSE the ADD COLUMN / backfill /
    // DROP statements an external executor may not have run yet. Re-emit
    // the recorded statements verbatim instead (benign if already
    // executed: adds are IF-NOT-EXISTS-guarded / column-exists errors are
    // swallowed per the reference, and backfills are `WHERE col IS NULL`).
    val (ddlOut, backfillsOut) = plannedBy match {
      case Some((b, rDdl, rBf)) if b == batchId && ddl.isEmpty && backfills.isEmpty =>
        (rDdl, rBf)
      case _ => (ddl, backfills)
    }

    // ---- stage the batch as canonical gzip TSV (temp_table.go) -------
    val stagedPath = s"$destDir/_staging/batch=$batchId"
    Sinks.canonicalStrings(deduped)
      .write.mode("overwrite")
      .option("sep", "\t")
      .option("nullValue", Constants.NullValuePlaceholder)
      .option("compression", "gzip")
      .option("header", "false")
      .csv(stagedPath)

    // ---- the ordered statement plan ----------------------------------
    val staging = stagingTableName(label, targetTable, batchId, now)
    val cols = deduped.columns.toSeq
    val toast = cfg.toastCols.filter(cols.contains).toSet
    // staging parts are PK-aware and carry the PK clause too — the
    // reference's shared create builder hardcodes both for temp tables
    // (ddl.go:37's shouldCreatePrimaryKey(col, mode, true, …))
    val createStaging = dialect.createTable(staging,
      stagingCols.map { case (n, t) => dialect.colDef(n, t, pks.contains(n)) } ++
        dialect.primaryKeyClause(pks),
      temporary = true, now = now)
    val merge: Seq[String] =
      if (MergeDialects.engineMergeLabels.contains(label))
        // ClickHouse: the table engine IS the merge (ReplacingMergeTree
        // merge-on-read) — the flush is a plain insert of the staged rows
        Seq(s"INSERT INTO $targetTable (${cols.map(dialect.quote).mkString(",")}) " +
          s"SELECT ${cols.map(dialect.quote).mkString(",")} FROM $staging;")
      else
        MergeDialects(label).mergeStatements(targetTable, staging, pks, cols,
          cfg.softDelete, containsHardDeletes = containsHardDeletes, toastCols = toast)
    // reference execution order: staging load → default backfills on the
    // destination → merge → temp drop (merge.go:100-212)
    val plan = ((createStaging +: backfillsOut) ++ merge) :+ dialect.dropTable(staging)

    // ---- record the plan (idempotent per-batch overwrite) ------------
    // temp+rename like the sidecars: the plan is THE artifact an external
    // executor runs — a crash mid-write must not leave a torn (or
    // valid-prefix) statement file
    val planPath = s"$destDir/_plans/batch=$batchId.json"
    writeSidecarLines(deduped, planPath, Seq(
      s"""{"batch":$batchId,"dialect":${jsonStr(label)},""" +
        s""""target":${jsonStr(targetTable)},"staged":${jsonStr(stagedPath)},""" +
        s""""stagingTable":${jsonStr(staging)},""" +
        s""""ddl":[${ddlOut.map(jsonStr).mkString(",")}],""" +
        s""""plan":[${plan.map(jsonStr).mkString(",")}]}"""))

    // advance the known-destination-schema AFTER the plan lands (a crash
    // between the two replays an IF-NOT-EXISTS-guarded ADD COLUMN)
    if (ddl.nonEmpty || known.isEmpty)
      writeDestSchema(deduped, sidecar, evolved, batchId, ddlOut, backfillsOut)
    Some(EmittedBatch(batchId, stagedPath, staging, ddlOut, plan))
    } finally { transformed.unpersist(); () }
  }

  /** The MSM staging-table name (clients/shared/staging_interface.go:21-26,
    * GenerateMSMTableName with no staging-schema prefix): the target's
    * qualifier + `__artie_{table}_msm` — ONE reusable table per target
    * that a whole msm cycle accumulates into.
    */
  private[graft] def msmTableName(targetTable: String): String = {
    val i = targetTable.lastIndexOf('.')
    val (qualifier, base) =
      if (i < 0) ("", targetTable)
      else (targetTable.substring(0, i + 1), targetTable.substring(i + 1))
    s"${qualifier}__artie_${base}_msm"
  }

  /** Multi-step merge in emit mode — the reference's MSM statement
    * protocol (clients/shared/multi_step_merge.go:17-204) as an ordered
    * per-flush plan. A CYCLE is `cfg.msmSteps` NON-EMPTY flushes (the
    * reference counts `FlushCount = msmSteps - 1` merges after the first
    * direct load — same cycle; the position comes from a persisted flush
    * counter in the `__msmflush` sidecar, the IsFirstFlush/IsLastFlush
    * twin, so empty batches never consume a cycle slot and crash-replays
    * re-plan at their original position):
    *
    *  - flush 0 (IsFirstFlush): DROP the msm table (stale-cycle guard,
    *    multi_step_merge.go:38-42), CREATE it (temp form, PK clause),
    *    and the staged batch loads DIRECTLY into it — no per-flush temp
    *    table, no merge (multi_step_merge.go:96-100);
    *  - flushes 1..N-2: per-flush temp staging create → the dialect's
    *    BuildMergeQueryIntoStagingTable two-arm accumulation merge into
    *    the msm table ([[MergeDialects.mergeIntoStaging]]) → temp drop
    *    (multi_step_merge.go:101-108 + merge());
    *  - flush N-1 (IsLastFlush): the same staged merge, THEN the
    *    dialect's full BuildMergeQueries from the msm table into the
    *    target, then the msm table drops (multi_step_merge.go:110-120;
    *    the defer in merge() drops msmTableID after the final merge).
    *
    * Schema evolution applies to BOTH tables per flush (create-or-add,
    * multi_step_merge.go:56-93); the reference's MSM path has no drop
    * flow and no backfills (its own TODOs at multi_step_merge.go:76,145)
    * — mirrored here. Only Snowflake/DuckDB implement the accumulation
    * merge in the reference ([[MergeDialects.msmLabels]]); other labels
    * fail loudly, as there. Deviation (documented): mid-cycle merges
    * UPDATE only the BATCH's columns — the reference updates the
    * accumulated set, nulling columns a shrunken row image no longer
    * carries; restricting to the batch's columns never destroys
    * accumulated state and is otherwise identical on full row images.
    *
    * Crash-replay: both schema sidecars carry the [[writeDestSchema]]
    * `#plan` header, so a replayed flush re-emits the exact DDL its
    * original planning consumed into the sidecars.
    */
  def emitBatchMsm(batch: DataFrame, batchId: Long, cfg: CdcPipeline.Config,
                   label: String, destDir: String, targetTable: String,
                   now: java.time.Instant = java.time.Instant.now()): Option[EmittedBatch] = {
    import org.apache.spark.sql.functions.{count, lit, max}
    require(cfg.msmSteps >= 2,
      s"emitBatchMsm needs msmSteps >= 2 (a 1-step msm IS the plain merge); got ${cfg.msmSteps}")
    require(MergeDialects.msmLabels.contains(label),
      s"multi-step merge is not implemented for dialect $label in the reference " +
        s"(only ${MergeDialects.msmLabels.toSeq.sorted.mkString("/")} implement " +
        "BuildMergeQueryIntoStagingTable)")
    val dialect = DdlDialects(label)
    val pks = cfg.effectivePrimaryKeys
    val transformed = CdcPipeline.applyRowTransforms(batch, cfg)
      .drop(Constants.OperationCol)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
    val hasDeleteCol = transformed.columns.contains(Constants.DeleteCol)
    val delFlag = org.apache.spark.sql.functions.coalesce(
      if (hasDeleteCol) col(Constants.DeleteCol).cast("boolean") else lit(false),
      lit(false))
    val flagsRow = transformed
      .agg(count(lit(1)), max(delFlag.cast("int"))).head()
    // ShouldSkipUpdate analog; the reference notes (multi_step_merge.go:23-27)
    // that a final-flush skip leaves msm data unmerged until the next cycle.
    // An empty batch does NOT consume a cycle position — the flush counter
    // below only advances on planned flushes, like the reference's
    // per-tableData flushCount (an early `batchId % msmSteps` mapping let
    // an empty batch at a cycle's first slot skip the msm DROP+CREATE and
    // strand the whole next cycle on a dropped table).
    if (flagsRow.getLong(0) == 0L) return None
    val containsHardDeletes =
      !flagsRow.isNullAt(1) && flagsRow.getInt(1) == 1 && !cfg.softDelete
    val deduped = CdcOps.lastWins(transformed, pks, Seq(col(cfg.orderCol)))

    val sidecar = s"$destDir/__destschema"
    val msmSidecar = s"$destDir/__msmschema"
    val msmFlushSidecar = s"$destDir/__msmflush"
    val msmTable = msmTableName(targetTable)
    // The cycle position comes from a PERSISTED flush counter
    // (IsFirstFlush/IsLastFlush twin, table_data.go:18-28), replay-safe:
    // the sidecar records `lastBatchId<TAB>flushesAfterIt<TAB>cycleHardDel`;
    // a replay of the recorded batchId re-plans at its ORIGINAL position
    // instead of consuming a new one, and an out-of-order older batchId
    // fails loudly (streaming checkpoints never regress past the last
    // committed batch). The third field is the CYCLE's hard-delete flag
    // (ADVICE r13): the reference's containsHardDeletes is sticky across
    // the whole msm cycle (WipeData never resets it and the final merge
    // reads it, multi_step_merge.go:189) — delete-marked rows accumulated
    // into the msm table by a MID-cycle flush still need the final
    // merge's DELETE arm even when the LAST flush is delete-free. Older
    // two-field sidecars parse with the flag absent (false).
    val (recordedBatch, flushesSoFar, recordedHardDel) =
      readSidecarLines(deduped, msmFlushSidecar).headOption match {
        case Some(line) =>
          val parts = line.split("\t", 3)
          (parts(0).toLong, parts(1).toLong,
            parts.length > 2 && parts(2).toBoolean)
        case None => (-1L, 0L, false)
      }
    require(batchId >= recordedBatch,
      s"emitBatchMsm saw batchId $batchId below the recorded last flush " +
        s"$recordedBatch — msm cycle state cannot move backwards")
    val isReplay = batchId == recordedBatch && flushesSoFar > 0
    val idx = (if (isReplay) (flushesSoFar - 1) % cfg.msmSteps
               else flushesSoFar % cfg.msmSteps).toInt
    val lastFlush = idx == cfg.msmSteps - 1
    // OR this flush into the cycle flag; flush 0 RESETS it (new cycle).
    // On a replay the recorded flag already absorbed this batch when it
    // first planned, so the OR is idempotent.
    val cycleHardDel =
      if (isReplay) recordedHardDel || containsHardDeletes
      else if (idx == 0) containsHardDeletes
      else recordedHardDel || containsHardDeletes
    val batchCols: Seq[(String, DataType)] =
      deduped.schema.fields.toSeq.map(f => f.name -> f.dataType)

    // ---- target-table reconcile: create-or-add ONLY (no drops, no
    // backfills — the reference's msm TODOs) ----
    val (known, plannedBy) = parseDestSchema(readSidecarLines(deduped, sidecar))
    val added = known match {
      case None => Nil
      case Some(existing) =>
        val have = existing.map(_._1).toSet
        batchCols.filterNot { case (n, _) => have.contains(n) }
    }
    val ddl: Seq[String] = known match {
      case None =>
        Seq(dialect.createTable(targetTable,
          batchCols.map { case (n, t) => dialect.colDef(n, t, pks.contains(n)) } ++
            dialect.primaryKeyClause(pks),
          temporary = false, now = now))
      case Some(_) =>
        added.map { case (n, t) => dialect.addColumn(targetTable, dialect.colDef(n, t)) }
    }
    val evolved = known match {
      case None => batchCols
      case Some(existing) => existing ++ added
    }
    val destTypeOf = known.getOrElse(Nil).toMap
    val stagingCols = batchCols.map { case (n, t) => n -> destTypeOf.getOrElse(n, t) }
    val ddlOut = plannedBy match {
      case Some((b, rDdl, _)) if b == batchId && ddl.isEmpty => rDdl
      case _ => ddl
    }

    // ---- msm-table reconcile + the flush's statement plan ----
    val (msmKnown, msmPlannedBy) = parseDestSchema(readSidecarLines(deduped, msmSidecar))
    val cols = deduped.columns.toSeq
    val toast = cfg.toastCols.filter(cols.contains).toSet
    val (plan, stagingRef, msmEvolved, msmDdlOut) =
      if (idx == 0) {
        val create = dialect.createTable(msmTable,
          stagingCols.map { case (n, t) => dialect.colDef(n, t, pks.contains(n)) } ++
            dialect.primaryKeyClause(pks),
          temporary = true, now = now)
        (Seq(dialect.dropTable(msmTable), create), msmTable, stagingCols, Nil)
      } else {
        val msmHave = msmKnown.getOrElse(Nil).map(_._1).toSet
        val msmAdds = stagingCols
          .filterNot { case (n, _) => msmHave.contains(n) }
          .map { case (n, t) => dialect.addColumn(msmTable, dialect.colDef(n, t)) }
        val msmAddsOut = msmPlannedBy match {
          case Some((b, rAdds, _)) if b == batchId && msmAdds.isEmpty => rAdds
          case _ => msmAdds
        }
        val temp = stagingTableName(label, targetTable, batchId, now)
        val createTemp = dialect.createTable(temp,
          stagingCols.map { case (n, t) => dialect.colDef(n, t, pks.contains(n)) } ++
            dialect.primaryKeyClause(pks),
          temporary = true, now = now)
        val accum = MergeDialects.mergeIntoStaging(label, msmTable, temp, pks, cols, toast)
        // the accumulated msm column set: recorded schema + this batch's
        // additions, each column ONCE — a lost/absent __msmschema sidecar
        // degrades to the batch's own columns (an earlier getOrElse-based
        // concat duplicated every column in that path, which the final
        // merge's UPDATE SET would trip on as a duplicate assignment)
        val msmEv = msmKnown.getOrElse(Nil) ++
          stagingCols.filterNot { case (n, _) => msmHave.contains(n) }
        val finalMerge: Seq[String] =
          if (!lastFlush) Nil
          else {
            // the msm table's ACCUMULATED column set drives the final
            // merge (multi_step_merge.go uses tableData's accumulated
            // cols) — a mid-cycle ADD means the msm table is wider than
            // any single flush
            val msmCols = msmEv.map(_._1)
            MergeDialects(label).mergeStatements(targetTable, msmTable, pks, msmCols,
              cfg.softDelete, containsHardDeletes = cycleHardDel,
              toastCols = cfg.toastCols.filter(msmCols.contains).toSet) :+
              dialect.dropTable(msmTable)
          }
        ((msmAddsOut ++ (createTemp +: accum) :+ dialect.dropTable(temp)) ++ finalMerge,
          temp, msmEv, msmAddsOut)
      }

    // ---- stage the batch as canonical gzip TSV (shared with emitBatch) --
    val stagedPath = s"$destDir/_staging/batch=$batchId"
    Sinks.canonicalStrings(deduped)
      .write.mode("overwrite")
      .option("sep", "\t")
      .option("nullValue", Constants.NullValuePlaceholder)
      .option("compression", "gzip")
      .option("header", "false")
      .csv(stagedPath)

    val planPath = s"$destDir/_plans/batch=$batchId.json"
    writeSidecarLines(deduped, planPath, Seq(
      s"""{"batch":$batchId,"dialect":${jsonStr(label)},""" +
        s""""target":${jsonStr(targetTable)},"staged":${jsonStr(stagedPath)},""" +
        s""""stagingTable":${jsonStr(stagingRef)},"msmTable":${jsonStr(msmTable)},""" +
        s""""msmFlush":$idx,"msmSteps":${cfg.msmSteps},""" +
        s""""ddl":[${ddlOut.map(jsonStr).mkString(",")}],""" +
        s""""plan":[${plan.map(jsonStr).mkString(",")}]}"""))

    if (ddl.nonEmpty || known.isEmpty)
      writeDestSchema(deduped, sidecar, evolved, batchId, ddlOut, Nil)
    // the msm sidecar persists ACROSS the cycle boundary (flush 0's
    // DROP+CREATE overwrites it) so a crash-replay of the LAST flush can
    // still regenerate its final-merge text from the accumulated columns
    if (idx == 0 || msmDdlOut.nonEmpty)
      writeDestSchema(deduped, msmSidecar, msmEvolved, batchId, msmDdlOut, Nil)
    // advance the flush counter LAST (after every artifact landed) and
    // never on a replay — the replay re-planned its original position
    if (!isReplay)
      writeSidecarLines(deduped, msmFlushSidecar,
        Seq(s"$batchId\t${flushesSoFar + 1}\t$cycleHardDel"))
    Some(EmittedBatch(batchId, stagedPath, stagingRef, ddlOut, plan))
    } finally { transformed.unpersist(); () }
  }
}
