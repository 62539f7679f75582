package graft.operators

import graft.Constants
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The engine's core stateful operators, re-expressed as shuffle-partitioned
  * window/join stages (no driver collection, scales with the PK hash
  * partitioning):
  *
  *  - last-wins PK dedup (ref: lib/optimization/table_data.go:169-222)
  *  - TOAST/delete column inheritance (table_data.go:177-208)
  *  - MERGE apply semantics, incl. soft-delete / only-set-delete / TOAST
  *    arms (ref: clients/iceberg/dialect/dialect.go:103-178)
  *  - history-mode projection (models/event/event.go:82-94)
  */
object CdcOps {

  /** Last event per PK wins, ordered by `ord` (Kafka offset analog).
    * One shuffle on the PK columns; row_number+filter stays in a single
    * window stage so it scales linearly with partition count.
    */
  def lastWins(df: DataFrame, pks: Seq[String], ord: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*).orderBy(ord.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Within-buffer TOAST inheritance: a column whose value is the Debezium
    * unavailable-placeholder inherits the most recent real value for the
    * same PK (transitively), matching InsertRow's row-merge
    * (table_data.go:195-208). `NULL` is preserved as a real value; only the
    * sentinel triggers inheritance.
    */
  def toastInherit(df: DataFrame, pks: Seq[String], ordAsc: Seq[Column],
                   toastCols: Seq[String],
                   sentinel: String = Constants.ToastPlaceholder): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*).orderBy(ordAsc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    toastCols.foldLeft(df) { (acc, name) =>
      // struct-wrap so a real NULL value is inheritable (distinguishable
      // from "no prior real row"); only the sentinel triggers inheritance
      val isReal = col(name).isNull || col(name) =!= lit(sentinel)
      val lastReal = last(when(isReal, struct(col(name).as("v"))), ignoreNulls = true).over(w)
      acc.withColumn(name,
        when(col(name) === lit(sentinel) && lastReal.isNotNull, lastReal.getField("v"))
          .otherwise(col(name))) // all-toast prefix keeps the sentinel
    }
  }

  /** Delete-event column inheritance (table_data.go:180-189): Debezium
    * deletes may carry zero/default values when REPLICA IDENTITY is not
    * FULL, so the previous buffered row's value WINS over the delete
    * event's payload for every data column — including real NULLs
    * (struct-wrapped so they are inheritable). Edge deviation: a delete
    * preceded only by deletes keeps its own payload (the reference would
    * chain through the buffered delete).
    */
  def deleteInherit(df: DataFrame, pks: Seq[String], ordAsc: Seq[Column],
                    deleteCol: String, dataCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*).orderBy(ordAsc: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    dataCols.foldLeft(df) { (acc, name) =>
      val lastReal = last(when(!col(deleteCol), struct(col(name).as("v"))), ignoreNulls = true).over(w)
      acc.withColumn(name,
        when(col(deleteCol) && lastReal.isNotNull, lastReal.getField("v"))
          .otherwise(col(name)))
    }
  }

  /** MERGE a deduped change set into a base snapshot. DataFrame-native
    * equivalent of the reference's single MERGE statement
    * (iceberg/dialect.go:103-178):
    *
    *  - matched + delete (and not only-set-delete)  -> drop (hard) / flag (soft)
    *  - matched + only-set-delete                   -> keep target values, set flag
    *  - matched otherwise                           -> source values, except TOAST
    *    sentinel columns keep the target value (lib/sql/columns.go:42-59)
    *  - not matched + not delete                    -> insert
    *
    * `changes` must carry boolean `__artie_delete` (and optionally
    * `__artie_only_set_delete`). Both sides shuffle once on the PK.
    */
  def mergeApply(base: DataFrame, changes: DataFrame, pks: Seq[String],
                 ord: Seq[Column], softDelete: Boolean = false,
                 toastCols: Seq[String] = Nil): DataFrame = {
    val del = Constants.DeleteCol
    val osd = Constants.OnlySetDeleteCol
    val hasOsd = changes.columns.contains(osd)
    val latest0 = lastWins(changes, pks, ord)
    val latest = if (hasOsd) latest0 else latest0.withColumn(osd, lit(false))

    // explicit presence markers: PK columns can legitimately be null under
    // the null-safe <=> join, so pk.isNotNull cannot detect match arms
    val t = base.withColumn("__t_present", lit(true)).alias("t")
    val s = latest.withColumn("__s_present", lit(true)).alias("s")
    val joinCond = pks.map(k => col(s"t.$k") <=> col(s"s.$k")).reduce(_ && _)
    val joined = t.join(s, joinCond, "full_outer")

    val sPresent = coalesce(col("s.__s_present"), lit(false))
    val tPresent = coalesce(col("t.__t_present"), lit(false))
    val matched = sPresent && tPresent
    val sOnly = !tPresent
    val onlySet = coalesce(col(s"s.$osd"), lit(false))
    // schema evolution (D2/D4): the union of both sides' data columns.
    // A column only in the changes = ADD COLUMN (base rows backfill null);
    // a column only in the base = batch doesn't carry it (target value
    // kept, like the reference's destination-merged schema). The ordering
    // columns are transport metadata, not data — they only evolve into the
    // target if the base already carries them.
    // plain col("x") stringifies to its name; complex ord expressions just
    // never match a column name, which is the safe default
    val ordNames = ord.map(_.toString).toSet
    val baseData = base.columns.filterNot(c => pks.contains(c) || c == del || c == osd)
    val newData = latest.columns.filterNot(c =>
      pks.contains(c) || c == del || c == osd || c == "__s_present" ||
        baseData.contains(c) || ordNames.contains(c))
    val dataCols = baseData ++ newData
    val sHas = latest.columns.toSet
    val tHas = base.columns.toSet
    val sTypes = latest.schema.fields.map(f => f.name -> f.dataType).toMap

    val pkOut = pks.map(k => coalesce(col(s"t.$k"), col(s"s.$k")).as(k))
    val valueOut = dataCols.toSeq.map { cname =>
      val sv = if (sHas(cname)) col(s"s.$cname")
               else lit(null).cast(base.schema(cname).dataType)
      val tv = if (tHas(cname)) col(s"t.$cname")
               else lit(null).cast(sTypes(cname))
      val fromSource =
        if (!sHas(cname)) tv // column absent from this batch: keep target
        else if (toastCols.contains(cname)) {
          // reference MERGE arm (iceberg/dialect.go:56-59): CAST AS STRING
          // NOT LIKE '%sentinel%' — works for arrays/structs serialized
          // with the sentinel inside, and a staged NULL keeps the target
          val isNotToast = sv.cast(StringType).contains(Constants.ToastPlaceholder) === false
          when(coalesce(isNotToast, lit(false)), sv).otherwise(tv)
        } else sv
      when(sOnly, sv)
        .when(matched && onlySet, tv)
        .when(matched, fromSource)
        .otherwise(tv)
        .as(cname)
    }
    // an untouched base row must keep its existing tombstone (soft-delete
    // pipelines carry the flag in the snapshot); only rows the batch
    // touches take the staged flag
    val tDel =
      if (base.columns.contains(del)) coalesce(col(s"t.$del"), lit(false)) else lit(false)
    val deleted = when(sPresent, coalesce(col(s"s.$del"), lit(false))).otherwise(tDel)

    val projected = joined.select(pkOut ++ valueOut :+ deleted.as(del): _*)
    if (softDelete) projected
    else projected.filter(!col(del)).drop(del)
  }

  /** Snapshot diff — the read-side inverse of [[mergeApply]]: classify
    * every PK as insert / update / delete between two snapshots of the
    * same table (CDC bootstrap / backfill reconciliation; the reference
    * only ever sees the change stream, so recovering one from snapshots
    * is how a user onboards a table that predates the pipeline).
    *
    * One full-outer shuffle join on the PK; change detection is a
    * row-local null-safe comparison over `compareCols`. Unchanged rows
    * are dropped inside the operator, so the output is bounded by the
    * churn, not the table — at 100 TB the join is the unavoidable cost
    * and everything downstream sees only the delta.
    */
  def snapshotDiff(oldSnap: DataFrame, newSnap: DataFrame, pks: Seq[String],
                   compareCols: Seq[String]): DataFrame = {
    require(pks.nonEmpty && compareCols.nonEmpty,
      "snapshotDiff needs at least one PK and one compare column")
    val o = oldSnap.withColumn("__o_present", lit(true)).alias("o")
    val n = newSnap.withColumn("__n_present", lit(true)).alias("n")
    val cond = pks.map(k => col(s"o.$k") <=> col(s"n.$k")).reduce(_ && _)
    val oPresent = coalesce(col("o.__o_present"), lit(false))
    val nPresent = coalesce(col("n.__n_present"), lit(false))
    val changed = compareCols.map(c => !(col(s"o.$c") <=> col(s"n.$c"))).reduce(_ || _)
    val changeType = when(!oPresent, lit("insert"))
      .when(!nPresent, lit("delete"))
      .when(changed, lit("update")) // matched + unchanged -> NULL, filtered
    val pkOut = pks.map(k => coalesce(col(s"o.$k"), col(s"n.$k")).as(k))
    val valOut = compareCols.flatMap(c =>
      Seq(col(s"o.$c").as(s"old_$c"), col(s"n.$c").as(s"new_$c")))
    o.join(n, cond, "full_outer")
      .select((pkOut :+ changeType.as("change_type")) ++ valOut: _*)
      .filter(col("change_type").isNotNull)
  }

  /** History-mode projection (P9): append-only audit stream with the
    * operation column, delete markers dropped.
    */
  def historyProjection(df: DataFrame, opCol: Column): DataFrame =
    df.withColumn(Constants.OperationCol, opCol)
      .drop(Constants.DeleteCol, Constants.OnlySetDeleteCol)

  /** P12: raw soft-partition suffix from a timestamp column, e.g.
    * `_2024_01` (lib/kafkalib/topic.go:105-124 `Layout`/`Suffix`; the
    * monthly/daily/hourly layouts map to `_yyyy_MM` / `_yyyy_MM_dd` /
    * `_yyyy_MM_dd_HH`). NULL in, NULL out — routing policy (future
    * rejection, compacted fallback, NULL handling) lives in the sink
    * ([[graft.sink.Sinks.softPartitionedAppend]]), mirroring the
    * reference's split between `Suffix` and `BuildSoftPartitionSuffix`.
    */
  def softPartitionSuffix(ts: Column, pattern: String = "_yyyy_MM"): Column =
    date_format(ts, pattern)

  /** Sign of the reference's partition distance
    * (topic.go:126-143 `PartitionDistance`): positive = `ts` in a PAST
    * partition of `now`, 0 = same partition, negative = future. All
    * three reference layouts are zero-padded most-significant-first, so
    * comparing formatted suffixes lexicographically IS the chronological
    * comparison — no per-frequency arithmetic needed (only the sign is
    * ever consumed: soft_partition.go:29-43).
    */
  def softPartitionDistanceSign(sfx: String, nowSfx: String): Int =
    nowSfx.compareTo(sfx).sign

  /** P11/T2: byte-budget batch splitter — assigns each row a `__chunk`
    * id such that every chunk's estimated byte total stays within
    * `maxBytes` (+ at most one row's bytes, the same crossing rule as
    * the reference, which appends a row THEN flushes when the buffer
    * reaches the threshold — lib/config/config.go:20's 25 MB default,
    * models/event/event.go's byte accounting). Chunks are contiguous in
    * the `orderCols` total order, so applying them in chunk order
    * replays the stream order.
    *
    * Scale shape: the running byte total is an exclusive prefix sum via
    * [[RangePrefix]] (range partition on the order key + partitioned
    * window + driver-bounded per-partition offsets) — never a global
    * window. A single row larger than `maxBytes` gets a chunk of its
    * own; `byteEstimate` nulls count as zero.
    *
    * PRECONDITION: `orderCols` must TOTALLY order the rows (unique
    * combination per row — the CDC order column is a log offset, unique
    * by construction). With duplicate order keys the tie order inside
    * the running sum is not deterministic across runs, so a replayed
    * batch could cut chunks differently than the crashed attempt — and
    * [[graft.streaming.CdcPipeline.applyBatchByteCapped]]'s
    * skip-applied-chunks resume is only row-exact when chunk assignment
    * replays identically. (Same uniqueness contract, for the same
    * ordered-walk reason, as [[SketchOps.weightedGroupMedian]].)
    */
  def byteCappedChunks(df: DataFrame, orderCols: Seq[Column],
                       byteEstimate: Column, maxBytes: Long): DataFrame = {
    require(maxBytes > 0, s"maxBytes must be positive, got $maxBytes")
    val (parted, offsets, _) = RangePrefix.withOffsets(df, orderCols, byteEstimate)
    val w = Window.partitionBy(col(RangePrefix.PidCol)).orderBy(orderCols: _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val est = coalesce(byteEstimate, lit(0L))
    // pid -> exclusive global offset as a literal map (bounded by the
    // partition count, driver-side)
    val offMap = map(offsets.toSeq.sortBy(_._1)
      .flatMap { case (pid, off) => Seq(lit(pid), lit(off)) }: _*)
    parted
      .withColumn("__pref",
        sum(est).over(w) - est + element_at(offMap, col(RangePrefix.PidCol)))
      .withColumn("__chunk", call_function("div", col("__pref"), lit(maxBytes)))
      .drop(RangePrefix.PidCol, "__pref")
  }

  /** Default per-row byte estimate for [[byteCappedChunks]]: the JSON
    * serialization length of the full row — the same order of magnitude
    * as the reference's in-memory row accounting (event.go), computed
    * inside codegen with no extra pass.
    */
  def approxRowBytes(df: DataFrame): Column =
    length(to_json(struct(df.columns.map(col).toSeq: _*))).cast("long")

  /** P6: standard metadata columns injected at ingest
    * (models/event/event_util.go:217-232).
    */
  def withMetadataColumns(df: DataFrame, op: Column, sourceMeta: Column,
                          fullTableName: String): DataFrame =
    df.withColumn(Constants.OperationCol, op)
      .withColumn(Constants.UpdatedAtCol, current_timestamp())
      .withColumn(Constants.SourceMetadataCol, sourceMeta)
      .withColumn(Constants.FullSourceTableCol, lit(fullTableName))
}
