package graft.operators

import graft.Constants
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Maintenance operators (SURVEY §2.8): full-table dedupe (D5), temp-name
  * TTL sweep (D6), default-value backfill (D7).
  */
object MaintenanceOps {
  /** D5: remove full duplicates keeping the LATEST row per PK by the order
    * columns (DESC, matching the reference's dedupe ordering) — the
    * frame-level twin of MergeSqlBuilder.buildDedupe
    * (clients/iceberg/dialect/dialect.go:61-101).
    */
  def dedupeTable(df: DataFrame, pks: Seq[String], orderCols: Seq[String]): DataFrame = {
    val w = Window.partitionBy(pks.map(col): _*)
      .orderBy((pks ++ orderCols).map(c => col(c).desc): _*)
    df.withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1).drop("__rn")
  }

  private val TempTableSuffix = "__artie"
  /** Temp-object TTL is 6 h in the reference (constants.go:39). */
  val DefaultTtlSeconds: Long = 6 * 3600

  /** D6: TTL-encoded staging name `base__artie_<salt>_<expiryUnix>`
    * (clients/shared/temp_table.go:20-43 — the reference's middle segment
    * is a RANDOM suffix). The salt here is caller-supplied and defaults
    * to a CONSTANT: uniqueness against concurrent builds of the same
    * base (two pipelines, a retry racing its zombie predecessor in the
    * same epoch second) is the caller's job — pass a distinct salt
    * (batch id, UUID) wherever two builders could overlap; the default
    * suits the common one-writer-per-table case and keeps tests
    * deterministic.
    */
  def tempName(base: String, nowEpochS: Long, ttlSeconds: Long = DefaultTtlSeconds,
               salt: String = "stg"): String =
    s"$base${TempTableSuffix}_${salt}_${nowEpochS + ttlSeconds}"

  /** D6: should a staging object be swept? (expiry encoded in the name,
    * lib/destination/ddl/expiry.go:12).
    */
  def shouldSweep(name: String, nowEpochS: Long): Boolean = {
    // greedy .+ so salts containing underscores still leave the trailing
    // expiry segment matchable
    val m = s".*${TempTableSuffix}_.+_(\\d{9,12})$$".r
    name match {
      case m(expiry) => expiry.toLong < nowEpochS
      case _ => false
    }
  }

  /** D7: backfill columns that are NULL with their source-declared default
    * (clients/shared/default_value.go + merge.go:109-144). Frame-level
    * twin of `UPDATE t SET c = default WHERE c IS NULL`.
    */
  def backfillDefaults(df: DataFrame, defaults: Map[String, Column]): DataFrame =
    defaults.foldLeft(df) { case (acc, (name, default)) =>
      if (acc.columns.contains(name))
        acc.withColumn(name, coalesce(col(name), default))
      else acc.withColumn(name, default)
    }

  /** Incremental aggregate-view maintenance: fold a delta's partial
    * aggregates into a materialized state table of the same shape
    * (keys + additive measure columns). Because every measure is
    * additive (counts, decimal-exact sums), union + re-aggregate is
    * EXACTLY equal to recomputing from scratch — the property the q123
    * oracle checks by recomputing from scratch. Cost is sized by
    * |state| + |delta| (the already-aggregated relations), never by the
    * fact table; one shuffle on the keys.
    */
  def mergeAggState(state: DataFrame, delta: DataFrame, keys: Seq[String],
                    sumCols: Seq[String]): DataFrame = {
    require(keys.nonEmpty && sumCols.nonEmpty,
      "mergeAggState needs at least one key and one additive measure")
    state.unionByName(delta)
      .groupBy(keys.map(col): _*)
      .agg(sum(col(sumCols.head)).as(sumCols.head),
        sumCols.tail.map(n => sum(col(n)).as(n)): _*)
  }

  /** Column profile for destination-table / corpus QA: null counts and
    * canonical-string min/max per column, computed in ONE map-side-
    * combinable aggregation pass over the table (never one job per
    * column), then unpivoted row-per-column. The profile is the drift/
    * sanity check a merge pipeline runs against its snapshot — cheap at
    * any scale because the shuffle carries 4 values per column total.
    */
  def profileColumns(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "profileColumns needs at least one column")
    // backtick-quote every reference so a column name containing '.' is
    // profiled instead of parsed as nested-field access
    def q(name: String) = col("`" + name.replace("`", "``") + "`")
    // float min/max render via a fixed-scale decimal: raw double-to-string
    // flips to scientific notation at 1e7 on the JVM (and spells NaN/Inf
    // differently) where other engines print plain digits — decimal text
    // is the one float format engines agree on. Non-finite values and
    // magnitudes past DECIMAL(30,6)'s 1e24 range get explicit sentinels:
    // a silent NULL (non-ANSI cast) would make a column full of Infinity
    // artifacts — exactly what a profiler exists to catch — look all-null.
    def canonical(c: Column, name: String): Column = df.schema(name).dataType match {
      case org.apache.spark.sql.types.DoubleType | org.apache.spark.sql.types.FloatType =>
        when(isnan(c), lit("NaN"))
          .when(c === Double.PositiveInfinity, lit("Infinity"))
          .when(c === Double.NegativeInfinity, lit("-Infinity"))
          .when(abs(c) >= 1e24, lit("__overflow"))
          .otherwise(c.cast(org.apache.spark.sql.types.DecimalType(30, 6)).cast("string"))
      case _ => c.cast("string")
    }
    val aggs = count(lit(1)).as("__rows") +: cols.flatMap(c => Seq(
      count(q(c)).as(s"__n_$c"),
      canonical(min(q(c)), c).as(s"__min_$c"),
      canonical(max(q(c)), c).as(s"__max_$c")))
    val row = df.agg(aggs.head, aggs.tail: _*)
    val structs = cols.map(c => struct(
      lit(c).as("col_name"),
      (q("__rows") - q(s"__n_$c")).as("n_null"),
      q(s"__n_$c").as("n_nonnull"),
      q(s"__min_$c").as("min_str"),
      q(s"__max_$c").as("max_str")))
    row.select(explode(array(structs: _*)).as("p")).select(col("p.*"))
  }

  /** Small-file compaction plan (the OPTIMIZE/rewrite-data-files planner
    * every lakehouse table needs): files are laid size-descending into
    * quota bins of ~`targetBytes` by exclusive cumulative size — bin =
    * (cumsum − bytes) div target — so every bin lands within one file of
    * the target and the assignment is a pure function of the listing
    * (re-planning after a crash yields the identical plan). Output one
    * row per bin: (bin, n_files, sum_bytes, first_file, last_file).
    *
    * Scale shape: the global cumulative sum comes from [[RangePrefix]]
    * (range partition on (bytes desc, id) + per-partition offsets) —
    * NEVER an unpartitioned window, because "file listing" at lakehouse
    * scale is itself millions of rows. One pid-partitioned window + one
    * bin aggregation; the plan is bins-sized.
    */
  def compactionPlan(files: DataFrame, idCol: String, bytesCol: String,
                     targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"need targetBytes > 0, got $targetBytes")
    val (sorted, offsets, _) = RangePrefix.withOffsets(
      files.select(col(idCol).as("fid"), col(bytesCol).cast("long").as("bytes")),
      Seq(col("bytes").desc, col("fid")), col("bytes"))
    val spark = sorted.sparkSession
    import spark.implicits._
    val offDf = broadcast(offsets.toSeq.toDF(RangePrefix.PidCol, "__off"))
    val wPid = org.apache.spark.sql.expressions.Window
      .partitionBy(col(RangePrefix.PidCol)).orderBy(col("bytes").desc, col("fid"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    sorted.join(offDf, Seq(RangePrefix.PidCol))
      .withColumn("__cx", col("__off") + sum(col("bytes")).over(wPid) - col("bytes"))
      .withColumn("bin", call_function("div", col("__cx"), lit(targetBytes)))
      .groupBy(col("bin"))
      .agg(count(lit(1)).as("n_files"), sum(col("bytes")).as("sum_bytes"),
        min(col("fid")).as("first_file"), max(col("fid")).as("last_file"))
  }

  /** Incremental maintenance of a materialized equi-JOIN view — the join
    * half of IVM next to [[mergeAggState]]'s aggregate half: with
    * insert-only deltas ΔA / ΔB arriving against old snapshots A / B,
    * the new view is exactly
    *   J ∪ (ΔA ⋈ B) ∪ (A ⋈ ΔB) ∪ (ΔA ⋈ ΔB)
    * — the standard delta-join identity, so the stored view J is NEVER
    * recomputed; only delta-sized joins run. Deletions/updates need a
    * keyed MERGE on the view instead (the [[graft.catalog.GraftCatalog]]
    * path); this operator is the append-only fast path a fact-stream
    * pipeline takes every micro-batch.
    *
    * Scale shape: each delta term joins a delta-sized side against a
    * snapshot on the join key — broadcast the delta when it fits
    * (micro-batches do), hash-join otherwise; the view contributes zero
    * IO beyond the final union. The spec pins maintained ≡ full
    * recompute, and q248's oracle re-proves it through an aggregate
    * over the maintained view.
    */
  def maintainJoin(oldView: DataFrame, aOld: DataFrame, aDelta: DataFrame,
                   bOld: DataFrame, bDelta: DataFrame,
                   aKey: String, bKey: String): DataFrame = {
    def j(l: DataFrame, r: DataFrame) = l.join(r, col(aKey) === col(bKey))
    oldView
      .unionByName(j(aDelta, bOld))
      .unionByName(j(aOld, bDelta))
      .unionByName(j(aDelta, bDelta))
  }

  /** Merge-assertion (clients/shared/merge.go:194-209): the merged frame
    * must account for at least the buffered row count (rows can only be
    * net-added or replaced, never silently lost).
    */
  def assertMergeCovered(mergedCount: Long, baseCount: Long, deletedCount: Long,
                         insertedCount: Long): Unit = {
    val expectedMin = baseCount - deletedCount
    require(mergedCount >= expectedMin,
      s"merge assertion failed: merged=$mergedCount < base=$baseCount - deletes=$deletedCount")
    require(mergedCount <= baseCount + insertedCount,
      s"merge assertion failed: merged=$mergedCount > base=$baseCount + inserts=$insertedCount")
  }
}
