package graft.sink

import graft.Constants

/** Spark-SQL MERGE / DDL text generation for Iceberg/Delta destinations.
  * Semantics follow the reference's Spark dialect — the one destination
  * where it already emits Spark SQL (clients/iceberg/dialect/dialect.go:
  * 103-228) — re-expressed here as the engine's native sink statement. Used
  * with `foreachBatch { df.createOrReplaceTempView(staging); spark.sql(merge) }`
  * against a MERGE-capable catalog; CdcOps.mergeApply is the frame-level
  * equivalent used when no such catalog is present.
  */
object MergeSqlBuilder {
  private def q(s: String) = s"`$s`"

  /** Toast-aware UPDATE fragment (lib/sql/columns.go:42-59 + the Iceberg
    * is-not-toast form, iceberg/dialect.go:56-59): substring match after a
    * string cast (covers arrays/structs carrying the sentinel); a staged
    * NULL keeps the target's value.
    */
  private def updateFragment(cols: Seq[String], toastCols: Set[String]): String =
    cols.map { c =>
      if (toastCols.contains(c))
        s"${q(c)} = CASE WHEN CAST(stg.${q(c)} AS STRING) NOT LIKE '%${Constants.ToastPlaceholder}%' THEN stg.${q(c)} ELSE tgt.${q(c)} END"
      else s"${q(c)} = stg.${q(c)}"
    }.mkString(", ")

  /** Single MERGE statement with the reference's three arms
    * (dialect.go:163-177 hard; :136-154 soft).
    */
  def buildMerge(target: String, stagingView: String, primaryKeys: Seq[String],
                 cols: Seq[String], softDelete: Boolean,
                 toastCols: Set[String] = Set.empty,
                 additionalPredicates: Seq[String] = Nil): String = {
    val on = (primaryKeys.map(k => s"tgt.${q(k)} = stg.${q(k)}") ++ additionalPredicates)
      .mkString(" AND ")
    val base = s"MERGE INTO $target AS tgt USING $stagingView AS stg ON $on"
    val del = s"stg.${q(Constants.DeleteCol)}"
    val osd = s"stg.${q(Constants.OnlySetDeleteCol)}"
    val dataCols = cols.filterNot(_ == Constants.OnlySetDeleteCol)

    if (softDelete) {
      val insertCols = dataCols.map(q).mkString(",")
      val insertVals = dataCols.map(c => s"stg.${q(c)}").mkString(",")
      s"""$base
WHEN MATCHED AND IFNULL($osd, false) = false THEN UPDATE SET ${updateFragment(dataCols, toastCols)}
WHEN MATCHED AND IFNULL($osd, false) = true THEN UPDATE SET ${q(Constants.DeleteCol)} = $del
WHEN NOT MATCHED THEN INSERT ($insertCols) VALUES ($insertVals)"""
    } else {
      val hardCols = dataCols.filterNot(_ == Constants.DeleteCol)
      val insertCols = hardCols.map(q).mkString(",")
      val insertVals = hardCols.map(c => s"stg.${q(c)}").mkString(",")
      s"""$base
WHEN MATCHED AND $del THEN DELETE
WHEN MATCHED AND IFNULL($del, false) = false THEN UPDATE SET ${updateFragment(hardCols, toastCols)}
WHEN NOT MATCHED AND IFNULL($del, false) = false THEN INSERT ($insertCols) VALUES ($insertVals)"""
    }
  }

  /** Full-table dedupe keeping the LATEST row per PK (order DESC) — the
    * reference's own Spark SQL dedupe (iceberg/dialect.go:61-101). A real
    * staging TABLE (not a view) is required because open-source Spark SQL
    * has no QUALIFY, no SELECT EXCEPT, and cannot drop a column from a
    * temporary view; and INSERT OVERWRITE cannot read the table it
    * overwrites, so the staging table also breaks the self-read cycle.
    * The final INSERT OVERWRITE is atomic — on failure the target keeps
    * its original rows. Caller drops the staging table afterwards.
    */
  def buildDedupe(target: String, stagingTable: String, primaryKeys: Seq[String],
                  orderCols: Seq[String]): Seq[String] = {
    val pkCsv = primaryKeys.map(q).mkString(", ")
    val ordCsv = (primaryKeys ++ orderCols).map(c => s"${q(c)} DESC").mkString(", ")
    val rn = "__artie_rn"
    Seq(
      s"""CREATE OR REPLACE TABLE $stagingTable AS SELECT * FROM (
SELECT *, ROW_NUMBER() OVER (PARTITION BY $pkCsv ORDER BY $ordCsv) AS $rn FROM $target) WHERE $rn = 1""",
      s"ALTER TABLE $stagingTable DROP COLUMN $rn",
      s"INSERT OVERWRITE $target TABLE $stagingTable",
      s"DROP TABLE IF EXISTS $stagingTable",
    )
  }

  /** CREATE TABLE with Iceberg v2 properties (dialect.go:194-204). */
  def buildCreateTable(target: String, colDefs: Seq[(String, String)]): String = {
    val cols = colDefs.map { case (n, t) => s"${q(n)} $t" }.mkString(", ")
    s"CREATE TABLE IF NOT EXISTS $target ($cols) USING iceberg TBLPROPERTIES ('format-version'='2')"
  }

  def buildAddColumns(target: String, colDefs: Seq[(String, String)]): String = {
    val cols = colDefs.map { case (n, t) => s"${q(n)} $t" }.mkString(", ")
    s"ALTER TABLE $target ADD COLUMNS ($cols)"
  }

  def buildDropColumn(target: String, column: String): String =
    s"ALTER TABLE $target DROP COLUMN ${q(column)}"
}
