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

/** Redshift dialect: the reference's ordered UPDATE → INSERT → DELETE
  * statement plan for destinations without a native MERGE
  * (clients/redshift/dialect/dialect.go:271-375). The statement TEXT is
  * the spec (as with the Spark dialect above); the ORDER is load-bearing
  * — update first, then insert, then delete, "to avoid no-ops where rows
  * get inserted and then immediately updated" (dialect.go:369-370) — and
  * RedshiftSqlSpec proves the ordered plan's semantics equal the
  * single-statement MERGE by replaying both at the frame level.
  *
  * Dialect details mirrored exactly: identifiers double-quoted and
  * LOWERCASED (dialect.go:19-22), `stg`/`tgt` aliases
  * (constants.go:150-151), the insert's NOT-MATCHED probe via
  * `LEFT JOIN … WHERE tgt."pk1" IS NULL` on the FIRST primary key only
  * (dialect.go:277-279 — the ON clause already covers all PKs), the
  * delete as a PK-tuple IN-subquery (dialect.go:333-343), and the
  * scalar toast guard `COALESCE(col NOT LIKE '%…%', TRUE)`
  * (dialect.go:50-68; the JSON_SIZE struct/array form is Redshift-server
  * specific and out of scope — struct toast columns here take the
  * scalar form after their string cast, matching how this engine
  * canonicalizes nested values at sinks).
  */
object RedshiftSqlBuilder {
  private def q(s: String) = "\"" + s.replace("\"", "").toLowerCase + "\""
  private def stg(c: String) = s"stg.${q(c)}"
  private def tgt(c: String) = s"tgt.${q(c)}"
  private def pkEquality(pks: Seq[String]): String =
    pks.map(k => s"${tgt(k)} = ${stg(k)}").mkString(" AND ")

  /** lib/sql/columns.go:42-59 — note the reference's exact spacing: a
    * toast column renders as `"col"= CASE WHEN …` (space after `=`).
    */
  private def updateFragment(cols: Seq[String], toastCols: Set[String]): String =
    cols.map { c =>
      if (toastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(${stg(c)} NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN ${stg(c)} ELSE ${tgt(c)} END"
      else s"${q(c)}=${stg(c)}"
    }.mkString(",")

  private def updateQueries(target: String, subQuery: String, pks: Seq[String],
                            cols: Seq[String], softDelete: Boolean,
                            toastCols: Set[String]): Seq[String] = {
    val del = stg(Constants.DeleteCol)
    val osd = stg(Constants.OnlySetDeleteCol)
    if (!softDelete)
      Seq(s"""UPDATE $target AS tgt SET ${updateFragment(cols, toastCols)} FROM $subQuery AS stg WHERE ${pkEquality(pks)} AND COALESCE($del, false) = false;""")
    else Seq(
      // two updates: full-row where only-set-delete is false, delete-flag-only where true
      s"""UPDATE $target AS tgt SET ${updateFragment(cols, toastCols)} FROM $subQuery AS stg WHERE ${pkEquality(pks)} AND COALESCE($osd, false) = false;""",
      s"""UPDATE $target AS tgt SET ${q(Constants.DeleteCol)}=${stg(Constants.DeleteCol)} FROM $subQuery AS stg WHERE ${pkEquality(pks)} AND COALESCE($osd, false) = true;""")
  }

  private def insertQuery(target: String, subQuery: String, pks: Seq[String],
                          cols: Seq[String], softDelete: Boolean): String = {
    val where = s"${tgt(pks.head)} IS NULL" +
      (if (softDelete) "" else s" AND COALESCE(${stg(Constants.DeleteCol)}, false) = false")
    s"""INSERT INTO $target (${cols.map(q).mkString(",")}) SELECT ${cols.map(stg).mkString(",")} FROM $subQuery AS stg LEFT JOIN $target AS tgt ON ${pkEquality(pks)} WHERE $where;"""
  }

  private def deleteQuery(target: String, subQuery: String, pks: Seq[String]): String =
    s"""DELETE FROM $target WHERE (${pks.map(q).mkString(",")}) IN (SELECT ${pks.map(stg).mkString(",")} FROM $subQuery AS stg WHERE ${stg(Constants.DeleteCol)} = true);"""

  /** The full ordered plan (dialect.go:344-375): update(s), insert, and —
    * hard-delete mode with deletes present in the batch — the delete.
    * `cols` arrives WITH the artie markers, as the pipeline's schema
    * carries them; marker removal follows the reference
    * (columns.go RemoveOnlySetDeleteColumnMarker always,
    * RemoveDeleteColumnMarker when hard-deleting).
    */
  def buildMergeQueries(target: String, subQuery: String, pks: Seq[String],
                        cols: Seq[String], softDelete: Boolean,
                        containsHardDeletes: Boolean,
                        toastCols: Set[String] = Set.empty): Seq[String] = {
    val noOsd = cols.filterNot(_ == Constants.OnlySetDeleteCol)
    val kept = if (softDelete) noOsd else noOsd.filterNot(_ == Constants.DeleteCol)
    updateQueries(target, subQuery, pks, kept, softDelete, toastCols) ++
      Seq(insertQuery(target, subQuery, pks, kept, softDelete)) ++
      (if (!softDelete && containsHardDeletes)
        Seq(deleteQuery(target, subQuery, pks))
      else Nil)
  }
}

/** Snowflake dialect: the reference's single-statement MERGE with the
  * staging side inlined as a subquery
  * (clients/snowflake/dialect/dialect.go:145-207). Differences from the
  * Spark dialect that ARE the dialect: identifiers double-quoted and
  * UPPERCASED (dialect.go:35-37 — Snowflake folds unquoted identifiers
  * up, so quoting uppercase preserves wire compatibility), `USING ( sub )
  * AS stg` instead of a registered view, an optional EQUAL_NULL
  * null-safe ON clause (dialect.go:51-53, the engine's `<=>` analog),
  * and a TO_VARCHAR cast in the toast guard for non-string columns
  * (dialect.go:70-80). Arm semantics are identical to
  * [[MergeSqlBuilder.buildMerge]] — that is the point: one semantic
  * contract, per-warehouse text.
  */
object SnowflakeSqlBuilder {
  private def q(s: String) = "\"" + s.replace("\"", "").toUpperCase + "\""
  private def stg(c: String) = s"stg.${q(c)}"
  private def tgt(c: String) = s"tgt.${q(c)}"

  /** Toast guard (dialect.go:70-80): strings compare directly, everything
    * else serializes through TO_VARCHAR first.
    */
  private def isNotToast(c: String, stringKind: Boolean): String =
    if (stringKind)
      s"COALESCE(${stg(c)} NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE)"
    else
      s"COALESCE(TO_VARCHAR(${stg(c)}) NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE)"

  private def updateFragment(cols: Seq[String], toastCols: Set[String],
                             varcharCastToastCols: Set[String]): String =
    cols.map { c =>
      if (toastCols.contains(c) || varcharCastToastCols.contains(c))
        s"${q(c)}= CASE WHEN ${isNotToast(c, stringKind = !varcharCastToastCols.contains(c))} THEN ${stg(c)} ELSE ${tgt(c)} END"
      else s"${q(c)}=${stg(c)}"
    }.mkString(",")

  /** One MERGE statement (dialect.go:162-206). `useEqualNull` switches
    * the ON clause to EQUAL_NULL per PK — the reference threads the same
    * flag. `toastCols` are string-kind toast columns;
    * `varcharCastToastCols` are non-string toast columns (struct/array),
    * which take the TO_VARCHAR guard.
    */
  def buildMerge(target: String, subQuery: String, pks: Seq[String],
                 cols: Seq[String], softDelete: Boolean,
                 useEqualNull: Boolean = false,
                 toastCols: Set[String] = Set.empty,
                 varcharCastToastCols: Set[String] = Set.empty,
                 additionalPredicates: Seq[String] = Nil): String = {
    val eq = pks.map { k =>
      if (useEqualNull) s"EQUAL_NULL(${tgt(k)}, ${stg(k)})"
      else s"${tgt(k)} = ${stg(k)}"
    } ++ additionalPredicates
    val base = s"\nMERGE INTO $target tgt USING ( $subQuery ) AS stg ON ${eq.mkString(" AND ")}"
    val del = stg(Constants.DeleteCol)
    val osd = stg(Constants.OnlySetDeleteCol)
    val noOsd = cols.filterNot(_ == Constants.OnlySetDeleteCol)
    if (softDelete) {
      val frag = updateFragment(noOsd, toastCols, varcharCastToastCols)
      s"""$base
WHEN MATCHED AND IFNULL($osd, false) = false THEN UPDATE SET $frag
WHEN MATCHED AND IFNULL($osd, false) = true THEN UPDATE SET ${q(Constants.DeleteCol)}=$del
WHEN NOT MATCHED THEN INSERT (${noOsd.map(q).mkString(",")}) VALUES (${noOsd.map(stg).mkString(",")});"""
    } else {
      val kept = noOsd.filterNot(_ == Constants.DeleteCol)
      val frag = updateFragment(kept, toastCols, varcharCastToastCols)
      s"""$base
WHEN MATCHED AND $del THEN DELETE
WHEN MATCHED AND IFNULL($del, false) = false THEN UPDATE SET $frag
WHEN NOT MATCHED AND IFNULL($del, false) = false THEN INSERT (${kept.map(q).mkString(",")}) VALUES (${kept.map(stg).mkString(",")});"""
    }
  }

  /** BuildMergeQueryIntoStagingTable twin (dialect.go:119-143): the
    * TWO-ARM accumulation merge multi-step merge uses to fold one staged
    * flush into the reusable msm staging table. Unlike [[buildMerge]] it
    * keeps EVERY column — the `__artie_delete`/`__artie_only_set_delete`
    * markers accumulate in the msm table so the FINAL merge can apply
    * delete semantics once — and has no delete arm (a delete event must
    * not vanish mid-cycle; it must reach the target merge as a marked
    * row). Toast guards still apply (the reference's golden pins the
    * CASE form on a toasted column). Snowflake and DuckDB are the only
    * dialects whose reference implements this; the rest error
    * "not implemented" (mirrored in [[MergeDialects.mergeIntoStaging]]).
    */
  def buildMergeIntoStaging(target: String, subQuery: String, pks: Seq[String],
                            cols: Seq[String], useEqualNull: Boolean = false,
                            toastCols: Set[String] = Set.empty,
                            varcharCastToastCols: Set[String] = Set.empty): String = {
    val eq = pks.map { k =>
      if (useEqualNull) s"EQUAL_NULL(${tgt(k)}, ${stg(k)})"
      else s"${tgt(k)} = ${stg(k)}"
    }
    s"""
MERGE INTO $target tgt USING ( $subQuery ) AS stg ON ${eq.mkString(" AND ")}
WHEN MATCHED THEN UPDATE SET ${updateFragment(cols, toastCols, varcharCastToastCols)}
WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(",")}) VALUES (${cols.map(stg).mkString(",")});"""
  }
}

/** MS SQL dialect (clients/mssql/dialect/dialect.go:73-209). What IS the
  * dialect: square-bracket identifier quoting (dialect.go:21-28),
  * booleans as BITs so every flag test is `= 1` / `COALESCE(x, 0) = 0`
  * arithmetic rather than bare boolean predicates, the hard path as one
  * MERGE whose NOT-MATCHED arm uses the reference's `COALESCE(del, 1) =
  * 0` (default-1: a NULL delete flag on an unmatched row is NOT
  * inserted — the opposite default from every other dialect's insert
  * arm, preserved verbatim), the soft path as THREE statements in
  * INSERT → UPDATE(all) → UPDATE(flag) order (dialect.go:102-118 —
  * insert FIRST, unlike Redshift's update-first plan), and the
  * empty-string-COALESCE toast guard (dialect.go:59-63).
  */
object MssqlSqlBuilder {
  private def q(s: String) = "[" + s.replace("[", "").replace("]", "") + "]"
  private def stg(c: String) = s"stg.${q(c)}"
  private def tgt(c: String) = s"tgt.${q(c)}"
  private def joinOn(pks: Seq[String]): String =
    pks.map(k => s"${tgt(k)} = ${stg(k)}").mkString(" AND ")

  private def updateFragment(cols: Seq[String], toastCols: Set[String]): String =
    cols.map { c =>
      if (toastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(${stg(c)}, '') NOT LIKE '%${Constants.ToastPlaceholder}%' THEN ${stg(c)} ELSE ${tgt(c)} END"
      else s"${q(c)}=${stg(c)}"
    }.mkString(",")

  /** Hard path: one MERGE (dialect.go:180-209); soft path: the
    * three-statement INSERT → UPDATE(all) → UPDATE(flag) plan
    * (dialect.go:102-177).
    */
  def buildMergeQueries(target: String, subQuery: String, pks: Seq[String],
                        cols: Seq[String], softDelete: Boolean,
                        toastCols: Set[String] = Set.empty): Seq[String] = {
    val noOsd = cols.filterNot(_ == Constants.OnlySetDeleteCol)
    val del = stg(Constants.DeleteCol)
    val osd = stg(Constants.OnlySetDeleteCol)
    if (softDelete) {
      val insert = s"""
INSERT INTO $target (${noOsd.map(q).mkString(",")})
SELECT ${noOsd.map(stg).mkString(",")} FROM $subQuery AS stg
LEFT JOIN $target AS tgt ON ${joinOn(pks)}
WHERE ${tgt(pks.head)} IS NULL;"""
      val updAll = s"""
UPDATE tgt SET ${updateFragment(noOsd, toastCols)}
FROM $subQuery AS stg LEFT JOIN $target AS tgt ON ${joinOn(pks)}
WHERE COALESCE($osd, 0) = 0;"""
      val updFlag = s"""
UPDATE tgt SET ${q(Constants.DeleteCol)}=$del
FROM $subQuery AS stg LEFT JOIN $target AS tgt ON ${joinOn(pks)}
WHERE COALESCE($osd, 0) = 1;"""
      Seq(insert, updAll, updFlag)
    } else {
      val kept = noOsd.filterNot(_ == Constants.DeleteCol)
      Seq(s"""
MERGE INTO $target tgt
USING $subQuery AS stg ON ${joinOn(pks)}
WHEN MATCHED AND $del = 1 THEN DELETE
WHEN MATCHED AND COALESCE($del, 0) = 0 THEN UPDATE SET ${updateFragment(kept, toastCols)}
WHEN NOT MATCHED AND COALESCE($del, 1) = 0 THEN INSERT (${kept.map(q).mkString(",")}) VALUES (${kept.map(stg).mkString(",")});""")
    }
  }
}

/** Databricks dialect (clients/databricks/dialect/dialect.go:86-146) —
  * the same single-MERGE arm structure as Snowflake with three textual
  * differences that ARE the dialect: backtick quoting (backticks
  * stripped), the staging side referenced as `USING sub stg` with NO
  * `AS` keyword (dialect.go:103), and a `CAST(col AS STRING)` toast
  * guard for non-string columns (dialect.go:41-49).
  */
object DatabricksSqlBuilder {
  private def q(s: String) = "`" + s.replace("`", "") + "`"
  private def stg(c: String) = s"stg.${q(c)}"
  private def tgt(c: String) = s"tgt.${q(c)}"

  private def updateFragment(cols: Seq[String], toastCols: Set[String],
                             castToastCols: Set[String]): String =
    cols.map { c =>
      if (castToastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(CAST(${stg(c)} AS STRING) NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN ${stg(c)} ELSE ${tgt(c)} END"
      else if (toastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(${stg(c)} NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN ${stg(c)} ELSE ${tgt(c)} END"
      else s"${q(c)}=${stg(c)}"
    }.mkString(",")

  def buildMerge(target: String, subQuery: String, pks: Seq[String],
                 cols: Seq[String], softDelete: Boolean,
                 toastCols: Set[String] = Set.empty,
                 castToastCols: Set[String] = Set.empty,
                 additionalPredicates: Seq[String] = Nil): String = {
    val on = (pks.map(k => s"${tgt(k)} = ${stg(k)}") ++ additionalPredicates)
      .mkString(" AND ")
    val base = s"MERGE INTO $target tgt USING $subQuery stg ON $on"
    val del = stg(Constants.DeleteCol)
    val osd = stg(Constants.OnlySetDeleteCol)
    val noOsd = cols.filterNot(_ == Constants.OnlySetDeleteCol)
    if (softDelete)
      s"""$base
WHEN MATCHED AND IFNULL($osd, false) = false THEN UPDATE SET ${updateFragment(noOsd, toastCols, castToastCols)}
WHEN MATCHED AND IFNULL($osd, false) = true THEN UPDATE SET ${q(Constants.DeleteCol)}=$del
WHEN NOT MATCHED THEN INSERT (${noOsd.map(q).mkString(",")}) VALUES (${noOsd.map(stg).mkString(",")});"""
    else {
      val kept = noOsd.filterNot(_ == Constants.DeleteCol)
      s"""$base
WHEN MATCHED AND $del THEN DELETE
WHEN MATCHED AND IFNULL($del, false) = false THEN UPDATE SET ${updateFragment(kept, toastCols, castToastCols)}
WHEN NOT MATCHED AND IFNULL($del, false) = false THEN INSERT (${kept.map(q).mkString(",")}) VALUES (${kept.map(stg).mkString(",")});"""
    }
  }
}

/** DuckDB/MotherDuck dialect (clients/motherduck/dialect/dialect.go:
  * 277-380) — Postgres-shaped MERGE with DuckDB's quirks: the staging
  * reference AUTO-WRAPS as `USING (SELECT * FROM sub) AS stg` when the
  * caller passes a bare table name (DuckDB rejects bare table refs in
  * USING — dialect.go:283-287), double-quote identifier doubling, CAST
  * AS VARCHAR toast guard for struct/array columns, no trailing
  * semicolon.
  */
object DuckDbSqlBuilder {
  private def q(s: String) = "\"" + s.replace("\"", "\"\"") + "\""
  private def stg(c: String) = s"stg.${q(c)}"
  private def tgt(c: String) = s"tgt.${q(c)}"

  // The reference decides subquery-vs-table by substring Contains("SELECT")
  // (motherduck/dialect.go:283-287), which mis-classifies a TABLE named
  // e.g. `selected_rows` and renders invalid `USING (selected_rows)`.
  // Since this registry's contract explicitly allows bare table names as
  // stagingRef, the check here is tightened to a trimmed PREFIX match on
  // SELECT/WITH — every subquery the pipeline ever passes starts with one
  // of those, and table names can't.
  private def source(subQuery: String): String = {
    val t = subQuery.trim.toUpperCase
    if (t.startsWith("SELECT") || t.startsWith("WITH")) subQuery
    else s"SELECT * FROM $subQuery"
  }

  private def updateFragment(cols: Seq[String], toastCols: Set[String],
                             varcharCastToastCols: Set[String]): String =
    cols.map { c =>
      if (varcharCastToastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(CAST(${stg(c)} AS VARCHAR) NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN ${stg(c)} ELSE ${tgt(c)} END"
      else if (toastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(${stg(c)} NOT LIKE '%${Constants.ToastPlaceholder}%', TRUE) THEN ${stg(c)} ELSE ${tgt(c)} END"
      else s"${q(c)}=${stg(c)}"
    }.mkString(",")

  def buildMerge(target: String, subQuery: String, pks: Seq[String],
                 cols: Seq[String], softDelete: Boolean,
                 toastCols: Set[String] = Set.empty,
                 varcharCastToastCols: Set[String] = Set.empty,
                 additionalPredicates: Seq[String] = Nil): String = {
    val on = (pks.map(k => s"${tgt(k)} = ${stg(k)}") ++ additionalPredicates)
      .mkString(" AND ")
    val del = stg(Constants.DeleteCol)
    val osd = stg(Constants.OnlySetDeleteCol)
    val noOsd = cols.filterNot(_ == Constants.OnlySetDeleteCol)
    if (softDelete)
      s"""
MERGE INTO $target AS tgt
USING (${source(subQuery)}) AS stg ON $on
WHEN MATCHED AND COALESCE($osd, false) = false THEN UPDATE SET ${updateFragment(noOsd, toastCols, varcharCastToastCols)}
WHEN MATCHED AND COALESCE($osd, false) = true THEN UPDATE SET ${q(Constants.DeleteCol)}=$del
WHEN NOT MATCHED THEN INSERT (${noOsd.map(q).mkString(",")}) VALUES (${noOsd.map(stg).mkString(",")})"""
    else {
      val kept = noOsd.filterNot(_ == Constants.DeleteCol)
      s"""
MERGE INTO $target AS tgt USING (${source(subQuery)}) AS stg ON $on
WHEN MATCHED AND $del = true THEN DELETE
WHEN MATCHED AND COALESCE($del, false) = false THEN UPDATE SET ${updateFragment(kept, toastCols, varcharCastToastCols)}
WHEN NOT MATCHED AND COALESCE($del, false) = false THEN INSERT (${kept.map(q).mkString(",")}) VALUES (${kept.map(stg).mkString(",")})"""
    }
  }

  /** BuildMergeQueryIntoStagingTable twin (motherduck/dialect.go:245-276):
    * DuckDB's msm accumulation merge — two arms, every column kept
    * (markers accumulate for the final merge), no delete arm, same
    * SELECT-prefix auto-wrap as [[buildMerge]], no trailing semicolon
    * and no leading newline (both pinned by the reference's golden).
    */
  def buildMergeIntoStaging(target: String, subQuery: String, pks: Seq[String],
                            cols: Seq[String],
                            toastCols: Set[String] = Set.empty,
                            varcharCastToastCols: Set[String] = Set.empty): String = {
    val on = pks.map(k => s"${tgt(k)} = ${stg(k)}").mkString(" AND ")
    s"""MERGE INTO $target AS tgt USING (${source(subQuery)}) AS stg ON $on
WHEN MATCHED THEN UPDATE SET ${updateFragment(cols, toastCols, varcharCastToastCols)}
WHEN NOT MATCHED THEN INSERT (${cols.map(q).mkString(",")}) VALUES (${cols.map(stg).mkString(",")})"""
  }
}

/** ClickHouse dialect (clients/clickhouse/dialect/dialect.go) — the
  * destination where the MERGE strategy lives in the TABLE ENGINE, not
  * in DML: replication tables are `ENGINE = ReplacingMergeTree(
  * __artie_updated_at, __artie_delete)` (merge-on-read last-wins keyed
  * dedup with an is_deleted column — dialect.go:91-105; the reference's
  * BuildMergeQueries intentionally panics because background merges do
  * the work), history tables are plain `MergeTree() ORDER BY
  * __artie_updated_at`. The delete marker is filtered from the caller's
  * column list and re-added as UInt8 (ReplacingMergeTree requires that
  * exact type), mirroring dialect.go's column surgery. Backtick
  * quoting, backticks stripped.
  */
object ClickhouseSqlBuilder {
  private def q(s: String) = "`" + s.replace("`", "") + "`"

  /** `colDefs` are (name, clickhouse type) pairs; `replication = false`
    * builds the history-mode MergeTree form.
    */
  def buildCreateTable(target: String, colDefs: Seq[(String, String)],
                       replication: Boolean = true): String =
    if (replication) {
      val kept = colDefs.filterNot(_._1 == Constants.DeleteCol) :+
        (Constants.DeleteCol -> "UInt8")
      val cols = kept.map { case (n, t) => s"${q(n)} $t" }.mkString(",")
      s"CREATE TABLE $target ($cols) ENGINE = ReplacingMergeTree(${q(Constants.UpdatedAtCol)}, ${q(Constants.DeleteCol)});"
    } else {
      val cols = colDefs.map { case (n, t) => s"${q(n)} $t" }.mkString(",")
      s"CREATE TABLE $target ($cols) ENGINE = MergeTree() ORDER BY ${q(Constants.UpdatedAtCol)};"
    }

  def buildAddColumn(target: String, colDef: String): String =
    s"ALTER TABLE $target ADD COLUMN IF NOT EXISTS $colDef;"

  def buildDropColumn(target: String, colName: String): String =
    s"ALTER TABLE $target DROP COLUMN IF EXISTS ${q(colName)};"
}

/** Postgres dialect (clients/postgres/dialect/dialect.go:127-330) —
  * TWO strategies behind one entry point, mirroring the reference's
  * `disableMerge` switch: PG15+ native MERGE (single statement, no
  * trailing semicolon — the reference's text ends bare, merge_test.go
  * pins it), or the pre-15 ordered UPDATE → INSERT → DELETE fallback
  * (`DELETE FROM t AS tgt USING sub AS stg WHERE …` — Postgres'
  * join-delete form, unlike Redshift's PK-tuple IN). Double-quote
  * identifier quoting with quote DOUBLING (dialect.go:42-44); toast
  * guards serialize bytea through `encode(col, 'escape')` and
  * everything else through `::text`, both empty-string-COALESCEd
  * (dialect.go:94-106).
  */
object PostgresSqlBuilder {
  private def q(s: String) = "\"" + s.replace("\"", "\"\"") + "\""
  private def stg(c: String) = s"stg.${q(c)}"
  private def tgt(c: String) = s"tgt.${q(c)}"
  private def joinOn(pks: Seq[String], additional: Seq[String]): String =
    (pks.map(k => s"${tgt(k)} = ${stg(k)}") ++ additional).mkString(" AND ")

  private def updateFragment(cols: Seq[String], toastCols: Set[String],
                             byteaToastCols: Set[String]): String =
    cols.map { c =>
      if (byteaToastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(encode(${stg(c)}, 'escape'), '') NOT LIKE '%${Constants.ToastPlaceholder}%' THEN ${stg(c)} ELSE ${tgt(c)} END"
      else if (toastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(${stg(c)}::text, '') NOT LIKE '%${Constants.ToastPlaceholder}%' THEN ${stg(c)} ELSE ${tgt(c)} END"
      else s"${q(c)}=${stg(c)}"
    }.mkString(",")

  /** `useMerge = true` → the PG15+ single MERGE; false → the pre-15
    * ordered statement plan (dialect.go:234-263).
    */
  def buildMergeQueries(target: String, subQuery: String, pks: Seq[String],
                        cols: Seq[String], softDelete: Boolean,
                        containsHardDeletes: Boolean = true,
                        useMerge: Boolean = true,
                        toastCols: Set[String] = Set.empty,
                        byteaToastCols: Set[String] = Set.empty,
                        additionalPredicates: Seq[String] = Nil): Seq[String] = {
    val noOsd = cols.filterNot(_ == Constants.OnlySetDeleteCol)
    val del = stg(Constants.DeleteCol)
    val osd = stg(Constants.OnlySetDeleteCol)
    val on = joinOn(pks, additionalPredicates)
    if (useMerge) {
      if (softDelete) Seq(s"""
MERGE INTO $target AS tgt
USING $subQuery AS stg ON $on
WHEN MATCHED AND COALESCE($osd, false) = false THEN UPDATE SET ${updateFragment(noOsd, toastCols, byteaToastCols)}
WHEN MATCHED AND COALESCE($osd, false) = true THEN UPDATE SET ${q(Constants.DeleteCol)}=$del
WHEN NOT MATCHED THEN INSERT (${noOsd.map(q).mkString(",")}) VALUES (${noOsd.map(stg).mkString(",")})""")
      else {
        val kept = noOsd.filterNot(_ == Constants.DeleteCol)
        Seq(s"""
MERGE INTO $target AS tgt USING $subQuery AS stg ON $on
WHEN MATCHED AND $del = true THEN DELETE
WHEN MATCHED AND COALESCE($del, false) = false THEN UPDATE SET ${updateFragment(kept, toastCols, byteaToastCols)}
WHEN NOT MATCHED AND COALESCE($del, false) = false THEN INSERT (${kept.map(q).mkString(",")}) VALUES (${kept.map(stg).mkString(",")})""")
      }
    } else {
      val kept = if (softDelete) noOsd else noOsd.filterNot(_ == Constants.DeleteCol)
      val insertWhere = s"${tgt(pks.head)} IS NULL" +
        (if (softDelete) "" else s" AND COALESCE($del, false) = false")
      val insert =
        s"""INSERT INTO $target (${kept.map(q).mkString(",")}) SELECT ${kept.map(stg).mkString(",")} FROM $subQuery AS stg LEFT JOIN $target AS tgt ON $on WHERE $insertWhere;"""
      val updates =
        if (!softDelete)
          Seq(s"""UPDATE $target AS tgt SET ${updateFragment(kept, toastCols, byteaToastCols)} FROM $subQuery AS stg WHERE $on AND COALESCE($del, false) = false;""")
        else Seq(
          s"""UPDATE $target AS tgt SET ${updateFragment(kept, toastCols, byteaToastCols)} FROM $subQuery AS stg WHERE $on AND COALESCE($osd, false) = false;""",
          s"""UPDATE $target AS tgt SET ${q(Constants.DeleteCol)}=$del FROM $subQuery AS stg WHERE $on AND COALESCE($osd, false) = true;""")
      updates ++ Seq(insert) ++
        (if (!softDelete && containsHardDeletes)
          Seq(s"""DELETE FROM $target AS tgt USING $subQuery AS stg WHERE $on AND $del = true;""")
        else Nil)
    }
  }
}

/** MySQL dialect (clients/mysql/dialect/dialect.go:57-217) — the
  * destination with NO MERGE statement at all: the hard path is the
  * reference's two-statement protocol DELETE-via-INNER-JOIN then
  * `INSERT … ON DUPLICATE KEY UPDATE col = VALUES(col)` (the engine's
  * native upsert, dialect.go:170-216); the soft path is the MSSQL-style
  * INSERT → UPDATE(all) → UPDATE(flag) triple with MySQL's
  * `UPDATE t INNER JOIN s SET …` join-update syntax
  * (dialect.go:102-168). Backtick quoting with backtick DOUBLING (not
  * stripping — dialect.go:21-23), BIT-flag arithmetic, empty-string
  * toast COALESCE.
  */
object MysqlSqlBuilder {
  private def q(s: String) = "`" + s.replace("`", "``") + "`"
  private def stg(c: String) = s"stg.${q(c)}"
  private def tgt(c: String) = s"tgt.${q(c)}"
  private def joinOn(pks: Seq[String]): String =
    pks.map(k => s"${tgt(k)} = ${stg(k)}").mkString(" AND ")

  private def updateFragment(cols: Seq[String], toastCols: Set[String]): String =
    cols.map { c =>
      if (toastCols.contains(c))
        s"${q(c)}= CASE WHEN COALESCE(${stg(c)}, '') NOT LIKE '%${Constants.ToastPlaceholder}%' THEN ${stg(c)} ELSE ${tgt(c)} END"
      else s"${q(c)}=${stg(c)}"
    }.mkString(",")

  def buildMergeQueries(target: String, subQuery: String, pks: Seq[String],
                        cols: Seq[String], softDelete: Boolean,
                        toastCols: Set[String] = Set.empty): Seq[String] = {
    val noOsd = cols.filterNot(_ == Constants.OnlySetDeleteCol)
    val del = stg(Constants.DeleteCol)
    val osd = stg(Constants.OnlySetDeleteCol)
    if (softDelete) Seq(
      s"""
INSERT INTO $target (${noOsd.map(q).mkString(",")})
SELECT ${noOsd.map(stg).mkString(",")} FROM $subQuery AS stg
LEFT JOIN $target AS tgt ON ${joinOn(pks)}
WHERE ${tgt(pks.head)} IS NULL;""",
      s"""
UPDATE $target AS tgt
INNER JOIN $subQuery AS stg ON ${joinOn(pks)}
SET ${updateFragment(noOsd, toastCols)}
WHERE COALESCE($osd, 0) = 0;""",
      s"""
UPDATE $target AS tgt
INNER JOIN $subQuery AS stg ON ${joinOn(pks)}
SET ${q(Constants.DeleteCol)}=$del
WHERE COALESCE($osd, 0) = 1;""")
    else {
      val kept = noOsd.filterNot(_ == Constants.DeleteCol)
      val dupUpdate = kept.map(c => s"${q(c)} = VALUES(${q(c)})").mkString(", ")
      Seq(
        s"""
DELETE tgt FROM $target AS tgt
INNER JOIN $subQuery AS stg ON ${joinOn(pks)}
WHERE $del = 1;""",
        s"""
INSERT INTO $target (${kept.map(q).mkString(",")})
SELECT ${kept.map(stg).mkString(",")} FROM $subQuery AS stg
WHERE COALESCE($del, 0) = 0
ON DUPLICATE KEY UPDATE $dupUpdate;""")
    }
  }
}

/** BigQuery dialect: single-statement MERGE
  * (clients/bigquery/dialect/dialect.go:103-182). What IS the dialect:
  * backtick identifier quoting with no case folding (dialect.go:30-33),
  * `USING sub AS stg` with no parentheses, JSON primary keys compared
  * through TO_JSON_STRING on BOTH sides (dialect.go:117-122 — BigQuery
  * cannot equality-compare two JSON values directly), and a toast guard
  * that serializes through TO_JSON_STRING with NO COALESCE wrapper
  * (dialect.go:56-59 — TO_JSON_STRING never returns SQL NULL for a JSON
  * column, so the null-protection the other dialects need is absent by
  * design). Arm structure identical to [[SnowflakeSqlBuilder]].
  */
object BigQuerySqlBuilder {
  private def q(s: String) = "`" + s.replace("`", "") + "`"
  private def stg(c: String) = s"stg.${q(c)}"
  private def tgt(c: String) = s"tgt.${q(c)}"

  private def updateFragment(cols: Seq[String], toastCols: Set[String]): String =
    cols.map { c =>
      if (toastCols.contains(c))
        s"${q(c)}= CASE WHEN TO_JSON_STRING(${stg(c)}) NOT LIKE '%${Constants.ToastPlaceholder}%' THEN ${stg(c)} ELSE ${tgt(c)} END"
      else s"${q(c)}=${stg(c)}"
    }.mkString(",")

  /** One MERGE statement (dialect.go:130-182). `jsonPks` marks primary
    * keys of JSON kind, which compare via TO_JSON_STRING on both sides.
    */
  def buildMerge(target: String, subQuery: String, pks: Seq[String],
                 cols: Seq[String], softDelete: Boolean,
                 jsonPks: Set[String] = Set.empty,
                 toastCols: Set[String] = Set.empty,
                 additionalPredicates: Seq[String] = Nil): String = {
    val eq = pks.map { k =>
      if (jsonPks.contains(k))
        s"TO_JSON_STRING(${tgt(k)}) = TO_JSON_STRING(${stg(k)})"
      else s"${tgt(k)} = ${stg(k)}"
    } ++ additionalPredicates
    val base = s"\nMERGE INTO $target tgt USING $subQuery AS stg ON ${eq.mkString(" AND ")}"
    val del = stg(Constants.DeleteCol)
    val osd = stg(Constants.OnlySetDeleteCol)
    val noOsd = cols.filterNot(_ == Constants.OnlySetDeleteCol)
    if (softDelete) {
      val frag = updateFragment(noOsd, toastCols)
      s"""$base
WHEN MATCHED AND IFNULL($osd, false) = false THEN UPDATE SET $frag
WHEN MATCHED AND IFNULL($osd, false) = true THEN UPDATE SET ${q(Constants.DeleteCol)}=$del
WHEN NOT MATCHED THEN INSERT (${noOsd.map(q).mkString(",")}) VALUES (${noOsd.map(stg).mkString(",")});"""
    } else {
      val kept = noOsd.filterNot(_ == Constants.DeleteCol)
      val frag = updateFragment(kept, toastCols)
      s"""$base
WHEN MATCHED AND $del THEN DELETE
WHEN MATCHED AND IFNULL($del, false) = false THEN UPDATE SET $frag
WHEN NOT MATCHED AND IFNULL($del, false) = false THEN INSERT (${kept.map(q).mkString(",")}) VALUES (${kept.map(stg).mkString(",")});"""
    }
  }
}
