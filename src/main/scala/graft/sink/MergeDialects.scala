package graft.sink

/** One common face over the ten per-warehouse merge builders — the
  * dialect-dispatch twin of [[SinkRegistry]], mirroring how the
  * reference routes `cfg.Output` to a destination whose dialect builds
  * the statements (lib/destination/utils/load.go:29-66 +
  * clients/＊/dialect). Every dialect exposes the same contract: the
  * ORDERED statement plan that applies one last-wins-deduped staged
  * batch to the target with the standard arm semantics (hard/soft
  * delete, only-set-delete, TOAST keep) — proven equivalent to the
  * frame-level `CdcOps.mergeApply` by RedshiftSqlSpec's replay.
  *
  * `stagingRef` is whatever the dialect's USING/FROM position expects
  * (a view/table name or subquery text); `toastCols` are string-kind
  * toast columns — dialects with a distinct non-string guard expose it
  * on their own builder object (the registry keeps the common core).
  */
trait MergeDialect {
  def name: String
  def mergeStatements(target: String, stagingRef: String, pks: Seq[String],
                      cols: Seq[String], softDelete: Boolean,
                      containsHardDeletes: Boolean = true,
                      toastCols: Set[String] = Set.empty): Seq[String]
}

object MergeDialects {
  private def d(label: String)(
      f: (String, String, Seq[String], Seq[String], Boolean, Boolean, Set[String]) => Seq[String]): MergeDialect =
    new MergeDialect {
      val name = label
      def mergeStatements(target: String, stagingRef: String, pks: Seq[String],
                          cols: Seq[String], softDelete: Boolean,
                          containsHardDeletes: Boolean,
                          toastCols: Set[String]): Seq[String] =
        f(target, stagingRef, pks, cols, softDelete, containsHardDeletes, toastCols)
    }

  /** Label space mirrors the reference's client names. `spark` is the
    * dialect this engine EXECUTES (GraftCatalog); the rest generate
    * wire-compatible text for their warehouses.
    */
  val registry: Map[String, MergeDialect] = Seq(
    d("spark") { (t, s, pks, cols, soft, _, toast) =>
      Seq(MergeSqlBuilder.buildMerge(t, s, pks, cols, soft, toast))
    },
    d("redshift") { (t, s, pks, cols, soft, hard, toast) =>
      RedshiftSqlBuilder.buildMergeQueries(t, s, pks, cols, soft, hard, toast)
    },
    d("snowflake") { (t, s, pks, cols, soft, _, toast) =>
      Seq(SnowflakeSqlBuilder.buildMerge(t, s, pks, cols, soft, toastCols = toast))
    },
    d("bigquery") { (t, s, pks, cols, soft, _, toast) =>
      Seq(BigQuerySqlBuilder.buildMerge(t, s, pks, cols, soft, toastCols = toast))
    },
    d("mssql") { (t, s, pks, cols, soft, _, toast) =>
      MssqlSqlBuilder.buildMergeQueries(t, s, pks, cols, soft, toast)
    },
    d("mysql") { (t, s, pks, cols, soft, _, toast) =>
      MysqlSqlBuilder.buildMergeQueries(t, s, pks, cols, soft, toast)
    },
    d("postgres") { (t, s, pks, cols, soft, hard, toast) =>
      PostgresSqlBuilder.buildMergeQueries(t, s, pks, cols, soft, hard,
        useMerge = true, toastCols = toast)
    },
    d("duckdb") { (t, s, pks, cols, soft, _, toast) =>
      Seq(DuckDbSqlBuilder.buildMerge(t, s, pks, cols, soft, toastCols = toast))
    },
    d("databricks") { (t, s, pks, cols, soft, _, toast) =>
      Seq(DatabricksSqlBuilder.buildMerge(t, s, pks, cols, soft, toastCols = toast))
    },
  ).map(x => x.name -> x).toMap

  /** Labels whose merge semantics live OUTSIDE DML (table-engine
    * merge-on-read): dispatching a merge statement to these is a caller
    * error the registry surfaces by absence — ClickHouse's path is
    * [[ClickhouseSqlBuilder.buildCreateTable]].
    */
  val engineMergeLabels: Set[String] = Set("clickhouse")

  def apply(label: String): MergeDialect =
    registry.getOrElse(label, throw new IllegalArgumentException(
      s"unknown merge dialect: $label (known: ${registry.keys.toSeq.sorted.mkString(", ")}" +
        s"; ${engineMergeLabels.mkString(", ")} merge via table engine — see ClickhouseSqlBuilder)"))

  /** Labels whose reference dialect implements
    * BuildMergeQueryIntoStagingTable (lib/sql/dialect.go:46) — the
    * accumulation merge multi-step merge folds each staged flush into
    * the msm staging table with. Snowflake and DuckDB only; every other
    * client returns `not implemented`, so MSM is unusable there in the
    * reference too.
    */
  val msmLabels: Set[String] = Set("snowflake", "duckdb")

  /** BuildMergeQueryIntoStagingTable dispatch: the two-arm keep-all-cols
    * accumulation merge (temp staging → msm table). Fails with the
    * reference's own contract — `not implemented` — for every dialect
    * outside [[msmLabels]].
    */
  def mergeIntoStaging(label: String, target: String, stagingRef: String,
                       pks: Seq[String], cols: Seq[String],
                       toastCols: Set[String] = Set.empty): Seq[String] = label match {
    case "snowflake" =>
      Seq(SnowflakeSqlBuilder.buildMergeIntoStaging(target, stagingRef, pks, cols,
        toastCols = toastCols))
    case "duckdb" =>
      Seq(DuckDbSqlBuilder.buildMergeIntoStaging(target, stagingRef, pks, cols,
        toastCols = toastCols))
    case other => throw new IllegalArgumentException(
      s"BuildMergeQueryIntoStagingTable is not implemented for dialect $other " +
        s"(the reference implements it only for ${msmLabels.toSeq.sorted.mkString("/")} — " +
        "multi-step merge requires one of those)")
  }
}
