package graft

import org.apache.spark.sql.SparkSession

/** Session bootstrap: recommended configuration + SQL registration of the
  * engine's custom expressions, so `spark.sql` users get the converter
  * surface (`SELECT debezium_decimal(b, 18, 2) ...`) without touching the
  * Scala API.
  */
object GraftSession {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  /** Register every graft expression as a SQL temp function — both the
    * canonical `graft_*` names and the unprefixed legacy aliases. The
    * name -> builder table lives in [[GraftExtensions]] (single source of
    * truth shared with the `spark.sql.extensions` hook).
    */
  def registerFunctions(spark: SparkSession): Unit = {
    GraftExtensions.register(spark)
    GraftExtensions.registerUnprefixedAliases(spark)
  }
}
