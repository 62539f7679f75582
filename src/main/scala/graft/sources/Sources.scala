package graft.sources

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Batch sources (SURVEY §2.1 S6/S7). */
object Sources {
  /** S6: staging scan — gzip TSV (or any CSV dialect) registered as a
    * named relation for MERGE, matching the reference's
    * `CREATE OR REPLACE TEMPORARY VIEW ... USING csv`
    * (clients/iceberg/dialect/dialect.go:216-223). In the streaming path
    * this hop disappears: the micro-batch DataFrame *is* the staging
    * relation.
    */
  def csvStagingView(spark: SparkSession, viewName: String, path: String,
                     schema: StructType, sep: String = "\t",
                     nullValue: String = graft.Constants.NullValuePlaceholder): DataFrame = {
    val df = spark.read
      .schema(schema)
      .option("sep", sep)
      .option("nullValue", nullValue)
      .option("header", "false")
      .csv(path)
    df.createOrReplaceTempView(viewName)
    df
  }

  def parquetTable(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def jsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema).json(path)
}

/** S7: destination schema lookup with TTL cache (24 h in the reference —
  * lib/destination/types/destination_table_config.go:13-31,
  * constants.go:29-31). Driver-side only; thread-safe.
  */
class TableConfigCache(spark: SparkSession,
                       ttlSeconds: Long = 24 * 3600,
                       clock: () => Instant = () => Instant.now(),
                       fetcher: Option[String => StructType] = None) {
  private case class Entry(schema: StructType, fetchedAt: Instant)
  private val cache = scala.collection.concurrent.TrieMap.empty[String, Entry]

  /** Schema of a catalog table / parquet path, cached for the TTL. */
  def schemaOf(tableOrPath: String): StructType = {
    val now = clock()
    cache.get(tableOrPath) match {
      case Some(e) if e.fetchedAt.plusSeconds(ttlSeconds).isAfter(now) => e.schema
      case _ =>
        val schema = fetch(tableOrPath)
        cache.put(tableOrPath, Entry(schema, now))
        schema
    }
  }

  protected def fetch(tableOrPath: String): StructType = fetcher match {
    case Some(f) => f(tableOrPath)
    case None =>
      if (tableOrPath.contains("/")) spark.read.parquet(tableOrPath).schema
      else spark.table(tableOrPath).schema
  }

  /** Flush after DDL (the reference wipes on ALTER, table.go:77-128). */
  def invalidate(tableOrPath: String): Unit = cache.remove(tableOrPath)
  def size: Int = cache.size
}
