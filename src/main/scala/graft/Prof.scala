package graft

import org.apache.spark.sql.SparkSession

/** Scratch profiling main (not part of the library surface). */
object Prof {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000L).selectExpr("sum(id)").collect()
    def time(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime()
      f
      println(f"[prof] $name%-44s ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    val docs = Tables.documents(spark, sfDir)
    docs.write.format("noop").mode("overwrite").save()
    for (q <- Seq("q21_dedup_jaccard", "q21_dedup_jaccard", "q22_dedup_minhash_lsh")) {
      time(q) {
        SparkEntry.queries(q)(spark, sfDir).write.format("noop").mode("overwrite").save()
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
