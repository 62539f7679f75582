package graft

import org.apache.spark.sql.SparkSession

object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the session (JVM/codegen/FS init) without pre-running the
    // measured queries themselves.
    spark.range(1000000L).selectExpr("sum(id)").collect()
    Seq("lineitem", "orders", "customer", "documents", "embeddings")
      .foreach(t => Tables.load(spark, sfDir, t).count())
    // dev-loop filter: SPARK_GRAFT_ONLY=q21,q43 runs a subset (unset = all)
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (name, _) => only.forall(f => f.exists(name.startsWith)) }
    val results = selected.map { case (name, fn) =>
      val t0 = System.nanoTime()
      // noop sink fully materializes every column/row (count() would let
      // Spark prune most of the query away)
      val ok =
        try { fn(spark, sfDir).write.format("noop").mode("overwrite").save(); true }
        catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      // a failed query reports the sentinel -1, never a near-zero duration
      // that would make the benchmark silently look faster
      val elapsed = if (ok) (System.nanoTime() - t0) / 1e9 else -1.0
      // isolation: a query that persists intermediates must not tax the
      // queries after it (operators release their own caches, this is the
      // backstop); cleanup happens outside the timed window
      spark.catalog.clearCache()
      (name, elapsed)
    }
    // 2-decimal (10 ms) per-query precision keeps the one-line JSON inside
    // the ~2.3 KB stdout tail the driver captures — full nanosecond
    // doubles pushed the line past it, and the driver's parse came back
    // null every round. Locale.ROOT: a comma-decimal default locale would
    // emit invalid JSON.
    val qs = results.map { case (k, v) =>
      "\"" + k + "\":" + String.format(java.util.Locale.ROOT, "%.2f", Double.box(v))
    }.mkString("{", ",", "}")
    val failed = results.collect { case (k, v) if v < 0 => s"\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.map(_._2).filter(_ >= 0).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
  }
}
