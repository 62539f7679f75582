package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dumps `.explain("formatted")` for named queries into files — the
  * before/after plan evidence for optimization rounds.
  *
  * Run: `sbt "runMain graft.ExplainDump <outDir> <suffix> q21,q116,..."`
  * Writes `<outDir>/<qNN>_<suffix>.txt` per query (full query name in the
  * header). Uses the same session shape as Bench (local[$SPARK_GRAFT_CPUS],
  * shuffle.partitions = cpus, AQE on) so plans match what the bench runs.
  */
object ExplainDump {
  def main(args: Array[String]): Unit = {
    require(args.length == 3, "usage: ExplainDump <outDir> <suffix> <qNN,qNN,...|all>")
    val Array(outDir, suffix, qlist) = args
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val wanted = qlist.split(",").map(_.trim).filter(_.nonEmpty).toSet
    // exact qNN token match: a startsWith prefix over-selected (asking for
    // q21 also dumped q210-q219)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1).filter { case (name, _) =>
      qlist == "all" || wanted.contains(name.split("_")(0))
    }
    Files.createDirectories(Paths.get(outDir))
    selected.foreach { case (name, fn) =>
      val q = name.split("_")(0)
      try {
        val df = fn(spark, sfDir)
        val plan = df.queryExecution.explainString(
          org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        val body = s"== $name (sf dir: $sfDir, cpus: $cpus) ==\n\n" + plan
        Files.write(Paths.get(outDir, s"${q}_$suffix.txt"), body.getBytes("UTF-8"))
        System.err.println(s"[explain] wrote $outDir/${q}_$suffix.txt")
      } catch {
        case e: Throwable =>
          System.err.println(s"[explain] $name failed: ${e.getMessage}")
      }
    }
    spark.stop()
  }
}
