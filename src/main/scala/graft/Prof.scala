package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

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
    import graft.operators.DedupOps
    val sh = DedupOps.shingles(docs, "doc_id", "text", 3)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    time("shingle index materialize") {
      sh.write.format("noop").mode("overwrite").save()
    }
    time("minhash signatures (96 perms)") {
      DedupOps.minhashSignatures(sh, 96).write.format("noop").mode("overwrite").save()
    }
    time("lsh candidates") {
      DedupOps.lshCandidatePairs(DedupOps.minhashSignatures(sh, 96), 48, 2)
        .write.format("noop").mode("overwrite").save()
    }
    sh.unpersist()
    spark.catalog.clearCache()
    time("q22 full") {
      SparkEntry.queries("q22_dedup_minhash_lsh")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
