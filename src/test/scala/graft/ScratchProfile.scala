package graft

import graft.operators.DedupOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dev-loop profiling harness — every test is a no-op unless
  * SPARK_GRAFT_PROFILE=1.
  */
class ScratchProfile extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def on = sys.env.get("SPARK_GRAFT_PROFILE").contains("1")

  test("profile q21 prefix warm reps at sf0.1") {
    if (on) {
      val sf = "/root/testdata/sf0.1"
      for (rep <- 1 to 3) {
        val t0 = System.nanoTime()
        val r = DedupOps.jaccardPairsPrefixReleasable(
          Tables.documents(spark, sf), "doc_id", "text", 3, 0.6)
        val out = r.df.orderBy(col("ia"), col("ib")).localCheckpoint(true)
        out.write.format("noop").mode("overwrite").save()
        r.release()
        println(f"[profile] rep$rep total ${(System.nanoTime() - t0) / 1e9}%.2f s")
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
      }
      // explain the candidate plan: is the dfreq join broadcast?
      val r2 = DedupOps.jaccardPairsPrefixReleasable(
        Tables.documents(spark, sf), "doc_id", "text", 3, 0.6)
      r2.df.write.format("noop").mode("overwrite").save()
      println(r2.df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("simple")))
      r2.release()
    }
  }
}
