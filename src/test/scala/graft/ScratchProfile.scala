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

  test("profile q169 grid join stages at sf0.1") {
    if (on) {
      val sf = "/root/testdata/sf0.1"
      import graft.functions.Converters
      import org.apache.spark.sql.types.StringType
      def pts = Tables.customer(spark, sf).select(col("c_custkey").as("id"),
        pmod(Converters.fingerprint64(concat(lit("gx"), col("c_custkey").cast(StringType))), lit(1000000L)).as("x"),
        pmod(Converters.fingerprint64(concat(lit("gy"), col("c_custkey").cast(StringType))), lit(1000000L)).as("y"))
      for (rep <- 1 to 2) {
        var t0 = System.nanoTime()
        val n = pts.localCheckpoint(true).count()
        println(f"[profile] pts materialize: ${(System.nanoTime()-t0)/1e9}%.2f s ($n rows)")
        t0 = System.nanoTime()
        val out = graft.operators.SpatialOps.gridNeighborPairs(pts, "id", "x", "y", 12500L, 12500L)
        out.write.format("noop").mode("overwrite").save()
        println(f"[profile] rep$rep grid join (no sort): ${(System.nanoTime()-t0)/1e9}%.2f s")
        t0 = System.nanoTime()
        graft.operators.SpatialOps.gridNeighborPairs(pts, "id", "x", "y", 12500L, 12500L)
          .orderBy(col("id_a"), col("id_b")).write.format("noop").mode("overwrite").save()
        println(f"[profile] rep$rep grid join (with sort): ${(System.nanoTime()-t0)/1e9}%.2f s")
      }
    }
  }

  test("profile q303 dbscan stage breakdown at sf0.1") {
    if (on) {
      val sf = "/root/testdata/sf0.1"
      import graft.functions.Converters
      import org.apache.spark.sql.types.StringType
      def coordMix(h: org.apache.spark.sql.Column) = pmod(pmod(
        lit(636413622L) * h + lit(528402381L),
        lit(1000000007L)), lit(1000000L))
      for (rep <- 1 to 2) {
        var t0 = System.nanoTime()
        def t(label: String): Unit = {
          println(f"[profile] rep$rep $label: ${(System.nanoTime() - t0) / 1e9}%.2f s")
          t0 = System.nanoTime()
        }
        val pts = Tables.customer(spark, sf).select(col("c_custkey").as("id"),
          coordMix(Converters.fingerprint64(
            concat(lit("gx"), col("c_custkey").cast(StringType)))).as("x"),
          coordMix(Converters.fingerprint64(
            concat(col("c_custkey").cast(StringType), lit("gy")))).as("y"))
        val eps = math.floor(968246.0 / math.sqrt(pts.count().toDouble)).toLong
        t("eps count")
        val p2 = pts.localCheckpoint(true)
        t("pts materialize")
        val pairs = graft.operators.SpatialOps.gridNeighborPairs(
            p2, "id", "x", "y", eps, eps)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        println(s"[profile] pairs: ${pairs.count()}")
        t("pairs materialize")
        val deg = pairs.select(col("id_a").as("id"))
          .unionAll(pairs.select(col("id_b")))
          .groupBy(col("id")).agg(count(lit(1)).as("__nb"))
        val core = p2.join(deg, Seq("id"), "left")
          .filter(coalesce(col("__nb"), lit(0L)) + 1L >= 3L)
          .select(col("id"))
          .localCheckpoint(true)
        t("core materialize")
        val coreEdges = pairs
          .join(core.select(col("id").as("id_a")), Seq("id_a"), "left_semi")
          .join(core.select(col("id").as("id_b")), Seq("id_b"), "left_semi")
          .select(col("id_a").as("ia"), col("id_b").as("ib"))
        val grp = DedupOps.nearDupGroupsStar(core, "id", coreEdges)
          .localCheckpoint(true)
        t("star contraction")
        val full = graft.operators.SpatialOps.dbscanGrid(p2, "id", "x", "y",
          eps, eps, 3L).orderBy(col("id"))
        full.write.format("noop").mode("overwrite").save()
        t("full dbscanGrid end-to-end")
        pairs.unpersist()
        spark.catalog.clearCache()
        spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
        System.gc()
      }
    }
  }
}
