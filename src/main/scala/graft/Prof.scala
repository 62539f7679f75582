package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Scratch profiling main (not part of the library surface). */
object Prof {

  /** Packed-counter variant of simhashFp30: same feature hash, same
    * bit-sign rule, but the 30 per-bit counters ride in 8 longs
    * (4 x 16-bit lanes each) so the hash-agg updates 8 buffer slots per
    * row instead of 30.
    */
  def simhashFp30Packed(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.operators.DedupOps
    val feats = df.repartition(col(idCol))
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), explode(DedupOps.shingleArrayFromTokens(col("__toks"), 2)).as("w"))
    val h = graft.functions.Converters.fingerprint64(col("w"))
    // lane l of packed long g counts bit j = 4g + l of h
    val packedCols = (0 until 8).map { g =>
      val lanes = (0 until 4).map(l => 4 * g + l).filter(_ < 30)
      lanes.map(j =>
        shiftright(h, j).bitwiseAND(1) * lit(1L << (16 * (j - 4 * g)))
      ).reduce(_ + _).as(s"p$g")
    }
    val withPacked = feats.select(Seq(col("id")) ++ packedCols: _*)
    val aggs = (0 until 8).map(g => sum(col(s"p$g")).as(s"sp$g")) :+ count(lit(1)).as("n")
    val sums = withPacked.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val sig = (0 until 30).map { j =>
      val g = j / 4; val l = j % 4
      val cnt = shiftright(col(s"sp$g"), 16 * l).bitwiseAND(0xFFFFL)
      // sum(+-1) > 0  <=>  2*ones > n
      when(cnt * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), sig.as("simhash"))
  }


  /** 32-bit-lane packing: bits j and j+15 share one long, overflow-safe to
    * 2^32 features per doc. 15 packed sums + count vs 30 separate sums.
    */
  def simhashFp30Packed32(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import graft.operators.DedupOps
    val feats = df.repartition(col(idCol))
      .select(col(idCol).as("id"), split(col(textCol), " ").as("__toks"))
      .select(col("id"), explode(DedupOps.shingleArrayFromTokens(col("__toks"), 2)).as("w"))
    val h = graft.functions.Converters.fingerprint64(col("w"))
    val packedCols = (0 until 15).map { g =>
      (shiftright(h, g).bitwiseAND(1) +
        shiftright(h, g + 15).bitwiseAND(1) * lit(1L << 32)).as(s"p$g")
    }
    val withPacked = feats.select(Seq(col("id")) ++ packedCols: _*)
    val aggs = (0 until 15).map(g => sum(col(s"p$g")).as(s"sp$g")) :+ count(lit(1)).as("n")
    val sums = withPacked.groupBy(col("id")).agg(aggs.head, aggs.tail: _*)
    val sig = (0 until 30).map { j =>
      val g = j % 15; val hi = j >= 15
      val cnt = if (hi) shiftright(col(s"sp$g"), 32) else col(s"sp$g").bitwiseAND(0xFFFFFFFFL)
      when(cnt * 2 > col("n"), lit(1L << j)).otherwise(lit(0L))
    }.reduce((a, b) => a.bitwiseOR(b))
    sums.select(col("id"), sig.as("simhash"))
  }

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
    time("q23 full cold") {
      SparkEntry.queries("q23_dedup_simhash")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    time("q23 full warm") {
      SparkEntry.queries("q23_dedup_simhash")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    time("q44 full (double-step label prop)") {
      SparkEntry.queries("q44_dedup_groups")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    time("q44 again (warm)") {
      SparkEntry.queries("q44_dedup_groups")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
    }
    spark.catalog.clearCache()
    spark.stop()
  }
}
