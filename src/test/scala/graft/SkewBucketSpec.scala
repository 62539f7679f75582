package graft

import graft.operators.SkewOps
import graft.sink.Sinks
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SkewBucketSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("salted two-phase aggregation equals plain aggregation") {
    // hot key: 90% of rows share key 1
    val rows = (1 to 1000).map(i => (if (i % 10 == 0) i.toLong % 7 + 2 else 1L, i.toDouble))
    val df = rows.toDF("k", "v")
    val salted = SkewOps.saltedSumCount(df, Seq("k"), "v")
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    val plain = df.groupBy("k").agg(sum("v").as("s"), count(lit(1)).as("n"))
      .orderBy("k").collect().map(r => (r.getLong(0), r.getDouble(1), r.getLong(2)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("salted join equals plain join on a skewed fact side") {
    val fact = (1 to 500).map(i => (if (i % 5 == 0) i.toLong % 3 + 2 else 1L, i)).toDF("k", "x")
    val dim = Seq((1L, "hot"), (2L, "a"), (3L, "b"), (4L, "c")).toDF("k", "name")
    val salted = SkewOps.saltedJoin(fact, dim, "k")
      .groupBy("name").count().orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    val plain = fact.join(dim, "k")
      .groupBy("name").count().orderBy("name").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(salted.toSeq == plain.toSeq)
  }

  test("bucketed tables join without a shuffle exchange") {
    val wh = java.nio.file.Files.createTempDirectory("graft_wh")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val a = (1 to 1000).map(i => (i.toLong, s"a$i")).toDF("id", "av")
      val b = (1 to 1000).map(i => (i.toLong, i * 2.0)).toDF("id", "bv")
      Sinks.writeBucketed(a, "graft_bkt_a", Seq("id"), 4)
      Sinks.writeBucketed(b, "graft_bkt_b", Seq("id"), 4)
      val joined = spark.table("graft_bkt_a").join(spark.table("graft_bkt_b"), "id")
      val plan = joined.queryExecution.executedPlan.toString
      // co-located: no shuffle needed on either side of the join
      assert(!plan.contains("Exchange hashpartitioning"), plan.take(2000))
      assert(joined.count() == 1000)
    } finally {
      spark.sql("DROP TABLE IF EXISTS graft_bkt_a")
      spark.sql("DROP TABLE IF EXISTS graft_bkt_b")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
