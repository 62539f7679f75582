package graft

import graft.streaming.CdcPipeline
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SessionSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("custom expressions usable from plain SQL after registration") {
    GraftSession.registerFunctions(spark)
    val r = spark.sql("""SELECT
      debezium_decimal(twos_complement_bytes(56801L), 10, 2) AS d,
      fingerprint64('hello') AS fp,
      canonical_json('{"b":1,"a":2}') AS cj,
      array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot""").head
    assert(r.getDecimal(0) == new java.math.BigDecimal("568.01"))
    assert(r.getLong(1) > 0)
    assert(r.getString(2) == """{"a":2,"b":1}""")
    assert(r.getDouble(3) == 11.0)
  }

  test("driver entry smoke: flagship query returns rows on sf0.001") {
    val df = SparkEntry.entry(spark)
    assert(df.count() > 0)
  }

  test("micro-batch merge is idempotent: replaying a batch is a no-op") {
    val target = java.nio.file.Files.createTempDirectory("graft_idem").toString + "/t"
    val cfg = CdcPipeline.Config(Seq("id"), orderCol = "off")
    val batch = Seq((1L, "a", 1L, false), (2L, "b", 2L, true))
      .toDF("id", "name", "off", Constants.DeleteCol)
      .withColumn(Constants.OperationCol, lit("u"))
    CdcPipeline.applyBatch(batch, 0L, cfg, target)
    val first = spark.read.parquet(target).orderBy("id").collect().map(_.toString).toSeq
    // at-least-once delivery: the same batch may arrive again after a
    // checkpoint replay — the merge must converge to the same state
    CdcPipeline.applyBatch(batch, 0L, cfg, target)
    val second = spark.read.parquet(target).orderBy("id").collect().map(_.toString).toSeq
    assert(first == second)
    assert(first.size == 1) // id=2 was a delete
  }
}
