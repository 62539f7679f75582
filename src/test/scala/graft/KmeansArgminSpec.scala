package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins [[graft.functions.KmeansArgminLong]]/[[KmeansArgminDouble]] (the
  * r16 codegen'd k-means assignment kernel) bit-equal to the r15 HOF form
  * it replaced: `array_min(transform(cents, c -> struct(
  * aggregate(zip_with(xs, cxs, (a,b)->(a-b)*(a-b)), 0, (acc,x)->acc+x),
  * c_id)))` — same left-to-right accumulation, same (d2, c_id) ordering,
  * ties to the smaller centroid id.
  */
class KmeansArgminSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def hofArgminLong(cents: Array[(Long, Array[Long])],
                            xs: org.apache.spark.sql.Column) = {
    val carr = array(cents.map { case (cid, cxs) =>
      struct(lit(cid).as("c_id"), array(cxs.map(lit(_)): _*).as("cxs"))
    }: _*)
    array_min(transform(carr, c => struct(
      aggregate(zip_with(xs, c.getField("cxs"), (a, b) => (a - b) * (a - b)),
        lit(0L), (acc, x) => acc + x).as("d2"),
      c.getField("c_id").as("c_id"))))
  }

  private def hofArgminDouble(cents: Array[(Long, Array[Double])],
                              v: org.apache.spark.sql.Column) = {
    val carr = array(cents.map { case (cid, cv) =>
      struct(lit(cid).as("c_id"), array(cv.map(lit(_)): _*).as("cv"))
    }: _*)
    array_min(transform(carr, c => struct(
      aggregate(zip_with(v, c.getField("cv"), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x).as("d2"),
      c.getField("c_id").as("c_id"))))
  }

  private def exprArgminLong(cents: Array[(Long, Array[Long])],
                             xs: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(graft.functions.KmeansArgminLong(
      org.apache.spark.sql.GraftBridge.expression(xs),
      cents.map(_._1).toSeq, cents.map(_._2.toSeq).toSeq))

  private def exprArgminDouble(cents: Array[(Long, Array[Double])],
                               v: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftBridge.column(graft.functions.KmeansArgminDouble(
      org.apache.spark.sql.GraftBridge.expression(v),
      cents.map(_._1).toSeq, cents.map(_._2.toSeq).toSeq))

  test("long argmin matches the HOF form on 300 random vectors, ties included") {
    val rnd = new scala.util.Random(20260818L)
    val dim = 6
    // centroid components small so exact-tie configurations actually occur
    val cents = Array.tabulate(5) { k =>
      ((k * 37 + 11).toLong, Array.fill(dim)(rnd.nextInt(5).toLong - 2))
    }
    // include exact duplicates of centroid vectors under different ids: the
    // tie MUST break to the smaller id in both forms
    val dupCents = cents :+ (999L, cents(2)._2.clone())
    val rows = Seq.fill(300)(Array.fill(dim)(rnd.nextInt(7).toLong - 3)).map(_.toSeq)
    val df = rows.toDF("xs")
    for (cs <- Seq(cents, dupCents)) {
      val got = df.select(
          exprArgminLong(cs, col("xs")).as("a"),
          hofArgminLong(cs, col("xs")).as("b"))
        .select(col("a.d2"), col("a.c_id"), col("b.d2"), col("b.c_id"))
        .collect()
      got.foreach { r =>
        assert(r.getLong(0) == r.getLong(2), s"d2 diverged: $r")
        assert(r.getLong(1) == r.getLong(3), s"c_id diverged: $r")
      }
    }
  }

  test("double argmin matches the HOF form on 300 random vectors") {
    val rnd = new scala.util.Random(42L)
    val dim = 5
    val cents = Array.tabulate(4) { k =>
      ((k * 13 + 7).toLong, Array.fill(dim)(rnd.nextDouble() * 2 - 1))
    }
    // duplicate-vector centroid: identical IEEE accumulation must tie,
    // then break to the smaller id
    val dupCents = cents :+ (1000L, cents(1)._2.clone())
    val rows = Seq.fill(300)(Array.fill(dim)(rnd.nextDouble() * 2 - 1).toSeq)
    val df = rows.toDF("v")
    for (cs <- Seq(cents, dupCents)) {
      val got = df.select(
          exprArgminDouble(cs, col("v")).as("a"),
          hofArgminDouble(cs, col("v")).as("b"))
        .select(col("a.d2"), col("a.c_id"), col("b.d2"), col("b.c_id"))
        .collect()
      got.foreach { r =>
        assert(r.getDouble(0) == r.getDouble(2), s"d2 diverged: $r")
        assert(r.getLong(1) == r.getLong(3), s"c_id diverged: $r")
      }
    }
  }

  test("argmin projection stays inside whole-stage codegen") {
    // a range source, not a local relation: ConvertToLocalRelation would
    // fold a LocalTableScan projection at plan time and hide the codegen
    val cents = Array((1L, Array(0L, 0L)), (2L, Array(200L, 200L)))
    val df = spark.range(0, 200)
      .select(array(col("id"), col("id") + 1L).as("xs"))
      .select(exprArgminLong(cents, col("xs")).getField("c_id").as("cell"))
    // the `*(n)` prefix on the Project IS the whole-stage-codegen marker
    // in the executed plan's simple string form
    val plan = df.queryExecution.executedPlan.toString()
    assert(plan.linesIterator.exists(l => l.contains("*(") && l.contains("kmeansargminlong")),
      s"kmeans argmin fell out of whole-stage codegen:\n$plan")
    val byCell = df.collect().map(_.getLong(0)).groupBy(identity).map {
      case (k, v) => k -> v.length
    }
    assert(byCell == Map(1L -> 100, 2L -> 100), byCell.toString)
  }
}
