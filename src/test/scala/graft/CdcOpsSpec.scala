package graft

import graft.operators.CdcOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Dedup-buffer + merge semantics, mirroring the reference's
  * lib/optimization/table_data_test.go and the MERGE arm behavior of
  * clients/iceberg/dialect/dialect.go:103-178.
  */
class CdcOpsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val T = Constants.ToastPlaceholder

  test("lastWins keeps the final event per PK by offset") {
    val df = Seq((1L, 1L, "a"), (1L, 3L, "c"), (1L, 2L, "b"), (2L, 5L, "x"))
      .toDF("pk", "off", "v")
    val got = CdcOps.lastWins(df, Seq("pk"), Seq(col("off")))
      .orderBy("pk").collect().map(r => (r.getLong(0), r.getString(2)))
    assert(got.toSeq == Seq((1L, "c"), (2L, "x")))
  }

  test("toastInherit heals sentinel transitively, keeps real nulls, keeps all-toast prefix") {
    val df = Seq(
      (1L, 1L, "v1"), (1L, 2L, T), (1L, 3L, T),      // inherit v1 twice
      (2L, 1L, T),                                   // nothing to inherit
      (3L, 1L, "x"), (3L, 2L, null), (3L, 3L, T),    // null is a real value; T inherits it
    ).toDF("pk", "off", "v")
    val got = CdcOps.toastInherit(df, Seq("pk"), Seq(col("off")), Seq("v"))
      .orderBy("pk", "off").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq(
      (1L, 1L, "v1"), (1L, 2L, "v1"), (1L, 3L, "v1"),
      (2L, 1L, T),
      (3L, 1L, "x"), (3L, 2L, null), (3L, 3L, null)))
  }

  test("deleteInherit carries previous row values into delete events") {
    val df = Seq(
      (1L, 1L, "keep", false), (1L, 2L, null.asInstanceOf[String], true),
      (2L, 1L, null.asInstanceOf[String], true), // delete with no prior: stays null
    ).toDF("pk", "off", "v", "del")
    val got = CdcOps.deleteInherit(df, Seq("pk"), Seq(col("off")), "del", Seq("v"))
      .orderBy("pk", "off").collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, 1L, "keep"), (1L, 2L, "keep"), (2L, 1L, null)))
  }

  test("mergeApply hard-delete: update, insert, delete arms") {
    val base = Seq((1L, "old1", 10.0), (2L, "old2", 20.0), (3L, "old3", 30.0))
      .toDF("pk", "name", "v")
    val changes = Seq(
      (1L, "new1", 11.0, 1L, false), // update
      (2L, "x", 0.0, 2L, true),      // delete
      (4L, "ins4", 40.0, 3L, false), // insert
      (5L, "ghost", 0.0, 4L, true),  // delete of nonexistent row -> dropped
    ).toDF("pk", "name", "v", "off", Constants.DeleteCol)
    val got = CdcOps.mergeApply(base, changes, Seq("pk"), Seq(col("off")))
      .orderBy("pk").collect().map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    assert(got.toSeq == Seq((1L, "new1", 11.0), (3L, "old3", 30.0), (4L, "ins4", 40.0)))
  }

  test("mergeApply soft-delete flags instead of dropping, inserts unmatched") {
    val base = Seq((1L, "a")).toDF("pk", "name")
    val changes = Seq((1L, "x", 1L, true), (2L, "b", 2L, false))
      .toDF("pk", "name", "off", Constants.DeleteCol)
    val got = CdcOps.mergeApply(base, changes, Seq("pk"), Seq(col("off")), softDelete = true)
      .orderBy("pk").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    // matched delete takes source values + flag (reference soft arm 1)
    assert(got.toSeq == Seq((1L, "x", true), (2L, "b", false)))
  }

  test("mergeApply only-set-delete keeps target values, sets only the flag") {
    val base = Seq((1L, "keepme")).toDF("pk", "name")
    val changes = Seq((1L, "IGNORED", 1L, true, true))
      .toDF("pk", "name", "off", Constants.DeleteCol, Constants.OnlySetDeleteCol)
    val got = CdcOps.mergeApply(base, changes, Seq("pk"), Seq(col("off")), softDelete = true)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getBoolean(2)))
    assert(got.toSeq == Seq((1L, "keepme", true)))
  }

  test("mergeApply TOAST arm: sentinel column keeps target value on update") {
    val base = Seq((1L, "original", "meta")).toDF("pk", "doc", "m")
    val changes = Seq((1L, T, "meta2", 1L, false))
      .toDF("pk", "doc", "m", "off", Constants.DeleteCol)
    val got = CdcOps.mergeApply(base, changes, Seq("pk"), Seq(col("off")),
      toastCols = Seq("doc"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    assert(got.toSeq == Seq((1L, "original", "meta2")))
  }

  test("mergeApply within-batch: only the last change per PK applies") {
    val base = Seq((1L, "a")).toDF("pk", "name")
    val changes = Seq((1L, "mid", 1L, false), (1L, "final", 2L, false))
      .toDF("pk", "name", "off", Constants.DeleteCol)
    val got = CdcOps.mergeApply(base, changes, Seq("pk"), Seq(col("off")))
      .collect().map(_.getString(1))
    assert(got.toSeq == Seq("final"))
  }

  test("softPartitionSuffix formats the raw partition suffix; distance sign is lexicographic") {
    val df = Seq("2020-01-15 10:00:00", "2999-01-01 00:00:00").toDF("s")
      .select(CdcOps.softPartitionSuffix(col("s").cast("timestamp")).as("sfx"))
    val rows = df.collect().map(_.getString(0))
    assert(rows.toSeq == Seq("_2020_01", "_2999_01"))
    // PartitionDistance sign (topic.go:126-143): past > 0, same 0, future < 0
    assert(CdcOps.softPartitionDistanceSign("_2020_01", "_2024_06") > 0)
    assert(CdcOps.softPartitionDistanceSign("_2024_06", "_2024_06") == 0)
    assert(CdcOps.softPartitionDistanceSign("_2999_01", "_2024_06") < 0)
  }
}
