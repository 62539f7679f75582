package graft

import graft.sink.ClickhouseSqlBuilder
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 eighth dialect: ClickHouse — merge semantics via the
  * ReplacingMergeTree TABLE ENGINE rather than DML
  * (clients/clickhouse/dialect/dialect.go:91-105).
  */
class ClickhouseSqlSpec extends AnyFunSuite {
  test("replication table: ReplacingMergeTree(updated_at, delete), delete re-typed UInt8") {
    val sql = ClickhouseSqlBuilder.buildCreateTable("db.t",
      Seq("id" -> "Int64", "name" -> "String", Constants.DeleteCol -> "Bool"))
    assert(sql ==
      s"CREATE TABLE db.t (`id` Int64,`name` String,`${Constants.DeleteCol}` UInt8) " +
        s"ENGINE = ReplacingMergeTree(`${Constants.UpdatedAtCol}`, `${Constants.DeleteCol}`);")
  }

  test("history table: plain MergeTree ordered by the updated-at marker") {
    val sql = ClickhouseSqlBuilder.buildCreateTable("db.h",
      Seq("id" -> "Int64"), replication = false)
    assert(sql ==
      s"CREATE TABLE db.h (`id` Int64) ENGINE = MergeTree() ORDER BY `${Constants.UpdatedAtCol}`;")
  }

  test("idempotent column DDL: IF NOT EXISTS / IF EXISTS forms") {
    assert(ClickhouseSqlBuilder.buildAddColumn("db.t", "`x` Int64") ==
      "ALTER TABLE db.t ADD COLUMN IF NOT EXISTS `x` Int64;")
    assert(ClickhouseSqlBuilder.buildDropColumn("db.t", "x") ==
      "ALTER TABLE db.t DROP COLUMN IF EXISTS `x`;")
  }
}
