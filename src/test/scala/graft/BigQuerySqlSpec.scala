package graft

import graft.sink.BigQuerySqlBuilder
import org.scalatest.funsuite.AnyFunSuite

/** §2.3 fourth dialect: BigQuery single-statement MERGE
  * (clients/bigquery/dialect/dialect.go:103-182). Golden strings mirror
  * the reference's own dialect tests: backtick quoting, no-paren
  * USING, TO_JSON_STRING comparison for JSON primary keys, and the
  * COALESCE-free TO_JSON_STRING toast guard.
  */
class BigQuerySqlSpec extends AnyFunSuite {
  private val del = Constants.DeleteCol
  private val osd = Constants.OnlySetDeleteCol
  private val cols = Seq("order_id", "name", del, osd)

  test("hard-delete MERGE matches the reference's three-arm text") {
    val sql = BigQuerySqlBuilder.buildMerge("customers.orders",
      "customers.orders_tmp", Seq("order_id"), cols, softDelete = false)
    assert(sql.trim.linesIterator.toSeq == Seq(
      "MERGE INTO customers.orders tgt USING customers.orders_tmp AS stg ON tgt.`order_id` = stg.`order_id`",
      "WHEN MATCHED AND stg.`__artie_delete` THEN DELETE",
      "WHEN MATCHED AND IFNULL(stg.`__artie_delete`, false) = false THEN UPDATE SET `order_id`=stg.`order_id`,`name`=stg.`name`",
      "WHEN NOT MATCHED AND IFNULL(stg.`__artie_delete`, false) = false THEN INSERT (`order_id`,`name`) VALUES (stg.`order_id`,stg.`name`);"))
  }

  test("JSON primary key compares through TO_JSON_STRING on both sides") {
    val sql = BigQuerySqlBuilder.buildMerge("customers.orders",
      "customers.orders_tmp", Seq("order_oid"),
      Seq("order_oid", "name", del, osd), softDelete = false,
      jsonPks = Set("order_oid"))
    assert(sql.contains(
      "ON TO_JSON_STRING(tgt.`order_oid`) = TO_JSON_STRING(stg.`order_oid`)"))
  }

  test("soft-delete MERGE: two matched arms and a flag-carrying insert") {
    val sql = BigQuerySqlBuilder.buildMerge("customers.orders", "sub",
      Seq("order_id"), cols, softDelete = true)
    assert(sql.contains(
      s"WHEN MATCHED AND IFNULL(stg.`$osd`, false) = false THEN UPDATE SET `order_id`=stg.`order_id`,`name`=stg.`name`,`$del`=stg.`$del`"))
    assert(sql.contains(
      s"WHEN MATCHED AND IFNULL(stg.`$osd`, false) = true THEN UPDATE SET `$del`=stg.`$del`"))
    assert(sql.contains(
      s"WHEN NOT MATCHED THEN INSERT (`order_id`,`name`,`$del`) VALUES (stg.`order_id`,stg.`name`,stg.`$del`);"))
  }

  test("toast guard serializes through TO_JSON_STRING with no COALESCE") {
    val sql = BigQuerySqlBuilder.buildMerge("t", "sub", Seq("id"),
      Seq("id", "payload", del, osd), softDelete = false,
      toastCols = Set("payload"))
    assert(sql.contains(
      s"`payload`= CASE WHEN TO_JSON_STRING(stg.`payload`) NOT LIKE '%${Constants.ToastPlaceholder}%' THEN stg.`payload` ELSE tgt.`payload` END"))
    assert(!sql.contains("COALESCE"))
  }
}
