package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL registration surface: every custom Catalyst expression is
  * callable from spark.sql once GraftExtensions registers it, and agrees
  * with its Column-API twin.
  */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = {
    val s = TestSpark.spark
    GraftExtensions.register(s)
    s
  }
  import spark.implicits._

  test("every expression in the registry resolves under both name surfaces") {
    GraftExtensions.registerUnprefixedAliases(spark)
    GraftExtensions.all.foreach { case (name, _) =>
      assert(spark.catalog.functionExists(name), s"missing SQL function: $name")
      assert(spark.catalog.functionExists(name.stripPrefix("graft_")),
        s"missing unprefixed alias: ${name.stripPrefix("graft_")}")
    }
  }

  test("registered SQL functions agree with their Column-API twins") {
    Seq((1L, """{"b":2,"a":1}""", "hello world"))
      .toDF("id", "j", "t").createOrReplaceTempView("sql_surface")
    val row = spark.sql("""
      SELECT graft_fingerprint64(t) AS fp,
             graft_canonical_json(j) AS cj,
             graft_array_dot(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS dot,
             graft_mongo_ext_json('{"_id":{"$numberLong":"7"}}') AS mongo,
             graft_wordpiece_tokens(t) AS wp
      FROM sql_surface""").head
    val twin = Seq("hello world").toDF("t")
      .select(graft.functions.Converters.fingerprint64(col("t"))).head.getLong(0)
    assert(row.getAs[Long]("fp") == twin)
    assert(row.getAs[String]("cj") == """{"a":1,"b":2}""")
    assert(row.getAs[Double]("dot") == 11.0)
    assert(row.getAs[String]("mongo") == """{"_id":7}""")
    assert(row.getAs[Long]("wp") == graft.functions.Wordpiece.countTokens(
      org.apache.spark.unsafe.types.UTF8String.fromString("hello world")))
  }

  test("debezium decimal + gunzip + hmac callable from SQL") {
    val gz = {
      val bos = new java.io.ByteArrayOutputStream()
      val g = new java.util.zip.GZIPOutputStream(bos)
      g.write("payload".getBytes("UTF-8")); g.close()
      java.util.Base64.getEncoder.encodeToString(bos.toByteArray)
    }
    Seq((java.util.Base64.getEncoder.encodeToString(Array[Byte](0x30, 0x39)), gz))
      .toDF("dec_b64", "gz_b64").createOrReplaceTempView("sql_surface2")
    val row = spark.sql("""
      SELECT CAST(graft_debezium_decimal(unbase64(dec_b64), 10, 2) AS STRING) AS d,
             CAST(graft_gunzip(unbase64(gz_b64)) AS STRING) AS gunzipped,
             graft_hmac_sha256(CAST('key' AS BINARY), CAST('msg' AS BINARY)) IS NOT NULL AS hmac_ok
      FROM sql_surface2""").head
    assert(row.getAs[String]("d") == "123.45")
    assert(row.getAs[String]("gunzipped") == "payload")
    assert(row.getAs[Boolean]("hmac_ok"))
  }

  test("unparseable input yields a REAL null even over non-nullable children") {
    // nullable=true matters: over a literal (non-nullable) child,
    // NullPropagation would otherwise fold IS NULL to false and codegen
    // would not allocate the null slot the expression assigns
    val r = spark.sql("""
      SELECT graft_canonical_json('not json') IS NULL AS cj_null,
             graft_mongo_ext_json('nope') IS NULL AS mongo_null,
             graft_gunzip(CAST('junk' AS BINARY)) IS NULL AS gz_null""").head
    assert(r.getBoolean(0) && r.getBoolean(1) && r.getBoolean(2))
  }

  test("wrong input types fail at analysis time, not mid-query") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_gunzip('not binary')").collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"))
    val e2 = intercept[Exception] {
      spark.sql("SELECT graft_canonical_json(123)").collect()
    }
    assert(e2.getMessage.toLowerCase.contains("string"))
  }

  test("non-literal precision is rejected with a clear error") {
    val e = intercept[Exception] {
      spark.sql("SELECT graft_debezium_decimal(CAST('x' AS BINARY), id, 2) FROM range(1)").collect()
    }
    assert(e.getMessage.contains("INT literal") || e.getMessage.toLowerCase.contains("literal"))
  }
}
