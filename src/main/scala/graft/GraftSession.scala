package graft

import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** Session bootstrap: recommended configuration + SQL registration of the
  * engine's custom expressions, so `spark.sql` users get the converter
  * surface (`SELECT debezium_decimal(b, 18, 2) ...`) without touching the
  * Scala API.
  */
object GraftSession {
  def builder(cores: Int = Runtime.getRuntime.availableProcessors()): SparkSession.Builder =
    SparkSession.builder()
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  private def intLit(e: Expression): Int =
    e.eval(null).asInstanceOf[Number].intValue()

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "debezium_decimal" -> (args => DebeziumDecimalDecode(args.head, intLit(args(1)), intLit(args(2)))),
    "twos_complement_bytes" -> (args => TwosComplementEncode(args.head)),
    "graft_gunzip" -> (args => Gunzip(args.head)),
    "hmac_sha256" -> (args => HmacSha256(args.head, args(1))),
    "canonical_json" -> (args => CanonicalJson(args.head)),
    "fingerprint64" -> (args => Fingerprint64(args.head)),
    "ewkb_geojson" -> (args => EwkbToGeoJson(args.head)),
    "mongo_ext_json" -> (args => MongoExtJson(args.head)),
    "array_dot" -> (args => DoubleArrayDot(args.head, args(1))),
  )

  /** Register every graft expression as a SQL temp function. */
  def registerFunctions(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    fns.foreach { case (name, builder) =>
      registry.registerFunction(
        FunctionIdentifier(name),
        new ExpressionInfo("graft", name),
        builder)
    }
  }
}
