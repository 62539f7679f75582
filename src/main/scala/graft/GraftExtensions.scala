package graft

import graft.functions._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL surface for the engine's custom Catalyst expressions: a
  * `SparkSessionExtensions` hook (`spark.sql.extensions=graft.GraftExtensions`
  * at session build) so `spark.sql("SELECT graft_fingerprint64(text) ...")`
  * works without touching the DataFrame API — the registration mechanism
  * SURVEY §7.3 calls for when built-ins can't express an operator.
  * This table is the single source of truth; `GraftSession` re-registers
  * the same builders under legacy unprefixed aliases.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.all.foreach { case (name, builder) =>
      ext.injectFunction((FunctionIdentifier(name),
        new ExpressionInfo("graft", name), builder))
    }
    // whole-operator extension: the native as-of join's planner rule and
    // its filter-pushdown companion (custom nodes block built-in pushdown)
    ext.injectPlannerStrategy(_ => graft.plans.AsofJoinStrategy)
    ext.injectOptimizerRule(_ => graft.plans.AsofFilterPushdown)
  }
}

object GraftExtensions {
  private def intLit(e: Expression, what: String): Int = {
    require(e.foldable, s"$what must be an integer literal, got $e")
    e.eval(null) match {
      case n: Number => n.intValue()
      case other => throw new IllegalArgumentException(
        s"$what must be an integer literal, got $other")
    }
  }

  private def arity(n: Int, name: String)(b: Seq[Expression] => Expression)
      : Seq[Expression] => Expression =
    es => {
      require(es.length == n, s"$name expects $n argument(s), got ${es.length}")
      b(es)
    }

  /** name -> expression builder, one per custom Catalyst expression. */
  val all: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_fingerprint64" -> arity(1, "graft_fingerprint64")(es => Fingerprint64(es.head)),
    "graft_canonical_json" -> arity(1, "graft_canonical_json")(es => CanonicalJson(es.head)),
    "graft_array_dot" -> arity(2, "graft_array_dot")(es => DoubleArrayDot(es(0), es(1))),
    "graft_debezium_decimal" -> arity(3, "graft_debezium_decimal")(es =>
      DebeziumDecimalDecode(es.head,
        intLit(es(1), "precision"), intLit(es(2), "scale"))),
    "graft_twos_complement_bytes" -> arity(1, "graft_twos_complement_bytes")(es =>
      TwosComplementEncode(es.head)),
    "graft_variable_scale_decimal" -> arity(2, "graft_variable_scale_decimal")(es =>
      VariableScaleDecimalText(es(0), es(1))),
    "graft_mongo_ext_json" -> arity(1, "graft_mongo_ext_json")(es => MongoExtJson(es.head)),
    "graft_ewkb_geojson" -> arity(1, "graft_ewkb_geojson")(es => EwkbToGeoJson(es.head)),
    "graft_gunzip" -> arity(1, "graft_gunzip")(es => Gunzip(es.head)),
    "graft_hmac_sha256" -> arity(2, "graft_hmac_sha256")(es => HmacSha256(es(0), es(1))),
    "graft_nfc_strip_accents" -> arity(1, "graft_nfc_strip_accents")(es =>
      NfcStripAccents(es.head)),
    "graft_luhn_valid" -> arity(1, "graft_luhn_valid")(es => LuhnValid(es.head)),
    "graft_damerau_levenshtein" -> arity(2, "graft_damerau_levenshtein")(es =>
      DamerauLevenshtein(es(0), es(1))),
    "graft_syllable_pack" -> arity(1, "graft_syllable_pack")(es =>
      SyllablePack(es.head)),
    "graft_bpe_tokens" -> arity(1, "graft_bpe_tokens")(es => BpeTokenCount(es.head)),
    "graft_wordpiece_tokens" -> arity(1, "graft_wordpiece_tokens")(es =>
      WordpieceTokenCount(es.head)),
    "graft_zorder_key" -> arity(3, "graft_zorder_key")(es =>
      ZOrderKey(es(0), es(1), intLit(es(2), "bits"))),
  )

  /** Register on an already-built session (tests, REPLs). */
  def register(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(spark, name, builder)
    }

  /** Same builders under the unprefixed legacy names GraftSession always
    * exposed (`debezium_decimal`, `fingerprint64`, ...).
    */
  def registerUnprefixedAliases(spark: SparkSession): Unit =
    all.foreach { case (name, builder) =>
      org.apache.spark.sql.GraftBridge.registerFunction(
        spark, name.stripPrefix("graft_"), builder)
    }
}
