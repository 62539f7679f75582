package graft

import java.nio.file.Files
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.DedupOps

/** The parquet-backed near-dup graph artifact (build / read / append /
  * replay): the "computed once per corpus generation" relation that
  * q101/q118/q129 consume instead of re-hashing the corpus.
  */
class DedupGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  val sf = "/root/testdata/sf0.001"

  private def tmp(): String =
    Files.createTempDirectory("graft_ddg_spec").toString

  private def pairSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("ia"), col("ib"), col("hamming").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  private def compSet(df: DataFrame): Set[(Long, Long)] =
    df.select(col("id"), col("canonical_id"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("buildDedupGraph artifact reproduces the in-memory pairs, components and meta") {
    val docs = Tables.documents(spark, sf)
    val path = tmp()
    DedupOps.buildDedupGraph(docs, "doc_id", "text", path, 3)

    val memPairs = DedupOps.simhashExactPairs(docs, "doc_id", "text", 3)
      .localCheckpoint(false)
    val expPairs = pairSet(memPairs)
    assert(expPairs.nonEmpty) // testdata plants exact dups -> hamming-0 pairs
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == expPairs)

    val expComp = compSet(DedupOps.nearDupGroupsStar(
      docs.select(col("doc_id")), "doc_id", memPairs))
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) == expComp)
    // every corpus doc appears exactly once (singletons included)
    assert(expComp.size == docs.count())

    assert(spark.read.parquet(s"$path/meta").head().getInt(0) == 3)
  }

  test("appendToDedupGraph equals a full rebuild over corpus + batch") {
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val mid = docs.agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY doc_id)"))
      .head().getDouble(0).toLong
    val corpus = docs.filter(col("doc_id") <= mid)
    val batch = docs.filter(col("doc_id") > mid)

    val path = tmp()
    DedupOps.buildDedupGraph(corpus, "doc_id", "text", path, 3)
    DedupOps.appendToDedupGraph(batch, "doc_id", "text", path)

    val expPairs = pairSet(DedupOps.simhashExactPairs(docs, "doc_id", "text", 3))
    // the interesting arm: pairs that straddle the corpus/batch split —
    // found by the batch-vs-corpus chunk join, not the original build
    val cross = expPairs.filter { case (a, b, _) => a <= mid && b > mid }
    assert(cross.nonEmpty, s"no cross-split pairs at mid=$mid; split uninformative")
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == expPairs)

    val expComp = compSet(DedupOps.nearDupGroupsStar(
      docs.select(col("doc_id")), "doc_id",
      DedupOps.simhashExactPairs(docs, "doc_id", "text", 3)))
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) == expComp)
  }

  test("winnow-fp index artifact reproduces the direct winnowing results") {
    val docs = Tables.documents(spark, sf)
    val path = tmp()
    DedupOps.buildWinnowFpIndex(docs, "doc_id", "text", 6, 5, path)
    val fps = DedupOps.winnowFps(spark, path)

    val direct = DedupOps.repeatedPassages(docs, "doc_id", "text", 6, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val viaIdx = DedupOps.repeatedPassagesFromFp(fps)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(viaIdx == direct)
    assert(direct.nonEmpty)

    val directPairs = DedupOps.repeatedPassagePairs(docs, "doc_id", "text", 6, 5, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val viaIdxPairs = DedupOps.repeatedPassagePairsFromFp(fps, 64)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaIdxPairs == directPairs)

    // meta records the fingerprint parameters
    val meta = spark.read.parquet(s"$path/meta").head()
    assert((meta.getInt(0), meta.getInt(1)) == ((6, 5)))
  }

  test("replayed append is idempotent through the reader dedup") {
    val docs = Tables.documents(spark, sf).localCheckpoint(false)
    val mid = docs.agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY doc_id)"))
      .head().getDouble(0).toLong
    val corpus = docs.filter(col("doc_id") <= mid)
    val batch = docs.filter(col("doc_id") > mid)

    val path = tmp()
    DedupOps.buildDedupGraph(corpus, "doc_id", "text", path, 3)
    DedupOps.appendToDedupGraph(batch, "doc_id", "text", path)
    val pairs1 = pairSet(DedupOps.dedupGraphPairs(spark, path))
    val comp1 = compSet(DedupOps.dedupGraphComponents(spark, path))

    // at-least-once delivery: the same batch lands again
    DedupOps.appendToDedupGraph(batch, "doc_id", "text", path)
    assert(pairSet(DedupOps.dedupGraphPairs(spark, path)) == pairs1)
    assert(compSet(DedupOps.dedupGraphComponents(spark, path)) == comp1)
    // components still cover every doc exactly once despite duplicate sig rows
    assert(comp1.size == docs.count())
  }
}
