package graft

import graft.operators.{DedupOps, SamplingOps, SimilarityOps, TextOps}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-4 training-data pipeline operators: contamination screening,
  * chunking, int8 quantization, token-budget sampling, unicode
  * canonicalization, distinctive terms.
  */
class PipelineOpsR4Spec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ngramContamination counts benchmark-overlapping shingles exactly") {
    // corpus doc 1 shares its full text with bench doc 10; doc 2 shares
    // nothing; doc 3 shares one 3-gram ("c d e")
    val corpus = Seq(
      (1L, "a b c d"),
      (2L, "x y z w"),
      (3L, "q q c d e")).toDF("doc_id", "text")
    val bench = Seq((10L, "a b c d"), (11L, "m c d e n")).toDF("doc_id", "text")
    val got = DedupOps.ngramContamination(corpus, bench, "doc_id", "text", 3)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    // doc 1: shingles {a b c, b c d} both hit -> 1000 permille
    // doc 2: {x y z, y z w} no hits
    // doc 3: {q q c, q c d, c d e} -> only "c d e" hits
    assert(got.toSeq == Seq(
      (1L, 2L, 2L, 1000L),
      (2L, 2L, 0L, 0L),
      (3L, 3L, 1L, 333L)))
  }

  test("chunkDocuments bounds starts: no degenerate tail fully inside the previous window") {
    // 10 tokens, chunk 4, stride 3: start 9 would yield "t9" — already
    // covered by chunk 2 — so the last start is 6
    val df = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9")).toDF("doc_id", "text")
    val got = SamplingOps.chunkDocuments(df, "doc_id", "text", 4, 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "t0 t1 t2 t3", 4L),
      (1L, "t3 t4 t5 t6", 4L),
      (2L, "t6 t7 t8 t9", 4L)))
  }

  test("chunkDocuments keeps a genuine short tail that adds new content") {
    // 11 tokens: start 9 reaches t10, which no earlier chunk covers
    val df = Seq((7L, "t0 t1 t2 t3 t4 t5 t6 t7 t8 t9 t10")).toDF("doc_id", "text")
    val got = SamplingOps.chunkDocuments(df, "doc_id", "text", 4, 3)
      .orderBy("chunk_id")
      .collect().map(r => (r.getLong(1), r.getString(2), r.getLong(3)))
    assert(got.toSeq == Seq(
      (0L, "t0 t1 t2 t3", 4L),
      (1L, "t3 t4 t5 t6", 4L),
      (2L, "t6 t7 t8 t9", 4L),
      (3L, "t9 t10", 2L)))
  }

  test("chunkDocuments rejects stride > chunkSize (tokens would be skipped)") {
    val df = Seq((1L, "a b")).toDF("doc_id", "text")
    intercept[IllegalArgumentException] {
      SamplingOps.chunkDocuments(df, "doc_id", "text", 4, 5)
    }
  }

  test("quantizeInt8: extremes map to +-127, zero vector to zeros") {
    val df = Seq(
      (1L, Seq(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val got = SimilarityOps.quantizeInt8(df, "vec_id", "embedding")
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2), r.getLong(3)))
    // maxAbs = 1.0 -> scale rows: 0.5 -> 64 (floor(63.5+0.5)), -1 -> -127,
    // 0.25 -> 32 (floor(31.75+0.5)), 0 -> 0
    assert(got.toSeq == Seq(
      (1L, 1000000L, "64,-127,32,0", 4L),
      (2L, 0L, "0,0,0,0", 4L)))
  }

  test("sampleToTokenBudget admits top-ordered rows until the group budget") {
    val df = Seq(
      // (id, grp, quality, tokens): quality-desc order is c, b, a
      (1L, "g", 3L, 60L), (2L, "g", 2L, 50L), (3L, "g", 1L, 40L),
      (4L, "h", 9L, 100L), (5L, "h", 8L, 200L)).toDF("id", "grp", "qual", "toks")
    val got = SamplingOps.sampleToTokenBudget(df, "grp", "qual", "id", "toks", 110L)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getLong(4)))
    // g: 60, then 110 (fits exactly), then 150 (over) -> ids 1,2
    // h: 100, then 300 (over) -> id 4
    assert(got.toSeq == Seq((1L, 60L), (2L, 110L), (4L, 100L)))
  }

  test("nfcStripAccents collapses precomposed and combining forms") {
    // "café" precomposed (U+00E9) and with combining acute (e + U+0301)
    val df = Seq(("caf\u00e9", "cafe\u0301")).toDF("pre", "comb")
    val r = df.select(
      TextOps.nfcStripAccents(col("pre")).as("a"),
      TextOps.nfcStripAccents(col("comb")).as("b")).head
    assert(r.getString(0) == "cafe" && r.getString(1) == "cafe")
    // SQL surface
    GraftExtensions.register(spark)
    val sqlR = spark.sql("SELECT graft_nfc_strip_accents('sõb')").head.getString(0)
    assert(sqlR == "sob")
  }

  test("dedupSegmentsWithin keeps first occurrence of each line, preserves order") {
    val df = Seq(
      (1L, "nav\nbody one\nnav\nshare\nbody two\nshare\nfooter"),
      (2L, "only\none of\neach"),
      (3L, "x\nx\nx")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
      TextOps.dedupSegmentsWithin(col("text"), "\n").as("clean"))
      .orderBy("doc_id").collect().map(r => (r.getLong(0), r.getString(1)))
    assert(got.toSeq == Seq(
      (1L, "nav\nbody one\nshare\nbody two\nfooter"),
      (2L, "only\none of\neach"),
      (3L, "x")))
  }

  test("removeBoilerplateSegments drops shared segments, reassembles in order") {
    // segment "b b" appears in 3 docs -> boilerplate at maxDocFreq=2;
    // doc 4 is ONLY boilerplate and must drop out entirely
    val segs = Seq(
      (1L, 0L, "x y"), (1L, 1L, "b b"), (1L, 2L, "z w"),
      (2L, 0L, "b b"), (2L, 1L, "p q"),
      (3L, 0L, "b b"), (3L, 1L, "r s"),
      (4L, 0L, "b b")).toDF("id", "pos", "segment")
    val got = TextOps.removeBoilerplateSegments(segs, maxDocFreq = 2)
      .orderBy("id")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(got.toSeq == Seq(
      (1L, "x y z w", 2L),
      (2L, "p q", 1L),
      (3L, "r s", 1L)))
  }

  test("temperatureRepeats upsamples small groups, capped") {
    // group a: 4 rows (max), b: 2 rows -> factor 2, c: 1 row -> factor 4
    // (ceil(4/1)=4, within cap 4)
    val df = Seq(
      (1L, "a"), (2L, "a"), (3L, "a"), (4L, "a"),
      (5L, "b"), (6L, "b"),
      (7L, "c")).toDF("id", "grp")
    val got = SamplingOps.temperatureRepeats(df, "id", "grp", cap = 4)
    val byId = got.groupBy("id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(byId == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 2L, 6L -> 2L, 7L -> 4L))
    // epochs enumerate 1..factor
    val e7 = got.filter(col("id") === 7L).select("epoch")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(e7 == Seq(1L, 2L, 3L, 4L))
  }

  test("temperatureRepeats keeps NULL-group rows (factor like any group)") {
    val df = Seq((1L, Some("a")), (2L, Some("a")), (3L, None))
      .toDF("id", "grp")
    val got = SamplingOps.temperatureRepeats(df, "id", "grp", cap = 4)
      .groupBy("id").count().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toMap
    // null group has 1 row vs max 2 -> factor 2, not silently dropped
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 2L))
  }

  test("relational decode renames a colliding Kafka timestamp column") {
    import org.apache.spark.sql.types._
    val rowSchema = StructType(Seq(
      StructField("id", LongType), StructField("timestamp", StringType)))
    val df = Seq(
      ("""{"payload":{"after":{"id":1,"timestamp":"t-row"},"op":"c","ts_ms":5}}""", "t-kafka"))
      .toDF("value", "timestamp")
    val out = graft.cdc.Envelope.decodeRelational(df, rowSchema)
    assert(out.columns.count(_ == "timestamp") == 1)
    assert(out.columns.contains("__kafka_timestamp"))
    val r = out.select("timestamp", "__kafka_timestamp").head
    assert(r.getString(0) == "t-row" && r.getString(1) == "t-kafka")
  }

  test("canonicalizeUrl collapses equivalent spellings, preserves path case") {
    val urls = Seq(
      "HTTPS://WWW.Site.COM:443/A/B/?utm_source=x&id=9#frag",
      "https://site.com/A/B?id=9",
      "http://site.com:80/A/B?id=9",       // http default port
      "https://other.com/p?utm_a=1&utm_b=2", // all params are tracking
      "ftp://Host.com:443/x",               // non-http: port kept
      "https://a.com/p?xutm_source=f&id=2", // utm_ INSIDE a name: untouched
      "https://a.com/p?next=utm_x%3D1&id=3", // utm_ inside a value: untouched
      "//cdn.example.com/asset.js",         // protocol-relative: passthrough
      "example.com/plain")                  // schemeless: passthrough
      .toDF("url")
    val got = urls.select(TextOps.canonicalizeUrl(col("url")).as("c"))
      .collect().map(_.getString(0)).toSeq
    assert(got == Seq(
      "https://site.com/A/B?id=9",
      "https://site.com/A/B?id=9",
      "http://site.com/A/B?id=9",
      "https://other.com/p",
      "ftp://host.com:443/x",
      "https://a.com/p?xutm_source=f&id=2",
      "https://a.com/p?next=utm_x%3D1&id=3",
      "//cdn.example.com/asset.js",
      "example.com/plain"))
  }

  test("lengthBucketedBatches fills fixed batches within length buckets") {
    // 5 short docs (bucket 0), 3 long (bucket 1), batchSize 2
    val df = Seq((1L, 10L), (2L, 20L), (3L, 30L), (4L, 40L), (5L, 50L),
      (6L, 300L), (7L, 310L), (8L, 320L)).toDF("id", "toks")
    val got = graft.operators.SamplingOps
      .lengthBucketedBatches(df, "id", "toks", Seq(100L, 250L), 2)
      .orderBy("bucket", "batch_id", "batch_seq")
      .collect().map(r => (r.getLong(0), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 0L), (2L, 0L, 0L, 1L),
      (3L, 0L, 1L, 0L), (4L, 0L, 1L, 1L),
      (5L, 0L, 2L, 0L),                     // short tail batch
      (6L, 2L, 0L, 0L), (7L, 2L, 0L, 1L),   // > 250 -> overflow bucket 2
      (8L, 2L, 1L, 0L)))
  }

  test("distinctiveTerms ranks rare terms above corpus-wide ones") {
    val df = Seq(
      (1L, "shared shared rare1"),
      (2L, "shared shared rare2"),
      (3L, "shared unique3 unique3")).toDF("doc_id", "text")
    val got = TextOps.distinctiveTerms(df, "doc_id", "text", 2)
      .select("id", "term", "rank")
      .orderBy("id", "rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    // doc1: rare1 df=1 tf=1 -> 3000; shared df=3 tf=2 -> 2000
    // doc3: unique3 df=1 tf=2 -> 6000; shared df=3 tf=1 -> 1000
    assert(got.toSeq == Seq(
      (1L, "rare1", 1L), (1L, "shared", 2L),
      (2L, "rare2", 1L), (2L, "shared", 2L),
      (3L, "unique3", 1L), (3L, "shared", 2L)))
  }
}
