package graft.streaming

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.databind.node.ObjectNode

import graft.Constants
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Cross-batch stateful operators (SURVEY §2.4, physical plan 2): the
  * reference's in-memory buffer resets at every flush, so the windowed
  * per-batch dedup covers its semantics — this module is the *extension*
  * that carries last-wins state and TOAST inheritance across micro-batches
  * via the Structured Streaming state store.
  */
object StatefulOps {
  /** Schema-agnostic keyed change row: the payload rides as JSON so one
    * state operator serves every table shape.
    */
  case class KeyedChange(pk: String, off: Long, payload: String, deleted: Boolean)

  private lazy val mapper = new ObjectMapper()

  /** Merge `next` over `prev` field-wise: TOAST-sentinel fields in `next`
    * inherit the previous value (InsertRow's row merge,
    * table_data.go:195-208, but across batches).
    */
  private[graft] def mergePayload(prev: String, next: String): String = {
    try {
      val p = mapper.readTree(prev).asInstanceOf[ObjectNode]
      val n = mapper.readTree(next).asInstanceOf[ObjectNode]
      val out = mapper.createObjectNode()
      // keep all previous fields, overlay next's non-sentinel fields
      p.fields().forEachRemaining { e => out.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, e.getValue); () }
      n.fields().forEachRemaining { e =>
        val v = e.getValue
        val isToast = v.isTextual && v.asText() == Constants.ToastPlaceholder
        if (!isToast || !out.has(e.getKey)) out.set[com.fasterxml.jackson.databind.JsonNode](e.getKey, v)
        ()
      }
      mapper.writeValueAsString(out)
    } catch { case _: Exception => next }
  }

  private def updateKey(ttlMs: Long)(pk: String, rows: Iterator[KeyedChange],
                                     state: GroupState[KeyedChange]): KeyedChange = {
    if (state.hasTimedOut) {
      val last = state.get
      state.remove()
      return last
    }
    val ordered = rows.toSeq.sortBy(_.off)
    var cur = state.getOption.orNull
    ordered.foreach { r =>
      cur =
        if (cur == null || r.off >= cur.off)
          r.copy(payload = if (cur == null) r.payload else mergePayload(cur.payload, r.payload))
        else cur // late/out-of-order event older than state: ignore
    }
    // deleted keys leave the state store (the emitted row still carries the
    // tombstone for the sink); otherwise state would grow with every key
    // ever seen
    if (cur.deleted) state.remove()
    else {
      state.update(cur)
      if (ttlMs > 0) state.setTimeoutDuration(ttlMs)
    }
    cur
  }

  /** Streaming last-wins with cross-batch TOAST inheritance. Emits the
    * current state of every touched key each micro-batch (Update mode).
    * Deleted keys are evicted immediately; `stateTtl` (processing-time)
    * bounds retention for idle keys — 0 disables the timeout.
    */
  def lastWinsStream(ds: Dataset[KeyedChange],
                     stateTtl: java.time.Duration = java.time.Duration.ZERO): Dataset[KeyedChange] = {
    val spark = ds.sparkSession
    import spark.implicits._
    val ttlMs = stateTtl.toMillis
    val timeout =
      if (ttlMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    ds.groupByKey(_.pk)
      .mapGroupsWithState(timeout)(updateKey(ttlMs))
  }

  /** Watermarked windowed aggregation (SURVEY §2.9 — event-time windows
    * are an extension beyond the reference's offset-ordered semantics).
    */
  def windowedCounts(events: DataFrame, tsCol: String,
                     windowLen: String = "1 hour",
                     watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n_events"), col("total_value"))

  /** Watermarked STREAM-STREAM interval join — the attribution primitive
    * (purchase within `horizon` after its click) as Spark's native
    * stream-stream inner join, the one Structured Streaming capability
    * the pipeline's other operators don't exercise. Both sides carry
    * watermarks and the join condition bounds purchase time to
    * [click_time, click_time + horizon], so Spark derives a state
    * eviction bound for BOTH sides (an unbounded-condition stream-stream
    * join would buffer forever — the classic production incident).
    * Output: one row per (click, purchase) pair inside the horizon;
    * events later than their side's watermark drop, exactly like the
    * batch interval join they mirror (`IntervalOps`).
    *
    * Scale shape: state per key is horizon-bounded on both sides; the
    * join is key-partitioned (equi on the join key + range on time), so
    * it shards like any keyed stream at 1000 executors.
    */
  def streamIntervalJoin(clicks: DataFrame, purchases: DataFrame,
                         keyCol: String, clickTsCol: String,
                         purchaseTsCol: String,
                         horizon: String = "1 hour",
                         watermarkDelay: String = "10 minutes"): DataFrame = {
    require(clicks.columns.intersect(purchases.columns).toSeq == Seq(keyCol),
      "sides may share ONLY the join key column; rename the rest upstream")
    val c = clicks.withWatermark(clickTsCol, watermarkDelay)
    val p = purchases.withWatermark(purchaseTsCol, watermarkDelay)
      .withColumnRenamed(keyCol, "__pkey")
    c.join(p, col(keyCol) === col("__pkey") &&
        col(purchaseTsCol) >= col(clickTsCol) &&
        col(purchaseTsCol) <= col(clickTsCol) + expr(s"INTERVAL $horizon"))
      .drop("__pkey")
  }

  /** Streaming exact-dedup admission for corpus ingestion — the streaming
    * counterpart of DedupOps.exactNewDocuments: exactly ONE document per
    * content hash within the watermark horizon passes. Across batches the
    * earlier-arriving copy wins; for duplicates inside one micro-batch the
    * surviving row is whichever the shuffle delivers first (content is
    * identical by definition — only metadata like doc_id/timestamp can
    * differ; pre-aggregate with min_by per hash first if that choice must
    * be deterministic).
    * Built on `dropDuplicatesWithinWatermark`, so the per-key state Spark
    * keeps is bounded by the horizon instead of growing with the corpus
    * (the unbounded-state failure mode of plain dropDuplicates on an
    * infinite stream). Exactly-once admission across the whole history
    * needs the batch path (periodic compaction against the seen-corpus
    * hash index); this operator is the low-latency front gate.
    */
  /** The persistent dedup artifacts key documents by LONG ids; a
    * non-integral id column would `cast("long")` to NULL and silently
    * either black-hole every admission (join matches nothing) or disable
    * dup detection (`id =!= null` filters every hit) — fail at wiring
    * time instead. String ids: pre-hash with `xxhash64(col)` (stable,
    * content-free) before handing the stream to these operators.
    */
  private def requireIntegralId(df: DataFrame, idCol: String, op: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.schema(idCol).dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"$op: id column '$idCol' must be an integral type (the dedup " +
        s"artifacts key by LONG), got ${dt.sql} — a cast would produce NULLs " +
        "and silently mis-admit; pre-hash string ids with xxhash64 first")
  }

  /** Reserved working columns an operator is about to add — present on
    * the input they would be silently clobbered and then dropped.
    */
  private def requireAbsent(df: DataFrame, op: String, cols: String*): Unit =
    cols.foreach(c => require(!df.columns.contains(c),
      s"$op: input must not contain reserved column $c"))

  def streamingNewDocuments(stream: DataFrame, textCol: String,
                            eventTimeCol: String,
                            watermarkDelay: String = "10 minutes"): DataFrame = {
    require(!stream.columns.contains("__content_hash"),
      "streamingNewDocuments: input must not contain reserved column __content_hash")
    stream
      .withColumn("__content_hash", md5(col(textCol).cast("binary")))
      .withWatermark(eventTimeCol, watermarkDelay)
      .dropDuplicatesWithinWatermark("__content_hash")
      .drop("__content_hash")
  }

  /** Streaming NEAR-dup admission — the banded twin of
    * [[streamingNewDocuments]]: exact in-stream dedup first
    * (watermark-bounded state), then each micro-batch is screened against
    * a prebuilt parquet MinHash index
    * ([[graft.operators.DedupOps.buildMinhashIndex]]) and only documents
    * with NO verified near-dup (banded candidates, exact jaccard >= tau)
    * are handed to `sink`. With `growIndex` (default), every admitted
    * batch is appended to the index, so a near-dup of an EARLIER ADMITTED
    * document is rejected in later batches too — the index is the
    * cross-batch state, unbounded by the watermark, shared across
    * restarts and readable by the batch pipelines.
    *
    * The per-batch screen runs inside foreachBatch: a rejected-vs-index
    * decision needs candidate joins plus a batch-minus-rejected anti-join
    * — a shape stream-static joins cannot express without a streaming
    * re-aggregation, while inside foreachBatch it is the plain (and
    * already-tested) batch path. Index hits whose matched id is a member
    * of the CURRENT batch are ignored — that covers self-pairs AND the
    * within-batch near-dup pair an earlier crashed attempt appended: on
    * replay, A would otherwise collide with B's index entry (and B with
    * A's), emptying the admitted set and losing both rows permanently
    * under at-least-once. With the batch-membership screen a replay
    * recomputes exactly attempt 1's admitted set. (Ids are unique and
    * content-stable — the index id contract — so a batch-member hit can
    * only be this batch's own earlier append.) Near-dups WITHIN one
    * micro-batch both pass (the screen is batch-vs-index, as in the
    * batch API); run the periodic self-dedup compaction if that matters.
    * A replayed append re-appends the same docs (duplicate index rows) —
    * benign to every reader (candidates deduplicate), compacted by the
    * same periodic pass. Returns the ready-to-`start()` writer.
    */
  def streamingNovelDocuments(stream: DataFrame, idCol: String, textCol: String,
                              eventTimeCol: String, indexPath: String, tau: Double,
                              watermarkDelay: String = "10 minutes",
                              growIndex: Boolean = true)
                             (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    requireIntegralId(stream, idCol, "streamingNovelDocuments")
    val deduped = streamingNewDocuments(stream, textCol, eventTimeCol, watermarkDelay)
    deduped.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (batch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val admitted = novelAgainstIndex(batch.toDF(), idCol, textCol, indexPath, tau)
        // no-data micro-batches (watermark advancement) append nothing
        if (growIndex && !admitted.isEmpty) {
          graft.operators.DedupOps
            .appendToMinhashIndex(admitted, idCol, textCol, indexPath)
        }
        sink(admitted, batchId)
      }
  }

  /** The per-batch admission screen of [[streamingNovelDocuments]],
    * factored for the replay-semantics spec: index hits whose matched id
    * is a MEMBER of this batch are ignored (self-pairs and within-batch
    * pairs a crashed attempt already appended — see the operator doc),
    * and the result materializes before any index append so admission
    * reads the index as of the batch start.
    */
  private[graft] def novelAgainstIndex(batch: DataFrame, idCol: String,
                                       textCol: String, indexPath: String,
                                       tau: Double): DataFrame = {
    val batchMembers = batch.select(col(idCol).as("ib")).distinct()
    val dupIds = graft.operators.DedupOps
      .joinAgainstMinhashIndex(batch, idCol, textCol, indexPath, tau)
      .join(batchMembers, Seq("ib"), "left_anti")
      .select(col("ia")).distinct()
    batch.join(dupIds, batch(idCol) === col("ia"), "left_anti")
      .localCheckpoint(true)
  }

  /** Streaming gap sessionization: Spark's native `session_window` state
    * operator — sessions per key close `gap` after their last event, and
    * emit (append mode) once the WATERMARK passes the session end, so
    * state is bounded by the watermark horizon plus open sessions. The
    * streaming twin of the batch lag+running-sum sessionization (q32):
    * same gap semantics, but incremental, with late events inside the
    * watermark merging into (or bridging!) existing sessions instead of
    * being recomputed. Output: (key, session_start, session_end,
    * n_events, total_value).
    */
  def streamingSessions(stream: DataFrame, keyCol: String,
                        eventTimeCol: String, valueCol: String,
                        gap: String, watermarkDelay: String): DataFrame =
    stream.withWatermark(eventTimeCol, watermarkDelay)
      .groupBy(col(keyCol), session_window(col(eventTimeCol), gap))
      .agg(count(lit(1)).as("n_events"), sum(col(valueCol)).as("total_value"))
      .select(col(keyCol), col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("n_events"), col("total_value"))

  /** Streaming EXACT-dup admission against the whole ingest history, with
    * the corpus never shuffled: the cross-batch state is a driver-held
    * dense Bloom bitset (mBits/8 bytes — 128 KiB at the default) plus a
    * parquet (id, hash) index at `hashIndexPath`. Per micro-batch:
    * within-batch hash dedup, then the Bloom probe (pure column
    * arithmetic over the broadcast bitset) splits the batch —
    * bloom-negatives admit join-free (no false negatives), positives
    * verify exactly against the hash index via broadcast candidate joins
    * (index side streamed, never shuffled). Admitted hashes append to
    * the index and fold into the driver bitset, so an exact dup of ANY
    * earlier admission — hours or millions of batches ago — is rejected,
    * unbounded by a watermark ([[streamingNewDocuments]] is the
    * watermark-bounded low-latency variant; this is its full-history
    * big sibling, sized by the filter, not the corpus).
    *
    * Replay tolerance (at-least-once): index rows carry the doc id, and
    * a verify hit on the SAME id is ignored, so a replayed batch admits
    * its own rows again instead of rejecting them against their earlier
    * append — the same contract as [[streamingNovelDocuments]]. On
    * restart the bitset reseeds from the index, so driver loss never
    * readmits dups (false negatives are impossible by reconstruction).
    * Size mBits for the expected corpus cardinality: the result stays
    * exact regardless, but an undersized saturated filter sends every
    * row to the verify join.
    */
  def streamingExactNovelDocuments(stream: DataFrame, idCol: String,
                                   textCol: String, hashIndexPath: String,
                                   mBits: Int = 1 << 20, kHashes: Int = 5)
                                  (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(mBits % 64 == 0 && mBits > 0, s"mBits must be a positive multiple of 64, got $mBits")
    requireIntegralId(stream, idCol, "streamingExactNovelDocuments")
    requireAbsent(stream, "streamingExactNovelDocuments", "__h", "__sn", "__might", "__bloom")
    val spark = stream.sparkSession
    val bits = new Array[Long](mBits / 64)
    var indexExists =
      try { spark.read.parquet(hashIndexPath).isEmpty; true }
      catch { case _: org.apache.spark.sql.AnalysisException => false }
    // bit positions key off the md5 CONTENT HASH column `__h` everywhere
    // in this operator (probe, fold, reseed) — the index persists __h,
    // so a restart reconstructs the identical bitset
    def foldWords(df: DataFrame): Unit = df
      .select(explode(array(graft.operators.DedupOps
        .bloomPositions(col("__h"), mBits, kHashes): _*)).as("__p"))
      .select((col("__p") / 64).cast("long").as("__w"),
        call_function("shiftleft", lit(1L), (col("__p") % 64).cast("int")).as("__bit"))
      .groupBy(col("__w")).agg(call_function("bit_or", col("__bit")).as("__word"))
      .collect() // bounded by the FILTER size (mBits/64 rows max)
      .foreach(r => bits(r.getLong(0).toInt) |= r.getLong(1))
    if (indexExists) foldWords(spark.read.parquet(hashIndexPath))
    stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (rawBatch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = rawBatch.sparkSession
        import sp.implicits._
        // within-batch dedup on content: survivors' content is identical
        // by definition, but the surviving ID must be DETERMINISTIC (min
        // id per hash) — a replayed batch then re-selects the same
        // survivor, so the id-aware verify below recognizes its own
        // earlier append and re-admits instead of silently dropping
        val survW = Window.partitionBy(col("__h"))
          .orderBy(col(idCol).cast("long"))
        val batch = rawBatch.toDF()
          .withColumn("__h", md5(col(textCol)))
          .withColumn("__sn", row_number().over(survW))
          .filter(col("__sn") === 1).drop("__sn")
        val bitsDf = Seq(Tuple1(bits.toSeq)).toDF("__bloom")
        val might = graft.operators.DedupOps.bloomMight(col("__h"),
          w => element_at(col("__bloom"), (w + 1).cast("int")), mBits, kHashes)
        val probed = batch.crossJoin(broadcast(bitsDf))
          .withColumn("__might", might).drop("__bloom")
          .localCheckpoint(false)
        val maybe = probed.filter(col("__might")).drop("__might")
        val dupHashes =
          if (indexExists) {
            val cands = maybe
              .select(col("__h"), col(idCol).cast("long").as("__bid")).distinct()
            // id-aware verify: a same-id hit is this batch's own earlier
            // append (replay) and must not reject the row
            sp.read.parquet(hashIndexPath)
              .join(broadcast(cands), Seq("__h"))
              .filter(col("id") =!= col("__bid"))
              .select(col("__h")).distinct()
          } else sp.emptyDataFrame.select(lit("").as("__h")).limit(0)
        val admitted = probed.filter(!col("__might")).drop("__might")
          .unionByName(maybe.join(broadcast(dupHashes), Seq("__h"), "left_anti"))
          // materialize before the append: admission must read the index
          // as of the batch start, never its own append
          .localCheckpoint(true)
        if (!admitted.isEmpty) {
          admitted.select(col("__h"), col(idCol).cast("long").as("id"))
            .write.mode("append").parquet(hashIndexPath)
          indexExists = true
          foldWords(admitted) // batch-bounded driver traffic
        }
        sink(admitted.drop("__h"), batchId)
      }
  }

  /** Streaming NEAR-dup admission against a [[graft.operators.DedupOps.buildDedupGraph]]
    * artifact — the SimHash sibling of [[streamingExactNovelDocuments]]:
    * per micro-batch, reject documents within Hamming `max_dist` (the
    * artifact's parameter) of ANY prior admission, collapse within-batch
    * near-dup components to their min-id canonical, and grow the
    * artifact with exactly the admitted documents, so the next batch —
    * or the next corpus-generation report reading the same graph — sees
    * them. Per-batch cost is batch-proportional: only batch text is
    * hashed; the corpus side contributes its SAVED signatures through
    * the pigeonhole chunk join (never a corpus re-hash, never a corpus
    * shuffle beyond the bounded collision candidates).
    *
    * Admission policy is component-canonical (deterministic): a batch
    * doc is admitted iff it has no cross-corpus collision AND it is the
    * minimum id of its within-batch near-dup component among
    * corpus-clean docs. Transitive within-batch near-dups are rejected
    * with their component — the conservative arm, consistent with the
    * graph's own transitive component semantics.
    *
    * Replay tolerance (at-least-once): the corpus probe ignores same-id
    * hits, so a replayed batch matches its own earlier signature append
    * and re-admits the identical set (the within-batch half is a pure
    * function of the batch); the artifact append is replay-safe by the
    * graph readers' row-dedup contract. The artifact at `graphPath`
    * must exist ([[graft.operators.DedupOps.buildDedupGraph]], possibly
    * over an empty corpus) — the meta table carries max_dist. Ids must
    * be unique and content-stable across the stream's lifetime (the
    * artifact's id contract): replaying the same content under the same
    * id is safe; reusing an id for NEW content corrupts the graph.
    */
  def streamingNearDupAdmission(stream: DataFrame, idCol: String,
                                textCol: String, graphPath: String)
                               (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.DedupOps
    requireIntegralId(stream, idCol, "streamingNearDupAdmission")
    stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (rawBatch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val batch = rawBatch.toDF()
        val admitted = nearDupScreen(batch, idCol, textCol, graphPath)
          .localCheckpoint(true) // materialize before the artifact grows
        if (!admitted.isEmpty)
          DedupOps.appendToDedupGraph(admitted, idCol, textCol, graphPath)
        sink(admitted, batchId)
      }
  }

  /** The probe half of [[streamingNearDupAdmission]], factored so the
    * curation funnel can screen WITHOUT growing the artifact (the funnel
    * appends only its final post-budget admissions): returns the subset
    * of `batch` that has no cross-corpus SimHash collision (id-aware —
    * same-id hits are a replayed batch's own earlier append) and is the
    * min-id canonical of its within-batch near-dup component.
    */
  private def nearDupScreen(batch: DataFrame, idCol: String, textCol: String,
                            graphPath: String): DataFrame = {
    import graft.operators.DedupOps
    val sp = batch.sparkSession
    val maxDist = sp.read.parquet(s"$graphPath/meta").head().getInt(0)
    // eager: three consumers below, and the probe must see the
    // artifact as of the batch START, never its own append
    val batchSigs = DedupOps.simhashFp30(batch, idCol, textCol)
      .localCheckpoint(true)
    // tombstone-aware: a taken-down doc must stop blocking admissions
    val corpusSigs = DedupOps.dedupGraphSigs(sp, graphPath)
    val corpusHit = DedupOps.crossSigCollisions(batchSigs, corpusSigs, maxDist)
      .filter(col("bid") =!= col("cid"))
      .select(col("bid").as("id")).distinct()
    val cleanSigs = batchSigs.join(corpusHit, Seq("id"), "left_anti")
      .localCheckpoint(false) // pair join consumes twice + component spine
    val comps = DedupOps.nearDupGroupsStar(cleanSigs.select(col("id")), "id",
      DedupOps.simhashExactPairsFromSigs(cleanSigs, maxDist))
    val admittedIds = comps.filter(col("id") === col("canonical_id"))
      .select(col("id").as("__adm"))
    batch.join(admittedIds, batch(idCol).cast("long") === col("__adm"))
      .drop("__adm")
  }

  /** The composed streaming curation funnel — the batch pipeline (q73:
    * exact dedup -> near-dup canonical -> quality gate -> per-language
    * token budget) as ONE `foreachBatch` admission stream. Stages run as
    * probes first; the three persistent artifacts grow with the FINAL
    * admitted set only, so a document rejected by a later stage (budget)
    * is not black-holed by an earlier stage's index and may be admitted
    * if its content arrives again when budget remains:
    *
    *  1. exact: deterministic within-batch min-id survivor per content
    *     hash, then id-aware verify against the (__h, id) parquet hash
    *     index (same index layout as [[streamingExactNovelDocuments]];
    *     that operator's Bloom-bitset prefilter is the drop-in scale
    *     path — the funnel keeps the exact broadcast verify, which the
    *     Bloom variant also ends in);
    *  2. near-dup: [[nearDupScreen]] against the
    *     [[graft.operators.DedupOps.buildDedupGraph]] artifact at
    *     `graphPath` (must exist, possibly over an empty corpus; its
    *     meta carries the Hamming threshold);
    *  3. quality: row-local [[graft.operators.TextOps.qualityScore]]
    *     >= `minQuality`;
    *  4. budget: per-language token budget, best-quality-first within
    *     the batch (quality DESC, id — the q73 ordering), against the
    *     cross-batch ledger parquet at `ledgerPath` holding one
    *     (id, lang, n_tokens) row per prior admission.
    *
    * On a single batch over a whole corpus this is row-for-row the batch
    * funnel (the spec pins it against the composed batch operators).
    * Across batches admission is first-arrival-wins: earlier batches
    * consume budget and own near-dup canonicals that a global batch run
    * might have assigned to later, higher-quality arrivals — the
    * inherent streaming-curation trade-off, not a defect.
    *
    * Replay tolerance (at-least-once): every cross-batch probe is
    * id-aware (exact verify ignores same-id index hits; the near-dup
    * probe ignores same-id signature hits; the ledger's prior-spend
    * excludes the replayed batch's own ids and deduplicates rows by id),
    * so a replayed batch recomputes the identical admitted set and
    * re-emits it, and artifact re-appends are idempotent to every
    * reader. Ids must be unique and content-stable across the stream's
    * lifetime (the artifacts' id contract).
    *
    * Scale shape: per-batch cost is batch-proportional — batch-side
    * hashing only, broadcast verifies against streamed index relations,
    * corpus never shuffled; the ledger prior-spend aggregate is
    * languages-sized. Emitted rows carry the input columns plus
    * `quality` and `n_tokens`.
    */
  def streamingCurationFunnel(stream: DataFrame, idCol: String,
                              textCol: String, langCol: String,
                              nCharsCol: String, hashIndexPath: String,
                              graphPath: String, ledgerPath: String,
                              minQuality: Long, tokenBudgetPerLang: Long)
                             (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.{DedupOps, TextOps}
    require(tokenBudgetPerLang > 0, s"budget must be positive, got $tokenBudgetPerLang")
    requireIntegralId(stream, idCol, "streamingCurationFunnel")
    requireAbsent(stream, "streamingCurationFunnel", "__h", "__sn", "quality", "n_tokens")
    def tableOrNone(sp: SparkSession, path: String): Option[DataFrame] =
      try Some(sp.read.parquet(path))
      catch { case _: org.apache.spark.sql.AnalysisException => None }
    stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (rawBatch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = rawBatch.sparkSession
        // -- 1. exact screen
        val survW = Window.partitionBy(col("__h")).orderBy(col(idCol).cast("long"))
        val batch = rawBatch.toDF()
          .withColumn("__h", md5(col(textCol)))
          .withColumn("__sn", row_number().over(survW))
          .filter(col("__sn") === 1).drop("__sn")
        val exact = tableOrNone(sp, hashIndexPath) match {
          case Some(idx) =>
            val cands = batch
              .select(col("__h"), col(idCol).cast("long").as("__bid")).distinct()
            val dup = idx.join(broadcast(cands), Seq("__h"))
              .filter(col("id") =!= col("__bid"))
              .select(col("__h")).distinct()
            batch.join(broadcast(dup), Seq("__h"), "left_anti")
          case None => batch
        }
        // -- 2. near-dup screen (probe only)
        val near = nearDupScreen(exact, idCol, textCol, graphPath)
        // -- 3. quality gate + token count (row-local)
        val qual = near
          .withColumn("quality", TextOps.qualityScore(col(textCol), col(nCharsCol)))
          .filter(col("quality") >= minQuality)
          .withColumn("n_tokens", TextOps.wordCount(col(textCol)).cast("long"))
        // -- 4. per-language budget vs the cross-batch ledger
        val batchIds = qual.select(col(idCol).cast("long").as("id")).distinct()
        val prior = tableOrNone(sp, ledgerPath) match {
          case Some(led) => led
            .dropDuplicates("id") // replay re-appends are identical rows
            .join(broadcast(batchIds), Seq("id"), "left_anti")
            .groupBy(col("lang").as("__plang"))
            .agg(sum(col("n_tokens")).as("__prior"))
          case None => sp.emptyDataFrame
            .select(lit("").as("__plang"), lit(0L).as("__prior")).limit(0)
        }
        val budW = Window.partitionBy(col(langCol))
          .orderBy(col("quality").desc, col(idCol).cast("long"))
        val admitted = qual
          .join(broadcast(prior), col(langCol) === col("__plang"), "left")
          .withColumn("__cum", sum(col("n_tokens")).over(budW))
          .filter(coalesce(col("__prior"), lit(0L)) + col("__cum") <= tokenBudgetPerLang)
          .drop("__plang", "__prior", "__cum")
          // materialize before ANY artifact grows: every probe above must
          // have seen artifact state as of the batch start
          .localCheckpoint(true)
        if (!admitted.isEmpty) {
          admitted.select(col("__h"), col(idCol).cast("long").as("id"))
            .write.mode("append").parquet(hashIndexPath)
          DedupOps.appendToDedupGraph(admitted, idCol, textCol, graphPath)
          admitted.select(col(idCol).cast("long").as("id"),
            col(langCol).as("lang"), col("n_tokens"))
            .write.mode("append").parquet(ledgerPath)
        }
        sink(admitted.drop("__h"), batchId)
      }
  }

  /** SQL-MERGE sink for [[streamingCurationFunnel]] — the composition of
    * the two round-8 flagships: each batch's ADMITTED documents MERGE
    * into a live catalog corpus table through the reference's production
    * statement text ([[graft.sink.MergeSqlBuilder.buildMerge]] executed
    * by the DSv2 row-level-ops catalog), not the frame-level path. The
    * session must have a GraftCatalog registered under the table's
    * catalog name (`spark.sql.catalog.<name>` conf).
    *
    * Replay contract: checkpoint-replay idempotent END TO END — the
    * funnel's id-aware probes re-admit a replayed batch's identical
    * subset, and the MERGE's PK arms rewrite those rows to the same
    * values (matched-update is idempotent; nothing double-inserts). The
    * staging view is batch-id-suffixed so a restarted driver's dangling
    * view never collides.
    *
    * Table schema: (id BIGINT, lang STRING, text STRING, quality BIGINT,
    * n_tokens BIGINT, `__artie_delete` BOOLEAN), created on first batch.
    */
  def curationMergeSink(table: String, idCol: String, textCol: String,
                        langCol: String): (DataFrame, Long) => Unit = {
    import graft.sink.MergeSqlBuilder
    (admitted: DataFrame, batchId: Long) => {
      if (!admitted.isEmpty) {
        val sp = admitted.sparkSession
        sp.sql(MergeSqlBuilder.buildCreateTable(table, Seq(
          "id" -> "BIGINT", "lang" -> "STRING", "text" -> "STRING",
          "quality" -> "BIGINT", "n_tokens" -> "BIGINT",
          graft.Constants.DeleteCol -> "BOOLEAN")))
        // the staging view name carries the TARGET TABLE, not just the
        // batch id: two concurrent funnels on one SparkSession reaching
        // the same batch id would otherwise cross-merge each other's
        // staged rows through the shared session-global view namespace
        val stg = ("stg_curation_" + table + "_b" + batchId)
          .replaceAll("[^A-Za-z0-9_]", "_")
        admitted.select(col(idCol).cast("long").as("id"),
            col(langCol).as("lang"), col(textCol).as("text"),
            col("quality"), col("n_tokens"),
            lit(false).as(graft.Constants.DeleteCol))
          .createOrReplaceTempView(stg)
        try sp.sql(MergeSqlBuilder.buildMerge(table, stg, Seq("id"),
          Seq("id", "lang", "text", "quality", "n_tokens", graft.Constants.DeleteCol),
          softDelete = false))
        finally { sp.catalog.dropTempView(stg); () } // no leak on merge failure
        ()
      }
    }
  }

  /** A keyed event entering the rate limiter (event-time millis). */
  case class RateEvent(key: String, ts: Long, id: Long)

  /** The limiter's verdict — every input event is emitted, tagged. */
  case class RateDecision(key: String, ts: Long, id: Long, admitted: Boolean)

  private[graft] case class BucketState(tokens: Long, lastRefill: Long)

  private def bucketUpdate(rate: Long, periodMs: Long, burst: Long,
                           maxClockJumpMs: Long)
                          (key: String, rows: Iterator[RateEvent],
                           state: GroupState[BucketState]): Iterator[RateDecision] = {
    val ordered = rows.toSeq.sortBy(r => (r.ts, r.id))
    var st = state.getOption.getOrElse(
      BucketState(burst, if (ordered.isEmpty) 0L else ordered.head.ts))
    // beyond this many periods the bucket is full regardless — capping
    // BEFORE the multiply keeps periods*rate inside Long for a far-future
    // timestamp (year-3000 millis would otherwise overflow to negative
    // tokens through math.min)
    val fullPeriods = burst / math.max(rate, 1L) + 1L
    val out = ordered.map { r =>
      val periods = math.max(0L, (r.ts - st.lastRefill) / periodMs)
      // corrupt-clock guard: one producer with a far-future timestamp
      // would permanently advance lastRefill, starving every real event
      // behind it until event time catches up (years). A jump past
      // maxClockJumpMs refills in full but re-anchors the clock at the
      // event instead of advancing past it — the key self-heals on the
      // next sane event. Long.MaxValue (the default) disables the guard.
      val jumped = maxClockJumpMs != Long.MaxValue &&
        periods > 0 && (r.ts - st.lastRefill) > maxClockJumpMs
      if (periods > 0) st = BucketState(
        math.min(burst, st.tokens + math.min(periods, fullPeriods) * rate),
        if (jumped) st.lastRefill else st.lastRefill + periods * periodMs)
      val admitted = st.tokens > 0
      if (admitted) st = st.copy(tokens = st.tokens - 1)
      RateDecision(r.key, r.ts, r.id, admitted)
    }
    state.update(st)
    out.iterator
  }

  /** Per-key token-bucket admission screen: each key refills `rate`
    * tokens per `periodMs` of EVENT time (deterministic — no wall
    * clock), capped at `burst`; an event is admitted iff a token is
    * available. State is two longs per key regardless of traffic — the
    * bounded backpressure gate in front of an expensive per-event stage
    * (codec decode, external sink call; the reference throttles its
    * flush loop the same way, but against wall time). Every event is
    * emitted with its verdict so the caller routes admitted/rejected
    * without a second pass. Within a batch events apply in (ts, id)
    * order; across batches the bucket state carries in the state store.
    *
    * `maxClockJumpMs` guards the event-time clock against one corrupt
    * far-future producer timestamp: a jump past it refills the bucket
    * but does NOT advance the refill clock, so the key self-heals on the
    * next sane event instead of rejecting everything until event time
    * catches up (default disabled — a legitimate fast-forward and a
    * corrupt clock are indistinguishable, so opting in is a policy call).
    */
  def rateLimitStream(ds: Dataset[RateEvent], rate: Long, periodMs: Long,
                      burst: Long,
                      maxClockJumpMs: Long = Long.MaxValue): Dataset[RateDecision] = {
    require(rate > 0 && periodMs > 0 && burst > 0,
      s"rate/period/burst must be positive, got $rate/$periodMs/$burst")
    require(maxClockJumpMs > 0, s"maxClockJumpMs must be positive, got $maxClockJumpMs")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        bucketUpdate(rate, periodMs, burst, maxClockJumpMs))
  }

  /** One arrival for the streaming disorder monitor: `arr` is the
    * delivery order within the key (log offset), `t` the event time.
    */
  case class ArrivalEvent(key: String, arr: Long, t: Long)

  /** Per-event lateness readout: how far `t` sits behind the running
    * per-key event-time maximum at delivery, with the decimal-magnitude
    * bucket of [[graft.operators.TemporalOps.disorderProfile]].
    */
  case class LatenessRow(key: String, arr: Long, late: Long, bucket: Long)

  private def disorderUpdate(key: String, rows: Iterator[ArrivalEvent],
                             state: GroupState[Long]): Iterator[LatenessRow] = {
    var mx = state.getOption.getOrElse(Long.MinValue)
    // per-key per-batch rows are delivery-bounded; sort restores arrival
    // order within the batch (Spark does not guarantee iterator order)
    val out = rows.toVector.sortBy(_.arr).map { r =>
      val late = if (mx == Long.MinValue || r.t >= mx) 0L else mx - r.t
      if (r.t > mx) mx = r.t
      val bucket = if (late == 0L) 0L else late.toString.length.toLong
      LatenessRow(r.key, r.arr, late, bucket)
    }
    state.update(mx)
    out.iterator
  }

  /** Streaming twin of [[graft.operators.TemporalOps.disorderProfile]]:
    * per-key running event-time maximum carried in 8 bytes of state
    * forever, each arriving event emitted with its lateness and
    * magnitude bucket — the live watermark-sizing monitor (aggregate
    * the emitted rows by bucket downstream for the running histogram).
    * The spec pins streaming end-state ≡ the batch profile on the same
    * data, including across-batch splits.
    *
    * Replay contract: the running-max STATE is idempotent (max merges
    * freely), so a replayed batch re-emits the same lateness rows —
    * downstream histogram consumers dedupe by (key, arr) for exact
    * counts under at-least-once delivery.
    */
  def streamingDisorderProfile(ds: Dataset[ArrivalEvent]): Dataset[LatenessRow] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        disorderUpdate)
  }

  /** One interval for the streaming coverage tracker. */
  case class CoverageEvent(key: String, s: Long, e: Long)

  /** Running coverage readout after each batch. */
  case class CoverageReadout(key: String, n_intervals: Long, n_islands: Long,
                             covered: Long)

  private[graft] case class CoverageState(curS: Long, curE: Long,
                                          closedCovered: Long,
                                          closedIslands: Long, n: Long)

  private def coverageUpdate(key: String, rows: Iterator[CoverageEvent],
                             state: GroupState[CoverageState])
      : Iterator[CoverageReadout] = {
    var st = state.getOption.orNull
    // same delivery contract as streamingTwap: per-key nondecreasing
    // interval STARTS across batches (within-batch order restored here)
    rows.toVector.sortBy(r => (r.s, r.e)).foreach { r =>
      st = if (st == null) CoverageState(r.s, r.e, 0L, 0L, 1L)
      else if (r.s > st.curE) // gap: the open island closes
        CoverageState(r.s, r.e, st.closedCovered + (st.curE - st.curS),
          st.closedIslands + 1L, st.n + 1L)
      else
        CoverageState(st.curS, math.max(st.curE, r.e), st.closedCovered,
          st.closedIslands, st.n + 1L)
    }
    state.update(st)
    Iterator.single(CoverageReadout(key, st.n, st.closedIslands + 1L,
      st.closedCovered + (st.curE - st.curS)))
  }

  /** Streaming twin of
    * [[graft.operators.TemporalOps.intervalUnionLength]]: five longs of
    * state per key carry the open island + closed totals across batches;
    * every batch emits the running (n_intervals, n_islands, covered)
    * readout including the still-open island. The spec pins the final
    * readout ≡ the batch operator, including a mid-island batch split.
    *
    * Replay contract: same as [[streamingTwap]] — interval accumulation
    * is not idempotent under at-least-once replay (n_intervals inflates;
    * covered stays correct only for fully-contained re-deliveries).
    * Exactly-once checkpointing or upstream (key, s, e) dedup required.
    */
  def streamingCoverage(ds: Dataset[CoverageEvent]): Dataset[CoverageReadout] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        coverageUpdate)
  }

  /** One observation for the streaming time-weighted average. */
  case class TwapEvent(key: String, t: Long, v: Long)

  /** Running TWAP readout, refreshed every batch once a span exists. */
  case class TwapReadout(key: String, n_points: Long, span: Long, twap: Long)

  private[graft] case class TwapState(firstT: Long, lastT: Long, lastV: Long,
                                      area: Long, n: Long)

  private def twapUpdate(key: String, rows: Iterator[TwapEvent],
                         state: GroupState[TwapState]): Iterator[TwapReadout] = {
    var st = state.getOption.orNull
    // sort restores event-time order within the batch; ACROSS batches the
    // stream must deliver per-key nondecreasing t (gate with a watermark
    // sized from the disorder profile upstream) — a late cross-batch
    // event would retro-change an already-integrated segment
    rows.toVector.sortBy(r => (r.t, r.v)).foreach { r =>
      st = if (st == null) TwapState(r.t, r.t, r.v, 0L, 1L)
      else TwapState(st.firstT, r.t, r.v,
        st.area + st.lastV * (r.t - st.lastT), st.n + 1L)
    }
    state.update(st)
    val span = st.lastT - st.firstT
    if (span > 0L) Iterator.single(TwapReadout(key, st.n, span, st.area / span))
    else Iterator.empty
  }

  /** Streaming twin of [[graft.operators.TemporalOps.timeWeightedAverage]]:
    * five longs of state per key carry the piecewise-constant integral
    * across batches; every batch emits the running (n_points, span,
    * twap) readout once the key has a span. The spec pins the final
    * readout ≡ the batch operator on the same data, including a
    * mid-key batch split.
    *
    * Replay contract: integration is NOT idempotent — an at-least-once
    * replay of a delivered batch double-integrates its segments (unlike
    * the register-max sketches, which replay freely). Run behind an
    * exactly-once source/checkpoint pair, or dedupe by (key, t) upstream.
    *
    * Tie convention: same-t observations order by (t, v) — the VALUE is
    * the tie-break, where the batch operator lets the caller pick a
    * `tieCol`. The batch-equivalence claim therefore holds verbatim only
    * when the batch side ties by value too (or when ties carry equal
    * values); a caller needing a different tie key must fold it into
    * `v` or pre-dedupe (key, t) upstream.
    */
  def streamingTwap(ds: Dataset[TwapEvent]): Dataset[TwapReadout] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        twapUpdate)
  }

  /** One observation for the streaming CUSUM drift monitor. */
  case class DriftEvent(key: String, t: Long, v: Long)

  /** Running drift readout, refreshed every batch; `first_alarm_t` is
    * None until the CUSUM statistic first crosses the threshold.
    */
  case class DriftReadout(key: String, n_points: Long, max_cusum: Long,
                          first_alarm_t: Option[Long])

  /** Five longs per key: running deviation prefix, its clamped minimum,
    * the max CUSUM statistic, the first alarm time (MinValue sentinel =
    * none), and the observation count.
    */
  private[graft] case class CusumState(p: Long, minP: Long, maxS: Long,
                                       firstAlarmT: Long, n: Long)

  private def cusumUpdate(target: Long, slack: Long, threshold: Long)(
      key: String, rows: Iterator[DriftEvent],
      state: GroupState[CusumState]): Iterator[DriftReadout] = {
    var st = state.getOption.getOrElse(CusumState(0L, 0L, 0L, Long.MinValue, 0L))
    // same (t, v) tie rule as streamingTwap; cross-batch t must be
    // per-key nondecreasing (watermark-gate upstream)
    rows.toVector.sortBy(r => (r.t, r.v)).foreach { r =>
      val p = st.p + (r.v - target - slack)
      val minP = math.min(st.minP, p) // starts at 0 == batch least(0, min P)
      val s = p - minP
      val alarmT =
        if (st.firstAlarmT != Long.MinValue) st.firstAlarmT
        else if (s >= threshold) r.t
        else Long.MinValue
      st = CusumState(p, minP, math.max(st.maxS, s), alarmT, st.n + 1L)
    }
    state.update(st)
    Iterator.single(DriftReadout(key, st.n, st.maxS,
      if (st.firstAlarmT == Long.MinValue) None else Some(st.firstAlarmT)))
  }

  /** Streaming twin of [[graft.operators.TemporalOps.cusumAlarms]] — the
    * one-sided Page CUSUM level-shift detector as a live monitor: five
    * longs of state per key, every batch emits the running
    * (n_points, max_cusum, first_alarm_t) readout, bit-identical to the
    * batch closed form on the same data (the spec pins parity including
    * a mid-key batch split). `target`/`slack`/`threshold` are fixed
    * integer parameters in v's units, frozen from a reference period —
    * the standard deployment (batch calibrates, the stream monitors).
    *
    * Replay contract: prefix accumulation is NOT idempotent — run
    * behind an exactly-once checkpoint or dedupe (key, t) upstream
    * (same contract as [[streamingTwap]]). In-batch ties order (t, v).
    */
  def streamingCusumDrift(ds: Dataset[DriftEvent], target: Long, slack: Long,
                          threshold: Long): Dataset[DriftReadout] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        cusumUpdate(target, slack, threshold))
  }

  /** One keyed smoothing observation. */
  case class EwmaEvent(key: String, t: Long, v: Long)

  /** Running smoothed readout: points seen, smoothed value scaled by
    * alphaDen (same units as [[graft.operators.TemporalOps.ewmaSeries]]'s
    * `e` column).
    */
  case class EwmaReadout(key: String, n_points: Long, e: Long)

  private[graft] case class EwmaState(e: Long, n: Long)

  private def ewmaUpdate(alphaDen: Long)(key: String, rows: Iterator[EwmaEvent],
      state: GroupState[EwmaState]): Iterator[EwmaReadout] = {
    var st = state.getOption.getOrElse(EwmaState(0L, 0L))
    // same (t, v) tie rule as streamingTwap; cross-batch t must be
    // per-key nondecreasing (watermark-gate upstream)
    rows.toVector.sortBy(r => (r.t, r.v)).foreach { r =>
      val v8 = r.v * alphaDen
      st =
        if (st.n == 0L) EwmaState(v8, 1L)
        else {
          val dev = v8 - st.e
          // floor division via explicit pmod — the batch operator's
          // exact step, so truncation-vs-floor can never diverge on
          // negative deviations
          val fd = (dev - (((dev % alphaDen) + alphaDen) % alphaDen)) / alphaDen
          EwmaState(st.e + fd, st.n + 1L)
        }
    }
    state.update(st)
    Iterator.single(EwmaReadout(key, st.n, st.e))
  }

  /** Streaming twin of [[graft.operators.TemporalOps.ewmaSeries]] — the
    * integer EWMA smoother as a live monitor: two longs of state per
    * key, every batch emits the running (n_points, e) readout,
    * bit-identical to the batch fold's LAST row on the same data (the
    * spec pins parity including a mid-key batch split and negative
    * deviations). α = 1/alphaDen, e scaled by alphaDen.
    *
    * Replay contract: prefix accumulation is NOT idempotent — run
    * behind an exactly-once checkpoint or dedupe (key, t) upstream
    * (same contract as [[streamingTwap]]). In-batch ties order (t, v).
    */
  def streamingEwma(ds: Dataset[EwmaEvent], alphaDen: Long = 8L): Dataset[EwmaReadout] = {
    require(alphaDen >= 2L, s"need alphaDen >= 2, got $alphaDen")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        ewmaUpdate(alphaDen))
  }

  /** One keyed observation for the streaming quantile sketch. */
  case class QuantEvent(key: String, v: Long)

  /** Running per-key quantile readout, refreshed every batch. */
  case class QuantReadout(key: String, n: Long, n_tuples: Long,
                          p50: Long, p95: Long, p99: Long)

  /** One Greenwald-Khanna summary tuple: value, rank-gap g, uncertainty
    * delta (rmin_i = Σ g_j for j <= i; rmax_i = rmin_i + d_i).
    */
  private[graft] case class GkTuple(v: Long, g: Long, d: Long)

  private[graft] case class GkState(tuples: Array[GkTuple], n: Long)

  private def gkTwoEpsN(epsPm: Long, n: Long): Long = 2L * epsPm * n / 1000L

  private[graft] def gkInsert(ts: Vector[GkTuple], v: Long,
                              twoEpsN: Long): Vector[GkTuple] =
    if (ts.isEmpty || v < ts.head.v) GkTuple(v, 1L, 0L) +: ts
    else if (v >= ts.last.v) ts :+ GkTuple(v, 1L, 0L)
    else {
      val i = ts.indexWhere(_.v > v)
      (ts.take(i) :+ GkTuple(v, 1L, math.max(0L, twoEpsN - 1L))) ++ ts.drop(i)
    }

  /** Right-to-left GK compress: merge tuple i into its right neighbor
    * while the band fits, never touching the extremes — deterministic
    * because the sweep order is fixed.
    */
  private[graft] def gkCompress(ts: Vector[GkTuple], twoEpsN: Long): Vector[GkTuple] = {
    if (ts.size <= 2) return ts
    val buf = ts.toBuffer
    var i = buf.size - 2
    while (i >= 1) {
      val a = buf(i); val b = buf(i + 1)
      if (a.g + b.g + b.d <= twoEpsN) {
        buf.remove(i)
        buf(i) = GkTuple(b.v, a.g + b.g, b.d)
      }
      i -= 1
    }
    buf.toVector
  }

  /** Rank query: first tuple whose rmin reaches the ceil-rank target —
    * within the GK invariant every g_i + d_i <= 2εn, so the returned
    * value's true rank is within 2εn of the target (the bound the spec
    * asserts). Exact while n is small enough that no compression ran.
    */
  private[graft] def gkQuery(ts: Vector[GkTuple], n: Long, phiPm: Long): Long = {
    val r = math.max(1L, (phiPm * n + 999L) / 1000L)
    var rmin = 0L
    var i = 0
    while (i < ts.size - 1) {
      rmin += ts(i).g
      if (rmin >= r) return ts(i).v
      i += 1
    }
    ts.last.v
  }

  private def gkUpdate(epsPm: Long)(key: String, rows: Iterator[QuantEvent],
                                    state: GroupState[GkState]): Iterator[QuantReadout] = {
    val st = state.getOption.getOrElse(GkState(Array.empty, 0L))
    var ts = st.tuples.toVector
    var n = st.n
    // sorted insertion order makes the summary a pure function of the
    // batch CONTENTS, independent of shuffle arrival order
    rows.toVector.map(_.v).sorted.foreach { v =>
      ts = gkInsert(ts, v, gkTwoEpsN(epsPm, n))
      n += 1L
    }
    ts = gkCompress(ts, gkTwoEpsN(epsPm, n))
    state.update(GkState(ts.toArray, n))
    if (n == 0L) Iterator.empty
    else Iterator.single(QuantReadout(key, n, ts.size.toLong,
      gkQuery(ts, n, 500L), gkQuery(ts, n, 950L), gkQuery(ts, n, 990L)))
  }

  /** Streaming ε-approximate quantiles per key (Greenwald & Khanna
    * 2001): O((1/ε)·log(εn)) summary tuples of state per key — the
    * live p50/p95/p99 latency/lateness monitor that never stores the
    * observations. `epsPm` is ε in permille (10 = 1%); every batch
    * emits the running readout with ranks guaranteed within 2εn of the
    * ceil-rank target, and the summary is a pure function of the
    * delivered batch contents (in-batch arrival order never matters).
    * Exact until compression first kicks in (~n > 500/epsPm).
    *
    * Replay contract: counts and gaps accumulate — NOT idempotent under
    * at-least-once replay; exactly-once checkpointing or upstream
    * (key, event) dedup required (same contract as [[streamingTwap]]).
    */
  def streamingQuantiles(ds: Dataset[QuantEvent], epsPm: Long): Dataset[QuantReadout] = {
    require(epsPm >= 1L && epsPm <= 200L, s"need 1 <= epsPm <= 200, got $epsPm")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        gkUpdate(epsPm))
  }

  /** A keyed value entering the streaming cardinality sketch. */
  case class HllEvent(key: String, value: String)

  /** Running per-key cardinality readout, refreshed every batch. */
  case class HllEstimate(key: String, n_values: Long, hll_est: Long)

  /** 64 register maxima + the exact input-row count (the same contract
    * as the batch sketch's n_values).
    */
  private[graft] case class HllRegisters(regs: Array[Int], n: Long)

  private val HllP = 1000000007L
  private val HllW = 25

  /** The EXACT register math of [[graft.operators.SketchOps.hllDistinct]]
    * on the JVM side: finalizer, squaring remix, mod-64 register,
    * trailing-zeros+1 rank. Keeping the two in lockstep is the point —
    * the spec pins streaming end-state == batch sketch on the same data.
    */
  private[graft] def hllRegisterRank(value: String): (Int, Int) = {
    val fp = graft.functions.DebeziumCodec.fingerprint64(
      org.apache.spark.unsafe.types.UTF8String.fromString(value))
    val mixed = Math.floorMod(636413622L * fp + 528402381L, HllP)
    val h = Math.floorMod(mixed * mixed + 1L, HllP)
    val w = h / 64L
    val rank = if (w == 0L) HllW else java.lang.Long.numberOfTrailingZeros(w) + 1
    ((h % 64L).toInt, rank)
  }

  private[graft] def hllEstimate(regs: Array[Int]): Long = {
    var s = 0L
    var i = 0
    while (i < 64) { s += 1L << (HllW - regs(i)); i += 1 }
    (709L * 64 * 64 * (1L << HllW)) / (1000L * s)
  }

  private def hllUpdate(key: String, rows: Iterator[HllEvent],
                        state: GroupState[HllRegisters]): HllEstimate = {
    val st = state.getOption.getOrElse(HllRegisters(new Array[Int](64), 0L))
    var n = st.n
    rows.foreach { r =>
      val (reg, rank) = hllRegisterRank(r.value)
      if (rank > st.regs(reg)) st.regs(reg) = rank
      n += 1
    }
    val next = HllRegisters(st.regs, n)
    state.update(next)
    HllEstimate(key, n, hllEstimate(next.regs))
  }

  /** Streaming distinct-cardinality per key — the
    * [[graft.operators.SketchOps.hllDistinct]] sketch carried in the
    * state store: 64 register bytes + one count per key FOREVER, no
    * matter how many values stream through (the "distinct users per
    * tenant, updated every batch" query that an exact streaming distinct
    * cannot answer at 100 TB without unbounded state). Update-mode
    * emission: every batch re-emits the refreshed estimate for keys it
    * touched. Register maxima are monotone, so at-least-once replays are
    * absorbed by construction (same values -> same maxima); only
    * n_values (a diagnostic, not the estimate) counts replayed rows
    * twice. Run with `[[UpdateMode]]`.
    */
  def streamingHllDistinct(ds: Dataset[HllEvent]): Dataset[HllEstimate] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(hllUpdate)
  }

  /** One observation entering the streaming KMV distinct sketch. */
  case class KmvEvent(key: String, value: String)

  /** Running KMV readout: `distinct_est` is the batch estimator's exact
    * formula over the current min-k state.
    */
  case class KmvReadout(key: String, n_values: Long, distinct_est: Double)

  private[graft] case class KmvState(hs: Vector[Double], n: Long)

  /** The SAME normalized hash as
    * [[graft.operators.SketchOps.normalizedHash]] (fingerprint → affine
    * mix mod p → (mixed+1)/p), evaluated scalar-side — one double
    * division, bit-identical to the Column path.
    */
  private[graft] def kmvNormHash(value: String): Double = {
    val p = 1000000007L
    val fp = graft.functions.DebeziumCodec.fingerprint64(
      org.apache.spark.unsafe.types.UTF8String.fromString(value))
    val mixed = Math.floorMod(636413622L * fp + 528402381L, p)
    (mixed + 1L).toDouble / p.toDouble
  }

  private def kmvUpdate(k: Int)(key: String, rows: Iterator[KmvEvent],
                                state: GroupState[KmvState]): KmvReadout = {
    val st = state.getOption.getOrElse(KmvState(Vector.empty, 0L))
    var set = scala.collection.immutable.SortedSet[Double](st.hs: _*)
    var n = st.n
    rows.foreach { r =>
      n += 1L
      set = set + kmvNormHash(r.value)
      if (set.size > k) set = set - set.last
    }
    state.update(KmvState(set.toVector, n))
    val est =
      if (set.size < k) set.size.toDouble
      else (set.size.toDouble - 1.0) / set.last
    KmvReadout(key, n, est)
  }

  /** Streaming twin of [[graft.operators.SketchOps.kmvDistinct]]: the
    * k-minimum-values sketch carried in the state store — k doubles +
    * one count per key FOREVER, the alternative to
    * [[streamingHllDistinct]] when the consumer wants the
    * order-statistic estimator (exact below k distinct values, and
    * mergeable with batch-side sketches since the state IS the batch
    * sketch). The min-k set is monotone under insertion, so
    * at-least-once replays are absorbed by construction; only n_values
    * (a diagnostic) counts replayed rows twice. Same (k−1)/h_k formula,
    * same normalized hash — the spec pins cross-batch end-state equality
    * with the batch aggregate bit-for-bit. Run with `[[UpdateMode]]`.
    */
  def streamingKmvDistinct(ds: Dataset[KmvEvent], k: Int = 64): Dataset[KmvReadout] = {
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(kmvUpdate(k))
  }

  /** One step event entering the streaming funnel tracker. */
  case class FunnelEvent(user: String, step: String, t: Long)

  /** Running funnel position: `stage_reached` counts completed stages
    * (0 = none), `t_last` is the completing event's time (0 when none).
    */
  case class FunnelReadout(user: String, stage_reached: Int, t_last: Long)

  private[graft] case class FunnelState(k: Int, t: Long)

  private def funnelUpdate(idx: Map[String, Int])(
      user: String, rows: Iterator[FunnelEvent],
      state: GroupState[FunnelState]): FunnelReadout = {
    var st = state.getOption.getOrElse(FunnelState(0, Long.MinValue))
    // in-batch order (t, stage): a later-stage event at the SAME tick as
    // the stage before it must NOT advance (strict > is the q315 batch
    // contract), and processing time-ascending makes "first qualifying
    // event" = "min qualifying time"
    rows.toSeq
      .flatMap(e => idx.get(e.step).map(i => (e.t, i)))
      .sorted
      .foreach { case (t, i) =>
        if (i == st.k && t > st.t) st = FunnelState(st.k + 1, t)
      }
    state.update(st)
    FunnelReadout(user, st.k, if (st.t == Long.MinValue) 0L else st.t)
  }

  /** Streaming twin of the q315 ordered funnel: per user, how far down
    * the `stages` cascade the stream has progressed, where stage k+1
    * needs an event STRICTLY after stage k's completing time. State is
    * two numbers per user forever. The fold is monotone — a replayed
    * batch re-offers events the state already consumed (their stage
    * index is behind `k`), so at-least-once delivery is absorbed; the
    * documented tradeoff is the same as every funnel tracker's: a stage
    * event arriving in a LATER batch than an earlier-timestamped
    * successor is counted, but an event older than the reached stage's
    * time cannot retroactively lower the funnel (cross-batch arrivals
    * must be stage-ordered for exact batch parity — in-batch disorder
    * is fully handled by the sort). Run with [[UpdateMode]].
    */
  def streamingFunnel(ds: Dataset[FunnelEvent],
                      stages: Seq[String]): Dataset[FunnelReadout] = {
    require(stages.nonEmpty && stages.distinct.size == stages.size,
      s"stages must be non-empty and distinct, got $stages")
    val spark = ds.sparkSession
    import spark.implicits._
    val idx = stages.zipWithIndex.toMap
    ds.groupByKey(_.user)
      .mapGroupsWithState(GroupStateTimeout.NoTimeout())(funnelUpdate(idx))
  }

  /** One item occurrence entering the heavy-hitter tracker. */
  case class HHEvent(key: String, item: String)

  /** One tracked counter: cnt overcounts the truth by at most err. */
  case class HHReadout(key: String, item: String, cnt: Long, err: Long)

  private[graft] case class HHState(items: Map[String, (Long, Long)], n: Long)

  /** Deterministic batched SpaceSaving (Metwally et al. 2005): at most
    * `capacity` (item -> count, err) counters per key, forever. A batch
    * folds in as per-item deltas processed in SORTED item order — the
    * one-occurrence-at-a-time original is arrival-order-sensitive, which
    * no replayable pipeline can accept; the sorted-fold variant keeps the
    * SpaceSaving guarantees (any item with true count > N/capacity is
    * tracked; tracked cnt overcounts by at most err <= min-counter at
    * insertion) while giving bit-identical state for any batch replay
    * order. Eviction: smallest count, ties to the LARGEST item string
    * (so re-inserted small items churn deterministically).
    *
    * Scale shape: state is capacity-bounded per key — the streaming
    * frequency primitive when per-key item domains are unbounded at
    * 100 TB (top URLs per source, top SKUs per region). The batch twin
    * for under-capacity keys is a plain groupBy count, which the spec
    * pins across batch splits and replays of DISTINCT batches.
    */
  private def hhUpdate(capacity: Int)(key: String, rows: Iterator[HHEvent],
                                      state: GroupState[HHState])
      : Iterator[HHReadout] = {
    var st = state.getOption.getOrElse(HHState(Map.empty, 0L))
    var items = st.items
    var n = st.n
    val deltas = rows.toVector.groupBy(_.item).view.mapValues(_.size.toLong)
      .toSeq.sortBy(_._1)
    deltas.foreach { case (it, c) =>
      n += c
      items.get(it) match {
        case Some((cnt, err)) => items = items.updated(it, (cnt + c, err))
        case None if items.size < capacity => items = items.updated(it, (c, 0L))
        case None =>
          // evict min count, ties to the LARGEST item string
          val minC = items.valuesIterator.map(_._1).min
          val victim = items.collect { case (i, (c0, _)) if c0 == minC => i }.max
          items = (items - victim).updated(it, (minC + c, minC))
      }
    }
    st = HHState(items, n)
    state.update(st)
    items.toSeq.sortBy { case (i, (c, _)) => (-c, i) }.iterator
      .map { case (i, (c, e)) => HHReadout(key, i, c, e) }
  }

  def streamingHeavyHitters(ds: Dataset[HHEvent], capacity: Int)
      : Dataset[HHReadout] = {
    require(capacity >= 1, s"need capacity >= 1, got $capacity")
    val spark = ds.sparkSession
    import spark.implicits._
    ds.groupByKey(_.key)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        hhUpdate(capacity))
  }

  /** Streaming diversity (k-center) admission — the online arm of
    * [[graft.operators.SimilarityOps.kCenterGreedy]]: an embedding is
    * admitted iff its min squared distance (2^20 fixed-point units) to
    * EVERY prior admission exceeds minSepKibi·1024, so the admitted set
    * stays a packing (all pairs separated) — "keep it only if it adds
    * diversity". Admitted centers persist at `centersPath` as
    * (id, xs) parquet, growing per batch.
    *
    * Within a batch, admission is order-deterministic: candidates that
    * clear the corpus screen admit greedily in id order (an earlier
    * admission can block a later near-twin). The corpus screen is
    * distributed — batch × broadcast centers distance probe (the center
    * set is PACKING-bounded: at fixed separation over a bounded feature
    * space its size is a covering number, not corpus-sized); the
    * within-batch greedy runs on the driver over the batch-bounded
    * survivors (the foldWords tradition).
    *
    * Replay tolerance (at-least-once): the corpus screen ignores
    * same-id centers, so a replayed batch re-admits its identical
    * subset; the artifact append re-appends the same rows and every
    * reader dedups (`distinct`), so state converges. Ids must be unique
    * and content-stable (the dedup-graph id contract).
    */
  def streamingDiversityAdmission(stream: DataFrame, idCol: String,
                                  vecCol: String, minSepKibi: Long,
                                  centersPath: String)
                                 (sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    require(minSepKibi > 0, s"minSepKibi must be positive, got $minSepKibi")
    stream.writeStream.outputMode(OutputMode.Append())
      .foreachBatch { (rawBatch: Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        val sp = rawBatch.sparkSession
        val batch = rawBatch.toDF()
          .withColumn("__xs", transform(
            graft.operators.SimilarityOps.asDouble(col(vecCol)),
            x => floor(x * 1048576.0).cast("long")))
          .localCheckpoint(false)
        val centersExist =
          try { sp.read.parquet(centersPath); true }
          catch { case _: org.apache.spark.sql.AnalysisException => false }
        val screened = if (centersExist) {
          val cents = sp.read.parquet(centersPath).distinct() // replay dedup
            .select(col("id").as("__cid"), col("xs").as("cxs"))
          val d2 = aggregate(
            zip_with(col("__xs"), col("cxs"), (a, b) => (a - b) * (a - b)),
            lit(0L), (acc, x) => acc + x)
          val md = batch.crossJoin(broadcast(cents))
            .filter(col("__cid") =!= col(idCol).cast("long")) // replay self-hit
            .withColumn("__d2", d2)
            .groupBy(col(idCol)).agg(min(col("__d2")).as("__md"))
          batch.join(md, Seq(idCol), "left")
            .filter(col("__md").isNull || col("__md") > minSepKibi * 1024L)
            .drop("__md")
        } else batch
        // driver greedy over the batch-bounded survivors, id order
        val cand = screened
          .select(col(idCol).cast("long").as("id"), col("__xs"))
          .collect() // batch-bounded driver traffic
          .map(r => (r.getLong(0), r.getSeq[Long](1).toArray))
          .sortBy(_._1)
        val chosen = scala.collection.mutable.ArrayBuffer[(Long, Array[Long])]()
        for ((id, xs) <- cand) {
          val clear = chosen.forall { case (_, cxs) =>
            var s = 0L
            var i = 0
            val n = math.min(xs.length, cxs.length)
            while (i < n) { val d = xs(i) - cxs(i); s += d * d; i += 1 }
            s > minSepKibi * 1024L
          }
          if (clear) chosen += ((id, xs))
        }
        val ids = chosen.map(_._1)
        val admitted = screened
          .filter(col(idCol).cast("long").isin(ids.toSeq: _*))
          .localCheckpoint(true) // materialize before the artifact grows
        if (!admitted.isEmpty)
          admitted.select(col(idCol).cast("long").as("id"),
              col("__xs").as("xs"))
            .write.mode("append").parquet(centersPath)
        sink(admitted.drop("__xs"), batchId)
      }
  }

  val UpdateMode: OutputMode = OutputMode.Update()
}
