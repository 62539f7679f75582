package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Regenerates PLANS.md: formatted physical plans of the headline queries,
  * so the scan-pruning / broadcast / partial-aggregation claims in
  * SCALE.md are inspectable against the real planner output rather than
  * asserted in prose. Run: `sbt "runMain graft.Plans"`.
  */
object Plans {
  private val Headline = Seq(
    "q01_filter_project" -> "filter + projection pushdown into the parquet scan",
    "q03_join_agg_topk" -> "dimension broadcast joins, decimal-exact aggregation, top-k",
    "q08_cdc_lastwins" -> "PK last-wins dedup: one hash shuffle + window",
    "q21_dedup_jaccard" -> "exact prefix-filtered jaccard (PPJoin): rarest-prefix candidate keys, row-local array_intersect verify",
    "q22_dedup_minhash_lsh" -> "lane-packed minhash signatures (4 lanes/agg slot) + banded candidate join, hashed-array verify",
    "q24_ann_cosine_topk" -> "broadcast query side over the codegen'd dot-product kernel",
    "q25_ann_ivf" -> "fixed-k broadcast centroid quantizer + cell-local equi-join search",
    "q31_dedup_embedding" -> "triangle-blocked all-pairs: block-grid broadcast, no corpus broadcast",
    "q43_debezium_autodispatch" -> "schema-dispatched decode fanned across cores (repartition before the CPU-heavy round-trip)",
    "q46_kmv_distinct_sketch" -> "bounded KMV sketch: partial_kmvmink before the group-key exchange",
    "q47_corpus_percentiles" -> "range-partitioned rank: partitioned window + broadcast target join, no global window",
    "q48_sequence_packing" -> "two-pass prefix sum: partitioned window + broadcast partition offsets",
    "q49_trackevents_decode" -> "event-tracking decode: ONE whole-struct parse behind a Generate barrier (no per-field pruned re-parses, validation filter cannot sink below the Exchange)",
    "q51_skew_salted_agg" -> "salted two-phase aggregation: hot keys spread over salt buckets before the final combine",
    "q52_hist_quantiles_by_group" -> "per-group sketch read-out: group-partitioned windows + broadcast quantile join",
    "q54_crosscorpus_minhash" -> "cross-corpus LSH probe of the persisted MinHash index: batch-only signatures, band equi-join against the parquet band table, row-local verify",
    "q55_sessionization" -> "gap sessionization: user-partitioned lag + running-sum windows only",
    "q60_asof_join" -> "as-of join: tagged union + ONE key-partitioned carry window (single Exchange, no range join)",
    "q63_contamination" -> "decontamination screen: broadcast benchmark shingle set, map-side probe, partial-agg counts",
    "q64_doc_chunking" -> "overlapping token chunks: map-only projection + Generate, zero shuffles",
    "q66_token_budget_sample" -> "per-group token quota: one group-partitioned window, no global sort",
    "q68_distinctive_terms" -> "integer TF-IDF ranking: key-partitioned aggs, term equi-join, per-doc rank window",
    "q76_passage_winnowing" -> "repeated-passage scoring over the winnow-fp parquet artifact: (id, fp) scan + two keyed aggregations, text never re-hashed",
    "q78_vocab_top_ngrams" -> "exact top-K vocabulary: map-side-combinable counts + TakeOrdered (no global sort)",
    "q79_interval_join" -> "bucketized range join: interval replicated per bucket, hash equi-join + exact residual",
    "q85_span_removal" -> "cross-doc span dedup: equi-joins on span hashes, row-local rebuild over the pruned source scan",
    "q86_bloom_incremental_dedup" -> "bloom-prefiltered admission: broadcast bitset probe + broadcast verify joins, corpus never shuffled",
    "q88_graph_pagerank" -> "pregel join-agg rounds: checkpointed edges, per-round equi-join + dst aggregation",
    "q90_pmi_collocations" -> "PMI top-k: vocabulary-sized model relations, TakeOrdered (no global sort)",
    "q93_rolling_spikes" -> "trailing RANGE window over pre-aggregated daily counts, key-partitioned",
    "q113_snapshot_diff" -> "snapshot diff: ONE full-outer PK join, row-local null-safe change detection, churn-sized output",
    "q116_containment_pairs" -> "exact directional containment: one-sided rarest-prefix probe vs full inverted index, row-local verify",
    "q117_cms_heavy_hitters" -> "count-min sketch: one vocab aggregate feeds sketch AND TakeOrdered probe, broadcast probe join",
    "q120_sorted_neighborhood" -> "sorted-neighborhood dedup: fine-blocked window sort, lead-distance candidates, ZERO joins",
    "q122_zorder_layout" -> "z-order layout audit: codegen Morton key inline in the scan projection, one combinable aggregation",
    "q126_embed_contamination" -> "embedding contamination: broadcast eval side, corpus probed map-side (never shuffled)",
    "q129_triangle_count" -> "triangle counting: canonical two-hop equi-join + semi closing-edge check, no all-pairs",
    "q140_bpe_merge_tokens" -> "merge-rule BPE inline in the scan projection: one codegen'd framed-replace chain per row, no shuffle before the output sort",
    "q143_bloom_contamination" -> "bloom-pruned decontamination: scalar-subquery bloom probe filters the corpus map-side, exact verify join sees candidates only",
    "q153_pareto_frontier" -> "distributed skyline: per-x max collapse, range-partitioned prefix-max, equi-join recovery — no global window, no dominance join",
    "q157_asof_native" -> "NATIVE as-of join (custom SparkPlan): co-partitioned streaming merge, exactly two exchanges, sorts ride the exchanges",
    "q169_geo_grid_join" -> "grid-bucketed spatial self-join: 3x3 cell explode + cell equi-join, exact int64 distance verify inside codegen, never a cross product",
    "q174_postings_bm25" -> "BM25 from the inverted-index artifact: bucket-pruned postings scan (query terms' partitions only), broadcast dfreq/meta, rank window over candidates",
    "q178_quantile_normalize" -> "global order statistics via RangePrefix: range-partitioned pid windows + broadcast offsets + one rank equi-join, no unpartitioned window",
    "q184_stickiness" -> "sliding DAU/MAU: distinct (user, day) collapse first, 28-day spine join bounded by activity x window",
    "q238_k_anonymity" -> "k-anonymity ladder: ONE grouping-sets aggregation (Expand replicates map-side), QI-domain-bounded shuffle, zero joins",
    "q247_ann_ivf_index" -> "IVF retrieval from the persisted index: cell-partitioned parquet scan probed by broadcast query cells, rank window over cell-local candidates",
    "q273_product_quantization" -> "PQ codebooks: bounded m-subspace explode, m*k centroids broadcast into a map-side argmin, one (sub, cell, pos) mean exchange per round",
    "q279_kcenter_coreset" -> "distributed Gonzalez: ONE broadcast center + map-side least() per round, max-struct argmax aggregation, no pairwise join",
    "q282_ktruss" -> "k-truss peel: low-to-high wedge self-join enumerates each triangle once, edge-keyed support count, shrinking checkpointed edge set",
    "q283_rake_keywords" -> "RAKE: doc-partitioned gaps-and-islands runs, word-keyed stats join, TakeOrdered top-k as the only global step",
    "q337_hull_vertex_census" -> "convex hull census: two-level hull-merge (shard-local monotone chains, survivors-only final chain) — the partial-aggregate discipline for a sequential stack algorithm",
    "q344_blocking_quality" -> "blocking audit: candidate counts from block-size PRODUCTS (one groupBy per side), zero candidate pairs materialized",
  )

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = GraftSession.builder(cpus.toInt)
      .master(s"local[$cpus]")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // q21/q22's query entries materialize-then-release their persisted
    // index (their own plan is a checkpoint-block scan) — explain the
    // underlying operator plan instead, honoring the Releasable lifecycle
    def explainTarget(name: String): (org.apache.spark.sql.DataFrame, () => Unit) = name match {
      case "q21_dedup_jaccard" =>
        val r = graft.operators.DedupOps
          .jaccardPairsPrefixReleasable(Tables.documents(spark, sfDir), "doc_id", "text", 3, 0.6)
        (r.df, r.release)
      case "q22_dedup_minhash_lsh" =>
        val r = graft.operators.DedupOps
          .minhashNearDupPairsReleasable(Tables.documents(spark, sfDir), "doc_id", "text", 3, 0.7)
        (r.df, r.release)
      case "q116_containment_pairs" =>
        val r = graft.operators.DedupOps
          .containmentPairsReleasable(Tables.documents(spark, sfDir), "doc_id", "text", 3, 0.8)
        (r.df, r.release)
      case _ => (SparkEntry.queries(name)(spark, sfDir), () => ())
    }
    val sb = new StringBuilder
    sb.append("# PLANS — formatted physical plans of the headline queries\n\n")
    sb.append(s"Generated by `graft.Plans` on `$sfDir`. Regenerate after plan-affecting\n")
    sb.append("changes; PlanSpec asserts the load-bearing properties in CI.\n")
    Headline.foreach { case (name, why) =>
      val (df, release) = explainTarget(name)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
      release()
      sb.append(s"\n## $name — $why\n\n```\n$plan```\n")
    }
    Files.write(Paths.get(out), sb.toString.getBytes("UTF-8"))
    println(s"[plans] wrote $out")
    spark.stop()
  }
}
