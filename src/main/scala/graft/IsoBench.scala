package graft

import org.apache.spark.sql.SparkSession

/** Per-query WARM-ISOLATION benchmark — the adjudication artifact for
  * rounds where the driver's wall-clock bench is host-noise-bound
  * (see BASELINE.md's noise notes): each query runs twice in a fresh
  * session and the SECOND (warm: JIT'd, session memos built, saved
  * indexes published) time is recorded.
  *
  * One command produces the machine-readable record:
  *
  * {{{
  *   SPARK_GRAFT_CPUS=32 SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.IsoBench"            # 10 most expensive queries
  *   sbt "runMain graft.IsoBench q1 q2"        # explicit subset
  * }}}
  *
  * prints one JSON line `{"metric":"warm_iso_sec",...,"queries":
  * {name: sec}}` and writes it to ISOBENCH.json in the working
  * directory, beside BASELINE.md.
  */
object IsoBench {

  /** The most expensive contract queries — the UNION of the round-3
    * and round-6 judges' per-query top-10s, plus the round-7 composed
    * pipeline and saved-containment-index queries — the set whose
    * warm-iso numbers adjudicate a noisy driver bench. */
  private val headline = Seq(
    "dedup_clusters", "dedup_clusters_twophase", "graph_pagerank",
    "mining_kmeans", "mining_assoc_rules", "dedup_keep_list",
    "mining_copurchase", "sim_topk_ivfpq", "sim_topk_ivf",
    "dedup_ingest", "dedup_ngram_jaccard", "text_lang_divergence",
    "graph_triangles", "dedup_embed_cosine", "pipeline_corpus_prep",
    "dedup_containment_ingest",
    // round-7b additions above the 1 s warm band at sf0.1
    "sim_topk_sq8", "dedup_semantic", "sink_zorder_cluster",
    "join_bloom_filtered",
    // round-7c: the only session-three addition above the 1 s band
    "sim_topk_mmr",
    // round-12: the RELATIONAL tier (r11 verdict item 1) — the rows
    // whose driver-bench swings could not be self-adjudicated because
    // the headline set covered only LLM-pipeline ops (judge-measured
    // quiet: q3 1.98 s, q10 1.00 s, frame_rows 0.28 s)
    "tpch_q3_shipping", "tpch_q10_returned", "tpch_q5_local_supplier",
    "win_frame_rows", "sink_compact_small_files", "text_entropy",
    // round-12 session 3: the only new rows above the 1 s warm band
    "sample_token_budget", "pipeline_filter_funnel",
    "text_langid_confusion",
    // round-12 sessions 4-8: every later addition above the 1 s warm
    // band in the session-8 quiet bench (186.1 s / 268 q), so the
    // standing artifact adjudicates the whole fleet's expensive tail
    "graph_k_core", "graph_jaccard_linkpred", "sim_lex_ingest",
    "graph_hits", "graph_clustering_coeff", "embed_pca_power",
    "merge_partition_overwrite", "sim_knn_graph",
    "tpch_q21_waiting_supplier", "text_rake_keywords", "sim_bm25_topk",
    "multimodal_phash_neardup",
    // round-12 session 9: the additions above the 1 s warm band at
    // sf0.1 (quality_buckets 2.1, survival_km 1.2, reachability 1.1)
    "text_quality_buckets", "ev_survival_km", "graph_reachability_cte",
    // round-12 session 10: the additions above the 1 s warm band at
    // sf0.1 (closeness 2.9, markov 2.5, random_walk 2.6, outlier 1.3,
    // stl 1.1)
    "graph_closeness", "ev_attribution_markov", "graph_random_walk",
    "embed_outlier_knn", "win_stl_anomaly",
    // round-12 session 11: the additions above the 1 s warm band at
    // sf0.1 (hamming 1.35, item_cf 3.6)
    "sim_topk_hamming", "mining_item_cf",
    // session-12 rows above (or near) the 1 s warm band
    "graph_modularity", "text_winnowing", "multimodal_phash_wide",
    "sim_topk_nng", "sim_nng_ingest", "sim_topk_nng_descent",
    // round-13: rows above ~1.7 s in the quiet 345-query capture
    // (BENCH_r13_quiet 272.3 s at loadavg 0.30), incl. the three new
    // round-13 queries
    "dedup_clusters_incremental", "sim_recall_nng",
    "dedup_cluster_stats", "sim_hybrid_ivf", "sim_knn_classify_nng",
    "win_pareto_share", "sample_kcenter",
    // round 14: the two new rows above the warm band (the backward
    // Brandes pass ≈ 2× closeness on the same graph; the phash ingest
    // probe is signature-scan-bound on the arrival slice)
    "graph_betweenness", "multimodal_phash_ingest",
    // round 15: new rows above the 1 s warm band at sf0.1 (nprobe
    // sweep 2.5 = 4 serving points + shared truth; band sweep 2.1 =
    // 4 arrangements + exact truth; filtered IVF 2.1; recall_sq8 1.4)
    "sim_nprobe_sweep", "dedup_band_sweep", "sim_topk_ivf_filtered",
    "sim_recall_sq8", "graph_ppr_seeds", "sim_recall_ivf_filtered",
    "text_pack_sweep", "sample_doremi_weights",
    // round 16: the one new row above the 1 s warm band — five
    // sequential state publishes (keyed merge + rename-aside each)
    // by design; the other three new rows serve from saved artifacts
    // sub-second
    "merge_cdc_exactly_once",
    // the composed knob card: ~8.6 s warm ≈ the five sweep chains +
    // one composite plan's codegen/scheduling (measured: eager
    // per-pick lineage cuts made it SLOWER, 11.0 s — the overhead is
    // not plan compile). An offline once-per-corpus-generation
    // artifact; recorded so the bench reading has its adjudicator.
    "pipeline_knob_card",
    // round 17: the two new rows above the 1 s warm band — the
    // 11-round (L=6 forward + 5 backward) sparse-graph Brandes over
    // the saved knn4 edge artifact, and the diversified-graph recall
    // row (probe-broadcast ground truth + beam walk at equal beam)
    "graph_betweenness_knn", "sim_recall_nng_diverse",
    // round 18: the two-walk hierarchical recall row (coarse walk +
    // base walk + brute-force truth) and the routed sweeps whose
    // fixture posture changed this round
    "sim_recall_nng_hier", "dedup_ngram_jaccard_collapsed",
    // round 20 (optimization round 2): the composed funnel row is now
    // the fleet's second-heaviest timed query — its warm number needs
    // a standing adjudicator
    "dedup_before_pairing")

  def main(args: Array[String]): Unit = {
    val load0 = Bench.loadavg1m()
    val (steal0, jif0) = Bench.stealTotals()
    Bench.calibrateWarmup()
    val cal0 = Bench.calibrate()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val names = if (args.nonEmpty) args.toSeq else headline
    // SPARK_GRAFT_ISO_RUNS=1 for very long output-bound scale probes
    // (cold ≈ warm at multi-minute durations; a second run buys no
    // adjudication). Default stays 2 (record the warm run).
    val runs = sys.env.getOrElse("SPARK_GRAFT_ISO_RUNS", "2").toInt
    // SPARK_GRAFT_ISO_CLEAR=1 drops the PlanCache (session memos +
    // their persisted frames) BETWEEN queries: on a long probe over
    // output-bound queries, one query's persisted frames squeeze the
    // next query's storage/execution memory and its warm number
    // reads high (the round-11 finding: sim_topk_ivfpq warm 18.8 s
    // inside the 10× probe session vs 2.6 s in a clean session).
    // Default stays off — the standing sf0.1 artifact measures the
    // shared-session warm posture, where cross-query memo reuse is
    // the point.
    val clearBetween =
      sys.env.getOrElse("SPARK_GRAFT_ISO_CLEAR", "0") == "1"
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000).selectExpr("sum(id)").collect()
    val mid = names.size / 2
    var calMid = -1.0
    val warm = names.zipWithIndex.map { case (name, idx) =>
      if (idx == mid) calMid = Bench.calibrate()
      if (clearBetween) PlanCache.clear()
      var last = 0.0
      for (r <- 1 to runs) {
        val t0 = System.nanoTime()
        SparkEntry.queries(name)(spark, sfDir).count()
        last = (System.nanoTime() - t0) / 1e9
        println(f"$name run$r [local[$cpus]]: $last%.2f s")
      }
      name -> last
    }
    // loadavg bookends + the fixed-work calibration triple + the
    // cumulative steal delta make the artifact self-adjudicating: a
    // record captured under host load (visible OR hypervisor-hidden)
    // announces itself instead of silently overstating costs (the
    // round-8 ISOBENCH lesson; the round-16 loadavg-blindness lesson).
    val load1 = Bench.loadavg1m()
    val cal1 = Bench.calibrate()
    val (steal1, jif1) = Bench.stealTotals()
    val json = warm.map { case (n, t) => f""""$n": $t%.3f""" }
      .mkString(
        s"""{"metric": "${if (runs == 1) "cold_iso_sec" else "warm_iso_sec"}", """ +
          s""""sf": "$sfDir", "cpus": $cpus, "runs": $runs, """ +
          s""""cleared_between": $clearBetween, """ +
          s""""loadavg_start": $load0, "loadavg_end": $load1, """ +
          s""""cal_sec": [$cal0, $calMid, $cal1], """ +
          s""""steal_jiffies_delta": ${if (steal0 >= 0 && steal1 >= 0)
            steal1 - steal0 else -1}, """ +
          s""""cpu_jiffies_delta": ${if (jif0 >= 0 && jif1 >= 0)
            jif1 - jif0 else -1}, """ +
          """"queries": {""",
        ", ", "}}")
    println(json)
    // Scale probes (SPARK_GRAFT_SF_DIR=/tmp/sfx*, explicit query
    // subsets, runs!=2) must not clobber the standing sf0.1
    // adjudication artifact: ISOBENCH.json is the DEFAULT target only
    // for a full-headline warm run against the standing corpus; every
    // other shape defaults to ISOBENCH_probe.json. SPARK_GRAFT_ISO_OUT
    // still overrides both ways (the round-13 lesson: a /tmp/sfx probe
    // overwrote the 65-row artifact BASELINE.md adjudicates against).
    val isStandingCapture =
      sfDir == "/root/testdata/sf0.1" && args.isEmpty && runs == 2 &&
        !clearBetween && cpus == "32"
    val outPath = sys.env.getOrElse("SPARK_GRAFT_ISO_OUT",
      if (isStandingCapture) "ISOBENCH.json" else "ISOBENCH_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(outPath),
      (json + "\n").getBytes("UTF-8"))
    PlanCache.clear()
    spark.stop()
  }
}
