package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index-BUILD benchmark (the offline half the query benches exclude):
  * times the exact all-pairs k-NN graph build vs the NN-Descent-style
  * linear build on SPARK_GRAFT_SF_DIR's embeddings, and reports the
  * descent graph's edge agreement against the exact lists. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sfx10 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.IndexBench [exact] [descent] [entries]
  *          [diverse] [serve]"
  *
  * (args filter which stages run; default exact+descent. The exact
  * build is O(n²) — skip it above ~50k vectors.) The `serve` stage
  * measures the ONLINE half against the descent-built graph — the
  * seam the build curves alone leave open: a warm-iso beam walk
  * (the sim_topk_nng shape, top-3) and the k-NN classify vote (the
  * sim_knn_classify_nng shape, top-5 + majority), each run twice so
  * run2 is the warm number. SPARK_GRAFT_IDX_BASE pins the index
  * directory (reuse a prior build instead of paying it again);
  * otherwise a temp dir is used. Prints one JSON line. */
object IndexBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val which = if (args.isEmpty) Set("exact", "descent") else args.toSet
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val ev = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .repartition(cpus.toInt, col("vec_id"))
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val n = ev.count()
    def time[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val r = f
      (r, (System.nanoTime() - t0) / 1e9)
    }
    val base = sys.env.getOrElse("SPARK_GRAFT_IDX_BASE",
      java.nio.file.Files.createTempDirectory("graft_idxbench").toString)
    var fields = Seq(s""""n_vectors": $n""")
    val descentDone = new java.io.File(s"$base/descent/entries").exists
    if (which("descent") && !descentDone) {
      // rounds ~ log2(n): candidate information doubles per round
      val rounds = math.ceil(math.log(n.toDouble) / math.log(2)).toInt
      val (counts, tD) = time(graft.api.Similarity.nngBuildDescent(
        ev, "vec_id", "v", s"$base/descent", k = 10, rounds = rounds))
      fields :+= s""""descent_rounds": $rounds"""
      fields :+= f""""descent_build_sec": $tD%.2f"""
      fields :+= s""""descent_round_pool_edges": [${counts.mkString(", ")}]"""
    } else if (descentDone) {
      // keep *_sec fields numeric for cross-round tooling; the reuse
      // is flagged separately
      fields :+= s""""descent_reused": "$base/descent""""
    }
    if (which("exact")) {
      val (_, tE) = time(graft.api.Similarity.nngBuild(
        ev, "vec_id", "v", s"$base/exact", k = 10))
      fields :+= f""""exact_build_sec": $tE%.2f"""
      if (which("descent")) {
        // edge agreement: descent top-10 lists vs the exact lists
        val ex = spark.read.parquet(s"$base/exact/edges")
          .select(col("src"), col("dst"))
        val de = spark.read.parquet(s"$base/descent/edges")
          .select(col("src"), col("dst"))
        val hit = de.join(ex, Seq("src", "dst"), "left_semi").count()
        // agreement (precision) over EMITTED descent edges (can be
        // < n·10 per node) and coverage over the exact n·10 —
        // reported separately so recall isn't understated by missing
        // edges. Field renamed from descent_edge_recall (round 13):
        // it measured hit/|emitted|, not recall — the old key would
        // make cross-round comparisons apples-to-oranges. deN == 0
        // (empty edges output) is reported as 0, not NaN.
        val deN = de.count()
        val agree = if (deN == 0) 0.0 else hit.toDouble / deN
        fields :+= f""""descent_edge_agreement": $agree%.4f"""
        fields :+= f""""descent_edge_coverage": ${deN.toDouble / (n * 10)}%.4f"""
      }
    }
    if (which("entries")) {
      // ENTRY-MODE RECALL SWEEP (round-14 VERDICT item 5): recall@3
      // at EQUAL beam/rounds for the three entry layers — the flat
      // hash pick the graph ships with, the k-means cell-medoid
      // coarse layer, and degree-seeded hubs — against brute-force
      // ground truth. Requires the exact graph (run `exact` first or
      // reuse via SPARK_GRAFT_IDX_BASE); probes every 5th vector.
      val graphPath = s"$base/exact"
      require(new java.io.File(s"$graphPath/entries").exists,
        s"entries stage needs an exact graph at $graphPath")
      import graft.Ckpt.CkptOps
      val probes = ev.filter(col("vec_id") % 5 === 0)
      val nP = probes.count()
      fields :+= s""""entries_n_probes": $nP"""
      val truth = graft.api.Similarity.cosineTopK(ev, probes,
          "vec_id", "v", 3)
        .select(col("probe_id"), col("neighbor_id")).ckpt()
      def recall(entries: Option[org.apache.spark.sql.DataFrame]): Double = {
        val got = graft.api.Similarity.nngTopK(probes, "vec_id", "v",
          graphPath, k = 3, beam = 10, rounds = 4,
          entriesOverride = entries)
        val hits = got.join(truth, Seq("probe_id", "neighbor_id"),
          "left_semi").count()
        hits.toDouble / (nP * 3)
      }
      val medoid = graft.api.Similarity
        .nngEntriesMedoid(spark, graphPath).ckpt()
      val degree = graft.api.Similarity
        .nngEntriesDegree(spark, graphPath).ckpt()
      fields :+= f""""recall_entries_hash": ${recall(None)}%.4f"""
      fields :+= f""""recall_entries_medoid": ${recall(Some(medoid))}%.4f"""
      fields :+= f""""recall_entries_degree": ${recall(Some(degree))}%.4f"""
      // round 16: the HIERARCHICAL coarse layer (Similarity
      // .nngBuildHierLayer + per-probe entries from its beam walk) —
      // same base beam/rounds, so the column isolates the entry
      // layer's contribution exactly like the other three.
      val hierPath = s"$base/hier"
      if (!new java.io.File(s"$hierPath/entries").exists)
        graft.api.Similarity.nngBuildHierLayer(ev, "vec_id", "v",
          hierPath)
      val pe = graft.api.Similarity.nngTopK(probes, "vec_id", "v",
          hierPath, k = 8, beam = 4, rounds = 2)
        .select(col("probe_id"), col("neighbor_id").as("node")).ckpt()
      fields :+= f""""recall_entries_hier": ${recall(Some(pe))}%.4f"""
    }
    if (which("diverse")) {
      // CLONE-ROBUSTNESS PROBE (round-16 candidate (c)): recall@3 at
      // EQUAL beam/rounds for the plain exact top-k graph vs the
      // diversity-selected graph (Similarity.nngBuildDiverse — HNSW
      // select-neighbors, order-independent relaxation). On a clone-
      // dense corpus the plain graph decomposes into clone cliques
      // (recall ≤ 0.04 at the 10x probe, every entry mode); the
      // diversified lists keep one clone representative and the
      // graph reconnects. Requires the exact graph for the plain
      // column (run `exact` first or reuse via SPARK_GRAFT_IDX_BASE).
      import graft.Ckpt.CkptOps
      // SPARK_GRAFT_KCAND sizes the shortlist: it must exceed the
      // corpus's clone multiplicity + k for diversification to have
      // anything diverse to surface (the documented boundary)
      val kCand = sys.env.getOrElse("SPARK_GRAFT_KCAND", "30").toInt
      val dvPath = s"$base/diverse_c$kCand"
      if (new java.io.File(s"$dvPath/entries").exists) {
        fields :+= s""""diverse_reused": "$dvPath""""
      } else {
        val (_, tDv) = time(graft.api.Similarity.nngBuildDiverse(
          ev, "vec_id", "v", dvPath, k = 10, kCand = kCand))
        fields :+= f""""diverse_build_sec": $tDv%.2f"""
      }
      fields :+= s""""diverse_kcand": $kCand"""
      val probes = ev.filter(col("vec_id") % 5 === 0)
      val nP = probes.count()
      fields :+= s""""diverse_n_probes": $nP"""
      val truth = graft.api.Similarity.cosineTopK(ev, probes,
          "vec_id", "v", 3)
        .select(col("probe_id"), col("neighbor_id")).ckpt()
      def recallAt(path: String, rounds: Int): Double = {
        val got = graft.api.Similarity.nngTopK(probes, "vec_id", "v",
          path, k = 3, beam = 10, rounds = rounds)
        got.join(truth, Seq("probe_id", "neighbor_id"), "left_semi")
          .count().toDouble / (nP * 3)
      }
      // rounds sweep: a cliqued plain graph is HORIZON-INVARIANT
      // (unreachable is unreachable), a reconnected one climbs with
      // walk depth — the signature that separates "low recall because
      // disconnected" from "low recall because the walk is short"
      for (r <- Seq(4, 8, 12)) {
        fields :+= f""""recall_diverse_r$r": ${
          recallAt(dvPath, r)}%.4f"""
        if (new java.io.File(s"$base/exact/entries").exists)
          fields :+= f""""recall_plain_r$r": ${
            recallAt(s"$base/exact", r)}%.4f"""
      }
    }
    if (which("serve")) {
      // the ONLINE half over the descent-built graph: probes are every
      // 500th vector (400 probes at the 200k-vector 100x corpus — the
      // same probe volume as the 10x sim_knn_classify_nng record), run
      // twice so run2 is the warm-iso number. The walk never scans the
      // corpus; per-probe cost is corpus-invariant by construction and
      // this measures exactly that claim on a descent-built graph.
      val graphPath = s"$base/descent"
      require(new java.io.File(s"$graphPath/entries").exists,
        s"serve stage needs a descent graph at $graphPath — run the " +
          "descent stage first or point SPARK_GRAFT_IDX_BASE at one")
      val probes = ev.filter(col("vec_id") % 500 === 0)
      fields :+= s""""serve_n_probes": ${probes.count()}"""
      def walkOnce(): Long =
        graft.api.Similarity.nngTopK(probes, "vec_id", "v", graphPath,
          k = 3, beam = 10, rounds = 4).count()
      // k-NN classify: top-5 walk shortlist -> neighbor-label majority
      // vote, descending votes then smallest label (the
      // sim_knn_classify_nng contract vote)
      val labels = spark.read.parquet(s"$sfDir/embeddings.parquet")
        .select(col("vec_id").as("neighbor_id"),
          col("label").as("nlabel"))
      def classifyOnce(): Long = {
        val top5 = graft.api.Similarity.nngTopK(probes, "vec_id", "v",
          graphPath, k = 5, beam = 10, rounds = 4)
        val votes = top5.join(labels, Seq("neighbor_id"))
          .groupBy(col("probe_id"), col("nlabel"))
          .agg(count(lit(1)).as("votes"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("probe_id"))
          .orderBy(col("votes").desc, col("nlabel"))
        votes.withColumn("vr", row_number().over(w))
          .filter(col("vr") === 1).count()
      }
      val (w1Rows, tW1) = time(walkOnce())
      val (_, tW2) = time(walkOnce())
      val (c1Rows, tC1) = time(classifyOnce())
      val (_, tC2) = time(classifyOnce())
      fields :+= s""""serve_walk_rows": $w1Rows"""
      fields :+= f""""serve_walk_run1_sec": $tW1%.2f"""
      fields :+= f""""serve_walk_run2_sec": $tW2%.2f"""
      fields :+= s""""serve_classify_rows": $c1Rows"""
      fields :+= f""""serve_classify_run1_sec": $tC1%.2f"""
      fields :+= f""""serve_classify_run2_sec": $tC2%.2f"""
    }
    println(s"{${fields.mkString(", ")}, " +
      s""""sf": "$sfDir", "cpus": $cpus}""")
    spark.stop()
  }
}
