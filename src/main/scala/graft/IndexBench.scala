package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Index-BUILD benchmark (the offline half the query benches exclude):
  * times the exact all-pairs k-NN graph build vs the NN-Descent-style
  * linear build on SPARK_GRAFT_SF_DIR's embeddings, and reports the
  * descent graph's edge agreement against the exact lists. Usage:
  *
  *   SPARK_GRAFT_SF_DIR=/tmp/sfx10 SPARK_GRAFT_CPUS=32 \
  *     sbt "runMain graft.IndexBench [exact] [descent]"
  *
  * (args filter which builds run; default both. The exact build is
  * O(n²) — skip it above ~50k vectors.) Prints one JSON line. */
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
    val base = java.nio.file.Files
      .createTempDirectory("graft_idxbench").toString
    var fields = Seq(s""""n_vectors": $n""")
    if (which("descent")) {
      // rounds ~ log2(n): candidate information doubles per round
      val rounds = math.ceil(math.log(n.toDouble) / math.log(2)).toInt
      val (counts, tD) = time(graft.api.Similarity.nngBuildDescent(
        ev, "vec_id", "v", s"$base/descent", k = 10, rounds = rounds))
      fields :+= s""""descent_rounds": $rounds"""
      fields :+= f""""descent_build_sec": $tD%.2f"""
      fields :+= s""""descent_round_pool_edges": [${counts.mkString(", ")}]"""
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
    println(s"{${fields.mkString(", ")}, " +
      s""""sf": "$sfDir", "cpus": $cpus}""")
    spark.stop()
  }
}
