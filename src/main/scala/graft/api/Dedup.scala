package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

/** Public, fixture-independent deduplication API: every operator the
  * contract queries exercise, parameterized on the caller's column
  * names. The graft.operators.* contract queries are thin bindings of
  * these functions onto the test corpus — the library surface a user
  * programs against is THIS.
  *
  * Conventions: inputs are plain DataFrames; outputs use stable
  * column names documented per function; nothing here persists or
  * caches (callers own materialization — see graft.PlanCache for the
  * session-scoped memo the harness uses). All hashes are portable
  * md5-derived 48/32-bit integers, so results are reproducible on any
  * engine.
  */
object Dedup {

  private def pHash(seedAndVal: String): String =
    s"CAST(conv(substr(md5($seedAndVal), 1, 12), 16, 10) AS BIGINT)"

  private def nPart(df: DataFrame): Int =
    df.sparkSession.sessionState.conf.numShufflePartitions

  /** Distinct word n-gram shingles per document: (id, shingle).
    * Set semantics come from array_distinct INSIDE the row — no
    * shuffle. Caller should spread a single-split source first. */
  def wordShingles(docs: DataFrame, id: String, text: String,
      n: Int = 3): DataFrame = {
    graft.functions.TextExpressions.register(docs.sparkSession)
    // Column-built (no SQL-text splicing of the caller's column name)
    docs.select(col(id),
      explode(array_distinct(call_function("word_ngrams",
        split(col(text), " "), lit(n)))).as("shingle"))
  }

  /** 8-permutation MinHash signatures from a shingle table:
    * (id, h0..h7). The 8 hash functions are 32-bit slices of two md5
    * digests computed once per DISTINCT shingle and broadcast back
    * onto the postings. `distinctShingles` lets a caller who already
    * has the dictionary (e.g. a df table) donate it and skip the
    * distinct pass. */
  def minhashSignatures(shingles: DataFrame, id: String,
      shingle: String = "shingle",
      distinctShingles: Option[DataFrame] = None): DataFrame = {
    val hashCols = (0 to 7).map { i =>
      val m = i / 4; val j = i % 4
      expr(s"CAST(conv(substr(m$m, ${1 + 8 * j}, 8), 16, 10) AS BIGINT)")
        .as(s"x$i")
    }
    val dict = distinctShingles
      .getOrElse(shingles.select(col(shingle)).distinct())
      .select(col(shingle))
      .withColumn("m0", md5(concat(lit("0:"), col(shingle))))
      .withColumn("m1", md5(concat(lit("1:"), col(shingle))))
      .select(col(shingle) +: hashCols: _*)
    val sigCols = (0 to 7).map(k => min(col(s"x$k")).as(s"h$k"))
    // NO broadcast hint: the dictionary is vocabulary-cardinality
    // (grows with the corpus), so forcing a broadcast would hit the
    // 8 GB cap long before 100 TB. AQE promotes the join to broadcast
    // from runtime stats whenever the dictionary is actually small.
    shingles.join(dict, Seq(shingle))
      .groupBy(col(id)).agg(sigCols.head, sigCols.tail: _*)
  }

  /** LSH-banded MinHash candidate pairs with estimated Jaccard:
    * (doc1, doc2, est_jaccard), est ≥ `minEst`. 4 bands × 2 rows over
    * the 8-hash signature table from [[minhashSignatures]]. */
  def minhashBandPairs(sig: DataFrame, id: String,
      minEst: Double = 0.5): DataFrame = {
    val bands = Seq((0, 1), (2, 3), (4, 5), (6, 7))
    val bandArr = bands.zipWithIndex.map { case ((x, y), bi) =>
      s"named_struct('b', $bi, 'k1', h$x, 'k2', h$y)"
    }.mkString("array(", ", ", ")")
    val banded = sig.select(col(id),
      explode(expr(bandArr)).as("band"))
      .select(col(id), col("band.b").as("b"),
        col("band.k1").as("k1"), col("band.k2").as("k2"))
    val candidates = banded.select(col(id).as("doc1"), col("b"),
      col("k1"), col("k2"))
      .join(banded.select(col(id).as("doc2"), col("b"),
        col("k1"), col("k2")), Seq("b", "k1", "k2"))
      .filter(col("doc1") < col("doc2"))
      .select(col("doc1"), col("doc2")).distinct()
    val agree = (0 to 7).map(k =>
      when(col(s"a_h$k") === col(s"b_h$k"), 1).otherwise(0))
      .reduce(_ + _)
    val aSig = (0 to 7).foldLeft(sig.withColumnRenamed(id, "doc1")) {
      (d, k) => d.withColumnRenamed(s"h$k", s"a_h$k") }
    val bSig = (0 to 7).foldLeft(sig.withColumnRenamed(id, "doc2")) {
      (d, k) => d.withColumnRenamed(s"h$k", s"b_h$k") }
    // NO broadcast hints: the signature table is corpus-cardinality —
    // an unconditional broadcast caps at 8 GB (~100M docs). Keyed
    // shuffle joins scale unboundedly; AQE broadcasts from runtime
    // stats when the table is genuinely small (as on test fixtures).
    candidates
      .join(aSig, Seq("doc1"))
      .join(bSig, Seq("doc2"))
      .select(col("doc1"), col("doc2"),
        (agree.cast("double") / 8).as("est_jaccard"))
      .filter(col("est_jaccard") >= minEst)
  }

  private val sigBands = Seq((0, 1), (2, 3), (4, 5), (6, 7))

  /** LSH band-key rows of a signature table (id, h0..h7): one row per
    * (document, band), CARRYING the full signature through the explode
    * — (id, h0..h7, b, k1, k2). A stateless projection (runs on batch
    * and streaming frames alike); the carried signature makes any
    * downstream band join self-contained (est_jaccard and the
    * first-equal-band dedup both compute from carried columns, no
    * rejoin with the signature frame). */
  private[graft] def bandedSignatures(sig: DataFrame, id: String,
      hPrefix: String = "h"): DataFrame = {
    val bandArr = sigBands.zipWithIndex.map { case ((x, y), bi) =>
      struct(lit(bi).as("b"), col(s"$hPrefix$x").as("k1"),
        col(s"$hPrefix$y").as("k2")) }
    val hCols = (0 to 7).map(k => col(s"$hPrefix$k"))
    sig.select(col(id) +: hCols :+ explode(array(bandArr: _*)).as("band"): _*)
      .select(col(id) +: hCols :+ col("band.b").as("b")
        :+ col("band.k1").as("k1") :+ col("band.k2").as("k2"): _*)
  }

  /** Bounded bucket of a band key — the PARTITION column of the saved
    * signature index. Derived only from (b, k1, k2) with every
    * intermediate < 38·nBuckets, so it evaluates identically (and
    * overflow-free under ANSI) on the build, append, and probe sides.
    */
  private[graft] def bandBucket(nBuckets: Int): Column =
    pmod(pmod(col("k1"), lit(nBuckets.toLong)) * 31 +
      pmod(col("k2"), lit(nBuckets.toLong)) * 7 + col("b"),
      lit(nBuckets.toLong)).cast("int")

  /** Build and SAVE the banded MinHash signature index of a corpus at
    * `path`: every (document, band) posting — (id, h0..h7, b, k1, k2)
    * — written as parquet PARTITIONED by `bkt`, a bounded
    * deterministic bucket of the band key, plus a 1-row `meta` table
    * pinning (n, nBuckets) so append and probe always band and bucket
    * exactly as the build did.
    *
    * This is the continuous-ingestion dedup serving story
    * (graft.streaming.DedupStreams): the expensive corpus pass —
    * tokenize, shingle, hash — runs ONCE at build time; a fresh
    * serving process probes the SAVED index immediately (no
    * re-signing), and a batch probe's scan prunes to the arrivals'
    * band buckets via partition filters. The signature-index twin of
    * [[Similarity.ivfBuild]]. */
  def signatureIndexBuild(docs: DataFrame, id: String, text: String,
      path: String, n: Int = 3, nBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((n, nBuckets)).toDF("n", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    // the saved layout uses the CANONICAL id column name "id", so a
    // probe never needs to know what the build caller's column was
    bandedSignatures(
        minhashSignatures(wordShingles(docs, id, text, n), id)
          .withColumnRenamed(id, "id"), "id")
      .withColumn("bkt", bandBucket(nBuckets))
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$path/bands")
  }

  /** Incrementally add documents to a saved [[signatureIndexBuild]]
    * index: the arrivals are signed through the same batch path and
    * their band rows APPENDED to the bucket-partitioned layout — only
    * the touched bucket directories gain files, nothing is rewritten.
    * The maintenance counterpart of continuous-ingestion dedup:
    * score a batch against the index, then fold it in. */
  def signatureIndexAppend(newDocs: DataFrame, id: String, text: String,
      path: String): Unit = {
    val spark = newDocs.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val (n, nBuckets) = (meta.getAs[Int]("n"), meta.getAs[Int]("n_buckets"))
    bandedSignatures(
        minhashSignatures(wordShingles(newDocs, id, text, n), id)
          .withColumnRenamed(id, "id"), "id")
      .withColumn("bkt", bandBucket(nBuckets))
      .write.mode("append").partitionBy("bkt").parquet(s"$path/bands")
  }

  /** Build and SAVE a cross-set CONTAINMENT index of a training
    * corpus at `path` — the serving structure for continuous
    * eval-contamination checks ([[containmentPairs]] run against a
    * stream of arriving eval prompts,
    * graft.streaming.DedupStreams.containmentAgainstSavedIndex):
    *
    *  - `postings`: the inverted n-gram index (shingle, id),
    *    partitioned by a portable-hash bucket of the shingle so a
    *    BATCH probe prunes to its arrivals' buckets;
    *  - `docs`: one row per training doc with its ASCENDING-sorted
    *    distinct shingle array — the verify side: a probe counts the
    *    exact intersection with `sorted_intersect_count` (early-exit
    *    merge), so the aggregate-free probe stays stateless and
    *    Append-mode-safe on a stream;
    *  - `meta`: (n, n_buckets) pinning shingling and bucketing.
    *
    * The expensive corpus pass (tokenize, shingle, sort) runs ONCE at
    * build; probes never re-shingle the corpus. */
  def containmentIndexBuild(docs: DataFrame, id: String, text: String,
      path: String, n: Int = 3, nBuckets: Int = 32): Unit = {
    val spark = docs.sparkSession
    import spark.implicits._
    Seq((n, nBuckets)).toDF("n", "n_buckets")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/meta")
    val sh = wordShingles(docs, id, text, n)
      .withColumnRenamed(id, "id")
    sh.withColumn("bkt", containmentBucket(nBuckets))
      .write.mode("overwrite").partitionBy("bkt").parquet(s"$path/postings")
    sh.groupBy(col("id"))
      .agg(sort_array(collect_list(col("shingle"))).as("sh_sorted"))
      .write.mode("overwrite").parquet(s"$path/docs")
  }

  /** Incrementally add training documents to a saved
    * [[containmentIndexBuild]] index: arrivals are shingled through
    * the same path and appended — only their buckets' directories
    * gain posting files. Ids must be new (a re-sent id would simply
    * duplicate its rows; dedupe upstream). */
  def containmentIndexAppend(newDocs: DataFrame, id: String,
      text: String, path: String): Unit = {
    val spark = newDocs.sparkSession
    val meta = spark.read.parquet(s"$path/meta").head()
    val (n, nBuckets) = (meta.getAs[Int]("n"), meta.getAs[Int]("n_buckets"))
    val sh = wordShingles(newDocs, id, text, n)
      .withColumnRenamed(id, "id")
    sh.withColumn("bkt", containmentBucket(nBuckets))
      .write.mode("append").partitionBy("bkt").parquet(s"$path/postings")
    sh.groupBy(col("id"))
      .agg(sort_array(collect_list(col("shingle"))).as("sh_sorted"))
      .write.mode("append").parquet(s"$path/docs")
  }

  /** The containment index's posting bucket — a pure function of the
    * shingle, so probe and build always agree. */
  private[graft] def containmentBucket(nBuckets: Int): Column =
    pmod(Sampling.portableHash(col("shingle"), "ctn:"), lit(nBuckets))
      .cast("int")

  /** Width-parameterized SimHash signature core: the sign of each
    * bit's +1/−1 token balance, over bits 0..bits−1 of the portable
    * 48-bit hash. 16-bit and 32-bit tiers share this one spelling so
    * their signatures agree on the low bits by construction. */
  private def simhashSigs(docs: DataFrame, id: String,
      text: String, bits: Int): DataFrame = {
    val tok = docs.select(col(id),
      explode(array_distinct(split(col(text), " "))).as("term"))
      .withColumn("h", expr(pHash("term")))
    val balCols = (0 until bits).map(j =>
      sum(expr(s"CASE WHEN (shiftright(h, $j) & 1) = 1 THEN 1 ELSE -1 END"))
        .as(s"bal$j"))
    val simExpr = (0 until bits).map(j =>
      s"CASE WHEN bal$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
      .mkString(" + ")
    tok.groupBy(col(id))
      .agg(balCols.head, balCols.tail: _*)
      .select(col(id), expr(simExpr).as("simhash"))
  }

  /** 16-bit SimHash signatures over distinct tokens: (id, simhash). */
  def simhashSignatures(docs: DataFrame, id: String,
      text: String): DataFrame = simhashSigs(docs, id, text, 16)

  /** 32-bit SimHash signatures over distinct tokens: (id, simhash) —
    * the precision tier for template-heavy corpora where 16 bits
    * pair a third of the corpus (the multimodal phash case). */
  def simhashSignatures32(docs: DataFrame, id: String,
      text: String): DataFrame = simhashSigs(docs, id, text, 32)

  /** Banded pigeonhole pair core: 4 bands of `bw` bits each; exact
    * for Hamming ≤ 3 (4 bands, ≤ 3 differing bits → some band equal),
    * and every pair survives exactly once (first-equal-band filter). */
  /** (id, simhash) → one row per 4 `bw`-bit Hamming bands:
    * (<id>, simhash, band, bk). THE one spelling of the banding
    * invariant — the in-memory pair joins and the saved phash index
    * ([[Multimodal.phashIndexBuild]]) must extract identical band
    * keys or probe and build silently desynchronize. */
  private[graft] def simhashBanded(sim: DataFrame, id: String,
      bw: Int): DataFrame =
    sim.select(col(id), col("simhash"),
        explode(expr("sequence(0, 3)")).as("band"))
      .withColumn("bk",
        expr(s"CAST(shiftright(simhash, band * $bw)" +
          s" & ${(1 << bw) - 1} AS INT)"))

  private def simhashPairsBanded(sim: DataFrame, id: String,
      maxHamming: Int, bw: Int): DataFrame = {
    require(maxHamming <= 3,
      "4-band pigeonhole is exact only for Hamming <= 3")
    val mask = (1 << bw) - 1
    val banded = simhashBanded(sim, id, bw)
    val a = banded.select(col("band"), col("bk"),
      col(id).as("doc1"), col("simhash").as("s1"))
    val b = banded.select(col("band"), col("bk"),
      col(id).as("doc2"), col("simhash").as("s2"))
    // the pinned round-robin repartition parallelizes the explosive
    // probe side (AQE respects user-specified counts); the build side
    // carries no broadcast hint — it is corpus-cardinality, so the
    // join strategy is left to AQE's runtime stats
    a.repartition(nPart(sim))
      .join(b, Seq("band", "bk"))
      .filter(col("doc1") < col("doc2"))
      .filter(expr(
        s"""band = CASE WHEN (s1 & $mask) = (s2 & $mask) THEN 0
           |  WHEN (shiftright(s1, $bw) & $mask)
           |     = (shiftright(s2, $bw) & $mask) THEN 1
           |  WHEN (shiftright(s1, ${2 * bw}) & $mask)
           |     = (shiftright(s2, ${2 * bw}) & $mask) THEN 2
           |  ELSE 3 END""".stripMargin))
      .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS INT)"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc1"), col("doc2"), col("hamming"))
  }

  /** SimHash near-dup pairs within `maxHamming` (≤ 3) over 16 bits:
    * (doc1, doc2, hamming). 4×4-bit banded equi-join. */
  def simhashPairs(sim: DataFrame, id: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsBanded(sim, id, maxHamming, bw = 4)

  /** SimHash near-dup pairs within `maxHamming` (≤ 3) over 32 bits:
    * (doc1, doc2, hamming). 4×8-bit banded equi-join — 256-way band
    * keys, so candidate fan-in drops ~16× vs the 16-bit tier. */
  def simhashPairs32(sim: DataFrame, id: String,
      maxHamming: Int = 3): DataFrame =
    simhashPairsBanded(sim, id, maxHamming, bw = 8)

  /** Exact Jaccard ≥ num/den pairs from a shingle table:
    * (doc1, doc2, jaccard). Strategy chosen from df stats: the direct
    * inverted-index join when its exact output bound Σ df·(df−1)/2 is
    * near-linear, the PPJoin prefix-filtered plan when any shingle is
    * hot. The threshold is a RATIONAL (num/den) so every filter bound
    * is integer-exact — no floating ceil can over-prune. This is THE
    * single copy of the strategy heuristic; the contract query
    * delegates here. A caller who already materialized the
    * (shingle, df) document-frequency table donates it via `dfreq`
    * and skips both the probe's and PPJoin's recount. */
  def jaccardPairs(shingles: DataFrame, id: String,
      num: Int = 1, den: Int = 2, shingle: String = "shingle",
      dfreq: Option[DataFrame] = None): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0, 1]")
    val sh = shingles.select(col(id), col(shingle).as("shingle"))
    val df = dfreq.getOrElse(
      sh.groupBy(col("shingle")).agg(count(lit(1)).as("df")))
    val stats = df
      .agg(sum(expr("df * (df - 1)")).as("pairs2x"),
        sum(col("df")).as("postings"))
      .head()
    val naivePairs = if (stats.isNullAt(0)) 0L else stats.getLong(0) / 2
    val postings = if (stats.isNullAt(1)) 0L else stats.getLong(1)
    if (naivePairs <= 20L * postings)
      jaccardPairsInverted(sh, id, num, den)
    else jaccardPairsPPJoin(sh, id, num, den, dfreq = Some(df))
  }

  /** Direct inverted-index Jaccard plan (flat df distributions). */
  def jaccardPairsInverted(shingles: DataFrame, id: String,
      num: Int, den: Int): DataFrame = {
    val sizes = shingles.groupBy(col(id)).agg(count(lit(1)).as("n"))
    shingles.select(col(id).as("d1"), col("shingle"))
      .repartition(nPart(shingles), col("shingle"))
      .join(shingles.select(col(id).as("d2"), col("shingle")),
        Seq("shingle"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
      // per-doc size frames are corpus-cardinality: no broadcast hint
      // (AQE picks broadcast from runtime stats when they are small)
      .join(sizes.withColumnRenamed(id, "d1")
        .withColumnRenamed("n", "n1"), Seq("d1"))
      .join(sizes.withColumnRenamed(id, "d2")
        .withColumnRenamed("n", "n2"), Seq("d2"))
      .filter(col("i") * den >= (col("n1") + col("n2") - col("i")) * num)
      .select(col("d1").as("doc1"), col("d2").as("doc2"),
        round(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 6)
          .as("jaccard"))
  }

  /** PPJoin prefix-filtered Jaccard plan (skew-safe; see
    * graft.operators.DedupQueries for the lossless-ness argument). */
  def jaccardPairsPPJoin(shingles: DataFrame, id: String,
      num: Int, den: Int, dfreq: Option[DataFrame] = None): DataFrame = {
    graft.functions.SetExpressions.register(shingles.sparkSession)
    val p = nPart(shingles)
    val dfreqT = dfreq.getOrElse(shingles.groupBy(col("shingle"))
      .agg(count(lit(1)).as("df")))
    // arr is ordered rarest-first (df, shingle) for prefix generation;
    // sarr is the SAME set shingle-sorted, feeding the early-exit
    // merge-count in the verify stage (one in-memory sort per doc —
    // no extra shuffle)
    val docArr = shingles.join(dfreqT, Seq("shingle"))
      .groupBy(col(id))
      .agg(array_sort(collect_list(struct(col("df"), col("shingle"))))
        .as("ss"))
      .select(col(id),
        expr("transform(ss, x -> x.shingle)").as("arr"),
        size(col("ss")).as("n"))
      .withColumn("sarr", array_sort(col("arr")))
    // prefix length n − ⌈t·n⌉ + 1, exact in integers
    val pref = docArr
      .withColumn("plen", expr(s"n - ((n * $num + $den - 1) div $den) + 1"))
      .select(col(id), col("n"),
        posexplode(expr("slice(arr, 1, CAST(plen AS INT))"))
          .as(Seq("pos", "shingle")))
    // required overlap α = ⌈num·(n1+n2)/(den+num)⌉ — integer-exact via
    // α ≤ x  ⟺  num·(n1+n2) ≤ (den+num)·x
    val cand = pref.select(col(id).as("d1"), col("n").as("n1"),
        (col("pos") + 1).as("rk1"), col("shingle"))
      .repartition(p, col("shingle"))
      .join(pref.select(col(id).as("d2"), col("n").as("n2"),
        (col("pos") + 1).as("rk2"), col("shingle")), Seq("shingle"))
      .filter(col("d1") < col("d2") &&
        least(col("n1"), col("n2")) * den >=
          greatest(col("n1"), col("n2")) * num &&
        (lit(1) + least(col("n1") - col("rk1"), col("n2") - col("rk2")))
          * (den + num) >= (col("n1") + col("n2")) * num)
      .select(col("d1"), col("d2")).distinct()
    // verify: early-exit sorted-merge count. i ≥ α ⟺ J ≥ num/den with
    // α = ⌈num·(n1+n2)/(den+num)⌉ (integer-exact); pairs that cannot
    // reach α bail out mid-merge and return a partial count < α, which
    // the threshold filter drops — identical result set, and the bulk
    // of candidates (dissimilar pairs on dup-dense corpora, where the
    // verify stage is output-bound) stop at their first divergence
    cand.repartition(p)
      .join(docArr.select(col(id).as("d1"), col("sarr").as("a1"),
        col("n").as("n1")), Seq("d1"))
      .join(docArr.select(col(id).as("d2"), col("sarr").as("a2"),
        col("n").as("n2")), Seq("d2"))
      .withColumn("i", expr(s"sorted_intersect_count(a1, a2, " +
        s"CAST((($num * (n1 + n2)) + ${den + num - 1}) div ${den + num} AS INT))"))
      .filter(col("i") * den >= (col("n1") + col("n2") - col("i")) * num)
      .select(col("d1").as("doc1"), col("d2").as("doc2"),
        round(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 6)
          .as("jaccard"))
  }

  /** Cross-set n-gram CONTAINMENT pairs — the train-test
    * contamination check an LLM eval pipeline runs (cf. Lee et al.,
    * "Deduplicating Training Data Makes Language Models Better", ACL
    * 2022, and the eval-contamination appendices of LLM reports):
    * for every EVAL document A and TRAIN document B,
    * containment(A, B) = |shingles(A) ∩ shingles(B)| / |shingles(A)|
    * — asymmetric on purpose: a short eval prompt fully quoted inside
    * a long train document scores 1.0 where Jaccard would vanish.
    * Returns (eval_id, train_id, containment ≥ num/den), threshold
    * integer-exact.
    *
    * Plan: inverted-index equi-join on the shingle, restricted to
    * cross-set (eval × train) postings, then one count aggregate —
    * the same skew caveat as [[jaccardPairsInverted]] applies (a hot
    * shingle inflates the posting join; at scale drop stopword-grade
    * shingles first via a df cap on the donated `dfreq`). */
  def containmentPairs(shingles: DataFrame, id: String, isEval: Column,
      num: Int = 1, den: Int = 2,
      shingle: String = "shingle"): DataFrame = {
    require(num > 0 && den > 0 && num <= den, "threshold must be in (0, 1]")
    val sh = shingles.select(col(id), col(shingle).as("shingle"),
      isEval.as("is_eval"))
    val ev = sh.filter(col("is_eval"))
      .select(col(id).as("eval_id"), col("shingle"))
    val tr = sh.filter(!col("is_eval"))
      .select(col(id).as("train_id"), col("shingle"))
    val sizes = ev.groupBy(col("eval_id")).agg(count(lit(1)).as("n"))
    ev.repartition(nPart(shingles), col("shingle"))
      .join(tr, Seq("shingle"))
      .groupBy(col("eval_id"), col("train_id"))
      .agg(count(lit(1)).as("i"))
      // eval-side size frame is eval-set-cardinality: no broadcast
      // hint (AQE promotes from runtime stats when genuinely small)
      .join(sizes, Seq("eval_id"))
      .filter(col("i") * den >= col("n") * num)
      .select(col("eval_id"), col("train_id"),
        round(col("i").cast("double") / col("n"), 6).as("containment"))
  }

  /** Exact all-pairs cosine ≥ tau over a vector table (id, vec:
    * array<double>): (v1, v2, cosine). Block-pair equi-join — every
    * unordered pair meets under exactly one (lo, hi) key, so recall
    * is provably 1.0 while the O(n²) work spreads across
    * blocks·(blocks+1)/2 shuffle keys. */
  def cosinePairs(vecs: DataFrame, id: String, vec: String,
      tau: Double, blocks: Int = 16): DataFrame = {
    graft.functions.VectorExpressions.register(vecs.sparkSession)
    val e = vecs
      .select(col(id).as("vid"), col(vec).as("v"))
      .withColumn("nrm", expr("vec_norm(v)"))
      // hash-derived block (see Similarity.labelPairs): keeps the
      // per-key bound on strided/sharded id spaces and admits
      // string ids; the block key never affects the result set.
      .withColumn("blk", pmod(Sampling.portableHash(col("vid"), "blk:"),
        lit(blocks)).cast("int"))
    val lft = e.select(col("vid").as("id1"), col("v").as("va"),
      col("nrm").as("na"), col("blk").as("lo"),
      explode(expr(s"sequence(blk, ${blocks - 1})")).as("hi"))
    val rgt = e.select(col("vid").as("id2"), col("v").as("vb"),
      col("nrm").as("nb"), explode(expr("sequence(0, blk)")).as("lo"),
      col("blk").as("hi"))
    lft.repartition(nPart(vecs), col("lo"), col("hi"))
      .join(rgt, Seq("lo", "hi"))
      .filter(col("lo") =!= col("hi") || col("id1") < col("id2"))
      .withColumn("cosine", round(
        expr("vec_dot(va, vb)") / (col("na") * col("nb")), 6))
      .filter(col("cosine") >= tau)
      .select(least(col("id1"), col("id2")).as("v1"),
        greatest(col("id1"), col("id2")).as("v2"), col("cosine"))
  }

  /** Connected components over an undirected pair list: (node,
    * label), label = min node id of the component.
    *
    * Alternating large-star / small-star (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC 2014): each round is
    * two groupBy+join passes over the edge list, and the edge set
    * converges to per-component stars rooted at the minimum node in
    * O(log n) rounds REGARDLESS of component shape — unlike min-label
    * propagation, whose round count is the component DIAMETER (a
    * chain-shaped duplicate cluster, e.g. crawl mirrors, makes that
    * unbounded). Each round is localCheckpointed to truncate lineage.
    */
  def connectedComponents(pairs: DataFrame, src: String,
      dst: String): DataFrame =
    connectedComponentsWithRounds(pairs, src, dst)._1

  /** Canonical (a > b)-oriented deduped edge set plus the self-loop
    * node list (self-loops carry no connectivity but their nodes must
    * keep a label — they rejoin in the final aggregate). */
  private def canonicalEdges(pairs: DataFrame, src: String,
      dst: String): (DataFrame, DataFrame) = {
    val selfLoops = pairs.select(col(src).as("node"))
      .filter(col(src) === col(dst))
    val cur = pairs.select(col(src).as("x"), col(dst).as("y"))
      .filter(col("x") =!= col("y"))
      .select(greatest(col("x"), col("y")).as("a"),
        least(col("x"), col("y")).as("b"))
      .distinct()
      // lazy: every caller counts cur0 immediately (the loop's cnt0 /
      // the schedule probe), and that count materializes the cut
      .ckptLazy()
    (cur, selfLoops)
  }

  /** One LARGE-STAR pass over an (a > b)-oriented edge set: every
    * neighbor v > u links to min(Γ(u) ∪ {u}). Output keeps the
    * orientation and is NOT deduped — callers choose when to pay the
    * distinct (the alternating loop feeds it straight into
    * small-star, which dedups; the two-phase loop dedups each pass to
    * detect its fixed point). */
  private def largeStarPass(cur: DataFrame): DataFrame = {
    val nbr = cur.select(col("a").as("u"), col("b").as("v"))
      .union(cur.select(col("b").as("u"), col("a").as("v")))
    val m = nbr.groupBy(col("u"))
      .agg(min(least(col("v"), col("u"))).as("m"))
    nbr.join(m, Seq("u"))
      .filter(col("v") > col("u"))
      .select(col("v").as("a"), col("m").as("b"))
  }

  /** One SMALL-STAR pass: every neighbor v ≤ u (and u itself) links
    * to the minimum of that set — edges stay (bigger, smaller)
    * oriented; output deduped. */
  private def smallStarPass(cur: DataFrame): DataFrame = {
    val nbr = cur.select(col("a").as("u"), col("b").as("v"))
    val m = nbr.groupBy(col("u")).agg(min(col("v")).as("m"))
    nbr.join(m, Seq("u"))
      .select(col("v").as("n"), col("m"))
      .union(m.select(col("u").as("n"), col("m")))
      .filter(col("n") =!= col("m"))
      .select(col("n").as("a"), col("m").as("b"))
      .distinct()
  }

  /** One aggregate labels everything: star edges contribute
    * (member → root) and (root → root); self-loop nodes contribute a
    * self-label, which min() overrides whenever a real edge label
    * (always ≤ the node id, being the component minimum) exists. */
  private def labelStars(cur: DataFrame, selfLoops: DataFrame): DataFrame =
    cur.select(col("a").as("node"), col("b").as("label"))
      .union(cur.select(col("b").as("node"), col("b").as("label")))
      .union(selfLoops.select(col("node"), col("node").as("label")))
      .groupBy(col("node")).agg(min(col("label")).as("label"))

  /** [[connectedComponents]] plus the number of alternating rounds it
    * took to converge (for logarithmic-convergence assertions).
    * Throws if `maxRounds` is exhausted before the fixed point —
    * returning a mid-contraction edge set would silently produce
    * duplicate, non-minimum labels. The default budget of 256 covers
    * the proven O(log² n) worst case far beyond any feasible corpus
    * (observed behavior is O(log n): a 500-node chain takes ~8). */
  def connectedComponentsWithRounds(pairs: DataFrame, src: String,
      dst: String, maxRounds: Int = 256): (DataFrame, Int) = {
    val (cur0, selfLoops) = canonicalEdges(pairs, src, dst)
    alternatingLoop(cur0, cur0.count(), selfLoops, maxRounds)
  }

  private def alternatingLoop(cur0: DataFrame, cnt0: Long,
      selfLoops: DataFrame, maxRounds: Int): (DataFrame, Int) = {
    var cur = cur0
    var curCnt = cnt0
    var rounds = 0
    var done = curCnt == 0L
    while (!done && rounds < maxRounds) {
      // large-star flows un-deduped into small-star: its output is
      // ≤ |cur| rows and small-star dedups right after — one
      // materialization per round, not two. The cut is LAZY: the
      // count() below scans every partition, so it IS the
      // materializing action — an eager ckpt would spend a separate
      // job per round on the same work (r18 opt, guide §1.2; the
      // convergence check then reads the stored blocks)
      val ss = smallStarPass(largeStarPass(cur)).ckptLazy()
      rounds += 1
      val ssCnt = ss.count()
      // both frames are distinct sets, so equal count + empty
      // one-direction diff ⇒ set equality ⇒ fixed point reached
      done = ssCnt == curCnt && ss.except(cur).isEmpty
      cur = ss
      curCnt = ssCnt
    }
    if (!done)
      throw new IllegalStateException(
        s"connected components did not converge within $maxRounds rounds")
    (labelStars(cur, selfLoops), rounds)
  }

  /** TWO-PHASE variant (Kiveris et al., SoCC 2014, the two-phase
    * algorithm): run large-star ALONE to its fixed point, then
    * small-star alone to its fixed point, cycling until a whole
    * large+small cycle changes nothing. A pass here is ONE aggregate
    * + ONE join (an alternating round runs two of each), so on graphs
    * where one phase stabilizes quickly the total exchange count
    * drops — ConnectedComponentsSpec compares pass count against the
    * alternating loop's stage count on the 500-node chain and pins
    * the labels identical. Returns (labels, total passes). */
  def connectedComponentsTwoPhaseWithPasses(pairs: DataFrame,
      src: String, dst: String, maxPasses: Int = 512): (DataFrame, Int) = {
    val (cur0, selfLoops) = canonicalEdges(pairs, src, dst)
    twoPhaseLoop(cur0, cur0.count(), selfLoops, maxPasses)
  }

  private def twoPhaseLoop(cur0: DataFrame, cnt0: Long,
      selfLoops: DataFrame, maxPasses: Int): (DataFrame, Int) = {
    var cur = cur0
    var curCnt = cnt0
    var passes = 0
    // run `pass` to ITS fixed point; true iff any application changed
    // the edge set
    def stabilize(pass: DataFrame => DataFrame): Boolean = {
      var changed = false
      var stable = false
      while (!stable && passes < maxPasses) {
        // lazy cut + materializing count — one job per pass instead
        // of two (see alternatingLoop)
        val nxt = pass(cur).distinct().ckptLazy()
        passes += 1
        val cnt = nxt.count()
        stable = cnt == curCnt && nxt.except(cur).isEmpty
        if (!stable) changed = true
        cur = nxt
        curCnt = cnt
      }
      if (!stable)
        throw new IllegalStateException(
          s"two-phase components did not converge within $maxPasses passes")
      changed
    }
    if (curCnt > 0L) {
      var anyChange = true
      while (anyChange)
        anyChange = stabilize(largeStarPass) | stabilize(smallStarPass)
    }
    (labelStars(cur, selfLoops), passes)
  }

  /** STATS-DRIVEN contraction-schedule chooser (the jaccardPairs
    * Σdf·(df−1)/2 precedent applied to CC): probe the canonical pair
    * graph's average degree 2·|E|/|V| — |E| is the count every loop
    * takes anyway as its convergence state, |V| one extra bounded
    * aggregate — and pick the schedule the data wants. The
    * cleared-state 100× re-probe (BASELINE.md round-12 CC table)
    * measured TWO-PHASE 1.6–2.2× faster at crawl-mirror clone density
    * (dup clusters of ~100 → avg degree ≫ 4) while ALTERNATING wins
    * at fixture density (tiny cliques, avg degree < 3). Both
    * schedules contract to identical minimum-label stars — the choice
    * is pure speed, so callers keep their oracle either way. Returns
    * (labels, schedule-chosen, avg degree). */
  def connectedComponentsAuto(pairs: DataFrame, src: String,
      dst: String, denseAvgDegree: Double = 4.0)
      : (DataFrame, String, Double) = {
    val (cur0, selfLoops) = canonicalEdges(pairs, src, dst)
    val (nE, nV, sched) = scheduleProbe(cur0, denseAvgDegree)
    val avgDeg = if (nV == 0) 0.0 else 2.0 * nE / nV
    if (sched == "two_phase")
      (twoPhaseLoop(cur0, nE, selfLoops, 512)._1, sched, avgDeg)
    else
      (alternatingLoop(cur0, nE, selfLoops, 256)._1, sched, avgDeg)
  }

  /** The chooser's density probe alone: (|E|, |V|, schedule) over the
    * canonical edge set — the decision is the INTEGER compare
    * 2·|E| ≥ denseAvgDegree·|V| (exact for integer thresholds), so an
    * oracle can replay it verbatim (dedup_cluster_stats). */
  private def scheduleProbe(cur0: DataFrame,
      denseAvgDegree: Double): (Long, Long, String) = {
    val nE = cur0.count()
    val nV = cur0.select(col("a").as("n"))
      .union(cur0.select(col("b").as("n"))).distinct().count()
    // Integral thresholds (the default 4.0, and anything a caller
    // passes that is a whole number) compare in exact Long arithmetic
    // so the emitted schedule string matches the oracle's BIGINT
    // replay (2*n_edges >= t*n_nodes) at ANY count — double math
    // loses exactness past 2^52 edges, which a 100-TB crawl can reach.
    val dense = nV > 0 && {
      if (denseAvgDegree.isWhole)
        2L * nE >= denseAvgDegree.toLong * nV
      else 2.0 * nE >= denseAvgDegree * nV
    }
    (nE, nV, if (dense) "two_phase" else "alternating")
  }

  /** [[scheduleProbe]] for callers holding a raw pair list. */
  def ccScheduleProbe(pairs: DataFrame, src: String, dst: String,
      denseAvgDegree: Double = 4.0): (Long, Long, String) =
    scheduleProbe(canonicalEdges(pairs, src, dst)._1, denseAvgDegree)

  /** INCREMENTAL connected-components apply: given yesterday's saved
    * labeling `state` (one (node, label) row per base-graph node,
    * label = component minimum) and today's `newPairs`, return the
    * labeling of the merged graph — equal to
    * `CC(state-as-edges ∪ newPairs)` but ITERATING ONLY ON
    * DELTA-TOUCHED COMPONENTS:
    *
    *  - a base component none of whose members touches a new pair
    *    cannot gain or lose members, and its label (its minimum node
    *    id) cannot change — its state rows pass straight to the
    *    output, no contraction work;
    *  - the contraction runs on the touched components' label edges
    *    plus the new pairs only. Every member of a touched component
    *    is present (each has a state row keyed by the touched label),
    *    labels are min node ids, so the merged component's minimum is
    *    found by the restricted CC exactly as the full one would.
    *
    * Scale shape: the daily apply costs two semi-joins of the state
    * (both keyed, map-side-combining distincts) plus a CC whose input
    * is |touched state rows| + |new pairs| — arrival-bounded, while
    * `CC(state ∪ newPairs)` re-contracts every base star every day.
    * Pinned ≡ the unrestricted merge in ConnectedComponentsSpec. */
  def connectedComponentsIncremental(state: DataFrame, node: String,
      label: String, newPairs: DataFrame, src: String,
      dst: String): DataFrame = {
    val st = state.select(col(node).as("node"), col(label).as("label"))
    val np = newPairs.select(col(src).as("p1"), col(dst).as("p2"))
    // QUOTIENT graph: contract each arrival-pair endpoint through
    // yesterday's labeling (an endpoint with no state row — a fresh
    // arrival, or a base node that had no base pairs — stays itself).
    // Super-nodes are component labels and fresh ids; CC runs on
    // |newPairs| quotient edges REGARDLESS of how many members the
    // touched components have (contracting to label edges and
    // re-walking member stars — the previous shape — pays |touched
    // members| rows per pass; a touched million-member component costs
    // a million star edges there, one super-node here).
    val e1 = np
      .join(st.select(col("node").as("p1"), col("label").as("l1")),
        Seq("p1"), "left")
      .join(st.select(col("node").as("p2"), col("label").as("l2")),
        Seq("p2"), "left")
      .select(coalesce(col("l1"), col("p1")).as("q1"),
        coalesce(col("l2"), col("p2")).as("q2"))
    // Labels are component MINIMUM ids, so the min over a merged
    // super-component's super-node ids IS the min over its underlying
    // nodes — CC on the quotient graph yields the exact global labels.
    // ckpt: three consumers below (two relabel joins + the fresh-id
    // anti-join) must not re-run the contraction per subtree.
    val qlab = connectedComponents(e1, "q1", "q2").ckpt()
    val sup = qlab.select(col("node").as("label"), col("label").as("nl"))
    // touched members: state rows relabeled through their
    // super-component; fresh ids: their own quotient row IS the
    // labeling; untouched components: state rows pass through (no new
    // pair touches any member, so membership and minimum are frozen)
    val touchedOut = st.join(sup, Seq("label"))
      .select(col("node"), col("nl").as("label"))
    val freshOut = qlab.join(st, Seq("node"), "left_anti")
    val untouched = st.join(sup.select(col("label")),
      Seq("label"), "left_anti")
    touchedOut.unionByName(freshOut)
      .unionByName(untouched.select(col("node"), col("label")))
  }

  /** The end-to-end per-document dedup DECISION a training pipeline
    * ships: one row per document with its fate — `drop_exact`
    * (byte-identical text, not the smallest id), `drop_near` (member
    * of a MinHash near-dup cluster but not its representative = the
    * cluster's min id), `keep` otherwise; exact wins over near.
    * Composed from the verified building blocks: exact-dup min
    * aggregate + banded MinHash pairs + [[connectedComponents]]. A
    * caller who already materialized the near-dup pair list (e.g.
    * through a session memo) donates it via `pairs`.
    *
    * The exact stage is the same shape as `dedup_exact`: the keep of
    * a text group is min(id), computed by an AGGREGATE — partial mins
    * combine map-side, so a hot duplicate text (the very case dedup
    * exists for) collapses to one row per input partition BEFORE the
    * exchange, where a `row_number() over (partition by text)` window
    * would shuffle every copy of the hot text to a single task keyed
    * by the full text string. Membership then attaches back on the
    * uniformly-distributed id key, never on text. */
  def keepList(docs: DataFrame, id: String, text: String,
      minEst: Double = 0.5, pairs: Option[DataFrame] = None): DataFrame = {
    val exKeep = docs.select(col(id), col(text))
      .groupBy(col(text)).agg(min(col(id)).as(id))
      .select(col(id), lit(true).as("ex_keep"))
    val p = pairs.getOrElse(
      minhashBandPairs(minhashSignatures(
        wordShingles(docs, id, text), id), id, minEst))
      .select(col("doc1"), col("doc2"))
    // schedule picked by the pair graph's measured density — labels
    // are schedule-invariant (see connectedComponentsAuto)
    val lab = connectedComponentsAuto(p, "doc1", "doc2")._1
      .select(col("node").as(id), col("label").as("rep"))
    docs.select(col(id))
      .join(exKeep, Seq(id), "left")
      .join(lab, Seq(id), "left")
      .select(col(id),
        when(col("ex_keep").isNull, "drop_exact")
          .when(col("rep").isNotNull && col("rep") =!= col(id), "drop_near")
          .otherwise("keep").as("status"))
  }
}
