package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{GQuery, PlanCache}
import graft.sources.Tables

/** Deduplication operators for LLM-training-data pipelines
  * (SURVEY.md §2.8): exact, MinHash+LSH, SimHash, n-gram Jaccard and
  * embedding-cosine near-dup, plus cluster formation.
  *
  * Published algorithms re-expressed Spark-first: MinHash signatures
  * and banded LSH (Broder, "On the resemblance and containment of
  * documents", 1997; banding per Leskovec/Rajaraman/Ullman, Mining of
  * Massive Datasets ch. 3), SimHash with Hamming-band search (Charikar,
  * STOC 2002; Manku/Jain/Sarma, WWW 2007), prefix-filtered set-
  * similarity join (Bayardo/Ma/Srikant "All Pairs", WWW 2007;
  * Xiao et al. "PPJoin", WWW 2008), and min-label-propagation
  * connected components (the hash-to-min shape of Rastogi et al.,
  * ICDE 2013).
  *
  * Portability design: every hash is derived from md5 (identical bytes
  * in every engine) — 12 hex chars → a 48-bit non-negative BIGINT — so
  * the DuckDB oracle can replay the *same* signatures, not just the
  * same decisions. Engine-native `hash()` differs between Spark
  * (Murmur3) and DuckDB and would force no-oracle.
  *
  * Scale notes:
  *  - exact dedup shuffles once on the text hash; the kept-row choice
  *    (min doc_id) is deterministic, not "whichever arrived first";
  *  - MinHash signatures reduce each doc to 8 ints (shuffle payload is
  *    tiny); LSH banding (4 bands × 2 rows) turns the quadratic
  *    all-pairs search into 4 equi-joins on band keys — the only pairs
  *    ever materialized are bucket collisions, which is what makes
  *    near-dedup feasible at 100 TB;
  *  - SimHash pairs use a bounded self-join here (500 docs); at scale
  *    the same signature joins on bit-bands like MinHash;
  *  - n-gram Jaccard joins through an inverted shingle index (pairs
  *    sharing ≥1 shingle), never the full cross product.
  */
object DedupQueries {

  /** Portable 48-bit hash: seed-prefixed md5, first 12 hex chars. */
  private def pHash(seedAndVal: String): String =
    s"CAST(conv(substr(md5($seedAndVal), 1, 12), 16, 10) AS BIGINT)"

  /** DuckDB spelling of the same hash. */
  private def duckHash(seedAndVal: String): String =
    s"CAST(concat('0x', substr(md5($seedAndVal), 1, 12)) AS BIGINT)"

  /** Word 3-gram shingles, distinct per doc (Spark side). Uses the
    * native word_ngrams expression — the higher-order transform form
    * runs an interpreted lambda per shingle and was the hottest stage
    * of the whole dedup pipeline. Memoized + persisted per (session,
    * dir): the minhash signature pass and the Jaccard verify both
    * consume it, so the corpus is tokenized once per session. */
  private def shingles(s: SparkSession, dir: String): DataFrame =
    PlanCache.memo(s, dir, "shingles") {
      graft.functions.TextExpressions.register(s)
      // per-doc set semantics via array_distinct BEFORE the explode:
      // the dedup key is (doc_id, shingle), so deduping inside the row
      // needs NO shuffle — a .distinct() here would shuffle every raw
      // shingle occurrence (~5× the distinct count) across the cluster.
      Tables.documentsSpread(s, dir)
        .select(col("doc_id"),
          explode(expr("array_distinct(word_ngrams(split(text, ' '), 3))"))
            .as("shingle"))
    }

  private val duckShingles =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |          for i in generate_series(1, len(t) - 2)]) AS shingle
      |  FROM toks)""".stripMargin

  /** Exact dedup on text (keep min doc_id), survivors per lang. */
  val dedupExact: GQuery = GQuery(
    "dedup_exact",
    """SELECT lang, count(*) AS n_docs, CAST(min(doc_id) AS BIGINT) AS min_doc
      |FROM (SELECT doc_id, lang,
      |        row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |      FROM documents)
      |WHERE rn = 1
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("text")).orderBy(col("doc_id"))
    Tables.documents(s, dir)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("doc_id")).as("min_doc"))
      .orderBy(col("lang"))
  }

  /** MinHash (8 portable hash functions) + LSH banding (4 bands × 2
    * rows) → candidate pairs with estimated Jaccard ≥ 0.5.
    *
    * The 8 hash functions are carved out of TWO md5 digests (4 × 32-bit
    * slices each) instead of eight seeded md5 calls — md5 is the hot
    * instruction of the signature pass, so this is a ~4× kernel win
    * with identical statistical behavior (independent 32-bit
    * universals), and the oracle slices the same digests. */
  private val bands = Seq((0, 1), (2, 3), (4, 5), (6, 7))

  /** MinHash signature table (doc_id, h0..h7), memoized per (session,
    * dir): it feeds both join sides of the candidate join plus the
    * edit-distance refinement — at 100 TB the signature table is the
    * thing you materialize, and the corpus is scanned exactly once. */
  private def minhashSig(s: SparkSession, dir: String): DataFrame =
    PlanCache.memo(s, dir, "minhash_sig") {
      val hashCols = (0 to 7).map { i =>
        val m = i / 4; val j = i % 4
        expr(s"CAST(conv(substr(m$m, ${1 + 8 * j}, 8), 16, 10) AS BIGINT)")
          .as(s"x$i")
      }
      // md5 is the kernel cost of the signature pass: digest each
      // DISTINCT shingle once (the memoized df table already holds the
      // dictionary — ~10× fewer digests than hashing every posting)
      // and broadcast the tiny (shingle → 8 slices) dictionary back
      // onto the postings. At a scale where the dictionary outgrows
      // broadcast, inline per-posting hashing is the right plan again
      // (cheaper than a shuffle join) — this is a bounded-dictionary
      // optimization, not the only shape.
      val dict = shingleDfreq(s, dir)
        .withColumn("m0", expr("md5(concat('0:', shingle))"))
        .withColumn("m1", expr("md5(concat('1:', shingle))"))
        .select(col("shingle") +: hashCols: _*)
      // columnar signature: 8 per-shingle hash columns → one partial
      // (map-side) 8-way min aggregate; no row explosion, one shuffle
      // of 8 longs per doc.
      val sigCols = (0 to 7).map(k => min(col(s"x$k")).as(s"h$k"))
      shingles(s, dir).join(broadcast(dict), Seq("shingle"))
        .groupBy(col("doc_id")).agg(sigCols.head, sigCols.tail: _*)
    }

  /** (doc1, doc2, est_jaccard ≥ 0.5) candidate pairs — shared by the
    * minhash contract query, the edit-distance refinement, and
    * cluster formation; memoized so the band join runs once. */
  private def minhashPairsSpark(s: SparkSession, dir: String): DataFrame =
    PlanCache.memo(s, dir, "minhash_pairs") {
      val sig = minhashSig(s, dir)
      // single equi-join on an exploded (band, key1, key2) instead of a
      // union of 4 joins — one exchange, one build side.
      val bandArr = bands.zipWithIndex.map { case ((x, y), bi) =>
        s"named_struct('b', $bi, 'k1', h$x, 'k2', h$y)"
      }.mkString("array(", ", ", ")")
      val banded = sig.select(col("doc_id"),
        explode(expr(bandArr)).as("band"))
        .select(col("doc_id"), col("band.b").as("b"),
          col("band.k1").as("k1"), col("band.k2").as("k2"))
      val candidates = banded.select(col("doc_id").as("doc1"), col("b"),
        col("k1"), col("k2"))
        .join(banded.select(col("doc_id").as("doc2"), col("b"),
          col("k1"), col("k2")), Seq("b", "k1", "k2"))
        .filter(col("doc1") < col("doc2"))
        .select(col("doc1"), col("doc2")).distinct()
      val agree = (0 to 7).map(k =>
        when(col(s"a_h$k") === col(s"b_h$k"), 1).otherwise(0))
        .reduce(_ + _)
      val aSig = (0 to 7).foldLeft(sig.withColumnRenamed("doc_id", "doc1")) {
        (d, k) => d.withColumnRenamed(s"h$k", s"a_h$k") }
      val bSig = (0 to 7).foldLeft(sig.withColumnRenamed("doc_id", "doc2")) {
        (d, k) => d.withColumnRenamed(s"h$k", s"b_h$k") }
      candidates
        .join(broadcast(aSig), Seq("doc1"))
        .join(broadcast(bSig), Seq("doc2"))
        .select(col("doc1"), col("doc2"),
          (agree.cast("double") / 8).as("est_jaccard"))
        .filter(col("est_jaccard") >= 0.5)
  }

  /** DuckDB CTE chain ending in `pairs(doc1, doc2, est_jaccard)` —
    * the oracle twin of [[minhashPairsSpark]]. */
  private val minhashPairsCte: String = {
    val bandCond = bands.map { case (x, y) =>
      s"(a.h$x = b.h$x AND a.h$y = b.h$y)" }.mkString(" OR ")
    val agree = (0 to 7).map(k =>
      s"CASE WHEN a.h$k = b.h$k THEN 1 ELSE 0 END").mkString(" + ")
    val duckMins = (0 to 7).map { i =>
      val m = i / 4; val j = i % 4
      s"min(CAST(concat('0x', substr(m$m, ${1 + 8 * j}, 8)) AS BIGINT)) AS h$i"
    }.mkString(", ")
    s"""$duckShingles,
       |dig AS (SELECT doc_id, md5('0:' || shingle) AS m0,
       |    md5('1:' || shingle) AS m1 FROM sh),
       |sig AS (SELECT doc_id, $duckMins FROM dig GROUP BY doc_id),
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
       |    CAST($agree AS DOUBLE) / 8 AS est_jaccard
       |  FROM sig a JOIN sig b
       |    ON a.doc_id < b.doc_id AND ($bandCond)
       |  WHERE CAST($agree AS DOUBLE) / 8 >= 0.5)""".stripMargin
  }

  val dedupNearMinhash: GQuery = GQuery(
    "dedup_near_minhash",
    s"""$minhashPairsCte
       |SELECT doc1, doc2, est_jaccard FROM pairs
       |ORDER BY doc1, doc2""".stripMargin) { (s, dir) =>
    minhashPairsSpark(s, dir).orderBy(col("doc1"), col("doc2"))
  }

  /** Edit-distance refinement of the MinHash candidates: exact
    * Levenshtein over the (tiny) candidate pair set — the classic
    * two-stage near-dedup: cheap sketch prunes, exact metric decides.
    * The quadratic-cost metric only ever touches candidate pairs. */
  val dedupEditDistance: GQuery = GQuery(
    "dedup_edit_distance",
    s"""$minhashPairsCte
       |SELECT p.doc1, p.doc2, p.est_jaccard,
       |  CAST(levenshtein(da.text, db.text) AS INT) AS edit_dist
       |FROM pairs p
       |JOIN documents da ON p.doc1 = da.doc_id
       |JOIN documents db ON p.doc2 = db.doc_id
       |ORDER BY doc1, doc2""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    minhashPairsSpark(s, dir)
      .join(broadcast(docs.select(col("doc_id").as("doc1"),
        col("text").as("text1"))), Seq("doc1"))
      .join(broadcast(docs.select(col("doc_id").as("doc2"),
        col("text").as("text2"))), Seq("doc2"))
      .select(col("doc1"), col("doc2"), col("est_jaccard"),
        levenshtein(col("text1"), col("text2")).cast("int").as("edit_dist"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** Near-dup CLUSTER formation — the step that turns the pair list
    * into "keep one document per duplicate group": connected
    * components over the MinHash candidate-pair graph, labels = the
    * component's minimum doc_id, reported as (cluster_rep, n_members).
    *
    * Spark side: iterative min-label propagation (the Pregel/
    * hash-to-min shape) — per round, every node takes the min of its
    * own label and its neighbors'; monotone decreasing and bounded
    * below, so it converges in O(component diameter) rounds. Each
    * round is ONE equi-join + ONE partial-aggregating groupBy on the
    * (tiny relative to the corpus) edge list, `localCheckpoint`ed to
    * truncate lineage — the distributed shape that holds when the
    * pair graph has billions of edges. The driver only checks the
    * converged flag (a count), never the data.
    *
    * Oracle: DuckDB recursive CTE builds the transitive closure of
    * the same edges and takes the min reachable node per member. */
  val dedupClusters: GQuery = GQuery(
    "dedup_clusters",
    s"""${minhashPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
       |e AS (SELECT doc1 AS a, doc2 AS b FROM pairs
       |      UNION ALL SELECT doc2, doc1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |lab AS (SELECT a AS node, least(a, min(b)) AS cluster_rep
       |        FROM reach GROUP BY a)
       |SELECT cluster_rep, CAST(count(*) AS BIGINT) AS n_members
       |FROM lab GROUP BY cluster_rep
       |ORDER BY cluster_rep""".stripMargin) { (s, dir) =>
    val pairs = minhashPairsSpark(s, dir).select(col("doc1"), col("doc2"))
    val edges = pairs
      .union(pairs.select(col("doc2"), col("doc1")))
      .toDF("a", "b")
      .localCheckpoint(true)
    // seed with the ONE-HOP min (node ∧ min neighbor): duplicate
    // clusters are mostly cliques/stars, which then converge in zero
    // or one round instead of two.
    var lab = edges
      .groupBy(col("a"))
      .agg(least(col("a"), min(col("b"))).as("label"))
      .select(col("a").as("node"), col("label"))
      .localCheckpoint(true)
    var converged = false
    while (!converged) {
      val prop = lab.join(edges, lab("node") === edges("a"))
        .select(col("b").as("node"), col("label"))
      val next = lab.union(prop)
        .groupBy(col("node")).agg(min(col("label")).as("label"))
        .localCheckpoint(true)
      converged = next.join(lab.withColumnRenamed("label", "old"),
        Seq("node"))
        .filter(col("label") =!= col("old")).isEmpty
      lab = next
    }
    lab.groupBy(col("label").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("cluster_rep"))
  }

  /** 16-bit SimHash over distinct tokens; near-dup pairs = Hamming
    * distance ≤ 3.
    *
    * Pair generation is a banded equi-join, not an all-pairs scan:
    * Hamming ≤ 3 over 16 bits means at most 3 of the four 4-bit bands
    * differ, so (pigeonhole) AT LEAST ONE band is bit-identical.
    * Exploding 4 (band, 4-bit key) rows per doc and equi-joining on
    * them therefore finds EVERY qualifying pair — the post-filter
    * `bit_count ≤ 3` makes the result exactly the all-pairs answer
    * (the DuckDB oracle keeps the naive all-pairs SQL; results are
    * provably identical), while the plan is a shuffled equi-join that
    * parallelizes and scales where the previous BroadcastNestedLoopJoin
    * pinned O(n²) work on one task. */
  val dedupSimhash: GQuery = {
    val sparkImpl = (s: SparkSession, dir: String) => {
      // columnar bit balance: 16 per-bit signed sums in ONE aggregate
      // (map-side partial) instead of a 16× row explosion + 2 shuffles.
      // Memoized: both sides of the band join share it.
      val sim = PlanCache.memo(s, dir, "simhash_sig") {
        // per-doc distinct terms without a shuffle (see shingles)
        val tok = Tables.documentsSpread(s, dir)
          .select(col("doc_id"),
            explode(expr("array_distinct(split(text, ' '))")).as("term"))
          .withColumn("h", expr(pHash("term")))
        val balCols = (0 to 15).map(j =>
          sum(expr(s"CASE WHEN (shiftright(h, $j) & 1) = 1 THEN 1 ELSE -1 END"))
            .as(s"bal$j"))
        val simExpr = (0 to 15).map(j =>
          s"CASE WHEN bal$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
          .mkString(" + ")
        tok.groupBy(col("doc_id"))
          .agg(balCols.head, balCols.tail: _*)
          .select(col("doc_id"), expr(simExpr).as("simhash"))
      }
      val banded = sim.select(col("doc_id"), col("simhash"),
        explode(expr("sequence(0, 3)")).as("band"))
        .withColumn("bk",
          expr("CAST(shiftright(simhash, band * 4) & 15 AS INT)"))
      val a = banded.select(col("band"), col("bk"),
        col("doc_id").as("doc1"), col("simhash").as("s1"))
      val b = banded.select(col("band"), col("bk"),
        col("doc_id").as("doc2"), col("simhash").as("s2"))
      // stream side pinned to full ROUND-ROBIN parallelism: the band
      // join is output-explosive (~20k banded rows fan out to millions
      // of candidate pairs) so AQE must not coalesce the input, and
      // the band buckets are heavily skewed on a near-dup-rich corpus,
      // so partitioning BY the band key would pin a hot bucket's whole
      // fan-out on one task — a broadcast join needs no co-partition,
      // and round-robin spreads a hot bucket's stream rows evenly.
      // The build side is 4 rows/doc of two longs — always
      // broadcastable (at cluster scale: still just the signature
      // table, rebuild threshold permitting, else swap to shuffle join
      // with salting).
      a.repartition(s.sessionState.conf.numShufflePartitions)
        .join(broadcast(b), Seq("band", "bk"))
        .filter(col("doc1") < col("doc2"))
        // a pair can collide in several bands: keep it ONLY in its
        // FIRST equal band (cheap bit ops on values already in the
        // row) so every pair survives exactly once and no distinct
        // shuffle is needed on the multi-million-row candidate stream
        .filter(expr(
          """band = CASE WHEN (s1 & 15) = (s2 & 15) THEN 0
            |  WHEN (shiftright(s1, 4) & 15) = (shiftright(s2, 4) & 15) THEN 1
            |  WHEN (shiftright(s1, 8) & 15) = (shiftright(s2, 8) & 15) THEN 2
            |  ELSE 3 END""".stripMargin))
        .withColumn("hamming", expr("CAST(bit_count(s1 ^ s2) AS INT)"))
        .filter(col("hamming") <= 3)
        .select(col("doc1"), col("doc2"), col("hamming"))
        .orderBy(col("doc1"), col("doc2"))
    }
    GQuery("dedup_simhash",
      s"""WITH tok AS (SELECT DISTINCT doc_id,
         |    unnest(string_split(text, ' ')) AS term FROM documents),
         |th AS (SELECT doc_id, term, ${duckHash("term")} AS h FROM tok),
         |bits AS (SELECT doc_id,
         |  ${(0 to 15).map(j =>
             s"sum(CASE WHEN ((h >> $j) & 1) = 1 THEN 1 ELSE -1 END) AS bal$j")
             .mkString(", ")}
         |  FROM th GROUP BY doc_id),
         |sim AS (SELECT doc_id,
         |  ${(0 to 15).map(j =>
             s"CASE WHEN bal$j > 0 THEN CAST(${1L << j} AS BIGINT) ELSE 0 END")
             .mkString(" + ")} AS simhash
         |  FROM bits)
         |SELECT a.doc_id AS doc1, b.doc_id AS doc2,
         |  CAST(bit_count(xor(a.simhash, b.simhash)) AS INT) AS hamming
         |FROM sim a JOIN sim b ON a.doc_id < b.doc_id
         |WHERE bit_count(xor(a.simhash, b.simhash)) <= 3
         |ORDER BY doc1, doc2""".stripMargin)(sparkImpl)
  }

  /** Shingle document frequencies, memoized: the PPJoin global order,
    * the strategy cost probe, and the doc-array build all read it. */
  private def shingleDfreq(s: SparkSession, dir: String): DataFrame =
    PlanCache.memo(s, dir, "shingle_dfreq") {
      shingles(s, dir).groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    }

  /** Direct inverted-index plan: join every posting pair, aggregate
    * intersection sizes. Optimal when no shingle is hot (the join
    * output is Σ df·(df−1)/2 rows — near-linear on a flat df
    * distribution), quadratic disaster when one is. */
  private[operators] def ngramJaccardInverted(
      s: SparkSession, dir: String): DataFrame = {
    val sh = shingles(s, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    sh.select(col("doc_id").as("d1"), col("shingle"))
      // pinned partition count: the posting list is small in bytes but
      // the join output is quadratic per shingle — don't let AQE
      // coalesce the input of an output-explosive join
      .repartition(s.sessionState.conf.numShufflePartitions, col("shingle"))
      .join(sh.select(col("doc_id").as("d2"), col("shingle")),
        Seq("shingle"))
      .filter(col("d1") < col("d2"))
      .groupBy(col("d1"), col("d2")).agg(count(lit(1)).as("i"))
      .join(broadcast(sizes.withColumnRenamed("doc_id", "d1")
        .withColumnRenamed("n", "n1")), Seq("d1"))
      .join(broadcast(sizes.withColumnRenamed("doc_id", "d2")
        .withColumnRenamed("n", "n2")), Seq("d2"))
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("d1").as("doc1"), col("d2").as("doc2"), col("jaccard"))
  }

  /** Prefix-filtered plan (AllPairs/PPJoin), lossless:
    *
    * Under any global shingle order, J(A,B) ≥ t forces |A∩B| ≥ ⌈t·|A|⌉
    * and ≥ ⌈t·|B|⌉; the first common shingle (in that order) then sits
    * within the first |A| − ⌈t·|A|⌉ + 1 shingles of A AND the first
    * |B| − ⌈t·|B|⌉ + 1 of B. So candidate generation only joins those
    * PREFIXES — ordered rarest-first (ascending document frequency) so
    * hot shingles land at the end and never generate candidates; the
    * full Jaccard is then verified on candidates only against the
    * complete shingle sets. Survives a skewed corpus where the hottest
    * shingle alone would make [[ngramJaccardInverted]] quadratic. */
  private[operators] def ngramJaccardPPJoin(
      s: SparkSession, dir: String): DataFrame = {
    // verify step computes size(array_intersect(...)) per candidate —
    // install the counting rewrite so no intermediate array is built
    graft.plans.IntersectSizeRewrite.install(s)
    // per-doc shingle ARRAY, sorted rarest-first under the global
    // (document frequency, shingle) total order — built once and
    // memoized; both candidate generation (prefix slices) and
    // verification (array_intersect) read it.
    val docArr = PlanCache.memo(s, dir, "shingle_arrays") {
      shingles(s, dir).join(shingleDfreq(s, dir), Seq("shingle"))
        .groupBy(col("doc_id"))
        .agg(array_sort(collect_list(struct(col("df"), col("shingle"))))
          .as("ss"))
        .select(col("doc_id"),
          expr("transform(ss, x -> x.shingle)").as("arr"),
          size(col("ss")).as("n"))
    }
    // candidate generation: only each doc's PREFIX (the rarest
    // ⌊n/2⌋+1 = n − ⌈t·n⌉ + 1 shingles for t = 0.5) is indexed, with
    // the PPJoin length filter (2·min(n1,n2) ≥ max) and positional
    // filter (3·(1 + min(n1−rk1, n2−rk2)) ≥ n1+n2, i.e. the overlap
    // upper bound at the first shared prefix shingle must reach the
    // required ⌈(n1+n2)/3⌉) — both integer-exact and lossless.
    val pref = docArr.select(col("doc_id"), col("n"),
      posexplode(expr("slice(arr, 1, shiftright(n, 1) + 1)"))
        .as(Seq("pos", "shingle")))
    // prefix join pinned to full key-parallelism: the prefix index
    // is only a few MB (AQE would coalesce it to one partition) but
    // the self-join fans out quadratically per shingle; shingle df
    // is bounded by the prefix construction, so keyed partitioning
    // is skew-safe here.
    val nPart = s.sessionState.conf.numShufflePartitions
    val cand = pref.select(col("doc_id").as("d1"), col("n").as("n1"),
        (col("pos") + 1).as("rk1"), col("shingle"))
      .repartition(nPart, col("shingle"))
      .join(pref.select(col("doc_id").as("d2"), col("n").as("n2"),
        (col("pos") + 1).as("rk2"), col("shingle")), Seq("shingle"))
      .filter(col("d1") < col("d2") &&
        least(col("n1"), col("n2")) * 2 >= greatest(col("n1"), col("n2")) &&
        (lit(1) + least(col("n1") - col("rk1"), col("n2") - col("rk2"))) * 3
          >= col("n1") + col("n2"))
      .select(col("d1"), col("d2")).distinct()
    // verify: exact intersection of the full (distinct) shingle
    // arrays, one codegen'd array_intersect per surviving candidate.
    // Candidates are round-robin-spread first: the pair list is tiny
    // in bytes (AQE would coalesce it) but each row carries an
    // array-intersection's worth of CPU.
    cand.repartition(nPart)
      .join(docArr.select(col("doc_id").as("d1"), col("arr").as("a1"),
        col("n").as("n1")), Seq("d1"))
      .join(docArr.select(col("doc_id").as("d2"), col("arr").as("a2"),
        col("n").as("n2")), Seq("d2"))
      .withColumn("i", size(array_intersect(col("a1"), col("a2"))))
      .withColumn("jaccard",
        round(col("i").cast("double") / (col("n1") + col("n2") - col("i")), 6))
      .filter(col("jaccard") >= 0.5)
      .select(col("d1").as("doc1"), col("d2").as("doc2"), col("jaccard"))
  }

  /** Exact word-3-gram Jaccard ≥ 0.5, strategy chosen from df STATS
    * (the same move AQE makes from runtime shuffle stats): the exact
    * output cardinality of the inverted-index posting join is
    * Σ df·(df−1)/2 — one tiny aggregate over the memoized df table.
    * When that is within a small constant of the posting-list size
    * (flat df distribution — no hot shingle), the direct join is both
    * optimal and cheaper than building prefixes; when any shingle is
    * hot the bound explodes and the PPJoin path caps the blow-up.
    * Both plans provably produce the all-pairs answer, so the oracle
    * keeps the naive inverted-index SQL either way. */
  val dedupNgramJaccard: GQuery = {
    val sparkImpl = (s: SparkSession, dir: String) => {
      val stats = shingleDfreq(s, dir)
        .agg(sum(expr("df * (df - 1)")).as("pairs2x"),
          sum(col("df")).as("postings"))
        .head()
      val naivePairs = if (stats.isNullAt(0)) 0L else stats.getLong(0) / 2
      val postings = if (stats.isNullAt(1)) 0L else stats.getLong(1)
      val plan =
        if (naivePairs <= 20L * postings) ngramJaccardInverted(s, dir)
        else ngramJaccardPPJoin(s, dir)
      plan.orderBy(col("doc1"), col("doc2"))
    }
    GQuery("dedup_ngram_jaccard",
      s"""$duckShingles,
         |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
         |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
         |  FROM sh a JOIN sh b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT d1 AS doc1, d2 AS doc2,
         |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
         |FROM inter
         |JOIN sizes sa ON d1 = sa.doc_id
         |JOIN sizes sb ON d2 = sb.doc_id
         |WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.5
         |ORDER BY doc1, doc2""".stripMargin)(sparkImpl)
  }

  /** Embedding-cosine near-dup: global pairs with cosine ≥ 0.4.
    *
    * Pair generation is a BLOCK-PAIR EQUI-JOIN with provable recall
    * 1.0, not a nested loop: vectors are hashed into B blocks
    * (blk = vec_id mod B); the left side replicates each vector to
    * block-pair keys (blk, j≥blk), the right side to (i≤blk, blk), so
    * every unordered pair of vectors meets under EXACTLY ONE (lo, hi)
    * key (same-block pairs meet twice as (x,y)/(y,x); the id filter
    * keeps one). The O(n²) cosine work is unchanged — it is inherent
    * to an EXACT low-threshold pair join (τ=0.4 pairs on this fixture
    * have cosine 0.40–0.60, far below where sign-LSH bucketing retains
    * recall; the high-similarity LSH path is SimQueries.simTopkLsh) —
    * but it is now spread across B(B+1)/2 shuffle keys instead of
    * serialized onto a single BroadcastNestedLoopJoin task, and B
    * scales with n on a cluster. Replication cost is (B+1)/2 ≈ 8 small
    * rows per vector. */
  val dedupEmbedCosine: GQuery = {
    val B = 16
    val sparkImpl = (s: SparkSession, dir: String) => {
      val e = SimQueries.vecs(s, dir)
        .withColumn("blk", pmod(col("vec_id"), lit(B)).cast("int"))
      val lft = e.select(col("vec_id").as("id1"), col("v").as("va"),
        col("nrm").as("na"), col("blk").as("lo"),
        explode(expr(s"sequence(blk, ${B - 1})")).as("hi"))
      val rgt = e.select(col("vec_id").as("id2"), col("v").as("vb"),
        col("nrm").as("nb"), explode(expr("sequence(0, blk)")).as("lo"),
        col("blk").as("hi"))
      // a small-SF parquet corpus is a single scan split: without an
      // explicit exchange the planner may broadcast one side and run
      // the whole pair loop in ONE task — repartitioning on the join
      // key guarantees the B(B+1)/2 key groups spread across the
      // cluster whichever join strategy is picked. The partition count
      // is pinned because this join is output-explosive (n²/2 pairs
      // from ~n·B/2 input rows): AQE's input-byte coalescing would
      // otherwise fold the tiny input back into one partition and
      // serialize the pair loop.
      lft.repartition(s.sessionState.conf.numShufflePartitions,
          col("lo"), col("hi")).join(rgt, Seq("lo", "hi"))
        .filter(col("lo") =!= col("hi") || col("id1") < col("id2"))
        .withColumn("cosine", round(
          expr("vec_dot(va, vb)") / (col("na") * col("nb")), 6))
        .filter(col("cosine") >= 0.4)
        .select(least(col("id1"), col("id2")).as("v1"),
          greatest(col("id1"), col("id2")).as("v2"), col("cosine"))
        .orderBy(col("v1"), col("v2"))
    }
    GQuery("dedup_embed_cosine",
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |n AS (SELECT vec_id, v, sqrt(list_dot_product(v, v)) AS nrm FROM e)
        |SELECT a.vec_id AS v1, b.vec_id AS v2,
        |  round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS cosine
        |FROM n a JOIN n b ON a.vec_id < b.vec_id
        |WHERE round(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) >= 0.4
        |ORDER BY v1, v2""".stripMargin)(sparkImpl)
  }

  val all: Seq[GQuery] = Seq(dedupExact, dedupNearMinhash,
    dedupEditDistance, dedupClusters, dedupSimhash, dedupNgramJaccard,
    dedupEmbedCosine)
}
