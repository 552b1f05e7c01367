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
  * Xiao et al. "PPJoin", WWW 2008), and alternating large-star/
  * small-star connected components (Kiveris et al., SoCC 2014).
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

  /** DuckDB spelling of the portable 48-bit md5 hash (the Spark side
    * lives in graft.api). */
  private[operators] def duckHash(seedAndVal: String): String =
    s"CAST(concat('0x', substr(md5($seedAndVal), 1, 12)) AS BIGINT)"

  /** Word 3-gram shingles, distinct per doc (Spark side). Uses the
    * native word_ngrams expression — the higher-order transform form
    * runs an interpreted lambda per shingle and was the hottest stage
    * of the whole dedup pipeline. Memoized + persisted per (session,
    * dir): the minhash signature pass and the Jaccard verify both
    * consume it, so the corpus is tokenized once per session. */
  private[operators] def shingles(s: SparkSession, dir: String): DataFrame =
    PlanCache.memo(s, dir, "shingles") {
      graft.api.Dedup.wordShingles(
        Tables.documentsSpread(s, dir), "doc_id", "text", n = 3)
    }

  private val duckShingles =
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM documents),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |          for i in generate_series(1, len(t) - 2)]) AS shingle
      |  FROM toks)""".stripMargin

  /** The clone-density router's integer rule as a 1-row CTE `m(f)`:
    * f = 1 (route to the clone-safe arm) iff the exact-text clone
    * mass Σc(c−1) ≥ 2·n_docs — shared by the routed band sweep and
    * the routed ngram-jaccard join (and certified by their stats
    * rows). Declared ahead of every val that splices it (object vals
    * initialize in declaration order). */
  private val bandSweepChooserCte =
    """m AS (SELECT CASE WHEN coalesce(sum(c * (c - 1)), 0)
      |    >= 2 * CAST(sum(c) AS BIGINT) THEN 1 ELSE 0 END AS f
      |  FROM (SELECT count(*) AS c FROM documents GROUP BY text))"""
      .stripMargin

  /** Exact dedup on text (keep min doc_id), survivors per lang.
    *
    * The survivor of a text group is its minimum doc_id row, so the
    * whole query is two AGGREGATES (min-struct per text, then counts
    * per survivor lang) — unlike a row_number window (the oracle's
    * spelling), aggregation combines map-side: duplicate texts
    * collapse BEFORE the shuffle, so at scale the exchange carries
    * ~distinct texts, not the full corpus. */
  val dedupExact: GQuery = GQuery(
    "dedup_exact",
    """SELECT lang, count(*) AS n_docs, CAST(min(doc_id) AS BIGINT) AS min_doc
      |FROM (SELECT doc_id, lang,
      |        row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      |      FROM documents)
      |WHERE rn = 1
      |GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("text"), struct(col("doc_id"), col("lang")).as("p"))
      .groupBy(col("text"))
      .agg(min(col("p")).as("m"))
      .groupBy(col("m.lang").as("lang"))
      .agg(count(lit(1)).as("n_docs"), min(col("m.doc_id")).as("min_doc"))
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
      // the memoized df table donates the shingle dictionary, so md5
      // runs once per DISTINCT shingle (~10× fewer digests than
      // hashing every posting)
      graft.api.Dedup.minhashSignatures(shingles(s, dir), "doc_id",
        distinctShingles = Some(shingleDfreq(s, dir)))
    }

  /** (doc1, doc2, est_jaccard ≥ 0.5) candidate pairs — shared by the
    * minhash contract query, the edit-distance refinement, and
    * cluster formation; memoized so the band join runs once. */
  private[operators] def minhashPairsSpark(s: SparkSession, dir: String): DataFrame =
    PlanCache.memo(s, dir, "minhash_pairs") {
      graft.api.Dedup.minhashBandPairs(minhashSig(s, dir), "doc_id")
    }

  private val duckBandCond = bands.map { case (x, y) =>
    s"(a.h$x = b.h$x AND a.h$y = b.h$y)" }.mkString(" OR ")
  private val duckAgree = (0 to 7).map(k =>
    s"CASE WHEN a.h$k = b.h$k THEN 1 ELSE 0 END").mkString(" + ")

  /** DuckDB CTE chain ending in `sig(doc_id, h0..h7)` — the oracle
    * twin of the MinHash signature table (both the batch dictionary
    * join and the per-row streaming signer produce these values). */
  private val minhashSigCte: String = {
    val duckMins = (0 to 7).map { i =>
      val m = i / 4; val j = i % 4
      s"min(CAST(concat('0x', substr(m$m, ${1 + 8 * j}, 8)) AS BIGINT)) AS h$i"
    }.mkString(", ")
    s"""$duckShingles,
       |dig AS (SELECT doc_id, md5('0:' || shingle) AS m0,
       |    md5('1:' || shingle) AS m1 FROM sh),
       |sig AS (SELECT doc_id, $duckMins FROM dig GROUP BY doc_id)""".stripMargin
  }

  /** [[minhashSigCte]] extended to `pairs(doc1, doc2, est_jaccard)` —
    * the oracle twin of [[minhashPairsSpark]]. */
  private[operators] val minhashPairsCte: String =
    s"""$minhashSigCte,
       |pairs AS (
       |  SELECT DISTINCT a.doc_id AS doc1, b.doc_id AS doc2,
       |    CAST($duckAgree AS DOUBLE) / 8 AS est_jaccard
       |  FROM sig a JOIN sig b
       |    ON a.doc_id < b.doc_id AND ($duckBandCond)
       |  WHERE CAST($duckAgree AS DOUBLE) / 8 >= 0.5)""".stripMargin

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
    // full document TEXTS attach on both sides — the one frame in the
    // repo that must NEVER carry a broadcast hint (corpus-cardinality
    // payloads); keyed shuffle joins scale, AQE broadcasts when small
    minhashPairsSpark(s, dir)
      .join(docs.select(col("doc_id").as("doc1"),
        col("text").as("text1")), Seq("doc1"))
      .join(docs.select(col("doc_id").as("doc2"),
        col("text").as("text2")), Seq("doc2"))
      .select(col("doc1"), col("doc2"), col("est_jaccard"),
        levenshtein(col("text1"), col("text2")).cast("int").as("edit_dist"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** Near-dup CLUSTER formation — the step that turns the pair list
    * into "keep one document per duplicate group": connected
    * components over the MinHash candidate-pair graph, labels = the
    * component's minimum doc_id, reported as (cluster_rep, n_members).
    *
    * Spark side: alternating large-star/small-star contraction
    * (graft.api.Dedup.connectedComponents) — each round is two
    * groupBy+join passes over the edge list and the round count is
    * O(log n) regardless of component SHAPE, so a chain-shaped
    * duplicate cluster (crawl mirrors) converges as fast as a clique
    * (min-label propagation, the previous implementation, needed
    * O(component diameter) rounds — unbounded on chains). Rounds are
    * `localCheckpoint`ed to truncate lineage — the distributed shape
    * that holds when the pair graph has billions of edges. The driver
    * only checks the converged flag (a count), never the data.
    *
    * Oracle: DuckDB recursive CTE builds the transitive closure of
    * the same edges and takes the min reachable node per member. */
  /** Shared oracle SQL for both CC spellings: the transitive closure
    * is the semantics, whichever contraction schedule computes it. */
  private val duckClustersSql =
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
       |ORDER BY cluster_rep""".stripMargin

  val dedupClusters: GQuery = GQuery(
    "dedup_clusters", duckClustersSql) { (s, dir) =>
    val pairs = minhashPairsSpark(s, dir).select(col("doc1"), col("doc2"))
    // schedule chosen by the pair graph's measured density (avg
    // degree probe): alternating at fixture density, two-phase at
    // crawl-mirror clone density — identical labels either way, so
    // the transitive-closure oracle is schedule-blind
    graft.api.Dedup.connectedComponentsAuto(pairs, "doc1", "doc2")._1
      .groupBy(col("label").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("cluster_rep"))
  }

  /** The CC SCHEDULE CHOOSER's density probe as an oracle-backed
    * query (round 13): the pair graph's node/edge counts and the
    * contraction schedule the chooser would pick — the decision is
    * the INTEGER compare 2·|E| ≥ 4·|V| (no float), so DuckDB replays
    * it verbatim and the hash gate certifies the choice itself, not
    * just the clusters it produces. At fixture density this row says
    * `alternating`; on a crawl-mirror clone corpus the same query
    * flips to `two_phase` (the regime the 100× probe measured
    * 1.6–2.2× faster) — making the planning decision itself part of
    * the replayable contract.
    *
    * Scale shape: the probe IS two bounded aggregates over the
    * canonical edge set (|E| is the count every CC loop takes anyway
    * as convergence state); the 1-row output assembles driver-side
    * from those two scalars — the ivf nProbe bounded-collect
    * discipline. */
  val dedupClusterStats: GQuery = GQuery(
    "dedup_cluster_stats",
    s"""$minhashPairsCte,
       |e AS (SELECT DISTINCT doc1 AS a, doc2 AS b FROM pairs),
       |v AS (SELECT DISTINCT n FROM (
       |  SELECT a AS n FROM e UNION ALL SELECT b FROM e)),
       |c AS (SELECT (SELECT CAST(count(*) AS BIGINT) FROM v) AS n_nodes,
       |             (SELECT CAST(count(*) AS BIGINT) FROM e) AS n_edges)
       |SELECT n_nodes, n_edges,
       |  CASE WHEN n_nodes > 0 AND 2 * n_edges >= 4 * n_nodes
       |    THEN 'two_phase' ELSE 'alternating' END AS schedule
       |FROM c""".stripMargin) { (s, dir) =>
    val pairs = minhashPairsSpark(s, dir).select(col("doc1"), col("doc2"))
    val (nE, nV, sched) = graft.api.Dedup.ccScheduleProbe(
      pairs, "doc1", "doc2")
    import s.implicits._
    Seq((nV, nE, sched)).toDF("n_nodes", "n_edges", "schedule")
  }

  /** The TWO-PHASE contraction schedule (large-star to its fixed
    * point, then small-star — one aggregate + one join per pass),
    * oracle-backed by the SAME transitive-closure SQL: the variant a
    * pipeline picks when duplicate clusters are deep chains (crawl
    * mirrors) rather than the fixture's tiny cliques — see
    * BASELINE.md's round-4 measurement for the trade. */
  val dedupClustersTwoPhase: GQuery = GQuery(
    "dedup_clusters_twophase", duckClustersSql) { (s, dir) =>
    val pairs = minhashPairsSpark(s, dir).select(col("doc1"), col("doc2"))
    graft.api.Dedup.connectedComponentsTwoPhaseWithPasses(
        pairs, "doc1", "doc2")._1
      .groupBy(col("label").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("cluster_rep"))
  }

  /** INCREMENTAL cluster maintenance — the merge_incremental_agg
    * discipline applied to the near-dup GRAPH: yesterday's cluster
    * state (one (node → label) row per base doc, doc_id % 5 < 4) is
    * CONTRACTED into label edges and merged with only the
    * ARRIVAL-TOUCHING candidate pairs — connected components never
    * re-walks the base pair graph, because CC(labelEdges ∪ newEdges)
    * provably has the same partition as CC(allEdges): label edges
    * preserve every base component, new edges add exactly the merges
    * the arrivals introduce, and labels are min node ids so the
    * merged minimum is the global minimum. The oracle is the SAME
    * transitive-closure SQL as dedup_clusters — passing proves
    * incremental ≡ full recompute (the sim_bm25_indexed same-oracle
    * discipline).
    *
    * Scale shape: the CC input shrinks from |base pairs| + |new
    * pairs| to |base nodes| + |new pairs| — at a 100 TB corpus with
    * daily arrivals, the state table is linear in CORPUS NODES while
    * the pair graph it replaces is quadratic in cluster sizes; the
    * arrival-touching pairs come from the saved signature index probe
    * (dedup_ingest's plan) rather than the full band join, so the
    * daily cost is arrival-bounded end to end. (At fixture scale the
    * shared memo computes all pairs once for every dedup row — the
    * claim measured here is the CC stage's input contraction.) */
  val dedupClustersIncremental: GQuery = GQuery(
    "dedup_clusters_incremental", duckClustersSql) { (s, dir) =>
    val pairs = minhashPairsSpark(s, dir).select(col("doc1"), col("doc2"))
    val baseOnly = (col("doc1") % 5 < 4) && (col("doc2") % 5 < 4)
    // yesterday's state is a SAVED artifact (r18 opt, guide §1.2/§2.4):
    // the base clustering is yesterday's run by construction, so the
    // timed daily apply must not re-contract the base pair graph — it
    // reads the published (node, label) parquet, stamped + atomically
    // published like every other saved serving artifact (ivf_c8 /
    // nngd / graph_edges_*; Bench runs this row once untimed in the
    // prebuilt pass so a fresh corpus generation pays the build
    // offline). Previously BOTH the base CC and the merge CC ran in
    // the timed region.
    val path = graft.IndexStore.ensure(graft.IndexStore.stampedPath(
        "dedup_base_cc", dir, "documents.parquet")) { tmp =>
      // two-phase schedule — measured FASTER and TIGHTER than the
      // alternating one at worst-case dup density, BASELINE.md's
      // cleared-state 100× table
      graft.api.Dedup.connectedComponentsTwoPhaseWithPasses(
          pairs.filter(baseOnly), "doc1", "doc2")._1
        .write.parquet(s"$tmp/labels")
    }
    val baseState = s.read.parquet(s"$path/labels")
    // today's apply: contracted state + arrival-touching pairs only,
    // iterating only on delta-touched components (the untouched
    // stars pass straight through — see connectedComponentsIncremental)
    graft.api.Dedup.connectedComponentsIncremental(
        baseState, "node", "label", pairs.filter(!baseOnly),
        "doc1", "doc2")
      .groupBy(col("label").as("cluster_rep"))
      .agg(count(lit(1)).as("n_members"))
      .orderBy(col("cluster_rep"))
  }

  /** The end-to-end dedup DECISION — what a training-data pipeline
    * actually ships: one row per document with its fate.
    * `drop_exact` = byte-identical text, not the smallest doc_id;
    * `drop_near`  = member of a MinHash near-dup cluster but not its
    * representative (min doc_id); `keep` otherwise. Exact wins over
    * near on precedence. Composed entirely from already-verified
    * building blocks (exact window + band pairs +
    * connectedComponents). */
  val dedupKeepList: GQuery = GQuery(
    "dedup_keep_list",
    s"""${minhashPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
       |e AS (SELECT doc1 AS a, doc2 AS b FROM pairs
       |      UNION ALL SELECT doc2, doc1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |lab AS (SELECT a AS node, least(a, min(b)) AS rep
       |        FROM reach GROUP BY a),
       |ex AS (SELECT doc_id,
       |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |  FROM documents)
       |SELECT d.doc_id,
       |  CASE WHEN ex.rn > 1 THEN 'drop_exact'
       |       WHEN lab.node IS NOT NULL AND lab.rep <> d.doc_id
       |         THEN 'drop_near'
       |       ELSE 'keep' END AS status
       |FROM documents d
       |JOIN ex ON d.doc_id = ex.doc_id
       |LEFT JOIN lab ON d.doc_id = lab.node
       |ORDER BY d.doc_id""".stripMargin) { (s, dir) =>
    // thin binding of graft.api.Dedup.keepList, donating the
    // session-memoized pair list
    graft.api.Dedup.keepList(Tables.documents(s, dir), "doc_id", "text",
      pairs = Some(minhashPairsSpark(s, dir)))
      .orderBy(col("doc_id"))
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
      val sim = PlanCache.memo(s, dir, "simhash_sig") {
        graft.api.Dedup.simhashSignatures(
          Tables.documentsSpread(s, dir), "doc_id", "text")
      }
      graft.api.Dedup.simhashPairs(sim, "doc_id", maxHamming = 3)
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
  private[operators] def shingleDfreq(s: SparkSession, dir: String): DataFrame =
    PlanCache.memo(s, dir, "shingle_dfreq") {
      shingles(s, dir).groupBy(col("shingle")).agg(count(lit(1)).as("df"))
    }

  /** Direct inverted-index plan: join every posting pair, aggregate
    * intersection sizes. Optimal when no shingle is hot (the join
    * output is Σ df·(df−1)/2 rows — near-linear on a flat df
    * distribution), quadratic disaster when one is. */
  private[operators] def ngramJaccardInverted(
      s: SparkSession, dir: String): DataFrame =
    graft.api.Dedup.jaccardPairsInverted(shingles(s, dir), "doc_id",
      num = 1, den = 2)

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
    // the verify step now merge-counts with early exit
    // (sorted_intersect_count); the size(array_intersect) counting
    // rewrite stays installed for API users composing the built-ins
    graft.plans.IntersectSizeRewrite.install(s)
    graft.api.Dedup.jaccardPairsPPJoin(shingles(s, dir), "doc_id",
      num = 1, den = 2)
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
      // delegate to the ONE copy of the stats-driven strategy chooser
      // in graft.api, donating the memoized df table so the probe and
      // the PPJoin global order never recount postings. A THIRD arm
      // sits in front of both (round-15 VERDICT item 6): when the
      // corpus is clone-dense (the [[dedupNgramStats]] integer rule —
      // exact-text clone mass ≥ 2·n_docs), exact clones collapse to
      // their min-doc_id representative BEFORE the pair join, so the
      // output is the FACTORED pair relation over distinct texts (the
      // within-clone jaccard-1.0 pairs are dedup_exact's groups; the
      // quadratic expansion is the client's choice to materialize).
      // The oracle replays the same rule and the same collapse.
      graft.plans.IntersectSizeRewrite.install(s)
      val sh =
        if (cloneMass(s, dir)) {
          val reps = Tables.documents(s, dir)
            .groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
            .select(col("doc_id"))
          shingles(s, dir).join(reps, Seq("doc_id"), "left_semi")
        } else shingles(s, dir)
      graft.api.Dedup.jaccardPairs(sh, "doc_id",
        num = 1, den = 2,
        dfreq = if (cloneMass(s, dir)) None
                else Some(shingleDfreq(s, dir)))
        .orderBy(col("doc1"), col("doc2"))
    }
    GQuery("dedup_ngram_jaccard",
      s"""WITH $bandSweepChooserCte,
         |docs_eff AS (
         |  SELECT d.doc_id, d.text FROM documents d, m WHERE m.f = 0
         |  UNION ALL
         |  SELECT min(doc_id) AS doc_id, text FROM documents, m
         |  WHERE m.f = 1 GROUP BY text),
         |${duckShinglesFrom("docs_eff")},
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

  /** The ngram-jaccard router's probe memo: `true` = clone-dense
    * (collapse first). One map-side-combining aggregate over the
    * corpus, memoized per (session, dir) — the router and the main
    * row's dfreq decision both read it, and it never runs twice. */
  private def cloneMass(s: SparkSession, dir: String): Boolean =
    PlanCache.memoScalar(s, dir, "clone_mass") {
      val st = Tables.documents(s, dir)
        .groupBy(col("text")).agg(count(lit(1)).as("c"))
        .agg(coalesce(sum(expr("c * (c - 1)")), lit(0L)).as("mass"),
          sum(col("c")).as("n"))
        .head()
      st.getLong(0) >= 2 * st.getLong(1)
    }

  /** [[duckShingles]] parameterized on its document source. */
  private def duckShinglesFrom(src: String): String =
    """toks AS (SELECT doc_id, string_split(text, ' ') AS t
      |              FROM SRC),
      |sh AS (SELECT DISTINCT doc_id,
      |  unnest([t[i] || ' ' || t[i+1] || ' ' || t[i+2]
      |          for i in generate_series(1, len(t) - 2)]) AS shingle
      |  FROM toks)""".stripMargin.replace("SRC", src)

  /** The ALWAYS-COLLAPSED arm as its own contract row — what keeps
    * the clone-collapse path hash-certified at fixture clone density
    * (where the routed [[dedupNgramJaccard]] exercises the flat
    * arms): near-dup pairs among distinct-text representatives, each
    * row carrying `n_pairs` = c₁·c₂ — the number of underlying
    * doc-level pairs the factored row stands for, so the quadratic
    * expansion is ACCOUNTED without being materialized. At 100 TB
    * this is the only affordable exact posture on a clone-dense
    * corpus: the pair join runs on distinct texts (collapse is one
    * map-side-combining aggregate), and Σ n_pairs audits exactly what
    * was factored away.
    *
    * BOUNDARY (probed, BASELINE.md round-18 table): the collapse
    * covers EXACT-clone density only — at the 100× crawl-mirror
    * probe, where variants are distinct texts with near-identical
    * shingles, the representatives themselves form ~100-member
    * near-dup cliques and ANY exact spelling of the pair relation is
    * output-quadratic (~10⁹ pairs; the probe spilled past local disk
    * and was stopped). The pipeline answer there is
    * dedup-before-pairing (minhash/span/semantic dedup, shipped) —
    * the diversified-NNG boundary restated. Measured domain: 10×
    * exact-clone probe 55 → 14.5 s. */
  val dedupNgramJaccardCollapsed: GQuery = GQuery(
    "dedup_ngram_jaccard_collapsed",
    s"""WITH g AS (SELECT min(doc_id) AS doc_id, text,
       |    count(*) AS c FROM documents GROUP BY text),
       |${duckShinglesFrom("g")},
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
       |  FROM sh a JOIN sh b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT d1 AS doc1, d2 AS doc2,
       |  round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard,
       |  CAST(ga.c * gb.c AS BIGINT) AS n_pairs
       |FROM inter
       |JOIN sizes sa ON d1 = sa.doc_id
       |JOIN sizes sb ON d2 = sb.doc_id
       |JOIN g ga ON d1 = ga.doc_id
       |JOIN g gb ON d2 = gb.doc_id
       |WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.5
       |ORDER BY doc1, doc2""".stripMargin) { (s, dir) =>
    graft.plans.IntersectSizeRewrite.install(s)
    val g = Tables.documents(s, dir)
      .groupBy(col("text"))
      .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("c"))
      .select(col("doc_id"), col("c"))
    val sh = shingles(s, dir)
      .join(g.select(col("doc_id")), Seq("doc_id"), "left_semi")
    graft.api.Dedup.jaccardPairs(sh, "doc_id", num = 1, den = 2)
      .join(g.select(col("doc_id").as("doc1"), col("c").as("c1")),
        Seq("doc1"))
      .join(g.select(col("doc_id").as("doc2"), col("c").as("c2")),
        Seq("doc2"))
      .select(col("doc1"), col("doc2"), col("jaccard"),
        (col("c1") * col("c2")).cast("bigint").as("n_pairs"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** The ngram-jaccard THREE-WAY chooser certified as an oracle row
    * (the dedup_band_sweep_stats sibling): clone-dense → `collapsed`
    * (collapse exact clones before the join — the output-bound
    * regime); otherwise the [[graft.api.Dedup.jaccardPairs]] integer
    * rule — `inverted` while the naive posting bound Σdf(df−1)/2 is
    * within 20× of the posting count, `ppjoin` once a hot shingle
    * blows the bound. All three statistics are integers; DuckDB
    * replays the same aggregates and compares, so the hash gate
    * certifies the ROUTE the pair join takes at this corpus. */
  val dedupNgramStats: GQuery = GQuery(
    "dedup_ngram_stats",
    s"""WITH cc AS (SELECT count(*) AS c FROM documents GROUP BY text),
       |cm AS (SELECT CAST(sum(c) AS BIGINT) AS n_docs,
       |  CAST(coalesce(sum(c * (c - 1)), 0) AS BIGINT) AS clone_mass
       |  FROM cc),
       |${duckShingles.stripPrefix("WITH ")},
       |dfq AS (SELECT shingle, count(*) AS df FROM sh GROUP BY shingle),
       |ds AS (SELECT CAST(coalesce(sum(df * (df - 1)), 0) // 2 AS BIGINT)
       |    AS naive_pairs,
       |  CAST(coalesce(sum(df), 0) AS BIGINT) AS postings FROM dfq)
       |SELECT n_docs, clone_mass, naive_pairs, postings,
       |  CASE WHEN clone_mass >= 2 * n_docs THEN 'collapsed'
       |       WHEN naive_pairs <= 20 * postings THEN 'inverted'
       |       ELSE 'ppjoin' END AS path
       |FROM cm, ds""".stripMargin) { (s, dir) =>
    val cm = Tables.documents(s, dir)
      .groupBy(col("text")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).cast("bigint").as("n_docs"),
        coalesce(sum(expr("c * (c - 1)")), lit(0L)).cast("bigint")
          .as("clone_mass"))
    val ds = shingleDfreq(s, dir)
      .agg((coalesce(sum(expr("df * (df - 1)")), lit(0L)) / 2)
          .cast("bigint").as("naive_pairs"),
        coalesce(sum(col("df")), lit(0L)).cast("bigint").as("postings"))
    cm.crossJoin(ds)
      .select(col("n_docs"), col("clone_mass"), col("naive_pairs"),
        col("postings"),
        when(col("clone_mass") >= lit(2) * col("n_docs"), "collapsed")
          .when(col("naive_pairs") <= lit(20) * col("postings"),
            "inverted")
          .otherwise("ppjoin").as("path"))
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
    val sparkImpl = (s: SparkSession, dir: String) => {
      graft.api.Dedup.cosinePairs(
        SimQueries.vecs(s, dir).select(col("vec_id"), col("v")),
        "vec_id", "v", tau = 0.4, blocks = 16)
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

  /** Continuous-ingestion near-dedup as a CONTRACT query: the corpus
    * (doc_id % 5 < 4, 80%) is indexed through the batch signature
    * path into a SAVED band-bucket-partitioned parquet index
    * (graft.api.Dedup.signatureIndexBuild, build-if-absent through
    * graft.IndexStore's stamped-path + atomic-publish discipline);
    * the "arriving" 20% is signed PER ROW and joined against the
    * saved index on LSH band keys — the exact plan
    * graft.streaming.DedupStreams runs on a live stream (the batch
    * and streaming paths are the same function; DedupStreamsSpec pins
    * them equal). The oracle replays both signature paths from one
    * sig CTE, since per-row and dictionary-join signatures are the
    * same md5-slice minimums. */
  val dedupIngest: GQuery = GQuery(
    "dedup_ingest",
    s"""$minhashSigCte
       |SELECT DISTINCT a.doc_id, b.doc_id AS corpus_id,
       |  CAST($duckAgree AS DOUBLE) / 8 AS est_jaccard
       |FROM sig a JOIN sig b
       |  ON a.doc_id % 5 = 4 AND b.doc_id % 5 < 4 AND ($duckBandCond)
       |WHERE CAST($duckAgree AS DOUBLE) / 8 >= 0.5
       |ORDER BY a.doc_id, corpus_id""".stripMargin) { (s, dir) =>
    val docs = Tables.documentsSpread(s, dir)
    val path = graft.IndexStore.ensure(
      graft.IndexStore.stampedPath("minhash_sig80", dir,
        "documents.parquet")) { tmp =>
      graft.api.Dedup.signatureIndexBuild(
        docs.filter(col("doc_id") % 5 < 4), "doc_id", "text", tmp)
    }
    graft.streaming.DedupStreams.nearDupsAgainstSavedIndex(
      docs.filter(col("doc_id") % 5 === 4), path, "doc_id", "text")
      .orderBy(col("doc_id"), col("corpus_id"))
  }

  /** Train-test CONTAMINATION check (graft.api.Dedup.containmentPairs):
    * eval docs (doc_id % 10 = 7, ~10%) scored for n-gram containment
    * in every training doc — containment = |A∩B|/|A| is asymmetric,
    * so a short eval prompt quoted verbatim inside a long training
    * document scores 1.0 where Jaccard would vanish. The operator an
    * LLM eval pipeline runs before trusting a benchmark number. */
  private val duckContainmentSql =
    s"""$duckShingles,
       |ev AS (SELECT doc_id AS eval_id, shingle FROM sh
       |       WHERE doc_id % 10 = 7),
       |tr AS (SELECT doc_id AS train_id, shingle FROM sh
       |       WHERE doc_id % 10 <> 7),
       |sizes AS (SELECT eval_id, count(*) AS n FROM ev GROUP BY eval_id),
       |inter AS (SELECT e.eval_id, t.train_id, count(*) AS i
       |  FROM ev e JOIN tr t ON e.shingle = t.shingle
       |  GROUP BY 1, 2)
       |SELECT i.eval_id AS eval_id, i.train_id AS train_id,
       |  round(CAST(i.i AS DOUBLE) / s.n, 6) AS containment
       |FROM inter i JOIN sizes s ON i.eval_id = s.eval_id
       |WHERE i.i * 2 >= s.n
       |ORDER BY i.eval_id, i.train_id""".stripMargin

  val dedupContainment: GQuery = GQuery(
    "dedup_containment", duckContainmentSql) { (s, dir) =>
    graft.api.Dedup.containmentPairs(shingles(s, dir), "doc_id",
        col("doc_id") % 10 === 7)
      .orderBy(col("eval_id"), col("train_id"))
  }

  /** Contamination checking as a SERVING path — the same semantics
    * as [[dedupContainment]] (same oracle SQL, provably identical
    * result), but probing a SAVED containment index of the training
    * corpus (graft.api.Dedup.containmentIndexBuild, build-if-absent
    * through IndexStore): the corpus is shingled once at build, the
    * batch probe prunes the postings scan to its prefix shingles'
    * buckets, and the probe plan is the exact one
    * graft.streaming.DedupStreams.containmentAgainstSavedIndex runs
    * on a live stream of arriving eval prompts (DedupStreamsSpec pins
    * streaming ≡ batch ≡ the in-memory API). */
  val dedupContainmentIngest: GQuery = GQuery(
    "dedup_containment_ingest", duckContainmentSql) { (s, dir) =>
    val docs = Tables.documentsSpread(s, dir)
    val path = graft.IndexStore.ensure(
      graft.IndexStore.stampedPath("containment_train", dir,
        "documents.parquet")) { tmp =>
      graft.api.Dedup.containmentIndexBuild(
        docs.filter(col("doc_id") % 10 =!= 7), "doc_id", "text", tmp)
    }
    graft.streaming.DedupStreams.containmentAgainstSavedIndex(
      docs.filter(col("doc_id") % 10 === 7), path, "doc_id", "text")
      .orderBy(col("eval_id"), col("train_id"))
  }

  /** Global SPAN-level exact dedup (the C4 / RefinedWeb rewrite step):
    * every document is cut into consecutive non-overlapping 8-token
    * spans, a span text seen anywhere before (corpus order = (doc_id,
    * span position)) is DROPPED, and each document reports how much of
    * it survived. Unlike [[dedupContainment]] (which *flags* overlap),
    * this is the rewriting form: the surviving spans ARE the cleaned
    * corpus, and the per-doc survival ratio is the quality signal.
    *
    * Scale shape: one hash-shuffle on the span text with map-side
    * combine (identical spans collapse to one (span, min-position) row
    * per map task before the exchange — on a duplicate-dense corpus
    * the shuffle carries ~distinct spans), then one keyed equi-join to
    * re-attach the winning occurrence and a per-doc aggregate. No
    * windows, no all-pairs anything; both joins are on uniform keys.
    * The first-occurrence winner is chosen with an ENCODED min
    * (doc_id * 1e6 + span index — span index < 1e6 by construction)
    * so the oracle's plain `min(bigint)` replays the exact choice. */
  val dedupSpanGlobal: GQuery = GQuery(
    "dedup_span_global",
    """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS ts
      |              FROM documents),
      |chunks AS (
      |  SELECT doc_id,
      |    unnest(generate_series(0, (len(ts)+7)//8 - 1)) AS cidx, ts
      |  FROM toks),
      |spans AS (
      |  SELECT doc_id, cidx,
      |    array_to_string(ts[cidx*8+1 : cidx*8+8], ' ') AS span,
      |    LEAST(8, len(ts) - cidx*8) AS ctoks
      |  FROM chunks),
      |firsts AS (
      |  SELECT span, min(doc_id * 1000000 + cidx) AS pos
      |  FROM spans GROUP BY span),
      |kept AS (
      |  SELECT s.doc_id, s.ctoks
      |  FROM spans s JOIN firsts f
      |    ON s.span = f.span AND s.doc_id * 1000000 + s.cidx = f.pos),
      |perdoc AS (
      |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_spans,
      |         CAST(sum(ctoks) AS BIGINT) AS n_toks
      |  FROM spans GROUP BY doc_id)
      |SELECT p.doc_id, p.n_spans, p.n_toks,
      |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
      |  CAST(coalesce(k.toks_kept, 0) AS BIGINT) AS toks_kept
      |FROM perdoc p LEFT JOIN (
      |  SELECT doc_id, count(*) AS n_kept, sum(ctoks) AS toks_kept
      |  FROM kept GROUP BY doc_id) k USING (doc_id)
      |ORDER BY p.doc_id""".stripMargin) { (s, dir) =>
    val spans = Tables.documents(s, dir)
      .select(col("doc_id"), split(col("text"), " ").as("ts"))
      .withColumn("n", size(col("ts")))
      .select(col("doc_id"), col("ts"), col("n"),
        explode(sequence(lit(0L), (col("n") + 7L).cast("long")
          .divide(8).cast("long") - 1L)).as("cidx"))
      .select(col("doc_id"), col("cidx"),
        array_join(slice(col("ts"), (col("cidx") * 8 + 1).cast("int"),
          lit(8)), " ").as("span"),
        least(lit(8), col("n") - col("cidx") * 8).cast("int").as("ctoks"))
    // map-side combine: duplicate spans collapse per task before the
    // one shuffle; pos encodes (doc_id, cidx) so min() is "first
    // occurrence in corpus order" on both engines. The encoding is only
    // injective while cidx < 1e6 (docs under 8M tokens) and
    // doc_id * 1e6 + cidx fits a bigint (doc_id < ~9.2e12) — guard INSIDE
    // the pos expression (not a prunable side column) so a violating
    // corpus fails loudly instead of silently mis-ranking winners
    val encodedPos = when(
      col("cidx") >= 1000000L || col("doc_id") < 0L ||
        col("doc_id") > 9000000000000L,
      raise_error(concat(
        lit("dedup_span_global: (doc_id, span) outside the 1e6 " +
          "position encoding: doc_id="), col("doc_id"),
        lit(" cidx="), col("cidx"))).cast("long"))
      .otherwise(col("doc_id") * 1000000L + col("cidx"))
    val firsts = spans
      .groupBy(col("span"))
      .agg(min(encodedPos).as("pos"))
      .select(col("span").as("fspan"), col("pos"))
    val kept = spans.join(firsts,
      col("span") === col("fspan") &&
        col("doc_id") * 1000000L + col("cidx") === col("pos"))
      .groupBy(col("doc_id").as("kdoc"))
      .agg(count(lit(1)).as("n_kept"), sum(col("ctoks")).as("toks_kept"))
    spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("ctoks")).cast("long").as("n_toks"))
      .join(kept, col("doc_id") === col("kdoc"), "left")
      .select(col("doc_id"), col("n_spans"), col("n_toks"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("toks_kept"), lit(0L)).cast("long").as("toks_kept"))
      .orderBy(col("doc_id"))
  }

  /** TRAIN/TEST LEAKAGE audit — the check every held-out split needs
    * before a single eval number is trusted: near-duplicate pairs
    * (the MinHash candidate graph, shared memo with dedup_near_
    * minhash) that STRADDLE the sample_split_assign train/val/test
    * boundary. A test doc with a train-side near-dup inflates eval
    * scores silently; this report is the list a curation pass must
    * drain to zero (by moving whole dup CLUSTERS into one split —
    * which is why dedup runs before splitting in a sane pipeline).
    *
    * Scale shape: the split label is a PURE FUNCTION of doc_id (the
    * same salted portable hash sample_split_assign uses), so both
    * labels are per-row projections on the (tiny) candidate pair
    * list — zero joins beyond the banded candidate generation
    * itself. */
  val dedupSplitLeakage: GQuery = {
    val duckSplit = (c: String) =>
      s"""CASE WHEN ${duckHash(s"concat('spl:', CAST($c AS VARCHAR))")}
         | % 10 < 8 THEN 'train'
         | WHEN ${duckHash(s"concat('spl:', CAST($c AS VARCHAR))")}
         | % 10 < 9 THEN 'val' ELSE 'test' END""".stripMargin
        .replaceAll("\n", "")
    def sparkSplit(c: String) = {
      val b = pmod(graft.api.Sampling.portableHash(col(c), "spl:"),
        lit(10L))
      when(b < 8, "train").when(b < 9, "val").otherwise("test")
    }
    GQuery(
      "dedup_split_leakage",
      s"""$minhashPairsCte
         |SELECT doc1, doc2, ${duckSplit("doc1")} AS split1,
         |  ${duckSplit("doc2")} AS split2, est_jaccard
         |FROM pairs
         |WHERE ${duckSplit("doc1")} <> ${duckSplit("doc2")}
         |ORDER BY doc1, doc2""".stripMargin) { (s, dir) =>
      minhashPairsSpark(s, dir)
        .select(col("doc1"), col("doc2"),
          sparkSplit("doc1").as("split1"), sparkSplit("doc2").as("split2"),
          col("est_jaccard"))
        .filter(col("split1") =!= col("split2"))
        .orderBy(col("doc1"), col("doc2"))
    }
  }

  /** Sketch-quality audit: for every MinHash candidate pair, the
    * 8-perm ESTIMATED Jaccard next to the EXACT shingle-set Jaccard
    * and the absolute sketch error — the number that tells you
    * whether 8 permutations / the 0.5 band threshold are right for
    * YOUR corpus before you commit a 100 TB dedup run to them. (The
    * fleet-wide recall/precision of the banding is property-tested;
    * this query materializes the per-pair audit as data.)
    *
    * Scale posture: exact Jaccard is computed ONLY for the candidate
    * pairs (sketch prunes, exact metric audits — the
    * dedup_edit_distance discipline); per-doc shingle sets attach by
    * two keyed joins (corpus-cardinality payloads, never hinted) and
    * intersections run on sorted arrays via the codegen'd
    * sorted_intersect_count — no shingle re-explosion per pair. */
  val dedupMinhashError: GQuery = GQuery(
    "dedup_minhash_error",
    s"""$minhashPairsCte,
       |cnt AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |ex AS (
       |  SELECT p.doc1, p.doc2, p.est_jaccard, count(*) AS isect,
       |    any_value(c1.n) AS n1, any_value(c2.n) AS n2
       |  FROM pairs p
       |  JOIN sh a ON a.doc_id = p.doc1
       |  JOIN sh b ON b.doc_id = p.doc2 AND b.shingle = a.shingle
       |  JOIN cnt c1 ON c1.doc_id = p.doc1
       |  JOIN cnt c2 ON c2.doc_id = p.doc2
       |  GROUP BY p.doc1, p.doc2, p.est_jaccard)
       |SELECT doc1, doc2, est_jaccard,
       |  round(CAST(isect AS DOUBLE) / (n1 + n2 - isect), 6)
       |    AS exact_jaccard,
       |  round(abs(est_jaccard
       |    - CAST(isect AS DOUBLE) / (n1 + n2 - isect)), 6) AS abs_error
       |FROM ex
       |ORDER BY doc1, doc2""".stripMargin) { (s, dir) =>
    graft.functions.SetExpressions.register(s)
    val sets = shingles(s, dir).groupBy(col("doc_id"))
      .agg(sort_array(collect_list(col("shingle"))).as("arr"),
        count(lit(1)).as("n"))
    val exact = minhashPairsSpark(s, dir)
      .join(sets.select(col("doc_id").as("doc1"), col("arr").as("a1"),
        col("n").as("n1")), Seq("doc1"))
      .join(sets.select(col("doc_id").as("doc2"), col("arr").as("a2"),
        col("n").as("n2")), Seq("doc2"))
      .withColumn("isect",
        expr("sorted_intersect_count(a1, a2, 0)").cast("double"))
      .withColumn("exact_j",
        col("isect") / (col("n1") + col("n2") - col("isect")))
    exact.select(col("doc1"), col("doc2"), col("est_jaccard"),
        round(col("exact_j"), 6).as("exact_jaccard"),
        round(abs(col("est_jaccard") - col("exact_j")), 6).as("abs_error"))
      .orderBy(col("doc1"), col("doc2"))
  }

  /** THRESHOLD-SWEEP tuning readout — the S-curve table every
    * MinHash+LSH deployment produces before choosing its Jaccard
    * cutoff: for each candidate threshold τ on a 0.5–0.9 grid, how
    * many LSH candidate pairs survive EXACT verification (J ≥ τ) and
    * the resulting candidate precision. This is the artifact that
    * decides bands/rows and the verify cutoff before a 100 TB corpus
    * is deduped — run once on a sample, read the knee.
    *
    * Scale shape: the candidate pairs are the SHARED banded-LSH memo
    * (never all-pairs); exact Jaccard is verified candidate-bounded —
    * the pair list joins the shingle table per side keyed on
    * (doc, shingle), so verification cost is Σ|shingles| over
    * CANDIDATES only; the τ grid rides a constant ×5 per-row explode
    * (no join), and the rollup is 5 bounded rows. */
  val dedupThresholdSweep: GQuery = GQuery(
    "dedup_threshold_sweep",
    s"""$minhashPairsCte,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (
       |  SELECT p.doc1, p.doc2, count(*) AS i
       |  FROM pairs p
       |  JOIN sh a ON a.doc_id = p.doc1
       |  JOIN sh b ON b.doc_id = p.doc2 AND b.shingle = a.shingle
       |  GROUP BY p.doc1, p.doc2),
       |pj AS (
       |  SELECT p.doc1, p.doc2,
       |    round(CAST(coalesce(i.i, 0) AS DOUBLE)
       |      / (sa.n + sb.n - coalesce(i.i, 0)), 6) AS j
       |  FROM pairs p
       |  LEFT JOIN inter i ON i.doc1 = p.doc1 AND i.doc2 = p.doc2
       |  JOIN sizes sa ON p.doc1 = sa.doc_id
       |  JOIN sizes sb ON p.doc2 = sb.doc_id),
       |sweep AS (
       |  SELECT unnest([0.5, 0.6, 0.7, 0.8, 0.9]) AS tau, doc1, j
       |  FROM pj)
       |SELECT CAST(tau AS DOUBLE) AS tau,
       |  CAST(count(*) AS BIGINT) AS candidates,
       |  CAST(count(*) FILTER (WHERE j >= CAST(tau AS DOUBLE))
       |    AS BIGINT) AS confirmed,
       |  round(CAST(count(*) FILTER (WHERE j >= CAST(tau AS DOUBLE))
       |    AS DOUBLE) / count(*), 6) AS prec
       |FROM sweep
       |GROUP BY tau
       |ORDER BY tau""".stripMargin) { (s, dir) =>
    val p = minhashPairsSpark(s, dir).select(col("doc1"), col("doc2"))
    val sh = shingles(s, dir)
    val sizes = sh.groupBy(col("doc_id")).agg(count(lit(1)).as("n"))
    val inter = p
      .join(sh.select(col("doc_id").as("doc1"),
        col("shingle").as("s1")), Seq("doc1"))
      .join(sh.select(col("doc_id").as("d2"), col("shingle").as("s2")),
        col("doc2") === col("d2") && col("s2") === col("s1"))
      .groupBy(col("doc1"), col("doc2")).agg(count(lit(1)).as("i"))
    val pj = p
      .join(inter, Seq("doc1", "doc2"), "left")
      .join(sizes.select(col("doc_id").as("doc1"), col("n").as("na")),
        Seq("doc1"))
      .join(sizes.select(col("doc_id").as("doc2"), col("n").as("nb")),
        Seq("doc2"))
      .select(round(coalesce(col("i"), lit(0L)).cast("double")
        / (col("na") + col("nb") - coalesce(col("i"), lit(0L))), 6)
        .as("j"))
    pj.withColumn("tau",
        explode(array(Seq(0.5, 0.6, 0.7, 0.8, 0.9).map(lit): _*)))
      .groupBy(col("tau"))
      .agg(count(lit(1)).as("candidates"),
        count(when(col("j") >= col("tau"), 1)).as("confirmed"),
        round(count(when(col("j") >= col("tau"), 1)).cast("double")
          / count(lit(1)), 6).as("prec"))
      .orderBy(col("tau"))
  }

  /** LSH BAND-ARRANGEMENT SWEEP — the sizing matrix for the banding
    * trade itself (the dedup twin of sim_nprobe_sweep): the SAME
    * 8-hash signature table carved as 8×1 / 4×2 / 2×4 / 1×8
    * (bands × rows-per-band), each arrangement's RAW candidate pairs
    * scored against exact Jaccard ≥ 0.5 ground truth
    * ([[graft.api.Dedup.jaccardPairs]], the dedup_ngram_jaccard
    * kernel) — candidates, recall, precision per arrangement. This is
    * the S-curve a 100 TB dedup deployment reads before choosing its
    * banding: more rows per band → tighter buckets → fewer candidates
    * to verify but lower recall; the shipped 4×2 tier's position on
    * the curve becomes a measured fact. Recall/precision are ratios
    * of exact integer counts (one rounded divide each — never a
    * float-sum whose order could diverge across engines).
    *
    * Scale shape: every arrangement's pair generation is the banded
    * BUCKET join (explode to (band, key), equi-join, never all-pairs
    * on the Spark side); ground truth is the prefix-filtered exact
    * kernel, computed once and semi-joined; rollup state is 4 rows.
    * The exact-truth side is OUTPUT-quadratic in clone multiplicity
    * (the dedup_ngram_jaccard precedent: 2.6M true pairs at the 10×
    * worst-case probe) — so the sweep routes through the SAMPLED-TRUTH
    * lever (round-15 VERDICT item 1): when the corpus is clone-dense
    * OR simply larger than the ≈ 20k-doc slice cap (the integer rule
    * [[dedupBandSweepStats]] certifies — modulus, not just flag),
    * BOTH the banded candidates and the exact truth run on the
    * deterministic hash slice (`portableHash(doc_id, "bsw:") % md = 0`
    * — the sample_hash_mod kernel), exactly as the ANN recall
    * harnesses bound their ground truth to sampled probes; the sized
    * banding then serves the full corpus. The oracle replays the SAME
    * rule and the SAME slice, so the routing decision itself is
    * inside the hash gate. Measured: 2.1 s full at sf0.1; the
    * 10×/100× clone-dense probes flip to sampled and COMPLETE (the
    * full-truth 100× attempt formerly spilled past local disk; see
    * BASELINE.md round-16 table). */
  private def bandSweepSql(docSrc: String,
      chooser: Option[String]): String = {
    def duckArr(r: Int): String = {
      val cond = (0 until 8 / r).map { bi =>
        (0 until r).map(j => s"a.h${bi * r + j} = b.h${bi * r + j}")
          .mkString("(", " AND ", ")")
      }.mkString(" OR ")
      s"""SELECT ${8 / r} AS bands, $r AS rows_per_band,
         |    a.doc_id AS doc1, b.doc_id AS doc2
         |  FROM sig a JOIN sig b ON a.doc_id < b.doc_id AND ($cond)"""
        .stripMargin
    }
    val sigCte = minhashSigCte.replace("FROM documents", s"FROM $docSrc")
    val lead = chooser match {
      case Some(c) => "WITH " + c + ",\n" + sigCte.stripPrefix("WITH ")
      case None => sigCte
    }
    s"""$lead,
       |sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
       |inter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
       |  FROM sh a JOIN sh b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |tp AS (
       |  SELECT d1 AS doc1, d2 AS doc2 FROM inter
       |  JOIN sizes sa ON d1 = sa.doc_id
       |  JOIN sizes sb ON d2 = sb.doc_id
       |  WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.5),
       |cand AS (
       |${Seq(1, 2, 4, 8).map(duckArr).mkString("  ", "\n  UNION ALL\n  ",
         "")}),
       |cc AS (SELECT bands, rows_per_band, count(*) AS candidates
       |       FROM cand GROUP BY bands, rows_per_band),
       |h AS (SELECT cand.bands, count(*) AS n_hits
       |      FROM cand JOIN tp ON cand.doc1 = tp.doc1
       |                       AND cand.doc2 = tp.doc2
       |      GROUP BY cand.bands),
       |tpc AS (SELECT count(*) AS true_pairs FROM tp)
       |SELECT CAST(cc.bands AS INT) AS bands,
       |  CAST(cc.rows_per_band AS INT) AS rows_per_band,
       |  CAST(cc.candidates AS BIGINT) AS candidates,
       |  CAST(tpc.true_pairs AS BIGINT) AS true_pairs,
       |  CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
       |    / tpc.true_pairs, 6) AS recall,
       |  round(CAST(coalesce(h.n_hits, 0) AS DOUBLE)
       |    / cc.candidates, 6) AS prec
       |FROM cc LEFT JOIN h ON cc.bands = h.bands
       |CROSS JOIN tpc
       |ORDER BY rows_per_band""".stripMargin
  }

  /** DuckDB spelling of the sweep's deterministic doc-slice hash. */
  private def bswHash(qual: String): String =
    duckHash(s"concat('bsw:', CAST(${qual}doc_id AS VARCHAR))")

  /** DuckDB spelling of the fixed 1-in-4 doc slice (the always-
    * sampled contract row). */
  private def bswSlice(qual: String): String =
    s"${bswHash(qual)} % 4 = 0"

  /** The band sweep's router CTE `ms(f, md)`: md = the slice modulus
    * GREATEST(⌈n_docs / 20000⌉, 4 if clone-dense else 1) — the slice
    * is bounded in SIZE (≈ 20k docs, 4× the sf0.1 fixture), not in
    * fraction, because the 8×1 arrangement's candidate set is
    * bucket-quadratic in however many docs enter the sweep (the 100×
    * probe at a fixed 25% slice spilled past local disk on candidates
    * alone — corpus size, not clone density, was the blow-up). f = 1
    * iff md > 1. */
  private val bandSweepModCte =
    """ms AS (SELECT CAST(md AS BIGINT) AS md,
      |    CASE WHEN md > 1 THEN 1 ELSE 0 END AS f
      |  FROM (SELECT GREATEST((sum(c) + 19999) // 20000,
      |      CASE WHEN coalesce(sum(c * (c - 1)), 0)
      |        >= 2 * CAST(sum(c) AS BIGINT) THEN 4 ELSE 1 END) AS md
      |    FROM (SELECT count(*) AS c FROM documents GROUP BY text)))"""
      .stripMargin

  /** Spark side of the sweep at one sampling posture (None = full
    * corpus; Some(m) = the deterministic 1/m doc slice applied to
    * BOTH the banded candidates and the exact truth). The signature
    * and shingle tables stay the session memos — sampling is a pure
    * per-row filter on top, so a routed re-run never recomputes
    * signatures. The sampled truth recounts df on the slice (the
    * full-corpus dfreq memo would mislead jaccardPairs' path probe). */
  private def bandSweepBody(s: SparkSession, dir: String,
      sampleMod: Option[Int]): DataFrame = {
    val keep = sampleMod.map(m =>
      graft.api.Sampling.portableHash(col("doc_id"), "bsw:") % m === 0)
    def slice(df: DataFrame): DataFrame =
      keep.map(df.filter).getOrElse(df)
    val sig = slice(minhashSig(s, dir))
    def bandPairs(r: Int): DataFrame = {
      val bandArr = (0 until 8 / r).map { bi =>
        val ks = (0 until r).map(j => s"'k$j', h${bi * r + j}")
          .mkString(", ")
        s"named_struct('b', $bi, $ks)"
      }.mkString("array(", ", ", ")")
      val banded = sig.select(col("doc_id"),
        explode(expr(bandArr)).as("bd"))
      banded.select(col("doc_id").as("doc1"), col("bd"))
        .join(banded.select(col("doc_id").as("doc2"), col("bd")),
          Seq("bd"))
        .filter(col("doc1") < col("doc2"))
        .select(col("doc1"), col("doc2")).distinct()
    }
    val cand = Seq(1, 2, 4, 8).map { r =>
      bandPairs(r).select(lit(8 / r).as("bands"),
        lit(r).as("rows_per_band"), col("doc1"), col("doc2"))
    }.reduce(_.unionByName(_))
    graft.plans.IntersectSizeRewrite.install(s)
    val tp = graft.api.Dedup.jaccardPairs(slice(shingles(s, dir)),
        "doc_id", num = 1, den = 2,
        dfreq = if (sampleMod.isEmpty) Some(shingleDfreq(s, dir)) else None)
      .select(col("doc1"), col("doc2"))
    val cc = cand.groupBy(col("bands"), col("rows_per_band"))
      .agg(count(lit(1)).as("candidates"))
    val h = cand.join(tp, Seq("doc1", "doc2"), "left_semi")
      .groupBy(col("bands")).agg(count(lit(1)).as("n_hits"))
    val tpc = tp.agg(count(lit(1)).as("true_pairs"))
    cc.join(h, Seq("bands"), "left").crossJoin(tpc)
      .select(col("bands"), col("rows_per_band"), col("candidates"),
        col("true_pairs"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("true_pairs"), 6).as("recall"),
        round(coalesce(col("n_hits"), lit(0L)).cast("double")
          / col("candidates"), 6).as("prec"))
      .orderBy(col("rows_per_band"))
  }

  /** The routed sweep: full-corpus truth at fixture scale, the
    * bounded hash slice once the corpus is clone-dense OR simply
    * large — decision and modulus by the [[dedupBandSweepStats]]
    * integer rule, replayed verbatim by the oracle (router CTE +
    * conditional doc source), so the ROUTE is hash-certified, not
    * just each arm. */
  val dedupBandSweep: GQuery = GQuery("dedup_band_sweep",
    bandSweepSql(
      s"(SELECT d.* FROM documents d, ms WHERE ms.f = 0 " +
        s"OR ${bswHash("d.")} % ms.md = 0)",
      Some(bandSweepModCte))) { (s, dir) =>
    val st = Tables.documents(s, dir)
      .groupBy(col("text")).agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(expr("c * (c - 1)")), lit(0L)).as("mass"),
        sum(col("c")).as("n"))
      .head()
    val modScale = ((st.getLong(1) + 19999L) / 20000L).toInt
    val modClone = if (st.getLong(0) >= 2 * st.getLong(1)) 4 else 1
    val mod = math.max(modScale, modClone)
    bandSweepBody(s, dir, if (mod > 1) Some(mod) else None)
  }

  /** The always-sampled arm as its own contract row: at fixture clone
    * density the routed [[dedupBandSweep]] exercises the full arm, so
    * this row is what keeps the SAMPLED arm hash-certified every
    * round (both arms green at every fixture, whichever the router
    * picks). */
  val dedupBandSweepSampled: GQuery = GQuery("dedup_band_sweep_sampled",
    bandSweepSql(
      s"(SELECT * FROM documents WHERE ${bswSlice("")})", None)) {
    (s, dir) => bandSweepBody(s, dir, Some(4))
  }

  /** The sweep router's SIZING PROBE as an oracle row (the
    * dedup_semantic_stats pattern: hash-certify the planning
    * decision): exact-text clone mass Σc(c−1) — twice the
    * exact-duplicate pair count, an integer one GROUP BY away, no
    * signature pass needed at planning time — and the slice modulus
    * md = GREATEST(⌈n/20000⌉, 4 if clone_mass ≥ 2·n else 1). Two
    * regimes mandate the slice: clone density (exact clones alone
    * guarantee ≥ n true pairs — the truth join is output-bound;
    * measured mass/doc 0.003 at sf0.1 vs 6.0/66.1 at the 10×/100×
    * probes) and plain corpus size (the 8×1 arrangement's candidates
    * are bucket-quadratic in sweep input — the 100× probe at a fixed
    * 25% slice spilled on candidates alone, so the slice is bounded
    * at ≈ 20k docs, 4× the fixture every arrangement measures
    * comfortably on). */
  val dedupBandSweepStats: GQuery = GQuery(
    "dedup_band_sweep_stats",
    """WITH cc AS (SELECT count(*) AS c FROM documents GROUP BY text),
      |t AS (SELECT CAST(sum(c) AS BIGINT) AS n_docs,
      |  CAST(count(*) FILTER (WHERE c > 1) AS BIGINT) AS n_clone_groups,
      |  CAST(coalesce(sum(c * (c - 1)), 0) AS BIGINT) AS clone_mass
      |  FROM cc)
      |SELECT n_docs, n_clone_groups, clone_mass,
      |  CAST(GREATEST((n_docs + 19999) // 20000,
      |    CASE WHEN clone_mass >= 2 * n_docs THEN 4 ELSE 1 END)
      |    AS INT) AS slice_mod,
      |  CASE WHEN GREATEST((n_docs + 19999) // 20000,
      |    CASE WHEN clone_mass >= 2 * n_docs THEN 4 ELSE 1 END) > 1
      |    THEN 'sampled' ELSE 'full' END AS path
      |FROM t""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .groupBy(col("text")).agg(count(lit(1)).as("c"))
      .agg(sum(col("c")).cast("bigint").as("n_docs"),
        count(when(col("c") > 1, 1)).cast("bigint").as("n_clone_groups"),
        coalesce(sum(expr("c * (c - 1)")), lit(0L)).cast("bigint")
          .as("clone_mass"))
      .select(col("n_docs"), col("n_clone_groups"), col("clone_mass"),
        greatest(expr("(n_docs + 19999) div 20000"),
          when(col("clone_mass") >= lit(2) * col("n_docs"), 4L)
            .otherwise(1L)).cast("int").as("slice_mod"),
        when(greatest(expr("(n_docs + 19999) div 20000"),
          when(col("clone_mass") >= lit(2) * col("n_docs"), 4L)
            .otherwise(1L)) > 1, "sampled")
          .otherwise("full").as("path"))
  }

  /** DEDUP-BEFORE-PAIRING — the composed scale posture for the
    * crawl-mirror boundary, end to end as ONE oracle-backed row
    * (round-16 VERDICT item 1). The exact pair-enumeration arms
    * ([[dedupNgramJaccard]] / [[dedupNgramJaccardCollapsed]]) are
    * output-quadratic on a corpus whose near-identical-but-DISTINCT
    * variants form ~100-member cliques (~10⁹ true pairs at the 100×
    * probe — both arms spill past local disk). The pipeline answer,
    * previously prose, is this chain:
    *
    *   1. exact-clone collapse — min-doc_id representative per
    *      distinct text, carrying clone count c (one map-side-
    *      combining aggregate; the ONLY full-corpus pass);
    *   2. MinHash near-dup collapse over the representatives —
    *      banded candidate pairs (est ≥ 0.5) → connected components
    *      → each clique collapses to its min-doc_id survivor, masses
    *      summing over members (Σ mass ≡ n_docs, the lossless-
    *      accounting invariant stages 1–3 all carry);
    *   3. the exact n-gram Jaccard pair join (J ≥ 1/10) over the
    *      SURVIVORS only — the join that was unaffordable on the raw
    *      corpus runs on ~distinct-content cardinality, each residual
    *      pair accounting mass1·mass2 underlying doc pairs.
    *
    * Output is the four-stage FUNNEL with integer accounting
    * (relation size + docs/pairs represented per stage) — every count
    * depends on the full chain, so the hash gate certifies the
    * composition, and the 'residual_pairs' stage certifies the final
    * join itself (4 sub-threshold pairs survive at sf0.1). The oracle
    * replays the whole chain: same md5-sliced signatures over the
    * collapsed docs, a recursive-CTE transitive closure for the
    * clusters, the same inverted-index residual join.
    *
    * Scale shape: stage 1 shuffles once on text hash; everything
    * downstream touches representatives only (at the 100× crawl-
    * mirror probe: 500k docs → 170k reps → ~5k survivors, so the
    * residual join runs at fixture cardinality where the direct pair
    * join could not finish — measured in BASELINE.md). */
  val dedupBeforePairing: GQuery = GQuery(
    "dedup_before_pairing",
    s"""${minhashPairsCte
          .replace("FROM documents", "FROM g")
          .replaceFirst("^WITH ",
            "WITH RECURSIVE g AS (SELECT min(doc_id) AS doc_id, text,\n" +
            "    count(*) AS c FROM documents GROUP BY text),\n")},
       |e AS (SELECT doc1 AS a, doc2 AS b FROM pairs
       |      UNION ALL SELECT doc2, doc1 FROM pairs),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |lab AS (SELECT a AS node, least(a, min(b)) AS rep
       |        FROM reach GROUP BY a),
       |nl AS (SELECT gg.doc_id, coalesce(l.rep, gg.doc_id) AS rep, gg.c
       |       FROM g gg LEFT JOIN lab l ON gg.doc_id = l.node),
       |surv AS (SELECT rep AS doc_id, CAST(sum(c) AS BIGINT) AS mass
       |         FROM nl GROUP BY rep),
       |ssh AS (SELECT sh.doc_id, sh.shingle FROM sh
       |        JOIN surv USING (doc_id)),
       |ssizes AS (SELECT doc_id, count(*) AS n FROM ssh GROUP BY doc_id),
       |sinter AS (SELECT a.doc_id AS d1, b.doc_id AS d2, count(*) AS i
       |  FROM ssh a JOIN ssh b
       |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2),
       |resid AS (SELECT d1, d2, ma.mass AS m1, mb.mass AS m2
       |  FROM sinter
       |  JOIN ssizes sa ON d1 = sa.doc_id
       |  JOIN ssizes sb ON d2 = sb.doc_id
       |  JOIN surv ma ON d1 = ma.doc_id
       |  JOIN surv mb ON d2 = mb.doc_id
       |  WHERE i * 10 >= (sa.n + sb.n - i) * 1)
       |SELECT * FROM (
       |  SELECT 1 AS stage_no, 'corpus' AS stage,
       |    CAST(count(*) AS BIGINT) AS n_rows,
       |    CAST(count(*) AS BIGINT) AS accounted
       |  FROM documents
       |  UNION ALL
       |  SELECT 2, 'exact_reps', CAST(count(*) AS BIGINT),
       |    CAST(sum(c) AS BIGINT) FROM g
       |  UNION ALL
       |  SELECT 3, 'near_survivors', CAST(count(*) AS BIGINT),
       |    CAST(sum(mass) AS BIGINT) FROM surv
       |  UNION ALL
       |  SELECT 4, 'residual_pairs', CAST(count(*) AS BIGINT),
       |    CAST(coalesce(sum(m1 * m2), 0) AS BIGINT) FROM resid)
       |ORDER BY stage_no""".stripMargin) { (s, dir) =>
    graft.plans.IntersectSizeRewrite.install(s)
    val docs = Tables.documentsSpread(s, dir)
    // stage 1: exact collapse (the one full-corpus pass)
    val g = PlanCache.memo(s, dir, "dbp_exact_reps") {
      docs.groupBy(col("text"))
        .agg(min(col("doc_id")).as("doc_id"), count(lit(1)).as("c"))
    }
    // stage 2: near-dup collapse over representatives only. Per-doc
    // independence makes both input frames pure FILTERS of the
    // session's shared artifacts (the dedup_ngram_jaccard_collapsed
    // precedent): a rep's text IS its clone group's text, so the
    // memoized full-corpus shingle and signature tables restricted to
    // rep ids equal wordShingles(g) / minhashSignatures(shingles(g))
    // value-for-value — tokenize + digest run once per session, not
    // once more for this stage (r17 opt: 14.2 → see OPTIMIZATION_r17).
    // The band JOIN still runs at rep cardinality — the quadratic
    // piece stage 1 exists to collapse never sees clone-dense buckets.
    val repIds = g.select(col("doc_id"))
    val shReps = PlanCache.memo(s, dir, "dbp_shingles_reps") {
      shingles(s, dir).join(repIds, Seq("doc_id"), "left_semi")
    }
    val surv = PlanCache.memo(s, dir, "dbp_survivors") {
      val sig = minhashSig(s, dir)
        .join(repIds, Seq("doc_id"), "left_semi")
      val pairs = graft.api.Dedup.minhashBandPairs(sig, "doc_id")
        .select(col("doc1"), col("doc2"))
      val labels = graft.api.Dedup
        .connectedComponentsAuto(pairs, "doc1", "doc2")._1
      g.select(col("doc_id"), col("c"))
        .join(labels, col("doc_id") === col("node"), "left")
        .select(coalesce(col("label"), col("doc_id")).as("rep"), col("c"))
        .groupBy(col("rep").as("doc_id"))
        .agg(sum(col("c")).cast("bigint").as("mass"))
    }
    // stage 3: the pair join over SURVIVORS, masses accounted
    val ssh = shReps.join(surv.select(col("doc_id")),
      Seq("doc_id"), "left_semi")
    val resid = graft.api.Dedup.jaccardPairs(ssh, "doc_id",
        num = 1, den = 10)
      .join(surv.select(col("doc_id").as("doc1"), col("mass").as("m1")),
        Seq("doc1"))
      .join(surv.select(col("doc_id").as("doc2"), col("mass").as("m2")),
        Seq("doc2"))
    def row(no: Int, name: String, df: DataFrame): DataFrame =
      df.select(lit(no).as("stage_no"), lit(name).as("stage"),
        col("n_rows").cast("bigint").as("n_rows"),
        col("accounted").cast("bigint").as("accounted"))
    row(1, "corpus", docs.agg(count(lit(1)).as("n_rows"),
        count(lit(1)).as("accounted")))
      .unionByName(row(2, "exact_reps", g.agg(count(lit(1)).as("n_rows"),
        sum(col("c")).as("accounted"))))
      .unionByName(row(3, "near_survivors",
        surv.agg(count(lit(1)).as("n_rows"),
          sum(col("mass")).as("accounted"))))
      .unionByName(row(4, "residual_pairs",
        resid.agg(count(lit(1)).as("n_rows"),
          coalesce(sum(col("m1") * col("m2")), lit(0L)).as("accounted"))))
      .orderBy(col("stage_no"))
  }

  val all: Seq[GQuery] = Seq(dedupExact, dedupNearMinhash,
    dedupEditDistance, dedupClusters, dedupClustersTwoPhase,
    dedupClustersIncremental,
    dedupKeepList, dedupSimhash, dedupNgramJaccard, dedupEmbedCosine,
    dedupIngest, dedupContainment, dedupContainmentIngest,
    dedupSpanGlobal, dedupSplitLeakage, dedupMinhashError,
    dedupThresholdSweep, dedupClusterStats, dedupBandSweep,
    dedupBandSweepSampled, dedupBandSweepStats,
    dedupNgramJaccardCollapsed, dedupNgramStats, dedupBeforePairing)
}
