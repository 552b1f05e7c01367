package graft.operators

import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** The composed corpus-preparation pipeline as ONE oracle-backed
  * contract query (graft.api.Pipeline): quality gate → exact+near
  * dedup → eval-contamination removal → mixture sampling, chained
  * over the `documents` table. Every stage is individually verified
  * elsewhere (text_quality_score, dedup_keep_list, dedup_containment,
  * sample_mixture); this query verifies the COMPOSITION — that the
  * stages agree on keys and columns end to end, which is the query a
  * training-data user actually runs first.
  *
  * The oracle replays the full chain in DuckDB: the same quality
  * decimal grid, the same md5-sliced MinHash signatures (reusing the
  * dedup family's pair CTE, narrowed to the gated corpus — per-doc
  * signatures are independent, so filtering full-corpus pairs to
  * gated endpoints IS the gated pair list), a recursive-CTE
  * transitive closure for the near-dup clusters, the same asymmetric
  * containment, and the same integer-exact mixture hash. */
object PipelineQueries {

  private val stop =
    "('a','the','and','of','to','in','is','on','for','with')"

  /** Mixture rates shared with the Spark side: downsample two named
    * sources, ban one, keep the rest at 1/8. */
  private val rates = Seq("src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.0)
  private val duckRate = rates.map { case (g, r) =>
    s"WHEN '$g' THEN ${(r * 65536).toLong}" }.mkString(" ")

  val pipelineCorpusPrep: GQuery = GQuery(
    "pipeline_corpus_prep",
    s"""${DedupQueries.minhashPairsCte.replaceFirst("^WITH ", "WITH RECURSIVE ")},
       |tokq AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |         FROM documents),
       |per_doc AS (SELECT doc_id,
       |    count(*) AS n_tokens,
       |    count(DISTINCT term) AS n_distinct,
       |    sum(CASE WHEN term IN $stop THEN 1 ELSE 0 END) AS n_stop
       |  FROM tokq GROUP BY doc_id),
       |qual AS (SELECT doc_id, CAST(round(
       |    0.5 * CAST(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6)
       |               AS DECIMAL(12,6))
       |    + 0.3 * (1 - CAST(round(CAST(n_stop AS DOUBLE) / n_tokens, 6)
       |                      AS DECIMAL(12,6)))
       |    + 0.002 * least(n_tokens, 100), 6) AS DOUBLE) AS quality
       |  FROM per_doc),
       |corpus AS (SELECT d.doc_id, d.text, d.source, d.lang, q.quality
       |  FROM documents d JOIN qual q USING (doc_id)
       |  WHERE d.doc_id % 10 <> 7 AND q.quality >= 0.61),
       |gp AS (SELECT doc1, doc2 FROM pairs
       |  WHERE doc1 IN (SELECT doc_id FROM corpus)
       |    AND doc2 IN (SELECT doc_id FROM corpus)),
       |e AS (SELECT doc1 AS a, doc2 AS b FROM gp
       |      UNION ALL SELECT doc2, doc1 FROM gp),
       |reach(a, b) AS (
       |  SELECT a, b FROM e
       |  UNION
       |  SELECT r.a, e.b FROM reach r JOIN e ON r.b = e.a),
       |lab AS (SELECT a AS node, least(a, min(b)) AS rep
       |        FROM reach GROUP BY a),
       |ex AS (SELECT doc_id,
       |    row_number() OVER (PARTITION BY text ORDER BY doc_id) AS rn
       |  FROM corpus),
       |keeps AS (SELECT c.doc_id FROM corpus c JOIN ex USING (doc_id)
       |  LEFT JOIN lab ON c.doc_id = lab.node
       |  WHERE ex.rn = 1 AND (lab.node IS NULL OR lab.rep = c.doc_id)),
       |ev AS (SELECT doc_id AS eval_id, shingle FROM sh
       |       WHERE doc_id % 10 = 7),
       |tr AS (SELECT doc_id AS train_id, shingle FROM sh
       |       WHERE doc_id IN (SELECT doc_id FROM keeps)),
       |sizes AS (SELECT eval_id, count(*) AS n FROM ev GROUP BY eval_id),
       |inter AS (SELECT v.eval_id, t.train_id, count(*) AS i
       |  FROM ev v JOIN tr t ON v.shingle = t.shingle
       |  GROUP BY 1, 2),
       |contaminated AS (SELECT DISTINCT i.train_id
       |  FROM inter i JOIN sizes s USING (eval_id)
       |  WHERE i.i * 2 >= s.n),
       |clean AS (SELECT k.doc_id FROM keeps k
       |  WHERE k.doc_id NOT IN (SELECT train_id FROM contaminated))
       |SELECT c.doc_id, d.source, d.lang, q.quality
       |FROM clean c JOIN documents d USING (doc_id)
       |JOIN qual q USING (doc_id)
       |WHERE CAST(concat('0x',
       |    substr(md5(concat('mix:', CAST(c.doc_id AS VARCHAR))), 1, 12))
       |    AS BIGINT) % 65536
       |  < CASE d.source $duckRate ELSE ${65536 / 8} END
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    graft.api.Pipeline.corpusPrep(
      Tables.documents(s, dir), "doc_id", "text", "source",
      isEval = col("doc_id") % 10 === 7, minQuality = 0.61,
      rates = rates.toMap, defaultRate = 0.125,
      // donate the session-memoized shingle table, full-corpus
      // near-dup pair list (dedup family) and token explode (text
      // family) — the quality gate then tokenizes nothing (r17 opt)
      shingles = Some(DedupQueries.shingles(s, dir)),
      pairs = Some(DedupQueries.minhashPairsSpark(s, dir)),
      tokens = Some(TextQueries.tokens(s, dir)
        .select(col("doc_id"), col("term").as("token"))))
      .select(col("doc_id"), col("source"), col("lang"), col("quality"))
      .orderBy(col("doc_id"))
  }

  /** DATASET CARD: the per-(lang, source) corpus documentation table a
    * training-data team publishes — doc/token/char volumes, exact-dup
    * incidence, summed quality — computed in one pass shapes:
    * token/char counts are per-row projections (no explode), quality
    * is the ROW-LOCAL scorer (spec-pinned ≡ the batch aggregate
    * scorer), and the dup flag joins on sha2(text) so raw text never
    * rides a shuffle key. All outputs are exact (counts, integer
    * sums, decimal-summed quality) — no order-sensitive float
    * accumulation anywhere. */
  val pipelineDatasetCard: GQuery = GQuery(
    "pipeline_dataset_card",
    s"""WITH tokq AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |              FROM documents),
       |per_doc AS (SELECT doc_id,
       |    count(*) AS n_tokens,
       |    count(DISTINCT term) AS n_distinct,
       |    sum(CASE WHEN term IN $stop THEN 1 ELSE 0 END) AS n_stop
       |  FROM tokq GROUP BY doc_id),
       |qual AS (SELECT doc_id, CAST(round(
       |    0.5 * CAST(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6)
       |               AS DECIMAL(12,6))
       |    + 0.3 * (1 - CAST(round(CAST(n_stop AS DOUBLE) / n_tokens, 6)
       |                      AS DECIMAL(12,6)))
       |    + 0.002 * least(n_tokens, 100), 6) AS DOUBLE) AS quality
       |  FROM per_doc),
       |dup AS (SELECT text FROM documents GROUP BY text HAVING count(*) > 1)
       |SELECT lang, source,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS sum_tokens,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars,
       |  CAST(sum(CASE WHEN text IN (SELECT text FROM dup)
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
       |  CAST(round(sum(CAST(q.quality AS DECIMAL(12,6))), 6) AS DOUBLE)
       |    AS sum_quality
       |FROM documents d JOIN qual q USING (doc_id)
       |GROUP BY lang, source
       |ORDER BY lang, source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val quality = graft.streaming.TextStreams
      .qualityScoreRow(docs, "doc_id", "text")
      .select(col("doc_id"), col("quality"))
    val dupHashes = docs
      .groupBy(sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("dup_cnt"))
      .filter(col("dup_cnt") > 1)
    docs.select(col("doc_id"), col("lang"), col("source"), col("n_chars"),
        size(split(col("text"), " ")).as("ws_tokens"),
        sha2(col("text"), 256).as("h"))
      .join(quality, Seq("doc_id"))
      .join(dupHashes, Seq("h"), "left")
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ws_tokens")).cast("bigint").as("sum_tokens"),
        sum(col("n_chars")).as("sum_chars"),
        sum(when(col("dup_cnt").isNotNull, 1L).otherwise(0L))
          .as("n_dup_docs"),
        round(sum(col("quality").cast("decimal(12,6)")), 6)
          .cast("double").as("sum_quality"))
      .orderBy(col("lang"), col("source"))
  }

  /** Shuffle-key skew report — the diagnostic a pipeline operator
    * runs BEFORE keying a 100 TB join/groupBy on a column: the 20
    * hottest keys with count and share-of-total, plus the key-space
    * size, over events.user_id. Plan shape is the scale-safe one: a
    * map-side-combining per-key count, a 1-row total/cardinality
    * aggregate broadcast back, and a TakeOrdered top-k (never a
    * global window). The share a hot key claims here is exactly the
    * fraction of a downstream shuffle that would land on one task —
    * the number that decides salting. */
  val pipelineSkewReport: GQuery = GQuery(
    "pipeline_skew_report",
    """WITH c AS (SELECT user_id, CAST(count(*) AS BIGINT) AS cnt
      |           FROM events GROUP BY user_id),
      |t AS (SELECT CAST(sum(cnt) AS BIGINT) AS total,
      |        CAST(count(*) AS BIGINT) AS n_keys FROM c)
      |SELECT user_id, cnt,
      |  round(CAST(cnt AS DOUBLE) / total, 6) AS share, n_keys
      |FROM c CROSS JOIN t
      |ORDER BY cnt DESC, user_id
      |LIMIT 20""".stripMargin) { (s, dir) =>
    val c = Tables.events(s, dir)
      .groupBy(col("user_id")).agg(count(lit(1)).as("cnt"))
    val t = c.agg(sum(col("cnt")).cast("bigint").as("total"),
      count(lit(1)).as("n_keys"))
    c.crossJoin(broadcast(t))
      .select(col("user_id"), col("cnt"),
        round(col("cnt").cast("double") / col("total"), 6).as("share"),
        col("n_keys"))
      .orderBy(col("cnt").desc, col("user_id"))
      .limit(20)
  }

  /** CURATION-FUNNEL report — per-stage survival through the chained
    * quality gates (length → quality score → repetition → exact
    * dedup): the "where did my corpus go" table every dataset card
    * prints next to the final counts, and the first thing to read
    * when a filter change nukes half the data. Stages apply
    * SEQUENTIALLY (each n_in = the previous stage's n_kept); rates
    * divide two already-exact integer counts, rounded to 6.
    *
    * Scale shape: per-row gates (length), per-doc map-side-combining
    * aggregates reusing the text family's grids (quality, bigram
    * repetition), and the min-id exact-dedup aggregate; each stage's
    * count is a 1-row aggregate. The per-doc score frames join on
    * doc_id — keyed, AQE-sized. */
  val pipelineFilterFunnel: GQuery = GQuery(
    "pipeline_filter_funnel",
    s"""WITH s0 AS (SELECT doc_id, text, n_chars FROM documents),
       |s1 AS (SELECT * FROM s0 WHERE n_chars >= 150),
       |tokf AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |         FROM s1),
       |pdoc AS (SELECT doc_id, count(*) AS n_tokens,
       |    count(DISTINCT term) AS n_distinct,
       |    sum(CASE WHEN term IN $stop THEN 1 ELSE 0 END) AS n_stop
       |  FROM tokf GROUP BY doc_id),
       |qual AS (SELECT doc_id, CAST(round(
       |    0.5 * CAST(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6)
       |               AS DECIMAL(12,6))
       |    + 0.3 * (1 - CAST(round(CAST(n_stop AS DOUBLE) / n_tokens, 6)
       |                      AS DECIMAL(12,6)))
       |    + 0.002 * least(n_tokens, 100), 6) AS DOUBLE) AS q
       |  FROM pdoc),
       |s2 AS (SELECT s1.* FROM s1 JOIN qual USING (doc_id)
       |       WHERE q >= 0.62),
       |ng AS (SELECT doc_id, unnest([t[i] || ' ' || t[i+1]
       |                              for i in generate_series(1, len(t) - 1)])
       |         AS g
       |       FROM (SELECT doc_id, string_split(text, ' ') AS t FROM s2)),
       |ngc AS (SELECT doc_id, g, count(*) AS c FROM ng GROUP BY 1, 2),
       |rep AS (SELECT doc_id,
       |    round(CAST(sum(CASE WHEN c > 1 THEN c ELSE 0 END) AS DOUBLE)
       |          / sum(c), 6) AS dup_frac
       |  FROM ngc GROUP BY doc_id),
       |s3 AS (SELECT s2.* FROM s2 JOIN rep USING (doc_id)
       |       WHERE dup_frac <= 0.2),
       |s4 AS (SELECT min(doc_id) AS doc_id FROM s3 GROUP BY text),
       |n AS (SELECT 0 AS stage_idx, 'raw' AS stage,
       |        (SELECT count(*) FROM s0) AS n_in,
       |        (SELECT count(*) FROM s0) AS n_kept
       |      UNION ALL SELECT 1, 'len_150',
       |        (SELECT count(*) FROM s0), (SELECT count(*) FROM s1)
       |      UNION ALL SELECT 2, 'quality_0.62',
       |        (SELECT count(*) FROM s1), (SELECT count(*) FROM s2)
       |      UNION ALL SELECT 3, 'repetition_0.2',
       |        (SELECT count(*) FROM s2), (SELECT count(*) FROM s3)
       |      UNION ALL SELECT 4, 'exact_dedup',
       |        (SELECT count(*) FROM s3), (SELECT count(*) FROM s4))
       |SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
       |  CAST(n_in AS BIGINT) AS n_in, CAST(n_kept AS BIGINT) AS n_kept,
       |  round(CAST(n_kept AS DOUBLE) / n_in, 6) AS keep_rate
       |FROM n ORDER BY stage_idx""".stripMargin) { (s, dir) =>
    import graft.Ckpt.CkptOps
    val s0 = Tables.documentsSpread(s, dir)
      .select(col("doc_id"), col("text"), col("n_chars"))
    val s1 = s0.filter(col("n_chars") >= 150)
    // r17 opt, two fixes to the same waste (guide §1.2):
    //  - the quality and repetition scores now FILTER the session's
    //    memoized token/bigram explodes (per-doc independence — the
    //    dedup_before_pairing argument) instead of re-tokenizing each
    //    surviving stage;
    //  - s2/s3 are checkpointed, so the five stage counts below
    //    execute each gate ONCE — previously n3 re-ran the quality
    //    chain and n4 re-ran quality + repetition (3× tokenize).
    val s1Ids = s1.select(col("doc_id"))
    val qual = graft.api.Text.qualityScoreFromTokens(
        TextQueries.tokens(s, dir).select(col("doc_id"), col("term"))
          .join(s1Ids, Seq("doc_id"), "left_semi"),
        "doc_id", token = "term")
      .select(col("doc_id"), col("quality"))
    val s2 = s1.join(qual, Seq("doc_id")).filter(col("quality") >= 0.62)
      .select(col("doc_id"), col("text")).ckpt()
    val rep = graft.api.Text.repetitionFromNgrams(
        TextQueries.bigrams(s, dir)
          .join(s2.select(col("doc_id")), Seq("doc_id"), "left_semi"),
        "doc_id")
      .select(col("doc_id"), col("dup_frac"))
    val s3 = s2.join(rep, Seq("doc_id")).filter(col("dup_frac") <= 0.2)
      .select(col("doc_id"), col("text")).ckpt()
    val s4 = s3.groupBy(col("text")).agg(min(col("doc_id")).as("doc_id"))
    // one count per stage frame; the tiny stage-count rows then union
    val Seq(n0, n1, n2, n3, n4) = Seq(s0, s1, s2, s3, s4).map(_.count())
    val rows = Seq(
      (0, "raw", n0, n0), (1, "len_150", n0, n1),
      (2, "quality_0.62", n1, n2), (3, "repetition_0.2", n2, n3),
      (4, "exact_dedup", n3, n4))
    import s.implicits._
    rows.toDF("stage_idx", "stage", "n_in", "n_kept")
      .select(col("stage_idx"), col("stage"), col("n_in"), col("n_kept"),
        round(col("n_kept").cast("double") / col("n_in"), 6)
          .as("keep_rate"))
      .orderBy(col("stage_idx"))
  }

  /** KNOB CARD — the sizing sweeps turned into CERTIFIED DECISIONS
    * (the dedup_cluster_stats pattern: don't just expose the planning
    * inputs, hash-check the planning OUTPUT): five one-table sweeps
    * (watermark delay, session gap, as-of tolerance, token budget,
    * packing sequence length) are each reduced to one operating point
    * by a fixed total rule — "smallest knob value satisfying the
    * bound, else the safest extreme" — and the five chosen points are
    * the row. A pipeline deploys FROM this card; oracle parity means
    * both engines agree not just on every curve but on every CHOICE.
    * Rules (documented bounds, not tuned): watermark = smallest delay
    * with late_share ≤ 5%; session gap = smallest gap within 2% of
    * the 60-min session count (integer compare 100·n ≤ 102·ref);
    * as-of = smallest tolerance with match_share ≥ 2%; budget =
    * largest budget (smallest denominator) holding the 0.63 quality
    * floor; packing = smallest seqLen with ≤ 0.2 splits/doc.
    *
    * Spark side composes the five CONTRACT sweeps' own frames
    * (each .fn reused verbatim — the card can never disagree with
    * the curves it summarizes); the oracle composes the five sweeps'
    * SHARED CTE-chain constants (watermarkSweepCte /
    * sessionGapSweepCte / asofSweepCte / budgetSweepCte /
    * packSweepCte — the same strings the sweeps' own oracles are
    * built from, so a future edit to any sweep's chain or scoring
    * formula flows into the card automatically; round-14 ADVICE).
    * Selection is an ok-flag sort with a deterministic fallback key,
    * LIMIT 1 per knob.
    *
    * Scale shape: the five sweeps' own shapes (each one pass +
    * predicate aggregates, all probed to 100×); selection adds five
    * ≤5-row sorts. */
  val pipelineKnobCard: GQuery = {
    GQuery("pipeline_knob_card",
      s"""WITH ${EventQueries.watermarkSweepCte},
         |${EventQueries.sessionGapSweepCte},
         |${JoinQueries.asofSweepCte},
         |${SampleQueries.budgetSweepCte},
         |${TextQueries.packSweepCte}
         |SELECT * FROM (
         |  (SELECT 'asof_tolerance_min' AS knob,
         |     CAST(tol_min AS INT) AS chosen,
         |     CAST(match_share AS DOUBLE) AS metric
         |   FROM (SELECT *, CASE WHEN match_share >= 0.02
         |                   THEN 1 ELSE 0 END AS ok FROM a1f)
         |   ORDER BY ok DESC,
         |     CASE WHEN ok = 1 THEN tol_min ELSE -tol_min END
         |   LIMIT 1)
         |  UNION ALL
         |  (SELECT 'pack_seq_len', CAST(seq_len AS INT),
         |     CAST(splits_per_doc AS DOUBLE)
         |   FROM (SELECT *, CASE WHEN splits_per_doc <= 0.2
         |                   THEN 1 ELSE 0 END AS ok FROM p1f)
         |   ORDER BY ok DESC,
         |     CASE WHEN ok = 1 THEN seq_len ELSE -seq_len END
         |   LIMIT 1)
         |  UNION ALL
         |  (SELECT 'session_gap_min', CAST(gap_min AS INT),
         |     round(CAST(n_sessions AS DOUBLE) / ref, 6)
         |   FROM (SELECT *, CASE WHEN 100 * n_sessions <= 102 * ref
         |                   THEN 1 ELSE 0 END AS ok FROM s1f)
         |   ORDER BY ok DESC,
         |     CASE WHEN ok = 1 THEN gap_min ELSE -gap_min END
         |   LIMIT 1)
         |  UNION ALL
         |  (SELECT 'token_budget_denom', CAST(denom AS INT),
         |     CAST(min_quality AS DOUBLE)
         |   FROM (SELECT *, CASE WHEN min_quality >= 0.63
         |                   THEN 1 ELSE 0 END AS ok FROM b1f)
         |   ORDER BY ok DESC,
         |     CASE WHEN ok = 1 THEN denom ELSE -denom END
         |   LIMIT 1)
         |  UNION ALL
         |  (SELECT 'watermark_delay_min', CAST(delay_min AS INT),
         |     CAST(late_share AS DOUBLE)
         |   FROM (SELECT *, CASE WHEN late_share <= 0.05
         |                   THEN 1 ELSE 0 END AS ok FROM w1f)
         |   ORDER BY ok DESC,
         |     CASE WHEN ok = 1 THEN delay_min ELSE -delay_min END
         |   LIMIT 1))
         |ORDER BY knob""".stripMargin) { (s, dir) =>
      import org.apache.spark.sql.expressions.Window
      import org.apache.spark.sql.{Column, DataFrame}
      def pick(df: DataFrame, ok: Column, key: Column, knob: String,
          metric: Column): DataFrame =
        df.withColumn("ok", when(ok, 1).otherwise(0))
          .orderBy(col("ok").desc,
            when(col("ok") === 1, key).otherwise(-key))
          .limit(1)
          .select(lit(knob).as("knob"), key.cast("int").as("chosen"),
            metric.cast("double").as("metric"))
      val wm = pick(EventQueries.evWatermarkSweep.fn(s, dir),
        col("late_share") <= 0.05, col("delay_min"),
        "watermark_delay_min", col("late_share"))
      val sg = pick(
        EventQueries.evSessionGapSweep.fn(s, dir)
          .withColumn("ref",
            min(col("n_sessions")).over(Window.partitionBy())),
        col("n_sessions") * 100 <= col("ref") * 102, col("gap_min"),
        "session_gap_min",
        round(col("n_sessions").cast("double") / col("ref"), 6))
      val af = pick(JoinQueries.joinAsofSweep.fn(s, dir),
        col("match_share") >= 0.02, col("tol_min"),
        "asof_tolerance_min", col("match_share"))
      val bu = pick(SampleQueries.sampleBudgetSweep.fn(s, dir),
        col("min_quality") >= 0.63, col("denom"),
        "token_budget_denom", col("min_quality"))
      val pk = pick(TextQueries.textPackSweep.fn(s, dir),
        col("splits_per_doc") <= 0.2, col("seq_len"),
        "pack_seq_len", col("splits_per_doc"))
      wm.unionByName(sg).unionByName(af).unionByName(bu)
        .unionByName(pk).orderBy(col("knob"))
    }
  }

  val all: Seq[GQuery] = Seq(pipelineCorpusPrep, pipelineDatasetCard,
    pipelineSkewReport, pipelineFilterFunnel, pipelineKnobCard)
}
