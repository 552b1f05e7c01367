package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Deterministic sampling for training-data pipelines (SURVEY.md
  * §2.8 extras): reproducible subsets a 100 TB pipeline can re-derive
  * bit-identically on any engine.
  *
  * Both samplers key on the portable 48-bit md5-derived hash (the
  * same construction the dedup family uses) instead of engine RNG —
  * `Dataset.sample` is seed-stable only within one Spark version and
  * not reproducible in another engine, which makes held-out splits
  * unauditable. Hash-mod sampling is a pure per-row filter (pushed
  * into the scan pipeline, no shuffle); stratified top-k-by-hash is
  * one window per stratum — the standard "deterministic reservoir"
  * at scale.
  */
object SampleQueries {

  private def duckHash(seedAndVal: String): String =
    s"CAST(concat('0x', substr(md5($seedAndVal), 1, 12)) AS BIGINT)"

  /** ~10% Bernoulli sample by hash bucket: every engine picks the
    * SAME rows. Reported as per-lang counts + exact char sum. */
  val sampleHashMod: GQuery = GQuery(
    "sample_hash_mod",
    s"""SELECT lang, CAST(count(*) AS BIGINT) AS n_sampled,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM documents
       |WHERE ${duckHash("concat('smp:', CAST(doc_id AS VARCHAR))")} % 10 = 0
       |GROUP BY lang
       |ORDER BY lang""".stripMargin) { (s, dir) =>
    graft.api.Sampling.hashBernoulli(
      Tables.documents(s, dir), "doc_id", modulus = 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_sampled"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .orderBy(col("lang"))
  }

  /** Stratified fixed-size sample: the k = 20 docs with the smallest
    * salted hash per lang — a deterministic per-stratum reservoir.
    * Emits the sampled rows themselves (doc_id is the unique sort
    * tiebreak). */
  val sampleStratified: GQuery = GQuery(
    "sample_stratified",
    s"""SELECT lang, doc_id, n_chars
       |FROM (
       |  SELECT lang, doc_id, n_chars,
       |    row_number() OVER (PARTITION BY lang
       |      ORDER BY ${duckHash("concat('str:', CAST(doc_id AS VARCHAR))")},
       |               doc_id) AS rn
       |  FROM documents)
       |WHERE rn <= 20
       |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    graft.api.Sampling.stratifiedTopK(
      Tables.documents(s, dir)
        .select(col("lang"), col("doc_id"), col("n_chars")),
      "lang", "doc_id", k = 20)
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Mixture-weight sampling (graft.api.Sampling.mixtureWeighted):
    * per-SOURCE keep rates — the step that turns a raw crawl into a
    * training mixture (downsample the dominant source, keep the
    * curated one whole). Rates quantized to 1/65536 so the hash
    * comparison is integer-exact cross-engine; reported as the kept
    * rows themselves. */
  val sampleMixture: GQuery = {
    val rates = Seq("src0" -> 0.25, "src1" -> 0.5, "src2" -> 0.0)
    val duckRate = rates.map { case (g, r) =>
      s"WHEN '$g' THEN ${(r * 65536).toLong}" }.mkString(" ")
    GQuery(
      "sample_mixture",
      s"""SELECT doc_id, source
         |FROM documents
         |WHERE ${duckHash("concat('mix:', CAST(doc_id AS VARCHAR))")} % 65536
         |  < CASE source $duckRate ELSE ${65536 / 8} END
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      graft.api.Sampling.mixtureWeighted(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "doc_id", "source", rates.toMap, defaultRate = 0.125)
        .orderBy(col("doc_id"))
    }
  }

  /** Mixture REPLICATION (graft.api.Sampling.mixtureReplicated):
    * the upsampling half — rates above 1 emit whole copies plus a
    * deterministic fractional copy, rates below 1 downsample, all
    * from the same quantized hash decision. Emits the replicated
    * rows with their 0-based copy index ((doc_id, copy) is the
    * unique key downstream shuffles spread on). */
  val sampleMixtureUpsampled: GQuery = {
    val rates = Seq("src0" -> 2.5, "src1" -> 0.5, "src2" -> 0.0)
    val d = 65536L
    def q(r: Double): Long = (r * d).toLong
    val duckBase = rates.map { case (g, r) =>
      s"WHEN '$g' THEN ${q(r) / d}" }.mkString(" ")
    val duckFrac = rates.map { case (g, r) =>
      s"WHEN '$g' THEN ${q(r) % d}" }.mkString(" ")
    GQuery(
      "sample_mixture_upsampled",
      s"""WITH c AS (SELECT doc_id, source,
         |    CASE source $duckBase ELSE 1 END
         |    + CASE WHEN ${duckHash("concat('mix:', CAST(doc_id AS VARCHAR))")}
         |        % $d < CASE source $duckFrac ELSE 0 END
         |      THEN 1 ELSE 0 END AS copies
         |  FROM documents)
         |SELECT doc_id, source,
         |  CAST(unnest(generate_series(0, copies - 1)) AS BIGINT) AS copy
         |FROM c WHERE copies > 0
         |ORDER BY doc_id, copy""".stripMargin) { (s, dir) =>
      graft.api.Sampling.mixtureReplicated(
        Tables.documents(s, dir).select(col("doc_id"), col("source")),
        "doc_id", "source", rates.toMap, defaultRate = 1.0)
        .select(col("doc_id"), col("source"), col("copy"))
        .orderBy(col("doc_id"), col("copy"))
    }
  }

  /** Deterministic 8/1/1 train/val/test split manifest: every row's
    * split label is a pure function of its portable doc_id hash, so
    * any engine (and any future re-read) derives the same held-out
    * sets — reported as per-(split, lang) counts + char sums. A
    * per-row projection + one small aggregate; no shuffle before the
    * final rollup, streaming-safe assignment. */
  val sampleSplitAssign: GQuery = GQuery(
    "sample_split_assign",
    s"""WITH a AS (
       |  SELECT lang, n_chars,
       |    CASE WHEN h < 8 THEN 'train' WHEN h < 9 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM (SELECT lang, n_chars,
       |          ${duckHash("concat('spl:', CAST(doc_id AS VARCHAR))")}
       |            % 10 AS h
       |        FROM documents))
       |SELECT split, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |FROM a GROUP BY split, lang
       |ORDER BY split, lang""".stripMargin) { (s, dir) =>
    graft.api.Sampling.splitAssign(Tables.documents(s, dir), "doc_id")
      .groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
      .orderBy(col("split"), col("lang"))
  }

  /** Temperature-flattened mixture (graft.api.Sampling
    * .temperatureSampled): keep rates derived from the data itself —
    * targets ∝ √n_source scaled to half the corpus, dominant sources
    * downsampled hardest, rare ones kept whole — the α = 0.5
    * rebalancing of multilingual-corpus practice, with the same
    * integer-exact hash filter as sample_mixture. Reported as the
    * per-source manifest (total, derived integer threshold, kept). */
  val sampleTemperature: GQuery = GQuery(
    "sample_temperature",
    s"""WITH c AS (SELECT source, CAST(count(*) AS BIGINT) AS n
       |           FROM documents GROUP BY source),
       |t AS (SELECT CAST(sum(CAST(round(sqrt(CAST(n AS DOUBLE)), 6)
       |               AS DECIMAL(18,6))) AS DOUBLE) AS s,
       |             CAST(sum(n) AS BIGINT) AS total FROM c),
       |r AS (SELECT source, n,
       |        CAST(round(least(1.0,
       |          round(0.5 * total * round(sqrt(CAST(n AS DOUBLE)), 6)
       |            / (s * n), 6)) * 65536) AS BIGINT) AS thr
       |      FROM c, t),
       |k AS (SELECT d.source, CAST(count(*) AS BIGINT) AS n_kept
       |      FROM documents d JOIN r USING (source)
       |      WHERE ${duckHash("concat('tmp:', CAST(doc_id AS VARCHAR))")}
       |        % 65536 < thr
       |      GROUP BY d.source)
       |SELECT r.source, r.n AS n_docs, r.thr,
       |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept
       |FROM r LEFT JOIN k ON r.source = k.source
       |ORDER BY r.source""".stripMargin) { (s, dir) =>
    val docs = Tables.documents(s, dir)
    val thr = graft.api.Sampling.temperatureThresholds(docs, "source")
      .select(col("source"), col("__n").as("n_docs"),
        col("__thr").as("thr"))
    val kept = graft.api.Sampling.temperatureSampled(docs, "doc_id",
        "source")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"))
    thr.join(kept, Seq("source"), "left")
      .select(col("source"), col("n_docs"), col("thr"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"))
      .orderBy(col("source"))
  }

  /** Quality-ordered token-BUDGET fill — "take the best documents
    * until the token budget is spent", the selection step of a
    * fixed-compute pre-training run (budget here: ¼ of the corpus's
    * whitespace tokens, derived from the data so the query is
    * SF-relative). Docs are ranked by the text_quality_score metric
    * (desc, doc_id tiebreak) and kept while the INCLUSIVE running
    * token total fits the budget.
    *
    * Scale shape: the global running sum is api.Text's DISTRIBUTED
    * prefix sum (range buckets → 8-row base-offset collect →
    * per-bucket windows), never a single-partition window — the rank
    * order rides a composite numeric key ((1e6−quality·1e6)·1e8 +
    * doc_id, exact on quality's 6-place grid for doc_id < 1e8) so
    * the bucketing stays a pure function of one orderable column.
    * The budget scalar joins back as a 1-row broadcast. The oracle
    * is the naive single-window cumulative sum — same integers. */
  val sampleTokenBudget: GQuery = {
    val stop = graft.api.Text.defaultStopwords
      .map(w => s"'$w'").mkString("(", ",", ")")
    GQuery(
      "sample_token_budget",
      s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
         |             FROM documents),
         |per_doc AS (SELECT doc_id, count(*) AS n_tokens,
         |    count(DISTINCT term) AS n_distinct,
         |    sum(CASE WHEN term IN $stop THEN 1 ELSE 0 END) AS n_stop
         |  FROM tok GROUP BY doc_id),
         |scored AS (SELECT doc_id, n_tokens,
         |    CAST(round(
         |      0.5 * CAST(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6)
         |                 AS DECIMAL(12,6))
         |      + 0.3 * (1 - CAST(round(CAST(n_stop AS DOUBLE) / n_tokens, 6)
         |                        AS DECIMAL(12,6)))
         |      + 0.002 * least(n_tokens, 100), 6) AS DOUBLE) AS quality
         |  FROM per_doc),
         |b AS (SELECT CAST(sum(n_tokens) // 4 AS BIGINT) AS budget
         |      FROM scored),
         |c AS (SELECT doc_id, n_tokens, quality,
         |    CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id)
         |      AS BIGINT) AS cum
         |  FROM scored)
         |SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens, quality, cum
         |FROM c CROSS JOIN b WHERE cum <= budget
         |ORDER BY doc_id""".stripMargin) { (s, dir) =>
      // consume the SHARED memoized token explode (TextQueries.tokens):
      // at 100 TB the corpus is tokenized once for quality scoring,
      // LID, TF-IDF — and this budget fill — not re-exploded per query
      val scored = graft.api.Text.qualityScoreFromTokens(
        TextQueries.tokens(s, dir).withColumnRenamed("term", "token"),
        "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("quality"))
      // composite rank key: quality desc then doc_id asc, as one
      // long. The doc_id field is 8 decimal digits — an id >= 1e8
      // would silently corrupt both the pack order and the k % 1e8
      // decode, so out-of-range FAILS FAST (per-row branch, still
      // codegen'd; unreachable at fixture SFs, reachable at 100 TB).
      val docIdChecked = graft.api.Keys.checkedRange(
        col("doc_id"), 0L, 100000000L,
        "sample_token_budget: doc_id (8-digit composite-key field)")
      val keyed = scored.select(
        ((lit(1000000L) - round(col("quality") * 1e6).cast("long"))
          * lit(100000000L) + docIdChecked).as("k"),
        col("n_tokens").as("tok"))
      val budget = broadcast(
        keyed.agg((sum(col("tok")) / 4).cast("long").as("budget")))
      graft.api.Text.packFromCounts(keyed, "k", "tok", seqLen = 1)
        .crossJoin(budget)
        .withColumn("cum", (col("off") + col("tok")).cast("bigint"))
        .filter(col("cum") <= col("budget"))
        .select((col("k") % 100000000L).as("doc_id"),
          col("tok").cast("bigint").as("n_tokens"),
          ((lit(1000000L) - expr("k div 100000000"))
            .cast("double") / 1e6).as("quality"),
          col("cum"))
        .orderBy(col("doc_id"))
    }
  }

  /** DoReMi-FLAVORED DOMAIN REWEIGHTING — the mixture-weight operator
    * of modern pre-training data pipelines (Xie et al. 2023's DoReMi
    * uses a proxy model's excess loss per domain; this deterministic
    * relational form uses the corpus's own add-1 unigram surprisal as
    * the loss proxy, the text_surprisal dictionary): per language
    * domain — token count, mean token surprisal, EXCESS surprisal
    * over the corpus mean, and the renormalized mixture weight
    * w_d ∝ n_tokens_d · (1 + excess_d). Domains whose text is harder
    * than average under the shared model are upweighted; the weights
    * column is what sample_mixture consumes as its target shares.
    *
    * Determinism end to end: per-token scores live on the
    * DECIMAL(14,8) grid (exact order-free sums); the two means are
    * single rounded divides of exact aggregates; excess goes through
    * a comparison (never a −0.0-producing round of a negative
    * near-zero); the weight numerator is INTEGER micro-units
    * (n_tokens × round((1+excess)·10⁶)) so the normalizer is an
    * exact integer sum — no float-sum ordering anywhere.
    *
    * Scale shape: one token explode scored against the shared
    * dictionary (vocabulary-keyed join, AQE-promoted), rollup state
    * ≤ |domains| rows; the corpus-total and normalizer scalars are
    * 1-row broadcasts. */
  val sampleDoremiWeights: GQuery = GQuery(
    "sample_doremi_weights",
    """WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS token
      |             FROM documents),
      |cnt AS (SELECT token, count(*) AS c FROM tok GROUP BY 1),
      |tot AS (SELECT CAST(sum(c) AS BIGINT) AS n, count(*) AS v FROM cnt),
      |sc AS (SELECT token,
      |         CAST(round(-ln((c + 1.0) / (n + v)), 8) AS DECIMAL(14,8))
      |           AS s
      |       FROM cnt CROSS JOIN tot),
      |lt AS (SELECT d.lang, sc.s
      |       FROM tok JOIN sc USING (token)
      |       JOIN documents d USING (doc_id)),
      |dom AS (SELECT lang, count(*) AS n_tokens, sum(s) AS ssum
      |        FROM lt GROUP BY lang),
      |dp AS (SELECT lang, count(*) AS n_docs FROM documents
      |       GROUP BY lang),
      |gt AS (SELECT sum(ssum) AS gsum,
      |          CAST(sum(n_tokens) AS BIGINT) AS gtok FROM dom),
      |m AS (SELECT dom.lang, dp.n_docs, dom.n_tokens,
      |        round(CAST(ssum AS DOUBLE) / n_tokens, 6)
      |          AS mean_surprisal,
      |        round(CAST(gsum AS DOUBLE) / gtok, 6) AS gmean
      |      FROM dom JOIN dp USING (lang) CROSS JOIN gt),
      |e AS (SELECT lang, n_docs, n_tokens, mean_surprisal,
      |        CASE WHEN mean_surprisal > gmean
      |             THEN round(mean_surprisal - gmean, 6)
      |             ELSE 0.0 END AS excess
      |      FROM m),
      |r AS (SELECT *, n_tokens
      |        * CAST(round((1 + excess) * 1000000) AS BIGINT) AS raw
      |      FROM e),
      |nrm AS (SELECT CAST(sum(raw) AS BIGINT) AS norm FROM r)
      |SELECT lang, CAST(n_docs AS BIGINT) AS n_docs,
      |  CAST(n_tokens AS BIGINT) AS n_tokens,
      |  mean_surprisal, excess,
      |  round(CAST(raw AS DOUBLE) / norm, 6) AS weight
      |FROM r CROSS JOIN nrm
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    val tok = TextQueries.tokens(s, dir)
      .withColumnRenamed("term", "token")
      .select(col("doc_id"), col("token"))
    val sc = graft.api.Text.surprisalTokenScores(tok)
    val langs = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"))
    val dom = tok.join(sc, Seq("token"))
      .join(langs, Seq("doc_id"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_tokens"), sum(col("s")).as("ssum"))
    val dp = langs.groupBy(col("lang")).agg(count(lit(1)).as("n_docs"))
    val glob = dom.agg(sum(col("ssum")).as("gsum"),
      sum(col("n_tokens")).cast("long").as("gtok"))
    val e = dom.join(dp, Seq("lang")).crossJoin(broadcast(glob))
      .select(col("lang"), col("n_docs"), col("n_tokens"),
        round(col("ssum").cast("double") / col("n_tokens"), 6)
          .as("mean_surprisal"),
        round(col("gsum").cast("double") / col("gtok"), 6).as("gmean"))
      .withColumn("excess",
        when(col("mean_surprisal") > col("gmean"),
          round(col("mean_surprisal") - col("gmean"), 6))
          .otherwise(lit(0.0)))
      .withColumn("raw", col("n_tokens") *
        round((lit(1.0) + col("excess")) * 1000000, 0).cast("long"))
    val nrm = e.agg(sum(col("raw")).cast("long").as("norm"))
    e.crossJoin(broadcast(nrm))
      .select(col("lang"), col("n_docs").cast("bigint").as("n_docs"),
        col("n_tokens").cast("bigint").as("n_tokens"),
        col("mean_surprisal"), col("excess"),
        round(col("raw").cast("double") / col("norm"), 6).as("weight"))
      .orderBy(col("lang"))
  }

  private val budgetDenoms = Seq(16, 8, 4, 2)

  /** The token-budget sweep's full oracle chain (unique `b1*` CTE
    * names) ending in `b1f (denom, budget, n_docs, tokens_used,
    * min_quality)` — shared verbatim with pipeline_knob_card's
    * oracle, including the quality-score formula (round-14 ADVICE:
    * one string, two consumers, no silent desync). */
  private[operators] val budgetSweepCte: String = {
    val stop = graft.api.Text.defaultStopwords
      .map(w => s"'$w'").mkString("(", ",", ")")
    s"""b1t AS (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents),
       |b1p AS (SELECT doc_id, count(*) AS n_tokens,
       |    count(DISTINCT term) AS n_distinct,
       |    sum(CASE WHEN term IN $stop THEN 1 ELSE 0 END) AS n_stop
       |  FROM b1t GROUP BY doc_id),
       |b1q AS (SELECT doc_id, n_tokens,
       |    CAST(round(
       |      0.5 * CAST(round(CAST(n_distinct AS DOUBLE) / n_tokens, 6)
       |                 AS DECIMAL(12,6))
       |      + 0.3 * (1 - CAST(round(CAST(n_stop AS DOUBLE) / n_tokens, 6)
       |                        AS DECIMAL(12,6)))
       |      + 0.002 * least(n_tokens, 100), 6) AS DOUBLE) AS quality
       |  FROM b1p),
       |b1b AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS total
       |        FROM b1q),
       |b1c AS (SELECT doc_id, n_tokens, quality,
       |    CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id)
       |      AS BIGINT) AS cum
       |  FROM b1q),
       |b1s AS (SELECT unnest([${budgetDenoms.mkString(", ")}])
       |        AS denom),
       |b1m AS (
       |  SELECT denom, count(*) AS n_docs,
       |    max(cum) AS tokens_used, min(quality) AS min_quality
       |  FROM b1c CROSS JOIN b1b CROSS JOIN b1s
       |  WHERE cum <= b1b.total // denom
       |  GROUP BY denom),
       |b1f AS (
       |  SELECT b1s.denom, b1b.total // b1s.denom AS budget,
       |    coalesce(b1m.n_docs, 0) AS n_docs,
       |    coalesce(b1m.tokens_used, 0) AS tokens_used,
       |    b1m.min_quality
       |  FROM b1s LEFT JOIN b1m ON b1s.denom = b1m.denom
       |  CROSS JOIN b1b)""".stripMargin
  }

  /** TOKEN-BUDGET SIZING SWEEP — the training-budget curve (the
    * sampling-family sizing sweep, next to nProbe / bands /
    * watermark / session-gap): what quality floor does each budget
    * buy? The quality-ordered distributed prefix sum (the
    * sample_token_budget pack) is BUDGET-INDEPENDENT, so it runs once
    * and budgets of 1/16 … 1/2 of the corpus's tokens are four
    * predicate aggregates over the cum column: docs admitted, tokens
    * filled, and the MINIMUM quality admitted — the floor a data
    * curator quotes when the training budget moves. min(quality) is
    * order-independent (no float summation), counts and µs sums are
    * exact integers; one rounded divide nowhere — the row is
    * arithmetic-free beyond the per-doc scores both engines already
    * replay for sample_token_budget.
    *
    * Scale shape: the one pack pass (quantile-bucketed prefix sum, no
    * single-partition window — the api.Text discipline), a ×4
    * per-row explode, rollup state 4 rows. */
  val sampleBudgetSweep: GQuery = {
    val denoms = budgetDenoms
    GQuery(
      "sample_budget_sweep",
      s"""WITH $budgetSweepCte
         |SELECT CAST(denom AS INT) AS denom,
         |  CAST(budget AS BIGINT) AS budget,
         |  CAST(n_docs AS BIGINT) AS n_docs,
         |  CAST(tokens_used AS BIGINT) AS tokens_used,
         |  min_quality
         |FROM b1f
         |ORDER BY denom""".stripMargin) { (s, dir) =>
      // ≤5-row planning curve, memoized per (session, dir): the
      // standalone row and pipeline_knob_card share one
      // materialization (round-15 VERDICT item 7)
      graft.PlanCache.memo(s, dir, "budget_sweep_curve") {
      val scored = graft.api.Text.qualityScoreFromTokens(
        TextQueries.tokens(s, dir).withColumnRenamed("term", "token"),
        "doc_id")
        .select(col("doc_id"), col("n_tokens"), col("quality"))
      val docIdChecked = graft.api.Keys.checkedRange(
        col("doc_id"), 0L, 100000000L,
        "sample_budget_sweep: doc_id (8-digit composite-key field)")
      val keyed = scored.select(
        ((lit(1000000L) - round(col("quality") * 1e6).cast("long"))
          * lit(100000000L) + docIdChecked).as("k"),
        col("n_tokens").as("tok"))
      val total = broadcast(
        keyed.agg(sum(col("tok")).cast("long").as("total")))
      val m = graft.api.Text.packFromCounts(keyed, "k", "tok", seqLen = 1)
        .crossJoin(total)
        .withColumn("cum", (col("off") + col("tok")).cast("bigint"))
        .withColumn("denom",
          explode(array(denoms.map(d => lit(d)): _*)))
        .filter(col("cum") <= expr("total div denom"))
        .withColumn("quality",
          (lit(1000000L) - expr("k div 100000000"))
            .cast("double") / 1e6)
        .groupBy(col("denom"))
        .agg(count(lit(1)).as("n_docs"),
          max(col("cum")).as("tokens_used"),
          min(col("quality")).as("min_quality"))
      s.range(1)
        .select(explode(array(denoms.map(d => lit(d)): _*)).as("denom"))
        .join(m, Seq("denom"), "left")
        .crossJoin(total)
        .select(col("denom"),
          expr("total div denom").cast("bigint").as("budget"),
          coalesce(col("n_docs"), lit(0L)).as("n_docs"),
          coalesce(col("tokens_used"), lit(0L)).as("tokens_used"),
          col("min_quality"))
      }.orderBy(col("denom"))
    }
  }

  /** BOTTOM-K UNIFORM SAMPLE — "exactly k rows, uniformly, without
    * replacement, in one distributed pass": keep the k rows with the
    * SMALLEST portable hash (the bottom-k sketch — the standard
    * distributed exact-size sample, mergeable across partitions and
    * streams where reservoir sampling is not). Deterministic: the
    * hash is a pure function of doc_id, ties impossible (hash of a
    * unique key; doc_id tiebreak anyway), so every engine picks the
    * same k rows.
    *
    * Scale shape: a TakeOrderedAndProject — per-partition k-row
    * heaps merged on the driver, never a global sort; at any corpus
    * size the shuffle carries ≤ k rows per partition. */
  val sampleBottomK: GQuery = GQuery(
    "sample_bottom_k",
    s"""SELECT doc_id, lang, n_chars FROM (
       |  SELECT doc_id, lang, n_chars
       |  FROM documents
       |  ORDER BY ${duckHash("concat('bot:', CAST(doc_id AS VARCHAR))")},
       |    doc_id
       |  LIMIT 100)
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        graft.api.Sampling.portableHash(col("doc_id"), "bot:").as("h"))
      .orderBy(col("h"), col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("lang"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  /** CLASS-BALANCED downsample — cap every label at the MINORITY
    * class's count, keeping each label's lowest-portable-hash rows:
    * the deterministic version of the rebalancing step in front of a
    * classifier (no seed, no engine RNG — the same rows survive on
    * every engine, every run, any partitioning).
    *
    * Scale shape: one row_number window per label (each label's
    * partition is its own class — the natural key), a 10-row count
    * aggregate whose global min rides a BOUNDED window over those 10
    * rows, and an equi-join of the two on label. No scalar cross
    * join, no broadcast hint. A hot majority class costs one window
    * partition — the same cost any per-class top-k pays. */
  val sampleClassBalance: GQuery = GQuery(
    "sample_class_balance",
    s"""WITH h AS (
       |  SELECT label, vec_id,
       |    ${duckHash("concat('bal:', CAST(vec_id AS VARCHAR))")} AS hv
       |  FROM embeddings),
       |c AS (
       |  SELECT label, count(*) AS n FROM h GROUP BY label),
       |m AS (
       |  SELECT label, CAST(min(n) OVER () AS BIGINT) AS cap FROM c),
       |r AS (
       |  SELECT label, vec_id,
       |    row_number() OVER (PARTITION BY label ORDER BY hv, vec_id)
       |      AS rk
       |  FROM h)
       |SELECT CAST(r.label AS INT) AS label, r.vec_id
       |FROM r JOIN m ON r.label = m.label
       |WHERE r.rk <= m.cap
       |ORDER BY label, vec_id""".stripMargin) { (s, dir) =>
    val h = Tables.embeddings(s, dir)
      .select(col("label"), col("vec_id"),
        graft.api.Sampling.portableHash(col("vec_id"), "bal:").as("hv"))
    val caps = h.groupBy(col("label")).agg(count(lit(1)).as("n"))
      .withColumn("cap", min(col("n")).over(Window.partitionBy()))
      .select(col("label"), col("cap"))
    val r = h.withColumn("rk", row_number().over(
      Window.partitionBy(col("label")).orderBy(col("hv"), col("vec_id"))))
    r.join(caps, Seq("label"))
      .filter(col("rk") <= col("cap"))
      .select(col("label").cast("int").as("label"), col("vec_id"))
      .orderBy(col("label"), col("vec_id"))
  }

  /** K-FOLD cross-validation manifest — [[sampleSplitAssign]]'s
    * holdout generalized to the CV loop: fold = portable-hash(doc_id)
    * mod 5, reported as the per-(fold, lang) manifest plus each
    * fold's share of the corpus (balance readout — hashed folds are
    * near-uniform but never exactly 1/k, and the table shows by how
    * much). The fold is a pure function of the id, so every engine,
    * re-read, and training job derives the same folds with no stored
    * assignment table.
    *
    * Scale shape: per-row projection + one map-side-combining rollup
    * to the ≤ 5·|langs| grid + a 1-row total broadcast for the
    * share. Streaming-safe (stateless assignment). */
  val sampleKfoldAssign: GQuery = GQuery(
    "sample_kfold_assign",
    s"""WITH a AS (
       |  SELECT lang, n_chars,
       |    ${duckHash("concat('kf:', CAST(doc_id AS VARCHAR))")} % 5
       |      AS fold
       |  FROM documents),
       |g AS (SELECT fold, lang, CAST(count(*) AS BIGINT) AS n_docs,
       |        CAST(sum(n_chars) AS BIGINT) AS sum_chars
       |      FROM a GROUP BY fold, lang),
       |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM g)
       |SELECT CAST(fold AS INT) AS fold, lang, n_docs, sum_chars,
       |  round(CAST(n_docs AS DOUBLE) / total, 6) AS corpus_share
       |FROM g, t
       |ORDER BY fold, lang""".stripMargin) { (s, dir) =>
    val a = Tables.documents(s, dir)
      .select(col("lang"), col("n_chars"),
        (graft.api.Sampling.portableHash(col("doc_id"), "kf:") % 5)
          .cast("int").as("fold"))
    val g = a.groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("bigint").as("sum_chars"))
    val t = g.agg(sum(col("n_docs")).cast("bigint").as("total"))
    g.crossJoin(broadcast(t))
      .select(col("fold"), col("lang"), col("n_docs"), col("sum_chars"),
        round(col("n_docs").cast("double") / col("total"), 6)
          .as("corpus_share"))
      .orderBy(col("fold"), col("lang"))
  }

  /** SOFT-DEDUP sampling weights — the "down-weight, don't drop"
    * alternative to hard dedup used when duplicated content should
    * still be seen, just not over-represented: each doc gets weight
    * 1/|dup group|, so every duplicate GROUP contributes exactly one
    * effective document to the training mixture regardless of its
    * copy count. The dup key is the 8-token BOILERPLATE PREFIX (the
    * C4/RefinedWeb-style prefix-dedup signal — the fixture has no
    * byte-exact dup texts, but prefix groups reach size 4), hashed to
    * md5 so the group key and join key are a fixed-width digest, not
    * the text itself. Per-lang report: raw docs, effective docs
    * (Σ weights), the dup discount ratio, and effective char mass
    * (Σ w·n_chars). Weights round to the DECIMAL(18,8) grid BEFORE
    * their exact sums (the ev_value_ema grid discipline), so both
    * engines sum identical quantized values in any order.
    *
    * Scale shape: one map-side-combining group-size aggregate on the
    * digest + one digest-keyed join back (the exchange carries the
    * 16-byte key, never the text), then a \|langs\|-row rollup — the
    * minimum shape for any per-group reweighting at 100 TB. */
  val sampleDedupWeights: GQuery = GQuery(
    "sample_dedup_weights",
    """WITH k AS (
      |  SELECT doc_id, lang, n_chars,
      |    md5(array_to_string(
      |      list_slice(string_split(text, ' '), 1, 8), ' ')) AS k
      |  FROM documents),
      |g AS (SELECT k, count(*) AS sz FROM k GROUP BY k),
      |w AS (
      |  SELECT lang, n_chars,
      |    CAST(round(CAST(1 AS DOUBLE) / sz, 8) AS DECIMAL(18,8)) AS w
      |  FROM k JOIN g USING (k))
      |SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
      |  round(CAST(sum(w) AS DOUBLE), 6) AS eff_docs,
      |  round(CAST(sum(w) AS DOUBLE) / count(*), 6) AS dup_discount,
      |  round(CAST(sum(w * n_chars) AS DOUBLE), 4) AS eff_chars
      |FROM w GROUP BY lang
      |ORDER BY lang""".stripMargin) { (s, dir) =>
    val k = Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), col("n_chars"),
        md5(array_join(slice(split(col("text"), " "), 1, 8), " "))
          .as("k"))
    val g = k.groupBy(col("k")).agg(count(lit(1)).as("sz"))
    val w = k.join(g, Seq("k"))
      .select(col("lang"), col("n_chars"),
        round(lit(1.0) / col("sz"), 8).cast("decimal(18,8)").as("w"))
    w.groupBy(col("lang"))
      .agg(count(lit(1)).cast("bigint").as("n_docs"),
        round(sum(col("w")).cast("double"), 6).as("eff_docs"),
        round(sum(col("w")).cast("double") / count(lit(1)), 6)
          .as("dup_discount"),
        round(sum(col("w") * col("n_chars")).cast("double"), 4)
          .as("eff_chars"))
      .orderBy(col("lang"))
  }

  /** NEYMAN OPTIMAL ALLOCATION — the survey-sampling upgrade of
    * proportional stratification: a fixed budget of 200 sampled docs
    * is allocated across language strata ∝ Nₕ·σₕ (stratum size ×
    * stratum std-dev of doc length), which minimizes the variance of
    * the estimated mean length — big noisy strata get more budget
    * than big uniform ones (sample_stratified's fixed-k treats them
    * all alike). σₕ comes from exact integer/DECIMAL n_chars moments;
    * the real-valued allocation floors to integers and the remainder
    * seats go to the largest fractional parts (largest-remainder
    * method, doc-deterministic via the lang tiebreak) so the
    * allocation always sums EXACTLY to the budget.
    *
    * Scale shape: one map-side-combining per-stratum moment
    * aggregate; the allocation algebra runs on the |langs|-row frame
    * with a 1-row Σ(N·σ) scalar and a bounded fractional-rank
    * window. */
  val sampleNeymanAlloc: GQuery = {
    val budget = 200
    GQuery("sample_neyman_alloc",
      s"""WITH m AS (
         |  SELECT lang, CAST(count(*) AS BIGINT) AS n_h,
         |    CAST(sum(n_chars) AS BIGINT) AS s_h,
         |    CAST(sum(n_chars * n_chars) AS BIGINT) AS q_h
         |  FROM documents GROUP BY 1),
         |sd AS (
         |  SELECT lang, n_h,
         |    round(sqrt((CAST(q_h AS DOUBLE)
         |      - CAST(s_h AS DOUBLE) * s_h / n_h) / (n_h - 1)), 6)
         |      AS sigma_h
         |  FROM m),
         |t AS (SELECT CAST(sum(CAST(round(n_h * sigma_h, 6)
         |          AS DECIMAL(24,6))) AS DECIMAL(30,6)) AS w FROM sd),
         |a AS (
         |  SELECT lang, n_h, sigma_h,
         |    $budget * n_h * sigma_h / CAST(t.w AS DOUBLE) AS raw
         |  FROM sd CROSS JOIN t),
         |fl AS (
         |  SELECT lang, n_h, sigma_h, raw,
         |    CAST(floor(raw) AS BIGINT) AS base,
         |    row_number() OVER (ORDER BY raw - floor(raw) DESC, lang)
         |      AS frac_rank
         |  FROM a),
         |rem AS (SELECT $budget - sum(base) AS k FROM fl)
         |SELECT lang, n_h, sigma_h, round(raw, 6) AS raw_alloc,
         |  CAST(base + CASE WHEN frac_rank <= rem.k THEN 1 ELSE 0 END
         |       AS BIGINT) AS alloc
         |FROM fl CROSS JOIN rem
         |ORDER BY lang""".stripMargin) { (s, dir) =>
      val m = Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(count(lit(1)).cast("bigint").as("n_h"),
          sum(col("n_chars")).cast("bigint").as("s_h"),
          sum(col("n_chars") * col("n_chars")).cast("bigint").as("q_h"))
      val sd = m.select(col("lang"), col("n_h"),
        round(sqrt((col("q_h").cast("double")
            - col("s_h").cast("double") * col("s_h") / col("n_h"))
          / (col("n_h") - 1)), 6).as("sigma_h"))
      val t = sd.agg(sum(round(col("n_h") * col("sigma_h"), 6)
        .cast("decimal(24,6)")).cast("decimal(30,6)").as("w"))
      val a = sd.crossJoin(broadcast(t))
        .select(col("lang"), col("n_h"), col("sigma_h"),
          (lit(budget) * col("n_h") * col("sigma_h")
            / col("w").cast("double")).as("raw"))
      val wf = Window.orderBy((col("raw") - floor(col("raw"))).desc,
        col("lang"))
      val fl = a.select(col("lang"), col("n_h"), col("sigma_h"),
        col("raw"), floor(col("raw")).cast("bigint").as("base"),
        row_number().over(wf).as("frac_rank"))
      val rem = fl.agg((lit(budget) - sum(col("base"))).as("k"))
      fl.crossJoin(broadcast(rem))
        .select(col("lang"), col("n_h"), col("sigma_h"),
          round(col("raw"), 6).as("raw_alloc"),
          (col("base") + when(col("frac_rank") <= col("k"), 1)
            .otherwise(0)).cast("bigint").as("alloc"))
        .orderBy(col("lang"))
    }
  }

  /** UniMax-style EPOCH-CAPPED language budget allocation (Chung et
    * al. 2023, "UniMax: Fairer and More Effective Language Sampling"):
    * given a token budget B (half the corpus — SF-relative, no
    * fixture constant) and an epoch cap C = 2, walk languages from
    * SMALLEST available to largest and give each
    * min(C·n_lang, remaining ⌊budget / remaining_langs⌋) — the
    * water-filling that spends surplus from capped low-resource
    * languages on the bigger ones instead of over-repeating them.
    * Every step is INTEGER arithmetic (floor divisions), so the whole
    * 5-step trajectory replays in unrolled CTEs and the allocation
    * table is hash-checked; the only double is the final epochs
    * readout (alloc/n rounded 6). The row-level fill rides the
    * existing portable-hash samplers (sample_mixture /
    * _upsampled) at rate alloc/n per language.
    *
    * Scale shape: ONE map-side-combining (lang → token count)
    * aggregate over the corpus; the allocation walk is a ≤|langs|-row
    * driver computation (the nProbe bounded-collect discipline —
    * |langs| is a vocabulary, not data). The oracle unrolls exactly
    * 5 languages, so the Spark side asserts the fixture invariant
    * (the ev_attribution_shapley pattern). */
  val sampleUnimax: GQuery = {
    val nLangs = 5
    val cap = 2
    // step CTEs: s1..s5 each hold (a = this lang's allocation,
    // r = remaining budget after it); language i = i-th smallest
    val step = (i: Int) => {
      val prev = if (i == 1) "t" else s"s${i - 1}"
      val rem = if (i == 1) "b" else "r"
      s"""s$i AS (
         |  SELECT least($cap * o.n, $prev.$rem // ${nLangs - i + 1})
         |           AS a,
         |    $prev.$rem - least($cap * o.n, $prev.$rem // ${nLangs - i + 1})
         |           AS r
         |  FROM o, $prev WHERE o.i = $i)""".stripMargin
    }
    GQuery("sample_unimax",
      s"""WITH d AS (
         |  SELECT lang,
         |    CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n
         |  FROM documents GROUP BY 1),
         |o AS (SELECT lang, n,
         |        row_number() OVER (ORDER BY n, lang) AS i FROM d),
         |t AS (SELECT CAST(sum(n) // 2 AS BIGINT) AS b FROM d),
         |${(1 to nLangs).map(step).mkString(",\n")}
         |SELECT o.lang, o.n AS n_tokens,
         |  CAST(CASE o.i ${(1 to nLangs).map(i =>
             s"WHEN $i THEN (SELECT a FROM s$i)").mkString(" ")}
         |    END AS BIGINT) AS alloc_tokens,
         |  CAST((2 * CAST(CASE o.i ${(1 to nLangs).map(i =>
             s"WHEN $i THEN (SELECT a FROM s$i)").mkString(" ")}
         |    END AS HUGEINT) * 1000000 + o.n) // (2 * o.n)
         |    AS DOUBLE) / 1000000.0 AS epochs
         |FROM o
         |ORDER BY o.lang""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .groupBy(col("lang"))
        .agg(sum(size(split(col("text"), " "))).cast("bigint").as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1)))
        .sortBy { case (lang, n) => (n, lang) }
      // the oracle unrolls exactly 5 water-filling steps — fail fast
      // if the fixture's language vocabulary drifts (the
      // ev_attribution_shapley assert pattern; |langs| is bounded)
      require(d.length == nLangs,
        s"sample_unimax unrolls $nLangs languages; fixture has ${d.length}")
      // epochs rounds to 6 places in EXACT integer arithmetic on both
      // sides — half-up micro-epochs = (2·a·10^6 + n) div (2·n), then
      // ONE double divide by 10^6 each engine performs identically.
      // BigDecimal-vs-round(x,6) half-boundary drift is the documented
      // hash-gate failure class (FilterQueries.scala:21); alloc and n
      // are exact integers so the boundary is avoidable entirely.
      val alloc = graft.api.Sampling.unimaxAlloc(
          d.toSeq, d.map(_._2).sum / 2, cap)
        .map { case (lang, n, a) =>
          val microEpochs =
            ((BigInt(2) * a * 1000000 + n) / (BigInt(2) * n)).toLong
          (lang, n, a, microEpochs.toDouble / 1000000.0)
        }
      import s.implicits._
      alloc.sortBy(_._1)
        .toDF("lang", "n_tokens", "alloc_tokens", "epochs")
    }
  }

  val all: Seq[GQuery] = Seq(sampleHashMod, sampleStratified,
    sampleMixture, sampleMixtureUpsampled, sampleSplitAssign,
    sampleTemperature, sampleTokenBudget, sampleBudgetSweep,
    sampleBottomK,
    sampleClassBalance, sampleKfoldAssign, sampleDedupWeights,
    sampleNeymanAlloc, sampleUnimax, sampleDoremiWeights)
}
