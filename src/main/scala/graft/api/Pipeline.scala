package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.Ckpt.CkptOps

/** The end-to-end corpus-preparation pipeline a training-data user
  * actually runs first — the verified stages composed in their
  * canonical order over one document table:
  *
  *  1. '''quality gate''' ([[Text.qualityScore]]): drop documents
  *     below `minQuality`; eval/benchmark rows (`isEval`) leave the
  *     corpus here too — they are held-out data, never training data.
  *  2. '''dedup''' ([[Dedup.keepList]]): exact (byte-identical text)
  *     and MinHash near-dup removal over the gated corpus, keeping
  *     each group's minimum id.
  *  3. '''decontamination''' ([[Dedup.containmentPairs]]): drop any
  *     surviving document that CONTAINS an eval document (asymmetric
  *     n-gram containment ≥ `containNum/containDen` of the eval doc's
  *     shingles) — the train-test contamination check, run against
  *     the FULL eval set regardless of gating (the benchmark is
  *     external; its own quality is not ours to judge).
  *  4. '''mixture sampling''' ([[Sampling.mixtureWeighted]]):
  *     per-source keep rates turn the cleaned corpus into the
  *     training mixture, integer-exact and engine-portable.
  *
  * Stage order is semantics, not plumbing: dedup reps are chosen
  * AMONG gated docs (a higher-quality duplicate never loses its spot
  * to a gated-out lower id), and decontamination sees exactly the
  * rows that could reach training.
  *
  * Every stage is a keyed join / aggregate / per-row filter — the
  * composition inherits each stage's 100 TB posture unchanged. A
  * caller who has already materialized the corpus shingle table or
  * the near-dup pair list (e.g. through a session memo) donates them;
  * donated `pairs` may cover the FULL table — per-document signatures
  * are independent, so restricting a full-corpus pair list to gated
  * endpoints is exactly the pair list of the gated subset.
  */
object Pipeline {

  /** Returns the kept rows: `docs`' columns plus the stage-1
    * `quality` score. */
  def corpusPrep(
      docs: DataFrame, id: String, text: String, source: String,
      isEval: Column, minQuality: Double,
      rates: Map[String, Double], defaultRate: Double,
      minEst: Double = 0.5, containNum: Int = 1, containDen: Int = 2,
      shingles: Option[DataFrame] = None,
      pairs: Option[DataFrame] = None,
      tokens: Option[DataFrame] = None): DataFrame = {

    // 1. quality gate; eval rows leave the training corpus here.
    // The gated corpus feeds FOUR consumers (pair narrowing, dedup,
    // decontamination membership, the final mixture join) — without
    // an eager materialization each one would replay the full
    // tokenize-and-aggregate quality pass. A caller holding the
    // materialized (id, token) explode donates it via `tokens` (the
    // shingles/pairs donation pattern) and the gate skips its own
    // tokenize entirely (r17 opt).
    val qual = tokens
      .map(t => Text.qualityScoreFromTokens(t, id))
      .getOrElse(Text.qualityScore(docs, id, text))
      .select(col(id), col("quality"))
    val corpus = docs.join(qual, Seq(id))
      .filter(!isEval && col("quality") >= minQuality)
      .ckpt()

    // 2. exact + near dedup among gated docs (donated pairs narrowed
    // to gated endpoints ≡ pairs of the gated subset)
    val corpusIds = corpus.select(col(id))
    val gatedPairs = pairs.map { p =>
      p.select(col("doc1"), col("doc2"))
        .join(corpusIds.select(col(id).as("doc1")), Seq("doc1"), "left_semi")
        .join(corpusIds.select(col(id).as("doc2")), Seq("doc2"), "left_semi")
    }
    // keeps feeds the containment train side AND the final anti-join;
    // its lineage (exact-dup aggregate + connected components) is the
    // pipeline's most expensive subtree — materialize once
    val keeps = Dedup.keepList(corpus, id, text, minEst, gatedPairs)
      .filter(col("status") === "keep").select(col(id))
      .ckpt()

    // 3. decontamination: survivors containing an eval doc are out.
    // Membership marks both sides from the one shingle table — the
    // eval side from the raw docs (the benchmark is external), the
    // train side from the pipeline's current survivors.
    val sh = shingles.getOrElse(Dedup.wordShingles(docs, id, text, n = 3))
    val evalIds = docs.filter(isEval).select(col(id))
    val shEval = sh.join(evalIds, Seq(id), "left_semi")
      .withColumn("side", lit(true))
    val shTrain = sh.join(keeps, Seq(id), "left_semi")
      .withColumn("side", lit(false))
    val contaminated = Dedup.containmentPairs(
        shEval.unionByName(shTrain), id, col("side"),
        containNum, containDen)
      .select(col("train_id").as(id)).distinct()
    val clean = keeps.join(contaminated, Seq(id), "left_anti")

    // 4. per-source mixture weighting over the cleaned corpus
    Sampling.mixtureWeighted(
      corpus.join(clean, Seq(id), "left_semi"),
      id, source, rates, defaultRate)
  }
}
