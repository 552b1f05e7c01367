package graft.api

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Public deterministic-sampling API (see [[Dedup]] for conventions).
  * Both samplers key on the portable 48-bit md5-derived hash of the
  * id column, so the SAME rows are selected on every engine and every
  * run — unlike seed-based `Dataset.sample`, which is only stable
  * within one Spark version.
  */
object Sampling {

  /** The portable salted 48-bit hash both samplers key on, built from
    * Column operations (no SQL-text splicing: column names that need
    * backticks and salts containing quotes are safe). */
  def portableHash(id: Column, salt: String): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 12),
      16, 10).cast("long")

  /** ~1/`modulus` Bernoulli sample by hash bucket: a pure per-row
    * filter, no shuffle — stateless, so the same call runs unchanged
    * on a streaming frame (see graft.streaming.SampleStreams). */
  def hashBernoulli(df: DataFrame, id: String, modulus: Int,
      salt: String = "smp:"): DataFrame = {
    require(modulus > 0, "modulus must be positive")
    df.filter(portableHash(col(id), salt) % modulus === 0)
  }

  /** Deterministic MIXTURE-WEIGHT sampling — the per-source
    * up-/down-weighting step that turns a raw corpus into a training
    * mixture (each source kept at its own rate): a row survives iff
    * its portable hash bucket lands under its group's keep rate.
    * Groups absent from `rates` keep `defaultRate`. Rates are
    * quantized to 1/65536 so the comparison is INTEGER-exact on every
    * engine; a pure per-row filter — no shuffle, streaming-safe, and
    * the kept set is stable across runs/engines (unlike seeded
    * `Dataset.sample`). Downsampling only (rates in [0, 1]);
    * upsampling means emitting duplicate rows, a job for an explicit
    * replicate-explode, not a sampler. */
  def mixtureWeighted(df: DataFrame, id: String, group: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix:"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(r => r >= 0 && r <= 1),
      "keep rates must be in [0, 1]")
    val d = 65536L
    val rateCol = rates.foldLeft(lit((defaultRate * d).toLong)) {
      case (acc, (g, r)) =>
        when(col(group) === g, lit((r * d).toLong)).otherwise(acc)
    }
    df.filter(portableHash(col(id), salt) % d < rateCol)
  }

  /** Deterministic mixture REPLICATION — the UPSAMPLING half of
    * mixture building that [[mixtureWeighted]] deliberately excludes:
    * per-group rates may exceed 1, and each row is emitted
    * ⌊rate⌋ + (1 iff its hash bucket < frac(rate)·65536) times, so a
    * curated source at rate 2.5 yields 2 copies of every row plus a
    * third for a deterministic half of them. The output gains a
    * 0-based `copy` index column — downstream shuffles can key on
    * (id, copy) so replicas don't co-locate, and copy 0 of a rate ≤ 1
    * group is EXACTLY [[mixtureWeighted]]'s kept set under the same
    * salt (spec-pinned).
    *
    * Rates are quantized to 1/65536 and split into (whole, fractional)
    * parts in DRIVER-side integer arithmetic, so the per-row decision
    * is integer-exact on every engine. Replication is a per-row
    * projection + explode — no shuffle, stateless, streaming-safe. */
  def mixtureReplicated(df: DataFrame, id: String, group: String,
      rates: Map[String, Double], defaultRate: Double = 1.0,
      salt: String = "mix:", copyCol: String = "copy"): DataFrame = {
    require((rates.values ++ Seq(defaultRate)).forall(_ >= 0),
      "rates must be non-negative")
    val d = 65536L
    def q(r: Double): Long = (r * d).toLong
    val base = rates.foldLeft(lit(q(defaultRate) / d)) {
      case (acc, (g, r)) => when(col(group) === g, lit(q(r) / d))
        .otherwise(acc)
    }
    val frac = rates.foldLeft(lit(q(defaultRate) % d)) {
      case (acc, (g, r)) => when(col(group) === g, lit(q(r) % d))
        .otherwise(acc)
    }
    val copies = base +
      when(portableHash(col(id), salt) % d < frac, 1L).otherwise(0L)
    df.withColumn("__copies", copies)
      .filter(col("__copies") > 0)
      .withColumn(copyCol,
        explode(sequence(lit(0L), col("__copies") - 1)))
      .drop("__copies")
  }

  /** Deterministic train/val/test split assignment: each row gains a
    * `split` label decided by its portable hash bucket against
    * integer weight cutoffs (e.g. 8/1/1 of 10) — every engine, run,
    * and future re-read derives the SAME membership, which is what
    * makes held-out sets auditable. A pure per-row projection: no
    * shuffle, pushes nothing, streaming-safe; the manifest (or the
    * rows of one split) falls out of a filter on the label.
    *
    * Refuses a frame that already carries `outCol`: withColumn would
    * silently overwrite an existing split label — a frame being
    * re-split should either drop the old column explicitly or assign
    * into a differently-named one. */
  def splitAssign(df: DataFrame, id: String,
      splits: Seq[(String, Int)] = Seq("train" -> 8, "val" -> 1,
        "test" -> 1),
      salt: String = "spl:", outCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.forall(_._2 > 0),
      "split weights must be positive")
    require(!df.columns.contains(outCol),
      s"column '$outCol' already exists — drop it first or pass a " +
        "different outCol; splitAssign will not silently overwrite " +
        "an existing split label")
    val denom = splits.map(_._2).sum
    val bucket = pmod(portableHash(col(id), salt), lit(denom.toLong))
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val labelCol = splits.zip(cuts).reverse
      .foldLeft(lit(splits.last._1)) { case (acc, ((name, _), hi)) =>
        when(bucket < hi, name).otherwise(acc)
      }
    df.withColumn(outCol, labelCol)
  }

  /** Per-group TEMPERATURE thresholds — the data-driven half of
    * [[temperatureSampled]], exposed so callers can report the
    * derived rates: (group, __n, __thr) with __thr the 0..65536
    * integer keep cutoff.
    *
    * Targets ∝ √n_g (the α = 0.5 temperature of multilingual-sampling
    * practice — √ because IEEE sqrt is exactly rounded and therefore
    * engine-portable, unlike pow) scaled to a `budgetFrac` fraction
    * of the corpus, capped at 1. Determinism discipline: per-group
    * √n rounded to 6 places, the group-sum on the DECIMAL(18,6) grid
    * (order-free), the final rate one double expression over
    * identical inputs rounded to 6 before integer quantization —
    * every engine derives the same thresholds from the same corpus.
    *
    * Scale shape: one map-side-combining count per group, a 1-row
    * broadcast total, a per-group projection — the group dim is the
    * aggregate's output (bounded by the source taxonomy, not corpus
    * rows). */
  def temperatureThresholds(df: DataFrame, group: String,
      budgetFrac: Double = 0.5): DataFrame = {
    require(budgetFrac > 0 && budgetFrac <= 1,
      s"budgetFrac ($budgetFrac) must be in (0, 1]")
    val counts = df.groupBy(col(group))
      .agg(count(lit(1)).as("__n"))
      .withColumn("__w", round(sqrt(col("__n").cast("double")), 6))
    val tot = counts.agg(
      sum(col("__w").cast("decimal(18,6)")).as("__sumw"),
      sum(col("__n")).as("__total"))
    counts.crossJoin(broadcast(tot))
      .withColumn("__rate", least(lit(1.0), round(
        lit(budgetFrac) * col("__total").cast("double") * col("__w")
          / (col("__sumw").cast("double") * col("__n")), 6)))
      .select(col(group), col("__n"),
        round(col("__rate") * 65536).cast("long").as("__thr"))
  }

  /** Temperature-flattened multi-source sampling: per-group keep
    * rates are derived FROM THE DATA (∝ √n_g, scaled to `budgetFrac`
    * of the corpus — dominant sources downsampled hardest, rare ones
    * kept whole), then applied as the same integer-exact hash filter
    * as [[mixtureWeighted]]. The rebalancing step run when nobody
    * hand-tunes a rate map per source. The thresholds join is a
    * plain equi-join on the group key (AQE promotes the bounded dim
    * to broadcast at runtime); the filter itself is per-row. */
  def temperatureSampled(df: DataFrame, id: String, group: String,
      budgetFrac: Double = 0.5, salt: String = "tmp:"): DataFrame = {
    val thr = temperatureThresholds(df, group, budgetFrac)
      .select(col(group), col("__thr"))
    df.join(thr, Seq(group))
      .filter(portableHash(col(id), salt) % 65536L < col("__thr"))
      .drop("__thr")
  }

  /** Deterministic per-stratum reservoir: the k rows with the
    * smallest salted hash in each stratum (id as the unique
    * tiebreak).
    *
    * Two-phase for skew safety: a single `partitionBy(stratum)`
    * window serializes a HOT stratum onto one task at scale, so
    * phase 1 ranks within (stratum, hash-bucket) — 32-way parallel
    * even for one giant stratum — and phase 2 merges the ≤ 32·k
    * per-stratum survivors. The global top-k by (hash, id) is always
    * a subset of the per-bucket top-k, so the result is IDENTICAL to
    * the single-window form (the DuckDB oracle keeps that form). */
  def stratifiedTopK(df: DataFrame, stratum: String, id: String,
      k: Int, salt: String = "str:"): DataFrame = {
    val h = portableHash(col(id), salt)
    val w1 = Window.partitionBy(col(stratum), pmod(h, lit(32)))
      .orderBy(h, col(id))
    val w2 = Window.partitionBy(col(stratum)).orderBy(h, col(id))
    df.withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") <= k)
      .withColumn("__rn", row_number().over(w2))
      .filter(col("__rn") <= k)
      .drop("__rn1", "__rn")
  }

  /** UniMax water-filling (Chung et al. 2023): walk groups from
    * SMALLEST available to largest, giving each
    * min(cap·n, ⌊remaining / remaining_groups⌋) — a capped
    * low-resource group's surplus flows to the larger groups instead
    * of over-repeating it. Pure integer arithmetic over a
    * vocabulary-bounded (group → count) list; returns
    * (group, n, alloc) in the input's (n asc, group asc) walk order.
    * The distributed half (the corpus-sized count aggregate and the
    * per-row fill at rate alloc/n) lives with the callers. */
  def unimaxAlloc(counts: Seq[(String, Long)], budget: Long,
      cap: Int): Seq[(String, Long, Long)] = {
    require(cap >= 1 && budget >= 0, "cap >= 1, budget >= 0")
    val ordered = counts.sortBy { case (g, n) => (n, g) }
    var remaining = budget
    ordered.zipWithIndex.map { case ((g, n), idx) =>
      val a = math.min(cap.toLong * n, remaining / (ordered.size - idx))
      remaining -= a
      (g, n, a)
    }
  }
}
