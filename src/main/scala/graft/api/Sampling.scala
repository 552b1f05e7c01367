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

  /** Deterministic per-stratum reservoir: the k rows with the
    * smallest salted hash in each stratum (id as the unique
    * tiebreak). */
  def stratifiedTopK(df: DataFrame, stratum: String, id: String,
      k: Int, salt: String = "str:"): DataFrame = {
    val w = Window.partitionBy(col(stratum))
      .orderBy(portableHash(col(id), salt), col(id))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") <= k)
      .drop("__rn")
  }
}
