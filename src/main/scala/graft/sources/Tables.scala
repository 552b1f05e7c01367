package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-generated parquet corpus (FIXTURES.md).
  *
  * Every query reads through these, so scan behavior (the events
  * nanos-timestamp recipe, column naming) is uniform. The loaders are
  * plain `spark.read.parquet` — filters/projection written downstream
  * are pushed into the scan by Catalyst (PushedFilters / ReadSchema),
  * which is the 100 TB-scale behavior we want: never materialize the
  * table, always declare the plan.
  */
object Tables {
  private def p(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = p(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = p(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = p(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = p(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = p(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = p(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = p(s, d, "lineitem")
  def documents(s: SparkSession, d: String): DataFrame = p(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = p(s, d, "embeddings")

  /** documents spread across the session's shuffle parallelism.
    *
    * The small-SF corpus is a single parquet split, so a
    * tokenize/explode/hash pipeline rooted at the plain scan runs its
    * entire map side in ONE task until the first shuffle. Heavy text
    * pipelines (shingling, simhash terms, language profiles) read
    * through this loader instead: one tiny up-front exchange of the
    * raw docs buys a fully parallel map side. On a real cluster the
    * scan has many splits and the exchange is a cheap rebalance.
    *
    * The partition COUNT is pinned (not just the keys): a keys-only
    * repartition is an AQE-coalescible shuffle, and the raw docs are
    * small enough that AQE folds them back into one partition — the
    * downstream explode is exactly the output-explosive stage AQE's
    * input-byte heuristic cannot see. */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    documents(s, d).repartition(
      s.sessionState.conf.numShufflePartitions, col("doc_id"))

  /** `events.ts` is Parquet TIMESTAMP(NANOS,false); Spark 4.1.2's default
    * read throws [PARQUET_TYPE_ILLEGAL]. Verified recipe (SURVEY.md
    * §5.3.1): read nanos as Long via the legacy conf, then convert to a
    * µs TimestampType with `timestamp_micros(ts div 1000)` — this equals
    * DuckDB's µs view of the same column exactly, so oracle SQL can use
    * the raw `ts` unchanged.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(s, d, "events")
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  /** events with `ts` kept as raw epoch-nanos Long (for callers that want
    * integer time arithmetic, e.g. streaming tests building their own
    * schema). */
  def eventsRawNanos(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    p(s, d, "events")
  }
}
