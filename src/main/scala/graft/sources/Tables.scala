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

  /** `events.ts` normalization — schema-adaptive because the generated
    * corpus has shipped two physical layouts:
    *   - TIMESTAMP(NANOS,false): Spark 4.1.2's default read throws
    *     [PARQUET_TYPE_ILLEGAL]; recipe (SURVEY.md §5.3.1) is the legacy
    *     nanos-as-Long conf + `timestamp_micros(ts div 1000)`.
    *   - TIMESTAMP(MICROS) without tz: Spark reads TIMESTAMP_NTZ; under
    *     the UTC session timezone a cast to TimestampType preserves the
    *     epoch-micros bit-for-bit.
    * Both normalize to the SAME µs TimestampType values, equal to
    * DuckDB's µs view of the column, so oracle SQL uses raw `ts`
    * unchanged regardless of which layout is on disk.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = p(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  /** events with `ts` as raw epoch-nanos Long (for callers that want
    * integer time arithmetic, e.g. streaming tests building their own
    * schema). On the µs-layout corpus the nanos are reconstructed as
    * micros*1000 — same values the nanos layout yields after its µs
    * truncation round-trip. */
  def eventsRawNanos(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = p(s, d, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw
      case _ => raw.withColumn(
        "ts", unix_micros(col("ts").cast("timestamp")) * 1000L)
    }
  }
}
