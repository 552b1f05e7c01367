package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One contract row from SURVEY.md §2.
  *
  * @param name   key in `SparkEntry.queries` (and `oracleSql` when present)
  * @param fn     the Spark implementation: (session, sfDir) => result
  * @param oracle equivalent ANSI SQL the driver replays in DuckDB over the
  *               same parquet tables; None => "no-oracle" (rows-only check).
  *
  * Hash-match discipline (SURVEY.md §5.3): every query ends in a total
  * ORDER BY with a unique tiebreaker; aggregate/computed columns are
  * aliased identically on both sides; temporal outputs are formatted to
  * strings (no raw timestamp columns cross the compare boundary); float
  * aggregates are rounded identically on both sides.
  */
final case class GQuery(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object GQuery {
  /** Convenience constructor for oracle-backed queries. */
  def apply(name: String, sql: String)(
      f: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, f, Some(sql))

  /** Convenience constructor for no-oracle queries (rows-only check). */
  def noOracle(name: String)(f: (SparkSession, String) => DataFrame): GQuery =
    GQuery(name, f, None)
}
