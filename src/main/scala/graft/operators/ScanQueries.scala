package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Scans / sources (SURVEY.md §2.1).
  *
  * Scale notes: `scan_parquet` is the one intentional full-width scan
  * in the inventory (everything else projects narrow so the vectorized
  * parquet reader prunes columns — check ReadSchema in .explain).
  * `scan_count_all` compiles to metadata-only parquet row-group counts
  * (no data pages read) — at 100 TB it touches footers only.
  */
object ScanQueries {

  /** Full scan of lineitem, all columns, deterministic total order.
    * The timestamp column is formatted to string so the compare never
    * sees a raw temporal type (SURVEY.md §5.3). */
  val scanParquet: GQuery = GQuery(
    "scan_parquet",
    """SELECT l_orderkey, l_partkey, l_suppkey, l_linenumber, l_quantity,
      |  l_extendedprice, l_discount, l_tax, l_returnflag, l_linestatus,
      |  strftime(l_shipdate, '%Y-%m-%d %H:%M:%S') AS l_shipdate
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber, l_partkey, l_extendedprice""".stripMargin) {
    (s, dir) =>
    Tables.lineitem(s, dir)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_partkey"),
        col("l_extendedprice"))
      .select(
        col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_linenumber"), col("l_quantity"), col("l_extendedprice"),
        col("l_discount"), col("l_tax"), col("l_returnflag"),
        col("l_linestatus"),
        date_format(col("l_shipdate"), "yyyy-MM-dd HH:mm:ss").as("l_shipdate"))
  }

  /** Row count of every table, unioned as (table_name, cnt) — a pure
    * metadata scan per table. */
  val scanCountAll: GQuery = GQuery(
    "scan_count_all",
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings")
      .map(t => s"SELECT '$t' AS table_name, CAST(count(*) AS BIGINT) AS cnt FROM $t")
      .mkString("", " UNION ALL ", " ORDER BY table_name")) { (s, dir) =>
    val frames = Seq(
      "region" -> Tables.region(s, dir),
      "nation" -> Tables.nation(s, dir),
      "customer" -> Tables.customer(s, dir),
      "supplier" -> Tables.supplier(s, dir),
      "part" -> Tables.part(s, dir),
      "orders" -> Tables.orders(s, dir),
      "lineitem" -> Tables.lineitem(s, dir),
      "events" -> Tables.eventsRawNanos(s, dir),
      "documents" -> Tables.documents(s, dir),
      "embeddings" -> Tables.embeddings(s, dir))
    frames.map { case (name, df) =>
      df.agg(count(lit(1)).as("cnt")).select(lit(name).as("table_name"), col("cnt"))
    }.reduce(_.unionAll(_)).orderBy(col("table_name"))
  }

  val all: Seq[GQuery] = Seq(scanParquet, scanCountAll)
}
