package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Sort / limit / top-k / set operations (SURVEY.md §2.6).
  *
  * Scale notes: `orderBy(...).limit(k)` compiles to
  * TakeOrderedAndProject — per-partition top-k then a driver-side merge
  * of k·partitions rows, never a global sort. Set ops with DISTINCT
  * semantics are hash aggregations on the full row; UNION ALL is a
  * metadata-only concatenation (no shuffle at all).
  */
object SortSetQueries {

  private def activeKeys(s: SparkSession, dir: String, yr: Int) =
    Tables.orders(s, dir)
      .filter(year(col("o_orderdate")) === yr)
      .select(col("o_custkey"))

  /** Multi-key sort (desc price, asc date, key tiebreak) + LIMIT → the
    * top-k plan. */
  val sortMultiKey: GQuery = GQuery(
    "sort_multi_key",
    """SELECT o_orderkey, strftime(o_orderdate, '%Y-%m-%d') AS order_day,
      |  o_totalprice
      |FROM orders
      |ORDER BY o_totalprice DESC, o_orderdate ASC, o_orderkey ASC
      |LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc,
        col("o_orderkey").asc)
      .select(col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_day"),
        col("o_totalprice"))
      .limit(100)
  }

  /** UNION ALL of 1995 vs 1998 active customer keys (tagged by year so
    * the multiset is totally ordered). */
  val setopUnionAll: GQuery = GQuery(
    "setop_union_all",
    """SELECT o_custkey, 1995 AS yr FROM orders WHERE year(o_orderdate) = 1995
      |UNION ALL
      |SELECT o_custkey, 1998 AS yr FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY yr, o_custkey""".stripMargin) { (s, dir) =>
    activeKeys(s, dir, 1995).withColumn("yr", lit(1995))
      .unionAll(activeKeys(s, dir, 1998).withColumn("yr", lit(1998)))
      .orderBy(col("yr"), col("o_custkey"))
  }

  /** UNION (distinct) of the same two key sets. */
  val setopUnionDistinct: GQuery = GQuery(
    "setop_union_distinct",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |UNION
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    activeKeys(s, dir, 1995)
      .union(activeKeys(s, dir, 1998)).distinct()
      .orderBy(col("o_custkey"))
  }

  /** INTERSECT (distinct): customers active in both years. */
  val setopIntersect: GQuery = GQuery(
    "setop_intersect",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    activeKeys(s, dir, 1995)
      .intersect(activeKeys(s, dir, 1998))
      .orderBy(col("o_custkey"))
  }

  /** EXCEPT (distinct): active in 1995, not in 1998. */
  val setopExcept: GQuery = GQuery(
    "setop_except",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    activeKeys(s, dir, 1995)
      .except(activeKeys(s, dir, 1998))
      .orderBy(col("o_custkey"))
  }

  /** unionByName with missing columns: schemas aligned by NAME (not
    * position), absent columns null-filled — the schema-evolution
    * union. */
  val setopUnionByName: GQuery = GQuery(
    "setop_union_by_name",
    """SELECT kind, key, val, extra FROM (
      |  SELECT 'c' AS kind, c_custkey AS key, c_acctbal AS val,
      |    c_mktsegment AS extra FROM customer
      |  UNION ALL
      |  SELECT 's' AS kind, s_suppkey AS key, s_acctbal AS val,
      |    CAST(NULL AS VARCHAR) AS extra FROM supplier)
      |ORDER BY kind, key""".stripMargin) { (s, dir) =>
    val c = Tables.customer(s, dir)
      .select(lit("c").as("kind"), col("c_custkey").as("key"),
        col("c_acctbal").as("val"), col("c_mktsegment").as("extra"))
    val sup = Tables.supplier(s, dir)
      .select(lit("s").as("kind"), col("s_suppkey").as("key"),
        col("s_acctbal").as("val"))
    c.unionByName(sup, allowMissingColumns = true)
      .orderBy(col("kind"), col("key"))
  }

  /** EXCEPT ALL — bag semantics: each 1995 order-row survives unless
    * matched 1:1 by a 1998 row of the same key (multiplicity
    * max(m−n, 0)), the set-difference the DISTINCT variant above
    * cannot express (a customer with 3 orders in 1995 and 1 in 1998
    * contributes 2 rows here, 0 rows there). Spark plans `exceptAll`
    * as a count-tagged aggregate + generator replay — one shuffle on
    * the key, no join, the same shape at any scale. */
  val setopExceptAll: GQuery = GQuery(
    "setop_except_all",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |EXCEPT ALL
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    activeKeys(s, dir, 1995)
      .exceptAll(activeKeys(s, dir, 1998))
      .orderBy(col("o_custkey"))
  }

  /** INTERSECT ALL — bag semantics: min(m, n) copies of each key
    * survive (pairs up 1995 and 1998 order-rows one-to-one). */
  val setopIntersectAll: GQuery = GQuery(
    "setop_intersect_all",
    """SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
      |INTERSECT ALL
      |SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1998
      |ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    activeKeys(s, dir, 1995)
      .intersectAll(activeKeys(s, dir, 1998))
      .orderBy(col("o_custkey"))
  }

  /** EXPLICIT NULL-ORDERING sort — engines DISAGREE by default (Spark
    * sorts nulls FIRST on ASC, DuckDB LAST), so any cross-engine
    * pipeline must pin NULLS FIRST/LAST explicitly; this row proves
    * the pinned form agrees bit-for-bit. The nullable key is real
    * (each type's first day has no prior-day count), the sort mixes
    * NULLS FIRST ASC with a DESC tiebreak, and the driver's compare
    * preserves row order — so a default-ordering regression in either
    * engine fails the hash. */
  val sortNullsOrdering: GQuery = GQuery(
    "sort_nulls_ordering",
    """WITH d AS (
      |  SELECT event_type, CAST(ts AS DATE) AS day,
      |    CAST(count(*) AS BIGINT) AS cnt
      |  FROM events GROUP BY 1, 2),
      |l AS (
      |  SELECT event_type, strftime(day, '%Y-%m-%d') AS day, cnt,
      |    lag(cnt) OVER (PARTITION BY event_type ORDER BY day)
      |      AS prev_cnt
      |  FROM d)
      |SELECT event_type, day, cnt, prev_cnt
      |FROM l
      |ORDER BY prev_cnt ASC NULLS FIRST, cnt DESC, event_type, day"""
      .stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(count(lit(1)).cast("bigint").as("cnt"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("day"))
    d.select(col("event_type"),
        date_format(col("day"), "yyyy-MM-dd").as("day"), col("cnt"),
        lag(col("cnt"), 1).over(w).as("prev_cnt"))
      .orderBy(col("prev_cnt").asc_nulls_first, col("cnt").desc,
        col("event_type"), col("day"))
  }

  val all: Seq[GQuery] = Seq(sortMultiKey, setopUnionAll,
    setopUnionDistinct, setopIntersect, setopExcept, setopUnionByName,
    setopExceptAll, setopIntersectAll, sortNullsOrdering)
}
