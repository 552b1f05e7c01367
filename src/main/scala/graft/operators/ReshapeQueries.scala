package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Reshaping + subquery surface: pivot/unpivot, correlated EXISTS,
  * first/last/nth window values.
  *
  * Pivot uses an EXPLICIT value list — the two-pass form (collect
  * distinct values to the driver, then pivot) is a hidden job + a
  * driver round-trip, the wrong shape at 100 TB when the category set
  * is known. Unpivot is metadata-only (no shuffle). The correlated
  * EXISTS goes through spark.sql to exercise Catalyst's subquery
  * decorrelation (rewritten to a semi-join).
  */
object ReshapeQueries {

  private val priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
  private val prioCols =
    Seq("urgent", "high", "medium", "not_specified", "low")

  /** Order counts per year, pivoted wide by priority. */
  val pivotWide: GQuery = GQuery(
    "pivot_wide",
    s"""SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       |  ${priorities.zip(prioCols).map { case (p, c) =>
            s"CAST(count(CASE WHEN o_orderpriority = '$p' THEN 1 END) AS BIGINT) AS $c"
          }.mkString(",\n  ")}
       |FROM orders
       |GROUP BY order_year
       |ORDER BY order_year""".stripMargin) { (s, dir) =>
    val wide = Tables.orders(s, dir)
      .select(year(col("o_orderdate")).cast("int").as("order_year"),
        col("o_orderpriority"))
      .groupBy(col("order_year"))
      .pivot("o_orderpriority", priorities)
      .agg(count(lit(1)))
    priorities.zip(prioCols)
      .foldLeft(wide) { case (d, (p, c)) => d.withColumnRenamed(p, c) }
      .select(col("order_year") +: prioCols.map(c =>
        coalesce(col(c), lit(0L)).as(c)): _*)
      .orderBy(col("order_year"))
  }

  /** The same frame unpivoted back to long form (year, priority, cnt). */
  val unpivotLong: GQuery = GQuery(
    "unpivot_long",
    s"""WITH wide AS (
       |  SELECT CAST(year(o_orderdate) AS INT) AS order_year,
       |    ${priorities.zip(prioCols).map { case (p, c) =>
              s"CAST(count(CASE WHEN o_orderpriority = '$p' THEN 1 END) AS BIGINT) AS $c"
            }.mkString(",\n    ")}
       |  FROM orders GROUP BY order_year)
       |SELECT order_year, priority, cnt FROM (
       |  ${prioCols.map(c =>
            s"SELECT order_year, '$c' AS priority, $c AS cnt FROM wide")
            .mkString("\n  UNION ALL ")})
       |ORDER BY order_year, priority""".stripMargin) { (s, dir) =>
    pivotWide.fn(s, dir)
      .unpivot(Array(col("order_year")),
        prioCols.map(col).toArray, "priority", "cnt")
      .orderBy(col("order_year"), col("priority"))
  }

  /** Correlated EXISTS subquery (decorrelated by Catalyst): customers
    * with at least one urgent order above the global average price. */
  val filterExistsSubquery: GQuery = GQuery(
    "filter_exists_subquery",
    """SELECT c_custkey, c_name FROM customer
      |WHERE EXISTS (
      |  SELECT 1 FROM orders
      |  WHERE o_custkey = c_custkey
      |    AND o_orderpriority = '1-URGENT'
      |    AND o_totalprice > (SELECT avg(o_totalprice) FROM orders))
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("sq_customer")
    Tables.orders(s, dir).createOrReplaceTempView("sq_orders")
    s.sql(
      """SELECT c_custkey, c_name FROM sq_customer
        |WHERE EXISTS (
        |  SELECT 1 FROM sq_orders
        |  WHERE o_custkey = c_custkey
        |    AND o_orderpriority = '1-URGENT'
        |    AND o_totalprice > (SELECT avg(o_totalprice) FROM sq_orders))
        |ORDER BY c_custkey""".stripMargin)
  }

  /** first_value / last_value / nth_value over a full-partition frame. */
  val winFirstLastNth: GQuery = GQuery(
    "win_first_last_nth",
    """SELECT o_orderkey, o_orderstatus,
      |  first_value(o_orderkey) OVER w AS cheapest,
      |  last_value(o_orderkey) OVER w AS priciest,
      |  nth_value(o_orderkey, 2) OVER w AS second_cheapest
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus
      |  ORDER BY o_totalprice, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    Tables.orders(s, dir)
      .select(col("o_orderkey"), col("o_orderstatus"),
        first(col("o_orderkey")).over(w).as("cheapest"),
        last(col("o_orderkey")).over(w).as("priciest"),
        nth_value(col("o_orderkey"), 2).over(w).as("second_cheapest"))
      .orderBy(col("o_orderkey"))
  }

  /** NULL-PRESERVING generator (`explode_outer`): part names split to
    * their 'z'-containing tokens — rows whose filtered array is EMPTY
    * survive with a null token instead of vanishing. The semantics
    * that keeps "document with zero extracted entities" visible in an
    * extraction pipeline (a plain explode silently drops it and the
    * downstream join under-counts the corpus). Ordering pins null
    * placement explicitly on both engines. */
  val explodeOuterTokens: GQuery = GQuery(
    "explode_outer_tokens",
    """SELECT p.p_partkey, t.token
      |FROM (SELECT p_partkey,
      |        list_filter(string_split(p_name, ' '),
      |                    x -> x LIKE '%z%') AS toks
      |      FROM part WHERE p_partkey <= 200) p
      |LEFT JOIN LATERAL (SELECT unnest(p.toks) AS token) t ON true
      |ORDER BY p_partkey, token NULLS FIRST""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .filter(col("p_partkey") <= 200)
      .select(col("p_partkey"),
        explode_outer(filter(split(col("p_name"), " "),
          t => t.contains("z"))).as("token"))
      .orderBy(col("p_partkey"), col("token").asc_nulls_first)
  }

  val all: Seq[GQuery] = Seq(pivotWide, unpivotLong, filterExistsSubquery,
    winFirstLastNth, explodeOuterTokens)
}
