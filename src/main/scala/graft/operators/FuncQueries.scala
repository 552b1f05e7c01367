package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.GQuery
import graft.sources.Tables

/** Scalar function surface: string / date / math / array / map+json
  * (SURVEY.md §2.7). All codegen'd built-ins — no UDFs, so every
  * expression stays inside whole-stage codegen and any comparison
  * against them remains pushdown-eligible.
  */
object FuncQueries {

  /** String functions over customer names / part types. */
  val strFuncs: GQuery = GQuery(
    "str_funcs",
    """SELECT c_custkey,
      |  upper(c_name) AS up_name,
      |  lower(c_mktsegment) AS lo_seg,
      |  CAST(length(c_name) AS INT) AS name_len,
      |  substr(c_name, 1, 8) AS name_head,
      |  trim(concat(' ', c_name, ' ')) AS trimmed,
      |  concat_ws('|', c_name, c_mktsegment) AS joined,
      |  (c_name LIKE '%00%') AS has_00,
      |  regexp_extract(c_name, '([0-9]+)', 1) AS digits,
      |  split_part(c_name, '#', 2) AS num_part
      |FROM customer
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .select(col("c_custkey"),
        upper(col("c_name")).as("up_name"),
        lower(col("c_mktsegment")).as("lo_seg"),
        length(col("c_name")).as("name_len"),
        substring(col("c_name"), 1, 8).as("name_head"),
        trim(concat(lit(" "), col("c_name"), lit(" "))).as("trimmed"),
        concat_ws("|", col("c_name"), col("c_mktsegment")).as("joined"),
        col("c_name").like("%00%").as("has_00"),
        regexp_extract(col("c_name"), "([0-9]+)", 1).as("digits"),
        split_part(col("c_name"), lit("#"), lit(2)).as("num_part"))
      .orderBy(col("c_custkey"))
  }

  /** Date/time functions over order dates. Numeric parts are cast to
    * INT on both sides; truncations/additions are formatted to strings
    * (no raw temporal types cross the compare). Note dayofweek:
    * Spark is 1=Sunday, DuckDB is 0=Sunday — the oracle adds 1. */
  val dateFuncs: GQuery = GQuery(
    "date_funcs",
    """SELECT o_orderkey,
      |  CAST(year(o_orderdate) AS INT) AS yr,
      |  CAST(month(o_orderdate) AS INT) AS mo,
      |  CAST(day(o_orderdate) AS INT) AS dom,
      |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
      |  CAST(quarter(o_orderdate) AS INT) AS qtr,
      |  strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  CAST(datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate)
      |    AS INT) AS days_since_95,
      |  strftime(o_orderdate + INTERVAL 3 MONTH, '%Y-%m-%d') AS plus3mo
      |FROM orders
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).cast("int").as("yr"),
        month(col("o_orderdate")).cast("int").as("mo"),
        dayofmonth(col("o_orderdate")).cast("int").as("dom"),
        dayofweek(col("o_orderdate")).cast("int").as("dow"),
        quarter(col("o_orderdate")).cast("int").as("qtr"),
        date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM-dd")
          .as("month_start"),
        datediff(col("o_orderdate"), lit("1995-01-01").cast("date"))
          .cast("int").as("days_since_95"),
        date_format(add_months(col("o_orderdate"), 3), "yyyy-MM-dd")
          .as("plus3mo"))
      .orderBy(col("o_orderkey"))
  }

  /** Math functions over part prices. Transcendentals (ln, pow, etc.)
    * are rounded to 8 places: libm implementations differ in the last
    * ulp across engines, and a transcendental result never sits exactly
    * on a rounding boundary. sqrt is IEEE-exact so it ships raw. */
  val mathFuncs: GQuery = GQuery(
    "math_funcs",
    """SELECT p_partkey, p_retailprice,
      |  CAST(floor(p_retailprice) AS BIGINT) AS fl,
      |  CAST(ceil(p_retailprice) AS BIGINT) AS ce,
      |  abs(p_retailprice - 1000) AS dist_1k,
      |  sqrt(p_retailprice) AS sq,
      |  round(ln(p_retailprice), 8) AS log_e,
      |  round(pow(p_retailprice, 2), 4) AS squared,
      |  CAST(p_size % 7 AS INT) AS size_mod
      |FROM part
      |ORDER BY p_partkey""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_retailprice"),
        floor(col("p_retailprice")).as("fl"),
        ceil(col("p_retailprice")).as("ce"),
        abs(col("p_retailprice") - 1000).as("dist_1k"),
        sqrt(col("p_retailprice")).as("sq"),
        round(log(col("p_retailprice")), 8).as("log_e"),
        round(pow(col("p_retailprice"), 2), 4).as("squared"),
        (col("p_size") % 7).cast("int").as("size_mod"))
      .orderBy(col("p_partkey"))
  }

  /** Array functions over the embedding vectors + tokenized text
    * (scalar outputs only, so the compare never diffs nested types). */
  val arrayFuncs: GQuery = GQuery(
    "array_funcs",
    """SELECT v.vec_id,
      |  CAST(len(v.embedding) AS INT) AS dim,
      |  v.embedding[1] AS first_elem,
      |  list_max(v.embedding) AS max_elem,
      |  CAST(len(v.embedding[1:8]) AS INT) AS slice_len,
      |  CAST(len(string_split(d.text, ' ')) AS INT) AS n_tokens
      |FROM embeddings v JOIN documents d ON v.vec_id = d.doc_id
      |ORDER BY v.vec_id""".stripMargin) { (s, dir) =>
    val v = Tables.embeddings(s, dir)
    val d = Tables.documents(s, dir)
    v.join(d, col("vec_id") === col("doc_id"))
      .select(col("vec_id"),
        size(col("embedding")).as("dim"),
        element_at(col("embedding"), 1).as("first_elem"),
        array_max(col("embedding")).as("max_elem"),
        size(slice(col("embedding"), 1, 8)).as("slice_len"),
        size(split(col("text"), " ")).as("n_tokens"))
      .orderBy(col("vec_id"))
  }

  /** JSON extraction from the events props payload + a modulo
    * histogram of the extracted value. */
  val mapJsonFuncs: GQuery = GQuery(
    "map_json_funcs",
    """SELECT CAST(CAST(props->>'k' AS BIGINT) % 10 AS BIGINT) AS k_bucket,
      |  count(*) AS n,
      |  CAST(min(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS min_k,
      |  CAST(max(CAST(props->>'k' AS BIGINT)) AS BIGINT) AS max_k
      |FROM events
      |GROUP BY k_bucket
      |ORDER BY k_bucket""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
      .groupBy((col("k") % 10).as("k_bucket"))
      .agg(count(lit(1)).as("n"),
        min(col("k")).as("min_k"),
        max(col("k")).as("max_k"))
      .orderBy(col("k_bucket"))
  }

  val all: Seq[GQuery] = Seq(strFuncs, dateFuncs, mathFuncs, arrayFuncs,
    mapJsonFuncs)
}
