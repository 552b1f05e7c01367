package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.GQuery
import graft.sources.Tables

/** Storage-LAYOUT coverage as contract queries: partitioned writes that
  * prune on read, bucketed tables whose joins need no shuffle, and raw
  * line-oriented text ingestion. Each query derives its layout inside
  * the query fn (deterministic bytes under a deterministic /tmp path),
  * reads it back through the real Spark source path, and aggregates;
  * the DuckDB oracle runs the same relational derivation straight over
  * the parquet fixtures — results agree iff the layout roundtrip is
  * lossless. Same pattern as SourceQueries (csv/json/orc).
  *
  * These are the 100 TB table-design levers: hive-style partition
  * directories turn a predicate on the partition key into "don't even
  * list those directories" (PartitionFilters, zero row groups read),
  * and bucketing pre-shuffles a fact table ONCE at write time so every
  * later join/aggregate on the bucket key skips its exchange.
  * LayoutSpec pins both physical properties on the analyzed plans.
  */
object LayoutQueries {

  private[operators] def tmpDir(kind: String, dir: String): String =
    s"/tmp/graft_layout/${kind}_" + dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** DuckDB twin of graft.api.Sampling.portableHash (48-bit md5 slice). */
  private def duckHashL(seedAndVal: String): String =
    s"CAST(concat('0x', substr(md5($seedAndVal), 1, 12)) AS BIGINT)"

  /** orders → hive-partitioned parquet by o_orderpriority → read back
    * with a partition predicate → per-month aggregate.
    *
    * The filter on the partition column never touches data: Spark's
    * FileIndex resolves it against directory names (PartitionFilters in
    * the scan node, spec-pinned), so at 100 TB a 1-of-5 priority
    * predicate reads 1/5 of the files and ZERO footers of the rest.
    * The partition column comes back as its directory-string form;
    * values are opaque strings on both sides so no type roundtrip is
    * at risk. */
  val sinkPartitionedPrune: GQuery = GQuery(
    "sink_partitioned_prune",
    """SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m-%d') AS month_start,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_price,
      |  min(o_orderkey) AS first_key, max(o_orderkey) AS last_key
      |FROM orders
      |WHERE o_orderpriority = '1-URGENT'
      |GROUP BY 1
      |ORDER BY month_start""".stripMargin) { (s, dir) =>
    val path = tmpDir("part_orders", dir)
    Tables.orders(s, dir)
      .write.mode("overwrite").partitionBy("o_orderpriority").parquet(path)
    s.read.parquet(path)
      .filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(date_format(date_trunc("month", col("o_orderdate")),
        "yyyy-MM-dd").as("month_start"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"))
      .orderBy(col("month_start"))
  }

  /** orders and customer → bucketed tables (16 buckets on the join
    * key) → join + aggregate with NO exchange on either side.
    *
    * bucketBy pre-applies the hash partitioning at write time and
    * records it in the catalog; the sort-merge join then reads both
    * sides' matching buckets directly (LayoutSpec asserts the physical
    * plan contains zero shuffles). At 100 TB this is THE lever for a
    * fact table joined repeatedly on one key: pay the shuffle once at
    * ingest, never again. Tables are external (explicit /tmp path) so
    * no warehouse directory is touched; names are SF-suffixed to keep
    * concurrent scale factors independent. */
  val joinBucketedColocated: GQuery = GQuery(
    "join_bucketed_colocated",
    """SELECT c_mktsegment,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(count(DISTINCT c_custkey) AS BIGINT) AS n_customers,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_price
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    bucketedJoinFrame(s, dir)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_orders"),
        countDistinct(col("c_custkey")).as("n_customers"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"))
      .orderBy(col("c_mktsegment"))
  }

  /** The bucketed join itself, exposed for LayoutSpec's zero-shuffle
    * assertion. Writes both bucketed tables if this session has not
    * yet, then joins them on the bucket key. */
  def bucketedJoinFrame(s: SparkSession, dir: String): DataFrame = {
    val suffix = dir.replaceAll("[^a-zA-Z0-9]", "_")
    val ordersTable = s"graft_bkt_orders_$suffix"
    val customerTable = s"graft_bkt_customer_$suffix"
    if (!s.catalog.tableExists(ordersTable)) {
      Tables.orders(s, dir)
        .write.mode("overwrite").format("parquet")
        .option("path", tmpDir("bkt_orders", dir))
        .bucketBy(16, "o_custkey").sortBy("o_custkey")
        .saveAsTable(ordersTable)
    }
    if (!s.catalog.tableExists(customerTable)) {
      Tables.customer(s, dir)
        .write.mode("overwrite").format("parquet")
        .option("path", tmpDir("bkt_customer", dir))
        .bucketBy(16, "c_custkey").sortBy("c_custkey")
        .saveAsTable(customerTable)
    }
    s.table(ordersTable)
      .join(s.table(customerTable), col("o_custkey") === col("c_custkey"))
  }

  /** supplier → raw line-oriented text ("k|nation|name|bal" via
    * concat_ws) → spark.read.text → split/cast → per-nation aggregate.
    *
    * Raw text lines are the arrival format of most LLM corpus dumps;
    * this pins the text source end to end: one string column `value`,
    * line-split across executors like any scan, schema applied by
    * explicit split/cast (never inference). Roundtrip is lossless:
    * keys/ints print canonically, s_name is '|'-free
    * ("Supplier#NNNNNNNNN", FIXTURES.md), and s_acctbal rides along
    * only via its exact 2-decimal DECIMAL cast. */
  val sourceTextScan: GQuery = GQuery(
    "source_text_scan",
    """SELECT s_nationkey,
      |  CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
      |  min(s_name) AS first_name,
      |  CAST(round(sum(CAST(s_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS bal_sum
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
    val path = tmpDir("text_supplier", dir)
    Tables.supplier(s, dir)
      .select(concat_ws("|",
        col("s_suppkey"), col("s_nationkey"), col("s_name"),
        col("s_acctbal").cast("decimal(18,2)")).as("value"))
      .write.mode("overwrite").text(path)
    val parts = split(col("value"), "\\|")
    s.read.text(path)
      .select(
        parts.getItem(0).cast("bigint").as("s_suppkey"),
        parts.getItem(1).cast("int").as("s_nationkey"),
        parts.getItem(2).as("s_name"),
        parts.getItem(3).cast("decimal(18,2)").as("s_acctbal"))
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_suppkey")).as("key_sum"),
        min(col("s_name")).as("first_name"),
        round(sum(col("s_acctbal")), 2).cast("double").as("bal_sum"))
      .orderBy(col("s_nationkey"))
  }

  /** Morton (z-order) value: interleave the low `bits` bits of two
    * key columns — rows close in z are close in BOTH keys, so sorting
    * by z makes each written file/row-group span a tight min/max
    * rectangle in (x, y) and a 2-dim predicate prunes on BOTH
    * dimensions from footer stats alone. A pure bit-arithmetic Column
    * (fold of shift/and/or — whole-stage codegen, no UDF).
    *
    * `bits` MUST cover the key domain: bits dropped above it make
    * far-apart keys z-adjacent and silently destroy the clustering
    * (results stay right, pruning quietly dies — the worst failure
    * mode). Callers derive it from the measured max key
    * ([[zBitsFor]]); both keys share one width so neither dimension
    * dominates the interleave. */
  private[operators] def zvalue(x: Column, y: Column,
      bits: Int = 16): Column = {
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xl, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(yl, i).bitwiseAND(lit(1L)),
          2 * i + 1))
    }
  }

  /** lineitem → z-order-clustered parquet on (l_partkey, l_suppkey) →
    * read back with a rectangle predicate on BOTH keys → aggregate.
    *
    * Single-key sorting (or hive partitioning) prunes one dimension
    * and scatters the other; z-order clustering is the 100 TB lever
    * for the two-key scan pattern (part+supplier probes, user+time
    * slices): range-partition + sort by the interleaved value and
    * every file's footer min/max becomes a tight rectangle, so the
    * parquet reader's pushed range filters (spec-pinned) skip whole
    * files/row-groups on either dimension. At test scale each file is
    * one row group, so skipping granularity is per-file; the layout
    * math is scale-free. Results match the raw-table oracle iff the
    * clustered roundtrip is lossless. */
  val sinkZorderCluster: GQuery = GQuery(
    "sink_zorder_cluster",
    """SELECT l_returnflag,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum(l_quantity) AS DOUBLE) AS sum_qty,
      |  CAST(round(sum(CAST(l_extendedprice AS DECIMAL(18,2))), 2)
      |    AS DOUBLE) AS sum_price,
      |  CAST(min(l_orderkey) AS BIGINT) AS first_order
      |FROM lineitem
      |WHERE l_partkey BETWEEN 1 AND 150 AND l_suppkey BETWEEN 1 AND 8
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    val path = tmpDir("zorder_lineitem", dir)
    // derive the interleave width from the MEASURED key domain (one
    // 1-row aggregate at layout time): a hardcoded width silently
    // stops clustering the moment a key outgrows it
    val mx = Tables.lineitem(s, dir)
      .agg(max(col("l_partkey")), max(col("l_suppkey"))).first()
    val bits = math.max(zBitsFor(mx.getLong(0)), zBitsFor(mx.getLong(1)))
    Tables.lineitem(s, dir)
      .withColumn("zval", zvalue(col("l_partkey"), col("l_suppkey"), bits))
      .repartitionByRange(8, col("zval"))
      .sortWithinPartitions(col("zval"))
      .drop(col("zval"))
      .write.mode("overwrite").parquet(path)
    s.read.parquet(path)
      .filter(col("l_partkey").between(1, 150)
        && col("l_suppkey").between(1, 8))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n_items"),
        sum(col("l_quantity")).cast("double").as("sum_qty"),
        round(sum(col("l_extendedprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"),
        min(col("l_orderkey")).as("first_order"))
      .orderBy(col("l_returnflag"))
  }

  /** DYNAMIC partition pruning: orders hive-partitioned by order
    * year, joined to a year dimension whose qualifying keys are only
    * known at RUNTIME (a filtered dim, not a literal on the fact) —
    * Spark broadcasts the filtered dim, collects its join keys, and
    * rewrites the fact scan's PartitionFilters to read only the
    * matching year directories (DynamicPruningExpression,
    * spec-pinned).
    *
    * This is the static-pruning lever (sink_partitioned_prune) made
    * to work through a JOIN — the star-schema shape at 100 TB: the
    * fact's partition predicate lives in the dimension table, and
    * without DPP the scan reads every partition and lets the join
    * discard 60% of the IO. */
  val joinPartitionPrunedRuntime: GQuery = GQuery(
    "join_partition_pruned_runtime",
    """SELECT CAST(yr AS INT) AS yr,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_price
      |FROM (SELECT year(o_orderdate) AS yr, o_totalprice FROM orders)
      |WHERE yr >= 1997
      |GROUP BY yr
      |ORDER BY yr""".stripMargin) { (s, dir) =>
    val path = tmpDir("dpp_orders", dir)
    Tables.orders(s, dir)
      .withColumn("o_year", year(col("o_orderdate")))
      .write.mode("overwrite").partitionBy("o_year").parquet(path)
    val fact = s.read.parquet(path)
    // the dim's qualifying years exist only at runtime (derived +
    // filtered), so the fact-side partition filter must be DYNAMIC
    val dim = Tables.orders(s, dir)
      .select(year(col("o_orderdate")).as("yr")).distinct()
      .filter(col("yr") >= 1997)
    fact.join(dim, fact("o_year") === dim("yr"))
      .groupBy(col("yr"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"))
      .orderBy(col("yr"))
  }

  /** Small-files COMPACTION: a fragmented table (64 tiny files — the
    * debris every streaming/append ingest accumulates) rewritten to
    * size-targeted files, then read back and aggregated; results
    * match the raw-table oracle iff the rewrite is lossless.
    *
    * The operational layout lever at 100 TB: listing + opening
    * millions of KB-sized files dominates scan time long before
    * bytes do (every file is a NameNode/S3 round-trip + a parquet
    * footer parse), so maintenance compaction to ~128 MB files is
    * what keeps a continuously-ingested table scannable. The target
    * file count derives from the MEASURED input bytes (fs metadata
    * only — no data pass); LayoutSpec asserts the compacted layout
    * has materially fewer files. */
  val sinkCompactSmallFiles: GQuery = GQuery(
    "sink_compact_small_files",
    """SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS sum_price,
      |  CAST(min(o_orderkey) AS BIGINT) AS first_key,
      |  CAST(max(o_orderkey) AS BIGINT) AS last_key
      |FROM orders
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val fragPath = tmpDir("frag_orders", dir)
    val compactPath = tmpDir("compact_orders", dir)
    Tables.orders(s, dir).repartition(64)
      .write.mode("overwrite").parquet(fragPath)
    val targetBytes = 32L << 20 // 128 MB on a real cluster; 32 MB here
    val inputBytes = parquetBytes(fragPath)
    val nFiles = math.max(1, (inputBytes / targetBytes).toInt
      + (if (inputBytes % targetBytes > 0) 1 else 0))
    s.read.parquet(fragPath).repartition(nFiles)
      .write.mode("overwrite").parquet(compactPath)
    s.read.parquet(compactPath)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"),
        min(col("o_orderkey")).as("first_key"),
        max(col("o_orderkey")).as("last_key"))
      .orderBy(col("o_orderpriority"))
  }

  /** bits needed to represent `maxKey` (≥1, capped at 31 so two
    * interleaved keys always fit a long). */
  private[operators] def zBitsFor(maxKey: Long): Int =
    math.min(31, math.max(1, 64 - java.lang.Long.numberOfLeadingZeros(maxKey)))

  /** total bytes of the .parquet files under `path` (fs metadata only). */
  private[operators] def parquetBytes(path: String): Long = {
    val fs = new java.io.File(path)
    Option(fs.listFiles()).map(_.filter(_.getName.endsWith(".parquet"))
      .map(_.length()).sum).getOrElse(0L)
  }

  /** .parquet file count under `path` (for LayoutSpec's assertions). */
  private[operators] def parquetFileCount(path: String): Int = {
    val fs = new java.io.File(path)
    Option(fs.listFiles()).map(_.count(_.getName.endsWith(".parquet")))
      .getOrElse(0)
  }

  /** MERGE/upsert as copy-on-write: a base snapshot (orders minus
    * every 7th key — the current table) merged with an update batch
    * (every 3rd key at a corrected price — updates where the key
    * exists, inserts where it does not), written as a NEW snapshot,
    * read back, aggregated. The SCD-1 maintenance shape on plain
    * parquet: without a table format, upsert = full-outer join +
    * column coalesce + snapshot rewrite — exactly what MERGE INTO
    * compiles to underneath, spelled as the declarative plan.
    *
    * Scale posture: the join is keyed on the primary key (shuffle or
    * broadcast by AQE from the update batch's runtime size — update
    * batches are typically tiny next to the snapshot); at 100 TB the
    * rewrite cost is why real systems layer a format with file-level
    * MERGE on top, but the RELATIONAL core is this exact plan.
    * Results match the oracle iff merge semantics (update wins,
    * insert appears, untouched rows survive) and the snapshot
    * roundtrip are both lossless. */
  val mergeUpsertSnapshot: GQuery = GQuery(
    "merge_upsert_snapshot",
    """WITH merged AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CASE WHEN o_orderkey % 3 = 0
      |         THEN round(CAST(o_totalprice AS DECIMAL(18,2))
      |                    * CAST(1.1 AS DECIMAL(3,1)), 2)
      |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
      |  FROM orders
      |  WHERE o_orderkey % 7 <> 0 OR o_orderkey % 3 = 0)
      |SELECT o_orderpriority,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(round(sum(price), 2) AS DOUBLE) AS sum_price,
      |  CAST(sum(CASE WHEN o_orderkey % 3 = 0 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_updated
      |FROM merged
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val snapPath = tmpDir("merge_snapshot", dir)
    val orders = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderpriority"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    val base = orders.filter(col("o_orderkey") % 7 =!= 0)
    val updates = orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("u_key"),
        col("o_orderpriority").as("u_priority"),
        round(col("price") * lit(BigDecimal("1.1")).cast("decimal(3,1)"), 2)
          .as("u_price"))
    base.join(updates, col("o_orderkey") === col("u_key"), "full_outer")
      .select(
        coalesce(col("u_key"), col("o_orderkey")).as("o_orderkey"),
        coalesce(col("u_priority"), col("o_orderpriority"))
          .as("o_orderpriority"),
        coalesce(col("u_price"), col("price")).as("price"),
        col("u_key").isNotNull.as("updated"))
      .write.mode("overwrite").parquet(snapPath)
    s.read.parquet(snapPath)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("price")), 2).cast("double").as("sum_price"),
        sum(when(col("updated"), 1L).otherwise(0L)).as("n_updated"))
      .orderBy(col("o_orderpriority"))
  }

  /** SCHEMA-EVOLUTION MERGE — upsert where the UPDATE BATCH carries a
    * column the snapshot never had (the day the upstream team adds
    * `channel` to their feed): the merge widens the published schema
    * in place — updated rows carry the new value, never-updated rows
    * surface NULL — without rewriting history's bytes for the old
    * column set (at 100 TB the only affordable answer, the
    * source_schema_drift read-side argument applied to the WRITE
    * path). The audit re-reads the published snapshot FILES and
    * groups by priority × channel with NULL surfaced as '(legacy)',
    * proving both the widening and the padding are in the files.
    * Deterministic update slice (o_orderkey % 3) and channel
    * derivation (orderkey parity), so the oracle replays the whole
    * merge + audit relationally.
    *
    * Scale shape: one key-equi full-outer merge (the
    * merge_upsert_snapshot plan — AQE sizes both sides) + one
    * scan/write + a map-side-combining audit over the rewritten
    * files; the widened column costs only its own bytes. */
  val mergeSchemaEvolution: GQuery = GQuery(
    "merge_schema_evolution",
    """WITH merged AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CASE WHEN o_orderkey % 3 = 0
      |         THEN round(CAST(o_totalprice AS DECIMAL(18,2))
      |                    * CAST(1.1 AS DECIMAL(3,1)), 2)
      |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price,
      |    CASE WHEN o_orderkey % 3 = 0
      |         THEN CASE WHEN o_orderkey % 2 = 0 THEN 'online'
      |                   ELSE 'store' END
      |         ELSE NULL END AS channel
      |  FROM orders
      |  WHERE o_orderkey % 7 <> 0 OR o_orderkey % 3 = 0)
      |SELECT o_orderpriority, coalesce(channel, '(legacy)') AS channel,
      |  CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(round(sum(price), 2) AS DOUBLE) AS sum_price
      |FROM merged
      |GROUP BY 1, 2
      |ORDER BY o_orderpriority, channel""".stripMargin) { (s, dir) =>
    val snapPath = tmpDir("merge_schema_evo", dir)
    val orders = Tables.orders(s, dir).select(col("o_orderkey"),
      col("o_orderpriority"),
      col("o_totalprice").cast("decimal(18,2)").as("price"))
    // the v1 snapshot: no channel column exists yet
    val base = orders.filter(col("o_orderkey") % 7 =!= 0)
    // the update feed arrives WIDER: price bump + the new channel
    val updates = orders.filter(col("o_orderkey") % 3 === 0)
      .select(col("o_orderkey").as("u_key"),
        col("o_orderpriority").as("u_priority"),
        round(col("price") * lit(BigDecimal("1.1")).cast("decimal(3,1)"), 2)
          .as("u_price"),
        when(col("o_orderkey") % 2 === 0, "online").otherwise("store")
          .as("u_channel"))
    base.join(updates, col("o_orderkey") === col("u_key"), "full_outer")
      .select(
        coalesce(col("u_key"), col("o_orderkey")).as("o_orderkey"),
        coalesce(col("u_priority"), col("o_orderpriority"))
          .as("o_orderpriority"),
        coalesce(col("u_price"), col("price")).as("price"),
        col("u_channel").as("channel"))
      .write.mode("overwrite").parquet(snapPath)
    s.read.parquet(snapPath)
      .groupBy(col("o_orderpriority"),
        coalesce(col("channel"), lit("(legacy)")).as("channel"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("price")), 2).cast("double").as("sum_price"))
      .orderBy(col("o_orderpriority"), col("channel"))
  }

  /** Schema-evolution read — the other day-one reality of a
    * continuously-appended table (the [[sinkCompactSmallFiles]]
    * scenario over time): batch 1 is written before a column existed,
    * batch 2 after. `mergeSchema` unions the footer schemas at read
    * time, null-filling the missing column on old files — no rewrite
    * of historical data, which at 100 TB is the only affordable
    * answer to drift. Rows split by custkey parity (batch 1 even,
    * batch 2 odd — deterministic, SF-independent); pre-drift rows
    * surface under a sentinel segment so the aggregate proves the
    * null-fill. Oracle: UNION ALL with NULL padding over the parquet
    * customer table.
    *
    * Without `mergeSchema`, Spark serves the FIRST footer's schema
    * for the whole directory and the drifted column silently
    * disappears on half the files — LayoutSpec pins both behaviors. */
  val sourceSchemaDrift: GQuery = GQuery(
    "source_schema_drift",
    """WITH unioned AS (
      |  SELECT c_custkey, c_acctbal, NULL AS c_mktsegment
      |  FROM customer WHERE c_custkey % 2 = 0
      |  UNION ALL
      |  SELECT c_custkey, c_acctbal, c_mktsegment
      |  FROM customer WHERE c_custkey % 2 = 1)
      |SELECT coalesce(c_mktsegment, '__pre_drift__') AS segment,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS bal_sum
      |FROM unioned
      |GROUP BY 1
      |ORDER BY segment""".stripMargin) { (s, dir) =>
    val path = tmpDir("schema_drift", dir)
    val c = Tables.customer(s, dir)
    c.filter(col("c_custkey") % 2 === 0)
      .select(col("c_custkey"), col("c_acctbal"))
      .write.mode("overwrite").parquet(s"$path/batch1")
    c.filter(col("c_custkey") % 2 === 1)
      .select(col("c_custkey"), col("c_acctbal"), col("c_mktsegment"))
      .write.mode("overwrite").parquet(s"$path/batch2")
    s.read.option("mergeSchema", "true")
      .parquet(s"$path/batch1", s"$path/batch2")
      .groupBy(coalesce(col("c_mktsegment"), lit("__pre_drift__"))
        .as("segment"))
      .agg(count(lit(1)).as("n_rows"),
        sum(col("c_custkey")).as("key_sum"),
        round(sum(col("c_acctbal").cast("decimal(18,2)")), 2)
          .cast("double").as("bal_sum"))
      .orderBy(col("segment"))
  }

  /** Slowly-Changing-Dimension Type 2 merge — the history-preserving
    * sibling of [[mergeUpsertSnapshot]] (which overwrites in place).
    * A change batch against the customer dimension (segment moves for
    * keys % 4 == 0, brand-new keys derived from % 25 == 3) CLOSES the
    * matched current rows (valid_to stamped, is_current flips) and
    * appends a new current version; unmatched rows ride through
    * untouched. The snapshot is written hive-partitioned by
    * current/history state — the layout lever that makes the common
    * "current rows only" read prune the entire history at the
    * directory level, which is what makes SCD2 affordable when the
    * history is 100× the current set.
    *
    * Plan shape: two keyed equi-joins (base LEFT JOIN updates to
    * close/carry, updates LEFT JOIN base to version-stamp the new
    * rows) + UNION ALL. A change batch is small relative to the
    * dimension, so both joins broadcast the batch at scale — no
    * dimension shuffle at all. Validity stamps are plain strings
    * (hash discipline: no raw temporal columns cross the compare
    * boundary). */
  /** The SCD2 merge result as a frame — shared by [[mergeScd2]]
    * (which writes + rolls it up) and [[mergeScd2Asof]] (which
    * snapshots it at two logical dates). Semantics documented on
    * [[mergeScd2]].
    *
    * Brand-new keys are derived ABOVE max(c_custkey) — a fixed offset
    * collides with real keys once the dimension outgrows it (custkey
    * max is 150k*sf, so 1e6 broke at sf >= ~7); k + max(k) lands in
    * (max, 2*max], disjoint from the real key space at ANY scale
    * factor. The 1-row max broadcasts — no extra dimension shuffle. */
  private def scd2Frame(s: SparkSession, dir: String): DataFrame = {
    val dim = Tables.customer(s, dir).select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
      col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val maxK = dim.agg(max(col("k")).as("mxk"))
    val upd = dim.filter(col("k") % 4 === 0)
      .select(col("k").as("uk"), lit("SEG_MOVED").as("useg"),
        (col("bal") + 100).cast("decimal(12,2)").as("ubal"))
      .unionAll(dim.filter(col("k") % 25 === 3)
        .crossJoin(broadcast(maxK))
        .select((col("k") + col("mxk")).as("uk"), lit("SEG_NEW").as("useg"),
          lit(BigDecimal("100.00")).cast("decimal(12,2)").as("ubal")))
    val closedOrCarried = dim.join(upd, col("k") === col("uk"), "left")
      .select(col("k"), col("seg"), col("bal"),
        lit("2020-01-01").as("valid_from"),
        when(col("uk").isNotNull, lit("2023-06-15")).as("valid_to"),
        col("uk").isNull.as("is_current"), lit(1).as("version"))
    val newVersions = upd.join(dim, col("uk") === col("k"), "left")
      .select(col("uk").as("k"), col("useg").as("seg"),
        col("ubal").as("bal"), lit("2023-06-15").as("valid_from"),
        lit(null).cast("string").as("valid_to"),
        lit(true).as("is_current"),
        when(col("k").isNotNull, 2).otherwise(1).as("version"))
    closedOrCarried.unionAll(newVersions)
      .withColumn("state",
        when(col("is_current"), "current").otherwise("history"))
  }

  /** DuckDB CTE chain ending in `scd(k, seg, bal, valid_from,
    * valid_to, is_current, version)` — the oracle twin of
    * [[scd2Frame]], shared by the merge rollup and the as-of reads. */
  private val scd2OracleCte =
    """WITH dim AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |         CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |  FROM customer),
      |upd AS (
      |  SELECT k, 'SEG_MOVED' AS useg,
      |         CAST(bal + 100 AS DECIMAL(12,2)) AS ubal
      |  FROM dim WHERE k % 4 = 0
      |  UNION ALL
      |  SELECT k + (SELECT max(k) FROM dim), 'SEG_NEW',
      |         CAST(100.00 AS DECIMAL(12,2))
      |  FROM dim WHERE k % 25 = 3),
      |scd AS (
      |  SELECT d.k, d.seg, d.bal, '2020-01-01' AS valid_from,
      |         CASE WHEN u.k IS NOT NULL THEN '2023-06-15' END AS valid_to,
      |         u.k IS NULL AS is_current, 1 AS version
      |  FROM dim d LEFT JOIN upd u ON d.k = u.k
      |  UNION ALL
      |  SELECT u.k, u.useg, u.ubal, '2023-06-15', NULL, TRUE,
      |         CASE WHEN d.k IS NOT NULL THEN 2 ELSE 1 END
      |  FROM upd u LEFT JOIN dim d ON u.k = d.k)""".stripMargin

  val mergeScd2: GQuery = GQuery(
    "merge_scd2",
    s"""$scd2OracleCte
      |SELECT CASE WHEN is_current THEN 'current' ELSE 'history' END
      |         AS state,
      |  valid_from,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(count(DISTINCT k) AS BIGINT) AS n_keys,
      |  CAST(sum(k) AS BIGINT) AS key_sum,
      |  CAST(round(sum(bal), 2) AS DOUBLE) AS bal_sum,
      |  CAST(max(version) AS INT) AS max_version
      |FROM scd
      |GROUP BY 1, 2
      |ORDER BY state, valid_from""".stripMargin) { (s, dir) =>
    val path = tmpDir("merge_scd2", dir)
    scd2Frame(s, dir)
      .write.mode("overwrite").partitionBy("state").parquet(path)
    s.read.parquet(path)
      .groupBy(col("state"), col("valid_from"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("k")).as("n_keys"),
        sum(col("k")).as("key_sum"),
        round(sum(col("bal")), 2).cast("double").as("bal_sum"),
        max(col("version")).as("max_version"))
      .orderBy(col("state"), col("valid_from"))
  }

  /** Time-travel over the SCD2 history — the read side that justifies
    * keeping history at all: the dimension AS OF a past logical date
    * (validity-interval predicate: valid_from <= d < valid_to) next
    * to the CURRENT view, as one per-segment rollup. The current view
    * reads `state = 'current'` — on the state-partitioned layout that
    * predicate prunes the entire history at the directory level, so
    * the common "latest snapshot" query costs the same as a plain
    * dimension read no matter how deep the history grows; the as-of
    * read scans both partitions but filters on the (pushed) validity
    * stamps. ISO date strings compare lexicographically, so the
    * interval predicate is engine-portable with no temporal types
    * crossing the compare boundary.
    *
    * Scale posture: one write of the merged dimension (the same
    * two-broadcast-join merge as merge_scd2), then two partition-
    * aware scans + map-side-combining rollups on the tiny segment
    * grid. The partition prune is spec-pinned in
    * LayoutAnalyticsSpec. */
  val mergeScd2Asof: GQuery = GQuery(
    "merge_scd2_asof",
    s"""$scd2OracleCte
      |SELECT 'current' AS snap, seg,
      |  CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(sum(k) AS BIGINT) AS key_sum,
      |  CAST(round(sum(bal), 2) AS DOUBLE) AS bal_sum
      |FROM scd WHERE is_current
      |GROUP BY seg
      |UNION ALL
      |SELECT 'asof_2021-06-01' AS snap, seg,
      |  CAST(count(*) AS BIGINT), CAST(sum(k) AS BIGINT),
      |  CAST(round(sum(bal), 2) AS DOUBLE)
      |FROM scd
      |WHERE valid_from <= '2021-06-01'
      |  AND (valid_to IS NULL OR valid_to > '2021-06-01')
      |GROUP BY seg
      |ORDER BY snap, seg""".stripMargin) { (s, dir) =>
    val path = tmpDir("scd2_asof", dir)
    scd2Frame(s, dir)
      .write.mode("overwrite").partitionBy("state").parquet(path)
    val scd = s.read.parquet(path)
    def rollup(df: DataFrame, snap: String): DataFrame =
      df.groupBy(lit(snap).as("snap"), col("seg"))
        .agg(count(lit(1)).as("n_rows"), sum(col("k")).as("key_sum"),
          round(sum(col("bal")), 2).cast("double").as("bal_sum"))
    val current = rollup(scd.filter(col("state") === "current"), "current")
    val asof = rollup(scd.filter(col("valid_from") <= "2021-06-01")
        .filter(col("valid_to").isNull || col("valid_to") > "2021-06-01"),
      "asof_2021-06-01")
    current.unionAll(asof).orderBy(col("snap"), col("seg"))
  }

  /** CDC APPLY — the third merge semantic next to
    * [[mergeUpsertSnapshot]] (overwrite) and [[mergeScd2]] (history):
    * a change FEED carrying I/U/D operations at multiple versions is
    * applied latest-version-wins per key, deletes drop rows, inserts
    * add brand-new keys, and a later U resurrects an earlier D (the
    * upsert contract Debezium/lakehouse MERGE pipelines assume). The
    * feed is derived deterministically from the dimension itself (one
    * op per (key, version) by construction, so the version-desc
    * window has no ties); inserts key above max(k) — the
    * [[mergeScd2]] collision-free discipline. Reported as the final
    * state's per-segment rollup with a from-feed count.
    *
    * Scale posture: latest-wins is one keyed window over the FEED
    * (change batches are small next to the table); the apply is an
    * anti-join + union — both keyed on the primary key, AQE
    * broadcasts the feed side at runtime. No full-table window, no
    * unkeyed shuffle. */
  val mergeCdcApply: GQuery = GQuery(
    "merge_cdc_apply",
    """WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg,
      |               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |             FROM customer),
      |feed AS (
      |  SELECT k AS ck, seg AS cseg,
      |    CASE WHEN k % 17 = 3 THEN 'D' ELSE 'U' END AS op,
      |    CAST(bal + 50 AS DECIMAL(12,2)) AS cbal, 1 AS version
      |  FROM dim WHERE k % 10 = 0 OR k % 17 = 3
      |  UNION ALL
      |  SELECT k, seg, CASE WHEN k % 23 = 5 THEN 'D' ELSE 'U' END,
      |    CAST(bal + 100 AS DECIMAL(12,2)), 2
      |  FROM dim WHERE k % 20 = 0 OR k % 23 = 5
      |  UNION ALL
      |  SELECT k + (SELECT max(k) FROM dim), 'SEG_CDC', 'I',
      |    CAST(100.00 AS DECIMAL(12,2)), 2
      |  FROM dim WHERE k % 25 = 3),
      |latest AS (
      |  SELECT ck, cseg, op, cbal FROM (
      |    SELECT ck, cseg, op, cbal,
      |      row_number() OVER (PARTITION BY ck ORDER BY version DESC)
      |        AS rn
      |    FROM feed)
      |  WHERE rn = 1),
      |fin AS (
      |  SELECT d.k, d.seg, d.bal, FALSE AS from_feed FROM dim d
      |  WHERE NOT EXISTS (SELECT 1 FROM latest l WHERE l.ck = d.k)
      |  UNION ALL
      |  SELECT ck, cseg, cbal, TRUE FROM latest WHERE op <> 'D')
      |SELECT seg, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(round(sum(bal), 2) AS DOUBLE) AS sum_bal,
      |  CAST(sum(CASE WHEN from_feed THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_changed
      |FROM fin GROUP BY seg
      |ORDER BY seg""".stripMargin) { (s, dir) =>
    val dim = Tables.customer(s, dir).select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
      col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val maxK = dim.agg(max(col("k")).as("mxk"))
    val v1 = dim.filter(col("k") % 10 === 0 || col("k") % 17 === 3)
      .select(col("k").as("ck"), col("seg").as("cseg"),
        when(col("k") % 17 === 3, "D").otherwise("U").as("op"),
        (col("bal") + 50).cast("decimal(12,2)").as("cbal"),
        lit(1L).as("version"))
    val v2 = dim.filter(col("k") % 20 === 0 || col("k") % 23 === 5)
      .select(col("k").as("ck"), col("seg").as("cseg"),
        when(col("k") % 23 === 5, "D").otherwise("U").as("op"),
        (col("bal") + 100).cast("decimal(12,2)").as("cbal"),
        lit(2L).as("version"))
    val ins = dim.filter(col("k") % 25 === 3)
      .crossJoin(broadcast(maxK))
      .select((col("k") + col("mxk")).as("ck"),
        lit("SEG_CDC").as("cseg"), lit("I").as("op"),
        lit(BigDecimal("100.00")).cast("decimal(12,2)").as("cbal"),
        lit(2L).as("version"))
    val latest = v1.unionAll(v2).unionAll(ins)
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("ck")).orderBy(col("version").desc)))
      .filter(col("rn") === 1)
    val untouched = dim
      .join(latest.select(col("ck")), col("k") === col("ck"), "left_anti")
      .select(col("k"), col("seg"), col("bal"),
        lit(false).as("from_feed"))
    val applied = latest.filter(col("op") =!= "D")
      .select(col("ck").as("k"), col("cseg").as("seg"),
        col("cbal").as("bal"), lit(true).as("from_feed"))
    untouched.unionAll(applied)
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("bal")), 2).cast("double").as("sum_bal"),
        sum(when(col("from_feed"), 1L).otherwise(0L)).as("n_changed"))
      .orderBy(col("seg"))
  }

  /** DELETE-LIST apply — the right-to-be-forgotten / takedown rewrite
    * every governed data platform must run: a small list of subject
    * keys (here a deterministic ~5% hash slice of customers standing
    * in for the erasure-request table) is anti-joined against the
    * fact table and the SURVIVORS are rewritten as the new snapshot;
    * the report re-reads the published snapshot (proving the deletes
    * are IN THE FILES, not just in a view) and emits per-priority
    * counts + price totals plus the total purged-row count.
    *
    * Scale shape: a key-equi LEFT ANTI join, un-hinted — real erasure
    * lists are thousands of keys against billions of rows and AQE
    * promotes them to a broadcast anti join from runtime stats (the
    * canonical plan), but this fixture's list is a ~5% hash slice of
    * customers, which SCALES with SF and so may not carry an
    * unconditional hint under the fleet broadcast policy. The rewrite
    * is one scan + write; the audit aggregate runs on the rewritten
    * files; the purge count rides a 1-row broadcast scalar. At 100 TB
    * this is the copy-on-write MERGE DELETE path of any lakehouse
    * table format, expressed directly. */
  val mergeDeleteApply: GQuery = GQuery(
    "merge_delete_apply",
    s"""WITH del AS (SELECT c_custkey FROM customer
       |  WHERE ${duckHashL("concat('gdpr:', CAST(c_custkey AS VARCHAR))")}
       |        % 20 = 0),
       |kept AS (SELECT * FROM orders
       |         WHERE o_custkey NOT IN (SELECT c_custkey FROM del)),
       |purged AS (SELECT CAST((SELECT count(*) FROM orders)
       |                  - (SELECT count(*) FROM kept) AS BIGINT) AS n)
       |SELECT o_orderpriority,
       |  CAST(count(*) AS BIGINT) AS n_orders,
       |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2)
       |    AS DOUBLE) AS sum_price,
       |  (SELECT n FROM purged) AS n_purged
       |FROM kept
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val snapPath = tmpDir("gdpr_snapshot", dir)
    val orders = Tables.orders(s, dir)
    val delList = Tables.customer(s, dir)
      .filter(pmod(graft.api.Sampling.portableHash(col("c_custkey"), "gdpr:"),
        lit(20L)) === lit(0L))
      .select(col("c_custkey"))
    orders.join(delList,
        col("o_custkey") === col("c_custkey"), "left_anti")
      .write.mode("overwrite").parquet(snapPath)
    val kept = s.read.parquet(snapPath)
    val purged = broadcast(orders.agg(count(lit(1)).as("n_orig"))
      .crossJoin(kept.agg(count(lit(1)).as("n_kept")))
      .select((col("n_orig") - col("n_kept")).cast("bigint")
        .as("n_purged")))
    kept.groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice").cast("decimal(18,2)")), 2)
          .cast("double").as("sum_price"))
      .crossJoin(purged)
      .orderBy(col("o_orderpriority"))
  }

  /** DYNAMIC PARTITION OVERWRITE — the lakehouse "restate a few
    * partitions" op (Hive/Delta `INSERT OVERWRITE ... PARTITION`
    * semantics, Spark's partitionOverwriteMode=dynamic): a
    * month-partitioned orders snapshot receives a restatement batch
    * covering ONLY three months (prices uplifted 10% on the exact
    * decimal grid); the write replaces exactly the partitions
    * present in the patch — untouched months keep their original
    * files byte-for-byte (spec-pinned in LayoutAnalyticsSpec via
    * file listings). The readback aggregate proves patched months
    * carry restated totals and all others the originals.
    *
    * Scale shape: the patch write shuffles only patch-month rows;
    * untouched partitions involve zero I/O — the whole point of the
    * op at 100 TB (a 3-month restatement over a 7-year table touches
    * 3/84ths of the data). The readback is a plain partitioned scan
    * with map-side-combining aggregation. */
  val mergePartitionOverwrite: GQuery = GQuery(
    "merge_partition_overwrite",
    """WITH base AS (
      |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS om,
      |    CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS price
      |  FROM orders),
      |restated AS (
      |  SELECT om,
      |    CASE WHEN om IN ('1998-01', '1998-02', '1998-03')
      |      THEN CAST(round(price * CAST(1.10 AS DECIMAL(4,2)), 2)
      |           AS DECIMAL(18,2))
      |      ELSE price END AS price
      |  FROM base)
      |SELECT om, CAST(count(*) AS BIGINT) AS n_orders,
      |  CAST(round(sum(price), 2) AS DOUBLE) AS sum_price
      |FROM restated
      |GROUP BY om
      |ORDER BY om""".stripMargin) { (s, dir) =>
    val path = tmpDir("dyn_overwrite", dir)
    val base = Tables.orders(s, dir)
      .select(date_format(date_trunc("month", col("o_orderdate")), "yyyy-MM")
          .as("om"),
        col("o_orderkey"),
        round(col("o_totalprice"), 2).cast("decimal(18,2)").as("price"))
    base.write.mode("overwrite").partitionBy("om").parquet(path)
    val patch = base
      .filter(col("om").isin("1998-01", "1998-02", "1998-03"))
      .select(col("om"), col("o_orderkey"),
        round(col("price") * lit("1.10").cast("decimal(4,2)"), 2)
          .cast("decimal(18,2)").as("price"))
    patch.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("om").parquet(path)
    s.read.parquet(path)
      .groupBy(col("om"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("price")), 2).cast("double").as("sum_price"))
      .orderBy(col("om"))
  }

  /** SNAPSHOT DIFF / reconciliation — given two keyed snapshots of
    * the same table, emit every key whose row was ADDED, REMOVED, or
    * CHANGED (unchanged rows are suppressed — at 100 TB they are the
    * overwhelming majority and nobody wants them). This is the data-
    * validation twin of merge_upsert_snapshot: merge APPLIES a delta,
    * diff RECOVERS one — the check you run after a migration,
    * backfill, or vendor re-delivery.
    *
    * Snapshots are carved deterministically from orders (old drops
    * keys ≡3 mod 7; new drops keys ≡2 mod 5 and shifts the price of
    * keys ≡0 mod 11 by +100.00 on the DECIMAL(18,2) grid — addition,
    * so exact on both engines).
    *
    * Scale shape: ONE full-outer sort-merge join on the primary key
    * (both snapshots shuffle exactly once, co-partitioned), status is
    * a per-row projection, and the unchanged majority is filtered
    * BEFORE the sink — output is proportional to the drift, not the
    * table. */
  val mergeSnapshotDiff: GQuery = GQuery(
    "merge_snapshot_diff",
    """WITH base AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice, 2) AS DECIMAL(18,2)) AS price
      |  FROM orders),
      |old AS (SELECT * FROM base WHERE k % 7 <> 3),
      |new AS (
      |  SELECT k, CASE WHEN k % 11 = 0
      |    THEN price + CAST(100.00 AS DECIMAL(18,2)) ELSE price END
      |    AS price
      |  FROM base WHERE k % 5 <> 2)
      |SELECT coalesce(old.k, new.k) AS o_orderkey,
      |  CASE WHEN old.k IS NULL THEN 'added'
      |       WHEN new.k IS NULL THEN 'removed'
      |       ELSE 'changed' END AS status,
      |  CAST(old.price AS DOUBLE) AS old_price,
      |  CAST(new.price AS DOUBLE) AS new_price
      |FROM old FULL OUTER JOIN new ON old.k = new.k
      |WHERE old.k IS NULL OR new.k IS NULL OR old.price <> new.price
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    val base = Tables.orders(s, dir).select(
      col("o_orderkey").as("k"),
      round(col("o_totalprice"), 2).cast("decimal(18,2)").as("price"))
    val old = base.filter(col("k") % 7 =!= 3)
      .select(col("k").as("ok"), col("price").as("old_price"))
    val nw = base.filter(col("k") % 5 =!= 2)
      .select(col("k").as("nk"),
        when(col("k") % 11 === 0,
          col("price") + lit(BigDecimal("100.00")).cast("decimal(18,2)"))
          .otherwise(col("price")).as("new_price"))
    old.join(nw, col("ok") === col("nk"), "full_outer")
      .filter(col("ok").isNull || col("nk").isNull ||
        col("old_price") =!= col("new_price"))
      .select(coalesce(col("ok"), col("nk")).as("o_orderkey"),
        when(col("ok").isNull, "added")
          .when(col("nk").isNull, "removed")
          .otherwise("changed").as("status"),
        col("old_price").cast("double").as("old_price"),
        col("new_price").cast("double").as("new_price"))
      .orderBy(col("o_orderkey"))
  }

  /** INCREMENTAL AGGREGATE MAINTENANCE — the nightly-ETL contract:
    * a materialized monthly rollup (the "base", everything before a
    * data-driven cutoff: the last 90 days of orders are the
    * late-arriving batch) is brought current by aggregating ONLY the
    * delta and merging it in with a keyed full-outer coalesce —
    * never re-scanning history. Provably ≡ the full recompute,
    * because count/sum are commutative monoids and the DECIMAL(18,2)
    * totals make the merge order-free; the `updated` flag marks
    * months the delta touched (the downstream-invalidation signal).
    *
    * Scale shape: at 100 TB the base is a saved table read once and
    * the delta aggregate is sized by the batch, not by history; both
    * sides collapse to ≤ |months| rows BEFORE the merge join, so the
    * full-outer join is over bounded aggregates. The cutoff is a
    * 1-row broadcast scalar. */
  val mergeIncrementalAgg: GQuery = GQuery(
    "merge_incremental_agg",
    """WITH cut AS (SELECT max(o_orderdate) - INTERVAL 90 DAY AS c
      |             FROM orders),
      |base AS (
      |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
      |    count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
      |  FROM orders, cut WHERE o_orderdate < cut.c GROUP BY 1),
      |delta AS (
      |  SELECT strftime(date_trunc('month', o_orderdate), '%Y-%m') AS mon,
      |    count(*) AS n, sum(CAST(o_totalprice AS DECIMAL(18,2))) AS tot
      |  FROM orders, cut WHERE o_orderdate >= cut.c GROUP BY 1)
      |SELECT coalesce(b.mon, d.mon) AS mon,
      |  CAST(coalesce(b.n, 0) + coalesce(d.n, 0) AS BIGINT) AS n_orders,
      |  round(CAST(coalesce(b.tot, 0) + coalesce(d.tot, 0) AS DOUBLE), 2)
      |    AS total,
      |  d.mon IS NOT NULL AS updated
      |FROM base b FULL OUTER JOIN delta d ON b.mon = d.mon
      |ORDER BY mon""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val cut = o.agg((max(col("o_orderdate"))
      - expr("INTERVAL 90 DAY")).as("c"))
    val withCut = o.crossJoin(broadcast(cut))
    def rollup(df: DataFrame): DataFrame = df
      .groupBy(date_format(date_trunc("month", col("o_orderdate")),
        "yyyy-MM").as("mon"))
      .agg(count(lit(1)).as("n"),
        sum(col("o_totalprice").cast("decimal(18,2)")).as("tot"))
    val base = rollup(withCut.filter(col("o_orderdate") < col("c")))
      .select(col("mon").as("bmon"), col("n").as("bn"),
        col("tot").as("btot"))
    val delta = rollup(withCut.filter(col("o_orderdate") >= col("c")))
      .select(col("mon").as("dmon"), col("n").as("dn"),
        col("tot").as("dtot"))
    base.join(delta, col("bmon") === col("dmon"), "full_outer")
      .select(coalesce(col("bmon"), col("dmon")).as("mon"),
        (coalesce(col("bn"), lit(0L)) + coalesce(col("dn"), lit(0L)))
          .cast("long").as("n_orders"),
        round(coalesce(col("btot"), lit(0).cast("decimal(18,2)"))
          + coalesce(col("dtot"), lit(0).cast("decimal(18,2)")), 2)
          .cast("double").as("total"),
        col("dmon").isNotNull.as("updated"))
      .orderBy(col("mon"))
  }

  /** EXACTLY-ONCE SINK AUDIT for the streaming CDC path (round-14
    * VERDICT item 7): the merge_cdc_apply feed is driven through the
    * REAL idempotent sink (graft.streaming.MergeStreams.applyCdcBatch
    * — versioned keyed merge + crash-safe rename-aside publish onto
    * on-disk parquet state) under AT-LEAST-ONCE delivery: every batch
    * is applied twice, and batch 1 is replayed AGAIN after batch 2
    * has landed (the restarted-stream-from-an-old-checkpoint
    * scenario). The audit reads the final published state FILES and
    * rolls them up per segment; the oracle states the ONCE-delivered
    * semantics (latest version per key, deletes dropped) — the row is
    * green iff duplicate delivery changed NOTHING, i.e. the
    * version-ordered merge turns at-least-once delivery into
    * exactly-once state at the sink boundary. The state dir is
    * rebuilt from empty each run (deterministic bytes under a
    * deterministic /tmp path, the layout-family discipline).
    *
    * Scale shape: each apply is one keyed full-outer merge of state ×
    * batch + one state rewrite (the table-format MERGE core); the
    * audit is a map-side-combining aggregate over the state files. */
  val mergeCdcExactlyOnce: GQuery = GQuery(
    "merge_cdc_exactly_once",
    """WITH dim AS (SELECT c_custkey AS k, c_mktsegment AS seg,
      |               CAST(c_acctbal AS DECIMAL(12,2)) AS bal
      |             FROM customer),
      |feed AS (
      |  SELECT k AS ck, seg AS cseg,
      |    CASE WHEN k % 17 = 3 THEN 'D' ELSE 'U' END AS op,
      |    CAST(bal + 50 AS DECIMAL(12,2)) AS cbal, 1 AS version
      |  FROM dim WHERE k % 10 = 0 OR k % 17 = 3
      |  UNION ALL
      |  SELECT k, seg, CASE WHEN k % 23 = 5 THEN 'D' ELSE 'U' END,
      |    CAST(bal + 100 AS DECIMAL(12,2)), 2
      |  FROM dim WHERE k % 20 = 0 OR k % 23 = 5
      |  UNION ALL
      |  SELECT k + (SELECT max(k) FROM dim), 'SEG_CDC', 'I',
      |    CAST(100.00 AS DECIMAL(12,2)), 2
      |  FROM dim WHERE k % 25 = 3),
      |latest AS (
      |  SELECT ck, cseg, op, cbal FROM (
      |    SELECT ck, cseg, op, cbal,
      |      row_number() OVER (PARTITION BY ck ORDER BY version DESC)
      |        AS rn
      |    FROM feed)
      |  WHERE rn = 1)
      |SELECT cseg AS seg, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(round(sum(cbal), 2) AS DOUBLE) AS sum_bal
      |FROM latest WHERE op <> 'D'
      |GROUP BY cseg
      |ORDER BY seg""".stripMargin) { (s, dir) =>
    val dim = Tables.customer(s, dir).select(
      col("c_custkey").as("k"), col("c_mktsegment").as("seg"),
      col("c_acctbal").cast("decimal(12,2)").as("bal"))
    val maxK = dim.agg(max(col("k")).as("mxk"))
    val b1 = dim.filter(col("k") % 10 === 0 || col("k") % 17 === 3)
      .select(col("k"), col("seg"),
        (col("bal") + 50).cast("decimal(12,2)").as("bal"),
        when(col("k") % 17 === 3, "D").otherwise("U").as("op"),
        lit(1L).as("version"))
    val b2 = dim.filter(col("k") % 20 === 0 || col("k") % 23 === 5)
      .select(col("k"), col("seg"),
        (col("bal") + 100).cast("decimal(12,2)").as("bal"),
        when(col("k") % 23 === 5, "D").otherwise("U").as("op"),
        lit(2L).as("version"))
      .unionAll(dim.filter(col("k") % 25 === 3)
        .crossJoin(broadcast(maxK))
        .select((col("k") + col("mxk")).as("k"),
          lit("SEG_CDC").as("seg"),
          lit(BigDecimal("100.00")).cast("decimal(12,2)").as("bal"),
          lit("I").as("op"), lit(2L).as("version")))
    val statePath = tmpDir("cdc_exactly_once", dir)
    // fresh state each run: the audit certifies THIS replay sequence
    Seq("", "_tmp", "_old").foreach { sfx =>
      def rm(f: java.io.File): Unit = {
        val cs = f.listFiles(); if (cs != null) cs.foreach(rm)
        f.delete(); ()
      }
      rm(new java.io.File(statePath + sfx))
    }
    import graft.streaming.MergeStreams
    // at-least-once delivery: every batch twice, plus batch 1 again
    // AFTER batch 2 (stale-checkpoint restart)
    MergeStreams.applyCdcBatch(b1, statePath)
    MergeStreams.applyCdcBatch(b1, statePath)
    MergeStreams.applyCdcBatch(b2, statePath)
    MergeStreams.applyCdcBatch(b1, statePath)
    MergeStreams.applyCdcBatch(b2, statePath)
    s.read.parquet(statePath)
      .filter(!col("deleted"))
      .groupBy(col("seg"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("bal")), 2).cast("double").as("sum_bal"))
      .orderBy(col("seg"))
  }

  /** TIME-TRAVEL READ over the minimal snapshot/manifest table format
    * ([[graft.sources.SnapshotTable]] — round-14 VERDICT "what's
    * missing" item 1): v1 = the base orders state, v2 = the upsert
    * merge of merge_upsert_snapshot committed AS A SNAPSHOT, and the
    * query reads BOTH versions back through the manifest log —
    * reconstructing the pre-merge state from v1 (which the bare-
    * parquet merge family overwrites and loses) and auditing the
    * merge as a per-priority v1-vs-v2 delta. The oracle replays both
    * states relationally over the base fixture, so the row is green
    * iff the manifest log's versioned file sets round-trip BOTH
    * states losslessly.
    *
    * The two-snapshot table is built once per corpus generation under
    * an IndexStore stamp (build both commits into the temp dir, one
    * atomic publish) — re-runs are pure manifest reads, and a
    * regenerated fixture restamps. Snapshot ISOLATION (a reader
    * holding v1 is never disturbed by a concurrent commit, a crashed
    * commit is invisible) is spec-pinned in SnapshotTableSpec on live
    * commits rather than asserted here.
    *
    * Scale shape: each snapshot read = one manifest (O(files) text) +
    * a parquet scan of exactly the listed files; the audit is two
    * map-side-combining aggregates and a 5-row join. */
  val mergeTimeTravel: GQuery = GQuery(
    "merge_time_travel",
    """WITH base AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders WHERE o_orderkey % 7 <> 0),
      |merged AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CASE WHEN o_orderkey % 3 = 0
      |         THEN round(CAST(o_totalprice AS DECIMAL(18,2))
      |                    * CAST(1.1 AS DECIMAL(3,1)), 2)
      |         ELSE CAST(o_totalprice AS DECIMAL(18,2)) END AS price
      |  FROM orders
      |  WHERE o_orderkey % 7 <> 0 OR o_orderkey % 3 = 0),
      |v1 AS (SELECT o_orderpriority, count(*) AS n, sum(price) AS s
      |       FROM base GROUP BY 1),
      |v2 AS (SELECT o_orderpriority, count(*) AS n, sum(price) AS s
      |       FROM merged GROUP BY 1)
      |SELECT o_orderpriority,
      |  CAST(v1.n AS BIGINT) AS n_v1, CAST(v2.n AS BIGINT) AS n_v2,
      |  CAST(round(v1.s, 2) AS DOUBLE) AS sum_price_v1,
      |  CAST(round(v2.s, 2) AS DOUBLE) AS sum_price_v2,
      |  CAST(round(v2.s - v1.s, 2) AS DOUBLE) AS price_delta
      |FROM v1 JOIN v2 USING (o_orderpriority)
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    import graft.sources.SnapshotTable
    val tableDir = graft.IndexStore.ensure(graft.IndexStore.stampedPath(
        "snap_orders_v2", dir, "orders.parquet")) { tmp =>
      val orders = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      val base = orders.filter(col("o_orderkey") % 7 =!= 0)
      SnapshotTable.commit(base, tmp) // v1: pre-merge state
      val updates = orders.filter(col("o_orderkey") % 3 === 0)
        .select(col("o_orderkey").as("u_key"),
          col("o_orderpriority").as("u_priority"),
          round(col("price")
            * lit(BigDecimal("1.1")).cast("decimal(3,1)"), 2)
            .as("u_price"))
      val merged = base
        .join(updates, col("o_orderkey") === col("u_key"), "full_outer")
        .select(
          coalesce(col("u_key"), col("o_orderkey")).as("o_orderkey"),
          coalesce(col("u_priority"), col("o_orderpriority"))
            .as("o_orderpriority"),
          coalesce(col("u_price"), col("price")).as("price"))
      SnapshotTable.commit(merged, tmp) // v2: post-merge state
    }
    def audit(v: Int, nCol: String, sCol: String): DataFrame =
      SnapshotTable.read(s, tableDir, v)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as(nCol),
          sum(col("price")).as(sCol))
    audit(1, "n_v1", "s1").join(audit(2, "n_v2", "s2"),
        Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n_v1"), col("n_v2"),
        round(col("s1"), 2).cast("double").as("sum_price_v1"),
        round(col("s2"), 2).cast("double").as("sum_price_v2"),
        round(col("s2") - col("s1"), 2).cast("double").as("price_delta"))
      .orderBy(col("o_orderpriority"))
  }

  /** CHANGE-DATA-FEED read over the snapshot/manifest table format —
    * the incremental-consumption contract [[graft.sources
    * .SnapshotTable.changes]] provides: orders are ingested as an
    * append-log history (v1 = CoW base commit of keys ≡0 mod 3, v2 /
    * v3 = appends of keys ≡1 / ≡2), and the feed for each version is
    * recovered purely from the MANIFEST file-set difference — no
    * row-level diff, no base scan, O(appended bytes) per consumed
    * version (the Delta/Iceberg CDF mechanism for append-only
    * tables; across a CoW rewrite the row-accurate delta is
    * merge_snapshot_diff's relational job instead, documented on the
    * API). The oracle replays the batch carvings relationally, so
    * the row is green iff every appended file set round-trips its
    * batch exactly — nothing leaked from the base, nothing lost.
    *
    * The three-version table is built once per corpus generation
    * under an IndexStore stamp; re-runs are two manifest reads plus
    * parquet scans of only the appended files. Scale shape: the
    * whole query never touches v1's data — the audit aggregates are
    * map-side-combining over just the delta files. */
  val mergeChangeFeed: GQuery = GQuery(
    "merge_change_feed",
    """WITH b AS (
      |  SELECT o_orderkey % 3 AS bat, o_orderkey,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders)
      |SELECT CAST(bat + 1 AS INT) AS version,
      |  CAST(count(*) AS BIGINT) AS n_appended,
      |  CAST(min(o_orderkey) AS BIGINT) AS min_key,
      |  CAST(max(o_orderkey) AS BIGINT) AS max_key,
      |  CAST(round(sum(price), 2) AS DOUBLE) AS sum_price
      |FROM b WHERE bat >= 1
      |GROUP BY bat
      |ORDER BY version""".stripMargin) { (s, dir) =>
    import graft.sources.SnapshotTable
    val tableDir = graft.IndexStore.ensure(graft.IndexStore.stampedPath(
        "snap_orders_feed", dir, "orders.parquet")) { tmp =>
      val orders = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      SnapshotTable.commit(
        orders.filter(col("o_orderkey") % 3 === 0), tmp) // v1: base
      SnapshotTable.append(
        orders.filter(col("o_orderkey") % 3 === 1), tmp) // v2
      SnapshotTable.append(
        orders.filter(col("o_orderkey") % 3 === 2), tmp) // v3
      ()
    }
    (2 to 3).map { v =>
      SnapshotTable.changes(s, tableDir, v - 1, v)
        .select(lit(v).as("version"), col("o_orderkey"), col("price"))
    }.reduce(_ unionByName _)
      .groupBy(col("version"))
      .agg(count(lit(1)).cast("bigint").as("n_appended"),
        min(col("o_orderkey")).cast("bigint").as("min_key"),
        max(col("o_orderkey")).cast("bigint").as("max_key"),
        round(sum(col("price")), 2).cast("double").as("sum_price"))
      .select(col("version").cast("int").as("version"),
        col("n_appended"), col("min_key"), col("max_key"),
        col("sum_price"))
      .orderBy(col("version"))
  }

  /** MERGE-ON-READ row-level DELETE over the snapshot table — the
    * other half of the delete story ([[mergeDeleteApply]] is the
    * copy-on-write half, rewriting the surviving rows): `SnapshotTable
    * .delete` commits a DELETE FILE (just the keys, '-'-listed in the
    * manifest) and never touches the base data files; every read
    * applies the delete files as anti-joins at scan time, and the
    * deferred cost is folded away by the next compaction (the
    * MoR→CoW handoff Iceberg/Delta schedule). History: v1 = base
    * orders, v2 = MoR delete of keys ≡2 mod 7, v3 = append of
    * shifted-key rows carved from keys ≡4 mod 9 — the audit reads
    * all three snapshots back through the log (delete lines carry
    * through the append untouched), so the row is green iff deletes
    * apply to exactly the keyed rows at every version ≥ v2 and prior
    * versions still see them (snapshot isolation across a delete).
    *
    * Scale shape: the delete writes O(keys) bytes and reads nothing;
    * each audit read is a manifest + listed-file scan + ONE keyed
    * anti-join; aggregates are map-side-combining. At 100 TB this is
    * the only delete a GDPR pipeline can afford on the hot path —
    * the rewrite happens once, inside compaction, off the query
    * path. */
  val mergeMorDelete: GQuery = GQuery(
    "merge_mor_delete",
    """WITH base AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(o_totalprice AS DECIMAL(18,2)) AS price
      |  FROM orders),
      |mx AS (SELECT max(o_orderkey) AS mxk FROM base),
      |v2 AS (SELECT * FROM base WHERE o_orderkey % 7 <> 2),
      |app AS (
      |  SELECT o_orderkey + mxk AS o_orderkey, o_orderpriority, price
      |  FROM base, mx WHERE o_orderkey % 9 = 4),
      |v3 AS (SELECT * FROM v2 UNION ALL SELECT * FROM app),
      |a1 AS (SELECT o_orderpriority, count(*) AS n1, sum(price) AS s1
      |       FROM base GROUP BY 1),
      |a2 AS (SELECT o_orderpriority, count(*) AS n2, sum(price) AS s2
      |       FROM v2 GROUP BY 1),
      |a3 AS (SELECT o_orderpriority, count(*) AS n3, sum(price) AS s3
      |       FROM v3 GROUP BY 1)
      |SELECT a1.o_orderpriority,
      |  CAST(n1 AS BIGINT) AS n_v1, CAST(n2 AS BIGINT) AS n_v2,
      |  CAST(n3 AS BIGINT) AS n_v3,
      |  CAST(round(s1, 2) AS DOUBLE) AS sum_v1,
      |  CAST(round(s2, 2) AS DOUBLE) AS sum_v2,
      |  CAST(round(s3, 2) AS DOUBLE) AS sum_v3
      |FROM a1
      |JOIN a2 ON a1.o_orderpriority = a2.o_orderpriority
      |JOIN a3 ON a1.o_orderpriority = a3.o_orderpriority
      |ORDER BY a1.o_orderpriority""".stripMargin) { (s, dir) =>
    import graft.sources.SnapshotTable
    val tableDir = graft.IndexStore.ensure(graft.IndexStore.stampedPath(
        "snap_orders_mor", dir, "orders.parquet")) { tmp =>
      val base = Tables.orders(s, dir).select(col("o_orderkey"),
        col("o_orderpriority"),
        col("o_totalprice").cast("decimal(18,2)").as("price"))
      val mxk = base.agg(max(col("o_orderkey")).as("mxk"))
      SnapshotTable.commit(base, tmp)                       // v1
      SnapshotTable.delete(
        base.filter(col("o_orderkey") % 7 === 2)
          .select(col("o_orderkey")), tmp)                  // v2 (MoR)
      SnapshotTable.append(
        base.filter(col("o_orderkey") % 9 === 4)
          .crossJoin(broadcast(mxk))
          .select((col("o_orderkey") + col("mxk")).as("o_orderkey"),
            col("o_orderpriority"), col("price")), tmp)     // v3
      ()
    }
    def audit(v: Int, n: String, sm: String): DataFrame =
      SnapshotTable.read(s, tableDir, v)
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).cast("bigint").as(n),
          round(sum(col("price")), 2).cast("double").as(sm))
    audit(1, "n_v1", "sum_v1")
      .join(audit(2, "n_v2", "sum_v2"), Seq("o_orderpriority"))
      .join(audit(3, "n_v3", "sum_v3"), Seq("o_orderpriority"))
      .select(col("o_orderpriority"), col("n_v1"), col("n_v2"),
        col("n_v3"), col("sum_v1"), col("sum_v2"), col("sum_v3"))
      .orderBy(col("o_orderpriority"))
  }

  val all: Seq[GQuery] = Seq(
    sinkPartitionedPrune, joinBucketedColocated, sourceTextScan,
    sinkZorderCluster, joinPartitionPrunedRuntime, sinkCompactSmallFiles,
    mergeUpsertSnapshot, sourceSchemaDrift, mergeScd2, mergeCdcApply,
    mergeDeleteApply, mergePartitionOverwrite, mergeScd2Asof,
    mergeSnapshotDiff, mergeIncrementalAgg, mergeSchemaEvolution,
    mergeTimeTravel, mergeCdcExactlyOnce, mergeChangeFeed,
    mergeMorDelete)
}
