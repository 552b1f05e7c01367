package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.GQuery
import graft.sources.Tables

/** CSV / JSON source coverage as CONTRACT queries (SURVEY.md §2.1):
  * each query derives a text-format copy of a fixture table inside the
  * query fn (deterministic bytes under a deterministic path), reads it
  * back through the corresponding Spark source with an explicit
  * schema, and aggregates. The DuckDB oracle runs the same relational
  * derivation straight over the parquet table — the results agree iff
  * the text-format roundtrip is lossless (Spark writes doubles in
  * shortest-round-trip form, so read-back is bit-exact).
  *
  * Aggregates are restricted to order-independent, exactly
  * representable shapes (counts, integer sums, min/max) so the compare
  * is deterministic regardless of parallel accumulation order.
  *
  * Scale note: explicit schemas (never inferSchema — that is a second
  * full scan at 100 TB), header on CSV, line-delimited JSON; both
  * sources split by line across executors, so the read side
  * parallelizes like any other scan.
  */
object SourceQueries {

  private def tmpDir(kind: String, dir: String): String =
    s"/tmp/graft_src/${kind}_" + dir.replaceAll("[^a-zA-Z0-9]", "_")

  /** supplier → CSV (header, quoted strings) → read with explicit
    * schema → per-nation aggregate. */
  val sourceCsvScan: GQuery = GQuery(
    "source_csv_scan",
    """SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
      |  CAST(sum(s_suppkey) AS BIGINT) AS key_sum,
      |  min(s_name) AS first_name,
      |  min(s_acctbal) AS min_bal, max(s_acctbal) AS max_bal
      |FROM supplier
      |GROUP BY s_nationkey
      |ORDER BY s_nationkey""".stripMargin) { (s, dir) =>
    val path = tmpDir("csv_supplier", dir)
    // explicit column selection before the write: the read-back schema
    // is applied POSITIONALLY (enforceSchema), so fixture-column drift
    // must not be able to shift the written order silently
    Tables.supplier(s, dir)
      .select(col("s_suppkey"), col("s_name"), col("s_nationkey"),
        col("s_acctbal"))
      .write.mode("overwrite").option("header", "true").csv(path)
    val schema = StructType.fromDDL(
      "s_suppkey BIGINT, s_name STRING, s_nationkey INT, s_acctbal DOUBLE")
    s.read.option("header", "true").schema(schema).csv(path)
      .groupBy(col("s_nationkey"))
      .agg(count(lit(1)).as("n_suppliers"),
        sum(col("s_suppkey")).as("key_sum"),
        min(col("s_name")).as("first_name"),
        min(col("s_acctbal")).as("min_bal"),
        max(col("s_acctbal")).as("max_bal"))
      .orderBy(col("s_nationkey"))
  }

  /** part → line-delimited JSON → read with explicit schema →
    * per-brand aggregate. */
  val sourceJsonScan: GQuery = GQuery(
    "source_json_scan",
    """SELECT p_brand, CAST(count(*) AS BIGINT) AS n_parts,
      |  CAST(sum(p_size) AS BIGINT) AS size_sum,
      |  min(p_name) AS first_name,
      |  max(p_retailprice) AS max_price
      |FROM part
      |GROUP BY p_brand
      |ORDER BY p_brand""".stripMargin) { (s, dir) =>
    val path = tmpDir("json_part", dir)
    Tables.part(s, dir)
      .select(col("p_partkey"), col("p_name"), col("p_brand"),
        col("p_size"), col("p_retailprice"))
      .write.mode("overwrite").json(path)
    val schema = StructType.fromDDL(
      "p_partkey BIGINT, p_name STRING, p_brand STRING, " +
        "p_size INT, p_retailprice DOUBLE")
    s.read.schema(schema).json(path)
      .groupBy(col("p_brand"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("p_size")).as("size_sum"),
        min(col("p_name")).as("first_name"),
        max(col("p_retailprice")).as("max_price"))
      .orderBy(col("p_brand"))
  }

  /** customer → ORC (the second columnar format Spark ships beside
    * parquet: predicate pushdown + column pruning work the same) →
    * read with explicit schema → per-segment aggregate. */
  val sourceOrcScan: GQuery = GQuery(
    "source_orc_scan",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |  min(c_name) AS first_name,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS bal_sum
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val path = tmpDir("orc_customer", dir)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_name"), col("c_acctbal"),
        col("c_mktsegment"))
      .write.mode("overwrite").orc(path)
    val schema = StructType.fromDDL(
      "c_custkey BIGINT, c_name STRING, c_acctbal DOUBLE, " +
        "c_mktsegment STRING")
    s.read.schema(schema).orc(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_custkey")).as("key_sum"),
        min(col("c_name")).as("first_name"),
        round(sum(col("c_acctbal").cast("decimal(18,2)")), 2)
          .cast("double").as("bal_sum"))
      .orderBy(col("c_mktsegment"))
  }

  /** One opaque .bin file per document (doc_id < 50) → `binaryFile`
    * source → per-file length + content-hash verification against the
    * documents table. THE ingest path for multimodal payloads
    * (images/audio arrive as files, not rows): `binaryFile` yields
    * (path, modificationTime, length, content) with one row per file,
    * split across executors like any scan. The id rides the FILENAME
    * (regexp-extracted — the standard layout convention), content
    * equality is pinned by joining md5(content) against md5(text),
    * and the fixture bytes are written EXECUTOR-SIDE (foreachPartition
    * + nio) — the driver never touches the payloads.
    *
    * Oracle: the same aggregate from the documents table — byte
    * lengths equal n_chars (ASCII corpus), every content hash must
    * match (n_matching = n_files). */
  val sourceBinaryScan: GQuery = GQuery(
    "source_binary_scan",
    """SELECT CAST(count(*) AS BIGINT) AS n_files,
      |  CAST(sum(n_chars) AS BIGINT) AS sum_bytes,
      |  CAST(min(doc_id) AS BIGINT) AS first_doc,
      |  CAST(max(doc_id) AS BIGINT) AS last_doc,
      |  CAST(count(*) AS BIGINT) AS n_matching
      |FROM documents WHERE doc_id < 50""".stripMargin) { (s, dir) =>
    val path = tmpDir("bin_docs", dir)
    new java.io.File(path).mkdirs()
    Tables.documents(s, dir).filter(col("doc_id") < 50)
      .select(col("doc_id"), col("text"))
      .foreachPartition { rows: Iterator[org.apache.spark.sql.Row] =>
        rows.foreach { r =>
          java.nio.file.Files.write(
            java.nio.file.Paths.get(s"$path/doc_${r.getLong(0)}.bin"),
            r.getString(1).getBytes(java.nio.charset.StandardCharsets.UTF_8))
        }
      }
    val bin = s.read.format("binaryFile").load(s"$path/*.bin")
      .select(
        regexp_extract(col("path"), "doc_(\\d+)\\.bin", 1)
          .cast("bigint").as("doc_id"),
        col("length"), md5(col("content")).as("content_md5"))
    val docs = Tables.documents(s, dir).filter(col("doc_id") < 50)
      .select(col("doc_id"), md5(col("text")).as("text_md5"))
    bin.join(docs, Seq("doc_id"))
      .agg(count(lit(1)).as("n_files"),
        sum(col("length")).as("sum_bytes"),
        min(col("doc_id")).as("first_doc"),
        max(col("doc_id")).as("last_doc"),
        sum(when(col("content_md5") === col("text_md5"), 1L)
          .otherwise(0L)).as("n_matching"))
  }

  /** Malformed-row ingestion — the day-one reality of any real corpus
    * dump: a CSV directory holding the clean orders rows PLUS planted
    * broken lines (one per o_orderkey divisible by 97: wrong arity
    * AND an unparsable key, derived deterministically from the table
    * itself), read back in PERMISSIVE mode with `_corrupt_record`
    * routing. Clean rows aggregate per status; broken lines surface
    * as one '_corrupt' row — counted, never silently dropped
    * (FAILFAST would kill the 100 TB job on row one;
    * DROPMALFORMED would lie about coverage).
    *
    * The labeling projection references both the corrupt column and a
    * data column, so the plan never prunes to `_corrupt_record`
    * alone (Spark disallows corrupt-only references on unparsed
    * sources). Oracle: the same aggregate over the clean subset plus
    * the planted-line count from the parquet table. */
  val sourceCsvMalformed: GQuery = GQuery(
    "source_csv_malformed",
    """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS price_sum
      |FROM orders
      |GROUP BY o_orderstatus
      |UNION ALL
      |SELECT '_corrupt', CAST(count(*) AS BIGINT), NULL
      |FROM orders WHERE o_orderkey % 97 = 0
      |HAVING count(*) > 0
      |ORDER BY status""".stripMargin) { (s, dir) =>
    val path = tmpDir("csv_malformed", dir)
    val orders = Tables.orders(s, dir)
    // clean lines (no header: the planted file must not lose its
    // first line to per-file header skipping)
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .write.mode("overwrite").csv(path)
    // planted broken lines, appended as a sibling file set: 3 tokens
    // against a 4-column schema and a key that can't parse as BIGINT
    orders.filter(col("o_orderkey") % 97 === 0)
      .select(concat(lit("oops"), col("o_orderkey").cast("string"),
        lit(",bad,line")).as("value"))
      .write.mode("append").text(path)
    val schema = StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
        "o_orderstatus STRING, _corrupt_record STRING")
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .csv(path)
      .select(
        when(col("_corrupt_record").isNotNull, lit("_corrupt"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("_corrupt_record").isNotNull, lit(null))
          .otherwise(col("o_totalprice")).as("price"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("price").cast("decimal(18,2)")), 2)
          .cast("double").as("price_sum"))
      .orderBy(col("status"))
  }

  /** The JSON twin of [[sourceCsvMalformed]] — JSON's PERMISSIVE
    * semantics differ from CSV's in two graded ways: there is no
    * arity concept (a JSON line is corrupt iff it fails to PARSE, not
    * if fields are missing — absent fields just read null), and the
    * corrupt column captures the WHOLE offending line verbatim. Both
    * are pinned: planted lines are unparsable (bare `,broken` token),
    * and the oracle recomputes the exact byte length of every planted
    * line from the table, so `corrupt_len` only matches if Spark
    * captured each full line untouched. Corrupt rows are counted,
    * never dropped — same 100 TB rationale as the CSV twin. */
  val sourceJsonMalformed: GQuery = GQuery(
    "source_json_malformed",
    """SELECT o_orderstatus AS status, CAST(count(*) AS BIGINT) AS n_rows,
      |  CAST(round(sum(CAST(o_totalprice AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS price_sum,
      |  CAST(NULL AS BIGINT) AS corrupt_len
      |FROM orders
      |GROUP BY o_orderstatus
      |UNION ALL
      |SELECT '_corrupt', CAST(count(*) AS BIGINT), NULL,
      |  CAST(sum(length('{"o_orderkey":' || CAST(o_orderkey AS VARCHAR)
      |    || ',broken')) AS BIGINT)
      |FROM orders WHERE o_orderkey % 89 = 0
      |HAVING count(*) > 0
      |ORDER BY status""".stripMargin) { (s, dir) =>
    val path = tmpDir("json_malformed", dir)
    val orders = Tables.orders(s, dir)
    orders
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderstatus"))
      .write.mode("overwrite").json(path)
    // planted unparsable lines as a sibling file set: valid prefix,
    // then a bare token no JSON parser accepts — derived from the
    // table so the oracle can reconstruct each line exactly
    orders.filter(col("o_orderkey") % 89 === 0)
      .select(concat(lit("{\"o_orderkey\":"),
        col("o_orderkey").cast("string"), lit(",broken")).as("value"))
      .write.mode("append").text(path)
    val schema = StructType.fromDDL(
      "o_orderkey BIGINT, o_custkey BIGINT, o_totalprice DOUBLE, " +
        "o_orderstatus STRING, _corrupt_record STRING")
    s.read.schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt_record")
      .json(path)
      .select(
        when(col("_corrupt_record").isNotNull, lit("_corrupt"))
          .otherwise(col("o_orderstatus")).as("status"),
        when(col("_corrupt_record").isNotNull, lit(null))
          .otherwise(col("o_totalprice")).as("price"),
        when(col("_corrupt_record").isNotNull,
          length(col("_corrupt_record"))).otherwise(lit(null)).as("clen"))
      .groupBy(col("status"))
      .agg(count(lit(1)).as("n_rows"),
        round(sum(col("price").cast("decimal(18,2)")), 2)
          .cast("double").as("price_sum"),
        sum(col("clen")).cast("bigint").as("corrupt_len"))
      .orderBy(col("status"))
  }

  /** NESTED-schema JSONL ingestion — the shape real event/order dumps
    * arrive in (a struct field + a variable-length array of structs
    * per record), exercising the read surface the flat sources don't:
    * explicit nested DDL schema, dot-path projection through the
    * struct, and `explode` of the array-of-structs. The fixture is
    * derived deterministically from customer (record k carries
    * k % 3 + 1 items with arithmetic ids/quantities), so the oracle
    * replays the derivation relationally — integers end to end.
    *
    * Scale notes: the JSONL write/read splits by line across
    * executors like any text source; the explode is a narrow
    * generator; the only shuffle is the final bounded per-segment
    * aggregate. */
  val sourceJsonNested: GQuery = GQuery(
    "source_json_nested",
    """WITH it AS (
      |  SELECT c_custkey AS k, c_mktsegment AS seg,
      |    unnest(generate_series(0, c_custkey % 3)) AS j
      |  FROM customer)
      |SELECT seg, CAST(count(DISTINCT k) AS BIGINT) AS n_docs,
      |  CAST(count(*) AS BIGINT) AS n_items,
      |  CAST(sum((k + j) % 7 + 1) AS BIGINT) AS total_qty,
      |  CAST(max(k * 10 + j) AS BIGINT) AS max_item_id
      |FROM it GROUP BY seg
      |ORDER BY seg""".stripMargin) { (s, dir) =>
    val path = tmpDir("json_nested", dir)
    Tables.customer(s, dir)
      .select(to_json(struct(
        col("c_custkey").as("k"),
        struct(col("c_mktsegment").as("seg")).as("profile"),
        expr("""transform(sequence(0, CAST(c_custkey % 3 AS INT)),
                |  j -> named_struct(
                |    'item_id', c_custkey * 10 + j,
                |    'qty', (c_custkey + j) % 7 + 1))""".stripMargin)
          .as("items"))).as("value"))
      .write.mode("overwrite").text(path)
    val schema = StructType.fromDDL(
      "k BIGINT, profile STRUCT<seg: STRING>, " +
        "items ARRAY<STRUCT<item_id: BIGINT, qty: BIGINT>>")
    s.read.schema(schema).json(path)
      .select(col("k"), col("profile.seg").as("seg"),
        explode(col("items")).as("it"))
      .groupBy(col("seg"))
      .agg(countDistinct(col("k")).as("n_docs"),
        count(lit(1)).as("n_items"),
        sum(col("it.qty")).as("total_qty"),
        max(col("it.item_id")).as("max_item_id"))
      .orderBy(col("seg"))
  }

  /** nation → XML (the native XML source that ships in Spark 4's
    * sql core — the enterprise-feed arrival format) → read back with
    * an explicit schema + rowTag → per-region aggregate. Same
    * lossless-roundtrip contract as the CSV/JSON/ORC rows: the
    * aggregate must match the parquet-side oracle exactly. Explicit
    * schema as everywhere (XML inference is a second full scan at
    * 100 TB); at scale the reader splits multi-record files by
    * rowTag like any text source. */
  val sourceXmlScan: GQuery = GQuery(
    "source_xml_scan",
    """SELECT n_regionkey, CAST(count(*) AS BIGINT) AS n_nations,
      |  CAST(sum(n_nationkey) AS BIGINT) AS key_sum,
      |  min(n_name) AS first_name, max(n_name) AS last_name
      |FROM nation
      |GROUP BY n_regionkey
      |ORDER BY n_regionkey""".stripMargin) { (s, dir) =>
    val path = tmpDir("xml_nation", dir)
    Tables.nation(s, dir)
      .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))
      .write.mode("overwrite").option("rowTag", "nation")
      .format("xml").save(path)
    val schema = StructType.fromDDL(
      "n_nationkey BIGINT, n_name STRING, n_regionkey INT")
    s.read.schema(schema).option("rowTag", "nation").format("xml")
      .load(path)
      .groupBy(col("n_regionkey"))
      .agg(count(lit(1)).as("n_nations"),
        sum(col("n_nationkey")).as("key_sum"),
        min(col("n_name")).as("first_name"),
        max(col("n_name")).as("last_name"))
      .orderBy(col("n_regionkey"))
  }

  /** COMPRESSED-text ingestion: customer → gzip CSV → read back with
    * explicit schema → per-segment aggregate. Real dumps arrive
    * compressed; the operational point this row pins is that gzip is
    * NOT SPLITTABLE — each .csv.gz file is one task no matter its
    * size, so at 100 TB the compressed corpus must arrive as MANY
    * files (here: the write preserves the input's partitioning, one
    * gz file per task) or be recoded to a splittable codec before
    * heavy use. Spark resolves the codec from the file extension —
    * no option needed on the read side. */
  val sourceCsvGzip: GQuery = GQuery(
    "source_csv_gzip",
    """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n_customers,
      |  CAST(sum(c_custkey) AS BIGINT) AS key_sum,
      |  CAST(round(sum(CAST(c_acctbal AS DECIMAL(18,2))), 2) AS DOUBLE)
      |    AS bal_sum
      |FROM customer
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    val path = tmpDir("csv_gz_customer", dir)
    Tables.customer(s, dir)
      .select(col("c_custkey"), col("c_mktsegment"), col("c_acctbal"))
      .write.mode("overwrite").option("header", "true")
      .option("compression", "gzip").csv(path)
    val schema = StructType.fromDDL(
      "c_custkey BIGINT, c_mktsegment STRING, c_acctbal DOUBLE")
    s.read.option("header", "true").schema(schema).csv(path)
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("c_custkey")).as("key_sum"),
        round(sum(col("c_acctbal").cast("decimal(18,2)")), 2)
          .cast("double").as("bal_sum"))
      .orderBy(col("c_mktsegment"))
  }

  val all: Seq[GQuery] = Seq(sourceCsvScan, sourceJsonScan, sourceOrcScan,
    sourceBinaryScan, sourceCsvMalformed, sourceJsonMalformed,
    sourceJsonNested, sourceXmlScan, sourceCsvGzip)
}
