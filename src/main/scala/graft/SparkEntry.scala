package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{cassandra_token, cql_serialize, partition_key, token_bucket}
import graft.operators.CqlPipeline
import graft.operators.CqlPipeline.Projection

/**
 * Driver contract: one entry per implemented operator from SURVEY.md §2,
 * with DuckDB-equivalent oracle SQL where SQL can express the semantics.
 * Columns are aliased identically on both sides (the driver's compare
 * sorts columns by name and hashes values).
 */
object SparkEntry {

  /** Plan-time-captured default writetime (micros) — F6 semantics, frozen
    * for oracle determinism. */
  val DefaultWritetimeMicros = 1700000000000000L

  private def t(dir: String, name: String) = s"$dir/$name.parquet"

  /** Flagship: the full reference dataflow on sf0.001 — scan -> CQL
    * projection -> partition-key/token extraction -> ring-aligned
    * repartition + decorated-key sort. Driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    val orders = spark.read.parquet(t("/root/testdata/sf0.001", "orders"))
    val projected = CqlPipeline.toCql(orders,
      Projection(ignore = Seq("o_orderpriority"),
        defaultTimestampMicros = DefaultWritetimeMicros))
    CqlPipeline.alignToRing(projected, Seq("rowkey"), numBuckets = 4)
  }

  // ---------------------------------------------------------------------
  // Operator queries. Names map to SURVEY.md §2 rows.
  // ---------------------------------------------------------------------

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // S1: projection + predicate pushed to the parquet scan
    "s1_scan_project" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .filter(col("l_shipdate") < lit("1996-01-01").cast(TimestampType) &&
          col("l_quantity") > 30)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"), col("l_shipdate"))
    }),

    // U1: multi-path input union (UNION ALL semantics)
    "u1_union_paths" -> ((s, dir) => {
      val a = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      val b = s.read.parquet(t(dir, "lineitem"))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"))
      a.unionByName(b)
    }),

    // S3/P3: legacy TSV line parse (lines synthesized from orders, three
    // format versions round-robin by key; ts values must fit in int —
    // reference parses them with Integer.valueOf)
    "s3_legacy_parse" -> ((s, dir) => {
      val lines = legacyLines(s, dir)
      CqlPipeline.parseLegacy(lines, "line", defaultTimestampMillis = 0L)
    }),

    // P1: AvroToCQL projection — rowkey + ordered values + writetime/ttl
    "p1_cql_projection" -> ((s, dir) => {
      CqlPipeline.toCql(s.read.parquet(t(dir, "orders")),
        Projection(ignore = Seq("o_orderpriority"),
          defaultTimestampMicros = DefaultWritetimeMicros))
    }),

    // P2: AvroToThrift wide-to-long cell projection
    "p2_cells" -> ((s, dir) => {
      CqlPipeline.toCells(s.read.parquet(t(dir, "orders")),
        Projection(ignore = Seq("o_totalprice", "o_orderdate"),
          defaultTimestampMicros = DefaultWritetimeMicros))
    }),

    // F1/F3: wire-format serialization kernel, cross-checked in hex against
    // an independent SQL reconstruction of the byte layout
    "f1_serialize_hex" -> ((s, dir) => {
      val o = s.read.parquet(t(dir, "orders"))
      o.select(
        col("o_orderkey"),
        hex(cql_serialize(col("o_orderkey"))).as("ser_bigint_hex"),
        hex(cql_serialize(col("o_orderpriority"))).as("ser_string_hex"),
        hex(partition_key(col("o_orderkey"), col("o_orderpriority"))).as("composite_hex"))
    }),

    // Aggregation (north-star §2.6): TPC-H Q1 shape
    "q1_agg" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          round(sum(col("l_quantity")), 2).as("sum_qty"),
          round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
    }),

    // Join + aggregation + top-k (deterministic tiebreak on o_orderkey)
    "q3_join_topk" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer")).filter(col("c_mktsegment") === "BUILDING")
      val o = s.read.parquet(t(dir, "orders"))
      val l = s.read.parquet(t(dir, "lineitem"))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("o_orderkey"), col("o_orderdate"))
        .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"))
        .orderBy(col("revenue").desc, col("o_orderkey").asc)
        .limit(10)
    }),

    // Window function: top order per customer
    "q4_window" -> ((s, dir) => {
      import org.apache.spark.sql.expressions.Window
      val w = Window.partitionBy(col("o_custkey"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      s.read.parquet(t(dir, "orders"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"))
    }),

    // Distinct aggregation
    "q5_distinct" -> ((s, dir) => {
      s.read.parquet(t(dir, "customer"))
        .groupBy(col("c_mktsegment"))
        .agg(countDistinct(col("c_nationkey")).as("n_nations"),
          count(lit(1)).as("n_customers"))
    }),

    // Rollup (grouping sets)
    "q6_rollup" -> ((s, dir) => {
      s.read.parquet(t(dir, "lineitem"))
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(round(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("n"))
    }),

    // Semi join (EXISTS)
    "q7_exists" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders")).filter(col("o_totalprice") > 200000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
        .select(col("c_custkey"), col("c_name"))
    }),

    // Anti join (NOT EXISTS)
    "q8_not_exists" -> ((s, dir) => {
      val c = s.read.parquet(t(dir, "customer"))
      val o = s.read.parquet(t(dir, "orders")).filter(col("o_totalprice") > 300000)
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .select(col("c_custkey"), col("c_name"))
    })
  )

  /** Synthesized legacy TSV lines (shared by query + oracle derivation). */
  private def legacyLines(s: SparkSession, dir: String): DataFrame = {
    val o = s.read.parquet(t(dir, "orders"))
    o.select(concat_ws("\t",
      lit("HdfsToCassandra"),
      (col("o_orderkey") % 3 + 1).cast(StringType),
      col("o_orderkey").cast(StringType),
      lit("status"),
      when(col("o_orderkey") % 3 + 1 === 1, col("o_orderstatus"))
        .when(col("o_orderkey") % 3 + 1 === 2,
          concat_ws("\t", col("o_custkey").cast(StringType), col("o_orderstatus")))
        .otherwise(concat_ws("\t", col("o_custkey").cast(StringType), lit("600"),
          col("o_orderstatus")))
    ).as("line"))
  }

  // ---------------------------------------------------------------------
  // DuckDB oracle SQL — same column names, same semantics.
  // ---------------------------------------------------------------------

  def oracleSql: Map[String, String] = Map(
    "s1_scan_project" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
        |FROM lineitem
        |WHERE l_shipdate < TIMESTAMP '1996-01-01' AND l_quantity > 30""".stripMargin,

    "u1_union_paths" ->
      """SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem
        |UNION ALL
        |SELECT l_orderkey, l_linenumber, l_returnflag FROM lineitem""".stripMargin,

    // independent derivation of the parsed legacy fields (not a re-parse)
    "s3_legacy_parse" ->
      """SELECT CAST(o_orderkey AS VARCHAR) AS rowkey,
        |       'status' AS colname,
        |       o_orderstatus AS value,
        |       CAST(CASE WHEN o_orderkey % 3 + 1 = 1 THEN 0 ELSE o_custkey END AS BIGINT) AS writetime,
        |       CAST(CASE WHEN o_orderkey % 3 + 1 = 3 THEN 600 ELSE 0 END AS BIGINT) AS ttl
        |FROM orders""".stripMargin,

    "p1_cql_projection" ->
      s"""SELECT o_orderkey AS rowkey, o_orderkey, o_custkey, o_orderstatus,
         |       o_totalprice, o_orderdate,
         |       CAST($DefaultWritetimeMicros AS BIGINT) AS writetime,
         |       CAST(0 AS INTEGER) AS ttl
         |FROM orders""".stripMargin,

    "p2_cells" ->
      s"""SELECT o_orderkey AS rowkey, colname, value,
         |       CAST($DefaultWritetimeMicros AS BIGINT) AS writetime,
         |       CAST(0 AS INTEGER) AS ttl
         |FROM (
         |  SELECT o_orderkey, 'o_custkey' AS colname, CAST(o_custkey AS VARCHAR) AS value FROM orders
         |  UNION ALL
         |  SELECT o_orderkey, 'o_orderstatus', o_orderstatus FROM orders
         |  UNION ALL
         |  SELECT o_orderkey, 'o_orderpriority', o_orderpriority FROM orders
         |)""".stripMargin,

    // independent hex reconstruction of the wire layout: 8-byte BE bigint,
    // UTF-8 string, and the composite (2-byte len + bytes + 0x00) encoding
    "f1_serialize_hex" ->
      """SELECT o_orderkey,
        |       lpad(hex(o_orderkey), 16, '0') AS ser_bigint_hex,
        |       hex(o_orderpriority) AS ser_string_hex,
        |       '0008' || lpad(hex(o_orderkey), 16, '0') || '00' ||
        |       lpad(hex(length(o_orderpriority)), 4, '0') || hex(o_orderpriority) || '00'
        |         AS composite_hex
        |FROM orders""".stripMargin,

    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty,
        |       round(sum(l_extendedprice), 2) AS sum_base_price,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |       count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus""".stripMargin,

    "q3_join_topk" ->
      """SELECT o_orderkey, o_orderdate,
        |       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |WHERE c_mktsegment = 'BUILDING'
        |GROUP BY o_orderkey, o_orderdate
        |ORDER BY revenue DESC, o_orderkey ASC
        |LIMIT 10""".stripMargin,

    "q4_window" ->
      """SELECT o_custkey, o_orderkey, o_totalprice FROM (
        |  SELECT o_custkey, o_orderkey, o_totalprice,
        |         row_number() OVER (PARTITION BY o_custkey
        |                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rn
        |  FROM orders
        |) WHERE rn = 1""".stripMargin,

    "q5_distinct" ->
      """SELECT c_mktsegment,
        |       count(DISTINCT c_nationkey) AS n_nations,
        |       count(*) AS n_customers
        |FROM customer GROUP BY c_mktsegment""".stripMargin,

    "q6_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
        |FROM lineitem GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin,

    "q7_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000)""".stripMargin,

    "q8_not_exists" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE NOT EXISTS (SELECT 1 FROM orders o
        |                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)""".stripMargin
  )
}
