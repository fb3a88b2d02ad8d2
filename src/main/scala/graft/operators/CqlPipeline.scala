package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{cassandra_random_token, cassandra_token, partition_key, random_token_bucket, token_bucket}

/**
 * The reference's dataflow re-expressed as Catalyst projections:
 * scan -> project/transform -> key-extract -> token-range repartition +
 * within-partition sort -> bulk sink.
 *
 * Behavior studied from (not copied; fresh Spark-first design):
 *   AvroToCQL.java:35-100   (CQL projection: rowkey/timestamp/ttl/ignore)
 *   AvroToThrift.java:41-108 (cell-per-field wide-to-long)
 *   LegacyInputFormat.java:57-129 (TSV parse)
 *   Hdfs2Cass.java:107-128  (pipeline assembly)
 */
object CqlPipeline {

  /** Configuration mirroring the reference CLI flags (Hdfs2Cass.java:67-94). */
  final case class Projection(
      rowkey: Option[String] = None,        // default: first column
      timestampField: Option[String] = None, // per-record writetime override (micros)
      ttlField: Option[String] = None,       // per-record ttl override
      ignore: Seq[String] = Nil,             // dropped fields
      defaultTimestampMicros: Long = 0L      // plan-time-captured clock (F6)
  )

  /**
   * P1: project an input row to the CQL value list + writetime/ttl.
   * The rowkey column keeps its place in the value list (unless ignored);
   * timestamp/ttl fields are consumed, not emitted as values. Output:
   *   rowkey | <value columns...> | writetime | ttl
   * Default writetime is captured ONCE at plan time (micros) rather than
   * per-record wall clock — fixes the reference's intra-job clock drift.
   */
  def toCql(df: DataFrame, p: Projection = Projection()): DataFrame = {
    val fields = df.schema.fieldNames.toSeq
    val rowkeyName = p.rowkey.getOrElse(fields.head)
    require(fields.contains(rowkeyName), s"rowkey field $rowkeyName not in ${fields}")
    val special = p.timestampField.toSet ++ p.ttlField.toSet
    val ignored = p.ignore.toSet
    val valueCols = fields.filterNot(f => special.contains(f) || ignored.contains(f))

    val writetime = p.timestampField
      .map(f => coalesce(col(f).cast(LongType), lit(p.defaultTimestampMicros)))
      .getOrElse(lit(p.defaultTimestampMicros))
    val ttl = p.ttlField
      .map(f => coalesce(col(f).cast(IntegerType), lit(0)))
      .getOrElse(lit(0))

    df.select(
      (col(rowkeyName).as("rowkey") +:
        valueCols.map(col)) :+
        writetime.as("writetime") :+
        ttl.as("ttl"): _*)
  }

  /**
   * P2: wide-to-long cell projection (Thrift-path semantics): one output row
   * per non-special field, carrying (rowkey, colname, value, writetime, ttl).
   * Values are cast to string form; the wire codec runs sink-side.
   */
  def toCells(df: DataFrame, p: Projection = Projection()): DataFrame = {
    val fields = df.schema.fieldNames.toSeq
    val rowkeyName = p.rowkey.getOrElse(fields.head)
    val special = p.timestampField.toSet ++ p.ttlField.toSet + rowkeyName
    val ignored = p.ignore.toSet
    val cellCols = fields.filterNot(f => special.contains(f) || ignored.contains(f))
    require(cellCols.nonEmpty, "no cell columns left after rowkey/ignore")

    val writetime = p.timestampField
      .map(f => coalesce(col(f).cast(LongType), lit(p.defaultTimestampMicros)))
      .getOrElse(lit(p.defaultTimestampMicros))
    val ttl = p.ttlField
      .map(f => coalesce(col(f).cast(IntegerType), lit(0)))
      .getOrElse(lit(0))

    // stack the cells: array of (name, value) structs, then explode — stays
    // in whole-stage codegen, no shuffle.
    val cells = array(cellCols.map(f =>
      struct(lit(f).as("colname"), col(f).cast(StringType).as("value"))): _*)
    df.select(col(rowkeyName).as("rowkey"), explode(cells).as("cell"),
        writetime.as("writetime"), ttl.as("ttl"))
      .select(col("rowkey"), col("cell.colname").as("colname"),
        col("cell.value").as("value"), col("writetime"), col("ttl"))
  }

  /**
   * S3/P3: legacy TSV line parse as a pure Catalyst projection with strict
   * validation via raise_error (malformed input fails the job, matching the
   * reference's CrunchRuntimeException semantics).
   */
  def parseLegacy(lines: DataFrame, lineCol: String = "value",
      defaultTimestampMillis: Long = 0L): DataFrame = {
    val parts = split(col(lineCol), "\t", -1)
    val nparts = size(parts)
    val version = element_at(parts, 2).cast(IntegerType)
    val prefixOk = element_at(parts, 1) === lit(graft.core.LegacyLine.Prefix)

    def fail(msg: String): Column =
      raise_error(concat(lit(msg + ": "), col(lineCol))).cast(StringType)

    // Validation is embedded in the rowkey column (a dangling check column
    // would be pruned away by Catalyst and never fire).
    val rowkey =
      when(!prefixOk, fail("Found malformed row. The rows must start with 'HdfsToCassandra'"))
        .when(version === 1 && nparts =!= 5, fail("Found malformed row. Check correct row format."))
        .when(version === 2 && nparts =!= 6, fail("Found malformed row. Check correct row format."))
        .when(version === 3 && nparts =!= 7, fail("Found malformed row. Check correct row format."))
        .when(!version.isin(1, 2, 3), fail("Unknown format version"))
        .otherwise(element_at(parts, 3))

    lines
      .withColumn("_parts", parts)
      .withColumn("_v", version)
      .select(
        rowkey.as("rowkey"),
        element_at(col("_parts"), 4).as("colname"),
        when(col("_v") === 1, element_at(col("_parts"), 5))
          .when(col("_v") === 2, element_at(col("_parts"), 6))
          .otherwise(element_at(col("_parts"), 7)).as("value"),
        when(col("_v") === 1, lit(defaultTimestampMillis))
          .otherwise(element_at(col("_parts"), 5).cast(LongType)).as("writetime"),
        when(col("_v") === 3, element_at(col("_parts"), 6).cast(LongType))
          .otherwise(lit(0L)).as("ttl"))
  }

  /**
   * Permissive variant of [[parseLegacy]] (the improvement SURVEY §2.3
   * flags): instead of failing the job, malformed lines carry a non-null
   * `_error` column and null fields; route them to a dead-letter sink with
   * `.filter($"_error".isNotNull)` and keep the rest. At 100 TB a single
   * bad line must not kill a 10-hour load.
   */
  def parseLegacyPermissive(lines: DataFrame, lineCol: String = "value",
      defaultTimestampMillis: Long = 0L): DataFrame = {
    val parts = split(col(lineCol), "\t", -1)
    val nparts = size(parts)
    val version = element_at(parts, 2).cast(IntegerType)
    val prefixOk = element_at(parts, 1) === lit(graft.core.LegacyLine.Prefix)
    val arityOk = (version === 1 && nparts === 5) ||
      (version === 2 && nparts === 6) || (version === 3 && nparts === 7)
    val error =
      when(!prefixOk, lit("bad prefix"))
        .when(version.isNull || !version.isin(1, 2, 3), lit("unknown version"))
        .when(!arityOk, lit("bad arity"))
        .otherwise(lit(null).cast(StringType))

    lines
      .withColumn("_parts", parts)
      .withColumn("_v", version)
      .withColumn("_error", error)
      .select(
        when(col("_error").isNull, element_at(col("_parts"), 3)).as("rowkey"),
        when(col("_error").isNull, element_at(col("_parts"), 4)).as("colname"),
        when(col("_error").isNull,
          when(col("_v") === 1, element_at(col("_parts"), 5))
            .when(col("_v") === 2, element_at(col("_parts"), 6))
            .otherwise(element_at(col("_parts"), 7))).as("value"),
        when(col("_error").isNull,
          when(col("_v") === 1, lit(defaultTimestampMillis))
            .otherwise(element_at(col("_parts"), 5).cast(LongType))).as("writetime"),
        when(col("_error").isNull,
          when(col("_v") === 3, element_at(col("_parts"), 6).cast(LongType))
            .otherwise(lit(0L))).as("ttl"),
        col("_error"))
  }

  /**
   * P9 + G1-G3: compute partition-key bytes and token, route each row to the
   * ring bucket owning its token, and sort within each bucket in decorated-
   * key order — the shape the sorted SSTable writer requires. Catalyst path:
   * repartition on the bucket column + sortWithinPartitions; with AQE
   * coalescing disabled for this exchange the bucket count is exact.
   *
   * `partitionerClass` selects the token kernel (reference: the partitioner
   * is reflectively loaded and both LongToken and BigIntegerToken are
   * bucketed, CassandraPartitioner.java:46-47,58-72): Murmur3 tokens are
   * longs; RandomPartitioner (MD5) tokens ride as canonical 16-byte binary,
   * whose unsigned-lexicographic BinaryType sort IS numeric token order —
   * the same exchange+sort machinery serves both.
   */
  def alignToRing(df: DataFrame, keyCols: Seq[String], numBuckets: Int,
      partitionerClass: String = graft.core.CassandraParams.Murmur3Partitioner): DataFrame = {
    val pk = partition_key(keyCols.map(col): _*)
    val withTok = partitionerClass match {
      case graft.core.CassandraParams.Murmur3Partitioner =>
        df.withColumn("_pk", pk)
          .withColumn("_token", cassandra_token(col("_pk")))
          .withColumn("_bucket", token_bucket(col("_token"), numBuckets))
      case graft.core.CassandraParams.RandomPartitioner =>
        df.withColumn("_pk", pk)
          .withColumn("_token", cassandra_random_token(col("_pk")))
          .withColumn("_bucket", random_token_bucket(col("_token"), numBuckets))
      case other =>
        throw new IllegalArgumentException(s"Unknown partitioner class: $other")
    }
    withTok
      .repartition(numBuckets, col("_bucket"))
      .sortWithinPartitions(col("_token"), col("_pk"))
  }

}
