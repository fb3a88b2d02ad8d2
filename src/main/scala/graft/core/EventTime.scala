package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Schema-adaptive event-time normalization.
 *
 * The `events` testdata carries its `ts` column differently depending on
 * the writer/runtime pairing: older rounds read the nanosecond parquet
 * column as epoch-nanos BIGINT (via the since-removed
 * `spark.sql.legacy.parquet.nanosAsLong` conf), while current Spark reads
 * a `timestamp[us]`/`timestamp[ns]` parquet column as TIMESTAMP_NTZ.
 * Every query and every DuckDB oracle agrees on ONE contract: event time
 * as **epoch-microsecond BIGINT** (`epoch_us(ts)` on the oracle side).
 * This helper produces that contract whatever physical type the scan
 * yields, so no query depends on removed legacy confs or on which Spark
 * minor version mounted the data.
 *
 * The TIMESTAMP_NTZ branch uses `timestampdiff` against an NTZ epoch
 * literal — a timezone-free computation, deterministic regardless of
 * `spark.sql.session.timeZone` (an NTZ→LTZ cast would not be).
 */
object EventTime {

  /** Adds `outCol` = epoch-micros BIGINT derived from `tsCol`, keeping all
    * other columns. Works on batch and streaming frames alike. */
  def withTsUs(df: DataFrame, tsCol: String = "ts",
      outCol: String = "ts_us"): DataFrame = {
    val us = df.schema(tsCol).dataType match {
      case LongType => // legacy read: epoch-nanos long
        expr(s"$tsCol div 1000")
      case TimestampNTZType => // tz-free diff from the NTZ epoch
        expr(s"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', $tsCol)")
      case TimestampType =>
        expr(s"unix_micros($tsCol)")
      case other =>
        throw new IllegalArgumentException(
          s"unsupported event-time type for column '$tsCol': $other")
    }
    df.withColumn(outCol, us.cast(LongType))
  }

  /** Reads the events table with `ts` REPLACED by its epoch-micros BIGINT
    * form — for call sites whose downstream (window math, sessionization)
    * wants a plain long named `ts`. */
  def readEventsTsUsAs(df: DataFrame, as: String): DataFrame =
    withTsUs(df).drop("ts").withColumnRenamed("ts_us", as)
}
