package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The lakehouse layout pair composed end-to-end: a z-clustered multi-file
 * write ([[Zorder]]) plus a Delta-style per-file min/max stats manifest,
 * and a manifest-pruned read that opens ONLY the files whose stats
 * overlap the predicate — the file-skipping mechanic Delta's transaction
 * log and Iceberg's manifests provide, built from plain parquet +
 * DataFrame ops.
 *
 * Scale shape: the manifest holds one row per DATA FILE (not per row), so
 * planning a pruned read is a driver-side replay of a #files-row table —
 * exactly Delta-log/Iceberg-manifest sized, the one collect in this
 * module and legitimate for the same reason theirs is. Because the data
 * is z-ordered on the stats columns, every file covers a tight
 * hyper-rectangle in ALL of them at once, so a range predicate on ANY
 * clustered column eliminates most files before a byte of data is read.
 */
object Lakehouse {

  /**
   * Writes `df` z-clustered on `zCols` into `files` parquet files under
   * `path/data`, then writes a one-row-per-file stats manifest
   * (min/max of every `zCols` member + row count) under
   * `path/_manifest`. The stats pass is a column-pruned scan of just the
   * clustered columns grouped by `input_file_name()` — on columnar
   * storage it reads only those columns, the analog of collecting
   * footer stats at write time.
   */
  def writeClustered(df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16): Unit = {
    Zorder.writeZOrdered(df, zCols, s"$path/data", files, bits)
    val spark = df.sparkSession
    val aggs = zCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    spark.read.parquet(s"$path/data")
      .select(input_file_name().as("file") +: zCols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** Manifest replay: the data files whose `[min_c, max_c]` interval
    * overlaps `[lo, hi]` on `predCol`, plus the total file count.
    * Driver-sized by construction (one manifest row per file), so it is
    * collected ONCE and filtered on the driver — planning a pruned read
    * costs a single #files-row job, not one per derived statistic. */
  def selectFiles(spark: SparkSession, path: String, predCol: String,
      lo: Double, hi: Double): (Seq[String], Int) = {
    val m = spark.read.parquet(s"$path/_manifest")
    require(m.columns.contains(s"min_$predCol"),
      s"manifest at $path has no stats for column '$predCol' — it was " +
        "not in the write's zCols")
    val rows = m.select(col("file"),
        col(s"min_$predCol").cast("double").as("lo"),
        col(s"max_$predCol").cast("double").as("hi"))
      .collect()
    val kept = rows.toIndexedSeq
      .filter(r => !r.isNullAt(1) && !r.isNullAt(2) &&
        !(r.getDouble(2) < lo || r.getDouble(1) > hi))
      .map(_.getString(0))
    (kept, rows.length)
  }

  /**
   * Reads only the manifest-surviving files and applies the EXACT
   * predicate `predCol BETWEEN lo AND hi` — pruning is a superset filter
   * (file granularity), the residual filter restores row-exact
   * semantics, so the result is identical to a full scan + filter while
   * touching a fraction of the files (spec-pinned: fewer files than
   * written, same rows as the full scan).
   */
  def prunedRead(spark: SparkSession, path: String, predCol: String,
      lo: Double, hi: Double): DataFrame = {
    val (files, _) = selectFiles(spark, path, predCol, lo, hi)
    if (files.isEmpty)
      return spark.read.parquet(s"$path/data").filter(lit(false))
    val scan = spark.read.parquet(files: _*)
    // the residual predicate must compare in the column's NATIVE type: a
    // double bound against an integral column would cast the COLUMN,
    // which disables parquet row-group pushdown — manifest pruning would
    // then skip files only to decode every surviving row group. Integral
    // bounds tighten by ceil/floor (same row set, pushdown kept).
    import org.apache.spark.sql.types._
    val exact = scan.schema(predCol).dataType match {
      case ByteType | ShortType | IntegerType | LongType =>
        col(predCol) >= lit(math.ceil(lo).toLong) &&
          col(predCol) <= lit(math.floor(hi).toLong)
      case _ => col(predCol) >= lit(lo) && col(predCol) <= lit(hi)
    }
    scan.filter(exact)
  }
}
