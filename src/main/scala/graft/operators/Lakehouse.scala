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
    statsOf(spark.read.parquet(s"$path/data"), zCols)
      .write.mode("overwrite").parquet(s"$path/_manifest")
  }

  /** One manifest row per file of `data`: min/max of every clustered
    * column + row count, grouped by `input_file_name()` — a column-pruned
    * scan of just the stats columns, the analog of collecting footer
    * stats at write time. */
  private def statsOf(data: DataFrame, zCols: Seq[String]): DataFrame = {
    val aggs = zCols.flatMap { c =>
      Seq(min(col(c)).as(s"min_$c"), max(col(c)).as(s"max_$c"))
    } :+ count(lit(1)).as("n_rows")
    data.select(input_file_name().as("file") +: zCols.map(col): _*)
      .groupBy(col("file"))
      .agg(aggs.head, aggs.tail: _*)
      .coalesce(1)
  }

  /** Data-file listing (driver-side, manifest-replay sized). */
  private def listData(spark: SparkSession, path: String): Set[String] = {
    val p = new org.apache.hadoop.fs.Path(s"$path/data")
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.listStatus(p).iterator
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
      .map(_.getPath.toUri.toString).toSet
  }

  /**
   * The nightly-ingest shape: appends `df` as a NEW z-clustered batch of
   * `files` parquet files to an existing [[writeClustered]] layout and
   * appends the new files' stats rows to the manifest — no existing data
   * file or manifest row is rewritten, and [[prunedRead]] stays exact
   * over the union (spec-pinned). Each batch is z-scaled on its OWN
   * min/max bounds: clustering quality is per-batch, manifest stats (the
   * thing pruning reads) are exact regardless.
   *
   * The new-file set is the before/after listing diff — driver-sized
   * here; a production writer would thread the committed file list out
   * of the write's commit protocol instead of listing. The stats pass
   * reads ONLY the new files.
   */
  def appendClustered(df: DataFrame, path: String, zCols: Seq[String],
      files: Int, bits: Int = 16): Unit = {
    val spark = df.sparkSession
    require(spark.read.parquet(s"$path/_manifest").columns
        .toSet == statsOf(df.limit(0), zCols).columns.toSet,
      s"appendClustered: zCols $zCols do not match the manifest at $path " +
        "— an appended batch must carry stats for the SAME clustered " +
        "columns or pruning would silently skip it")
    val before = listData(spark, path)
    Zorder.writeZOrderedAppend(df, zCols, s"$path/data", files, bits)
    val newFiles = (listData(spark, path) -- before).toSeq
    require(newFiles.nonEmpty, "appendClustered: the write added no files")
    statsOf(spark.read.parquet(newFiles: _*), zCols)
      .write.mode("append").parquet(s"$path/_manifest")
  }

  /**
   * OPTIMIZE-style compaction: data files holding fewer than `minRows`
   * rows (the small-batch debris [[appendClustered]] accumulates) are
   * re-clustered together into `files` new z-ordered files; every other
   * data file — and its manifest row — is untouched. Returns
   * (filesCompacted, filesWritten); a no-op (0 or 1 small file) returns
   * without writing.
   *
   * Scale shape: the decision pass is the driver-side manifest replay
   * (#files rows); only the small files' bytes are read and rewritten.
   * Like the rest of this module it assumes a SINGLE writer — there is
   * no transaction log, so a concurrent reader can observe the window
   * between the manifest swap and the old-file deletes (it would read
   * stale-but-correct data, never a torn manifest, because the new
   * manifest is written before any delete).
   */
  def compact(spark: SparkSession, path: String, zCols: Seq[String],
      minRows: Long, files: Int, bits: Int = 16): (Int, Int) = {
    val m = spark.read.parquet(s"$path/_manifest")
    require(m.columns.contains("n_rows"),
      s"manifest at $path has no n_rows column")
    val small = m.filter(col("n_rows") < minRows)
      .select(col("file")).collect().map(_.getString(0)).toSeq
    if (small.size <= 1) return (0, 0)
    val before = listData(spark, path)
    Zorder.writeZOrderedAppend(spark.read.parquet(small: _*), zCols,
      s"$path/data", files, bits)
    val newFiles = (listData(spark, path) -- before).toSeq
    // survivors + the replacement rows become the NEW manifest; it lands
    // (staged then swapped, both driver-sized writes) BEFORE the
    // compacted originals are deleted, so no reader window sees rows
    // pointing at deleted files alongside missing replacements
    val smallSet = small.toSet
    val kept = m.filter(!col("file").isin(small: _*))
    val replacement = kept.unionByName(
      statsOf(spark.read.parquet(newFiles: _*), zCols).select(kept.columns.map(col): _*))
    val staged = s"$path/_manifest_staged"
    replacement.coalesce(1).write.mode("overwrite").parquet(staged)
    spark.read.parquet(staged).coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_manifest")
    val fs = new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(new org.apache.hadoop.fs.Path(staged), true)
    smallSet.foreach(f =>
      fs.delete(new org.apache.hadoop.fs.Path(new java.net.URI(f)), false))
    (small.size, newFiles.size)
  }

  /** Manifest replay: the data files whose `[min_c, max_c]` interval
    * overlaps `[lo, hi]` on `predCol`, plus the total file count.
    * Driver-sized by construction (one manifest row per file), so it is
    * collected ONCE and filtered on the driver — planning a pruned read
    * costs a single #files-row job, not one per derived statistic. */
  def selectFiles(spark: SparkSession, path: String, predCol: String,
      lo: Double, hi: Double): (Seq[String], Int) =
    selectFilesMulti(spark, path, Seq((predCol, lo, hi)))

  /** Multi-range manifest replay — the reason the data is Z-ORDERED
    * rather than sorted on one column: every file is a tight
    * hyper-rectangle in ALL clustered columns, so each predicate prunes
    * independently and a file survives only if it overlaps EVERY range
    * (intersection of per-column survivors). */
  def selectFilesMulti(spark: SparkSession, path: String,
      ranges: Seq[(String, Double, Double)]): (Seq[String], Int) = {
    require(ranges.nonEmpty, "selectFilesMulti: need at least one range")
    val m = spark.read.parquet(s"$path/_manifest")
    ranges.foreach { case (c, _, _) =>
      require(m.columns.contains(s"min_$c"),
        s"manifest at $path has no stats for column '$c' — it was " +
          "not in the write's zCols")
    }
    // integral stats compare as LONGS against ceil/floor'd bounds — a
    // double cast would round a |value| > 2^53 min/max by up to ~1024,
    // which can push a file's rounded min past the query's hi and
    // silently prune a file the exact residual WOULD have matched (e.g.
    // raw 64-bit hash keys). Fractional stats compare as doubles.
    import org.apache.spark.sql.types._
    val integral = ranges.map { case (c, _, _) =>
      m.schema(s"min_$c").dataType match {
        case ByteType | ShortType | IntegerType | LongType => true
        case _ => false
      }
    }
    val statCols = ranges.zipWithIndex.flatMap { case ((c, _, _), i) =>
      val cast = if (integral(i)) "long" else "double"
      Seq(col(s"min_$c").cast(cast).as(s"lo$i"),
        col(s"max_$c").cast(cast).as(s"hi$i"))
    }
    val rows = m.select(col("file") +: statCols: _*).collect()
    val kept = rows.toIndexedSeq
      .filter { r =>
        ranges.zipWithIndex.forall { case ((_, lo, hi), i) =>
          !r.isNullAt(2 * i + 1) && !r.isNullAt(2 * i + 2) && {
            if (integral(i))
              !(r.getLong(2 * i + 2) < math.ceil(lo).toLong ||
                r.getLong(2 * i + 1) > math.floor(hi).toLong)
            else
              !(r.getDouble(2 * i + 2) < lo || r.getDouble(2 * i + 1) > hi)
          }
        }
      }
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
      lo: Double, hi: Double): DataFrame =
    prunedReadMulti(spark, path, Seq((predCol, lo, hi)))

  /** [[prunedRead]] over a conjunction of ranges — manifest pruning on
    * every clustered column at once, then the exact residual AND. */
  def prunedReadMulti(spark: SparkSession, path: String,
      ranges: Seq[(String, Double, Double)]): DataFrame = {
    val (files, _) = selectFilesMulti(spark, path, ranges)
    if (files.isEmpty)
      return spark.read.parquet(s"$path/data").filter(lit(false))
    val scan = spark.read.parquet(files: _*)
    // each residual predicate must compare in its column's NATIVE type: a
    // double bound against an integral column would cast the COLUMN,
    // which disables parquet row-group pushdown — manifest pruning would
    // then skip files only to decode every surviving row group. Integral
    // bounds tighten by ceil/floor (same row set, pushdown kept).
    import org.apache.spark.sql.types._
    val exact = ranges.map { case (c, lo, hi) =>
      scan.schema(c).dataType match {
        case ByteType | ShortType | IntegerType | LongType =>
          col(c) >= lit(math.ceil(lo).toLong) &&
            col(c) <= lit(math.floor(hi).toLong)
        // float bounds only when the doubles are float-exact (same row
        // set); an inexact bound falls through to the double compare —
        // correct, just no row-group pushdown on that one predicate
        case FloatType
            if lo.toFloat.toDouble == lo && hi.toFloat.toDouble == hi =>
          col(c) >= lit(lo.toFloat) && col(c) <= lit(hi.toFloat)
        case _ => col(c) >= lit(lo) && col(c) <= lit(hi)
      }
    }.reduce(_ && _)
    scan.filter(exact)
  }
}
