package graft.operators

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/**
 * Bucketed-table co-location: pay the shuffle ONCE at write time so every
 * later join and aggregation on the bucket key plans with zero Exchange.
 *
 * This is the 100 TB join strategy the transient-repartition forms can't
 * give: a nightly ingest writes fact and dimension bucketed (and sorted)
 * by the join key; each of the N downstream joins/aggregations on that
 * key then reads co-partitioned, pre-sorted buckets — SortMergeJoin with
 * no exchange and no sort on either side, per-key aggregation with no
 * exchange at all. One write-side shuffle amortized over every consumer,
 * versus one shuffle PER QUERY forever.
 *
 * Spark-native mechanics, nothing custom: `bucketBy(n, key).sortBy(key)`
 * writes hash-bucketed files; the scan reports
 * `HashPartitioning(key, n)` + per-bucket order, and EnsureRequirements
 * recognizes both sides as co-partitioned through the join condition's
 * key equivalence. The zero-Exchange/zero-Sort shape is pinned in
 * PlanSpec.
 */
object Bucketing {

  /**
   * Writes `df` as an EXTERNAL bucketed + sorted parquet table: data at
   * `path`, metadata under `table` in the session catalog (bucket spec
   * lives in the catalog, which is why this is `saveAsTable` and not a
   * bare `parquet(path)` write). Overwrites both on re-run.
   */
  def writeBucketed(df: DataFrame, table: String, path: String,
      buckets: Int, keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty, "writeBucketed: need at least one key column")
    require(buckets > 0, s"writeBucketed: buckets must be positive, got $buckets")
    // external-table overwrite is finicky across catalog states; a clean
    // drop keeps re-runs (bench passes, repeated Verify) deterministic
    df.sparkSession.sql(s"DROP TABLE IF EXISTS `$table`")
    import org.apache.spark.sql.functions.col
    // one writer task per bucket -> exactly one file per bucket: THIS is
    // the write-time shuffle the strategy pays once. Many files per
    // bucket would still co-partition, but each would be independently
    // sorted and every reader would re-sort
    df.repartition(buckets, keyCols.map(col): _*)
      .write.mode(SaveMode.Overwrite)
      .bucketBy(buckets, keyCols.head, keyCols.tail: _*)
      .sortBy(keyCols.head, keyCols.tail: _*)
      .option("path", path)
      .format("parquet")
      .saveAsTable(table)
  }

  /**
   * Joins two previously [[writeBucketed]] tables on `leftKey = rightKey`
   * as a co-located SortMergeJoin (the `merge` hint keeps a small side
   * from degrading the demonstration to a broadcast — with co-located
   * buckets the merge join is exchange-free, so broadcast buys nothing).
   */
  def coLocatedJoin(spark: SparkSession, leftTable: String,
      rightTable: String, leftKey: String, rightKey: String): DataFrame = {
    import org.apache.spark.sql.functions.col
    spark.table(leftTable).hint("merge")
      .join(spark.table(rightTable), col(leftKey) === col(rightKey))
  }
}
