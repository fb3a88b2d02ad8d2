package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Skew-handling utilities for 100 TB joins. AQE's skew-join splitting
 * (spark.sql.adaptive.skewJoin) covers sort-merge joins at runtime; these
 * helpers cover the cases AQE can't: a hot key exploding a shuffled join's
 * single partition when the build side must be shuffled too.
 *
 * Salting: the hot (large) side gets a random salt in [0, factor); the
 * small side is replicated `factor` times with every salt value. The join
 * key becomes (key, salt), spreading each hot key across `factor` tasks.
 * Results are identical to the unsalted join; cost is replicating the
 * smaller side.
 */
object Skew {

  /**
   * Inner equi-join with the left (large, skewed) side salted and the
   * right side replicated. Use when the right side is too big to
   * broadcast but small enough to replicate `factor` times.
   */
  def saltedJoin(large: DataFrame, small: DataFrame, key: String,
      factor: Int = 8): DataFrame = {
    require(factor > 1, "salt factor must be > 1")
    // deterministic salt (hash of all large-side columns) so re-runs and
    // retried tasks route rows identically — rand() would break retries
    val salted = large.withColumn("_salt",
      pmod(hash(large.columns.map(col): _*), lit(factor)))
    val replicated = small.withColumn("_salt",
      explode(array((0 until factor).map(lit): _*)))
    salted.join(replicated, Seq(key, "_salt")).drop("_salt")
  }

  /**
   * Two-phase aggregation for skewed group-by keys: pre-aggregate on
   * (key, salt), then merge per key. Spark's partial aggregation already
   * does this map-side; this explicit form helps when the partial agg
   * can't reduce (e.g. collect_list-ish or high-cardinality-per-key
   * states) and one reducer key dominates.
   */
  def saltedCountSum(df: DataFrame, keyCols: Seq[String], valueCol: String,
      factor: Int = 8): DataFrame = {
    val salt = pmod(hash(col(valueCol)), lit(factor))
    df.withColumn("_salt", salt)
      .groupBy((keyCols.map(col) :+ col("_salt")): _*)
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("sum_value"))
  }
}
