package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Similarity search over an embedding column (array<float>).
 *
 * Baseline: brute-force cosine top-k — the query side is broadcast, the
 * corpus side streams through one scan (no shuffle until the tiny top-k
 * aggregation), so it scales to any corpus size that can be scanned; cost
 * is O(|corpus| * |queries| * dim).
 *
 * Scale path: random-hyperplane LSH bucketing (signBucket) — candidates
 * only within matching buckets, turning top-k into a bucket-local scan.
 * Hyperplane components are md5-derived so any engine reproduces them.
 *
 * All math is double-precision Catalyst expressions (zip_with + aggregate)
 * — deterministic and engine-portable, no UDFs.
 */
object Similarity {

  /** Sum of element products in double precision (sequential, stable order). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast(DoubleType) * y.cast(DoubleType)),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))

  /**
   * Brute-force top-k: for each query vector, the k nearest corpus vectors
   * by cosine (rounded for cross-engine determinism, tie-broken by id).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, k: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"))
    val scored = c.crossJoin(broadcast(q))
      .withColumn("sim", round(cosine(col("q_vec"), col("c_vec")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("sim"), col("rank"))
  }

  /**
   * Random-hyperplane sign bucket: `planes` md5-derived hyperplanes; bit p
   * is set when dot(v, plane_p) > 0. Equal buckets are ANN candidates.
   * plane_p[c] = +1 if the first hex digit of md5("p|c") is < '8' else -1.
   */
  def signBucket(vec: Column, dim: Int, planes: Int = 8): Column = {
    val bits = (0 until planes).map { p =>
      val plane = (0 until dim).map(c => planeComponent(p, c).toDouble)
      // one zip_with/aggregate pass per plane beats a dim-wide expression
      // tree of element_at terms (O(dim) vs O(dim^2) positional lookups)
      val s = dot(vec, typedlit(plane))
      when(s > 0, lit(1L << p)).otherwise(lit(0L))
    }
    bits.reduce(_ + _).cast(LongType)
  }

  /** Deterministic +-1 hyperplane component (md5-derived, public recipe). */
  def planeComponent(plane: Int, component: Int): Int = {
    val digest = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$plane|$component".getBytes("UTF-8"))
    if ((digest(0) & 0x80) == 0) 1 else -1
  }

  /**
   * LSH-bucketed ANN: group corpus by sign bucket, search each query only
   * in its own bucket. Recall < 1 by construction; the bucket join replaces
   * the cross join, so cost is O(corpus/2^planes) per query.
   */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
      vecCol: String, dim: Int, k: Int, planes: Int = 8): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val q = queries.select(col(idCol).as("q_id"), col(vecCol).as("q_vec"),
      signBucket(col(vecCol), dim, planes).as("bucket"))
    val c = corpus.select(col(idCol).as("c_id"), col(vecCol).as("c_vec"),
      signBucket(col(vecCol), dim, planes).as("bucket"))
    val scored = c.join(broadcast(q), "bucket")
      .withColumn("sim", round(cosine(col("q_vec"), col("c_vec")), 4))
    val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("c_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("q_id"), col("c_id"), col("sim"), col("rank"))
  }
}
