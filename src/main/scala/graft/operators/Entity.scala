package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Blocked fuzzy entity matching / resolution — record linkage over noisy
 * name-like columns (the classic Fellegi-Sunter blocking shape). The
 * reference pipeline has no joins at all (SURVEY §2.5); this is a
 * north-star operator at the same dataflow altitude as the dedup family:
 * candidate generation must never be all-pairs.
 *
 * Scale shape (the 100 TB lens):
 *   - matching runs over the DISTINCT normalized name set, not the record
 *     stream — a map-side-combinable distinct first, so a billion rows
 *     with a million distinct names do a million-row match;
 *   - candidates come from a cheap equi-join on a blocking key (name
 *     prefix by default) — work is sum(block²), never corpus²;
 *   - oversized blocks (a degenerate prefix like "the ") are EXCLUDED,
 *     loudly, by `maxBlock` — the df-cap contract `ngramJaccardPairs`
 *     uses: bounded work, documented recall loss on pathological keys;
 *   - the edit-distance predicate uses Spark's thresholded levenshtein
 *     (early-exit row-wise; returns -1 past the cap) so the verifier
 *     costs O(maxDist * len) per candidate, not O(len²).
 */
object Entity {

  /** lower(trim(name)), the normalization both match and resolve share. */
  private def norm(nameCol: String): Column = lower(trim(col(nameCol)))

  /**
   * Candidate fuzzy pairs over the distinct normalized names of
   * `nameCol`: same `blockPrefix`-char prefix, Levenshtein distance
   * <= `maxDist`. Output (name_a, name_b, dist) with name_a < name_b,
   * one row per unordered pair. Blocks larger than `maxBlock` distinct
   * names are excluded (bounded-work contract; raise `maxBlock` or use a
   * longer prefix when precision on pathological prefixes matters).
   */
  def fuzzyNamePairs(df: DataFrame, nameCol: String, blockPrefix: Int = 1,
      maxDist: Int = 3, maxBlock: Long = 1000000L): DataFrame = {
    require(blockPrefix >= 1, "blockPrefix must be >= 1")
    require(maxDist >= 1, "maxDist must be >= 1")
    val names = df.select(norm(nameCol).as("_nm"))
      .filter(length(col("_nm")) > 0).distinct()
    // block cap via a windowless count join: the block-count aggregate is
    // tiny (one row per block) and broadcast back onto the name set
    val blocked = names.withColumn("_blk", substring(col("_nm"), 1, blockPrefix))
    val sized = blocked.groupBy(col("_blk")).agg(count(lit(1)).as("_bn"))
      .filter(col("_bn") <= maxBlock).drop("_bn")
    val inBlock = blocked.join(sized, Seq("_blk"))
    val a = inBlock.select(col("_blk"), col("_nm").as("name_a"))
    val b = inBlock.select(col("_blk"), col("_nm").as("name_b"))
    a.join(b, Seq("_blk"))
      .filter(col("name_a") < col("name_b"))
      // thresholded levenshtein: -1 past maxDist, true distance otherwise
      .withColumn("dist", levenshtein(col("name_a"), col("name_b"), maxDist))
      .filter(col("dist") >= 0)
      .select(col("name_a"), col("name_b"), col("dist").cast(LongType))
  }

  /**
   * Full entity resolution: fuzzy pairs -> connected components -> one
   * canonical (minimum) name per component. Every distinct normalized
   * name appears exactly once; names with no fuzzy neighbor are their own
   * canonical. Output (name, canon).
   *
   * Components reuse [[Dedup.dupClusters]]'s min-label propagation
   * (edge-sized rounds, O(component diameter) iterations); singleton
   * names never enter the loop — they are re-attached with a left join,
   * so the iterative job only ever sees the (small) matched-pair graph.
   */
  def resolveEntities(df: DataFrame, nameCol: String, blockPrefix: Int = 1,
      maxDist: Int = 3, maxBlock: Long = 1000000L): DataFrame = {
    val pairs = fuzzyNamePairs(df, nameCol, blockPrefix, maxDist, maxBlock)
      .select(col("name_a").as("doc_a"), col("name_b").as("doc_b"))
    val clusters = Dedup.dupClusters(pairs)
      .select(col("doc_id").as("_nm"), col("cluster_id").as("_canon"))
    df.select(norm(nameCol).as("_nm"))
      .filter(length(col("_nm")) > 0).distinct()
      .join(clusters, Seq("_nm"), "left")
      .select(col("_nm").as("name"),
        coalesce(col("_canon"), col("_nm")).as("canon"))
  }
}
