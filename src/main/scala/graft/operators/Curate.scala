package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * End-to-end corpus curation — the composition a pretraining data
 * pipeline actually runs, assembled from the graft operators:
 *
 *   1. quality scoring + filter (cheap, in the scan stage);
 *   2. language filter (stopword/CJK heuristic);
 *   3. exact dedup (fingerprint hash-groupBy, min-id survivor);
 *   4. near-dup clustering (MinHash+LSH pairs -> connected components),
 *      keeping only each cluster's minimum-id member.
 *
 * Ordering matters at scale: the per-row filters run first (no shuffle),
 * exact dedup halves the near-dup candidate load, and LSH only ever
 * shuffles ids + band signatures.
 */
object Curate {

  final case class CurationStats(
      input: Long, afterQuality: Long, afterLang: Long,
      afterExact: Long, afterNearDup: Long)

  /**
   * Returns (curated corpus, stats). `langs` empty means keep all
   * languages.
   */
  def curateCorpus(docs: DataFrame, idCol: String, textCol: String,
      minQuality: Double = 0.3, langs: Set[String] = Set("en"),
      nearDupThreshold: Double = 0.8): (DataFrame, CurationStats) = {
    val input = docs.count()

    val scored = TextAnalysis.withQuality(docs, textCol)
      .filter(col("quality") >= minQuality)
    val afterQuality = scored.count()

    val langFiltered =
      if (langs.isEmpty) scored
      else TextAnalysis.withLangId(scored, textCol)
        .filter(col("predicted_lang").isin(langs.toSeq: _*))
    val afterLang = langFiltered.count()

    // exact dedup: keep the min-id doc per fingerprint
    val withFp = langFiltered.withColumn("fingerprint",
      TextAnalysis.fingerprint(col(textCol)))
    val survivors = withFp.groupBy(col("fingerprint"))
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)
    // join keeps every copy of the surviving id — collapse to one row
    val exact = withFp.join(survivors, idCol).dropDuplicates(idCol).drop("fingerprint")
    val afterExact = exact.count()

    // near-dup: drop every cluster member except the minimum id
    val pairs = Dedup.minhashLshPairs(exact, idCol, textCol,
      threshold = nearDupThreshold)
    val clusters = Dedup.dupClusters(pairs)
    val losers = clusters.filter(col("doc_id") =!= col("cluster_id"))
      .select(col("doc_id").as(idCol))
    val curated = exact.join(losers, Seq(idCol), "left_anti")
    val afterNearDup = curated.count()

    (curated, CurationStats(input, afterQuality, afterLang, afterExact, afterNearDup))
  }
}
