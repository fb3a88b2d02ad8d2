package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.CqlPipeline

/**
 * Legacy TSV source (the reference's LegacyHdfs2Cass input path,
 * LegacyHdfs2Cass.java:88-89): newline-delimited
 * `HdfsToCassandra\t<v>\t<rowkey>\t<colname>\t[ts]\t[ttl]\t<value>` lines.
 * Multiple paths union (U1). Strict parse — malformed lines fail the job.
 */
object LegacySource {

  def read(spark: SparkSession, paths: Seq[String],
      defaultTimestampMillis: Long = System.currentTimeMillis()): DataFrame = {
    require(paths.nonEmpty, "at least one input path required")
    val lines = spark.read.text(paths: _*)
    CqlPipeline.parseLegacy(lines, "value", defaultTimestampMillis)
  }
}
