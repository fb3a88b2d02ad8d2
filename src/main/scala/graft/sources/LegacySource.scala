package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.io.NullWritable
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

import graft.operators.CqlPipeline

/**
 * Legacy TSV source (the reference's LegacyHdfs2Cass input path):
 * `HdfsToCassandra\t<v>\t<rowkey>\t<colname>\t[ts]\t[ttl]\t<value>` lines.
 * Multiple paths union (U1). Strict parse — malformed lines fail the job.
 *
 * Two encodings, same parse:
 *  - `read`: newline-delimited text files;
 *  - `readAvroBytes` (the reference's actual S2 wire format,
 *    LegacyHdfs2Cass.java:88-89 `From.avroFile(..., Avros.records(
 *    ByteBuffer.class))`): Avro container files whose records are the raw
 *    primitive `bytes` of one line each, decoded UTF-8.
 */
object LegacySource {

  def read(spark: SparkSession, paths: Seq[String],
      defaultTimestampMillis: Long = System.currentTimeMillis()): DataFrame = {
    require(paths.nonEmpty, "at least one input path required")
    val lines = spark.read.text(paths: _*)
    CqlPipeline.parseLegacy(lines, "value", defaultTimestampMillis)
  }

  /**
   * Avro-container-of-bytes encoding: each record is an Avro primitive
   * `bytes` value holding one legacy TSV line. Container files split on
   * sync markers, so large inputs parallelize like any Hadoop input.
   */
  def readAvroBytes(spark: SparkSession, paths: Seq[String],
      defaultTimestampMillis: Long = System.currentTimeMillis()): DataFrame = {
    require(paths.nonEmpty, "at least one input path required")
    val rdd = spark.sparkContext.newAPIHadoopFile(
      paths.mkString(","),
      classOf[AvroKeyInputFormat[ByteBuffer]],
      classOf[AvroKey[ByteBuffer]],
      classOf[NullWritable])
    val rows = rdd.map { case (k, _) =>
      val bb = k.datum()
      val arr = new Array[Byte](bb.remaining())
      bb.duplicate().get(arr)
      Row(new String(arr, StandardCharsets.UTF_8))
    }
    val lines = spark.createDataFrame(rows,
      StructType(Seq(StructField("value", StringType, nullable = false))))
    CqlPipeline.parseLegacy(lines, "value", defaultTimestampMillis)
  }
}
