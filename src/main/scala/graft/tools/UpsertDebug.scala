package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.operators.Lakehouse

/** Scratch reproducer for the soak's upsert drift (delete before merge). */
object UpsertDebug {
  def main(args: Array[String]): Unit = {
    val n = if (args.length > 0) args(0).toLong else 100000L
    val base = "/tmp/graft-upsert-debug"
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def mk(lo: Long, hi: Long) = spark.range(lo, hi).select(
      pmod(xxhash64(col("id")), lit(1000)).as("k"),
      col("id").as("t"),
      pmod(xxhash64(col("id") + 7), lit(100000)).cast("double").as("v"))
    org.apache.commons.io.FileUtils.deleteDirectory(new java.io.File(base))
    Lakehouse.writeClustered(mk(0, n), base, Seq("k", "t"), files = 64)
    val before = Lakehouse.readManifest(spark, base)
      .agg(sum(col("n_rows"))).head().getLong(0)
    val (fw, rep, ups) =
      Lakehouse.upsertByKey(spark, base, mk(0, 10000), Seq("t"), files = 2)
    val after = Lakehouse.readManifest(spark, base)
      .agg(sum(col("n_rows"))).head().getLong(0)
    val data = Lakehouse.prunedRead(spark, base, "k", 0, 999)
    val truth = mk(0, n)
    val missing = truth.exceptAll(data).count()
    val extra = data.exceptAll(truth).count()
    val distinctT = data.select(col("t")).distinct().count()
    println(s"DEBUG files=$fw replaced=$rep upserted=$ups " +
      s"rows_before=$before rows_after=$after " +
      s"missing=$missing extra=$extra distinct_t=$distinctT")
    val missRows = truth.exceptAll(data).limit(5).collect()
    missRows.foreach(r => println(s"MISSING: $r"))
    val extraRows = data.exceptAll(truth).limit(5).collect()
    extraRows.foreach(r => println(s"EXTRA:   $r"))
    spark.stop()
  }
}
