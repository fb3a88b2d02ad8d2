package graft
import org.apache.spark.sql.SparkSession

/**
 * Benchmark main: one JSON line with per-query wall times at the target
 * scale factor. Queries are forced through the noop sink (full
 * materialization of every row — a bare count() lets parquet metadata or
 * pruned projections short-circuit the work being measured). A small
 * warm-up query amortizes JVM/session startup out of the first measurement.
 */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warm-up, not measured: parquet footer caches plus one full
    // query through the noop sink so JIT/codegen startup is not billed to
    // whichever query happens to sort first
    spark.read.parquet(s"$sfDir/region.parquet").count()
    try SparkEntry.queries("q1_agg")(spark, sfDir)
      .write.format("noop").mode("overwrite").save()
    catch { case scala.util.control.NonFatal(e) =>
      System.err.println(s"[bench] warm-up failed: ${e.getMessage}")
    }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
      }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    val line = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}"""
    // stdout (raw — build.sbt sets run/outputStrategy := StdoutOutput so the
    // forked JVM's output is not wrapped in sbt's "[info] " logger prefix)
    // plus a file copy so the caller can read it either way.
    println(line)
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "bench_out.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      (line + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
    spark.stop()
  }
}
