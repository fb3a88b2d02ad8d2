package graft.tools

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/**
 * Dump `explain("formatted")` for a named list of queries into per-query
 * files — the before/after plan evidence an optimization round commits
 * under `plans/rNN/`.
 *
 *   sbt "runMain graft.tools.PlanGrab <outDir> <suffix> <q1,q2,...>"
 *
 * writes `<outDir>/<query>_<suffix>.txt` for each query. Env:
 * SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32) —
 * the bench's own session shape, so the dumped plan is the benched plan.
 */
object PlanGrab {
  def main(args: Array[String]): Unit = {
    require(args.length >= 3, "usage: PlanGrab <outDir> <suffix> <q1,q2,...>")
    val Array(outDir, suffix, qcsv) = args.take(3)
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Files.createDirectories(Paths.get(outDir))
    names.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val txt = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.write(Paths.get(outDir, s"${name}_$suffix.txt"),
        txt.getBytes(StandardCharsets.UTF_8))
      println(s"[plangrab] $name -> $outDir/${name}_$suffix.txt")
    }
    spark.stop()
  }
}
