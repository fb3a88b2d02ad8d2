package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/**
 * Same-JVM interleaved A/B for the `widenScan` knob: for each named
 * query, alternate `graft.widen=off|on` passes (off,on,off,on,...)
 * through the noop sink and report per-mode min/median. Interleaving
 * inside ONE process under min-of-N is the only comparison that
 * survives this box's external-load oscillation (cross-process
 * before/after runs disagreed with themselves by 2x).
 *
 *   sbt "runMain graft.tools.ABWiden <q1,q2,...> [pairs]"
 */
object ABWiden {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "usage: ABWiden <q1,q2,...> [pairs]")
    val pairs = if (args.length > 1) args(1).toInt else 4
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()
    def run(name: String, mode: String): Double = {
      System.setProperty("graft.widen", mode)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def stats(xs: Seq[Double]): String = {
      val s = xs.sorted
      f"min=${s.head}%6.3f med=${s(s.size / 2)}%6.3f"
    }
    names.foreach { name =>
      run(name, "off"); run(name, "on") // warm both shapes, unmeasured
      val off = scala.collection.mutable.ArrayBuffer.empty[Double]
      val on = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to pairs) {
        off += run(name, "off")
        on += run(name, "on")
      }
      val verdict =
        if (on.min < 0.9 * off.min) "WIN"
        else if (on.min > 1.1 * off.min) "LOSS"
        else "PAR"
      println(f"[ab] $name%-28s off: ${stats(off.toSeq)}  " +
        f"on: ${stats(on.toSeq)}  ratio=${on.min / off.min}%5.2f  $verdict")
    }
    spark.stop()
  }
}
