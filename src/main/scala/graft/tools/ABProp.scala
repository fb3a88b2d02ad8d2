package graft.tools

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/**
 * Same-JVM interleaved A/B for an arbitrary SYSTEM PROPERTY read at query
 * construction time — the generalization of [[ABWiden]] (which hardcodes
 * `graft.widen`) used to gate a candidate CODE path off/on per pass while
 * a change is being measured. Same protocol and rationale: alternate
 * A,B,A,B,... passes through the noop sink inside one process, min-of-N
 * per mode — the only comparison shape that survives this box's
 * external-load oscillation.
 *
 *   sbt "runMain graft.tools.ABProp <propKey> <valA> <valB> <q1,q2,...> [pairs]"
 */
object ABProp {
  def main(args: Array[String]): Unit = {
    require(args.length >= 4, "usage: ABProp <propKey> <valA> <valB> <q1,...> [pairs]")
    val Array(key, valA, valB, qcsv) = args.take(4)
    val names = qcsv.split(",").map(_.trim).filter(_.nonEmpty)
    val pairs = if (args.length > 4) args(4).toInt else 4
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
    def run(name: String, v: String): Double = {
      System.setProperty(key, v)
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
      run(name, valA); run(name, valB) // warm both shapes, unmeasured
      val a = scala.collection.mutable.ArrayBuffer.empty[Double]
      val b = scala.collection.mutable.ArrayBuffer.empty[Double]
      for (_ <- 1 to pairs) {
        a += run(name, valA)
        b += run(name, valB)
      }
      val verdict =
        if (b.min < 0.9 * a.min) "B-WIN"
        else if (b.min > 1.1 * a.min) "B-LOSS"
        else "PAR"
      println(f"[ab] $name%-28s A($valA%s): ${stats(a.toSeq)}  " +
        f"B($valB%s): ${stats(b.toSeq)}  ratio=${b.min / a.min}%5.2f  $verdict")
    }
    spark.stop()
  }
}
