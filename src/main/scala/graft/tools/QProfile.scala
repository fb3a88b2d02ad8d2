package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/**
 * Per-query job/stage profiler for the optimization loop: runs each named
 * query through the noop sink (the bench's timed action) with a listener
 * that attributes wall time to Spark JOBS and STAGES — which job (count,
 * k-means iteration, checkpoint materialization, final write) and which
 * stage (scan, exchange, result) the seconds actually go to, without a UI.
 *
 *   sbt "runMain graft.tools.QProfile <query>[,<query>...]"
 *
 * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
 * Each query runs once unprofiled (warm-up: JIT, parquet footers), then
 * once with the listener attached. Output is one line per job with its
 * stages' (duration, tasks, input, shuffle read/write) rolled up.
 */
object QProfile {
  private final class Acc extends SparkListener {
    case class StageAgg(var name: String = "", var ms: Long = 0,
      var tasks: Int = 0, var input: Long = 0, var sr: Long = 0,
      var sw: Long = 0, var spill: Long = 0)
    val stages = scala.collection.concurrent.TrieMap.empty[Int, StageAgg]
    val stageToJob = scala.collection.concurrent.TrieMap.empty[Int, Int]
    val jobT0 = scala.collection.concurrent.TrieMap.empty[Int, Long]
    val jobMs = scala.collection.concurrent.TrieMap.empty[Int, Long]
    override def onJobStart(e: SparkListenerJobStart): Unit = {
      jobT0(e.jobId) = e.time
      e.stageIds.foreach(s => stageToJob(s) = e.jobId)
    }
    override def onJobEnd(e: SparkListenerJobEnd): Unit =
      jobMs(e.jobId) = e.time - jobT0.getOrElse(e.jobId, e.time)
    override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
      val si = e.stageInfo
      val a = stages.getOrElseUpdate(si.stageId, StageAgg())
      a.name = si.name.takeWhile(_ != '\n')
      a.ms = (for (s <- si.submissionTime; c <- si.completionTime)
        yield c - s).getOrElse(0L)
      a.tasks = si.numTasks
      val m = si.taskMetrics
      if (m != null) {
        a.input = m.inputMetrics.bytesRead
        a.sr = m.shuffleReadMetrics.totalBytesRead
        a.sw = m.shuffleWriteMetrics.bytesWritten
        a.spill = m.memoryBytesSpilled
      }
    }
    def report(): String = {
      val sb = new StringBuilder
      def mb(b: Long) = f"${b / 1048576.0}%.1fMB"
      jobMs.toSeq.sortBy(_._1).foreach { case (j, ms) =>
        sb ++= f"  job $j%3d ${ms / 1000.0}%7.3fs\n"
        stages.toSeq.filter(s => stageToJob.get(s._1).contains(j))
          .sortBy(_._1).foreach { case (sid, a) =>
            sb ++= f"    stage $sid%4d ${a.ms / 1000.0}%7.3fs t=${a.tasks}%-4d " +
              f"in=${mb(a.input)}%-9s sr=${mb(a.sr)}%-9s sw=${mb(a.sw)}%-9s" +
              (if (a.spill > 0) f" SPILL=${mb(a.spill)}" else "") +
              f"  ${a.name}\n"
          }
      }
      sb.toString
    }
  }

  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("")
      .split(",").map(_.trim).filter(_.nonEmpty)
    require(names.nonEmpty, "usage: QProfile <query>[,<query>...]")
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
    names.foreach { name =>
      val fn = SparkEntry.queries(name)
      // warm-up pass (unprofiled)
      val tw0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val warm = (System.nanoTime() - tw0) / 1e9
      val acc = new Acc
      spark.sparkContext.addSparkListener(acc)
      val t0 = System.nanoTime()
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      // let the (async) listener bus drain before reading the accumulators
      Thread.sleep(1000)
      spark.sparkContext.removeSparkListener(acc)
      println(f"== $name warm=$warm%.3fs profiled=$sec%.3fs")
      println(acc.report())
    }
    spark.stop()
  }
}
