package graft.tools

import java.lang.management.ManagementFactory

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/**
 * Diagnostic for the in-suite JVM-context inflation (VERDICT r20 #1):
 * graph_triangles measured 4.58 s in a fresh JVM vs 8.34 s inside the
 * 135-query bench — same code, same box. This tool isolates WHAT the
 * long-lived session accumulates, inside ONE JVM (the only comparison
 * shape the box's load oscillation cannot fake):
 *
 *   1. measure a probe query set isolated (min of N);
 *   2. run the full timed suite once (the bench's pass shape);
 *   3. measure the probes again — the inflation, if any;
 *   4. force a full GC (and let ContextCleaner drain its queue), then
 *      measure a third time — if the inflation reverts, the cause is
 *      GC-reclaimable state (lingering localCheckpoint / cache blocks of
 *      dead frames), not codegen-cache or JIT regression.
 *
 * Storage state (persistent-RDD count, cached mem/disk bytes) and
 * cumulative GC time are printed at each phase boundary.
 *
 *   sbt "runMain graft.tools.SuiteCtx [probe1,probe2,...] [minOf]"
 *
 * Env: SPARK_GRAFT_SF_DIR (default sf0.1), SPARK_GRAFT_CPUS (default 32).
 */
object SuiteCtx {
  def main(args: Array[String]): Unit = {
    val probes = args.headOption.filter(_.nonEmpty)
      .getOrElse("graph_triangles,graph_pagerank")
      .split(",").map(_.trim).filter(_.nonEmpty).toSeq
    val minOf = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = graft.Sessions.withEngineDefaults(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/region.parquet").count()

    def gcMs: Long = ManagementFactory.getGarbageCollectorMXBeans
      .toArray.map(_.asInstanceOf[java.lang.management.GarbageCollectorMXBean]
        .getCollectionTime).sum
    def storage(tag: String): Unit = {
      val infos = spark.sparkContext.getRDDStorageInfo
      val mem = infos.map(_.memSize).sum / 1048576.0
      val dsk = infos.map(_.diskSize).sum / 1048576.0
      println(f"[ctx] $tag%-18s persistedRdds=${infos.length}%-4d " +
        f"cachedMem=${mem}%8.1fMB cachedDisk=${dsk}%8.1fMB gc=${gcMs / 1000.0}%7.2fs")
    }
    def run(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    def probe(tag: String): Unit = probes.foreach { p =>
      val xs = (1 to minOf).map(_ => run(p))
      println(f"[probe] $tag%-12s $p%-20s min=${xs.min}%6.3f " +
        f"all=${xs.map(x => f"$x%.3f").mkString(",")}")
    }

    probes.foreach(run) // warm-up: JIT + footers, unmeasured
    storage("fresh")
    probe("fresh")
    storage("post-probe")

    val names = SparkEntry.queries.keys.toSeq
      .filterNot(SparkEntry.benchExempt.contains).sorted
    val t0 = System.nanoTime()
    names.foreach { n =>
      try run(n)
      catch { case e: Throwable =>
        System.err.println(s"[ctx] $n failed: ${e.getMessage}")
      }
    }
    println(f"[ctx] suite pass of ${names.size} queries took " +
      f"${(System.nanoTime() - t0) / 1e9}%.1fs")
    storage("post-suite")
    probe("in-suite")
    storage("post-probe2")

    // phase 3: force GC so weak refs enqueue, give ContextCleaner time to
    // drain unpersists, then re-probe. SPARK_GRAFT_CTX_NOGC=1 skips the
    // GC but keeps the third probe round — the JIT-warming control: if
    // the third round is equally faster WITHOUT the GC, the phase-2 to
    // phase-3 delta is execution-count JIT depth, not reclaimed memory.
    val noGc = sys.env.get("SPARK_GRAFT_CTX_NOGC").contains("1")
    if (!noGc) {
      System.gc()
      Thread.sleep(3000)
      System.gc()
      Thread.sleep(2000)
    } else Thread.sleep(5000)
    storage(if (noGc) "post-nogc" else "post-gc")
    probe(if (noGc) "post-nogc" else "post-gc")
    storage("final")
    spark.stop()
  }
}
