package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/**
 * Same-JVM interleaved A/B for the naiveBayes persist refactor: variant A
 * is the pre-r20 body (no persist — lw and the doc tokenization recompute
 * per consumer), variant B is [[graft.operators.Classify.naiveBayes]] as
 * shipped. Same inputs as the classify_nb query, same noop-sink protocol
 * as [[ABProp]]. Throwaway measurement harness — delete with the round's
 * A/B gates once the decision is recorded.
 */
object ABNb {
  // the pre-persist body, verbatim except for the persist/checkpoint
  private def nbOld(docs: DataFrame, train: DataFrame, idCol: String,
      textCol: String, labelCol: String, alpha: Double): DataFrame = {
    val toks = graft.operators.TextAnalysis.tokens(col(textCol))
    val trainTok = train.select(col(labelCol).as("_l"), explode(toks).as("_w"))
    val lw = trainTok.groupBy(col("_l"), col("_w"))
      .agg(count(lit(1)).as("_clw"))
    val lTotals = lw.groupBy(col("_l")).agg(sum(col("_clw")).as("_cl"))
    val vocab = lw.select(col("_w")).distinct().count().toDouble
    val priors = train.groupBy(col(labelCol).as("_l"))
      .agg(count(lit(1)).as("_nd"))
    val totalDocs = train.count().toDouble
    val evidence = docs.select(col(idCol), explode(toks).as("_w"))
      .join(lw, "_w")
      .groupBy(col(idCol), col("_l"))
      .agg(sum(log((col("_clw").cast(DoubleType) + lit(alpha)) / lit(alpha)))
        .as("_s"))
    val labels = priors.join(lTotals, "_l")
    val frame = docs.select(col(idCol), size(toks).cast(DoubleType).as("_n"))
      .crossJoin(broadcast(labels))
    val score = round(
      log(col("_nd").cast(DoubleType) / lit(totalDocs)) +
        col("_n") * (log(lit(alpha)) -
          log(col("_cl").cast(DoubleType) + lit(alpha * vocab))) +
        coalesce(col("_s"), lit(0.0)), 4)
    frame.join(evidence, Seq(idCol, "_l"), "left")
      .select(col(idCol), col("_l"), score.as("_score"))
      .groupBy(col(idCol))
      .agg(min(struct((-col("_score")).as("_ns"), col("_l").as("_lbl"))).as("_b"))
      .select(col(idCol), col("_b._lbl").as("pred_label"),
        round(-col("_b._ns"), 4).as("score"))
  }

  def main(args: Array[String]): Unit = {
    val pairs = if (args.nonEmpty) args(0).toInt else 5
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
    def run(newPath: Boolean): Double = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val train = d.filter(col("doc_id") % 5 === 0)
      val t0 = System.nanoTime()
      val out =
        if (newPath) graft.operators.Classify.naiveBayes(
          d, train, "doc_id", "text", "lang", alpha = 1.0)
        else nbOld(d, train, "doc_id", "text", "lang", alpha = 1.0)
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(newPath = false); run(newPath = true) // warm both, unmeasured
    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to pairs) { a += run(newPath = false); b += run(newPath = true) }
    println(f"[ab] naive_bayes old: min=${a.min}%6.3f  new(persist): " +
      f"min=${b.min}%6.3f  ratio=${b.min / a.min}%5.2f  " +
      (if (b.min < 0.9 * a.min) "B-WIN" else if (b.min > 1.1 * a.min) "B-LOSS" else "PAR"))
    spark.stop()
  }
}
