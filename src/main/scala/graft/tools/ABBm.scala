package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Same-JVM interleaved A/B for the bm25TopK persist refactor: variant A
 * is the pre-r20 body (the stats pass and the scoring pass each
 * re-tokenize the corpus), variant B is
 * [[graft.operators.Search.bm25TopK]] as shipped. Same inputs as the
 * text_bm25 query, same protocol as [[ABNb]]. Throwaway measurement
 * harness.
 */
object ABBm {
  private def bmOld(docs: DataFrame, idCol: String, textCol: String,
      terms: Seq[String], k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    val toks = graft.operators.TextAnalysis.tokens(col(textCol))
    val base = docs.select(col(idCol), toks.as("_toks"),
      size(toks).cast("long").as("_len"))
    val statCols = Seq(count(lit(1)).as("_n"), sum(col("_len")).as("_tok")) ++
      terms.zipWithIndex.map { case (t, i) =>
        count_if(array_contains(col("_toks"), t)).as(s"_df_$i") }
    val stats = base.agg(statCols.head, statCols.tail: _*).head()
    val n = stats.getLong(0)
    val avgdl = if (n == 0) 1.0 else stats.getLong(1).toDouble / n
    val idf = terms.indices.map { i =>
      val df = stats.getLong(2 + i).toDouble
      math.log(1.0 + (n - df + 0.5) / (df + 0.5))
    }
    val score = terms.zipWithIndex.map { case (t, i) =>
      val tf = graft.functions.array_count_in(col("_toks"), Seq(t)).cast("double")
      lit(idf(i)) * (tf * lit(k1 + 1.0)) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("_len").cast("double") / lit(avgdl)))
    }.reduce(_ + _)
    val scored = base.select(col(idCol), round(score, 4).as("bm25"))
      .filter(col("bm25") > 0)
    scored.agg(graft.functions.TopKAgg.topk_agg(
        col("bm25"), col(idCol).cast("long"), k).as("_top"))
      .select(explode(col("_top")).as("_e"))
      .select(col("_e.c_id").as(idCol), col("_e.sim").as("bm25"))
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
    // the text_bm25 query's own terms
    val terms = Seq("spark", "vector", "customer")
    def run(newPath: Boolean): Double = {
      val d = spark.read.parquet(s"$sfDir/documents.parquet")
      val t0 = System.nanoTime()
      val out =
        if (newPath) graft.operators.Search.bm25TopK(
          d, "doc_id", "text", terms, k = 20)
        else bmOld(d, "doc_id", "text", terms, k = 20)
      out.write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    run(newPath = false); run(newPath = true)
    val a = scala.collection.mutable.ArrayBuffer.empty[Double]
    val b2 = scala.collection.mutable.ArrayBuffer.empty[Double]
    for (_ <- 1 to pairs) { a += run(newPath = false); b2 += run(newPath = true) }
    println(f"[ab] bm25 old: min=${a.min}%6.3f  new(persist): min=${b2.min}%6.3f  " +
      f"ratio=${b2.min / a.min}%5.2f  " +
      (if (b2.min < 0.9 * a.min) "B-WIN" else if (b2.min > 1.1 * a.min) "B-LOSS" else "PAR"))
    spark.stop()
  }
}
