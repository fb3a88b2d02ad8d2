package graft
import org.scalatest.funsuite.AnyFunSuite
class PlanSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  val sf = "/root/testdata/sf0.01"
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("s1: filter and projection pushed to parquet scan") {
    val p = plan("s1_scan_project")
    println(p.linesIterator.filter(l => l.contains("PushedFilters") || l.contains("ReadSchema")).mkString("\n"))
    assert(p.contains("PushedFilters: ["))
    assert(!p.contains("PushedFilters: []"))
  }
  test("q3: dimension join is broadcast") {
    val p = plan("q3_join_topk")
    println(p.linesIterator.filter(_.contains("Join")).mkString("\n"))
    assert(p.contains("BroadcastHashJoin"))
  }
  test("q1: partial aggregation before exchange") {
    val p = plan("q1_agg")
    assert(p.contains("HashAggregate"))
    assert(p.contains("Exchange"))
  }
  test("embed topk: bounded-heap aggregate with map-side partial, no window shuffle") {
    // the row_number() window form would shuffle every scored row into
    // #distinct(q_id) partitions; the TopKAgg form must show a partial
    // ObjectHashAggregate BEFORE the exchange and no Window node at all
    for (q <- Seq("embed_knn", "embed_lsh_topk")) {
      val p = plan(q)
      assert(!p.contains("Window"), s"$q still ranks via a window:\n${p.take(1500)}")
      // partial-mode aggregate prints as partial_topk_agg — its presence
      // (plus the exchange) proves map-side reduction to <=k rows per query
      // happens before any shuffle
      assert(p.contains("partial_topk_agg"),
        s"$q has no partial topk aggregation:\n${p.take(2000)}")
      assert(p.contains("ObjectHashAggregate") && p.contains("Exchange"),
        s"$q plan shape unexpected:\n${p.take(2000)}")
    }
  }
  test("text_repetition is scan-stage only: no exchange, fully codegen'd") {
    // the top-word count comes from the in-row max_token_count kernel; the
    // explode + groupBy(doc, word) + max form it replaces would show two
    // Exchanges here. A shuffle appearing in this plan is a regression.
    val p = plan("text_repetition")
    assert(!p.contains("Exchange"), s"repetition signals shuffle:\n${p.take(2000)}")
    assert(!p.contains("Generate"), s"explode crept back in:\n${p.take(2000)}")
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(2000))
  }
  test("corpus_split is scan-stage only: no exchange") {
    // split + mix assignment are md5-bucket scan predicates; any Exchange
    // here means someone turned them into a join or sample
    val p = plan("corpus_split")
    assert(!p.contains("Exchange"), s"split assignment shuffles:\n${p.take(2000)}")
  }
  test("decontaminate broadcasts the eval side; corpus text never shuffles") {
    val p = plan("decontaminate")
    assert(p.contains("BroadcastHashJoin"), s"eval side not broadcast:\n${p.take(2000)}")
    // the only exchange allowed is the final count aggregation of
    // (id, shingle) hits — the corpus relation itself must not round-trip
    assert(!p.contains("SortMergeJoin"), s"corpus-side shuffle join:\n${p.take(2000)}")
  }
  test("whole-stage codegen active in scan queries") {
    val df = SparkEntry.queries("p1_cql_projection")(spark, sf)
    df.count() // materialize AQE final plan
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("WholeStageCodegen") || p.contains("*("), p.take(2000))
  }
}
