package graft
import org.scalatest.funsuite.AnyFunSuite
import graft.core.EventTime

/** The events `ts` physical type varies by writer/runtime (epoch-nanos
  * BIGINT under old Spark's legacy conf, TIMESTAMP_NTZ under current
  * Spark). What every query and oracle actually depends on is the
  * normalized contract: EventTime yields epoch-MICROS BIGINT either way. */
class EventsReadSpec extends AnyFunSuite {
  test("EventTime normalizes events ts to epoch-micros long") {
    val spark = SparkSuite.spark
    val raw = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    val e = EventTime.withTsUs(raw)
    assert(e.schema("ts_us").dataType.typeName == "long")
    val row = e.selectExpr("min(ts_us)", "max(ts_us)", "count(*)").head()
    assert(row.getLong(2) > 0)
    // sane epoch-micros range: between 2000-01-01 and 2100-01-01
    assert(row.getLong(0) > 946684800000000L, s"min ts_us ${row.getLong(0)}")
    assert(row.getLong(1) < 4102444800000000L, s"max ts_us ${row.getLong(1)}")
  }

  test("EventTime is exact on a synthetic epoch-nanos long column") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val ns = Seq(1700000000123456789L, 1700000001000000000L).toDF("ts")
    val got = EventTime.withTsUs(ns).select("ts_us").as[Long].collect().sorted
    assert(got.sameElements(Array(1700000000123456L, 1700000001000000L)))
  }

  test("EventTime long branch FLOORS pre-epoch nanos (matching NTZ and epoch_us)") {
    val spark = SparkSuite.spark
    import spark.implicits._
    // -1500 ns is inside micro -2 under floor semantics (DuckDB epoch_us
    // and the NTZ decomposition agree); div-toward-zero would say -1
    val ns = Seq(-1500L, -1000L, -999L, -1L, 0L, 999L, 1000L).toDF("ts")
    val got = EventTime.withTsUs(ns).select("ts", "ts_us").as[(Long, Long)]
      .collect().toMap
    assert(got === Map(-1500L -> -2L, -1000L -> -1L, -999L -> -1L,
      -1L -> -1L, 0L -> 0L, 999L -> 0L, 1000L -> 1L))
  }

  test("EventTime on TIMESTAMP_NTZ is session-timezone invariant (DST zone)") {
    val spark = SparkSuite.spark
    import spark.implicits._
    // NTZ wall clock taken as UTC: 2021-07-01T12:00:00.123456 (DST in
    // America/New_York; its 1970 offset differs from its July offset, the
    // exact case an NTZ->LTZ session-zone coercion gets wrong by 1h)
    val df = Seq("2021-07-01 12:00:00.123456", "1969-12-31 23:59:59.5")
      .toDF("s").selectExpr("cast(s as timestamp_ntz) as ts")
    assert(df.schema("ts").dataType.typeName == "timestamp_ntz")
    val expect = Array(-500000L, 1625140800123456L)
    val prior = spark.conf.get("spark.sql.session.timeZone")
    try {
      for (tz <- Seq("UTC", "America/New_York", "Asia/Kolkata")) {
        spark.conf.set("spark.sql.session.timeZone", tz)
        val got = EventTime.withTsUs(df).select("ts_us").as[Long].collect().sorted
        assert(got.sameElements(expect), s"tz=$tz: ${got.toSeq}")
      }
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("EventTime NTZ decomposition round-trips arbitrary epoch micros") {
    val spark = SparkSuite.spark
    import spark.implicits._
    // deterministic pseudo-random micros across 1970..2100, negative
    // (pre-epoch) values included, plus exact boundary instants
    val rng = new scala.util.Random(13)
    val bounds = Seq(0L, -1L, 1L, 86400000000L - 1, 86400000000L,
      -86400000000L, 4102444799999999L)
    val micros = bounds ++ Seq.fill(500)(
      rng.between(-86400000000L * 365, 4102444800000000L))
    // the LTZ->NTZ cast interprets via the session zone: pin UTC so the
    // NTZ wall clock IS the instant being round-tripped
    val prior = spark.conf.get("spark.sql.session.timeZone")
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    try {
      val df = micros.toDF("us")
        .selectExpr("us", "cast(timestamp_micros(us) as timestamp_ntz) as ts")
      val bad = EventTime.withTsUs(df)
        .filter(org.apache.spark.sql.functions.col("ts_us") =!=
          org.apache.spark.sql.functions.col("us"))
        .select("us", "ts_us").collect()
      assert(bad.isEmpty, s"round-trip mismatches: ${bad.take(5).toSeq}")
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }

  test("EventTime rejects non-temporal ts types") {
    val spark = SparkSuite.spark
    import spark.implicits._
    val bad = Seq("x").toDF("ts")
    intercept[IllegalArgumentException](EventTime.withTsUs(bad))
  }
}
