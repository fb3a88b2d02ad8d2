package graft
import org.scalatest.funsuite.AnyFunSuite
class EventsReadSpec extends AnyFunSuite {
  test("events ns timestamps readable with nanosAsLong") {
    val spark = SparkSuite.spark
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val e = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    assert(e.schema("ts").dataType.typeName == "long")
    assert(e.count() > 0)
    e.show(2, false)
  }
}
