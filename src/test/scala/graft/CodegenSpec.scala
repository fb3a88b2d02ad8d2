package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import graft.functions._

/** Prove the custom expressions survive strict codegen (no fallback). */
class CodegenSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .config("spark.sql.codegen.fallback", "false")
    .config("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
  import spark.implicits._

  test("custom expressions compile under CODEGEN_ONLY") {
    val df = Seq(("foo", 1L), ("bar", 2L), ("", 3L)).toDF("k", "v")
      .select(
        cassandra_token(cql_serialize(col("k"))).as("tok"),
        token_bucket(cassandra_token(cql_serialize(col("k"))), 8).as("b"),
        hex(composite_key(cql_serialize(col("k")), cql_serialize(col("v")))).as("ck"),
        hex(partition_key(col("k"), col("v"))).as("pk"))
    val rows = df.collect()
    assert(rows.length === 3)
    assert(rows(0).getLong(0) === -2129773440516405919L)
    assert(rows(2).getLong(0) === Long.MinValue) // empty key
  }
}
