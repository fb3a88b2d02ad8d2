package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/**
 * Loud guard for operators whose bounded-heap ranking carries ids through
 * TopKAgg's long slot: a non-integral id column would cast to null and be
 * SILENTLY dropped by the heap (empty samples, missing top-k rows) — fail
 * at plan-build time with a message that says what to do instead.
 */
private[operators] object Ids {
  def requireIntegral(df: DataFrame, idCol: String, op: String): Unit = {
    val t = df.schema(idCol).dataType
    val integral = t == ByteType || t == ShortType || t == IntegerType || t == LongType
    require(integral,
      s"$op needs an integral id column (ids ride TopKAgg's long slot; " +
        s"casting ${t.simpleString} would null out and silently drop rows) — " +
        s"got $idCol: ${t.simpleString}. Map ids to long first " +
        "(e.g. a dictionary join or monotonically_increasing_id).")
  }
}
