import org.apache.spark.sql.DataFrame

/**
 * Library DSL: the reference exposes a library entry point besides the CLI
 * (Thrift.byConvention / byFieldNames, crunch/thrift/converters/
 * Thrift.java:30-50); this is the Spark-idiomatic equivalent — extension
 * methods on DataFrame so any Spark job can reuse the pipeline tail.
 */
package object graft {

  implicit class GraftDataFrameOps(private val df: DataFrame) extends AnyVal {

    /** CQL projection by convention: rowkey = first column, no overrides. */
    def toCqlByConvention: DataFrame =
      operators.CqlPipeline.toCql(df)

    /** CQL projection by field names (the byFieldNames analog). */
    def toCqlByFieldNames(rowkey: String, timestampField: Option[String] = None,
        ttlField: Option[String] = None, ignore: Seq[String] = Nil): DataFrame =
      operators.CqlPipeline.toCql(df, operators.CqlPipeline.Projection(
        rowkey = Some(rowkey), timestampField = timestampField,
        ttlField = ttlField, ignore = ignore))

    /** Cell-per-field projection (Thrift-path semantics). */
    def toCellsByFieldNames(rowkey: String, ignore: Seq[String] = Nil): DataFrame =
      operators.CqlPipeline.toCells(df, operators.CqlPipeline.Projection(
        rowkey = Some(rowkey), ignore = ignore))

    /** Ring-aligned repartition + decorated-key sort. */
    def alignToRing(keyCols: Seq[String], numBuckets: Int): DataFrame =
      operators.CqlPipeline.alignToRing(df, keyCols, numBuckets)

    /** Sorted bulk load to a local directory (offline SSTable mode). */
    def bulkLoadSorted(keyCols: Seq[String], numBuckets: Int,
        outDir: String): Seq[sinks.BulkSink.PartitionManifest] =
      sinks.BulkSink.writeSorted(df, keyCols, numBuckets, outDir)
  }
}
