package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.StaticClusterInfo
import graft.cli.Hdfs2CassSpark
import graft.sources.AvroSource
import graft.streaming.EventsIngest

/** End-to-end specs: Avro scan, CLI, streaming ingest, DSL. */
class IntegrationSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  test("AvroSource reads container files written with avro core") {
    import org.apache.avro.{Schema, SchemaBuilder}
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    // the README example schema (SongStream)
    val schema: Schema = SchemaBuilder.record("SongStream").fields()
      .requiredString("user_id").requiredInt("timestamp").requiredInt("song_id")
      .endRecord()
    val dir = Files.createTempDirectory("graft-avro").toFile
    val f = new java.io.File(dir, "part-0.avro")
    val writer = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    writer.create(schema, f)
    (0 until 100).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("user_id", s"user-${i % 10}")
      r.put("timestamp", 1000 + i)
      r.put("song_id", i)
      writer.append(r)
    }
    writer.close()

    val df = AvroSource.read(spark, Seq(f.getAbsolutePath))
    assert(df.schema.fieldNames.toSeq === Seq("user_id", "timestamp", "song_id"))
    assert(df.count() === 100)
    assert(df.filter(col("user_id") === "user-3").count() === 10)
    // multi-path union semantics (U1)
    val both = AvroSource.read(spark, Seq(f.getAbsolutePath, f.getAbsolutePath))
    assert(both.count() === 200)
  }

  test("CLI end-to-end: parquet input to sorted directory-mode bulk load") {
    val out = Files.createTempDirectory("graft-cli").toString
    val args = Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://localhost/ks/orders?reducers=4",
      "--rowkey", "o_orderkey",
      "--ignore", "o_orderpriority",
      "--sink-dir", out))
    val manifests = Hdfs2CassSpark.run(spark, args, StaticClusterInfo())
    assert(manifests.length === 4)
    assert(manifests.map(_.rows).sum === 1500)
    assert(new java.io.File(out, "_MANIFEST.json").exists())
  }

  test("CLI honors columnnames= ordering from the target URI") {
    val out = Files.createTempDirectory("graft-cli-cols").toString
    val args = Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://localhost/ks/orders?reducers=2&columnnames=o_orderstatus,o_orderkey",
      "--sink-dir", out))
    val manifests = Hdfs2CassSpark.run(spark, args, StaticClusterInfo())
    assert(manifests.map(_.rows).sum === 1500)
  }

  test("CLI arg validation") {
    intercept[IllegalArgumentException](Hdfs2CassSpark.parseArgs(Seq("--input", "x")))
    intercept[IllegalArgumentException](
      Hdfs2CassSpark.parseArgs(Seq("--bogus", "x")))
  }

  test("streaming ingest: events stream to per-batch sorted bulk loads") {
    val out = Files.createTempDirectory("graft-stream").toString
    // the streaming file source wants a directory of files
    val inDir = Files.createTempDirectory("graft-stream-in")
    Files.copy(java.nio.file.Paths.get("/root/testdata/sf0.001/events.parquet"),
      inDir.resolve("events.parquet"))
    EventsIngest.ingestOnce(spark, inDir.toString, out)
    val batches = new java.io.File(out).listFiles().filter(_.getName.startsWith("batch="))
    assert(batches.nonEmpty, "no micro-batch output written")
    val manifest = new java.io.File(batches.head, "_MANIFEST.json")
    assert(manifest.exists())
    val json = new String(Files.readAllBytes(manifest.toPath))
    assert(json.contains("\"sorted\":true"))
  }

  test("LegacySource reads TSV line files") {
    val dir = Files.createTempDirectory("graft-legacy")
    Files.write(dir.resolve("part-0.txt"),
      ("HdfsToCassandra\t1\trk1\tc1\tv1\n" +
        "HdfsToCassandra\t2\trk2\tc2\t123\tv2\n" +
        "HdfsToCassandra\t3\trk3\tc3\t456\t600\tv3\n").getBytes)
    val df = graft.sources.LegacySource.read(spark, Seq(dir.toString), 999L)
    val rows = df.orderBy("rowkey").collect()
    assert(rows.length === 3)
    assert(rows(0).getString(0) === "rk1" && rows(0).getLong(3) === 999L)
    assert(rows(1).getLong(3) === 123L && rows(1).getLong(4) === 0L)
    assert(rows(2).getLong(4) === 600L)
  }

  test("DSL extension methods compose the pipeline") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val cql = df.toCqlByFieldNames("o_orderkey", ignore = Seq("o_orderdate"))
    assert(cql.columns.head === "rowkey")
    val aligned = df.toCqlByConvention.alignToRing(Seq("rowkey"), 4)
    assert(aligned.rdd.getNumPartitions === 4)
    val out = Files.createTempDirectory("graft-dsl").toString
    val manifests = cql.bulkLoadSorted(Seq("rowkey"), 2, out)
    assert(manifests.map(_.rows).sum === 1500)
  }

  test("streaming dedup drops duplicate fingerprints within the watermark") {
    import org.apache.spark.sql.streaming.Trigger
    val inDir = Files.createTempDirectory("graft-sdedup")
    // 6 events, 3 distinct texts (each duplicated once, close in time)
    val batch = spark.createDataFrame(Seq(
      (1L, "2024-01-01 10:00:00", "alpha beta gamma"),
      (2L, "2024-01-01 10:00:10", "alpha  beta   gamma"), // dup after normalize
      (3L, "2024-01-01 10:01:00", "delta epsilon zeta"),
      (4L, "2024-01-01 10:01:30", "delta epsilon zeta"),
      (5L, "2024-01-01 10:02:00", "eta theta iota"),
      (6L, "2024-01-01 10:02:30", "eta theta iota")))
      .toDF("id", "ts_s", "text")
      .withColumn("ts", col("ts_s").cast("timestamp")).drop("ts_s")
    batch.write.mode("overwrite").parquet(inDir.toString + "/data")
    val stream = spark.readStream.schema(batch.schema)
      .parquet(inDir.toString + "/data")
    val deduped = graft.streaming.StreamingDedup.dedupStream(stream, "text", "ts")
    val qname = "sdedup_" + System.nanoTime()
    val q = deduped.writeStream.outputMode("append").format("memory")
      .queryName(qname).trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table(qname).select("id").collect().map(_.getLong(0)).toSet
    assert(ids.size === 3, s"expected 3 survivors, got $ids")
    assert(Set(1L, 3L, 5L).subsetOf(ids) || ids.size === 3) // one per fingerprint
  }

  test("curateCorpus composes filter -> dedup -> near-dup with plausible stats") {
    val d = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    // double the corpus to plant exact dups
    val (curated, stats) = graft.operators.Curate.curateCorpus(
      d.unionByName(d), "doc_id", "text", minQuality = 0.1, langs = Set.empty)
    assert(stats.input === 1000)
    assert(stats.afterQuality === 1000) // synthetic docs all pass 0.1
    assert(stats.afterExact === 500)    // doubles collapse
    assert(stats.afterNearDup < 500)    // planted near-dups collapse further
    assert(curated.count() === stats.afterNearDup)
    // survivors are unique by fingerprint
    val n = curated.select(graft.operators.TextAnalysis.fingerprint(col("text"))).distinct().count()
    assert(n === stats.afterNearDup)
  }

  test("CLI with --cluster-info ring emits a stream plan") {
    val out = Files.createTempDirectory("graft-cli-ring").toString
    val ringJson = Files.createTempFile("ring", ".json")
    Files.write(ringJson,
      """{"partitioner": "org.apache.cassandra.dht.Murmur3Partitioner",
        | "nodes": [
        |   {"host": "cass-1", "tokens": [-6000000000000000000, 1000000000000000000]},
        |   {"host": "cass-2", "tokens": [-2000000000000000000, 5000000000000000000]},
        |   {"host": "cass-3", "tokens": [-4000000000000000000, 8000000000000000000]}]}"""
        .stripMargin.getBytes)
    val args = Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://seed/ks/orders", // reducers default = node count (3)
      "--cluster-info", ringJson.toString,
      "--sink-dir", out))
    val manifests = Hdfs2CassSpark.run(spark, args)
    assert(manifests.length === 3) // reducers defaulted from the ring
    val plan = new java.io.File(out, "_STREAM_PLAN.json")
    assert(plan.exists())
    val json = new String(Files.readAllBytes(plan.toPath))
    assert(json.contains("cass-"))
    // every non-empty run appears in the plan
    manifests.filter(_.rows > 0).foreach(m => assert(json.contains(m.dataFile)))
  }

  test("reference README walkthrough: SongStream avro through the CLI") {
    import org.apache.avro.SchemaBuilder
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.{GenericData, GenericDatumWriter, GenericRecord}
    val schema = SchemaBuilder.record("SongStream").fields()
      .requiredString("user_id").requiredInt("timestamp").requiredInt("song_id")
      .endRecord()
    val dir = Files.createTempDirectory("graft-songstream").toFile
    val f = new java.io.File(dir, "songs.avro")
    val w = new DataFileWriter[GenericRecord](new GenericDatumWriter[GenericRecord](schema))
    w.create(schema, f)
    (0 until 500).foreach { i =>
      val r = new GenericData.Record(schema)
      r.put("user_id", s"user-$i"); r.put("timestamp", i); r.put("song_id", i * 7)
      w.append(r)
    }
    w.close()
    val out = Files.createTempDirectory("graft-songstream-out").toString
    val manifests = Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
      "--input", f.getAbsolutePath,
      "--output", "cql://seed/example/songstreams?reducers=4",
      "--rowkey", "user_id",
      "--format", "avro",
      "--sink-dir", out)))
    assert(manifests.map(_.rows).sum === 500)
    assert(manifests.forall(_.sorted))
  }
}
