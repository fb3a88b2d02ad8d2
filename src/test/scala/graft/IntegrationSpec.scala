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

  test("CLI compressionclass= URI param reaches the sink and round-trips") {
    val out = Files.createTempDirectory("graft-cli-codec").toString
    val args = Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://localhost/ks/orders?reducers=2&compressionclass=LZ4Compressor",
      "--rowkey", "o_orderkey",
      "--sink-dir", out))
    val manifests = Hdfs2CassSpark.run(spark, args, StaticClusterInfo())
    assert(manifests.forall(_.codec === "lz4"), manifests.map(_.codec).mkString(","))
    assert(manifests.map(_.rows).sum === 1500)
    // the compressed runs read back through the manifest-aware read path
    val back = spark.read.format("graft-bulk").option("path", out).load()
    assert(back.count() === 1500)
    // chunked compression leaves a chunk map beside every non-empty run
    manifests.filter(_.rows > 0).foreach { m =>
      assert(graft.sinks.SortedRunWriter.chunksFileFor(
        new java.io.File(out, m.dataFile)).exists(), s"${m.dataFile} has no chunk map")
    }
  }

  test("CLI streams a compressed load end-to-end; receivers verify the logical stream") {
    // chunked compression (the CompressionInfo.db analog) makes compressed
    // runs streamable: the session ships the chunk map, the receiver
    // rebuilds the logical record stream and verifies order and counts —
    // pre-r9 this combination was refused at parse time
    import graft.sinks.InProcessCluster
    val ring = Map(
      "cass-1" -> Seq(-6000000000000000000L, 1000000000000000000L),
      "cass-2" -> Seq(-2000000000000000000L, 5000000000000000000L))
    val cluster = new InProcessCluster(Seq("cass-1", "cass-2"), ring = ring,
      replicationFactor = Some(2))
    val endpoints = cluster.start()
    try {
      val out = Files.createTempDirectory("graft-cli-codec-stream").toString
      val spec = endpoints.map { case (h, (a, p)) => s"$h=$a:$p" }.mkString(",")
      val (addr, port) = endpoints("cass-1")
      val manifests = Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
        "--input", "/root/testdata/sf0.001/orders.parquet",
        "--output", "cql://seed/ks/orders?reducers=2&compressionclass=ZstdCompressor",
        "--rowkey", "o_orderkey",
        "--cluster-info", s"socket://$addr:$port",
        "--sink-dir", out,
        "--stream-endpoints", spec)))
      assert(manifests.forall(_.codec === "zstd"))
      assert(new java.io.File(out, "_STREAM_PLAN.json").exists())
      // every non-empty run was received, decompressed, and verified (rf=2
      // on 2 nodes: both replicas hold every run)
      val received = cluster.receivedStreams
      manifests.filter(_.rows > 0).foreach { m =>
        for (host <- Seq("cass-1", "cass-2")) {
          val r = received.getOrElse((host, m.dataFile),
            fail(s"$host never verified ${m.dataFile}: got ${received.keys}"))
          assert(r.rows === m.rows)
          assert(r.bytes === m.bytes, "receiver must count LOGICAL bytes")
          assert(r.sortedOk)
        }
      }
    } finally cluster.stop()
  }

  test("CLI saltbuckets= splits hot ranges and still emits one run per ring bucket") {
    val out = Files.createTempDirectory("graft-cli-salt").toString
    val manifests = Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://localhost/ks/orders?reducers=4&saltbuckets=0:2,2:3",
      "--rowkey", "o_orderkey",
      "--sink-dir", out)), StaticClusterInfo())
    assert(manifests.length === 4)
    assert(manifests.map(_.rows).sum === 1500)
    // pid = ring bucket; each merged run stays inside its bucket's range
    manifests.filter(_.rows > 0).foreach { m =>
      assert(graft.core.CassandraTokens.bucketOfToken(m.minToken, 4)
        === m.partition)
      assert(graft.core.CassandraTokens.bucketOfToken(m.maxToken, 4)
        === m.partition)
      assert(m.sorted)
    }
    // the salted layout reads back through the manifest-aware read path
    val back = spark.read.format("graft-bulk").option("path", out).load()
    assert(back.count() === 1500)
    // auto mode on a balanced ring degrades to the plain write, same totals
    val out2 = Files.createTempDirectory("graft-cli-salta").toString
    val m2 = Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://localhost/ks/orders?reducers=4&saltbuckets=auto",
      "--rowkey", "o_orderkey",
      "--sink-dir", out2)), StaticClusterInfo())
    assert(m2.map(_.rows).sum === 1500)
    // salting IS the ring-preserving alternative to distributerandomly —
    // combining them is a contradiction, refused loudly
    val e = intercept[IllegalArgumentException](
      Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
        "--input", "/root/testdata/sf0.001/orders.parquet",
        "--output", "cql://localhost/ks/orders?reducers=4&saltbuckets=0:2&distributerandomly=true",
        "--rowkey", "o_orderkey",
        "--sink-dir", Files.createTempDirectory("graft-cli-saltx").toString)),
        StaticClusterInfo()))
    assert(e.getMessage.contains("saltbuckets"), e.getMessage)
  }

  test("CLI distributerandomly emits sorted runs that span the ring, not parquet") {
    // reference semantics: random routing changes ONLY the reducer
    // assignment (CassandraPartitioner.java:58-60); the sort comparator
    // still applies (CassandraParams.java:291-293), so the job emits valid
    // sorted runs — they just each cover the full token range
    val out = Files.createTempDirectory("graft-cli-random").toString
    val ringJson = Files.createTempFile("ring-random", ".json")
    Files.write(ringJson,
      """{"partitioner": "org.apache.cassandra.dht.Murmur3Partitioner",
        | "nodes": [
        |   {"host": "cass-1", "tokens": [-6000000000000000000, 1000000000000000000]},
        |   {"host": "cass-2", "tokens": [-2000000000000000000, 5000000000000000000]}]}"""
        .stripMargin.getBytes)
    val args = Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://seed/ks/orders?reducers=4&distributerandomly=true",
      "--rowkey", "o_orderkey",
      "--cluster-info", ringJson.toString,
      "--sink-dir", out))
    val manifests = Hdfs2CassSpark.run(spark, args)
    // same output contract as the aligned path: sorted runs + manifest
    assert(manifests.length === 4)
    assert(manifests.map(_.rows).sum === 1500)
    assert(manifests.forall(_.sorted))
    assert(!new java.io.File(out, "random").exists(), "parquet spill must be gone")
    // random routing balances but does not ring-align: every non-trivial
    // run spans most of the token range instead of one contiguous slice
    val span = BigInt(Long.MaxValue) - BigInt(Long.MinValue)
    manifests.filter(_.rows > 100).foreach { m =>
      assert(BigInt(m.maxToken) - BigInt(m.minToken) > span / 2,
        s"partition ${m.partition} looks ring-aligned: [${m.minToken}, ${m.maxToken}]")
    }
    // runs re-read through the bulk reader (order re-verified by the writer
    // contract at write time; the reader parses every record)
    val back = spark.read.format("graft-bulk").option("path", out).load()
    assert(back.count() === 1500)
    // the stream plan fans each full-span run to every replica
    val planFile = new java.io.File(out, "_STREAM_PLAN.json")
    assert(planFile.exists())
    val planJson = new String(Files.readAllBytes(planFile.toPath))
    manifests.filter(_.rows > 0).foreach { m =>
      assert(planJson.contains(m.dataFile))
    }
    assert(planJson.contains("cass-1") && planJson.contains("cass-2"))
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

  test("CLI thrift:// scheme routes through the cell-per-row projection") {
    // reference dispatch (Hdfs2Cass.java:110-127): thrift targets get
    // AvroToThrift cells; same sorted sink contract downstream
    val out = Files.createTempDirectory("graft-cli-thrift").toString
    val args = Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "thrift://localhost/ks/orders?reducers=2",
      "--rowkey", "o_orderkey",
      "--ignore", "o_orderpriority",
      "--sink-dir", out))
    val manifests = Hdfs2CassSpark.run(spark, args, StaticClusterInfo())
    // orders has 6 columns; rowkey + 1 ignored -> 4 cells per input row
    assert(manifests.map(_.rows).sum === 1500L * 4)
    assert(manifests.forall(_.sorted))
    // unknown schemes fail loudly (the reference silently writes nothing)
    val bad = args.copy(output = "cql3://localhost/ks/orders")
    val e = intercept[IllegalArgumentException] {
      Hdfs2CassSpark.run(spark, bad, StaticClusterInfo())
    }
    assert(e.getMessage.contains("unknown target scheme"))
  }

  test("CLI --format legacy bulk-loads TSV lines through the same sorted sink") {
    // the reference's second CLI, LegacyHdfs2Cass.java:61-109
    val dir = Files.createTempDirectory("graft-cli-legacy")
    Files.write(dir.resolve("part-0.txt"),
      ("HdfsToCassandra\t1\trk1\tc1\tv1\n" +
        "HdfsToCassandra\t2\trk2\tc2\t123\tv2\n" +
        "HdfsToCassandra\t3\trk3\tc3\t456\t600\tv3\n").getBytes)
    val out = Files.createTempDirectory("graft-cli-legacy-out").toString
    val args = Hdfs2CassSpark.parseArgs(Seq(
      "--input", dir.toString,
      "--output", "cql://localhost/ks/legacy?reducers=2",
      "--format", "legacy",
      "--sink-dir", out))
    val manifests = Hdfs2CassSpark.run(spark, args, StaticClusterInfo())
    assert(manifests.map(_.rows).sum === 3)
    assert(manifests.forall(_.sorted))
    // projection flags make no sense for pre-shaped legacy lines
    val e = intercept[IllegalArgumentException] {
      Hdfs2CassSpark.run(spark, args.copy(rowkey = Some("rk")), StaticClusterInfo())
    }
    assert(e.getMessage.contains("do not apply to legacy input"))
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

  test("LegacySource avro-bytes container is equivalent to the text path") {
    // the reference's S2 wire format: an Avro container file whose records
    // are primitive `bytes`, one legacy TSV line per record
    import org.apache.avro.Schema
    import org.apache.avro.file.DataFileWriter
    import org.apache.avro.generic.GenericDatumWriter
    val lines = Seq(
      "HdfsToCassandra\t1\trk1\tc1\tv1",
      "HdfsToCassandra\t2\trk2\tc2\t123\tv2",
      "HdfsToCassandra\t3\trk3\tc3\t456\t600\tv3")
    val dir = Files.createTempDirectory("graft-legacy-avro")
    val schema = Schema.create(Schema.Type.BYTES)
    val w = new DataFileWriter(new GenericDatumWriter[java.nio.ByteBuffer](schema))
    w.create(schema, dir.resolve("part-0.avro").toFile)
    lines.foreach(l => w.append(java.nio.ByteBuffer.wrap(l.getBytes("UTF-8"))))
    w.close()

    val txtDir = Files.createTempDirectory("graft-legacy-txt")
    Files.write(txtDir.resolve("part-0.txt"), (lines.mkString("\n") + "\n").getBytes)

    val viaAvro = graft.sources.LegacySource.readAvroBytes(spark, Seq(dir.toString), 999L)
      .collect().map(_.toSeq).toSet
    val viaText = graft.sources.LegacySource.read(spark, Seq(txtDir.toString), 999L)
      .collect().map(_.toSeq).toSet
    assert(viaAvro === viaText)
    assert(viaAvro.size === 3)
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

  test("curateCorpus bookkeeping costs one corpus pass, not one per stage") {
    // count every row read from the input by routing it through a counting
    // RDD: the five stats must come out of ONE scan (persisted base +
    // single aggregation), and consuming the curated output adds one more —
    // the old shape (a count() action per stage) cost ~7 passes.
    val src = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .select("doc_id", "text")
    val rows = src.collect().toSeq
    val n = rows.length.toLong
    val acc = spark.sparkContext.longAccumulator("docReads")
    val rdd = spark.sparkContext.parallelize(rows, 4).map { r => acc.add(1); r }
    val df = spark.createDataFrame(rdd, src.schema)
    val (curated, stats) = graft.operators.Curate.curateCorpus(
      df, "doc_id", "text", minQuality = 0.1, langs = Set.empty)
    assert(stats.input === n)
    assert(acc.value <= (n * 1.2).toLong,
      s"stats took ${acc.value} row-reads for $n input rows (must be ~1 pass)")
    val curatedN = curated.count()
    assert(curatedN === stats.afterNearDup)
    assert(acc.value <= (n * 2.4).toLong,
      s"stats + consumption took ${acc.value} row-reads for $n rows (must be ~2 passes)")
  }

  test("offline loader streams runs to planned replicas; all-sessions-fail fails the job") {
    import graft.sinks.{BulkSink, InProcessCluster, LoaderPlan, StreamLoader}
    val dir = Files.createTempDirectory("graft-stream").toString
    val orders = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    val projected = graft.operators.CqlPipeline.toCql(orders,
      graft.operators.CqlPipeline.Projection(defaultTimestampMicros = 1L))
    val manifests = BulkSink.writeSorted(projected, Seq("rowkey"), 4, dir)
    val nodes = Seq(
      LoaderPlan.RingNode("cass-1", Seq(-6000000000000000000L, 1000000000000000000L)),
      LoaderPlan.RingNode("cass-2", Seq(-2000000000000000000L, 5000000000000000000L)),
      LoaderPlan.RingNode("cass-3", Seq(-4000000000000000000L, 8000000000000000000L)))
    val plan = LoaderPlan.planStreams(manifests, nodes, rf = 2)
    InProcessCluster.writePlanJson(dir, plan)
    assert(new java.io.File(dir, "_STREAM_PLAN.json").exists())

    val cluster = new InProcessCluster(nodes.map(_.host),
      ring = nodes.map(n => n.host -> n.tokens).toMap,
      tableColumns = Seq("rowkey", "o_custkey"), keyIndexes = Seq(0))
    val endpoints = cluster.start()
    try {
      // plan-time metadata fetch from a seed node (CassandraClusterInfo
      // semantics): partitioner, ring, table metadata over the same socket
      val (seedAddr, seedPort) = endpoints("cass-1")
      val fetched = StaticClusterInfo.fetch(seedAddr, seedPort)
      assert(fetched.numClusterNodes === 3)
      assert(fetched.ring.toMap === nodes.map(n => n.host -> n.tokens).toMap)
      assert(fetched.allColumnNames === Seq("rowkey", "o_custkey"))
      assert(fetched.partitionKeyIndexes.toSeq === Seq(0))
      assert(fetched.partitionerClass === graft.core.CassandraParams.Murmur3Partitioner)

      val summary = StreamLoader.stream(dir, plan, endpoints, manifests)
      assert(summary.failed.isEmpty, s"failed sessions: ${summary.failed}")
      // replica fan-out: exactly the planned (host, file) sessions arrived
      val got = cluster.receivedStreams
      val planned = plan.toSeq.flatMap { case (f, hs) => hs.map(h => (h, f)) }.toSet
      assert(got.keySet === planned)
      // every received stream passed the order check and matches its manifest
      val byFile = manifests.map(m => m.dataFile -> m).toMap
      got.values.foreach { r =>
        assert(r.sortedOk)
        assert(r.rows === byFile(r.dataFile).rows)
        assert(r.bytes === byFile(r.dataFile).bytes)
      }

      // one replica down: sessions to it fail, load survives (warn path)
      cluster.stopNode("cass-2")
      if (plan.values.exists(_.contains("cass-2"))) {
        val partial = StreamLoader.stream(dir, plan, endpoints, manifests)
        assert(partial.failed.nonEmpty)
        assert(partial.failedHosts === Set("cass-2"))
      }

      // every replica down: no copy of a run lands anywhere -> job fail
      cluster.stopNode("cass-1"); cluster.stopNode("cass-3")
      intercept[IllegalStateException] {
        StreamLoader.stream(dir, plan, endpoints, manifests)
      }
    } finally cluster.stop()
  }

  test("receiver rejects malformed wire chunk framing with a protocol error") {
    import graft.sinks.{InProcessCluster, StreamLoader}
    // the chunk map arrives over the wire — descending/overflowed offsets
    // must get the clean status-1 reply (like a bad chunk count), never a
    // NegativeArraySizeException or a giant allocation in the receiver
    val cluster = new InProcessCluster(Seq("cass-1"))
    val endpoints = cluster.start()
    try {
      val (addr, port) = endpoints("cass-1")
      def session(write: java.io.DataOutputStream => Unit): (Int, String) = {
        val sock = new java.net.Socket(addr, port)
        try {
          val out = new java.io.DataOutputStream(
            new java.io.BufferedOutputStream(sock.getOutputStream))
          out.writeInt(StreamLoader.Magic)
          out.writeUTF("graft-00000-Data.db")
          out.writeLong(10L) // declared rows
          out.writeLong(100L) // declared bytes
          out.writeUTF("zstd")
          write(out)
          out.flush(); sock.shutdownOutput()
          val in = new java.io.DataInputStream(sock.getInputStream)
          (in.readUnsignedByte(), in.readUTF())
        } finally sock.close()
      }
      // descending physical offsets -> negative extent
      val (s1, m1) = session { out =>
        out.writeInt(2)
        out.writeLong(0L); out.writeLong(500L) // chunk 0: logical 0, phys 500
        out.writeLong(100L); out.writeLong(40L) // chunk 1: phys 40 < 500
        out.writeLong(600L) // physTotal
      }
      assert(s1 === 1 && m1.contains("bad chunk framing"), s"got ($s1, $m1)")
      // last offset beyond the physical total -> negative final extent
      val (s2, m2) = session { out =>
        out.writeInt(1)
        out.writeLong(0L); out.writeLong(50L)
        out.writeLong(40L) // physTotal < first chunk's offset
      }
      assert(s2 === 1 && m2.contains("bad chunk framing"), s"got ($s2, $m2)")
      // int-overflow-sized extent -> rejected before allocation
      val (s3, m3) = session { out =>
        out.writeInt(1)
        out.writeLong(0L); out.writeLong(0L)
        out.writeLong(Long.MaxValue) // physTotal: extent overflows Int
      }
      assert(s3 === 1 && m3.contains("bad chunk framing"), s"got ($s3, $m3)")
      // non-ascending logical offsets -> rejected
      val (s4, m4) = session { out =>
        out.writeInt(2)
        out.writeLong(100L); out.writeLong(0L)
        out.writeLong(100L); out.writeLong(50L) // logical not ascending
        out.writeLong(80L)
      }
      assert(s4 === 1 && m4.contains("bad chunk framing"), s"got ($s4, $m4)")
    } finally cluster.stop()
  }

  test("CLI --cluster-info socket://host:port fetches metadata live at plan time") {
    import graft.sinks.InProcessCluster
    val ring = Map(
      "cass-1" -> Seq(-6000000000000000000L, 1000000000000000000L),
      "cass-2" -> Seq(-2000000000000000000L, 5000000000000000000L))
    val cluster = new InProcessCluster(Seq("cass-1", "cass-2"), ring = ring)
    val endpoints = cluster.start()
    try {
      val out = Files.createTempDirectory("graft-cli-socket").toString
      val args = Hdfs2CassSpark.parseArgs(Seq(
        "--input", "/root/testdata/sf0.001/orders.parquet",
        "--output", "cql://seed/ks/t?reducers=4",
        "--rowkey", "o_orderkey",
        "--sink-dir", out,
        "--cluster-info", s"socket://${endpoints("cass-1")._1}:${endpoints("cass-1")._2}"))
      val manifests = Hdfs2CassSpark.run(spark, args)
      assert(manifests.map(_.rows).sum === 1500)
      // ring metadata arrived over the socket -> the stream plan was emitted
      assert(new java.io.File(out, "_STREAM_PLAN.json").exists())
    } finally cluster.stop()
  }

  test("CLI rpcport= URI param fetches metadata from the seed node, no flag needed") {
    // the reference's plan-time flow: cluster info comes from the output
    // URI's seed host over its rpc port (CassandraClusterInfo.java:61-109)
    import graft.sinks.InProcessCluster
    val ring = Map(
      "cass-1" -> Seq(-6000000000000000000L, 1000000000000000000L),
      "cass-2" -> Seq(-2000000000000000000L, 5000000000000000000L))
    val cluster = new InProcessCluster(Seq("cass-1", "cass-2"), ring = ring)
    val endpoints = cluster.start()
    try {
      val (addr, port) = endpoints("cass-1")
      val out = Files.createTempDirectory("graft-cli-rpcport").toString
      val args = Hdfs2CassSpark.parseArgs(Seq(
        "--input", "/root/testdata/sf0.001/orders.parquet",
        "--output", s"cql://$addr/ks/t?rpcport=$port",
        "--rowkey", "o_orderkey",
        "--sink-dir", out))
      val manifests = Hdfs2CassSpark.run(spark, args)
      assert(manifests.length === 2) // reducers defaulted from the fetched ring
      assert(manifests.map(_.rows).sum === 1500)
      // the fetched ring produced a stream plan without any --cluster-info
      assert(new java.io.File(out, "_STREAM_PLAN.json").exists())
    } finally cluster.stop()
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

  test("CLI plans streams at the ring-declared rf: rf=3 reaches all 3 replicas") {
    // the reference streams each SSTable to every ACTUAL replica of its
    // range (ExternalSSTableLoaderClient.java:57-137) — an rf=3 keyspace
    // must see every run on all three nodes, not a hardcoded two
    val out = Files.createTempDirectory("graft-cli-rf3").toString
    val ringJson = Files.createTempFile("ring-rf3", ".json")
    Files.write(ringJson,
      """{"partitioner": "org.apache.cassandra.dht.Murmur3Partitioner",
        | "rf": 3,
        | "nodes": [
        |   {"host": "cass-1", "tokens": [-6000000000000000000, 1000000000000000000]},
        |   {"host": "cass-2", "tokens": [-2000000000000000000, 5000000000000000000]},
        |   {"host": "cass-3", "tokens": [-4000000000000000000, 8000000000000000000]}]}"""
        .stripMargin.getBytes)
    val manifests = Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://seed/ks/orders?reducers=4",
      "--cluster-info", ringJson.toString,
      "--sink-dir", out)))
    val json = new String(Files.readAllBytes(
      new java.io.File(out, "_STREAM_PLAN.json").toPath))
    manifests.filter(_.rows > 0).foreach { m =>
      val entry = (s""""${java.util.regex.Pattern.quote(m.dataFile)}": \\[([^\\]]*)\\]""").r
        .findFirstMatchIn(json)
        .getOrElse(fail(s"${m.dataFile} missing from plan"))
      val hosts = entry.group(1).split(",").map(_.trim.stripPrefix("\"").stripSuffix("\"")).toSet
      assert(hosts === Set("cass-1", "cass-2", "cass-3"),
        s"rf=3 run ${m.dataFile} must stream to all replicas, got $hosts")
    }
  }

  test("CLI replication= URI param overrides ring rf; rf arrives over socket fetch too") {
    import graft.sinks.InProcessCluster
    val ring = Map(
      "cass-1" -> Seq(-6000000000000000000L, 1000000000000000000L),
      "cass-2" -> Seq(-2000000000000000000L, 5000000000000000000L),
      "cass-3" -> Seq(-4000000000000000000L, 8000000000000000000L))
    // the in-process cluster reports rf=3 in its metadata payload — the
    // socket analog of the reference's describe_ring-discovered replication
    val cluster = new InProcessCluster(Seq("cass-1", "cass-2", "cass-3"),
      ring = ring, replicationFactor = Some(3))
    val endpoints = cluster.start()
    try {
      val (addr, port) = endpoints("cass-1")
      // 1) rf learned from the socket fetch: every run on all 3 replicas
      val out1 = Files.createTempDirectory("graft-cli-rf-sock").toString
      Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
        "--input", "/root/testdata/sf0.001/orders.parquet",
        "--output", "cql://seed/ks/t?reducers=6",
        "--sink-dir", out1,
        "--cluster-info", s"socket://$addr:$port")))
      val json1 = new String(Files.readAllBytes(
        new java.io.File(out1, "_STREAM_PLAN.json").toPath))
      Seq("cass-1", "cass-2", "cass-3").foreach(h =>
        assert(json1.contains(h), s"socket-fetched rf=3 plan must include $h"))
      // 2) replication=1 override wins over the cluster-reported rf=3:
      //    each run lands on exactly one replica per intersected range
      // reducers=6 aligns one run per vnode range, so an rf=1 run reaches
      // exactly its range's single owner — a strictly smaller fan-out than
      // the rf=3 plan's everyone-everywhere
      val out2 = Files.createTempDirectory("graft-cli-rf-override").toString
      val manifests2 = Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
        "--input", "/root/testdata/sf0.001/orders.parquet",
        "--output", "cql://seed/ks/t?reducers=6&replication=1",
        "--sink-dir", out2,
        "--cluster-info", s"socket://$addr:$port")))
      val json2 = new String(Files.readAllBytes(
        new java.io.File(out2, "_STREAM_PLAN.json").toPath))
      manifests2.filter(_.rows > 0).foreach { m =>
        val entry = (s""""${java.util.regex.Pattern.quote(m.dataFile)}": \\[([^\\]]*)\\]""").r
          .findFirstMatchIn(json2)
          .getOrElse(fail(s"${m.dataFile} missing from plan"))
        val hosts = entry.group(1).split(",").map(_.trim).filter(_.nonEmpty).toSet
        // a run spanning k ranges reaches at most k distinct owners at rf=1,
        // and always fewer than all 3 unless it happens to span all owners —
        // the hard guarantee vs rf=3 is "not forced to everyone"; check the
        // total fan-out dropped below the rf=3 plan's
        assert(hosts.nonEmpty)
      }
      val perFileHosts = (plan: String) =>
        """\[([^\]]*)\]""".r.findAllMatchIn(plan)
          .map(_.group(1).split(",").count(_.trim.nonEmpty)).toSeq
      // rf=3 on 3 nodes: every run reaches all 3. rf=1: a run reaches only
      // the single owner of each range it spans (runs are even token
      // slices, so a wide run may span several owners — but never gains
      // the extra replicas rf=3 adds): strictly smaller total fan-out.
      assert(perFileHosts(json1).forall(_ === 3), s"rf=3 plan: $json1")
      assert(perFileHosts(json2).sum < perFileHosts(json1).sum,
        s"rf=1 plan must fan out strictly less: $json2 vs $json1")
    } finally cluster.stop()
  }

  test("CLI RandomPartitioner ring file loads end-to-end: md5-token manifests, order verified") {
    // the reference CLI serves both partitioners
    // (CassandraPartitioner.java:46-47,63-72); a RandomPartitioner cluster's
    // metadata (ring-less: md5 vnode tokens don't fit the Long ring format)
    // must produce sorted runs in md5 decorated-key order
    import graft.core.CassandraTokens
    import graft.sinks.BulkSink
    val out = Files.createTempDirectory("graft-cli-randpart").toString
    val ringJson = Files.createTempFile("ring-rand", ".json")
    Files.write(ringJson,
      """{"partitioner": "org.apache.cassandra.dht.RandomPartitioner",
        | "nodes": [{"host": "cass-1", "tokens": []},
        |           {"host": "cass-2", "tokens": []}],
        | "columns": ["rowkey", "v"], "key_indexes": [0]}""".stripMargin.getBytes)
    val manifests = Hdfs2CassSpark.run(spark, Hdfs2CassSpark.parseArgs(Seq(
      "--input", "/root/testdata/sf0.001/orders.parquet",
      "--output", "cql://seed/ks/orders?reducers=4",
      "--rowkey", "o_orderkey",
      "--cluster-info", ringJson.toString,
      "--sink-dir", out)))
    assert(manifests.map(_.rows).sum === 1500)
    // manifests carry the md5 token range as hex; the Long fields are
    // pinned full-ring so Long-token pruning never drops the runs
    manifests.filter(_.rows > 0).foreach { m =>
      assert(m.minTokenHex.matches("[0-9a-f]{32}"), s"bad minTokenHex: ${m.minTokenHex}")
      assert(m.maxTokenHex.matches("[0-9a-f]{32}"))
      assert(m.minTokenHex <= m.maxTokenHex)
      assert(m.minToken === Long.MinValue && m.maxToken === Long.MaxValue)
      assert(m.indexFile.isEmpty, "random runs must not emit an (unseekable) Index.db")
    }
    // hex round-trips through _MANIFEST.json
    val reread = BulkSink.readManifests(new java.io.File(out)).filter(_.rows > 0)
    assert(reread.map(m => (m.dataFile, m.minTokenHex, m.maxTokenHex)).sorted ===
      manifests.filter(_.rows > 0).map(m => (m.dataFile, m.minTokenHex, m.maxTokenHex)).sorted)
    // read each run back: rows must be in md5 decorated-key order, the
    // manifest's hex range must match the observed extremes, and ring
    // buckets must match the reference's ceil(2^127/n) ranges
    val perm = BulkSink.slotPermutation(4)
    manifests.filter(_.rows > 0).foreach { m =>
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(new java.io.File(out, m.dataFile))))
      var prevKey: Array[Byte] = null
      var first: Array[Byte] = null
      var last: Array[Byte] = null
      var rows = 0L
      try {
        var eof = false
        while (!eof) {
          val b0 = in.read()
          if (b0 < 0) eof = true
          else {
            val klen = (b0 << 8) | in.readUnsignedByte()
            val key = new Array[Byte](klen); in.readFully(key)
            val vlen = in.readInt(); in.skipBytes(vlen)
            if (prevKey != null)
              assert(CassandraTokens.compareRandomDecorated(prevKey, key) <= 0,
                s"${m.dataFile} not in md5 decorated order at row $rows")
            val tok = CassandraTokens.md5TokenBytes(key)
            if (first == null) first = tok
            last = tok
            // the routing bucket matches the manifest's partition slot
            assert(perm(CassandraTokens.randomBucketOfTokenBytes(tok, 4)) === m.partition)
            prevKey = key; rows += 1
          }
        }
      } finally in.close()
      assert(rows === m.rows)
      def hex(b: Array[Byte]) = b.map(x => f"$x%02x").mkString
      assert(hex(first) === m.minTokenHex)
      assert(hex(last) === m.maxTokenHex)
    }
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
