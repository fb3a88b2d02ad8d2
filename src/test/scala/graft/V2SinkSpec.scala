package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.core.CassandraTokens
import graft.functions.{cassandra_token, partition_key, token_bucket}

/** DSv2 "graft-bulk" sink: writer-declared distribution+ordering. */
class V2SinkSpec extends AnyFunSuite {
  lazy val spark = SparkSuite.spark
  import spark.implicits._

  private def prepared(n: Int) = {
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("_pk", partition_key(col("o_orderkey")))
      .withColumn("_token", cassandra_token(col("_pk")))
      .withColumn("_bucket", token_bucket(col("_token"), n))
  }

  test("v2 sink writes sorted runs with Spark-planned exchange and sort") {
    val out = Files.createTempDirectory("graft-v2").toString
    prepared(4).write.format("graft-bulk")
      .option("path", out).option("buckets", "4").mode("append").save()

    val manifest = new java.io.File(out, "_MANIFEST.json")
    assert(manifest.exists())
    val json = new String(Files.readAllBytes(manifest.toPath))
    assert(json.contains("\"sorted\":true"))
    val totalRows = """"rows":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).sum
    assert(totalRows === 1500L)

    // read a run back: keys must be in decorated order and re-hash to tokens
    val dataFiles = new java.io.File(out).listFiles().filter(_.getName.endsWith("Data.db"))
    assert(dataFiles.nonEmpty)
    dataFiles.foreach { f =>
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(f)))
      var prev = Long.MinValue
      try {
        while (in.available() > 0) {
          val klen = in.readUnsignedShort()
          val key = new Array[Byte](klen); in.readFully(key)
          val vlen = in.readInt(); in.skipBytes(vlen)
          val tok = CassandraTokens.token(key)
          assert(tok >= prev, s"unsorted run in ${f.getName}")
          prev = tok
        }
      } finally in.close()
    }
  }

  test("AQE chaos: forced coalesce + skew-join upstream never trip the sorted-run re-check") {
    // SURVEY §7.4 risk 3: AQE rewrites shuffle partitioning at runtime
    // (coalescing small partitions, splitting skewed ones). The sink's
    // RequiresDistributionAndOrdering must survive BOTH modes — the
    // writer's per-partition monotonicity re-check throwing would mean
    // AQE handed a writer a partition violating the declared clustering
    // or ordering. Run the full pipeline (skewed join -> token derivation
    // -> graft-bulk write) with the skew/coalesce machinery FORCED on at
    // aggressive thresholds, then with AQE off, and pin identical totals
    // and on-disk sorted runs either way.
    val sf01 = "/root/testdata/sf0.01"
    val totals = for (aqe <- Seq("true", "false")) yield {
      val s = spark.newSession() // conf chaos must not leak to other tests
      s.conf.set("spark.sql.adaptive.enabled", aqe)
      if (aqe == "true") {
        s.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
        s.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        s.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "1m")
        s.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1")
        s.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
        s.conf.set("spark.sql.adaptive.forceOptimizeSkewedJoin", "true")
      }
      val orders = s.read.parquet(s"$sf01/orders.parquet")
      val cust = s.read.parquet(s"$sf01/customer.parquet")
        .select(col("c_custkey"), col("c_mktsegment")).hint("merge")
      val prepared = orders
        .join(cust, orders("o_custkey") === cust("c_custkey"))
        .withColumn("_pk", partition_key(col("o_orderkey")))
        .withColumn("_token", cassandra_token(col("_pk")))
        .withColumn("_bucket", token_bucket(col("_token"), 4))
      val out = Files.createTempDirectory(s"graft-v2-aqe-$aqe").toString
      // a spurious re-check firing surfaces here as the write throwing
      prepared.write.format("graft-bulk")
        .option("path", out).option("buckets", "4").mode("append").save()
      val json = new String(Files.readAllBytes(
        java.nio.file.Paths.get(out, "_MANIFEST.json")))
      assert(json.contains("\"sorted\":true"))
      // independent on-disk verification, not just the writer's word
      new java.io.File(out).listFiles()
        .filter(_.getName.endsWith("Data.db")).foreach { f =>
          val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
            new java.io.FileInputStream(f)))
          var prev = Long.MinValue
          try {
            while (in.available() > 0) {
              val klen = in.readUnsignedShort()
              val key = new Array[Byte](klen); in.readFully(key)
              val vlen = in.readInt(); in.skipBytes(vlen)
              val tok = CassandraTokens.token(key)
              assert(tok >= prev, s"unsorted run under AQE=$aqe in ${f.getName}")
              prev = tok
            }
          } finally in.close()
        }
      """"rows":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).sum
    }
    assert(totals.head === totals.last,
      s"AQE on/off wrote different row totals: $totals")
    assert(totals.head > 0L)
  }

  test("v2 sink plan contains writer-required exchange and sort") {
    val df = prepared(4)
    // no manual repartition/sortWithinPartitions on the caller side — the
    // Write's RequiresDistributionAndOrdering must inject them
    val out = Files.createTempDirectory("graft-v2-plan").toString
    df.write.format("graft-bulk").option("path", out).option("buckets", "4")
      .mode("append").save()
    // post-hoc: partitions in the manifest have disjoint token ranges when
    // clustered by bucket (hash of 4 buckets over 4 partitions may collide,
    // but every bucket lands entirely in one run)
    val json = new String(Files.readAllBytes(
      java.nio.file.Paths.get(out, "_MANIFEST.json")))
    assert("""\"rows\":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).sum === 1500L)
  }

  test("v2 round trip: written runs read back via spark.read") {
    val out = Files.createTempDirectory("graft-v2-rt").toString
    prepared(4).write.format("graft-bulk")
      .option("path", out).option("buckets", "4").mode("append").save()
    val back = spark.read.format("graft-bulk").option("path", out).load()
    assert(back.columns.toSeq === Seq("token", "pk", "value", "bucket"))
    assert(back.count() === 1500)
    // tokens recompute from keys and every pk round-trips
    val bad = back.filter(cassandra_token(col("pk")) =!= col("token")).count()
    assert(bad === 0)
    // distributed read parallelism = one split per non-empty run file
    // (hash clustering may fold several ring buckets into one task)
    val nFiles = new java.io.File(out).listFiles().count(_.getName.endsWith("Data.db"))
    assert(nFiles >= 1 && back.rdd.getNumPartitions === nFiles)
  }

  test("compressionclass round-trips through both sinks for every codec") {
    import graft.sinks.{BulkSink, SortedRunWriter}
    for (cls <- Seq("DeflateCompressor", "LZ4Compressor", "ZstdCompressor",
        "org.apache.cassandra.io.compress.SnappyCompressor")) {
      val codec = SortedRunWriter.normalizeCodec(cls)
      // DSv2 path: option -> writer -> manifest -> spark.read decompresses
      val out = Files.createTempDirectory(s"graft-v2-$codec").toString
      prepared(4).write.format("graft-bulk")
        .option("path", out).option("buckets", "4")
        .option("compressionclass", cls).mode("append").save()
      val json = new String(Files.readAllBytes(
        java.nio.file.Paths.get(out, "_MANIFEST.json")))
      assert(json.contains(s""""codec":"$codec""""), s"manifest missing codec for $cls")
      val back = spark.read.format("graft-bulk").option("path", out).load()
      assert(back.count() === 1500)
      assert(back.filter(cassandra_token(col("pk")) =!= col("token")).count() === 0)
      // compressed Data.db must not parse as the raw record format
      // (i.e. the bytes on disk really are codec bytes, not plaintext):
      // logical bytes in the manifest exceed the physical deflate file
      if (codec == "deflate") {
        val logical = """"bytes":(\d+)""".r.findAllMatchIn(json).map(_.group(1).toLong).sum
        val physical = new java.io.File(out).listFiles()
          .filter(_.getName.endsWith("Data.db")).map(_.length).sum
        assert(physical < logical, s"deflate wrote $physical >= logical $logical")
      }

      // RDD path: writeSorted(compression=) produces the same manifest codec
      val out2 = Files.createTempDirectory(s"graft-rdd-$codec").toString
      val ms = BulkSink.writeSorted(
        spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
          .select(col("o_orderkey"), col("o_orderpriority")),
        Seq("o_orderkey"), 4, out2, compression = Some(cls))
      assert(ms.forall(_.codec === codec))
      val back2 = spark.read.format("graft-bulk").option("path", out2).load()
      assert(back2.count() === 1500)
    }
  }

  test("compressed runs carry physical bytes, a chunk map, and a usable Index.db") {
    import graft.sinks.{BulkSink, SortedRunWriter}
    val out = Files.createTempDirectory("graft-v2-cmeta").toString
    prepared(4).write.format("graft-bulk")
      .option("path", out).option("buckets", "4")
      .option("compressionclass", "DeflateCompressor").mode("append").save()
    val dir = new java.io.File(out)
    val ms = BulkSink.readManifests(dir).filter(_.rows > 0)
    assert(ms.nonEmpty)
    ms.foreach { m =>
      // chunked compression (CompressionInfo.db analog) makes logical
      // offsets seekable, so compressed runs now carry an index AND a
      // chunk map; physical stays below logical
      assert(m.indexFile.nonEmpty && new java.io.File(dir, m.indexFile).exists())
      val chunks = SortedRunWriter.readChunks(
        SortedRunWriter.chunksFileFor(new java.io.File(dir, m.dataFile)))
      assert(chunks.nonEmpty, s"${m.dataFile} has no chunk map")
      assert(chunks.head === ((0L, 0L)))
      // chunk offsets ascend in both coordinates and stay in range
      chunks.sliding(2).foreach {
        case Array((l1, p1), (l2, p2)) => assert(l1 < l2 && p1 < p2)
        case _ => ()
      }
      assert(chunks.last._1 < m.bytes && chunks.last._2 < m.physicalBytes)
      assert(m.physicalBytes === new java.io.File(dir, m.dataFile).length)
      assert(m.physicalBytes < m.bytes,
        s"${m.dataFile}: physical ${m.physicalBytes} not below logical ${m.bytes}")
    }
    // uncompressed runs: physical == logical, index present, no chunk map
    val out2 = Files.createTempDirectory("graft-v2-umeta").toString
    prepared(4).write.format("graft-bulk")
      .option("path", out2).option("buckets", "4").mode("append").save()
    val ms2 = BulkSink.readManifests(new java.io.File(out2)).filter(_.rows > 0)
    assert(ms2.nonEmpty)
    ms2.foreach { m =>
      assert(m.physicalBytes === m.bytes)
      assert(m.indexFile.nonEmpty)
      assert(new java.io.File(out2, m.indexFile).exists())
      assert(!SortedRunWriter.chunksFileFor(new java.io.File(out2, m.dataFile)).exists())
    }
  }

  test("token-banded read of a zstd run seeks via index + chunk map") {
    import graft.sinks.{BulkSink, SortedRunWriter}
    import graft.sinks.v2.GraftBulkRead
    // ONE compressed run with dense index and small chunks so a mid-run
    // band demonstrably starts past byte zero
    val out = Files.createTempDirectory("graft-v2-zseek").toString
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_orderdate"))
    val ms = BulkSink.writeSorted(df, Seq("o_orderkey"), 1, out,
      indexInterval = 16, compression = Some("ZstdCompressor"),
      chunkSize = 4 * 1024)
    val m = ms.find(_.rows > 0).get
    val dir = new java.io.File(out)
    val full = spark.read.format("graft-bulk").option("path", out).load()
      .select("token").as[Long].collect().sorted
    val lo = full((full.length * 0.8).toInt)

    // the planned split starts at a LOGICAL offset inside the run...
    val splits = GraftBulkRead.planSplits(dir, Some(lo), None)
    assert(splits.length === 1)
    assert(splits.head.startOffset > 0, "no index seek into the compressed run")
    // ...and the chunk map resolves it to a physical seek past byte zero,
    // i.e. the read touches fewer physical bytes than the whole file
    val chunks = SortedRunWriter.readChunks(
      SortedRunWriter.chunksFileFor(new java.io.File(dir, m.dataFile)))
    val (stream, logicalStart) = SortedRunWriter.openChunked(
      new java.io.File(dir, m.dataFile), "zstd", chunks, splits.head.startOffset)
    stream.close()
    assert(logicalStart > 0 && logicalStart <= splits.head.startOffset)
    val physStart = chunks.collectFirst { case (l, p) if l == logicalStart => p }.get
    assert(physStart > 0 && physStart < m.physicalBytes,
      s"banded read still starts at physical byte 0 of ${m.physicalBytes}")

    // e2e exactness through spark.read with the filter pushed
    def scan() = spark.read.format("graft-bulk").option("path", out).load()
    assert(scan().filter(col("token") >= lo).count() === full.count(_ >= lo))
    val hi = full((full.length * 0.9).toInt)
    assert(scan().filter(col("token") >= lo && col("token") <= hi).count() ===
      full.count(t => t >= lo && t <= hi))
  }

  test("token predicates prune runs and index-seek past leading bytes") {
    import graft.sinks.BulkSink
    import graft.sinks.v2.GraftBulkRead
    val out = Files.createTempDirectory("graft-v2-prune").toString
    val ms = BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Seq("o_orderkey"), 4, out, indexInterval = 16)
    val dir = new java.io.File(out)
    val nonEmpty = ms.count(_.rows > 0)
    val full = spark.read.format("graft-bulk").option("path", out).load()
      .select("token").as[Long].collect().sorted
    val lo = full((full.length * 0.7).toInt)
    val hi = full((full.length * 0.3).toInt)

    // manifest [minToken, maxToken] prunes whole runs on either bound
    val loSplits = GraftBulkRead.planSplits(dir, Some(lo), None)
    assert(loSplits.length < nonEmpty, s"lower bound pruned nothing ($nonEmpty splits)")
    assert(GraftBulkRead.planSplits(dir, None, Some(hi)).length < nonEmpty)

    // the run containing lo starts mid-file via its sparse index
    val containing = ms.filter(m => m.rows > 0 && m.minToken < lo && lo <= m.maxToken)
    assert(containing.nonEmpty)
    containing.foreach { m =>
      val s = loSplits.find(_.file.endsWith(m.dataFile)).get
      assert(s.startOffset > 0, s"no index seek into ${m.dataFile}")
      assert(s.startOffset < m.bytes)
    }

    // e2e: the pushed filter reads fewer splits and stays exact
    def scan() = spark.read.format("graft-bulk").option("path", out).load()
    val lower = scan().filter(col("token") >= lo)
    assert(lower.rdd.getNumPartitions < nonEmpty)
    assert(lower.count() === full.count(_ >= lo))
    val ranged = scan().filter(col("token") >= hi && col("token") <= lo)
    assert(ranged.count() === full.count(t => t >= hi && t <= lo))
    val point = scan().filter(col("token") === lo)
    assert(point.count() === full.count(_ == lo))
    // a filter outside every run's range reads zero splits
    assert(GraftBulkRead.planSplits(dir, Some(Long.MaxValue), None)
      .isEmpty || full.max == Long.MaxValue)
  }

  test("column pruning reaches the scan; value payloads skip, results exact") {
    val out = Files.createTempDirectory("graft-v2-colprune").toString
    prepared(4).write.format("graft-bulk")
      .option("path", out).option("buckets", "4").mode("append").save()
    def scan() = spark.read.format("graft-bulk").option("path", out).load()

    // the leaf scan's output shrinks to the projected columns (Catalyst
    // pushed the projection into the source, not a post-scan Project)
    val tokensOnly = scan().select("token")
    val leafOut = tokensOnly.queryExecution.executedPlan.collectLeaves()
      .head.output.map(_.name)
    assert(leafOut === Seq("token"), s"scan still reads $leafOut")

    // projected values match the full read in every combination
    val full = scan().collect().map(r => (r.getLong(0),
      r.getAs[Array[Byte]](1).toSeq, r.getAs[Array[Byte]](2).toSeq))
    assert(tokensOnly.as[Long].collect().sorted.toSeq ===
      full.map(_._1).sorted.toSeq)
    val pks = scan().select("pk").collect().map(_.getAs[Array[Byte]](0).toSeq)
    assert(pks.sortBy(_.toString) === full.map(_._2).sortBy(_.toString))
    assert(scan().count() === full.length) // no columns at all (count*)
    // pruning composes with the token-range pushdown
    val mid = full.map(_._1).sorted.apply(full.length / 2)
    assert(scan().filter(col("token") >= mid).select("pk").count() ===
      full.count(_._1 >= mid))
  }

  test("scan statistics come from manifests and shrink under token pruning") {
    import graft.sinks.BulkSink
    import graft.sinks.v2.GraftBulkScanBuilder
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    import org.apache.spark.sql.sources.GreaterThanOrEqual
    val out = Files.createTempDirectory("graft-v2-stats").toString
    val ms = BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Seq("o_orderkey"), 4, out)

    def stats(f: GraftBulkScanBuilder => Unit) = {
      val b = new GraftBulkScanBuilder(out)
      f(b)
      b.build().asInstanceOf[SupportsReportStatistics].estimateStatistics()
    }
    val full = stats(_ => ())
    assert(full.numRows.getAsLong === ms.map(_.rows).sum)
    assert(full.sizeInBytes.getAsLong === ms.map(_.bytes).sum)
    // a bound above some runs' maxToken must shrink the estimate
    val cut = ms.filter(_.rows > 0).map(_.maxToken).sorted.apply(1)
    val pruned = stats(_.pushFilters(Array(GreaterThanOrEqual("token", cut + 1))))
    assert(pruned.numRows.getAsLong < full.numRows.getAsLong)
    assert(pruned.sizeInBytes.getAsLong < full.sizeInBytes.getAsLong)
    assert(pruned.numRows.getAsLong > 0)
  }

  test("v2 sink writes RandomPartitioner runs when _token is binary (md5)") {
    import graft.functions.{cassandra_random_token, random_token_bucket}
    import graft.sinks.BulkSink
    val out = Files.createTempDirectory("graft-v2-random").toString
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .withColumn("_pk", partition_key(col("o_orderkey")))
      .withColumn("_token", cassandra_random_token(col("_pk")))
      .withColumn("_bucket", random_token_bucket(col("_token"), 4))
      .write.format("graft-bulk")
      .option("path", out).option("buckets", "4").mode("append").save()
    val ms = BulkSink.readManifests(new java.io.File(out)).filter(_.rows > 0)
    assert(ms.nonEmpty && ms.map(_.rows).sum === 1500)
    ms.foreach { m =>
      assert(m.minTokenHex.matches("[0-9a-f]{32}"))
      assert(m.indexFile.isEmpty)
    }
    // runs are md5-decorated-sorted on disk
    ms.foreach { m =>
      val in = new java.io.DataInputStream(new java.io.BufferedInputStream(
        new java.io.FileInputStream(new java.io.File(out, m.dataFile))))
      var prev: Array[Byte] = null
      try {
        while (in.available() > 0) {
          val klen = in.readUnsignedShort()
          val key = new Array[Byte](klen); in.readFully(key)
          in.skipBytes(in.readInt())
          if (prev != null)
            assert(CassandraTokens.compareRandomDecorated(prev, key) <= 0,
              s"unsorted random run ${m.dataFile}")
          prev = key
        }
      } finally in.close()
    }
    // a murmur3 token-range read over a random directory must NOT
    // early-stop mid-file (runs aren't murmur3-sorted): counts stay exact
    val back = spark.read.format("graft-bulk").option("path", out).load()
    assert(back.count() === 1500)
    val mid = 0L
    assert(back.filter(col("token") >= mid).count() ===
      back.collect().count(_.getLong(0) >= mid))
  }

  test("statistics pro-rate an in-run token band via the sparse index") {
    import graft.sinks.BulkSink
    import graft.sinks.v2.GraftBulkScanBuilder
    import org.apache.spark.sql.connector.read.SupportsReportStatistics
    import org.apache.spark.sql.sources.{GreaterThanOrEqual, LessThanOrEqual}
    // ONE run (buckets=1) so any shrink must come from inside the run,
    // not from pruning whole files; a dense index (every 16 rows) keeps
    // the estimate's granularity tight
    val out = Files.createTempDirectory("graft-v2-prorate").toString
    val ms = BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Seq("o_orderkey"), 1, out, indexInterval = 16)
    val m = ms.find(_.rows > 0).get
    val toks = spark.read.format("graft-bulk").option("path", out).load()
      .select("token").as[Long].collect().sorted
    // a band covering the middle ~10% of rows
    val lo = toks((toks.length * 0.45).toInt)
    val hi = toks((toks.length * 0.55).toInt)
    def stats(f: GraftBulkScanBuilder => Unit) = {
      val b = new GraftBulkScanBuilder(out)
      f(b)
      b.build().asInstanceOf[SupportsReportStatistics].estimateStatistics()
    }
    val full = stats(_ => ())
    assert(full.numRows.getAsLong === m.rows)
    val band = stats(_.pushFilters(Array(
      GreaterThanOrEqual("token", lo), LessThanOrEqual("token", hi))))
    val est = band.numRows.getAsLong
    val actual = toks.count(t => t >= lo && t <= hi)
    // never an under-count (a too-small estimate invites a wrong
    // broadcast) and a real shrink vs the whole run — within index
    // granularity of the truth
    assert(est >= actual, s"estimate $est under-counts actual $actual")
    assert(est <= m.rows / 2, s"estimate $est did not shrink vs ${m.rows}")
    assert(est <= actual + 3L * 16L, s"estimate $est too far above actual $actual")
    assert(band.sizeInBytes.getAsLong < full.sizeInBytes.getAsLong / 2)
    // one-sided bands pro-rate too
    val upper = stats(_.pushFilters(Array(GreaterThanOrEqual("token", lo))))
    assert(upper.numRows.getAsLong <= m.rows * 6 / 10)
    assert(upper.numRows.getAsLong >= toks.count(_ >= lo))
  }

  test("runtime filters narrow the scan to the runs containing the join tokens") {
    import graft.sinks.BulkSink
    import graft.sinks.v2.GraftBulkScanBuilder
    import org.apache.spark.sql.connector.read.SupportsRuntimeFiltering
    import org.apache.spark.sql.sources.In
    val out = Files.createTempDirectory("graft-v2-rtf").toString
    val ms = BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Seq("o_orderkey"), 8, out)
    val nonEmpty = ms.count(_.rows > 0)
    assert(nonEmpty >= 4)

    // contract mechanics: an IN set of tokens from one run's range must
    // re-plan the scan down to the runs intersecting [min, max] of the set
    val target = ms.filter(_.rows > 0).maxBy(_.rows)
    val scan = new GraftBulkScanBuilder(out).build()
    val before = scan.toBatch.planInputPartitions().length
    assert(before === nonEmpty)
    scan.asInstanceOf[SupportsRuntimeFiltering].filter(
      Array[org.apache.spark.sql.sources.Filter](
        In("token", Array[Any](target.minToken, target.maxToken))))
    val after = scan.toBatch.planInputPartitions().length
    assert(after < before, s"runtime IN filter pruned nothing ($before splits)")
    // the surviving splits all intersect the narrowed band
    assert(after >= 1)

    // set pruning beats the global band: two scattered tokens (lowest and
    // highest runs) span the whole ring by [min, max], yet only the runs
    // actually CONTAINING a value survive
    val sorted = ms.filter(_.rows > 0).sortBy(_.minToken)
    val scattered = Array[Any](sorted.head.minToken, sorted.last.maxToken)
    val scan2 = new GraftBulkScanBuilder(out).build()
    scan2.asInstanceOf[SupportsRuntimeFiltering].filter(
      Array[org.apache.spark.sql.sources.Filter](In("token", scattered)))
    val kept = scan2.toBatch.planInputPartitions().length
    assert(kept === 2, s"scattered IN set kept $kept of $nonEmpty runs " +
      "(global [min,max] would keep all)")

    // e2e: a broadcast join keyed on token stays exact with the scan's
    // runtime filtering declared (whether or not Spark chooses to inject
    // a dynamic filter at this size, results must match the plain join)
    val bulk = spark.read.format("graft-bulk").option("path", out).load()
    val probeTokens = bulk.select("token").distinct().limit(20)
    val joined = bulk.join(broadcast(probeTokens), "token").count()
    val expected = bulk.collect().map(_.getLong(0)).count(
      probeTokens.collect().map(_.getLong(0)).toSet)
    assert(joined === expected)
  }

  test("RandomPartitioner + compression compose: chunked md5-sorted runs stream and verify") {
    import graft.core.CassandraParams
    import graft.sinks.{BulkSink, InProcessCluster, SortedRunWriter, StreamLoader}
    val out = Files.createTempDirectory("graft-v2-randz").toString
    val ms = BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority")),
      Seq("o_orderkey"), 4, out,
      partitionerClass = CassandraParams.RandomPartitioner,
      compression = Some("ZstdCompressor"), chunkSize = 4 * 1024)
    val dir = new java.io.File(out)
    val nonEmpty = ms.filter(_.rows > 0)
    assert(nonEmpty.map(_.rows).sum === 1500)
    nonEmpty.foreach { m =>
      assert(m.codec === "zstd")
      assert(m.minTokenHex.matches("[0-9a-f]{32}")) // md5 range rides in hex
      assert(m.indexFile.isEmpty) // Long-token index stays suppressed
      assert(SortedRunWriter.chunksFileFor(new java.io.File(dir, m.dataFile)).exists())
      assert(m.physicalBytes < m.bytes)
    }
    // read back through the chunk-aware reader: exact rows, never truncated
    val back = spark.read.format("graft-bulk").option("path", out).load()
    assert(back.count() === 1500)
    // stream one compressed random run to a RandomPartitioner receiver:
    // it rebuilds the logical stream from the chunk map and verifies md5
    // decorated order on it
    val cluster = new InProcessCluster(Seq("cass-r"),
      partitioner = CassandraParams.RandomPartitioner)
    val endpoints = cluster.start()
    try {
      val m = nonEmpty.maxBy(_.rows)
      val (addr, port) = endpoints("cass-r")
      val r = StreamLoader.streamRun(new java.io.File(dir, m.dataFile), m,
        "cass-r", addr, port)
      assert(r.ok, s"stream session failed: ${r.message}")
      assert(r.rows === m.rows)
      val received = cluster.receivedStreams(("cass-r", m.dataFile))
      assert(received.sortedOk && received.bytes === m.bytes)
    } finally cluster.stop()
  }

  test("manifest-less directories: no early-stop truncation, no false ordering claim") {
    import graft.core.CassandraParams
    import graft.sinks.BulkSink
    import graft.sinks.v2.GraftBulkRead
    // md5-sorted random runs whose manifest goes missing (partial copy):
    // a murmur3 upper bound must NOT early-stop mid-file (murmur3 tokens
    // are unordered there) and the scan must not claim token ordering
    val out = Files.createTempDirectory("graft-v2-nomanifest").toString
    BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Seq("o_orderkey"), 2, out,
      partitionerClass = CassandraParams.RandomPartitioner)
    val full = spark.read.format("graft-bulk").option("path", out).load().collect()
    assert(full.length === 1500)
    val mid = full.map(_.getLong(0)).sorted.apply(full.length / 2)
    Files.delete(java.nio.file.Paths.get(out, "_MANIFEST.json"))
    val dir = new java.io.File(out)
    assert(!GraftBulkRead.murmur3Sorted(dir), "orderless dir claims ordering")
    GraftBulkRead.planSplits(dir, None, Some(mid)).foreach(s =>
      assert(s.hiBound === Long.MaxValue, s"unmanifested split early-stops at ${s.hiBound}"))
    val filtered = spark.read.format("graft-bulk").option("path", out).load()
      .filter(col("token") <= mid)
    assert(filtered.count() === full.count(_.getLong(0) <= mid),
      "manifest-less md5 run was truncated by a murmur3 early-stop")
  }

  test("aligned raw-payload rewrite recompresses without re-framing records") {
    import graft.sinks.BulkSink
    // write uncompressed -> rewrite to zstd via the aligned raw-payload
    // path -> records must be BYTE-identical (a re-framing writer would
    // wrap every value in another length prefix each generation)
    val src = Files.createTempDirectory("graft-v2-rw-src").toString
    prepared(4).write.format("graft-bulk")
      .option("path", src).option("buckets", "4").mode("append").save()
    val dst = Files.createTempDirectory("graft-v2-rw-dst").toString
    spark.read.format("graft-bulk").option("path", src).load()
      .select(col("token").as("_token"), col("pk").as("_pk"),
        col("value"), col("bucket").as("_bucket"))
      .write.format("graft-bulk")
      .option("path", dst).option("aligned", "true").option("payload", "raw")
      .option("compressionclass", "ZstdCompressor")
      .option("chunksize", "4096").mode("append").save()

    val srcRows = spark.read.format("graft-bulk").option("path", src).load()
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq,
        r.getAs[Array[Byte]](2).toSeq)).toSet
    val dstRows = spark.read.format("graft-bulk").option("path", dst).load()
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq,
        r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(dstRows === srcRows, "rewrite changed record bytes")
    val ms = BulkSink.readManifests(new java.io.File(dst)).filter(_.rows > 0)
    assert(ms.nonEmpty && ms.forall(_.codec === "zstd"))
    assert(ms.map(_.physicalBytes).sum < ms.map(_.bytes).sum)
    // and a second rewrite back to uncompressed is still identical
    // (idempotence across generations)
    val dst2 = Files.createTempDirectory("graft-v2-rw-dst2").toString
    spark.read.format("graft-bulk").option("path", dst).load()
      .select(col("token").as("_token"), col("pk").as("_pk"),
        col("value"), col("bucket").as("_bucket"))
      .write.format("graft-bulk")
      .option("path", dst2).option("aligned", "true").option("payload", "raw")
      .mode("append").save()
    val dst2Rows = spark.read.format("graft-bulk").option("path", dst2).load()
      .collect().map(r => (r.getLong(0), r.getAs[Array[Byte]](1).toSeq,
        r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(dst2Rows === srcRows)
    // payload=raw refuses ambiguous shapes at plan time
    val e = intercept[Exception] {
      spark.read.format("graft-bulk").option("path", src).load()
        .select(col("token").as("_token"), col("pk").as("_pk"),
          col("value"), col("token").as("extra"), col("bucket").as("_bucket"))
        .write.format("graft-bulk")
        .option("path", Files.createTempDirectory("graft-v2-rw-bad").toString)
        .option("aligned", "true").option("payload", "raw").mode("append").save()
    }
    assert(SparkSuite.causeMessages(e).exists(_.contains("payload=raw")))
  }

  test("aligned raw-payload rewrite serves RandomPartitioner directories too") {
    import graft.core.CassandraParams
    import graft.functions.cassandra_random_token
    import graft.sinks.BulkSink
    // md5-sorted source: the rewrite keys by the md5 token recomputed
    // from the pk (the reader's murmur3 `token` is unordered here and
    // would fail the writer's decorated-order check)
    val src = Files.createTempDirectory("graft-v2-rw-rand").toString
    BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Seq("o_orderkey"), 4, src,
      partitionerClass = CassandraParams.RandomPartitioner)
    val dst = Files.createTempDirectory("graft-v2-rw-rand-dst").toString
    spark.read.format("graft-bulk").option("path", src).load()
      .select(cassandra_random_token(col("pk")).as("_token"), col("pk").as("_pk"),
        col("value"), col("bucket").as("_bucket"))
      .write.format("graft-bulk")
      .option("path", dst).option("aligned", "true").option("payload", "raw")
      .option("compressionclass", "LZ4Compressor").mode("append").save()
    val ms = BulkSink.readManifests(new java.io.File(dst)).filter(_.rows > 0)
    assert(ms.map(_.rows).sum === 1500)
    assert(ms.forall(m => m.codec === "lz4" && m.minTokenHex.matches("[0-9a-f]{32}")))
    // records byte-identical to the source
    val srcRows = spark.read.format("graft-bulk").option("path", src).load()
      .collect().map(r => (r.getAs[Array[Byte]](1).toSeq, r.getAs[Array[Byte]](2).toSeq)).toSet
    val dstRows = spark.read.format("graft-bulk").option("path", dst).load()
      .collect().map(r => (r.getAs[Array[Byte]](1).toSeq, r.getAs[Array[Byte]](2).toSeq)).toSet
    assert(dstRows === srcRows)
  }

  test("mode(overwrite) truncates the previous load's runs, append keeps them") {
    // regression: truncate() was a no-op, so overwrite left the old
    // Data.db files beside the new manifest and the reader's
    // pre-manifest fallback resurrected them as duplicate rows
    val out = Files.createTempDirectory("graft-v2-ow").toString
    prepared(4).write.format("graft-bulk")
      .option("path", out).option("buckets", "4").mode("append").save()
    assert(spark.read.format("graft-bulk").option("path", out).load().count() === 1500)
    // overwrite with a SUBSET (500 rows, different bucket count)
    spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderkey") <= 2000)
      .withColumn("_pk", partition_key(col("o_orderkey")))
      .withColumn("_token", cassandra_token(col("_pk")))
      .withColumn("_bucket", token_bucket(col("_token"), 2))
      .write.format("graft-bulk")
      .option("path", out).option("buckets", "2").mode("overwrite").save()
    val back = spark.read.format("graft-bulk").option("path", out).load()
    val expected = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .filter(col("o_orderkey") <= 2000).count()
    assert(back.count() === expected,
      "stale runs from the previous load leaked into the overwrite read")
    // no stale artifacts on disk either
    val names = new java.io.File(out).listFiles().map(_.getName)
    assert(names.count(_.endsWith("-Data.db")) ===
      graft.sinks.BulkSink.readManifests(new java.io.File(out)).length)
  }

  test("unknown compressionclass fails at plan time, loudly") {
    val out = Files.createTempDirectory("graft-v2-badcodec").toString
    val e = intercept[Exception] {
      prepared(4).write.format("graft-bulk")
        .option("path", out).option("buckets", "4")
        .option("compressionclass", "BrotliCompressor").mode("append").save()
    }
    assert(SparkSuite.causeMessages(e).exists(_.contains("unsupported compressionclass")))
    // nothing was written
    assert(!new java.io.File(out, "_MANIFEST.json").exists())
  }

  test("bucket-less write with a size advisory still emits valid sorted runs") {
    import graft.sinks.BulkSink
    // no fixed bucket count: Spark/AQE picks the partitioning (sized by
    // the advisory); several ring buckets may share a task, which is a
    // legal run shape — each task still writes one decorated-sorted run
    val out = Files.createTempDirectory("graft-v2-advisory").toString
    prepared(8).write.format("graft-bulk")
      .option("path", out)
      .option("advisorypartitionbytes", (64 * 1024).toString)
      .mode("append").save()
    val ms = BulkSink.readManifests(new java.io.File(out)).filter(_.rows > 0)
    assert(ms.nonEmpty && ms.map(_.rows).sum === 1500)
    assert(ms.forall(_.sorted))
    val back = spark.read.format("graft-bulk").option("path", out).load()
    assert(back.count() === 1500)
    assert(back.filter(cassandra_token(col("pk")) =!= col("token")).count() === 0)
  }

  test("limit and token top-n plan only the runs they need") {
    import graft.sinks.BulkSink
    val out = Files.createTempDirectory("graft-v2-limit").toString
    val ms = BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderstatus")),
      Seq("o_orderkey"), 8, out)
    val nonEmpty = ms.count(_.rows > 0)
    assert(nonEmpty >= 4)
    def scan() = spark.read.format("graft-bulk").option("path", out).load()

    // bare LIMIT: one run covers 10 rows -> one split planned
    val limited = scan().limit(10)
    assert(limited.count() === 10)
    assert(limited.rdd.getNumPartitions < nonEmpty,
      "LIMIT still plans every run")

    // ORDER BY token LIMIT: the result equals the full sort's prefix
    // (disjoint ring ranges -> bottom runs contain the global bottom-n)
    val fullAsc = scan().collect().map(_.getLong(0)).sorted
    val bottom = scan().orderBy(col("token")).limit(7)
    assert(bottom.collect().map(_.getLong(0)).toSeq === fullAsc.take(7).toSeq)
    val top = scan().orderBy(col("token").desc).limit(7)
    assert(top.collect().map(_.getLong(0)).toSeq ===
      fullAsc.reverse.take(7).toSeq)

    // a pushed token band disables the truncation (estimates over-count);
    // exactness must hold regardless
    val mid = fullAsc(fullAsc.length / 2)
    assert(scan().filter(col("token") >= mid).limit(5).count() === 5)
  }

  test("chunked run missing its Chunks.db sidecar fails loudly, not truncated") {
    import graft.sinks.BulkSink
    // several chunks per run (1 KiB chunks), so a sequential decompressor
    // would stop at the first chunk boundary and silently return ~2% of
    // the rows — exactly the failure mode the reader must refuse
    val out = Files.createTempDirectory("graft-v2-sidecar").toString
    val ms = BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority")),
      Seq("o_orderkey"), 2, out, compression = Some("ZstdCompressor"),
      chunkSize = 1024)
    assert(ms.filter(_.rows > 0).forall(_.chunks > 1),
      "test needs multi-chunk runs to be meaningful")
    assert(spark.read.format("graft-bulk").option("path", out).load().count() === 1500)
    // a partial directory copy that kept Data.db but lost the sidecars
    new java.io.File(out).listFiles().filter(_.getName.endsWith("-Chunks.db"))
      .foreach(f => assert(f.delete()))
    val e = intercept[Exception] {
      spark.read.format("graft-bulk").option("path", out).load().count()
    }
    assert(SparkSuite.causeMessages(e).exists(m => m.contains("sidecar") && m.contains("missing")),
      s"expected a loud sidecar-loss failure, got: ${SparkSuite.causeMessages(e).mkString(" | ")}")
  }

  test("corrupt Chunks.db sidecar fails as loudly as a missing one") {
    import graft.sinks.BulkSink
    val out = Files.createTempDirectory("graft-v2-badsidecar").toString
    val ms = BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority")),
      Seq("o_orderkey"), 1, out, compression = Some("ZstdCompressor"),
      chunkSize = 1024)
    assert(ms.filter(_.rows > 0).forall(_.chunks > 1))
    assert(spark.read.format("graft-bulk").option("path", out).load().count() === 1500)
    // flip one chunk's physical offset so extents stop ascending — the
    // read must refuse the framing (named file), not mis-frame the
    // decompress or crash allocating a bogus extent
    val sidecar = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith("-Chunks.db")).head
    val raf = new java.io.RandomAccessFile(sidecar, "rw")
    try {
      raf.seek(16 + 8) // second pair's physical offset
      raf.writeLong(-5L)
    } finally raf.close()
    val e = intercept[Exception] {
      spark.read.format("graft-bulk").option("path", out).load().count()
    }
    assert(SparkSuite.causeMessages(e).exists(m =>
      m.contains("corrupt chunk sidecar") && m.contains(sidecar.getName)),
      s"expected a loud corrupt-sidecar failure, got: ${SparkSuite.causeMessages(e).mkString(" | ")}")
  }

  test("an EMPTY chunk map over non-empty payload is corrupt framing, not a pass") {
    import graft.sinks.SortedRunWriter
    // the stream sender hits this when the sidecar file is missing: zero
    // chunks cannot frame compressed bytes, and the old silent pass sent
    // the payload anyway, failing receiver-side with a row-count mismatch
    // that never named the sidecar
    assert(SortedRunWriter.chunkFramingError(Array.empty, 0L).isEmpty)
    assert(SortedRunWriter.chunkFramingError(Array.empty, 1024L)
      .exists(_.contains("empty chunk map")))
    val e = intercept[IllegalStateException] {
      SortedRunWriter.validateChunks(
        new java.io.File("/tmp/x-Chunks.db"), Array.empty, 1024L)
    }
    assert(e.getMessage.contains("x-Chunks.db"))
  }

  test("legacy sequential compressed runs (pre-chunking manifest) still read") {
    import graft.sinks.BulkSink
    // one chunk per run -> the file IS a single valid zstd stream, the
    // shape a pre-chunking writer produced; strip the manifest's chunks
    // field (it didn't exist then) and drop the sidecars
    val out = Files.createTempDirectory("graft-v2-legacy").toString
    BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority")),
      Seq("o_orderkey"), 2, out, compression = Some("ZstdCompressor"),
      chunkSize = 32 * 1024 * 1024)
    val mf = java.nio.file.Paths.get(out, "_MANIFEST.json")
    val json = new String(Files.readAllBytes(mf))
    Files.write(mf, json.replaceAll("\"chunks\":-?\\d+,", "").getBytes)
    new java.io.File(out).listFiles().filter(_.getName.endsWith("-Chunks.db"))
      .foreach(f => assert(f.delete()))
    val parsed = BulkSink.readManifests(new java.io.File(out))
    assert(parsed.nonEmpty && parsed.forall(_.chunks === -1))
    // chunked-ness unknown -> sequential fallback reads the whole stream
    val back = spark.read.format("graft-bulk").option("path", out).load()
    assert(back.count() === 1500)
    assert(back.filter(cassandra_token(col("pk")) =!= col("token")).count() === 0)
  }

  test("token top-n DESC is not fooled by a run pinned at the minimum token") {
    import graft.sinks.{BulkSink, SortedRunWriter}
    import graft.core.CqlValueCodec
    // run 0: one empty partition key — its token pins to Long.MinValue,
    // where -maxToken overflows back to Long.MinValue and (before the fix)
    // sorted this run AHEAD of the true top runs in DESC planning
    val out = Files.createTempDirectory("graft-v2-topn-min").toString
    val w0 = new SortedRunWriter(out, 0)
    w0.add(Long.MinValue, Array.emptyByteArray, Array[Byte](1))
    val m0 = w0.close()
    // run 1: ordinary keys in decorated order
    val keyed = (1L to 64L)
      .map(k => CqlValueCodec.serializeLong(k))
      .map(k => (CassandraTokens.token(k), k))
      .sortBy(_._1)
    val w1 = new SortedRunWriter(out, 1)
    keyed.foreach { case (t, k) => w1.add(t, k, Array[Byte](2)) }
    val m1 = w1.close()
    val json = Seq(m0, m1).map(BulkSink.manifestJson).mkString("[", ",", "]")
    Files.write(java.nio.file.Paths.get(out, "_MANIFEST.json"), json.getBytes)

    val top = spark.read.format("graft-bulk").option("path", out).load()
      .orderBy(col("token").desc).limit(1).collect()
    assert(top.length === 1)
    assert(top.head.getLong(0) === keyed.map(_._1).max,
      "DESC top-1 planned the Long.MinValue run instead of the true top run")
  }

  test("a failed overwrite leaves the previous load intact and readable") {
    val out = Files.createTempDirectory("graft-v2-ow-fail").toString
    prepared(4).write.format("graft-bulk")
      .option("path", out).option("buckets", "4").mode("append").save()
    val before = spark.read.format("graft-bulk").option("path", out).load().collect()
    assert(before.length === 1500)
    // aligned=true skips the Catalyst sort and asserts sorted input; feed
    // UNSORTED input so the run writer's order check fails the job mid-write
    intercept[Exception] {
      prepared(4).write.format("graft-bulk")
        .option("path", out).option("buckets", "4").option("aligned", "true")
        .mode("overwrite").save()
    }
    // the previous load survives the failed overwrite untouched: same
    // rows, same manifest, and no staging leftovers
    val after = spark.read.format("graft-bulk").option("path", out).load().collect()
    assert(after.length === 1500)
    assert(after.map(_.getLong(0)).sorted.toSeq ===
      before.map(_.getLong(0)).sorted.toSeq)
    val leftovers = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("_overwrite-"))
    assert(leftovers.isEmpty, s"staging leftovers: ${leftovers.mkString(", ")}")
  }

  test("a truncated Data.db fails loudly instead of a silently partial scan") {
    import graft.sinks.BulkSink
    val out = Files.createTempDirectory("graft-v2-trunc").toString
    BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority")),
      Seq("o_orderkey"), 2, out)
    assert(spark.read.format("graft-bulk").option("path", out).load().count() === 1500)
    // chop the tail off one run (a partial copy): the manifest's logical
    // byte count no longer matches what the stream yields
    val victim = new java.io.File(out).listFiles()
      .filter(_.getName.endsWith("-Data.db")).maxBy(_.length)
    val ch = java.nio.channels.FileChannel.open(victim.toPath,
      java.nio.file.StandardOpenOption.WRITE)
    try ch.truncate(victim.length() / 2) finally ch.close()
    val e = intercept[Exception] {
      spark.read.format("graft-bulk").option("path", out).load().count()
    }
    assert(SparkSuite.causeMessages(e).exists(_.contains("truncated or stale-manifest")),
      s"expected the truncation guard, got: ${SparkSuite.causeMessages(e).mkString(" | ")}")

    // the mirror corruption: EXTRA trailing records a stale manifest never
    // promised must also refuse, not silently emit more rows
    val out2 = Files.createTempDirectory("graft-v2-overlong").toString
    BulkSink.writeSorted(
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .select(col("o_orderkey"), col("o_orderpriority")),
      Seq("o_orderkey"), 2, out2)
    val victim2 = new java.io.File(out2).listFiles()
      .filter(_.getName.endsWith("-Data.db")).maxBy(_.length)
    val extra = new java.io.DataOutputStream(
      new java.io.FileOutputStream(victim2, true))
    try { // one complete, parseable record frame past the manifested end
      extra.writeShort(2); extra.write(Array[Byte](1, 2))
      extra.writeInt(1); extra.write(Array[Byte](3))
    } finally extra.close()
    val e2 = intercept[Exception] {
      spark.read.format("graft-bulk").option("path", out2).load().count()
    }
    assert(SparkSuite.causeMessages(e2).exists(_.contains("truncated or stale-manifest")),
      s"expected the overlong guard, got: ${SparkSuite.causeMessages(e2).mkString(" | ")}")
  }

  test("v2 sink rejects input without routing columns") {
    val out = Files.createTempDirectory("graft-v2-bad").toString
    val e = intercept[Exception] {
      spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
        .write.format("graft-bulk").option("path", out).mode("append").save()
    }
    assert(e.getMessage.contains("_pk") || e.getCause != null)
  }
}
