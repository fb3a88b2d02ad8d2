package graft.core

import org.scalatest.funsuite.AnyFunSuite

/**
 * The pure row-to-ClusterInfo mapping behind the (reflection-only) live
 * driver fetch — stub rows standing in for system.local / system.peers /
 * system_schema.columns results, as the scaladoc promises.
 */
class DriverClusterInfoSpec extends AnyFunSuite {
  import DriverClusterInfo.{ColumnRow, NodeRow}

  private val m3 = CassandraParams.Murmur3Partitioner

  test("fromSystemRows maps nodes and tokens to the ring") {
    val info = DriverClusterInfo.fromSystemRows(m3,
      Seq(NodeRow("10.0.0.1", Seq("-9000000000000000000", " 0 ", "42")),
        NodeRow("10.0.0.2", Seq("100", "200"))),
      columns = Nil)
    assert(info.partitionerClass === m3)
    assert(info.numClusterNodes === 2)
    assert(info.ring === Seq(
      "10.0.0.1" -> Seq(-9000000000000000000L, 0L, 42L),
      "10.0.0.2" -> Seq(100L, 200L)))
  }

  test("columns order partition key first, then clustering, then regular") {
    // deliberately shuffled input: regular column first, second key part
    // before the first, clustering in the middle
    val info = DriverClusterInfo.fromSystemRows(m3,
      Seq(NodeRow("h", Seq("1"))),
      Seq(ColumnRow("payload", "regular", -1),
        ColumnRow("bucket", "partition_key", 1),
        ColumnRow("ck", "clustering", 0),
        ColumnRow("user_id", "partition_key", 0)))
    assert(info.allColumnNames === Seq("user_id", "bucket", "ck", "payload"))
    assert(info.partitionKeyIndexes.toSeq === Seq(0, 1))
  }

  test("no partition-key rows falls back to index 0") {
    val info = DriverClusterInfo.fromSystemRows(m3,
      Seq(NodeRow("h", Seq("1"))),
      Seq(ColumnRow("a", "regular", -1), ColumnRow("b", "regular", -1)))
    assert(info.partitionKeyIndexes.toSeq === Seq(0))
  }

  test("replication map resolves to a total replica count") {
    // SimpleStrategy: the factor is `replication_factor`
    assert(DriverClusterInfo.replicationFactorOf(Map(
      "class" -> "org.apache.cassandra.locator.SimpleStrategy",
      "replication_factor" -> "3")) === Some(3))
    // NetworkTopologyStrategy: one factor per DC, total = sum (every
    // replica must receive its range's stream)
    assert(DriverClusterInfo.replicationFactorOf(Map(
      "class" -> "org.apache.cassandra.locator.NetworkTopologyStrategy",
      "dc1" -> "3", "dc2" -> "2")) === Some(5))
    // no numeric factors -> None (planner falls back loudly)
    assert(DriverClusterInfo.replicationFactorOf(Map(
      "class" -> "org.apache.cassandra.locator.SimpleStrategy")) === None)
    assert(DriverClusterInfo.replicationFactorOf(Map(
      "class" -> "x", "replication_factor" -> "not-a-number")) === None)
  }

  test("fromSystemRows threads the replication map into ClusterInfo") {
    val info = DriverClusterInfo.fromSystemRows(m3,
      Seq(NodeRow("h", Seq("1"))), Nil,
      replication = Some(Map("class" -> "SimpleStrategy", "replication_factor" -> "3")))
    assert(info.replicationFactor === Some(3))
    val none = DriverClusterInfo.fromSystemRows(m3, Seq(NodeRow("h", Seq("1"))), Nil)
    assert(none.replicationFactor === None)
  }

  test("ring JSON rf field round-trips through fromJsonString") {
    val info = StaticClusterInfo.fromJsonString(
      """{"partitioner": "org.apache.cassandra.dht.Murmur3Partitioner",
        | "rf": 3,
        | "nodes": [{"host": "h1", "tokens": [0]}]}""".stripMargin)
    assert(info.replicationFactor === Some(3))
    val absent = StaticClusterInfo.fromJsonString(
      """{"partitioner": "org.apache.cassandra.dht.Murmur3Partitioner",
        | "nodes": [{"host": "h1", "tokens": [0]}]}""".stripMargin)
    assert(absent.replicationFactor === None)
    intercept[IllegalArgumentException] {
      StaticClusterInfo.fromJsonString(
        """{"partitioner": "org.apache.cassandra.dht.Murmur3Partitioner",
          | "rf": 0, "nodes": [{"host": "h1", "tokens": [0]}]}""".stripMargin)
    }
  }

  test("empty node list is rejected") {
    intercept[IllegalArgumentException] {
      DriverClusterInfo.fromSystemRows(m3, Nil, Nil)
    }
  }

  test("RandomPartitioner rings fail explicitly, not with NumberFormatException") {
    // md5 tokens reach 2^127-1 — far past Long — and every downstream ring
    // consumer speaks Murmur3 vnodes; the fetch must say so up front
    val e = intercept[IllegalArgumentException] {
      DriverClusterInfo.fromSystemRows(CassandraParams.RandomPartitioner,
        Seq(NodeRow("h", Seq("137530082342577569017132142693387977319"))),
        Nil)
    }
    assert(e.getMessage.contains("unsupported partitioner"))
    assert(e.getMessage.contains("RandomPartitioner"))
  }

  test("driver fetch without the driver jar raises guidance, not ClassNotFound") {
    assume(!DriverClusterInfo.available) // offline build: jar absent
    val e = intercept[UnsupportedOperationException] {
      DriverClusterInfo.fetch("127.0.0.1", 9042, "ks", "tbl")
    }
    assert(e.getMessage.contains("socket://"))
  }

  test("JSON/socket metadata path mirrors the RandomPartitioner ring refusal") {
    // fromJsonString backs BOTH offline paths (ring file + socket fetch);
    // md5 tokens overflow its Long parse exactly like the driver path's —
    // same refusal, same guidance, instead of NumberFormatException
    val e = intercept[IllegalArgumentException] {
      StaticClusterInfo.fromJsonString(
        """{"partitioner": "org.apache.cassandra.dht.RandomPartitioner",
          | "nodes": [{"host": "h1",
          |   "tokens": [137530082342577569017132142693387977319]}]}""".stripMargin)
    }
    assert(e.getMessage.contains("unsupported partitioner"))
    assert(e.getMessage.contains("alignToRing"))
  }

  test("ring-less RandomPartitioner metadata stays valid (alignToRing needs no ring)") {
    val info = StaticClusterInfo.fromJsonString(
      """{"partitioner": "org.apache.cassandra.dht.RandomPartitioner",
        | "nodes": [{"host": "h1", "tokens": []}, {"host": "h2", "tokens": []}],
        | "columns": ["rowkey", "v"], "key_indexes": [0]}""".stripMargin)
    assert(info.partitionerClass === CassandraParams.RandomPartitioner)
    assert(info.numClusterNodes === 2)
    assert(info.ring.forall(_._2.isEmpty))
  }

  test("jar-gated: reflective builder chain resolves against a real driver jar") {
    // Runs ONLY when the DataStax driver is on the classpath (canceled —
    // visibly, not silently absent — on the offline build). No live
    // cluster exists even then, so success criterion: the reflection chain
    // (builder/addContactPoint/withLocalDatacenter/build) must resolve and
    // fail at the CONNECTION layer, never with a reflective lookup error.
    assume(DriverClusterInfo.available)
    val e = intercept[Throwable] {
      DriverClusterInfo.fetch("127.0.0.1", 1 /* nothing listens */, "ks", "tbl")
    }
    def chain(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: chain(t.getCause)
    assert(!chain(e).exists(t => t.isInstanceOf[NoSuchMethodException] ||
      t.isInstanceOf[ClassNotFoundException] || t.isInstanceOf[NoSuchMethodError]),
      s"reflective lookup failed rather than the connection: $e")
  }
}
