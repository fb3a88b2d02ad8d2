package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sinks.SSTableWriterAdapter

/** The cassandra-all delegation seam (ADR 0001): guidance offline, real
  * reflective chain when the jar is present. */
class SSTableAdapterSpec extends AnyFunSuite {

  test("without cassandra-all, create raises guidance pointing at the ADR") {
    assume(!SSTableWriterAdapter.available) // offline build: jar absent
    val e = intercept[UnsupportedOperationException] {
      SSTableWriterAdapter.create("/tmp/x",
        "CREATE TABLE ks.t (k bigint PRIMARY KEY, v text)",
        "INSERT INTO ks.t (k, v) VALUES (?, ?)")
    }
    assert(e.getMessage.contains("cassandra-all"))
    assert(e.getMessage.contains("adr"))
  }

  test("jar-gated: CQLSSTableWriter builder chain resolves and writes one row") {
    // Visibly canceled offline. With cassandra-all present this exercises
    // the full reflective chain end-to-end: build a sorted writer, add a
    // row, close — the components (Data/Index/Statistics/TOC) appear.
    assume(SSTableWriterAdapter.available)
    val dir = java.nio.file.Files.createTempDirectory("graft-sstable").toFile
    val w = SSTableWriterAdapter.create(dir.getAbsolutePath,
      "CREATE TABLE ks.t (k bigint PRIMARY KEY, v text)",
      "INSERT INTO ks.t (k, v) VALUES (?, ?)")
    SSTableWriterAdapter.addRow(w, Seq(java.lang.Long.valueOf(1L), "one"))
    SSTableWriterAdapter.close(w)
    val files = Option(dir.listFiles()).getOrElse(Array.empty).map(_.getName)
    assert(files.exists(_.endsWith("Data.db")), s"no Data.db in ${files.mkString(",")}")
    assert(files.exists(_.endsWith("TOC.txt")), s"no TOC.txt in ${files.mkString(",")}")
  }
}
