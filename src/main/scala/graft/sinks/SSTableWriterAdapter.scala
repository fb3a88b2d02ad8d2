package graft.sinks

/**
 * Reflection-gated plug for writing REAL Cassandra BIG-format SSTables at
 * the SortedRunWriter seam, for deployments that put `cassandra-all` on
 * the executor classpath. Mirrors the reference's delegation boundary
 * (CrunchCqlBulkRecordWriter.java:87-107: `CQLSSTableWriter.builder()
 * .inDirectory(dir).forTable(schema).using(insert).sorted().build()`,
 * then `rawAddRow`/`addRow` per record) — the format itself is always the
 * server's, never hand-rolled here. See docs/adr/0001-bulk-run-format.md
 * for why the GRFT sorted-run format is this build's offline contract.
 *
 * Same availability pattern as [[graft.core.DriverClusterInfo]]: `available`
 * probes the class, every entry point raises actionable guidance when the
 * jar is absent, and the jar-gated spec is visibly canceled offline.
 */
object SSTableWriterAdapter {

  val WriterClass = "org.apache.cassandra.io.sstable.CQLSSTableWriter"

  /** Is cassandra-all on the classpath? */
  def available: Boolean =
    try { Class.forName(WriterClass); true }
    catch { case _: ClassNotFoundException => false }

  private def requireJar(): Unit =
    if (!available) throw new UnsupportedOperationException(
      s"$WriterClass not on the classpath — add cassandra-all (matching the " +
        "target cluster version) to write real BIG-format SSTables, or use " +
        "the GRFT sorted-run directory format (the offline contract: " +
        "docs/adr/0001-bulk-run-format.md)")

  /**
   * Build a sorted-mode SSTable writer for one output partition.
   * `createTableCql` / `insertCql` are the table DDL and INSERT the
   * server-side writer derives the layout from (the reference builds both
   * from its ClusterInfo: CrunchCqlBulkRecordWriter.java:90-101). Rows
   * MUST arrive in decorated-key order — the same contract SortedRunWriter
   * enforces for GRFT runs.
   */
  def create(outDir: String, createTableCql: String, insertCql: String): AnyRef = {
    requireJar()
    val cls = Class.forName(WriterClass)
    val builder = cls.getMethod("builder").invoke(null)
    def call(target: AnyRef, name: String, sig: Array[Class[_]], args: AnyRef*): AnyRef = {
      val m = target.getClass.getMethods.find(m =>
        m.getName == name && m.getParameterTypes.sameElements(sig))
        .getOrElse(throw new NoSuchMethodException(s"${target.getClass.getName}.$name"))
      m.setAccessible(true)
      m.invoke(target, args: _*)
    }
    val b1 = call(builder, "inDirectory", Array(classOf[java.io.File]),
      new java.io.File(outDir))
    val b2 = call(b1, "forTable", Array(classOf[String]), createTableCql)
    val b3 = call(b2, "using", Array(classOf[String]), insertCql)
    val b4 = call(b3, "sorted", Array.empty[Class[_]])
    call(b4, "build", Array.empty[Class[_]])
  }

  /** `writer.addRow(List<Object> values)` — one bound row per call. */
  def addRow(writer: AnyRef, values: Seq[AnyRef]): Unit = {
    val list = new java.util.ArrayList[AnyRef](values.length)
    values.foreach(list.add)
    writer.getClass.getMethod("addRow", classOf[java.util.List[_]])
      .invoke(writer, list)
    ()
  }

  def close(writer: AnyRef): Unit = {
    writer.getClass.getMethod("close").invoke(writer)
    ()
  }
}
