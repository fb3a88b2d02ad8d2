package graft

import java.net.URI
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FSDataInputStream, Path, RawLocalFileSystem}

/** `file://` semantics under a `cntfs://` scheme, counting OPENS of
  * tracked file names — lets a spec pin how many times an operator
  * actually opened specific data files (the single-scan contract),
  * independent of compression ratios, OS caching, or byte-accounting
  * quirks in the reader. Register in the Hadoop conf with:
  *
  * {{{
  *   fs.cntfs.impl                    = graft.CountingLocalFs
  *   fs.AbstractFileSystem.cntfs.impl = graft.CountingLocalAbstractFs
  * }}}
  */
class CountingLocalFs extends RawLocalFileSystem {
  override def getScheme: String = "cntfs"
  override def getUri: URI = URI.create("cntfs:///")
  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    if (CountingLocalFs.tracked.contains(f.getName))
      CountingLocalFs.opens.incrementAndGet()
    super.open(f, bufferSize)
  }
}

object CountingLocalFs {
  val opens = new AtomicInteger(0)
  @volatile var tracked: Set[String] = Set.empty
}

/** The `FileContext` binding for the `cntfs://` scheme (commit renames
  * run through `FileContext`, which resolves `AbstractFileSystem`
  * impls, not `FileSystem` ones). */
class CountingLocalAbstractFs(uri: URI, conf: Configuration)
  extends org.apache.hadoop.fs.DelegateToFileSystem(
    uri, new CountingLocalFs, conf, "cntfs", false)
