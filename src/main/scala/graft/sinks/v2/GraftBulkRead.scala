package graft.sinks.v2

import java.io.{BufferedInputStream, DataInputStream, EOFException, File, FileInputStream}

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.types._

import graft.core.CassandraTokens

/**
 * Read path for the graft-bulk sorted-run format: each Data.db file is one
 * InputPartition (files are independent sorted runs, so parallelism =
 * partition count of the original load) streaming (token, pk, value)
 * rows. Lets a distributed verification or repair job re-scan a bulk load
 * without any driver-side file handling.
 */
object GraftBulkRead {
  val schema: StructType = StructType(Seq(
    StructField("token", LongType, nullable = false),
    StructField("pk", BinaryType, nullable = false),
    StructField("value", BinaryType, nullable = false)))
}

final class GraftBulkScanBuilder(path: String) extends ScanBuilder {
  override def build(): Scan = new Scan with Batch {
    override def readSchema(): StructType = GraftBulkRead.schema
    override def toBatch: Batch = this

    override def planInputPartitions(): Array[InputPartition] = {
      val dir = new File(path)
      // per-file codec from the manifest the writer left (absent manifest
      // or unlisted file -> uncompressed, the pre-codec format)
      val codecs: Map[String, String] = {
        val mf = new File(dir, "_MANIFEST.json")
        if (!mf.exists()) Map.empty
        else {
          val json = new String(java.nio.file.Files.readAllBytes(mf.toPath),
            java.nio.charset.StandardCharsets.UTF_8)
          val re = """"dataFile":"([^"]+)"(?:,"indexFile":"[^"]*")?,"codec":"([^"]+)"""".r
          re.findAllMatchIn(json).map(m => m.group(1) -> m.group(2)).toMap
        }
      }
      val files = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(_.getName.endsWith("-Data.db")).sortBy(_.getName)
      files.map(f => GraftBulkInputPartition(f.getAbsolutePath,
        codecs.getOrElse(f.getName, "none")): InputPartition)
    }

    override def createReaderFactory(): PartitionReaderFactory =
      new GraftBulkReaderFactory
  }
}

final case class GraftBulkInputPartition(file: String, codec: String) extends InputPartition

final class GraftBulkReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBulkInputPartition]
    new GraftBulkPartitionReader(p.file, p.codec)
  }
}

final class GraftBulkPartitionReader(file: String, codec: String = "none")
    extends PartitionReader[InternalRow] {
  private val in = new DataInputStream(new BufferedInputStream(
    graft.sinks.SortedRunWriter.decompress(codec, new FileInputStream(file)), 1 << 16))
  private var current: InternalRow = _

  override def next(): Boolean = {
    try {
      val klen = in.readUnsignedShort()
      val key = new Array[Byte](klen); in.readFully(key)
      val vlen = in.readInt()
      val value = new Array[Byte](vlen); in.readFully(value)
      current = new GenericInternalRow(Array[Any](CassandraTokens.token(key), key, value))
      true
    } catch { case _: EOFException => false }
  }

  override def get(): InternalRow = current
  override def close(): Unit = in.close()
}
