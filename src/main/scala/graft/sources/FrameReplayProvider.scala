package graft.sources

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.{BinaryType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import java.util
import scala.jdk.CollectionConverters._

/** DataSourceV2 micro-batch streaming source: replays spooled binary tick
  * frames (SURVEY §2.1 S1 — the engine-native stand-in for the reference's
  * WebSocket client, /root/reference/ws/client.go:90-112).
  *
  * Frames are length-prefixed records in `.bin` spool files under `path`
  * (written by FrameSpool.write). Offsets are (fileIndex, recordIndex) —
  * restart from checkpoint resumes mid-file, giving the at-least-once
  * upgrade over the reference's drop-on-full channel. `maxFramesPerBatch`
  * is the backpressure knob (reference BUFFER_SIZE analog): a backlog
  * drains across triggers instead of being dropped.
  *
  * Usage:
  *   spark.readStream.format("graft.sources.FrameReplayProvider")
  *     .option("path", spoolDir).option("maxFramesPerBatch", "1000").load()
  */
class FrameReplayProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FrameReplayProvider.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FrameReplayTable(properties.get("path"),
      Option(properties.get("maxFramesPerBatch")).map(_.toInt).getOrElse(1000))
}

object FrameReplayProvider {
  val schema: StructType = StructType(Seq(StructField("payload", BinaryType)))
}

class FrameReplayTable(path: String, maxPerBatch: Int) extends Table with SupportsRead {
  require(path != null, "option 'path' is required")
  override def name(): String = s"frame-replay($path)"
  override def schema(): StructType = FrameReplayProvider.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = FrameReplayProvider.schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new FrameReplayStream(path, maxPerBatch)
    }
}

/** Offset = cumulative frame count across the sorted spool files. */
case class FrameOffset(frameCount: Long) extends Offset {
  override def json(): String = frameCount.toString
}

class FrameReplayStream(path: String, maxPerBatch: Int)
    extends MicroBatchStream with SupportsAdmissionControl {

  private def frameCounts(): Seq[(String, Long)] = FrameSpool.listFiles(path)

  override def initialOffset(): Offset = FrameOffset(0L)

  /** Admission control: the per-trigger cap lives HERE (capping only in
    * planInputPartitions would desync the committed offset from the rows
    * actually read). */
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val from = start.asInstanceOf[FrameOffset].frameCount
    val total = frameCounts().map(_._2).sum
    FrameOffset(math.min(total, from + maxPerBatch))
  }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(maxPerBatch)

  override def reportLatestOffset(): Offset = FrameOffset(frameCounts().map(_._2).sum)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) is used via SupportsAdmissionControl")

  override def deserializeOffset(json: String): Offset = FrameOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val from = start.asInstanceOf[FrameOffset].frameCount
    val until = end.asInstanceOf[FrameOffset].frameCount
    if (until <= from) return Array.empty
    // map the global [from, until) frame range onto per-file sub-ranges
    var cum = 0L
    val parts = Seq.newBuilder[InputPartition]
    for ((file, n) <- frameCounts()) {
      val fileStart = cum
      val fileEnd = cum + n
      val lo = math.max(from, fileStart)
      val hi = math.min(until, fileEnd)
      if (hi > lo) parts += FrameReplayPartition(file, lo - fileStart, hi - fileStart)
      cum = fileEnd
    }
    parts.result().toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = new PartitionReaderFactory {
    override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
      val p = partition.asInstanceOf[FrameReplayPartition]
      new PartitionReader[InternalRow] {
        private val frames = FrameSpool.readRange(p.file, p.fromRecord, p.untilRecord)
        private var i = -1
        override def next(): Boolean = { i += 1; i < frames.length }
        override def get(): InternalRow = InternalRow(frames(i))
        override def close(): Unit = ()
      }
    }
  }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class FrameReplayPartition(file: String, fromRecord: Long, untilRecord: Long)
    extends InputPartition

/** Length-prefixed binary spool files (the capture format). Pure JVM I/O —
  * works for local paths in tests; a production deployment would route
  * through the Hadoop FileSystem API the same way. */
object FrameSpool {

  /** Write frames as one `.bin` spool file; returns the file path. */
  def write(dir: String, frames: Seq[Array[Byte]], name: String): String = {
    val d = new java.io.File(dir)
    d.mkdirs()
    val f = new java.io.File(d, s"$name.bin")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(f)))
    try frames.foreach { b => out.writeInt(b.length); out.write(b) }
    finally out.close()
    f.getAbsolutePath
  }

  /** Sorted spool files with their frame counts. */
  def listFiles(dir: String): Seq[(String, Long)] = {
    val d = new java.io.File(dir)
    val files = Option(d.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.endsWith(".bin")).sortBy(_.getName)
    files.toSeq.map(f => (f.getAbsolutePath, countFrames(f)))
  }

  private def countFrames(f: java.io.File): Long = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(f)))
    try {
      var n = 0L
      while (in.available() >= 4) {
        val len = in.readInt()
        in.skipBytes(len)
        n += 1
      }
      n
    } finally in.close()
  }

  /** Read records [from, until) of one spool file. */
  def readRange(file: String, from: Long, until: Long): Array[Array[Byte]] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(new java.io.FileInputStream(file)))
    try {
      val out = Array.newBuilder[Array[Byte]]
      var i = 0L
      while (i < until && in.available() >= 4) {
        val len = in.readInt()
        if (i >= from) {
          val buf = new Array[Byte](len)
          in.readFully(buf)
          out += buf
        } else in.skipBytes(len)
        i += 1
      }
      out.result()
    } finally in.close()
  }
}
