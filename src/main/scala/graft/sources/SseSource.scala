package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Custom DataSource V2 micro-batch source for Wikimedia EventStreams SSE
  * (reference S1: `filter_.py:104-108` builds an `EventStreams` SSE client;
  * the loop at `scanner.py:75-81` consumes it single-threaded).
  *
  * Spark-first re-expression: each micro-batch covers a contiguous offset
  * range of SSE `data:` events; offsets are durable in the streaming
  * checkpoint, so restart-after-connection-loss (reference E2,
  * `scanner.py:82-88`) becomes checkpoint resume — no y/n prompt, no
  * replayed or dropped events (the reference can drop events across a
  * restart; this source cannot).
  *
  * Transport is pluggable: this build reads a local SSE-framed file
  * (`option("path", ...)`) because the environment has no egress; a live
  * deployment substitutes an HTTP client that appends the SSE byte stream
  * to the same buffer contract (EventStreams' `Last-Event-ID` carries
  * per-Kafka-partition offsets — `meta.offset`/`meta.partition`,
  * `utils.py:8,10` — which map 1:1 onto this source's offset JSON).
  *
  * Output schema: `value STRING` (raw event JSON), `offset LONG`. Parse
  * downstream with `from_json(value, ChangeSchema.change)` — schema
  * stays declared, never inferred.
  */
class SseSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "sse"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType = SseSource.schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new SseTable(properties.get("path"))
}

object SseSource {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("offset", LongType, nullable = false)))

  /** Parse SSE framing lazily: every `data: <payload>` line is one event
    * (multiplexed streams arrive on one connection, reference S2). The
    * returned iterator streams the file — nothing is materialized, so a
    * reader for offsets [a, b) skips the prefix without holding it, and
    * `countEvents` never builds a list. (A production client would keep
    * a byte offset per committed event to make the skip O(1); the
    * framing/contract here is unchanged by that upgrade.)
    */
  def eventIterator(path: String): (Iterator[String], AutoCloseable) = {
    val stream = Files.lines(Paths.get(path), StandardCharsets.UTF_8)
    (stream.iterator().asScala
      .filter(_.startsWith("data: ")).map(_.stripPrefix("data: ")), stream)
  }

  def countEvents(path: String): Long = {
    val (it, closer) = eventIterator(path)
    try it.size.toLong finally closer.close()
  }
}

final class SseTable(path: String) extends Table with SupportsRead {
  override def name(): String = s"sse($path)"
  override def schema(): StructType = SseSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new ScanBuilder {
      override def build(): Scan = new Scan {
        override def readSchema(): StructType = SseSource.schema
        override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
          new SseMicroBatchStream(path)
      }
    }
}

/** Offset = count of SSE events consumed from the buffer head. */
final case class SseOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

final class SseMicroBatchStream(path: String) extends MicroBatchStream {
  override def initialOffset(): Offset = SseOffset(0L)
  override def latestOffset(): Offset = SseOffset(SseSource.countEvents(path))
  override def deserializeOffset(json: String): Offset = SseOffset(json.trim.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    Array(SsePartition(path, start.asInstanceOf[SseOffset].n, end.asInstanceOf[SseOffset].n))

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[SsePartition]
      new PartitionReader[InternalRow] {
        private val (events, closer) = SseSource.eventIterator(p.path)
        private var i = p.start - 1
        private val bounded = events.zipWithIndex
          .drop(p.start.toInt).takeWhile(_._2 < p.end)
        private var cur: String = _
        override def next(): Boolean =
          if (bounded.hasNext) { val (v, idx) = bounded.next(); cur = v; i = idx; true }
          else false
        override def get(): InternalRow = new GenericInternalRow(
          Array[Any](UTF8String.fromString(cur), i))
        override def close(): Unit = closer.close()
      }
    }
}

final case class SsePartition(path: String, start: Long, end: Long) extends InputPartition
