package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.SimpleGroupFactory
import org.apache.parquet.hadoop.ParquetFileWriter
import org.apache.parquet.hadoop.example.ExampleParquetWriter
import org.apache.parquet.io.api.Binary
import org.apache.parquet.schema.{LogicalTypeAnnotation, MessageType, Types}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write.{DataWriter, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.streaming.{StreamingDataWriterFactory, StreamingWrite}
import org.apache.spark.sql.types._

import graft.operators.SnapTable

/** NATIVE STREAMING SINK for snap tables (round 13):
  *
  *   df.writeStream.format("graft-snap")
  *     .option("path", dir).option("checkpointLocation", ckpt).start()
  *
  * Each micro-batch lands as ONE snapshot commit: per-task writers
  * stream rows into immutable parquet files under
  * `dir/data/stream-<queryId>-e<epoch>/`, and the epoch's driver-side
  * commit appends exactly the files the tasks reported — the manifest
  * protocol's orphan isolation makes files from failed/speculative
  * task attempts invisible (only NAMED files exist to readers).
  *
  * EXACTLY-ONCE: the epoch id rides the commit's own `#meta:` header
  * (`streamQuery`/`streamEpoch`), so the marker and the data are ONE
  * atomic manifest rename — a crash between commit and checkpoint
  * write cannot double-land the batch: the recovered epoch's commit
  * sees its id already at/below the table's last committed epoch and
  * skips whole (the Delta txn idiom, previously only available through
  * the foreachBatch + batchId pattern — s16). Pruning declarations
  * (stat/bloom/string-stat) inherit from the extended manifest's
  * header on every epoch, so a streamed table keeps zone-map/bloom
  * pruning without per-query options.
  *
  * Scale: each epoch is O(task files) executor writes + one O(files)
  * manifest job; the idempotence walk is header-only and O(1) in
  * steady state (the query's previous batch is the latest version). */
private[sources] object SnapParquetWrite {
  /** Spark → parquet schema for the sink's supported flat types (the
    * same type surface the connector reads; timestamps are MICROS —
    * the INT96 form is rejected on the read side by design). */
  def messageTypeOf(schema: StructType): MessageType = {
    val b = Types.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case LongType    => Types.optional(INT64)
        case TimestampType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(true,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case TimestampNTZType => Types.optional(INT64)
          .as(LogicalTypeAnnotation.timestampType(false,
            LogicalTypeAnnotation.TimeUnit.MICROS))
        case IntegerType => Types.optional(INT32)
        case DateType    => Types.optional(INT32)
          .as(LogicalTypeAnnotation.dateType())
        case DoubleType  => Types.optional(DOUBLE)
        case FloatType   => Types.optional(FLOAT)
        case BooleanType => Types.optional(BOOLEAN)
        case StringType  => Types.optional(BINARY)
          .as(LogicalTypeAnnotation.stringType())
        case BinaryType  => Types.optional(BINARY)
        case dt => throw new UnsupportedOperationException(
          s"graft-snap sink: unsupported type $dt for column ${f.name}")
      }
      b.addField(t.named(f.name))
    }
    b.named("spark_schema")
  }
}

final case class SnapStreamFileMessage(name: Option[String])
    extends WriterCommitMessage

final class SnapStreamingWrite(dir: String, schema: StructType,
                               queryId: String)
    extends StreamingWrite {

  private def commitIdOf(epochId: Long) = s"stream-$queryId-e$epochId"

  override def createStreamingWriterFactory(info: PhysicalWriteInfo)
      : StreamingDataWriterFactory =
    new SnapStreamWriterFactory(dir, schema, queryId,
      org.apache.spark.sql.GraftBridge.hadoopConfBroadcast(
        SparkSession.active))

  override def commit(epochId: Long,
                      messages: Array[WriterCommitMessage]): Unit = {
    val spark = SparkSession.active
    // replayed epoch (recovery re-runs the batch whose commit may or
    // may not have landed): the marker is IN the committed manifest,
    // so the check and the data are consistent by construction
    if (SnapTable.lastStreamEpoch(spark, dir, queryId) >= epochId) return
    val names = messages.toSeq
      .collect { case SnapStreamFileMessage(Some(n)) => n }.sorted
    // an empty epoch commits nothing: no version churn, and its replay
    // is vacuously exactly-once
    if (names.isEmpty) return
    // the epoch marker is re-verified INSIDE the commit's re-validation
    // (round-14 advisory fix): the check above is check-then-act, and a
    // lost-race append retry re-bases on a winner that may BE this very
    // epoch committed by a zombie driver of the same query — the
    // re-check inside carriedFor makes such a retry abort idempotently
    try SnapTable.commitExisting(spark, dir, commitIdOf(epochId), names,
      schema, Map("streamQuery" -> queryId,
        "streamEpoch" -> epochId.toString),
      revalidate = prevV =>
        if (SnapTable.lastStreamEpochFrom(spark, dir, prevV, queryId)
            >= epochId)
          throw new SnapTable.EpochCommittedException(epochId))
    catch { case _: SnapTable.EpochCommittedException => return }
    ()
  }

  override def abort(epochId: Long,
                     messages: Array[WriterCommitMessage]): Unit = {
    // best-effort: uncommitted task files are invisible orphans either
    // way (readers see only manifest-named files; vacuum reclaims)
    val conf = org.apache.spark.sql.GraftBridge.sessionHadoopConf(
      SparkSession.active)
    messages.foreach {
      case SnapStreamFileMessage(Some(n)) =>
        val p = new Path(s"$dir/data/${commitIdOf(epochId)}/$n")
        try { p.getFileSystem(conf).delete(p, false); () }
        catch { case scala.util.control.NonFatal(_) => () }
      case _ => ()
    }
  }
}

final class SnapStreamWriterFactory(dir: String, schema: StructType,
    queryId: String, hconf: org.apache.spark.broadcast.Broadcast[_])
    extends StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long,
                            epochId: Long): DataWriter[InternalRow] =
    new SnapStreamDataWriter(
      s"$dir/data/stream-$queryId-e$epochId",
      // taskId in the name keeps retried/speculative attempts disjoint;
      // the commit coordinator picks exactly one winner per partition
      f"part-p$partitionId%05d-t$taskId.parquet",
      schema, org.apache.spark.sql.GraftBridge.hadoopConf(hconf))
}

/** Per-task parquet writer over the public Group API. The file is
  * created LAZILY on the first row, so an empty partition emits no
  * file at all (mirroring Spark's own writer rule the manifest
  * cross-check pins). */
final class SnapStreamDataWriter(genDir: String, name: String,
                                 schema: StructType, conf: Configuration)
    extends DataWriter[InternalRow] {
  private var writer: org.apache.parquet.hadoop.ParquetWriter[Group] = _
  private lazy val msgType = SnapParquetWrite.messageTypeOf(schema)
  private lazy val groups = new SimpleGroupFactory(msgType)

  override def write(row: InternalRow): Unit = {
    if (writer == null)
      writer = ExampleParquetWriter
        .builder(new Path(s"$genDir/$name"))
        .withType(msgType).withConf(conf)
        // a retried attempt with the same taskId must not crash on its
        // own partial file
        .withWriteMode(ParquetFileWriter.Mode.OVERWRITE)
        .build()
    val g = groups.newGroup()
    var i = 0
    while (i < schema.length) {
      if (!row.isNullAt(i)) schema.fields(i).dataType match {
        case LongType | TimestampType | TimestampNTZType =>
          g.add(i, row.getLong(i))
        case IntegerType | DateType => g.add(i, row.getInt(i))
        case DoubleType             => g.add(i, row.getDouble(i))
        case FloatType              => g.add(i, row.getFloat(i))
        case BooleanType            => g.add(i, row.getBoolean(i))
        case StringType => g.add(i,
          Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
        case BinaryType => g.add(i,
          Binary.fromConstantByteArray(row.getBinary(i)))
        case dt => throw new UnsupportedOperationException(
          s"graft-snap sink: unsupported type $dt")
      }
      i += 1
    }
    writer.write(g)
  }

  override def commit(): WriterCommitMessage = {
    if (writer != null) writer.close()
    SnapStreamFileMessage(Option(writer).map(_ => name))
  }

  override def abort(): Unit = {
    if (writer != null) {
      try writer.close() catch { case scala.util.control.NonFatal(_) => () }
      val p = new Path(s"$genDir/$name")
      try { p.getFileSystem(conf).delete(p, false); () }
      catch { case scala.util.control.NonFatal(_) => () }
    }
  }

  override def close(): Unit = ()
}
