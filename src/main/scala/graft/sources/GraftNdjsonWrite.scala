package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.write._
import org.apache.spark.sql.types._

/** DSv2 WRITE path for `graft-ndjson` — the other half of the connector
  * lifecycle (R16, the reference's NDJSON sink), with the real
  * distributed commit protocol:
  *
  *   - each task's DataWriter streams its rows to a TEMP file under
  *     `_temporary/<jobId>/`, and `commit()` returns the temp path as
  *     its commit message — nothing is visible mid-job;
  *   - the driver's `BatchWrite.commit(messages)` renames exactly the
  *     committed tasks' files into the target directory (speculative or
  *     failed attempts never committed, never renamed) and drops the
  *     temp dir; `abort()` just drops the temp dir — a failed job
  *     leaves the target untouched;
  *   - `SupportsTruncate` handles overwrite mode: the truncate happens
  *     inside job commit, immediately before the renames, so even an
  *     overwrite leaves the old data readable until the new data is
  *     ready (crash before commit = old table intact).
  *
  * Row → line: scalars render as JSON scalars with full string
  * escaping; columns named in the `jsonColumns` option hold JSON text
  * and embed RAW (object/array subtrees round-trip to natural nested
  * NDJSON — the inverse of the read side's subtree-as-string capture).
  */
object NdjsonWriteSupport {

  final case class TaskCommit(tempFile: String) extends WriterCommitMessage

  final class NdjsonWriteBuilder(path: String, info: LogicalWriteInfo)
      extends WriteBuilder with SupportsTruncate {
    private var doTruncate = false
    override def truncate(): WriteBuilder = { doTruncate = true; this }
    override def build(): Write = new NdjsonWrite(
      path, info.schema(), doTruncate,
      Option(info.options.get("jsoncolumns"))
        .map(_.split(",").map(_.trim).toSet).getOrElse(Set.empty),
      info.queryId())
  }

  final class NdjsonWrite(path: String, schema: StructType, truncate: Boolean,
                          jsonCols: Set[String], jobId: String)
      extends Write with BatchWrite {
    override def toBatch: BatchWrite = this

    // captured driver-side at build(): the SESSION's Hadoop conf rides
    // a broadcast so writer TASKS create files with spark.hadoop.*
    // (credentials, fs.defaultFS) — a bare `new Configuration()` on an
    // executor can silently route the temp file to a different fs
    private val hconfB =
      org.apache.spark.sql.GraftBridge.hadoopConfBroadcast(
        org.apache.spark.sql.SparkSession.active)
    private def hconf = org.apache.spark.sql.GraftBridge.hadoopConf(hconfB)

    private def tempDir = s"$path/_temporary/$jobId"

    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new NdjsonWriterFactory(hconfB, tempDir, schema, jsonCols)

    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      val target = new Path(path)
      val fs = target.getFileSystem(hconf)
      fs.mkdirs(target)
      if (truncate)
        fs.listStatus(target).filter(s => s.isFile &&
          s.getPath.getName.endsWith(".ndjson"))
          .foreach(s => fs.delete(s.getPath, false))
      messages.foreach { case TaskCommit(tmp) =>
        val src = new Path(tmp)
        if (!fs.rename(src, new Path(target, src.getName)))
          throw new java.io.IOException(s"commit rename failed: $tmp")
      }
      fs.delete(new Path(tempDir), true)
      // drop the _temporary parent too if this was its last job
      try fs.delete(new Path(s"$path/_temporary"), false)
      catch { case _: java.io.IOException => () }
    }

    override def abort(messages: Array[WriterCommitMessage]): Unit = {
      val fs = new Path(path).getFileSystem(hconf)
      fs.delete(new Path(tempDir), true)
    }
  }

  final class NdjsonWriterFactory(hconfB: org.apache.spark.broadcast.Broadcast[_],
                                  tempDir: String, schema: StructType,
                                  jsonCols: Set[String])
      extends DataWriterFactory {
    override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
      new NdjsonWriter(
        org.apache.spark.sql.GraftBridge.hadoopConf(hconfB),
        tempDir, schema, jsonCols, partitionId, taskId)
  }

  final class NdjsonWriter(conf: Configuration,
                           tempDir: String, schema: StructType,
                           jsonCols: Set[String], partitionId: Int, taskId: Long)
      extends DataWriter[InternalRow] {
    private val file = f"$tempDir/part-$partitionId%05d-$taskId.ndjson"
    private val out = {
      val p = new Path(file)
      p.getFileSystem(conf).create(p, true)
    }

    private def esc(s: String): String = s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

    override def write(row: InternalRow): Unit = {
      val sb = new StringBuilder("{")
      var first = true
      schema.fields.zipWithIndex.foreach { case (f, i) =>
        if (!row.isNullAt(i)) {
          if (!first) sb.append(',')
          first = false
          sb.append('"').append(esc(f.name)).append("\":")
          f.dataType match {
            case StringType if jsonCols.contains(f.name) =>
              sb.append(row.getUTF8String(i).toString) // raw JSON subtree
            case StringType =>
              sb.append('"').append(esc(row.getUTF8String(i).toString)).append('"')
            case LongType    => sb.append(row.getLong(i))
            case IntegerType => sb.append(row.getInt(i))
            case DoubleType  => sb.append(row.getDouble(i))
            case BooleanType => sb.append(row.getBoolean(i))
            case other => throw new IllegalArgumentException(
              s"graft-ndjson cannot write ${f.name}: $other")
          }
        }
      }
      sb.append("}\n")
      out.write(sb.toString.getBytes(StandardCharsets.UTF_8))
    }

    override def commit(): WriterCommitMessage = { out.close(); TaskCommit(file) }
    override def abort(): Unit = out.close()
    override def close(): Unit = ()
  }
}
