package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.Path
import org.apache.hadoop.io.Text
import org.apache.hadoop.util.LineReader
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, SupportsWrite, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.{NamedReference, Transform}
import org.apache.spark.sql.connector.expressions.aggregate.{Aggregation, CountStar, Max => VMax, Min => VMin}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxFiles, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.connector.write.{LogicalWriteInfo, WriteBuilder}
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSource V2 NDJSON source — the reference's R1 surface
  * (`/root/reference/addresses.js:124-162` consumes NDJSON object
  * streams) implemented as a first-class Spark connector instead of a
  * pre-pass:
  *
  *   spark.read.format("graft-ndjson").schema(s).load(path)
  *
  * Scale properties, each doing real work at 100 TB:
  *   - DECLARED schema only (`supportsExternalMetadata`): schema
  *     inference over NDJSON is a full extra corpus pass, so the source
  *     refuses to guess — the engine's schema-on-read discipline;
  *   - FILTER PUSHDOWN to the parser: comparisons on top-level scalar
  *     fields evaluate on the parsed node BEFORE a row is built, so
  *     filtered-out lines never materialize rows (Spark trusts the
  *     pushed subset — the evaluation is exact, including SQL null
  *     semantics: comparisons with missing/null fields are false);
  *   - COLUMN PRUNING to the parser: only requested fields convert to
  *     row values (nested subtrees a STRING column captures re-serialize
  *     only when asked for);
  *   - LINE-ALIGNED BYTE SPLITS: each file splits into `splitBytes`
  *     ranges read in parallel with the classic text-split protocol — a
  *     reader at offset>0 discards its first (partial) line, every
  *     reader reads through its end boundary to the next newline, so
  *     each line lands in exactly one split with no coordination
  *     (NdjsonSourceSpec proves split-size invariance).
  *
  * Type mapping per top-level field: STRING captures textual values
  * verbatim and non-scalar subtrees as compact JSON (the downstream
  * `from_json`/`get_json_object` contract); LONG/DOUBLE read numerics;
  * BOOLEAN reads booleans; anything else reads as null. Malformed JSON
  * lines throw (strict mode — the q46 PERMISSIVE pattern belongs to the
  * quarantining reader, not the engine source).
  */
class GraftNdjson extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-ndjson"
  override def supportsExternalMetadata(): Boolean = true

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    throw new IllegalArgumentException(
      "graft-ndjson requires a declared schema (.schema(...)): schema " +
        "inference would cost a full corpus pass")

  override def getTable(schema: StructType, partitioning: Array[Transform],
                        properties: util.Map[String, String]): Table =
    new NdjsonTable(schema, properties.asScala.toMap)
}

final class NdjsonTable(declared: StructType, props: Map[String, String])
    extends Table with SupportsRead with SupportsWrite {
  override def name(): String = s"graft-ndjson(${props.getOrElse("path", "?")})"
  override def schema(): StructType = declared
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ, TableCapability.BATCH_WRITE,
      TableCapability.TRUNCATE, TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new NdjsonScanBuilder(declared,
      options.asScala.toMap ++ props)
  override def newWriteBuilder(info: LogicalWriteInfo): WriteBuilder = {
    val path = Option(info.options.get("path")).orElse(props.get("path"))
      .getOrElse(throw new IllegalArgumentException("graft-ndjson: no path"))
    new NdjsonWriteSupport.NdjsonWriteBuilder(path, info)
  }
}

/** A pushed aggregate call: COUNT(*) or MIN/MAX of a top-level field. */
sealed trait NdjsonAgg extends Serializable
case object NdjsonCountStar extends NdjsonAgg
final case class NdjsonMin(field: String) extends NdjsonAgg
final case class NdjsonMax(field: String) extends NdjsonAgg

final class NdjsonScanBuilder(full: StructType, opts: Map[String, String])
    extends ScanBuilder with SupportsPushDownFilters
    with SupportsPushDownRequiredColumns with SupportsPushDownAggregates {

  private var pushed: Array[Filter] = Array.empty
  private var required: StructType = full
  private var aggs: Seq[NdjsonAgg] = Nil

  private def supportedType(dt: DataType): Boolean = dt match {
    case StringType | LongType | DoubleType | BooleanType => true
    case _ => false
  }

  private val corruptCol =
    opts.getOrElse("columnnameofcorruptrecord", "_corrupt_record")

  // the corrupt-record column is populated by the reader, not parsed
  // from JSON — predicates and aggregates over it must stay post-scan
  private def fieldOk(name: String): Boolean =
    name != corruptCol &&
      full.fields.exists(f => f.name == name && supportedType(f.dataType))

  private def supported(f: Filter): Boolean = f match {
    case EqualTo(a, _)            => fieldOk(a)
    case GreaterThan(a, _)        => fieldOk(a)
    case GreaterThanOrEqual(a, _) => fieldOk(a)
    case LessThan(a, _)           => fieldOk(a)
    case LessThanOrEqual(a, _)    => fieldOk(a)
    case In(a, _)                 => fieldOk(a)
    case IsNull(a)                => fieldOk(a)
    case IsNotNull(a)             => fieldOk(a)
    case StringStartsWith(a, _)   => fieldOk(a)
    case And(l, r)                => supported(l) && supported(r)
    case Or(l, r)                 => supported(l) && supported(r)
    case Not(c)                   => supported(c)
    case _                        => false
  }

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    val (ok, residual) = filters.partition(supported)
    pushed = ok
    residual
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  /** Aggregate pushdown (partial mode): COUNT(*)/MIN/MAX over top-level
    * scalar fields, no grouping. Each partition reader then emits ONE
    * pre-aggregated row — for a filter-free COUNT(*) it never even JSON-
    * parses (newline counting is the whole job), and MIN/MAX only
    * convert the one requested field. Spark plans the final merge
    * (SUM of counts, MIN of mins, MAX of maxs) over the partial rows:
    * rows shipped = partitions, not lines. */
  override def pushAggregation(aggregation: Aggregation): Boolean = {
    if (aggregation.groupByExpressions.nonEmpty) return false
    // empty aggregate list (outer agg pruned a nested one to nothing):
    // claiming it breaks the scan's column-count contract — decline
    if (aggregation.aggregateExpressions.isEmpty) return false
    // permissive mode quarantines malformed lines as rows — the agg
    // fast path has no quarantine story, so it must not claim the push
    if (opts.get("mode").exists(_.equalsIgnoreCase("permissive"))) return false
    def fieldOf(e: org.apache.spark.sql.connector.expressions.Expression)
        : Option[String] = e match {
      case nr: NamedReference if nr.fieldNames.length == 1 =>
        Some(nr.fieldNames.head).filter(fieldOk)
      case _ => None
    }
    val specs = aggregation.aggregateExpressions.toSeq.map {
      case _: CountStar => Some(NdjsonCountStar)
      case m: VMin      => fieldOf(m.column).map(NdjsonMin)
      case m: VMax      => fieldOf(m.column).map(NdjsonMax)
      case _            => None
    }
    if (specs.exists(_.isEmpty)) false
    else { aggs = specs.flatten; true }
  }

  override def build(): Scan = {
    val aggSchema =
      if (aggs.isEmpty) None
      else Some(StructType(aggs.zipWithIndex.map {
        case (NdjsonCountStar, i) => StructField(s"count_$i", LongType, nullable = false)
        case (NdjsonMin(f), i) => StructField(s"min_$i", full(f).dataType)
        case (NdjsonMax(f), i) => StructField(s"max_$i", full(f).dataType)
      }))
    new NdjsonScan(full, aggSchema.getOrElse(required), pushed, opts, aggs)
  }
}

final class NdjsonScan(full: StructType, required: StructType,
                       val pushedFilters: Array[Filter],
                       opts: Map[String, String],
                       val pushedAggs: Seq[NdjsonAgg] = Nil)
    extends Scan with Batch with SupportsReportStatistics {
  private val path = opts.getOrElse("path",
    throw new IllegalArgumentException("graft-ndjson: no path"))
  private val splitBytes =
    opts.get("splitbytes").map(_.toLong).getOrElse(16L * 1024 * 1024)

  // Captured at build() time on the driver: the SESSION's Hadoop conf
  // (spark.hadoop.* cloud-FS credentials/scheme mappings), broadcast
  // once per scan so every executor-side open sees it — a bare
  // `new Configuration()` on an executor drops those settings and can
  // misroute I/O to a different fs.defaultFS.
  private val hconfB = org.apache.spark.sql.GraftBridge.hadoopConfBroadcast(
    org.apache.spark.sql.SparkSession.active)
  private def hconf = org.apache.spark.sql.GraftBridge.hadoopConf(hconfB)

  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** File-length statistics (metadata only, no data read): without
    * this a DSv2 relation defaults to "unknown = huge" and every join
    * over the source degrades to sort-merge — reporting the real bytes
    * lets Catalyst broadcast a small NDJSON side exactly as it would a
    * small parquet dim (NdjsonSourceSpec pins the BHJ). */
  override def estimateStatistics(): Statistics = {
    val bytes =
      try {
        val p = new Path(path)
        val fs = p.getFileSystem(hconf)
        if (fs.getFileStatus(p).isDirectory)
          fs.listStatus(p).filter(_.isFile).map(_.getLen).sum
        else fs.getFileStatus(p).getLen
      } catch { case _: java.io.IOException => Long.MaxValue }
    new Statistics {
      override def sizeInBytes(): java.util.OptionalLong =
        java.util.OptionalLong.of(bytes)
      override def numRows(): java.util.OptionalLong =
        java.util.OptionalLong.empty()
    }
  }
  override def description(): String =
    s"GraftNdjson $path ReadSchema: ${required.fieldNames.mkString(",")} " +
      s"PushedFilters: [${pushedFilters.mkString(", ")}] " +
      s"PushedAggregates: [${pushedAggs.mkString(", ")}]"

  override def planInputPartitions(): Array[InputPartition] = {
    val p = new Path(path)
    val fs = p.getFileSystem(hconf)
    val files =
      if (fs.getFileStatus(p).isDirectory)
        fs.listStatus(p).filter(s => s.isFile &&
            !s.getPath.getName.startsWith(".") &&
            !s.getPath.getName.startsWith("_"))
          .map(_.getPath)
      else Array(p)
    files.flatMap { f =>
      val len = fs.getFileStatus(f).getLen
      if (len == 0) Nil
      else (0L until len by splitBytes).map { start =>
        NdjsonPartition(f.toString, start, math.min(splitBytes, len - start))
      }
    }.toArray
  }

  private val permissive =
    opts.get("mode").exists(_.equalsIgnoreCase("permissive"))
  private val corruptCol =
    opts.getOrElse("columnnameofcorruptrecord", "_corrupt_record")

  override def createReaderFactory(): PartitionReaderFactory =
    new NdjsonReaderFactory(hconfB, full, required, pushedFilters, pushedAggs,
      permissive, corruptCol)

  override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
    new NdjsonMicroBatchStream(hconfB, path, full, required, pushedFilters,
      splitBytes, opts.get("maxfilespertrigger").map(_.toInt).getOrElse(0))
}

/** Streaming offset: how many files (in lexicographic name order) have
  * been processed. The streaming contract is an APPEND-ONLY directory
  * with monotonically named files (part-00000…, the convention every
  * distributed writer including ours follows) — a file sorting before
  * an already-processed name would be missed, exactly like Spark's own
  * file source without its seen-files log. */
final case class NdjsonOffset(n: Int) extends Offset {
  override def json: String = s"""{"n":$n}"""
}

/** MICRO_BATCH_READ for graft-ndjson: each trigger's batch is "the
  * files that appeared since the last offset", split and parsed by the
  * SAME partition readers as the batch path — pushdown and pruning
  * included, since the ScanBuilder is shared. Exactly-once rides the
  * offset log: a crash-replayed batch re-plans the identical file
  * slice. */
final class NdjsonMicroBatchStream(hconfB: org.apache.spark.broadcast.Broadcast[_],
                                   path: String, full: StructType,
                                   required: StructType, filters: Array[Filter],
                                   splitBytes: Long,
                                   maxFilesPerTrigger: Int = 0)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private def fs = new Path(path).getFileSystem(
    org.apache.spark.sql.GraftBridge.hadoopConf(hconfB))

  private def listFiles(): Seq[Path] = {
    val p = new Path(path)
    val f = fs
    if (!f.exists(p)) Nil
    else if (f.getFileStatus(p).isDirectory)
      f.listStatus(p).filter(s => s.isFile &&
          !s.getPath.getName.startsWith(".") &&
          !s.getPath.getName.startsWith("_"))
        .map(_.getPath).sortBy(_.getName).toSeq
    else Seq(p)
  }

  override def initialOffset(): Offset = NdjsonOffset(0)
  override def latestOffset(): Offset = NdjsonOffset(listFiles().size)

  // ── admission control (maxFilesPerTrigger) ─────────────────────────
  // Real streaming sources rate-limit ingestion so one catch-up burst
  // cannot produce an unbounded micro-batch; with the option set the
  // engine calls the two-arg latestOffset and each trigger admits at
  // most N new files (NdjsonSourceSpec pins the batch count).
  // SupportsTriggerAvailableNow is implemented DIRECTLY (capture the
  // file count at query start, drain up to it in rate-limited batches)
  // — without it Spark wraps the stream and the wrapper bypasses the
  // source's own read limit, collapsing AvailableNow to one burst.
  private var availableAtStart: Int = -1

  override def prepareForTriggerAvailableNow(): Unit =
    availableAtStart = listFiles().size

  override def getDefaultReadLimit: ReadLimit =
    if (maxFilesPerTrigger > 0) ReadLimit.maxFiles(maxFilesPerTrigger)
    else ReadLimit.allAvailable()

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[NdjsonOffset].n
    val total =
      if (availableAtStart >= 0) availableAtStart else listFiles().size
    limit match {
      case m: ReadMaxFiles => NdjsonOffset(math.min(total, s + m.maxFiles()))
      case _               => NdjsonOffset(total)
    }
  }

  override def reportLatestOffset(): Offset = NdjsonOffset(listFiles().size)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[NdjsonOffset].n
    val e = end.asInstanceOf[NdjsonOffset].n
    val f = fs
    listFiles().slice(s, e).flatMap { file =>
      val len = f.getFileStatus(file).getLen
      if (len == 0) Nil
      else (0L until len by splitBytes).map { st =>
        NdjsonPartition(file.toString, st, math.min(splitBytes, len - st))
      }
    }.toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new NdjsonReaderFactory(hconfB, full, required, filters)

  override def deserializeOffset(json: String): Offset =
    NdjsonOffset(json.filter(_.isDigit).toInt)

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

final case class NdjsonPartition(file: String, start: Long, length: Long)
    extends InputPartition

final class NdjsonReaderFactory(hconfB: org.apache.spark.broadcast.Broadcast[_],
                                full: StructType, required: StructType,
                                filters: Array[Filter],
                                aggs: Seq[NdjsonAgg] = Nil,
                                permissive: Boolean = false,
                                corruptCol: String = "_corrupt_record")
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    // executor-side: unwrap the broadcast SESSION conf here, once per
    // reader — never `new Configuration()` (drops spark.hadoop.*)
    val conf = org.apache.spark.sql.GraftBridge.hadoopConf(hconfB)
    if (aggs.isEmpty)
      new NdjsonReader(conf, full, required, filters,
        partition.asInstanceOf[NdjsonPartition], permissive, corruptCol)
    else
      new NdjsonAggReader(conf, full, filters, aggs,
        partition.asInstanceOf[NdjsonPartition])
  }
}

/** Shared split machinery: line-aligned byte ownership, typed field
  * extraction, and exact pushed-filter evaluation. */
sealed abstract class NdjsonReaderBase(conf: Configuration,
                                       full: StructType,
                                       part: NdjsonPartition)
    extends PartitionReader[InternalRow] {

  protected val mapper = new ObjectMapper()
  protected val end: Long = part.start + part.length
  protected val in = {
    val p = new Path(part.file)
    val stream = p.getFileSystem(conf).open(p)
    stream.seek(part.start)
    stream
  }
  protected val lines = new LineReader(in)
  protected var pos: Long = part.start
  // a reader starting mid-file discards its first (partial) line — the
  // previous split read through its own end boundary and consumed it
  if (part.start != 0) pos += lines.readLine(new Text())

  private val fullType: Map[String, DataType] =
    full.fields.map(f => f.name -> f.dataType).toMap
  protected var row: InternalRow = _

  /** Typed value of a top-level field under the FULL schema. */
  protected def value(node: JsonNode, name: String): Any = {
    val n = node.get(name)
    if (n == null || n.isNull) null
    else fullType(name) match {
      case StringType  => if (n.isTextual) n.asText else n.toString
      case LongType    => if (n.isNumber) n.asLong else null
      case DoubleType  => if (n.isNumber) n.asDouble else null
      case BooleanType => if (n.isBoolean) n.asBoolean else null
      case _           => null
    }
  }

  protected def cmp(a: Any, b: Any): Option[Int] = (a, b) match {
    case (null, _) | (_, null)        => None
    case (x: String, y: String)       => Some(x.compareTo(y))
    case (x: Long, y: Number)         => Some(java.lang.Long.compare(x, y.longValue))
    case (x: Double, y: Number)       => Some(java.lang.Double.compare(x, y.doubleValue))
    case (x: Boolean, y: Boolean)     => Some(java.lang.Boolean.compare(x, y))
    case _                            => None
  }

  protected def eval(f: Filter, node: JsonNode): Boolean = f match {
    case EqualTo(a, v)            => cmp(value(node, a), v).contains(0)
    case GreaterThan(a, v)        => cmp(value(node, a), v).exists(_ > 0)
    case GreaterThanOrEqual(a, v) => cmp(value(node, a), v).exists(_ >= 0)
    case LessThan(a, v)           => cmp(value(node, a), v).exists(_ < 0)
    case LessThanOrEqual(a, v)    => cmp(value(node, a), v).exists(_ <= 0)
    case In(a, vs)                => vs.exists(v => cmp(value(node, a), v).contains(0))
    case IsNull(a)                => value(node, a) == null
    case IsNotNull(a)             => value(node, a) != null
    case StringStartsWith(a, p) => value(node, a) match {
      case s: String => s.startsWith(p)
      case _         => false
    }
    case And(l, r) => eval(l, node) && eval(r, node)
    case Or(l, r)  => eval(l, node) || eval(r, node)
    case Not(c)    => !eval(c, node)
    case _         => false
  }

  override def get(): InternalRow = row
  override def close(): Unit = in.close()
}

final class NdjsonReader(conf: Configuration,
                         full: StructType, required: StructType,
                         filters: Array[Filter], part: NdjsonPartition,
                         permissive: Boolean = false,
                         corruptCol: String = "_corrupt_record")
    extends NdjsonReaderBase(conf, full, part) {

  override def next(): Boolean = {
    // line-start ownership: reader 0 emits lines starting in [0, end];
    // a mid-file reader discarded the line spanning (or starting at) its
    // start offset, so it emits (start, end] — the <= boundary is what
    // makes a line starting EXACTLY on a split boundary land in the
    // earlier split while the later one discards it: exactly-once with
    // no coordination
    while (pos <= end) {
      val text = new Text()
      val n = lines.readLine(text)
      if (n == 0) return false
      pos += n
      val line = text.toString
      val node =
        try mapper.readTree(line)
        catch {
          case e: com.fasterxml.jackson.core.JacksonException =>
            if (!permissive) throw new java.io.IOException(
              s"malformed NDJSON line in ${part.file}: " +
                line.take(80) + " (use mode=permissive to quarantine)", e)
            null
        }
      // PERMISSIVE: a malformed line becomes an all-null row carrying
      // the raw text in the corrupt-record column (the q46 quarantine
      // contract at connector level). Pushed filters evaluate against
      // the EMPTY node — every field null, exactly the verdict a
      // post-scan filter would reach — so pushed and residual
      // filtering agree on quarantine rows.
      val corrupt = node == null
      val effNode = if (corrupt) mapper.createObjectNode() else node
      if (filters.forall(eval(_, effNode))) {
        val vals = required.fields.map { f =>
          if (f.name == corruptCol)
            if (corrupt) UTF8String.fromString(line) else null
          else value(effNode, f.name) match {
            case s: String => UTF8String.fromString(s)
            case other     => other
          }
        }
        row = new GenericInternalRow(vals.asInstanceOf[Array[Any]])
        return true
      }
    }
    false
  }
}

/** Aggregate-pushdown reader: consumes the whole split and emits ONE
  * partial row (counts/mins/maxs in push order). A filter-free pure
  * COUNT(*) never JSON-parses — counting newlines IS the job; with
  * filters or MIN/MAX the parse runs but no per-line row ever builds.
  * Spark merges the partials (SUM/MIN/MAX) — rows shipped = splits. */
final class NdjsonAggReader(conf: Configuration,
                            full: StructType, filters: Array[Filter],
                            aggs: Seq[NdjsonAgg], part: NdjsonPartition)
    extends NdjsonReaderBase(conf, full, part) {

  private var done = false

  override def next(): Boolean = {
    if (done) return false
    done = true
    val countOnly = filters.isEmpty && aggs.forall(_ == NdjsonCountStar)
    var count = 0L
    val acc = new Array[Any](aggs.size)
    while (pos <= end) {
      val text = new Text()
      val n = lines.readLine(text)
      if (n == 0) { pos = end + 1 }
      else {
        pos += n
        if (countOnly) count += 1
        else {
          val node = mapper.readTree(text.toString)
          if (filters.forall(eval(_, node))) {
            count += 1
            aggs.zipWithIndex.foreach {
              case (NdjsonMin(f), i) =>
                val v = value(node, f)
                if (v != null && (acc(i) == null || cmp(v, acc(i)).exists(_ < 0)))
                  acc(i) = v
              case (NdjsonMax(f), i) =>
                val v = value(node, f)
                if (v != null && (acc(i) == null || cmp(v, acc(i)).exists(_ > 0)))
                  acc(i) = v
              case (NdjsonCountStar, _) => ()
            }
          }
        }
      }
    }
    val vals: Array[Any] = aggs.zipWithIndex.map {
      case (NdjsonCountStar, _) => java.lang.Long.valueOf(count)
      case (_, i) => acc(i) match {
        case s: String => UTF8String.fromString(s)
        case other     => other
      }
    }.toArray
    row = new GenericInternalRow(vals)
    true
  }
}
