package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, AttributeReference, GenericInternalRow, SortOrder}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, HashPartitioning, Partitioning, UnknownPartitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Whole-operator custom plan example (SURVEY §4.3's "example slot";
  * builder-prompt preference tier (c)): gap-based sessionization as ONE
  * physical pass.
  *
  * The declarative S03 form needs a window (shuffle + sort + running sum)
  * followed by a groupBy (second shuffle). This operator declares
  * `ClusteredDistribution(key)` + per-partition ordering (key, ts), so
  * EnsureRequirements inserts exactly one exchange+sort, and the operator
  * emits finished sessions in a single streaming scan of each partition —
  * O(1) state per key, no second aggregation pass. At 100 TB that's half
  * the shuffle volume of the two-pass form.
  *
  * Registered via `extraStrategies` (session-local, idempotent) — the
  * same Strategy could ship in `GraftExtensions.injectPlannerStrategy`.
  */
/** NB: `output` is a constructor parameter, NOT a derived val — tree
  * transformations copy() the node, and regenerating AttributeReferences
  * (fresh exprIds) on copy breaks every downstream resolution. */
case class SessionizeNode(child: LogicalPlan, keyAttr: Attribute,
                          tsAttr: Attribute, gapMicros: Long,
                          output: Seq[Attribute])
    extends UnaryNode {
  // these attributes originate HERE, not in the child (CheckAnalysis
  // would otherwise flag them as missing from the child's output)
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override protected def withNewChildInternal(newChild: LogicalPlan): SessionizeNode =
    copy(child = newChild)
}

case class SessionizeExec(child: SparkPlan, keyAttr: Attribute,
                          tsAttr: Attribute, gapMicros: Long,
                          output: Seq[Attribute])
    extends UnaryExecNode {

  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(output)

  override def requiredChildDistribution: Seq[Distribution] =
    Seq(ClusteredDistribution(Seq(keyAttr)))

  override def requiredChildOrdering: Seq[Seq[SortOrder]] =
    Seq(Seq(SortOrder(keyAttr, Ascending), SortOrder(tsAttr, Ascending)))

  // the default (inherit child partitioning) would leak CHILD attributes
  // into downstream binding; re-express the still-true clustering in
  // terms of this operator's own output key column
  override def outputPartitioning: Partitioning =
    child.outputPartitioning match {
      case h: HashPartitioning if h.expressions.length == 1
        && h.expressions.head.semanticEquals(keyAttr) =>
        HashPartitioning(Seq(output.head), h.numPartitions)
      case p => UnknownPartitioning(p.numPartitions)
    }

  override protected def doExecute(): RDD[InternalRow] = {
    val keyIdx = child.output.indexWhere(_.exprId == keyAttr.exprId)
    val tsIdx = child.output.indexWhere(_.exprId == tsAttr.exprId)
    val gap = gapMicros
    val outTypes = output.map(_.dataType).toArray
    child.execute().mapPartitions { it =>
      // downstream consumers expect UnsafeRow; project each emitted
      // session (copy: the projection reuses its buffer)
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection
        .create(outTypes)
      new Iterator[InternalRow] {
        private var curKey = 0L
        private var start = 0L
        private var end = 0L
        private var n = 0L
        private var open = false
        private var pending: InternalRow = _
        // one reusable input buffer for the projection — the UnsafeRow
        // copy() below is what escapes to consumers, so allocating a
        // fresh GenericInternalRow (plus its boxed Array[Any]) per
        // emitted session was pure garbage-collector load
        private val buf = new GenericInternalRow(4)

        private def emit(): InternalRow = {
          buf.update(0, curKey); buf.update(1, start)
          buf.update(2, end); buf.update(3, n)
          proj(buf).copy()
        }

        override def hasNext: Boolean = {
          if (pending != null) return true
          while (it.hasNext) {
            val row = it.next()
            val k = row.getLong(keyIdx)
            val t = row.getLong(tsIdx) // TimestampType = epoch micros
            if (!open) {
              curKey = k; start = t; end = t; n = 1; open = true
            } else if (k != curKey || t - end > gap) {
              pending = emit()
              curKey = k; start = t; end = t; n = 1
              return true
            } else {
              end = t; n += 1
            }
          }
          if (open) { pending = emit(); open = false }
          pending != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException
          val r = pending; pending = null; r
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SessionizeExec =
    copy(child = newChild)
}

object SessionizeStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SessionizeNode(child, key, ts, gap, out) =>
      SessionizeExec(planLater(child), key, ts, gap, out) :: Nil
    case _ => Nil
  }
}

object Sessionize {
  /** Sessionize `df` by `key` over timestamp `ts` with a strict-greater
    * gap rule (gap > gapSeconds closes the session — S03 semantics).
    * Rows with a NULL key or timestamp are dropped (an explicit filter —
    * the exec reads primitives, so a null would otherwise silently read
    * as 0 and corrupt session boundaries while the output schema claims
    * nullable=false). */
  def apply(df: DataFrame, key: String, ts: String, gapSeconds: Long): DataFrame = {
    val spark = df.sparkSession
    if (!spark.experimental.extraStrategies.contains(SessionizeStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ SessionizeStrategy
    val analyzed = df.where(col(key).isNotNull && col(ts).isNotNull)
      .queryExecution.analyzed
    val keyAttr = analyzed.output.find(_.name == key)
      .getOrElse(throw new IllegalArgumentException(s"no column $key"))
    val tsAttr = analyzed.output.find(_.name == ts)
      .getOrElse(throw new IllegalArgumentException(s"no column $ts"))
    // the exec reads both fields with getLong — silently garbage for any
    // other physical type, so reject early (nulls are handled by the
    // IsNotNull filter inserted above)
    require(keyAttr.dataType == LongType,
      s"$key must be BIGINT, got ${keyAttr.dataType.simpleString}")
    require(tsAttr.dataType == TimestampType,
      s"$ts must be TIMESTAMP, got ${tsAttr.dataType.simpleString}")
    val out = Seq(
      AttributeReference("user_id", LongType, nullable = false)(),
      AttributeReference("session_start", TimestampType, nullable = false)(),
      AttributeReference("session_end", TimestampType, nullable = false)(),
      AttributeReference("n_events", LongType, nullable = false)())
    GraftBridge.ofRows(spark,
      SessionizeNode(analyzed, keyAttr, tsAttr, gapSeconds * 1000000L, out))
  }
}
