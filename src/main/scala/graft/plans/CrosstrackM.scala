package graft.plans

import graft.geo.Geo
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native Catalyst expression for the great-circle cross-track distance
  * (SURVEY §4.3 "optional upgrade" / §2A R10): unlike a Scala UDF, this
  * stays inside whole-stage codegen — `doGenCode` emits a direct static
  * call with primitive doubles (no boxing, no encoder round-trip), so the
  * spatial join's hot loop is one fused Java method.
  *
  * Arguments: (px, py, x1, y1, x2, y2) — point lon/lat, segment endpoint
  * lon/lats. Null-intolerant: any null input → null.
  */
case class CrosstrackM(children: Seq[Expression]) extends Expression {
  override def checkInputDataTypes(): TypeCheckResult =
    if (children.length == 6 && children.forall(_.dataType == DoubleType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"crosstrack_m expects 6 DOUBLE arguments, got " +
        children.map(_.dataType.simpleString).mkString("(", ", ", ")"))
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = children.exists(_.nullable)
  override def prettyName: String = "crosstrack_m"
  // deterministic + foldable → Catalyst's ConstantFolding evaluates
  // all-literal calls at planning time (Expression.foldable defaults to
  // false, which would block the built-in rule)
  override def foldable: Boolean = children.forall(_.foldable)

  override def eval(input: InternalRow): Any = {
    val vs = children.map(_.eval(input))
    if (vs.contains(null)) null
    else Geo.crosstrackM(
      vs(0).asInstanceOf[Double], vs(1).asInstanceOf[Double],
      vs(2).asInstanceOf[Double], vs(3).asInstanceOf[Double],
      vs(4).asInstanceOf[Double], vs(5).asInstanceOf[Double])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val evals = children.map(_.genCode(ctx))
    val nullCheck =
      if (nullable) evals.map(e => s"${e.isNull}").mkString(" || ") else "false"
    val args = evals.map(_.value).mkString(", ")
    val childCode = evals.map(_.code).reduce(_ + _)
    ev.copy(code =
      code"""$childCode
         |boolean ${ev.isNull} = $nullCheck;
         |double ${ev.value} = -1.0;
         |if (!${ev.isNull}) { ${ev.value} = graft.geo.Geo.crosstrackM($args); }
         |""".stripMargin)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression = copy(children = newChildren)
}

object CrosstrackM {
  private[plans] val ident = FunctionIdentifier("crosstrack_m")
  private[plans] val info = new ExpressionInfo(classOf[CrosstrackM].getName, "crosstrack_m")

  /** Register `crosstrack_m` in a live session (idempotent). */
  def register(spark: SparkSession): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction("crosstrack_m", CrosstrackM(_), "built-in")
}

/** `SparkSessionExtensions` entry point: set
  * `spark.sql.extensions=graft.plans.GraftExtensions` and the graft
  * native functions (`crosstrack_m`, `dot_long`, …) are available in
  * plain SQL — and the Sessionize planner strategy is installed — on
  * every session of the cluster, with no per-session register() calls.
  * (ExtensionsSpec drives a fresh session through this path.) */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectPlannerStrategy(_ => SessionizeStrategy)
    ext.injectOptimizerRule(_ => BinnedRangeJoinRule)
    ext.injectOptimizerRule(_ => MatViewRewrite)
    ext.injectOptimizerRule(_ => JaroWinklerPrefilter)
    ext.injectOptimizerRule(_ => SaltedTopKRule)
    ext.injectOptimizerRule(_ => FkJoinElimRule)
    ext.injectFunction((CrosstrackM.ident, CrosstrackM.info, CrosstrackM(_)))
    ext.injectFunction((DotLong.ident, DotLong.info, DotLong.builder))
    ext.injectFunction((RollHash31.ident, RollHash31.info, RollHash31.builder))
    ext.injectFunction((ShingleSetHash31.ident, ShingleSetHash31.info,
      ShingleSetHash31.builder))
    ext.injectFunction((IntersectSortedCount.ident, IntersectSortedCount.info,
      IntersectSortedCount.builder))
    ext.injectFunction((FirstCommonSorted.ident, FirstCommonSorted.info,
      FirstCommonSorted.builder))
    ext.injectFunction((FuzzyMs.minIdent, FuzzyMs.minInfo, FuzzyMs.minBuilder))
    ext.injectFunction((FuzzyMs.maxIdent, FuzzyMs.maxInfo, FuzzyMs.maxBuilder))
    ext.injectFunction((Morton2.ident, Morton2.info, Morton2.builder))
    ext.injectFunction((SimHashBands64.ident, SimHashBands64.info,
      SimHashBands64.builder))
    ext.injectFunction((HyperplaneBands64.ident, HyperplaneBands64.info,
      HyperplaneBands64.builder))
    ext.injectFunction((CovAccum64.ident, CovAccum64.info, CovAccum64.builder))
    ext.injectFunction((JaroWinklerSim.ident, JaroWinklerSim.info,
      JaroWinklerSim.builder))
    ext.injectFunction((HistBins600.ident, HistBins600.info,
      HistBins600.builder))
    ext.injectFunction((CmsSketch4x256.ident, CmsSketch4x256.info,
      CmsSketch4x256.builder))
    ext.injectFunction((BottomK256.ident, BottomK256.info,
      BottomK256.builder))
    ext.injectFunction((BottomK.ident, BottomK.info, BottomK.builder))
    ext.injectFunction((PopcountAnd.ident, PopcountAnd.info, PopcountAnd.builder))
    ext.injectFunction((Bitmask64.ident, Bitmask64.info, Bitmask64.builder))
  }
}
