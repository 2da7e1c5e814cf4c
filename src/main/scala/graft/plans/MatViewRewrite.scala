package graft.plans

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.functions.{col, count, lit, max => fmax, min => fmin, sum => fsum}

/** Materialized-view rewrite: a Catalyst optimizer rule that answers
  * aggregates over a registered base table from a pre-aggregated summary
  * table instead — the 100 TB dashboard pattern, where every repeated
  * rollup re-reads the corpus unless something redirects it to the
  * KB-scale summary the first pass already paid for.
  *
  * `create()` builds the summary with ONE corpus pass — per declared group
  * column set: COUNT(*) plus SUM/MIN/MAX over declared measure
  * expressions — persists it as parquet, and registers its metadata. The
  * rule then rewrites any `Aggregate` over the base scan when:
  *
  *   - every grouping expression is a bare base column ∈ the MV's group
  *     columns (equal OR COARSER grouping — re-aggregating the summary:
  *     SUM of per-group sums, SUM of per-group counts, MIN of mins,
  *     MAX of maxs — is exact for these partial-aggregatable functions);
  *   - every Filter between the Aggregate and the scan references group
  *     columns only (whole groups pass or fail, so filtering the summary
  *     ≡ filtering the corpus) and is deterministic;
  *   - every aggregate call is COUNT(lit)/SUM/MIN/MAX — not DISTINCT, no
  *     FILTER clause — over an expression that matches a declared measure
  *     (matched on the analyzer's canonical SQL text, captured from the
  *     same analysis path at create()); arbitrary scalar post-processing
  *     around the aggregate calls (ROUND, CAST, arithmetic) rewrites
  *     structurally, aggregate results cast back to their original types
  *     (a re-summed DECIMAL(28,6) widens to (38,6); the cast restores the
  *     plan's published schema and is exact — re-aggregated values are
  *     bounded by the original data);
  *   - the grouping set is non-empty (a GLOBAL aggregate over an empty
  *     base yields one row, but an empty summary would yield one NULL
  *     row — the one shape whose empty-input semantics differ, so it is
  *     declared out of scope rather than special-cased).
  *
  * Results are bit-identical by construction; output attribute exprIds
  * are preserved so parent plan references resolve unchanged. The rule is
  * self-stabilizing in the fixed-point batch: the rewritten aggregate
  * scans the MV path, which is not a registered base, so it cannot match
  * again. `create()` deregisters before rebuilding so the MV-build
  * aggregate itself can never be answered from the MV it is overwriting.
  */
object MatViewRewrite extends Rule[LogicalPlan] {

  final case class Measure(kind: String, srcSql: String, mvCol: String)
  final case class MvDef(baseRoots: Set[String], groupCols: Seq[String],
                         measures: Seq[Measure], cntCol: String,
                         relation: LogicalRelation, mvDir: String,
                         generation: Int,
                         sums: Seq[Column], mins: Seq[Column], maxs: Seq[Column])

  private val registry =
    new java.util.concurrent.ConcurrentHashMap[String, MvDef]()

  def clear(): Unit = registry.clear()
  def deregister(basePath: String): Unit = registry.remove(basePath)

  /** One corpus pass: build + persist + register the summary table. */
  def create(spark: SparkSession, basePath: String, mvDir: String,
             groupCols: Seq[String], sums: Seq[Column] = Nil,
             mins: Seq[Column] = Nil, maxs: Seq[Column] = Nil): Unit = {
    registry.remove(basePath)
    val base = spark.read.parquet(basePath)
    // canonical SQL text of each measure expression, captured through the
    // same analyzer that will resolve the user query's aggregate children
    def srcSqls(cols: Seq[Column]): Seq[String] =
      if (cols.isEmpty) Nil
      else base.select(cols: _*).queryExecution.analyzed
        .asInstanceOf[Project].projectList.map {
          case a: Alias => a.child.sql
          case e        => e.sql
        }
    val sumSql = srcSqls(sums)
    val minSql = srcSqls(mins)
    val maxSql = srcSqls(maxs)
    partialAgg(base, groupCols, sums, mins, maxs)
      .write.mode("overwrite").parquet(s"$mvDir/gen-1")
    val roots = base.queryExecution.analyzed.collect {
      case l: LogicalRelation => l.relation match {
        case fs: HadoopFsRelation => fs.location.rootPaths.map(_.toString)
        case _                    => Nil
      }
    }.flatten.toSet
    val ms =
      sumSql.zipWithIndex.map { case (s, i) => Measure("sum", s, s"_mv_sum_$i") } ++
        minSql.zipWithIndex.map { case (s, i) => Measure("min", s, s"_mv_min_$i") } ++
        maxSql.zipWithIndex.map { case (s, i) => Measure("max", s, s"_mv_max_$i") }
    registry.put(basePath, MvDef(roots, groupCols, ms, "_mv_cnt",
      relationAt(spark, s"$mvDir/gen-1"), mvDir, 1, sums, mins, maxs))
  }

  private def relationAt(spark: SparkSession, path: String): LogicalRelation =
    spark.read.parquet(path).queryExecution.analyzed.collectFirst {
      case l: LogicalRelation => l
    }.getOrElse(throw new IllegalStateException(s"no scan for MV at $path"))

  /** The summary-building aggregate — shared by create() (over the
    * base) and refresh() (over a delta batch). */
  private def partialAgg(df: org.apache.spark.sql.DataFrame,
                         groupCols: Seq[String], sums: Seq[Column],
                         mins: Seq[Column], maxs: Seq[Column])
      : org.apache.spark.sql.DataFrame = {
    val aggCols =
      Seq(count(lit(1)).as("_mv_cnt")) ++
        sums.zipWithIndex.map { case (c, i) => fsum(c).as(s"_mv_sum_$i") } ++
        mins.zipWithIndex.map { case (c, i) => fmin(c).as(s"_mv_min_$i") } ++
        maxs.zipWithIndex.map { case (c, i) => fmax(c).as(s"_mv_max_$i") }
    df.groupBy(groupCols.map(df(_)): _*).agg(aggCols.head, aggCols.tail: _*)
  }

  /** INCREMENTAL REFRESH: fold a delta batch into the summary without
    * re-reading the base corpus — the maintenance step that makes an MV
    * affordable at 100 TB (a full rebuild IS a corpus pass; the delta's
    * partials are O(batch)). The delta aggregates with the SAME
    * measure expressions, unions the current summary generation, and
    * re-aggregates (counts and sums add, mins/maxs fold — exactly the
    * partial-merge semantics the rewrite already relies on), landing in
    * a NEW generation directory; the registry swaps to it atomically
    * from the rule's perspective (subsequent optimizations see the new
    * relation). Works for append-only deltas — updates/deletes need
    * retractable aggregates, declared out of scope. */
  def refresh(spark: SparkSession, basePath: String, delta: org.apache.spark.sql.DataFrame): Unit = {
    val mv = registry.get(basePath)
    require(mv != null, s"no MV registered for $basePath")
    val cur = spark.read.parquet(s"${mv.mvDir}/gen-${mv.generation}")
    val deltaAgg = partialAgg(delta, mv.groupCols, mv.sums, mv.mins, mv.maxs)
    val merged = cur.unionByName(deltaAgg)
    val folded = merged.groupBy(mv.groupCols.map(merged(_)): _*)
      .agg(
        fsum(col(mv.cntCol)).cast("long").as(mv.cntCol),
        mv.measures.map { m =>
          val t = cur.schema(m.mvCol).dataType
          m.kind match {
            case "sum" => fsum(col(m.mvCol)).cast(t).as(m.mvCol)
            case "min" => fmin(col(m.mvCol)).as(m.mvCol)
            case "max" => fmax(col(m.mvCol)).as(m.mvCol)
          }
        }: _*)
    val nextGen = mv.generation + 1
    folded.write.mode("overwrite").parquet(s"${mv.mvDir}/gen-$nextGen")
    registry.put(basePath, mv.copy(
      relation = relationAt(spark, s"${mv.mvDir}/gen-$nextGen"),
      generation = nextGen))
  }

  override def apply(plan: LogicalPlan): LogicalPlan =
    if (registry.isEmpty) plan
    else plan.transformUp { case a: Aggregate => rewrite(a).getOrElse(a) }

  /** Peel attribute-only Projects and collect Filters down to a scan. */
  private def unwrap(p: LogicalPlan, fs: Seq[Expression])
      : Option[(LogicalRelation, Seq[Expression])] = p match {
    case l: LogicalRelation => Some((l, fs))
    case Filter(c, ch)      => unwrap(ch, fs :+ c)
    case Project(pl, ch) if pl.forall(_.isInstanceOf[AttributeReference]) =>
      unwrap(ch, fs)
    case _ => None
  }

  private def mvFor(lr: LogicalRelation): Option[MvDef] = lr.relation match {
    case fs: HadoopFsRelation =>
      val roots = fs.location.rootPaths.map(_.toString).toSet
      registry.values.asScala.find(_.baseRoots == roots)
    case _ => None
  }

  private def rewrite(a: Aggregate): Option[LogicalPlan] = {
    val (lr, filters) = unwrap(a.child, Nil).getOrElse(return None)
    val mv = mvFor(lr).getOrElse(return None)
    if (a.groupingExpressions.isEmpty) return None
    val groupOk = a.groupingExpressions.forall {
      case ar: AttributeReference => mv.groupCols.contains(ar.name)
      case _                      => false
    }
    if (!groupOk) return None
    if (!filters.forall(f => f.deterministic &&
          f.references.forall(r => mv.groupCols.contains(r.name)))) return None

    val fresh = mv.relation.newInstance()
    val mvAttr = fresh.output.map(o => o.name -> o).toMap
    if (!(mv.groupCols :+ mv.cntCol).forall(mvAttr.contains) ||
        !mv.measures.forall(m => mvAttr.contains(m.mvCol))) return None

    def rwAgg(ae: AggregateExpression): Option[Expression] = {
      if (ae.isDistinct || ae.filter.isDefined) return None
      val nf: Option[AggregateFunction] = ae.aggregateFunction match {
        case Count(Seq(l: Literal)) if l.value != null =>
          Some(new Sum(mvAttr(mv.cntCol)))
        case Sum(child, _) =>
          mv.measures.find(m => m.kind == "sum" && m.srcSql == child.sql)
            .map(m => new Sum(mvAttr(m.mvCol)))
        case Min(child) =>
          mv.measures.find(m => m.kind == "min" && m.srcSql == child.sql)
            .map(m => Min(mvAttr(m.mvCol)))
        case Max(child) =>
          mv.measures.find(m => m.kind == "max" && m.srcSql == child.sql)
            .map(m => Max(mvAttr(m.mvCol)))
        case _ => None
      }
      nf.map { f =>
        val re = ae.copy(aggregateFunction = f)
        if (re.dataType == ae.dataType) re else Cast(re, ae.dataType)
      }
    }

    // structural rewrite of an aggregate-list expression: aggregate calls
    // swap to their MV partials (no descent below them), bare attribute
    // references must be group columns, scalar scaffolding carries over
    def rw(e: Expression): Option[Expression] = e match {
      case ae: AggregateExpression => rwAgg(ae)
      case ar: AttributeReference =>
        if (mv.groupCols.contains(ar.name)) mvAttr.get(ar.name) else None
      case leaf if leaf.children.isEmpty => Some(leaf)
      case other =>
        val cs = other.children.map(rw)
        if (cs.forall(_.isDefined)) Some(other.withNewChildren(cs.map(_.get)))
        else None
    }

    val newAes: Seq[Option[NamedExpression]] = a.aggregateExpressions.map {
      case al: Alias =>
        rw(al.child).map(c => Alias(c, al.name)(exprId = al.exprId,
          qualifier = al.qualifier, explicitMetadata = Some(al.metadata)))
      case ar: AttributeReference if mv.groupCols.contains(ar.name) =>
        mvAttr.get(ar.name).map(m =>
          Alias(m, ar.name)(exprId = ar.exprId, qualifier = ar.qualifier))
      case _ => None
    }
    if (newAes.exists(_.isEmpty)) return None

    val newGes: Seq[Expression] = a.groupingExpressions.map {
      case ar: AttributeReference => mvAttr(ar.name)
    }
    val newChild =
      if (filters.isEmpty) fresh
      else Filter(filters.map(_.transform {
        case ar: AttributeReference if mvAttr.contains(ar.name) => mvAttr(ar.name)
      }).reduce(And), fresh)
    Some(Aggregate(newGes, newAes.map(_.get), newChild))
  }
}
