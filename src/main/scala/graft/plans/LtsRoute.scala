package graft.plans

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.{AggregateExpression, Count, Sum}
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DecimalType, LongType, StringType}

/** LTS query routing (SURVEY.md §4; ref: res/schema.sql:22-37,54-69): the
  * reference keeps 1-minute materialized rollups (`metrics_*_lts`) beside
  * each raw table and serves history queries from them. Spark-first, that
  * is a `Rule[LogicalPlan]`: an `Aggregate` over a REGISTERED raw table
  * whose time grouping is `date_trunc` at minute-or-coarser grain and whose
  * measures are decimal sums / counts is rewritten onto the downsampled
  * table — `sum(cast(value as decimal))` → `sum(sum_value)`, `count(*)` →
  * `sum(n)`, `date_trunc(u, time)` → `date_trunc(u, bucket)` (idempotent
  * coarsening). Decimal re-aggregation is exact, so routed plans are
  * bit-identical to raw scans while reading ~1/rows-per-minute of the data
  * — at 100 TB the difference between a full-history scan and an index hit.
  *
  * Rewrites happen only when EVERY grouping/aggregate expression is
  * re-aggregable from the rollup; anything else (raw-grain groupings,
  * percentiles, distinct counts) leaves the plan untouched. Output
  * attribute ids and types are preserved (sums re-cast to their original
  * decimal precision, replaced dimension attrs re-aliased under their old
  * exprIds) so parent operators never see the difference.
  *
  * Activate with [[enable]] (`spark.experimental.extraOptimizations`) or
  * via `spark.sql.extensions=graft.functions.GraftExtensions`.
  */
object LtsRoute extends Rule[LogicalPlan] {

  /** raw-table root path (fully qualified) → LTS rollup path. */
  private val routes = TrieMap[String, String]()

  private def canon(spark: SparkSession, path: String): String = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(hp).toString
  }

  /** Register a raw→LTS route; the LTS table must be the minute rollup of
    * the raw table with schema (bucket, <dims...>, sum_value, n).
    */
  def register(spark: SparkSession, rawPath: String, ltsPath: String): Unit =
    routes.put(canon(spark, rawPath), ltsPath): Unit

  def deregister(spark: SparkSession, rawPath: String): Unit =
    routes.remove(canon(spark, rawPath)): Unit

  /** Idempotently attach the rule to a live session. */
  def enable(spark: SparkSession): Unit = this.synchronized {
    if (!spark.experimental.extraOptimizations.exists(_ eq this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  // truncation units that are coarser-or-equal to the rollup's minute grain
  private val coarseUnits =
    Set("minute", "hour", "day", "week", "month", "quarter", "year")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  private def routeFor(lr: LogicalRelation): Option[String] =
    lr.relation match {
      // single-root only: a multi-path scan mixes registered and foreign
      // data, and routing it would drop the other paths' rows
      case h: HadoopFsRelation if h.location.rootPaths.size == 1 =>
        routes.get(h.location.rootPaths.head.toString)
      case _ => None
    }

  // analyzed rollup relations, resolved once per path (the optimizer calls
  // this rule per query — re-listing files there would be blocking I/O in
  // every plan); newInstance() refreshes exprIds per use so two routed
  // aggregates in one query never collide. Shared scaffold (r14): the
  // streaming maintainer now commits through date-dir aside-rename
  // swaps (Ingest.upsertByKey), so a cache miss must decline to route
  // while crashed-swap residue exists — a fresh listing would silently
  // drop (or string-infer) the aside day.
  private val ltsRelations = new RouteSupport.RelationCache("date")

  /** Drop the cached relation for a route target whose FILES changed —
    * streaming-maintained rollups ([[graft.streaming.Ingest
    * .streamLtsRollupTo]]) rewrite partitions every micro-batch, and a
    * stale cached file listing would route queries onto deleted files.
    */
  def invalidate(ltsPath: String): Unit = ltsRelations.invalidate(ltsPath)

  private def ltsRelationFor(ltsPath: String): Option[LogicalRelation] =
    ltsRelations.relationFor(ltsPath)

  /** Match Aggregate over the registered relation. The optimizer pulls
    * complex grouping expressions into a child Project
    * (PullOutGroupingExpressions), so project aliases are inlined back
    * into the aggregate before pattern-matching against the raw columns.
    */
  private def rewrite(agg: Aggregate): Option[LogicalPlan] = agg.child match {
    case lr: LogicalRelation =>
      routeFor(lr).flatMap(buildRewrite(agg, lr, _))
    case Project(projList, lr: LogicalRelation) =>
      val aliasOf = projList.collect {
        case al: Alias => al.toAttribute.exprId -> al.child
      }.toMap
      def inline(e: Expression): Expression = e.transformUp {
        case a: AttributeReference if aliasOf.contains(a.exprId) => aliasOf(a.exprId)
      }
      val inlined = Aggregate(
        agg.groupingExpressions.map(inline),
        agg.aggregateExpressions.map(ne => inline(ne) match {
          case n: NamedExpression => n
          case other => Alias(other, ne.name)(exprId = ne.exprId)
        }),
        lr)
      routeFor(lr).flatMap(buildRewrite(inlined, lr, _))
    case _ => None
  }

  private def buildRewrite(agg: Aggregate, lr: LogicalRelation,
      ltsPath: String): Option[LogicalPlan] = {
    val ltsRel = ltsRelationFor(ltsPath).getOrElse(return None)
    val lts: Map[String, Attribute] = ltsRel.output.map(a => a.name -> a).toMap
    if (!Seq("bucket", "sum_value", "n").forall(lts.contains)) return None
    val rawName: Map[ExprId, String] = lr.output.map(a => a.exprId -> a.name).toMap
    var ok = true
    def fail(): Expression = { ok = false; Literal(null) }

    def isRawAttr(e: Expression, name: String): Boolean = e match {
      case a: AttributeReference => rawName.get(a.exprId).contains(name)
      case _ => false
    }

    // the rollup accumulated per-row casts at exactly this type; a sum over
    // a different scale/precision rounds per ROW on raw but per TOTAL when
    // re-aggregated, so only the matching cast is re-aggregable
    val rollupSumOk: DecimalType => Boolean = cast =>
      lts("sum_value").dataType == DecimalType(
        math.min(DecimalType.MAX_PRECISION, cast.precision + 10), cast.scale)

    def rw(e: Expression): Expression = e match {
      case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
        ae.aggregateFunction match {
          // sum(cast(value as decimal(p,s))) → cast(sum(sum_value), original)
          case s: Sum => s.child match {
            case c: Cast if isRawAttr(c.child, "value") &&
                (c.dataType match {
                  case d: DecimalType => rollupSumOk(d)
                  case _ => false
                }) =>
              Cast(ae.copy(aggregateFunction =
                s.withNewChildren(Seq(lts("sum_value"))).asInstanceOf[Sum]), ae.dataType)
            case _ => fail()
          }
          // count(*) / count(lit) → sum(n), zero-coalesced to keep the
          // empty-relation global-aggregate answer identical; the literal
          // must be non-null (count(NULL) is always 0, not the row count)
          case c: Count if c.children.forall(ch => ch.foldable && ch.eval() != null) =>
            Coalesce(Seq(
              ae.copy(aggregateFunction = Sum(lts("n").asInstanceOf[Expression])),
              Literal(0L)))
          case _ => fail()
        }
      // any other aggregate shape (FILTER clause, DISTINCT, other functions)
      // must kill the rewrite — falling through to the generic child-walk
      // would rewrite its arguments and route it with wrong semantics
      case _: AggregateExpression => fail()
      case tt: TruncTimestamp =>
        (tt.format, tt.timestamp) match {
          case (Literal(f, StringType), t) if f != null &&
              coarseUnits.contains(f.toString.toLowerCase) && isRawAttr(t, "time") =>
            tt.withNewChildren(Seq(tt.format, lts("bucket")))
          case _ => fail()
        }
      case a: AttributeReference =>
        rawName.get(a.exprId).flatMap(lts.get).getOrElse(fail())
      case _: Literal => e
      case other if other.children.nonEmpty => other.mapChildren(rw)
      case _ => fail()
    }

    val newGroupings = agg.groupingExpressions.map(rw)
    val newAggExprs: Seq[NamedExpression] = agg.aggregateExpressions.map {
      // top-level dimension attrs keep their exprId so parents stay bound
      case a: AttributeReference =>
        rawName.get(a.exprId).flatMap(lts.get) match {
          case Some(m) => Alias(m, a.name)(exprId = a.exprId)
          case None => ok = false; a
        }
      case al: Alias =>
        Alias(rw(al.child), al.name)(exprId = al.exprId, qualifier = al.qualifier)
      case other => rw(other) match {
        case ne: NamedExpression => ne
        case _ => ok = false; other
      }
    }
    // belt-and-braces: no reference to the raw relation may survive
    val leftover = (newGroupings ++ newAggExprs)
      .flatMap(_.references).exists(lr.outputSet.contains)
    if (ok && !leftover) Some(Aggregate(newGroupings, newAggExprs, ltsRel))
    else None
  }
}
