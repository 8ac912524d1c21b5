package graft.plans

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate.AggregateExpression
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
import org.apache.spark.sql.types.{DateType, IntegerType, LongType, TimestampType}
import graft.functions.QHistStateAgg

/** QUANTILE-PARTIAL materialized-view routing (r14) — [[KmvRoute]]'s
  * sketch-routing pattern extended to rank statistics: the per-type
  * percentile panel (q_percentiles_approx) derives from per-(type, day)
  * EXACT value histograms ([[graft.functions.QHistStateAgg]]), and a
  * registered events table gets a companion rollup of those states so
  * the INNER aggregate of the two-level sketch query is rewritten to a
  * rollup SCAN — #days × #types stored rows instead of the corpus.
  *
  * Exactness is the histogram monoid, one step STRONGER than KMV's
  * merge-closure: where a stream-built quantile sketch (GK/KLL) is
  * merge-order-sensitive — the routed estimate would only be
  * replay-stable under a PINNED merge order (sorted day list) — exact
  * histogram partials are a commutative monoid (counter addition), so
  * any merge order reaches the same multiset and the single
  * band-compression at read ([[graft.functions.QHistMergeAgg]], pure
  * integer arithmetic) is a function of that multiset. Routed plans are
  * therefore HASH-IDENTICAL to the raw recompute with no order pinning
  * at all, and the whole sketch face is DuckDB-oracle-checkable.
  *
  * Anything not this exact shape — a different grain, a different
  * measure, extra aggregates, filters — leaves the plan untouched and
  * scans raw (the [[CorpusRoute]]/[[KmvRoute]] conservatism), and a
  * session whose timezone differs from the rollup's build zone declines
  * (the day grain is a timezone-dependent cast — the r13-ADVICE
  * KmvRoute rule, applied here from birth).
  */
object QuantileRoute extends Rule[LogicalPlan] {

  /** raw events root path (fully qualified) → (rollup path, build
    * timezone).
    */
  private val routes = TrieMap[String, (String, String)]()

  private def sessionZone(spark: SparkSession): String =
    spark.sessionState.conf.sessionLocalTimeZone

  private def canon(spark: SparkSession, path: String): String = {
    val hp = new org.apache.hadoop.fs.Path(path)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).makeQualified(hp).toString
  }

  /** The maintained rollup: one row per (event_type, day) holding the
    * EXACT value histogram of that day's readings — the same partial
    * the declared query's inner aggregate computes, so serving it is
    * substitution, not approximation-on-approximation.
    */
  def rollupOf(events: DataFrame): DataFrame = {
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.ensureRegistered(events.sparkSession)
    events.groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(graft.functions.VectorFunctions.qhistState(col("value"))
        .as("state"))
  }

  /** Incremental maintenance for an APPEND batch at day-partition grain
    * (the [[CorpusRoute.upsertRollup]] additive-partials discipline —
    * exact for append-only ingest; a re-delivered slice double-counts,
    * so at-least-once delivery needs the upstream dedup every additive
    * rollup needs): only the batch's days' partitions rewrite, each as
    * stored-state ∪ delta-state under the exact counter-add re-fold
    * ([[graft.functions.QHistMergeStateAgg]]) — bit-identical to a full
    * rebuild over old ∪ new. The NULL day folds like any other touched
    * day (dynamic overwrite rewrites its partition dir, so the existing
    * null-day state must merge, never drop — the KmvRoute r13-ADVICE
    * rule, applied here from birth).
    */
  def upsertRollup(spark: SparkSession, rollupPath: String,
      newEvents: DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    graft.functions.VectorFunctions.ensureRegistered(spark)
    val delta = rollupOf(newEvents)
    val dayRows = delta.select("day").distinct().collect()
    val days = dayRows.filterNot(_.isNullAt(0)).map(_.getDate(0)).toSeq
    val hasNullDay = dayRows.exists(_.isNullAt(0))
    val touched =
      if (days.isEmpty) col("day").isNull
      else if (hasNullDay) col("day").isin(days: _*) || col("day").isNull
      else col("day").isin(days: _*)
    if (dayRows.nonEmpty) {
      // localCheckpoint breaks lineage to the files being overwritten;
      // the affected slice is #batch-days × #types rows
      val existing = spark.read.parquet(rollupPath)
        .filter(touched)
        .select("event_type", "day", "state")
        .localCheckpoint()
      existing.unionByName(delta)
        .groupBy("event_type", "day")
        .agg(graft.functions.VectorFunctions.qhistMergeState(col("state"))
          .as("state"))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day").parquet(rollupPath)
      invalidate(rollupPath)
    }
  }

  def register(spark: SparkSession, rawPath: String,
      rollupPath: String): Unit =
    routes.put(canon(spark, rawPath),
      (rollupPath, sessionZone(spark))): Unit

  def deregister(spark: SparkSession, rawPath: String): Unit =
    routes.remove(canon(spark, rawPath)): Unit

  /** Build (once per dataset fingerprint × session zone, at ingest) the
    * per-(type, day) histogram rollup, register raw→rollup, and enable
    * the rule. Zone discipline and the two-JVM-safe publish are the
    * [[KmvRoute.ensureArtifacts]] shape.
    */
  def ensureArtifacts(spark: SparkSession, dir: String): String = {
    val zone = sessionZone(spark)
    val zoneKey = zone.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = graft.operators.Artifacts.datasetRoot(dir, "events",
      s"qhist_route_v1_z$zoneKey")
    val roll = s"$base/rollup"
    def complete(p: String): Boolean =
      new java.io.File(s"$p/rollup/_SUCCESS").exists() &&
        graft.operators.Artifacts.parseKvFile(new java.io.File(s"$p/_meta"))
          .exists(_.get("zone").contains(zone))
    val existed =
      new java.io.File(s"$base/_SUCCESS").exists() && complete(base)
    graft.operators.Artifacts.ensureRoot(base)(complete) { tmp =>
      rollupOf(graft.Tables.events(spark, dir)).coalesce(1)
        .write.partitionBy("day").parquet(s"$tmp/rollup")
      java.nio.file.Files.write(new java.io.File(s"$tmp/_meta").toPath,
        s"zone=$zone\n".getBytes(java.nio.charset.StandardCharsets.UTF_8)): Unit
    }
    this.synchronized {
      if (!existed) invalidate(roll)
      enable(spark)
      register(spark, s"$dir/events.parquet", roll)
    }
    roll
  }

  /** Loud engagement check — a declared routed query must FAIL if the
    * optimizer stopped serving it from the rollup.
    */
  def requireEngaged(df: DataFrame, rollupPath: String): Unit = {
    val engaged = df.queryExecution.optimizedPlan.collect {
      case lr: LogicalRelation => lr.relation match {
        case h: HadoopFsRelation =>
          h.location.rootPaths.exists(_.toString.contains(rollupPath))
        case _ => false
      }
    }.exists(identity)
    require(engaged, s"quantile route failed to engage for $rollupPath:\n" +
      df.queryExecution.optimizedPlan)
  }

  /** Idempotently attach the rule to a live session. */
  def enable(spark: SparkSession): Unit = this.synchronized {
    if (!spark.experimental.extraOptimizations.exists(_ eq this))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ this
  }

  // resolved-once rollup relations (see LtsRoute.ltsRelations for why)
  private val rollupRelations = TrieMap[String, LogicalRelation]()

  def invalidate(rollupPath: String): Unit =
    rollupRelations.remove(rollupPath): Unit

  private def rollupRelationFor(path: String): Option[LogicalRelation] =
    rollupRelations.get(path).orElse {
      val rel = SparkSession.active.read.parquet(path)
        .queryExecution.analyzed
        .collectFirst { case l: LogicalRelation => l }
      rel.foreach(rollupRelations.put(path, _))
      rel
    }.map(_.newInstance())

  private def routeFor(lr: LogicalRelation): Option[(String, String)] =
    lr.relation match {
      case h: HadoopFsRelation if h.location.rootPaths.size == 1 =>
        routes.get(h.location.rootPaths.head.toString)
      case _ => None
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case agg: Aggregate => rewrite(agg).getOrElse(agg)
  }

  /** Same Project-inlining dance as [[KmvRoute.rewrite]]. */
  private def rewrite(agg: Aggregate): Option[LogicalPlan] = agg.child match {
    case lr: LogicalRelation =>
      routeFor(lr).flatMap { case (p, z) => buildRewrite(agg, lr, p, z) }
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
      routeFor(lr).flatMap { case (p, z) => buildRewrite(inlined, lr, p, z) }
    case _ => None
  }

  private def buildRewrite(agg: Aggregate, lr: LogicalRelation,
      rollupPath: String, buildZone: String): Option[LogicalPlan] = {
    // a foreign-zone session's to_date grain is a DIFFERENT grouping
    // than the stored day buckets — the raw scan is its correct answer
    if (conf.sessionLocalTimeZone != buildZone) return None
    val rollRel = rollupRelationFor(rollupPath).getOrElse(return None)
    val roll: Map[String, Attribute] = rollRel.output.map(a => a.name -> a).toMap
    if (!Seq("event_type", "day", "state").forall(roll.contains)) return None
    val rawName: Map[ExprId, String] = lr.output.map(a => a.exprId -> a.name).toMap

    def isRawAttr(e: Expression, name: String): Boolean = e match {
      case a: AttributeReference => rawName.get(a.exprId).contains(name)
      case _ => false
    }

    // the normalized event timestamp in every generation Tables.events
    // produces (the KmvRoute patterns verbatim)
    def isNormalizedTs(e: Expression): Boolean = e match {
      case a: AttributeReference => isRawAttr(a, "ts")
      case c: Cast if c.dataType == TimestampType &&
          c.timeZoneId.forall(_ == buildZone) => isNormalizedTs(c.child)
      case m: MicrosToTimestamp => m.child match {
        case d: IntegralDivide =>
          isRawAttr(d.left, "ts") && (d.right match {
            case Literal(v: Long, LongType) => v == 1000L
            case Literal(v: Int, IntegerType) => v == 1000
            case _ => false
          })
        case _ => false
      }
      case _ => false
    }

    def isDayOfTs(e: Expression): Boolean = e match {
      case al: Alias => isDayOfTs(al.child)
      case c: Cast if c.dataType == DateType &&
          c.timeZoneId.forall(_ == buildZone) => isNormalizedTs(c.child)
      case _ => false
    }

    def isTypeAttr(e: Expression): Boolean = e match {
      case al: Alias => isTypeAttr(al.child)
      case _ => isRawAttr(e, "event_type")
    }

    // exactly two groupings: event_type and the day of ts
    val gs = agg.groupingExpressions
    if (gs.size != 2) return None
    if (!((isTypeAttr(gs(0)) && isDayOfTs(gs(1))) ||
      (isTypeAttr(gs(1)) && isDayOfTs(gs(0))))) return None

    var ok = true
    val newProj: Seq[NamedExpression] = agg.aggregateExpressions.map {
      case a: AttributeReference if isRawAttr(a, "event_type") =>
        Alias(roll("event_type"), a.name)(exprId = a.exprId,
          qualifier = a.qualifier)
      case al: Alias => al.child match {
        case g if isDayOfTs(g) =>
          Alias(roll("day"), al.name)(exprId = al.exprId,
            qualifier = al.qualifier)
        case a: AttributeReference if isRawAttr(a, "event_type") =>
          Alias(roll("event_type"), al.name)(exprId = al.exprId,
            qualifier = al.qualifier)
        case ae: AggregateExpression if !ae.isDistinct && ae.filter.isEmpty =>
          ae.aggregateFunction match {
            case st: QHistStateAgg if isRawAttr(st.child, "value") =>
              // the rollup row IS this group's state (one row per
              // (type, day) by construction), so the aggregate
              // disappears entirely — a pruned scan replaces it
              Alias(roll("state"), al.name)(exprId = al.exprId,
                qualifier = al.qualifier)
            case _ => ok = false; al
          }
        case _ => ok = false; al
      }
      case other => ok = false; other
    }
    val leftover = newProj
      .flatMap(_.references).exists(lr.outputSet.contains)
    if (ok && !leftover) Some(Project(newProj, rollRel))
    else None
  }
}
