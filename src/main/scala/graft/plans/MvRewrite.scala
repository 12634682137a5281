package graft.plans

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.aggregate._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Automatic materialized-view query rewrite — the serve half of the
  * IVM loop ([[graft.operators.MaterializedView]] is the maintain
  * half). A registered MV is a parquet aggregate table keyed by dim
  * columns and carrying mergeable partials (exact decimal sums, row
  * counts, min/max). This rule rewrites a matching user aggregate to
  * re-aggregate the MV instead of scanning the base table.
  *
  * At 100 TB this is the mechanism behind the reference's clustered
  * 92 ms benchmark number taken to its conclusion: the monthly-agg
  * query reads a groups-sized table (KBs) instead of an 826M-row fact,
  * and the MV stays current for O(|delta|) per batch via IVM. The
  * rewrite is exact, not approximate: partials are DECIMAL (decimal
  * addition is associative, so two-level aggregation is bit-identical
  * to one-level) and counts are integral — double sums are
  * deliberately NOT rewritable.
  *
  * Matching is conservative and fail-closed; a query rewrites only if
  * ALL of the following hold, otherwise it is left untouched:
  *  - the aggregate's child is a Project/Filter chain over a file
  *    relation whose path matches the registered base table;
  *  - every grouping expression, resolved down to base-relation
  *    columns, equals a registered dim expression (so any SUBSET of
  *    dims works — rollups re-aggregate the partials);
  *  - every pre-aggregation filter references only dim expressions
  *    (a row predicate on a dim is a group predicate);
  *  - every aggregate is COUNT(*) / COUNT(lit) → SUM(count_col),
  *    SUM/MIN/MAX of a registered measure expression with a
  *    decimal or integral type (never SUM(double)), or AVG of a
  *    registered DECIMAL measure that also has a non-null-count
  *    partial (rebuilt as Average's own sum/count division over the
  *    re-aggregated partials — bit-identical, see matchAggregate);
  *  - grouping is non-empty (a global aggregate over an empty base
  *    would yield COUNT=0 where SUM-of-partials yields NULL).
  *
  * Expression equivalence is by resolved-SQL rendering: registration
  * resolves each dim/measure Column through the base DataFrame's own
  * projections down to relation columns and stores `expr.sql`; the
  * rule resolves query expressions the same way and compares text.
  * Both sides go through the one resolver, so the rendering is
  * symmetric by construction. Names must be unambiguous over the base
  * relation — true for any single-table aggregate, which is the only
  * shape matched.
  *
  * Output attribute names AND exprIds are preserved (aliases are
  * re-issued with the original ids), so parent operators above the
  * rewritten aggregate resolve unchanged. The MV relation is
  * instantiated fresh per rewrite (`newInstance`), so a plan touching
  * the MV twice cannot alias-collide. Any internal error fails open
  * to the original plan.
  */
object MvRewrite {

  /** A registered materialized view.
    *
    * @param dims     resolved base expression SQL → MV dim column
    * @param sums     resolved base expression SQL → MV SUM-partial column
    * @param mins     resolved base expression SQL → MV MIN-partial column
    * @param maxs     resolved base expression SQL → MV MAX-partial column
    * @param cnts     resolved base expression SQL → MV column counting
    *                 NON-NULL values of that expression (what AVG
    *                 divides by — the row count over-divides when the
    *                 measure has nulls). An AVG of a decimal measure
    *                 rewrites only when BOTH its sum partial and its
    *                 non-null count partial are registered.
    * @param countCol MV column holding the per-group row count
    * @param dayDims  resolved TIMESTAMP expression SQL → MV date dim
    *                 column defined as `to_date` of that expression.
    *                 Lets the rule invert Spark's own pushdown rewrite
    *                 of `to_date(ts) >= d` into `ts >= midnight(d)`:
    *                 a timestamp bound that falls exactly on midnight
    *                 maps back to a date bound on the dim (UTC
    *                 sessions only; anything else fails closed).
    * @param nullDims resolved expression SQL → MV dim column whose
    *                 nullity tracks that expression exactly (the dim is
    *                 a null-propagating function of it). Maps the
    *                 optimizer's inferred `isnotnull(raw_col)`
    *                 conjuncts onto the dim.
    */
  final case class MvDef(
      name: String,
      basePathSuffix: String,
      mvPath: String,
      dims: Map[String, String],
      sums: Map[String, String] = Map.empty,
      mins: Map[String, String] = Map.empty,
      maxs: Map[String, String] = Map.empty,
      cnts: Map[String, String] = Map.empty,
      countCol: Option[String] = None,
      dayDims: Map[String, String] = Map.empty,
      nullDims: Map[String, String] = Map.empty)

  private val defs = new java.util.concurrent.ConcurrentHashMap[String, MvDef]()
  // one parquet read per mvPath — rewrites take newInstance() copies, so
  // a rule left enabled session-wide costs no I/O per optimized query.
  // Register/unregister invalidate, so refreshing an MV in place (the
  // IVM maintain step overwrites the parquet) means re-registering it —
  // a stale file index would otherwise serve deleted files.
  private[plans] val mvRelCache =
    new java.util.concurrent.ConcurrentHashMap[String, LogicalRelation]()

  def register(d: MvDef): Unit = {
    mvRelCache.remove(d.mvPath); defs.put(d.name, d); ()
  }
  def unregister(name: String): Unit = {
    Option(defs.remove(name)).foreach(d => mvRelCache.remove(d.mvPath)); ()
  }
  def registered: Seq[MvDef] = {
    import scala.jdk.CollectionConverters._
    defs.values.asScala.toSeq
  }

  /** Resolve a Column through `base`'s own plan down to relation
    * columns and render it — the one symmetric rendering both
    * registration and the rule use. */
  def resolvedSql(base: DataFrame, c: Column): String = {
    val analyzed = base.select(c.as("__mv_probe")).queryExecution.analyzed
    val alias = analyzed.expressions.collectFirst {
      case a: Alias if a.name == "__mv_probe" => a
    }.getOrElse(sys.error("probe projection lost"))
    stripToRelation(analyzed.children.head) match {
      case Some((_, sub, _)) => resolveExpr(alias.child, sub).sql
      case None => sys.error("base plan is not a Project/Filter chain over a file relation")
    }
  }

  /** Install/remove the rule on a session (idempotent). */
  def enable(spark: SparkSession): Unit =
    if (!spark.experimental.extraOptimizations.exists(_.isInstanceOf[MvRewriteRule]))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ new MvRewriteRule(spark)

  def disable(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_.isInstanceOf[MvRewriteRule])

  // ------------------------------------------------------------ internals

  /** Walk Project/Filter/SubqueryAlias down to a file relation,
    * accumulating the alias substitution map and the filter
    * conditions (both still in local attr terms — resolve with the
    * final map). */
  private[plans] def stripToRelation(plan: LogicalPlan)
      : Option[(LogicalRelation, Map[ExprId, Expression], Seq[Expression])] = {
    @annotation.tailrec
    def down(p: LogicalPlan, sub: Map[ExprId, Expression], fs: Seq[Expression])
        : Option[(LogicalRelation, Map[ExprId, Expression], Seq[Expression])] =
      p match {
        case Project(projList, child) =>
          val add = projList.collect { case a: Alias => a.exprId -> a.child }
          down(child, sub ++ add, fs)
        case Filter(cond, child) => down(child, sub, fs :+ cond)
        case SubqueryAlias(_, child) => down(child, sub, fs)
        case r: LogicalRelation => Some((r, sub, fs))
        case _ => None
      }
    down(plan, Map.empty, Nil)
  }

  /** Substitute project aliases until fixpoint (aliases may reference
    * lower projects' aliases). */
  private[plans] def resolveExpr(e: Expression, sub: Map[ExprId, Expression]): Expression = {
    var cur = e
    var continue = true
    var guard = 0
    while (continue && guard < 20) {
      val next = cur.transformUp {
        case a: AttributeReference if sub.contains(a.exprId) => sub(a.exprId)
      }
      continue = !next.fastEquals(cur)
      cur = next
      guard += 1
    }
    // normalize to what the optimizer will have done to the query side:
    // RuntimeReplaceable forms collapse to their replacement (to_date →
    // CAST AS DATE), then literal subtrees fold (CAST(1000 AS BIGINT) →
    // 1000L) — registration goes through this same path, so renderings
    // agree by construction
    cur.transformUp { case r: RuntimeReplaceable => r.replacement }
      .transformUp {
        case e if e.foldable && !e.isInstanceOf[Literal] =>
          Literal.create(e.eval(null), e.dataType)
      }
  }

  private def relationPath(r: LogicalRelation): String = r.relation match {
    case h: HadoopFsRelation =>
      h.location.rootPaths.map(_.toString).mkString(",")
    case _ => ""
  }

  private def isExactType(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
    case _: org.apache.spark.sql.types.DecimalType => true
    case org.apache.spark.sql.types.LongType | org.apache.spark.sql.types.IntegerType |
         org.apache.spark.sql.types.ShortType | org.apache.spark.sql.types.ByteType => true
    case _ => false
  }

  private[plans] class MvRewriteRule(spark: SparkSession) extends Rule[LogicalPlan] {

    override def apply(plan: LogicalPlan): LogicalPlan =
      if (defs.isEmpty) plan
      else plan.transformDown {
        case agg @ Aggregate(ge, _, _, _) if ge.nonEmpty =>
          try tryRewrite(agg).getOrElse(agg)
          catch {
            case scala.util.control.NonFatal(e) => // fail open
              if (sys.env.contains("GRAFT_MV_DEBUG")) e.printStackTrace()
              agg
          }
      }

    private def freshMvRelation(d: MvDef): Option[LogicalRelation] =
      Option(mvRelCache.computeIfAbsent(d.mvPath,
        _ => spark.read.parquet(d.mvPath).queryExecution.analyzed match {
          case r: LogicalRelation => r
          case _ => null
        })).map(_.newInstance())

    private def dbg(msg: => String): Unit =
      if (sys.env.contains("GRAFT_MV_DEBUG")) println("[mv-dbg] " + msg)

    private def tryRewrite(agg: Aggregate): Option[LogicalPlan] = {
      val Aggregate(ge, ae, child, _) = agg
      val stripped = stripToRelation(child)
      if (stripped.isEmpty) dbg("strip failed on:\n" + child)
      stripped.flatMap { case (rel, sub, rawFilters) =>
        val path = relationPath(rel)
        val hit = registered.find(d => path.endsWith(d.basePathSuffix))
        if (hit.isEmpty) dbg(s"no MV for path $path among ${registered.map(_.basePathSuffix)}")
        hit.flatMap { d =>
          val r = rewriteAgainst(d, rel, sub, rawFilters, ge, ae)
          if (r.isEmpty) dbg("rewriteAgainst bailed")
          r
        }
      }
    }

    private def rewriteAgainst(
        d: MvDef,
        rel: LogicalRelation,
        sub: Map[ExprId, Expression],
        rawFilters: Seq[Expression],
        ge: Seq[Expression],
        ae: Seq[NamedExpression]): Option[LogicalPlan] = {
      // cheap key-membership pre-check before touching the MV relation:
      // most non-matching aggregates bail here on string lookups alone
      val geResolved = ge.map(g =>
        resolveExpr(g match { case a: Alias => a.child; case x => x }, sub))
      if (!geResolved.forall(g => d.dims.contains(g.sql))) {
        dbg("grouping not all dims: " + geResolved.map(_.sql))
        return None
      }
      val mvRel = freshMvRelation(d).getOrElse(return None)
      val mvAttr: Map[String, Attribute] = mvRel.output.map(a => a.name -> a).toMap
      if (!(d.dims.values ++ d.sums.values ++ d.mins.values ++ d.maxs.values ++
          d.cnts.values ++ d.countCol).forall(mvAttr.contains)) {
        dbg("MV columns missing: have " + mvAttr.keys)
        return None
      }
      val baseIds = rel.output.map(_.exprId).toSet

      def dimFor(e: Expression): Option[Attribute] =
        d.dims.get(e.sql).map(mvAttr)
      def dayDimFor(e: Expression): Option[Attribute] =
        d.dayDims.get(e.sql).map(mvAttr)
      def nullDimFor(e: Expression): Option[Attribute] =
        d.nullDims.get(e.sql).map(mvAttr)

      // Spark's pushdown rewrite turns `to_date(ts) >= d` into
      // `ts >= midnight(d)` before this rule runs. Invert it when the
      // bound is midnight-exact (row-wise equivalent: ts >= midnight(d)
      // ⟺ to_date(ts) >= d, and ts < midnight(d) ⟺ to_date(ts) < d);
      // non-midnight bounds and other comparisons stay unmapped and the
      // whole rewrite bails. UTC-session-only: day boundaries in any
      // other zone don't align with the literal's epoch arithmetic.
      val microsPerDay = 86400000000L
      val utcSession =
        spark.sessionState.conf.sessionLocalTimeZone == "UTC"
      def asDayBound(v: Any): Option[Literal] = v match {
        case micros: java.lang.Long if utcSession &&
            java.lang.Math.floorMod(micros.longValue, microsPerDay) == 0L =>
          Some(Literal(java.lang.Math.floorDiv(micros.longValue, microsPerDay).toInt,
            org.apache.spark.sql.types.DateType))
        case _ => None
      }
      def invertDayBounds(e: Expression): Expression = e.transformDown {
        case GreaterThanOrEqual(t, Literal(v, org.apache.spark.sql.types.TimestampType))
            if dayDimFor(t).isDefined && asDayBound(v).isDefined =>
          GreaterThanOrEqual(dayDimFor(t).get, asDayBound(v).get)
        case LessThan(t, Literal(v, org.apache.spark.sql.types.TimestampType))
            if dayDimFor(t).isDefined && asDayBound(v).isDefined =>
          LessThan(dayDimFor(t).get, asDayBound(v).get)
        case LessThanOrEqual(Literal(v, org.apache.spark.sql.types.TimestampType), t)
            if dayDimFor(t).isDefined && asDayBound(v).isDefined =>
          GreaterThanOrEqual(dayDimFor(t).get, asDayBound(v).get)
        case GreaterThan(Literal(v, org.apache.spark.sql.types.TimestampType), t)
            if dayDimFor(t).isDefined && asDayBound(v).isDefined =>
          LessThan(dayDimFor(t).get, asDayBound(v).get)
        // a registered dim is a null-propagating function of its input,
        // so the inferred isnotnull on the raw input maps to the dim
        case IsNotNull(t) if dayDimFor(t).isDefined => IsNotNull(dayDimFor(t).get)
        case IsNotNull(t) if nullDimFor(t).isDefined => IsNotNull(nullDimFor(t).get)
      }

      // dim-subtree replacement; None if base columns survive or the
      // expression is non-deterministic (rand() row-filters would turn
      // into group-filters over the MV — a different distribution)
      def mapDims(e: Expression): Option[Expression] = {
        val out = invertDayBounds(e).transformDown {
          case sub0 if dimFor(sub0).isDefined => dimFor(sub0).get
        }
        if (!out.deterministic ||
          out.references.map(_.exprId).exists(baseIds.contains)) None
        else Some(out)
      }

      // groupings: every one must BE a dim (pre-checked above by key)
      val groupAttrs: Seq[(Expression, Attribute)] =
        geResolved.map(g => (g, dimFor(g).getOrElse(return None)))

      // filters: resolved, then dim-mapped; any base residue → bail
      val filtersMapped = rawFilters.map(f => mapDims(resolveExpr(f, sub)))
      if (filtersMapped.exists(_.isEmpty)) {
        dbg("filter not dim-expressible: " + rawFilters.map(f => resolveExpr(f, sub).sql))
        return None
      }

      def matchAggregate(ag: AggregateExpression): Option[Expression] = {
        if (ag.isDistinct || ag.filter.isDefined) return None
        ag.aggregateFunction match {
          // AVG of a decimal measure: replicate Average's own evaluate
          // expression over the partials — Divide(sum AT THE CHILD'S
          // decimal type, count cast decimal(20,0)) in LEGACY mode,
          // cast to the avg result type. The left operand's type drives
          // the division's precision-loss adjustment (hence its rounding
          // scale), and Average divides the sum checked against the
          // CHILD type (p,s), not its widened (p+10,s) buffer — using
          // the buffer type here yields scale 7 instead of 17 on a
          // (27,6) measure, visibly truncating the quotient. Divides by
          // the NON-NULL count partial, never the row count; LEGACY
          // division yields NULL for an all-null group exactly as
          // Average does.
          case avg: Average =>
            val dt = avg.child.dataType match {
              case t: org.apache.spark.sql.types.DecimalType => t
              case _ => return None
            }
            for {
              sCol <- d.sums.get(avg.child.sql)
              cCol <- d.cnts.get(avg.child.sql)
            } yield {
              import org.apache.spark.sql.types.DecimalType
              val sumAgg = AggregateExpression(Sum(mvAttr(sCol)), ag.mode, isDistinct = false)
              val cntAgg = AggregateExpression(Sum(mvAttr(cCol)), ag.mode, isDistinct = false)
              Cast(
                Divide(Cast(sumAgg, dt),
                  Cast(cntAgg, DecimalType(20, 0)), EvalMode.LEGACY),
                ag.dataType)
            }
          case other =>
            val rewritten: Option[AggregateFunction] = other match {
              case Count(Seq(Literal(_, _))) | Count(Seq()) =>
                d.countCol.map(c => Sum(mvAttr(c)))
              case s: Sum if isExactType(s.child.dataType) =>
                d.sums.get(s.child.sql).map(c => Sum(mvAttr(c)))
              case m: Min => d.mins.get(m.child.sql).map(c => Min(mvAttr(c)))
              case m: Max => d.maxs.get(m.child.sql).map(c => Max(mvAttr(c)))
              case _ => None
            }
            rewritten.map { f =>
              val newAg = ag.copy(aggregateFunction = f)
              // sum-of-partials can widen (decimal(37,6) → 38,6): cast back,
              // exact because the value equals the original single-level sum
              if (newAg.dataType == ag.dataType) newAg
              else Cast(newAg, ag.dataType)
            }
        }
      }

      // outputs: rewrite each named expression, preserving name + exprId
      val newAe: Seq[Option[NamedExpression]] = ae.map {
        case a: Alias =>
          // manual recursion: transformDown would descend into the
          // REPLACEMENT and re-match the rewritten Sum(partial) against
          // the registry, which rightly fails
          def rewriteAggs(e: Expression): (Expression, Boolean) = e match {
            case ag: AggregateExpression =>
              matchAggregate(ag) match {
                case Some(n) => (n, false)
                case None => (ag, true)
              }
            case other =>
              var failed = false
              val kids = other.children.map { c =>
                val (n, f) = rewriteAggs(c); if (f) failed = true; n
              }
              (if (kids.isEmpty) other else other.withNewChildren(kids), failed)
          }
          val (step1, failed) = rewriteAggs(resolveExpr(a.child, sub))
          if (failed) None
          else mapDims(step1).map(e => Alias(e, a.name)(exprId = a.exprId))
        case ar: AttributeReference =>
          // grouping passthrough: the attr IS one of the grouping outputs
          val g = resolveExpr(ar, sub)
          dimFor(g).map(attr => Alias(attr, ar.name)(exprId = ar.exprId))
        case _ => None
      }
      if (newAe.exists(_.isEmpty)) {
        dbg("output not rewritable: " + ae.zip(newAe).collect { case (o, None) => o.toString })
        return None
      }

      val mvChild: LogicalPlan =
        filtersMapped.flatten.reduceOption(And) match {
          case Some(cond) => Filter(cond, mvRel)
          case None => mvRel
        }
      Some(Aggregate(groupAttrs.map(_._2), newAe.flatten, mvChild, None))
    }
  }
}
