package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window}

/** In-band backstop for the sanctioned-global-window catalogue (r10
  * ADVICE on [[graft.GraftSession.muteSanctionedWindowWarns]]): the
  * WindowExec "No Partition Defined" WARN is suppressed process-wide,
  * so this audit re-creates the tripwire INSIDE the correctness gate —
  * Verify walks every gated query's optimized logical plan and fails
  * the query if it carries more `partitionBy()`-less Window nodes than
  * SCALE.md's closed catalogue sanctions for it. A new global window
  * on the registered surface therefore cannot ride in silently behind
  * the muted logger: it deletes its own verify output and the round
  * goes red until the site is bounded, documented in SCALE.md, and
  * added here.
  *
  * The counts mirror SCALE.md "Sanctioned global windows" — every
  * entry is a dim-/resolution-/k-bounded frame, never corpus rows.
  *
  * Known blind spot (r11 ADVICE): an EAGER `localCheckpoint` truncates
  * lineage, so a partitionless Window upstream of a checkpoint never
  * appears in the post-checkpoint optimized plan this audit walks.
  * Checkpoint sites on the gated surface therefore route through
  * [[checkpointAudited]], which audits the frame's own plan BEFORE
  * truncating it; a new checkpoint call on a gated path should do the
  * same rather than calling `localCheckpoint` directly. */
object WindowAudit {

  /** query name -> max sanctioned partitionless Window nodes in its
    * OPTIMIZED logical plan. Queries absent from the map are sanctioned
    * for zero.
    *
    * The counts encode the CURRENT optimizer's Window collapse/fold
    * behavior (e.g. q_tpch_q15's `partitionBy(lit(1))` folds to an
    * empty partition spec; q_quality_report's 6 arrive by dim
    * composition). A Spark upgrade that merges or splits Window nodes
    * flips the exact-equality checks red with a message naming the
    * QUERY — the fix then is to re-enumerate the catalogue
    * (`SPARK_GRAFT_WINDOW_AUDIT=warn` run, read the stderr counts),
    * not to hunt for a query regression. */
  val Sanctioned: Map[String, Int] = Map(
    // date spine SK — calendar-days-bounded (GoldDims.scala:38)
    "q_dim_date" -> 1,
    // zone dim SK — catalog-sized (GoldDims.scala:103)
    "q_dim_zone" -> 1,
    // warehouse-wide dbt checks read BOTH dims (their SK windows
    // arrive by composition: 2× date spine + zone + downstream reuse)
    "q_quality_report" -> 6,
    // trailing z-score over the one-row-per-day aggregate (mean + std
    // frames — TimeSeries.scala:28)
    "q_ts_anomaly" -> 2,
    // dominance-pruned pareto candidates (Skyline.scala:87)
    "q_skyline" -> 1,
    // Q15's max over PER-SUPPLIER revenue — supplier-count-bounded;
    // written partitionBy(lit(1)), which the optimizer folds to an
    // empty partition spec (TpchSuite.scala:421)
    "q_tpch_q15" -> 1,
    // fixed-bin score-histogram ranks (QualityModel.scala:306,338)
    "q_roc_auc" -> 1,
    "q_pr_curve" -> 1,
    // the composed card's quality_auc section IS rocAuc — same
    // resolution-bounded histogram cumsum (DataCard.scala)
    "q_data_card" -> 1,
    // per-query k-row candidate tails (Retrieval.scala:158-260)
    "q_retrieval_metrics" -> 3,
    "q_hybrid_search" -> 2)

  /** Partitionless Window nodes in the plan, subquery plans included. */
  def globalWindows(plan: LogicalPlan): Int = {
    def count(p: LogicalPlan): Int =
      p.collect {
        case w: Window if w.partitionSpec.isEmpty => 1
      }.sum + p.collect { case n => n }
        .flatMap(_.subqueries).map(count).sum
    count(plan)
  }

  /** Audited replacement for eager `localCheckpoint` on gated paths:
    * asserts the frame plans ZERO partitionless windows, then
    * checkpoints. Closes the lineage-truncation blind spot — a global
    * window hidden above a checkpoint fails HERE, at construction,
    * instead of riding invisibly past [[assertSanctioned]]. No
    * checkpointed intermediate currently needs a global window; a
    * future one must be bounded and catalogued per-site, not waved
    * through. */
  def checkpointAudited(site: String, df: DataFrame): DataFrame = {
    val n = globalWindows(df.queryExecution.optimizedPlan)
    if (n > 0)
      throw new IllegalStateException(
        s"window audit: checkpoint site $site plans $n global window(s) " +
          "upstream of localCheckpoint — invisible to the per-query " +
          "audit; bound the frame or catalogue the site " +
          "(WindowAudit.checkpointAudited)")
    df.localCheckpoint(eager = true)
  }

  /** Fail `name` if it plans more global windows than sanctioned.
    * SPARK_GRAFT_WINDOW_AUDIT=warn downgrades to stderr (catalogue
    * (re)enumeration runs). */
  def assertSanctioned(name: String, df: DataFrame): Unit = {
    val n = globalWindows(df.queryExecution.optimizedPlan)
    val allowed = Sanctioned.getOrElse(name, 0)
    if (n > allowed) {
      val msg = s"window audit: $name plans $n global window(s), " +
        s"sanctioned $allowed — bound the frame or catalogue it " +
        "(SCALE.md 'Sanctioned global windows' + WindowAudit.Sanctioned)"
      if (sys.env.get("SPARK_GRAFT_WINDOW_AUDIT").contains("warn"))
        System.err.println(s"[window-audit] $msg")
      else throw new IllegalStateException(msg)
    }
  }
}
