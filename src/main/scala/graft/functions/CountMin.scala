package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Count-Min sketch over the corpus token stream (Cormode &
  * Muthukrishnan, "An Improved Data Stream Summary: The Count-Min
  * Sketch and its Applications", J. Algorithms 2005) — the
  * fixed-memory frequency summary a 100 TB pipeline keeps when exact
  * per-token counts are too wide to materialize: depth×width cells
  * regardless of vocabulary, point queries overestimate-only, and the
  * summary MERGES by cell-wise addition (sketch(A ∪ B) =
  * sketch(A) + sketch(B) — proven in CountMinSpec, which is what makes
  * it executor-partial-aggregation- and cross-shard-safe).
  *
  * Hashing is the repo's cross-engine discipline (md5-prefix mod W,
  * salted per depth row), so the sketch — and therefore the gate — is
  * deterministic and replayed exactly by the DuckDB oracle: build is
  * ONE map-side-combined shuffle of depth rows per token instance into
  * depth·width cells; estimates are a broadcast-sized lookup.
  */
object CountMin {

  val Depth = 4
  val Width = 256

  private def bucket(tok: org.apache.spark.sql.Column,
      d: Int): org.apache.spark.sql.Column =
    conv(substring(md5(concat(lit(s"cm$d|"), tok)), 1, 15), 16, 10)
      .cast("long") % Width

  private def tokens(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .select(explode(
        regexp_extract_all(lower($"text"), lit("[a-z0-9]+"), lit(0))).as("tok"))
  }

  /** The sketch itself: (d, b, cnt) cells — depth·width rows. */
  private[graft] def sketchOf(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    toks.select(posexplode(array((0 until Depth).map(d =>
        bucket($"tok", d)): _*)).as(Seq("d", "b")))
      .groupBy($"d", $"b").agg(count(lit(1)).as("cnt"))
  }

  /** Point-query audit: the top-n true tokens vs their CMS estimates.
    * `cms_est >= true_cnt` always (one-sided error — asserted in the
    * output so a broken hash shows as a false row, not a silent skew);
    * the gap is the collision mass the width bounds in expectation. */
  def estimateQuery(spark: SparkSession, sfDir: String,
      topN: Int = 20): DataFrame = {
    import spark.implicits._
    val toks = tokens(spark, sfDir)
    val sketch = sketchOf(toks)
    val top = toks.groupBy($"tok").agg(count(lit(1)).as("true_cnt"))
      .orderBy($"true_cnt".desc, $"tok").limit(topN)
    // estimate = min over depth rows of the addressed cell
    val est = top
      .select($"tok", $"true_cnt", posexplode(array((0 until Depth).map(d =>
        bucket($"tok", d)): _*)).as(Seq("d", "b")))
      .join(broadcast(sketch), Seq("d", "b"))
      .groupBy($"tok", $"true_cnt").agg(min($"cnt").as("cms_est"))
      .select($"tok", $"true_cnt", $"cms_est",
        ($"cms_est" >= $"true_cnt").as("one_sided"))
      .orderBy($"tok")
    est
  }

  def estimateQuerySql(topN: Int = 20): String = {
    def b(tokExpr: String, d: Int) =
      s"CAST(('0x' || substr(md5('cm$d|' || $tokExpr), 1, 15)) AS BIGINT) % $Width"
    val cellUnion = (0 until Depth).map(d =>
      s"SELECT $d AS d, ${b("tok", d)} AS b FROM t").mkString(" UNION ALL ")
    val probeUnion = (0 until Depth).map(d =>
      s"SELECT tok, true_cnt, $d AS d, ${b("tok", d)} AS b FROM top")
      .mkString(" UNION ALL ")
    s"""WITH t AS (
       |  SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
       |  FROM documents),
       |cells AS ($cellUnion),
       |sketch AS MATERIALIZED (SELECT d, b, count(*) AS cnt FROM cells GROUP BY d, b),
       |top AS MATERIALIZED (
       |  SELECT tok, count(*) AS true_cnt FROM t GROUP BY tok
       |  ORDER BY true_cnt DESC, tok LIMIT $topN),
       |probes AS ($probeUnion)
       |SELECT p.tok, CAST(p.true_cnt AS BIGINT) AS true_cnt,
       |       CAST(min(s.cnt) AS BIGINT) AS cms_est,
       |       min(s.cnt) >= p.true_cnt AS one_sided
       |FROM probes p JOIN sketch s ON s.d = p.d AND s.b = p.b
       |GROUP BY p.tok, p.true_cnt ORDER BY p.tok""".stripMargin
  }
}
