package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** HyperLogLog distinct-count sketch per source (Flajolet, Fusy,
  * Gandouet & Meunier, "HyperLogLog: the analysis of a near-optimal
  * cardinality estimation algorithm", AofA 2007) — the cardinality
  * sibling of [[CountMin]] (frequency): fixed memory (m = 256
  * registers per source) regardless of vocabulary, and the sketch
  * MERGES by element-wise register MAX (sketch(A ∪ B) =
  * max(sketch(A), sketch(B)) — proven in HllSpec), which is what makes
  * it executor-partial-aggregation- and cross-shard-safe. Spark's own
  * `approx_count_distinct` is HLL++ behind an opaque binary buffer;
  * this keeps the REGISTER TABLE first-class so shards can persist,
  * union and re-estimate sketches incrementally — the reason a
  * pipeline rolls its own — and so a plain-SQL oracle can replay the
  * estimate bit-for-bit.
  *
  * Cross-engine exactness: the hash is the repo's md5 PRF discipline —
  * register = first 2 hex chars, rank input = next 15 hex chars
  * (60 bits); ρ (leading-zero bits + 1) is computed by STRING
  * arithmetic (ltrim zero-nibbles + a 16-way nibble CASE), all exact
  * integers. The harmonic sum Σ 2^(−ρ_j) is kept exact in units of
  * 2^(−61): each register contributes the BIGINT 2^(61−ρ_j) (empty
  * registers 2^61), summed wide. The estimate α·m²·2^61 / S is then
  * ONE correctly-rounded integer→double cast and one IEEE division —
  * the α·m²·2^61 numerator is a shared double literal rendered at
  * round-trip precision in both plans. Linear-counting fallback
  * (E ≤ 2.5m with empty registers) floors m·ln(m/V₀) at the same
  * integer boundary in both engines (the e9-ln discipline's accepted
  * residual risk).
  *
  * Scale shape: one (source, register)-keyed MAX aggregate over the
  * token stream — map-side combined, ≤ #sources·m rows shuffle no
  * matter the corpus. The true-distinct audit column is the one
  * corpus-keyed shuffle; it exists so the gate is self-auditing (like
  * CountMin's one-sided check) and is the column a 100 TB deployment
  * drops.
  */
object Hll {

  val Registers = 256 // p = 8 index bits
  /** α_256 · 256² · 2^61 — the shared estimate numerator (see scaladoc). */
  val AlphaNumerator: Double =
    0.7213 / (1.0 + 1.079 / Registers) * Registers.toDouble * Registers.toDouble *
      java.lang.Math.pow(2.0, 61)

  private def h(tok: Column): Column = md5(concat(lit("hll|"), tok))

  private[graft] def regCol(tok: Column): Column =
    conv(substring(h(tok), 1, 2), 16, 10).cast("int")

  /** ρ ∈ 1..61: leading-zero bits of the 60-bit tail + 1, by string
    * arithmetic on the hex nibbles (exact in any engine). */
  private[graft] def rhoCol(tok: Column): Column = {
    val tail = substring(h(tok), 3, 15)
    val trimmed = ltrim(tail, "0")
    val z = lit(15) - length(trimmed) // whole zero nibbles
    val nib = when(substring(trimmed, 1, 1) === "1", 3)
      .when(substring(trimmed, 1, 1).isin("2", "3"), 2)
      .when(substring(trimmed, 1, 1).isin("4", "5", "6", "7"), 1)
      .otherwise(0)
    when(length(trimmed) === 0, lit(61)).otherwise(z * 4 + nib + 1)
  }

  /** Scalar sketch form — `struct(reg, rho)` for one value — the
    * SQL-surface building block (registered as `hll_sketch`): a
    * SQL-first user builds the register table with plain
    * `GROUP BY source, s.reg → MAX(s.rho)` and merges shards by the
    * same MAX, no Scala API needed. */
  def sketchCol(tok: Column): Column =
    struct(regCol(tok).as("reg"), rhoCol(tok).as("rho"))

  /** Per-source register table (source, reg, r) — the persistable,
    * mergeable sketch state. */
  private[graft] def registersOf(toks: DataFrame): DataFrame = {
    import toks.sparkSession.implicits._
    toks.select($"source", regCol($"tok").as("reg"), rhoCol($"tok").as("rho"))
      .groupBy($"source", $"reg").agg(max($"rho").as("r"))
  }

  /** One row per source: token mass, register occupancy, the HLL
    * estimate, and the true distinct count as the audit column. */
  def distinctSketch(spark: SparkSession, sfDir: String): DataFrame =
    distinctSketchOf(Tables.documents(spark, sfDir)
      .select(col("source"), explode(
        regexp_extract_all(lower(col("text")), lit("[a-z0-9]+"), lit(0))).as("tok")))

  /** Same, over any (source, tok) frame — the testable core. */
  def distinctSketchOf(toks: DataFrame): DataFrame = {
    val spark = toks.sparkSession
    import spark.implicits._
    val regs = registersOf(toks)
    // exact harmonic sum in 2^-61 units: Σ 2^(61-r) over present
    // registers + 2^61 per empty register; decimal-routed (≤ 2^69)
    val sums = regs.groupBy($"source").agg(
      count(lit(1)).as("regs_used"),
      sum(expr("CAST(shiftleft(CAST(1 AS BIGINT), CAST(61 - r AS INT)) AS DECIMAL(38,0))"))
        .as("s_present"))
      .select($"source", $"regs_used",
        ($"s_present" + (lit(Registers) - $"regs_used").cast("decimal(38,0)")
          * lit(2305843009213693952L).cast("decimal(38,0)")).as("s"))
    val eRaw = lit(AlphaNumerator) / $"s".cast("double")
    val zeros = lit(Registers) - $"regs_used"
    val est = when(eRaw <= lit(2.5 * Registers) && zeros > 0,
      floor(lit(Registers.toDouble) *
        log(lit(Registers.toDouble) / zeros.cast("double"))))
      .otherwise(floor(eRaw)).cast("long")
    val truth = toks.groupBy($"source").agg(
      count(lit(1)).as("n_tokens"),
      countDistinct($"tok").as("n_distinct"))
    truth.join(sums, "source")
      .select($"source", $"n_tokens".cast("long").as("n_tokens"),
        $"n_distinct".cast("long").as("n_distinct"),
        est.as("hll_est"), $"regs_used".cast("long").as("regs_used"))
      .orderBy($"source")
  }

  /** DuckDB replay: identical PRF, identical string-arithmetic ρ,
    * identical exact harmonic sum (HUGEINT) and the same double
    * numerator literal. */
  def distinctSketchSql(): String = {
    val alphaLit = java.lang.Double.toString(AlphaNumerator)
    s"""WITH t AS (
       |  SELECT source, unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS tok
       |  FROM documents),
       |hashed AS (
       |  SELECT source, tok, md5('hll|' || tok) AS h FROM t),
       |rr AS (
       |  SELECT source,
       |         CAST(('0x' || substr(h, 1, 2)) AS BIGINT) AS reg,
       |         CASE WHEN length(ltrim(substr(h, 3, 15), '0')) = 0 THEN 61
       |              ELSE (15 - length(ltrim(substr(h, 3, 15), '0'))) * 4
       |                   + CASE substr(ltrim(substr(h, 3, 15), '0'), 1, 1)
       |                       WHEN '1' THEN 3
       |                       WHEN '2' THEN 2 WHEN '3' THEN 2
       |                       WHEN '4' THEN 1 WHEN '5' THEN 1
       |                       WHEN '6' THEN 1 WHEN '7' THEN 1
       |                       ELSE 0 END + 1 END AS rho
       |  FROM hashed),
       |regs AS (SELECT source, reg, max(rho) AS r FROM rr GROUP BY 1, 2),
       |sums AS (
       |  SELECT source, COUNT(*) AS regs_used,
       |         SUM(CAST(1 AS BIGINT) << (61 - r))
       |           + ($Registers - COUNT(*))
       |             * CAST(CAST(1 AS BIGINT) << 61 AS HUGEINT) AS s
       |  FROM regs GROUP BY 1),
       |truth AS (
       |  SELECT source, COUNT(*) AS n_tokens, COUNT(DISTINCT tok) AS n_distinct
       |  FROM t GROUP BY 1)
       |SELECT tr.source, CAST(tr.n_tokens AS BIGINT) AS n_tokens,
       |       CAST(tr.n_distinct AS BIGINT) AS n_distinct,
       |       CAST(CASE WHEN $alphaLit / CAST(su.s AS DOUBLE) <= ${2.5 * Registers}
       |                  AND su.regs_used < $Registers
       |             THEN floor($Registers.0 *
       |                    ln($Registers.0 / CAST($Registers - su.regs_used AS DOUBLE)))
       |             ELSE floor($alphaLit / CAST(su.s AS DOUBLE)) END AS BIGINT)
       |         AS hll_est,
       |       CAST(su.regs_used AS BIGINT) AS regs_used
       |FROM truth tr JOIN sums su ON su.source = tr.source
       |ORDER BY tr.source""".stripMargin
  }
}
