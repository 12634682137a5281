package graft.functions

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** PII detection and redaction — the compliance pass every
  * training-data pipeline runs before a corpus ships.
  *
  * Five pattern families (email, US-style phone, IPv4, SSN, credit
  * card), each detected with `regexp_extract_all` and redacted with
  * `regexp_replace` in a FIXED order (longest/most-specific first) so
  * overlapping candidates resolve identically everywhere. All patterns
  * are RE2-safe (no lookarounds, no backreferences) so the Spark (Java
  * regex) and DuckDB (RE2) engines agree match-for-match.
  *
  * Scale: a narrow per-row projection over the scan — no shuffle, no
  * state; at 100 TB this pass is embarrassingly parallel and IO-bound.
  * The redacted text itself never leaves the executors in the gated
  * query — only its md5, which pins the whole transform bit-for-bit.
  *
  * The synthetic documents table contains no natural PII (word-salad
  * text), so the gated query plants deterministic PII derived from
  * doc_id — both engines apply the same injection, then the scan and
  * redaction are verified end-to-end on text that actually exercises
  * every pattern.
  */
object Pii {

  /** Redaction order is part of the contract: credit card before
    * phone/SSN (so a 4-4-4-4 run is consumed whole), email before
    * IPv4 (domains can contain dotted digits). */
  val patterns: Seq[(String, String, String)] = Seq(
    // (name, regex, replacement token)
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("cc", "\\b\\d{4}-\\d{4}-\\d{4}-\\d{4}\\b", "<CC>"),
    ("ssn", "\\b\\d{3}-\\d{2}-\\d{4}\\b", "<SSN>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Per-family match count columns, each computed on the text AFTER
    * the earlier families have been redacted — so counts honor the same
    * precedence as [[redact]] and always agree with the redacted
    * output. (Counting every family on the raw text would double-count
    * overlaps: "x@10.0.0.7.net" is one email and zero IPs, because the
    * email pattern consumes the dotted quad first.) */
  def counts(textCol: Column): Seq[Column] = {
    var cur = textCol
    patterns.map { case (name, re, token) =>
      val c = size(regexp_extract_all(cur, lit(re), lit(0))).as(s"n_$name")
      cur = regexp_replace(cur, re, token)
      c
    }
  }

  /** Apply every redaction in the declared order. */
  def redact(textCol: Column): Column =
    patterns.foldLeft(textCol) { case (c, (_, re, token)) =>
      regexp_replace(c, re, token)
    }

  /** Generic scan: input rows + per-family counts + a has_pii flag +
    * the redacted text. Callers drop `redacted` when only flagging. */
  def scan(df: DataFrame, textCol: Column): DataFrame = {
    val cnts = counts(textCol)
    df.select((col("*") +: cnts): _*)
      .withColumn("has_pii",
        patterns.map(p => col(s"n_${p._1}") > 0).reduce(_ || _))
      .withColumn("redacted", redact(textCol))
  }

  // ---- gated demo query ---------------------------------------------------

  /** Deterministic PII injection: every doc gets an email; phone / ipv4
    * / ssn / cc appear on residue classes of doc_id so the corpus mixes
    * zero-, one- and many-hit rows. Kept in lockstep with
    * [[piiScanSql]]. */
  private def inject(spark: SparkSession): Column = {
    import spark.implicits._
    val id = $"doc_id"
    concat(
      $"text",
      lit(" contact user"), id.cast("string"), lit("@example.com"),
      when(id % 3 === 0,
        concat(lit(" call 555-"), lpad((id % 1000).cast("string"), 3, "0"),
          lit("-1234"))).otherwise(lit("")),
      when(id % 5 === 0,
        concat(lit(" from 10.0."), (id % 256).cast("string"), lit(".17")))
        .otherwise(lit("")),
      when(id % 7 === 0,
        concat(lit(" ssn 123-45-"), lpad((id % 10000).cast("string"), 4, "0")))
        .otherwise(lit("")),
      when(id % 11 === 0,
        concat(lit(" card 4111-1111-1111-"),
          lpad((id % 10000).cast("string"), 4, "0"))).otherwise(lit("")))
  }

  /** Gated query: plant PII, scan, redact; emit counts + md5(redacted)
    * so the oracle pins the full redaction without shipping the text. */
  def piiScan(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val planted = Tables.documents(spark, sfDir)
      .select($"doc_id", inject(spark).as("pii_text"))
    scan(planted, $"pii_text")
      .select($"doc_id", $"n_email", $"n_cc", $"n_ssn", $"n_phone", $"n_ipv4",
        $"has_pii", md5($"redacted").as("redacted_md5"))
      .orderBy($"doc_id")
  }

  val piiScanSql: String = {
    val injected =
      """text || ' contact user' || CAST(doc_id AS VARCHAR) || '@example.com'
        | || CASE WHEN doc_id % 3 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') || '-1234' ELSE '' END
        | || CASE WHEN doc_id % 5 = 0 THEN ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.17' ELSE '' END
        | || CASE WHEN doc_id % 7 = 0 THEN ' ssn 123-45-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END
        | || CASE WHEN doc_id % 11 = 0 THEN ' card 4111-1111-1111-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ELSE '' END"""
        .stripMargin.replace("\n", "")
    // counts mirror the Scala side: family k counts on the text with
    // families 1..k-1 already redacted (precedence-aware)
    var cur = "pii_text"
    val cnt = patterns.map { case (name, re, token) =>
      val c = s"CAST(len(regexp_extract_all($cur, '$re')) AS INTEGER) AS n_$name"
      cur = s"regexp_replace($cur, '$re', '$token', 'g')"
      c
    }.mkString(",\n       ")
    val redacted = patterns.foldLeft("pii_text") { case (expr, (_, re, token)) =>
      s"regexp_replace($expr, '$re', '$token', 'g')"
    }
    val hasPii = patterns.map(p => s"n_${p._1} > 0").mkString(" OR ")
    s"""WITH planted AS (
       |  SELECT doc_id, $injected AS pii_text FROM documents),
       |scanned AS (
       |  SELECT doc_id,
       |       $cnt,
       |       md5($redacted) AS redacted_md5
       |  FROM planted)
       |SELECT doc_id, n_email, n_cc, n_ssn, n_phone, n_ipv4,
       |       ($hasPii) AS has_pii, redacted_md5
       |FROM scanned
       |ORDER BY doc_id""".stripMargin
  }

  // ---- k-anonymity audit -------------------------------------------------

  /** k-anonymity violations over a quasi-identifier combination
    * (nation, market segment, account-balance band): any combination
    * shared by fewer than k individuals can re-identify them, and a
    * release pipeline must suppress or generalize those rows first.
    * This is the audit that finds them — the complement of [[scan]],
    * which catches DIRECT identifiers; quasi-identifiers leak through
    * joins with outside data even with every direct field redacted.
    *
    * Scale: one map-side-combined group-by; output is bounded by the
    * attribute cross product (|nations|·|segments|·|bands|), never the
    * row count — the same shape at 1 500 or 150 B customers. */
  def kAnonymity(spark: SparkSession, sfDir: String, k: Int = 5): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .select($"c_nationkey", $"c_mktsegment",
        floor($"c_acctbal" / 1000.0).cast("long").as("acctbal_band"))
      .groupBy($"c_nationkey", $"c_mktsegment", $"acctbal_band")
      .agg(count(lit(1)).as("n_members"))
      .filter($"n_members" < k)
      .orderBy($"c_nationkey", $"c_mktsegment", $"acctbal_band")
  }

  def kAnonymitySql(k: Int = 5): String =
    s"""SELECT c_nationkey, c_mktsegment,
       |       CAST(floor(c_acctbal / 1000.0) AS BIGINT) AS acctbal_band,
       |       COUNT(*) AS n_members
       |FROM customer
       |GROUP BY 1, 2, 3
       |HAVING COUNT(*) < $k
       |ORDER BY c_nationkey, c_mktsegment, acctbal_band""".stripMargin

  // ---- l-diversity audit -------------------------------------------------

  /** l-diversity violations (Machanavajjhala et al., ICDE 2006): a
    * quasi-identifier group can pass k-anonymity (enough members) yet
    * still leak its SENSITIVE attribute if every member shares the
    * same value — an attacker who locates someone's group learns the
    * value without identifying the row. The audit reports groups whose
    * distinct-sensitive-value count is below l (here: the order-priority
    * mix of each customer (nation, segment) cohort, via the customer⋈
    * orders join — a group where everyone's orders are URGENT is
    * homogeneity the release must generalize away).
    *
    * Scale: the join shuffles on custkey once (the fact side's natural
    * key), then one map-side-combined two-level group-by; output is
    * bounded by the quasi-identifier cross product, never row count. */
  def lDiversity(spark: SparkSession, sfDir: String, l: Int = 3): DataFrame = {
    import spark.implicits._
    Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment")
      .join(Tables.orders(spark, sfDir)
        .select($"o_custkey".as("c_custkey"), $"o_orderpriority"), "c_custkey")
      .groupBy($"c_nationkey", $"c_mktsegment")
      .agg(countDistinct($"o_orderpriority").as("n_sensitive"),
        count(lit(1)).as("n_rows"))
      // full audit report, not just the kill list: the verdict column
      // keeps the gate value-rich on corpora where every cohort passes
      .select($"c_nationkey", $"c_mktsegment", $"n_sensitive", $"n_rows",
        ($"n_sensitive" >= l).as("l_diverse"))
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  def lDiversitySql(l: Int = 3): String =
    s"""SELECT c.c_nationkey, c.c_mktsegment,
       |       COUNT(DISTINCT o.o_orderpriority) AS n_sensitive,
       |       COUNT(*) AS n_rows,
       |       COUNT(DISTINCT o.o_orderpriority) >= $l AS l_diverse
       |FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey
       |GROUP BY 1, 2
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ---- t-closeness audit ---------------------------------------------------

  /** t-closeness threshold for the gate: a group passes when its
    * sensitive-value distribution sits within total-variation distance
    * 0.2 of the global one. */
  val TCloseE9 = 200000000L

  /** t-closeness audit (Li, Li & Venkatasubramanian, ICDE 2007) — the
    * privacy trio's third member: [[kAnonymity]] bounds group SIZE,
    * [[lDiversity]] bounds sensitive-value COUNT, and this bounds the
    * sensitive-value DISTRIBUTION — an l-diverse group still leaks when
    * its value mix differs sharply from the corpus (an attacker's
    * posterior moves by the gap). Reports, per quasi-identifier group
    * (nation, market segment), the total-variation distance between the
    * group's order-priority distribution and the global one:
    * TVD = ½ Σ_v |n_gv/n_g − n_v/n|, carried as the exact integer
    * rational ⌊1e9·Σ_v|n_gv·n − n_v·n_g| / (2·n_g·n)⌋ so both engines
    * agree bit-for-bit (the 1e9 product routes through decimal(38,0) /
    * HUGEINT — n_gv·n alone reaches 2^53 at warehouse row counts).
    *
    * Absent values matter: a group missing a globally-common value is
    * FAR from the corpus, so the group×value frame is the full cross
    * product (groups × distinct sensitive values, both dimension-sized)
    * with absent cells restored as n_gv = 0 before the distance sum.
    *
    * Scale: one custkey shuffle for the fact join (same as
    * [[lDiversity]]), then every frame is bounded by the attribute
    * cross product — the cell table, the cross join (broadcast), and
    * the distance agg never see row-count-sized data. */
  def tCloseness(spark: SparkSession, sfDir: String,
      tE9: Long = TCloseE9): DataFrame = {
    import spark.implicits._
    val cells = Tables.customer(spark, sfDir)
      .select($"c_custkey", $"c_nationkey", $"c_mktsegment")
      .join(Tables.orders(spark, sfDir)
        .select($"o_custkey".as("c_custkey"), $"o_orderpriority"), "c_custkey")
      .groupBy($"c_nationkey", $"c_mktsegment", $"o_orderpriority")
      .agg(count(lit(1)).as("n_gv"))
    val groups = cells.groupBy($"c_nationkey", $"c_mktsegment")
      .agg(sum($"n_gv").cast("long").as("n_g"))
    val values = cells.groupBy($"o_orderpriority")
      .agg(sum($"n_gv").cast("long").as("n_v"))
    val total = values.agg(sum($"n_v").cast("long").as("n"))
    groups.crossJoin(broadcast(values)).crossJoin(broadcast(total))
      .join(cells, Seq("c_nationkey", "c_mktsegment", "o_orderpriority"),
        "left")
      .na.fill(0L, Seq("n_gv"))
      .groupBy($"c_nationkey", $"c_mktsegment")
      // n_gv·n reaches 2^63 once tables hit ~3B rows — route the inner
      // products through decimal(38,0) (HUGEINT in the oracle) so both
      // engines stay exact instead of one wrapping and one erroring
      .agg(first($"n_g").as("n_rows"),
        sum(abs($"n_gv".cast("decimal(38,0)") * $"n"
          - $"n_v".cast("decimal(38,0)") * $"n_g")).as("num"),
        first($"n").as("n"))
      .select($"c_nationkey", $"c_mktsegment", $"n_rows",
        expr("cast((cast(num as decimal(38,0)) * 1000000000)" +
          " div (cast(2 as decimal(38,0)) * n_rows * n) as bigint)")
          .as("tvd_e9"))
      .withColumn("t_close", $"tvd_e9" <= tE9)
      .orderBy($"c_nationkey", $"c_mktsegment")
  }

  def tClosenessSql(tE9: Long = TCloseE9): String =
    s"""WITH joined AS (
       |  SELECT c.c_nationkey, c.c_mktsegment, o.o_orderpriority
       |  FROM customer c JOIN orders o ON o.o_custkey = c.c_custkey),
       |cells AS (
       |  SELECT c_nationkey, c_mktsegment, o_orderpriority,
       |         CAST(COUNT(*) AS BIGINT) AS n_gv
       |  FROM joined GROUP BY 1, 2, 3),
       |grp AS (
       |  SELECT c_nationkey, c_mktsegment, CAST(SUM(n_gv) AS BIGINT) AS n_g
       |  FROM cells GROUP BY 1, 2),
       |vals AS (
       |  SELECT o_orderpriority, CAST(SUM(n_gv) AS BIGINT) AS n_v
       |  FROM cells GROUP BY 1),
       |tot AS (SELECT CAST(SUM(n_v) AS BIGINT) AS n FROM vals),
       |crossed AS (
       |  SELECT g.c_nationkey, g.c_mktsegment, g.n_g, v.o_orderpriority,
       |         v.n_v, t.n, COALESCE(c.n_gv, 0) AS n_gv
       |  FROM grp g CROSS JOIN vals v CROSS JOIN tot t
       |  LEFT JOIN cells c
       |    ON c.c_nationkey = g.c_nationkey
       |   AND c.c_mktsegment = g.c_mktsegment
       |   AND c.o_orderpriority = v.o_orderpriority),
       |dist AS (
       |  SELECT c_nationkey, c_mktsegment, n_g AS n_rows,
       |         SUM(ABS(CAST(n_gv AS HUGEINT) * n
       |                 - CAST(n_v AS HUGEINT) * n_g)) AS num,
       |         ANY_VALUE(n) AS n
       |  FROM crossed GROUP BY 1, 2, n_g)
       |SELECT c_nationkey, c_mktsegment, n_rows,
       |       CAST((num * 1000000000)
       |            // (CAST(2 AS HUGEINT) * n_rows * n) AS BIGINT) AS tvd_e9,
       |       (num * 1000000000) // (CAST(2 AS HUGEINT) * n_rows * n)
       |         <= $tE9 AS t_close
       |FROM dist
       |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  // ---- differential privacy: noisy count release -------------------------

  /** ε for the released per-language counts; sensitivity is 1 (each
    * document contributes to exactly one language cell). */
  val DpEpsilon = 1.0
  private val DpAlpha = math.exp(-DpEpsilon)
  private val DpMaxK = 40

  /** CDF grid F(−40)…F(39) of the two-sided geometric ("discrete
    * Laplace") distribution P(K = k) ∝ α^|k| — the ε-DP mechanism for
    * integer counts (Ghosh–Roughgarden–Sundararajan's universally
    * optimal mechanism). Truncation at ±40 discards ~4e−18 of the
    * mass — below one ulp of any reachable uniform, so the inverse-CDF
    * lookup below is exact over every possible input. */
  private[graft] val DpCdf: Array[Double] = {
    val p0 = (1 - DpAlpha) / (1 + DpAlpha)
    var acc = math.pow(DpAlpha, DpMaxK + 1) / (1 + DpAlpha) // F(−41)
    (-DpMaxK until DpMaxK).toArray
      .map { k => acc += p0 * math.pow(DpAlpha, math.abs(k)); acc }
  }

  /** ε-differentially-private per-language document counts: true count
    * plus two-sided geometric noise, clamped at zero for release.
    *
    * The noise is DETERMINISTIC — a salted md5-uniform per cell pushed
    * through the inverse CDF — which is what makes the query gateable
    * AND is the production-correct choice: a rerun (or a retry after a
    * failure) must not spend fresh privacy budget re-randomizing the
    * same release, so real systems derive noise from a keyed PRF over
    * the cell identity exactly like this; rotating `salt` is the new
    * privacy spend. Cross-engine exactness is by construction: the CDF
    * grid is computed ONCE here and embedded as the same 80 double
    * literals in both engines, u is one IEEE division of the shared
    * 60-bit hash, and the lookup is pure comparisons — the oracle
    * replays the mechanism, never re-derives exp().
    *
    * The gate emits `n_true` alongside the release for auditability;
    * a production release drops that column. Scale: one
    * map-side-combined groupBy to cells, then per-cell O(80)
    * comparisons — nothing beyond the count shuffle at any corpus
    * size. */
  def dpRelease(spark: SparkSession, sfDir: String,
      salt: String = "dp_v1"): DataFrame = {
    import spark.implicits._
    // coalesce BEFORE the PRF, identically in both engines: concat_ws
    // SKIPS a NULL lang (PRF over the salt alone) while DuckDB's `||`
    // NULL-propagates through md5 and degenerates the noise to -DpMaxK
    // — a NULL-lang cell would hash-diverge (ADVICE r7). '<null>' is a
    // well-defined cell key, so a NULL group still gets proper noise.
    val u = Dedup.hash60(concat_ws("|",
        coalesce($"lang", lit("<null>")), lit(salt))).cast("double") /
      lit(1152921504606846976L).cast("double") // / 2^60 → uniform [0,1)
    val noise = (size(filter(array(DpCdf.map(lit(_)).toSeq: _*),
      t => u >= t)) - DpMaxK).cast("long")
    Tables.documents(spark, sfDir)
      .groupBy($"lang").agg(count(lit(1)).as("n_true"))
      .select($"lang", $"n_true", noise.as("noise"),
        greatest($"n_true" + noise, lit(0L)).as("n_released"),
        lit(DpEpsilon).as("epsilon"))
      .orderBy($"lang")
  }

  def dpReleaseSql(salt: String = "dp_v1"): String = {
    val grid = DpCdf.map(_.toString).mkString(", ")
    s"""WITH cnt AS (
       |  SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_true
       |  FROM documents GROUP BY 1),
       |withu AS (
       |  SELECT lang, n_true,
       |         CAST(CAST(('0x' || substr(md5(coalesce(lang, '<null>') || '|' || ${Sql.lit(salt)}), 1, 15))
       |              AS BIGINT) AS DOUBLE)
       |           / CAST(1152921504606846976 AS DOUBLE) AS u
       |  FROM cnt),
       |noised AS (
       |  SELECT lang, n_true,
       |         CAST(len(list_filter([$grid], t -> u >= t)) AS BIGINT)
       |           - $DpMaxK AS noise
       |  FROM withu)
       |SELECT lang, n_true, noise,
       |       greatest(n_true + noise, 0) AS n_released,
       |       CAST($DpEpsilon AS DOUBLE) AS epsilon
       |FROM noised
       |ORDER BY lang""".stripMargin
  }
}
