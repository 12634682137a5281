package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Skyline (Pareto frontier) operator.
  *
  * "Best orders" with two competing criteria — highest price, earliest
  * date — has no single ORDER BY answer; the skyline is every row not
  * dominated by another (dominated = another row at least as good on
  * both axes and strictly better on one). The naive formulation is the
  * n² NOT EXISTS self-join (exactly what the DuckDB oracle runs — an
  * independent formulation); this operator uses the DISTRIBUTIVE
  * decomposition instead (VERDICT r6 #2): skyline(S) = skyline(∪ᵢ
  * skyline(Sᵢ)) over any partitioning of S, because a global survivor
  * can have no dominator anywhere — in particular not in its own
  * partition — so it survives its local pass, and the final pass
  * removes every cross-partition casualty.
  *
  * LOCAL PASS: each input partition sorts by (price DESC, date ASC)
  * and streams once — a row survives iff no strictly-higher-priced row
  * so far has an earlier-or-equal date AND it sits at its own price
  * run's minimum date (ties on both axes don't dominate each other and
  * all survive). Exact per-partition skyline, O(n/P log n/P) sort +
  * O(n/P) scan, zero shuffle. This is genuinely per-partition
  * imperative logic — the sanctioned `mapPartitions` case.
  *
  * FINAL PASS: the surviving candidates (≤ Σᵢ |skyline(Sᵢ)|, ~frontier
  * sized on real data) go through the sort-based per-price-MIN +
  * prefix-MIN reduction. Its unpartitioned window now runs over the
  * candidate set, never the corpus — the plan shape GraphSkylineSpec
  * pins. Worst case (fully anti-correlated axes) the frontier IS the
  * corpus and no algorithm compresses it; the local pass then degrades
  * to a no-op filter, not a failure.
  */
object Skyline {

  /** Pareto frontier of orders: maximize o_totalprice, minimize
    * o_orderdate. Ties kept (identical (price, date) pairs do not
    * dominate each other — dominance requires strict improvement). */
  def orderSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    skylineOf(Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_totalprice",
        to_date($"o_orderdate").as("o_orderdate")))
  }

  /** Distributive 2-D skyline core over (o_orderkey: bigint,
    * o_totalprice: double, o_orderdate: date) — exposed so the spec can
    * drive crafted partition layouts (ties crossing partition
    * boundaries, cross-partition dominance). */
  private[graft] def skylineOf(o: DataFrame): DataFrame = {
    val spark = o.sparkSession
    import spark.implicits._
    val epoch = lit("1970-01-01").cast("date")
    // epoch-day ints so the local pass streams primitives, not Rows
    val enc = o.select($"o_orderkey".cast("long").as("k"),
        $"o_totalprice".cast("double").as("p"),
        datediff($"o_orderdate", epoch).as("d"))
      .as[(Long, Double, Int)]
    val local = enc
      .sortWithinPartitions($"p".desc, $"d".asc)
      .mapPartitions { it =>
        // bestAbove: min date among rows with price STRICTLY above the
        // current price run; runMin: the current run's min date (its
        // first row, since dates ascend within a run)
        var bestAbove = Int.MaxValue
        var curPrice = Double.NaN
        var runMin = Int.MaxValue
        it.filter { case (_, p, d) =>
          if (p != curPrice) {
            bestAbove = math.min(bestAbove, runMin)
            curPrice = p
            runMin = d
          }
          // dominated iff a higher price reached an earlier-or-equal
          // date, or an equal price a strictly earlier one
          d < bestAbove && d == runMin
        }
      }
    val cand = local.toDF("k", "p", "d")
    // final pass: same per-price MIN + strict-prefix MIN as the classic
    // single-node reduction, but over the local survivors only
    val perPrice = cand.groupBy($"p").agg(min($"d").as("d_at"))
    val strictAbove = Window.orderBy($"p".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val stats = perPrice.withColumn("d_above", min($"d_at").over(strictAbove))
    cand.join(stats, Seq("p"))
      .filter(($"d_above".isNull || $"d_above" > $"d") && $"d_at" === $"d")
      .select($"k".as("o_orderkey"), $"p".as("o_totalprice"),
        date_add(epoch, $"d").as("o_orderdate"))
      .orderBy($"o_orderkey")
  }

  val orderSkylineSql: String =
    """SELECT b.o_orderkey, b.o_totalprice,
      |       CAST(b.o_orderdate AS DATE) AS o_orderdate
      |FROM orders b
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM orders a
      |  -- dominance on the DATE-truncated value, matching the engine
      |  -- side's to_date: raw timestamps would break ties the date
      |  -- comparison keeps
      |  WHERE a.o_totalprice >= b.o_totalprice
      |    AND CAST(a.o_orderdate AS DATE) <= CAST(b.o_orderdate AS DATE)
      |    AND (a.o_totalprice > b.o_totalprice
      |         OR CAST(a.o_orderdate AS DATE) < CAST(b.o_orderdate AS DATE)))
      |ORDER BY o_orderkey""".stripMargin
}
