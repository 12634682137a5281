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
  * independent formulation); for the 2D case this operator uses the
  * classic sort-based reduction instead: a row survives iff no
  * strictly-higher-price row has an earlier-or-equal date and no
  * equal-price row has a strictly earlier date, both of which fall out
  * of one per-distinct-price MIN plus a prefix MIN down the price
  * order. O(n log n), no self-join.
  *
  * Scale: the groupBy(price) is one keyed shuffle; the prefix MIN runs
  * over the DISTINCT-PRICE frame, not the data (dim-scale here, but an
  * unpartitioned window nonetheless — at 100 TB with ~unique prices,
  * exploit distributivity instead: skyline(S) = skyline(∪ skyline(Sᵢ)),
  * i.e. per-partition local skylines first, which cut candidates to
  * ~√n per partition, then this same pass over the survivors). The
  * final join back is on the price key and broadcasts when the
  * frontier stats are small.
  */
object Skyline {

  /** Pareto frontier of orders: maximize o_totalprice, minimize
    * o_orderdate. Ties kept (identical (price, date) pairs do not
    * dominate each other — dominance requires strict improvement). */
  def orderSkyline(spark: SparkSession, sfDir: String): DataFrame = {
    import spark.implicits._
    val o = Tables.orders(spark, sfDir)
      .select($"o_orderkey", $"o_totalprice", to_date($"o_orderdate").as("o_orderdate"))
    val perPrice = o.groupBy($"o_totalprice")
      .agg(min($"o_orderdate").as("d_at"))
    // min date over STRICTLY higher prices: prices are distinct after the
    // groupBy, so a ROWS prefix frame down the descending price order is
    // exactly the strict-greater set
    val strictAbove = Window.orderBy($"o_totalprice".desc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val stats = perPrice.withColumn("d_above", min($"d_at").over(strictAbove))
    o.join(stats, Seq("o_totalprice"))
      // survive iff (a) no higher-price row at an earlier-or-equal date,
      // (b) no equal-price row strictly earlier (d_at is the group min,
      // so surviving means being AT that min)
      .filter(($"d_above".isNull || $"d_above" > $"o_orderdate") &&
        $"d_at" === $"o_orderdate")
      .select($"o_orderkey", $"o_totalprice", $"o_orderdate")
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
