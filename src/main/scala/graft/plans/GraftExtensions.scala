package graft.plans

import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}

/** SQL-surface registration for the custom Catalyst expressions, so
  * `spark.sql` users get them too (not only the Column API):
  *
  *  - `dot_product(array<float|double>, array<float|double>) → double`
  *  - `minhash_sig(array<bigint>) → array<bigint>` (64 hashes)
  *  - `sorted_intersect_size(array<string>, array<string>) → int`
  *  - `sorted_shingles(array<string>) → array<string>` (3-gram, sorted, distinct)
  *  - `ngrams(array<string>, n, distinct) → array<string>`
  *  - `blocklist_counts(string, array<string> literal) → array<bigint>`
  *
  * Two registration paths, matching how Spark libraries ship:
  * [[GraftFunctions.register]] for an existing session (temp
  * functions), and [[GraftExtensions]] for
  * `spark.sql.extensions=graft.plans.GraftExtensions` at session build
  * (cluster-wide, survives new sessions).
  */
object GraftFunctions {

  private val fns: Seq[(String, Seq[Expression] => Expression)] = Seq(
    ("dot_product", es => DotProduct(es(0), es(1))),
    ("minhash_sig", es => MinHashSignature(es.head, 64)),
    ("sorted_intersect_size", es => SortedIntersectSize(es(0), es(1))),
    ("sorted_shingles", es => SortedShingles(es.head)),
    ("ngrams", NGrams.fromSql _),
    ("blocklist_counts", BlocklistCounts.fromSql _))

  /** Register as session temp functions (idempotent). */
  def register(spark: SparkSession): Unit =
    fns.foreach { case (name, builder) =>
      spark.sessionState.functionRegistry
        .createOrReplaceTempFunction(name, builder, "built-in")
    }
}

class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(e: SparkSessionExtensions): Unit = {
    e.injectFunction((FunctionIdentifier("dot_product"),
      new ExpressionInfo(classOf[DotProduct].getName, "dot_product"),
      es => DotProduct(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("minhash_sig"),
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_sig"),
      es => MinHashSignature(es.head, 64)))
    e.injectFunction((FunctionIdentifier("sorted_intersect_size"),
      new ExpressionInfo(classOf[SortedIntersectSize].getName, "sorted_intersect_size"),
      es => SortedIntersectSize(es(0), es(1))))
    e.injectFunction((FunctionIdentifier("sorted_shingles"),
      new ExpressionInfo(classOf[SortedShingles].getName, "sorted_shingles"),
      es => SortedShingles(es.head)))
    e.injectFunction((FunctionIdentifier("ngrams"),
      new ExpressionInfo(classOf[NGrams].getName, "ngrams"),
      NGrams.fromSql _))
    e.injectFunction((FunctionIdentifier("blocklist_counts"),
      new ExpressionInfo(classOf[BlocklistCounts].getName, "blocklist_counts"),
      BlocklistCounts.fromSql _))
  }
}
