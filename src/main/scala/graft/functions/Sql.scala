package graft.functions

/** Helpers for builder-authored oracle SQL. */
object Sql {
  /** A single-quoted SQL string literal with embedded quotes doubled —
    * parameterized oracles (BM25 query terms, benchmark source names)
    * must accept the same input domain as their Spark twins, which
    * take the values as data, not syntax. */
  def lit(s: String): String = "'" + s.replace("'", "''") + "'"
}
