package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sorted, deduplicated 3-token shingles from a token array, fused into
  * ONE pass.
  *
  * WHY custom (SURVEY §2.11 escape hatch): the composable chain —
  * `sort_array(array_distinct(transform(sequence(1, n-2), i ->
  * concat_ws(" ", element_at(t,i), element_at(t,i+1),
  * element_at(t,i+2)))))` — evaluates an interpreted lambda per shingle
  * (3 element_at + a varargs concat_ws each), then allocates an
  * intermediate array for `transform`, a hash set + array for
  * `array_distinct`, and another array for `sort_array`. On the corpus
  * build (every document, every round of the dedup chain) that stage
  * dominated the shared-stage wall time. This expression builds the
  * shingle array, sorts, and adjacent-dedups in one primitive loop.
  *
  * Byte parity with the composable chain (asserted in DedupSpec):
  * `UTF8String.concat` produces exactly concat_ws(" ")'s bytes for
  * non-null tokens, and `UTF8String.compareTo` is the same binary
  * ordering `sort_array` uses, so sort-then-dedup ≡ distinct-then-sort.
  * NULL tokens cannot occur from `split` (the only producer here); they
  * are skipped defensively, matching concat_ws's null-skipping.
  *
  * The heavy lifting lives in [[SortedShingles.compute]], shared by
  * interpreted eval and codegen — the generated code makes one call per
  * row (no per-element dispatch, no expression-tree interpretation), so
  * the projection stays inside WholeStageCodegen.
  */
case class SortedShingles(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"sorted_shingles needs array<string> tokens, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    SortedShingles.compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.SortedShingles.compute($a);")
  }

  override protected def withNewChildInternal(newChild: Expression): SortedShingles =
    copy(child = newChild)
}

object SortedShingles {

  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** One-pass build + sort + adjacent-dedup. Static (object) method so
    * generated code can call it directly. `UTF8String.concat` copies its
    * inputs into a fresh buffer, so the result never aliases the
    * (reused) input row buffer. */
  def compute(tokens: ArrayData): ArrayData = {
    val n = tokens.numElements()
    if (n < 3) return EMPTY
    val out = new Array[AnyRef](n - 2)
    var i = 0
    var m = 0
    while (i < n - 2) {
      val a = tokens.getUTF8String(i)
      val b = tokens.getUTF8String(i + 1)
      val c = tokens.getUTF8String(i + 2)
      // null tokens are unreachable from split(); skip-if-null mirrors
      // concat_ws for defensive SQL-surface callers
      val s =
        if (a != null && b != null && c != null)
          UTF8String.concat(a, SPACE, b, SPACE, c)
        else UTF8String.concatWs(SPACE,
          Seq(a, b, c).filter(_ != null): _*)
      out(m) = s
      m += 1
      i += 1
    }
    java.util.Arrays.sort(out, 0, m) // UTF8String: binary-comparable
    // adjacent dedup in place
    var w = 1
    var r = 1
    while (r < m) {
      if (out(r).asInstanceOf[UTF8String]
            .compareTo(out(w - 1).asInstanceOf[UTF8String]) != 0) {
        out(w) = out(r)
        w += 1
      }
      r += 1
    }
    if (w == out.length) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

/** Generalized fused n-gram builder — the [[SortedShingles]] discipline
  * for any gram width, in two modes:
  *
  *  - `distinct = false`: grams in POSITION order (index i ⇒ gram
  *    starting at token i+1) — feeds posexplode consumers that need
  *    (position, gram), e.g. the substring-span dedup;
  *  - `distinct = true`: first-occurrence-ordered distinct grams —
  *    byte-identical to `array_distinct(transform(...))`, feeds
  *    set-membership consumers (decontamination).
  *
  * Same WHY as [[SortedShingles]]: the composable chain runs an
  * interpreted lambda per gram (slice + varargs concat_ws, an
  * intermediate array per row, per-element dispatch); this is one
  * static call inside WholeStageCodegen. Parity with the HOF chain is
  * pinned by a differential spec.
  */
case class NGrams(child: Expression, n: Int, distinct: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) if n >= 1 => TypeCheckResult.TypeCheckSuccess
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckFailure(
      s"ngrams needs n >= 1, got $n")
    case t => TypeCheckResult.TypeCheckFailure(
      s"ngrams needs array<string> tokens, got ${t.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    NGrams.compute(input.asInstanceOf[ArrayData], n, distinct)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.plans.NGrams.compute($a, $n, $distinct);")

  override protected def withNewChildInternal(newChild: Expression): NGrams =
    copy(child = newChild)
}

object NGrams {

  /** SQL-surface builder: `ngrams(tokens, n, distinct)` — n and
    * distinct must be literals (they parameterize the generated code). */
  def fromSql(es: Seq[Expression]): Expression = {
    require(es.length == 3, "ngrams(tokens, n, distinct) takes 3 arguments")
    require(es(1).foldable && es(2).foldable,
      "ngrams: n and distinct must be literals")
    NGrams(es(0), es(1).eval().asInstanceOf[Number].intValue(),
      es(2).eval().asInstanceOf[Boolean])
  }

  private val SPACE = UTF8String.fromString(" ")
  private val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  def compute(tokens: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val len = tokens.numElements()
    if (len < n) return EMPTY
    val m = len - n + 1
    val out = new Array[AnyRef](m)
    val parts = new Array[UTF8String](n)
    var i = 0
    while (i < m) {
      var j = 0
      var nn = 0
      while (j < n) {
        val t = tokens.getUTF8String(i + j)
        // null tokens unreachable from split(); concat_ws-style skip
        // keeps SQL-surface callers safe
        if (t != null) { parts(nn) = t; nn += 1 }
        j += 1
      }
      out(i) = UTF8String.concatWs(SPACE, java.util.Arrays.copyOf(parts, nn): _*)
      i += 1
    }
    if (!distinct) return new GenericArrayData(out)
    // first-occurrence dedup — array_distinct's exact order
    val seen = new java.util.HashSet[AnyRef](m * 2)
    var w = 0
    var r = 0
    while (r < m) {
      if (seen.add(out(r))) { out(w) = out(r); w += 1 }
      r += 1
    }
    if (w == m) new GenericArrayData(out)
    else new GenericArrayData(java.util.Arrays.copyOf(out, w))
  }
}

object ShingleExpression {
  /** Column API: sorted distinct 3-gram shingles from a token array. */
  def sortedShingles(tokens: Column): Column =
    ColumnBridge.column(SortedShingles(ColumnBridge.expression(tokens)))

  /** Column API: fused n-grams; see [[NGrams]]. */
  def ngrams(tokens: Column, n: Int, distinct: Boolean): Column =
    ColumnBridge.column(NGrams(ColumnBridge.expression(tokens), n, distinct))
}
