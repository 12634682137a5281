package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}

/** Intersection size of two SORTED string arrays via a merge walk.
  *
  * WHY custom (SURVEY §2.11 escape hatch): `size(array_intersect(a, b))`
  * builds a hash set and an output array per row in interpreted mode —
  * at |candidate pairs| × ~250-element shingle arrays that allocation
  * dominated the exact-Jaccard verification stage. Pre-sorting each
  * array once per document (cached) lets every pair be scored with a
  * zero-allocation O(|a|+|b|) merge inside WholeStageCodegen.
  *
  * Contract: both inputs ascending-sorted and deduplicated (the shingle
  * builder guarantees both; `sort_array` sorts nulls FIRST, matching the
  * merge below). NULL elements never match (SQL `null != null`) and are
  * skipped — the expression is registered for spark.sql users, who can
  * pass arrays the internal builder never produces. Jaccard then needs
  * no union array: |A∪B| = |A|+|B|−|A∩B|.
  */
case class SortedIntersectSize(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): TypeCheckResult = (left.dataType, right.dataType) match {
    case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
      TypeCheckResult.TypeCheckSuccess
    case (l, r) => TypeCheckResult.TypeCheckFailure(
      s"SortedIntersectSize needs array<string> inputs, got ${l.catalogString} / ${r.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val (na, nb) = (x.numElements(), y.numElements())
    var i = 0; var j = 0; var c = 0
    while (i < na && j < nb) {
      if (x.isNullAt(i)) i += 1
      else if (y.isNullAt(j)) j += 1
      else {
        val cmp = x.getUTF8String(i).compareTo(y.getUTF8String(j))
        if (cmp == 0) { c += 1; i += 1; j += 1 }
        else if (cmp < 0) i += 1
        else j += 1
      }
    }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val c = ctx.freshName("c"); val cmp = ctx.freshName("cmp")
      val na = ctx.freshName("na"); val nb = ctx.freshName("nb")
      s"""
         |int $na = $a.numElements();
         |int $nb = $b.numElements();
         |int $i = 0, $j = 0, $c = 0;
         |while ($i < $na && $j < $nb) {
         |  if ($a.isNullAt($i)) { $i++; }
         |  else if ($b.isNullAt($j)) { $j++; }
         |  else {
         |    int $cmp = $a.getUTF8String($i).compareTo($b.getUTF8String($j));
         |    if ($cmp == 0) { $c++; $i++; $j++; }
         |    else if ($cmp < 0) { $i++; } else { $j++; }
         |  }
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectSize =
    copy(left = newLeft, right = newRight)
}

object ArrayExpressions {
  /** Column API: |a ∩ b| for ascending-sorted, deduplicated arrays. */
  def sortedIntersectSize(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectSize(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
