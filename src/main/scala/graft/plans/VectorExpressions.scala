package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Codegen'd dot product over numeric arrays.
  *
  * WHY a custom Catalyst Expression (the SURVEY §2.11 escape hatch,
  * preference order b): the composable alternative —
  * `aggregate(zip_with(a, b, _*_), 0d, _+_)` — runs Spark's
  * higher-order functions, which evaluate their lambda per element in
  * interpreted mode and allocate an intermediate array per row. On the
  * similarity workloads (|pairs| × 64 elements) that interpretive
  * overhead dominated the benchmark (q_cosine_neardup ≈ 52 s at sf0.1).
  * This expression emits a tight primitive loop inside WholeStageCodegen:
  * no intermediate array, no lambda dispatch, double accumulator.
  *
  * Numeric parity: identical left-to-right IEEE accumulation as the
  * higher-order formulation and the DuckDB oracle's list comprehension —
  * result values are bit-identical, so swapping implementations does not
  * move the oracle hash.
  */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"DotProduct needs array<float|double> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  private def elemIsFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    val lf = elemIsFloat(left); val rf = elemIsFloat(right)
    var acc = 0.0
    var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val lGet = if (elemIsFloat(left)) "getFloat" else "getDouble"
    val rGet = if (elemIsFloat(right)) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((double) $a.$lGet($i)) * ((double) $b.$rGet($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** Integer twin of [[DotProduct]] for the quantized gate paths
  * (array<bigint> inputs): exact long multiply-accumulate in one
  * codegen loop — replaces `aggregate(zip_with(_*_), 0L, _+_)`, whose
  * per-element interpreted lambdas dominated the quantized kmeans /
  * semdedup / ANN gates the same way the FP HOF once dominated
  * q_cosine_neardup. Result is the identical exact integer, so
  * swapping in the expression cannot move an oracle hash. */
case class LongDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType))
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"LongDotProduct needs array<bigint> inputs, got " +
          s"${left.dataType.catalogString} / ${right.dataType.catalogString}")
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += x.getLong(i) * y.getLong(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getLong($i) * $b.getLong($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): LongDotProduct =
    copy(left = newLeft, right = newRight)
}


/** All `bands` sign-LSH band keys of a quantized vector in ONE codegen
  * loop — replaces `bands × rowsPerBand` separate [[LongDotProduct]]
  * trees per row, which blew the whole-stage-codegen method budget at
  * production band counts (32×16 = 512 expression trees) and fell back
  * to per-expression interpreted eval (~6× the gate cost, r8).
  *
  * Bit j of key b is [Σᵢ s(b·r+j, i)·qᵢ ≥ 0] with the ±1 plane formula
  * s(p,i) = [((p·1315423911 + i·2654435761) >>> 7) mod 2 = 0] — THE
  * plane-mixing formula of Similarity.planeSigns, mirrored textually
  * by the SQL oracles; a drift between this loop and that literal
  * vector trips NnGraphSpec/SimilarityScaleSpec. */
case class SignBandKeys(child: Expression, bands: Int, rowsPerBand: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(org.apache.spark.sql.types.LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case t =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"SignBandKeys needs array<bigint> input, got ${t.catalogString}")
    }

  override def nullSafeEval(a: Any): Any = {
    val q = a.asInstanceOf[ArrayData]
    val n = q.numElements()
    val keys = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var key = 0L
      var j = 0
      while (j < rowsPerBand) {
        val pl = (b * rowsPerBand + j).toLong
        var t = 0L
        var i = 0
        while (i < n) {
          val s =
            if (((pl * 1315423911L + i * 2654435761L) >>> 7) % 2 == 0) 1L
            else -1L
          t += s * q.getLong(i)
          i += 1
        }
        if (t >= 0) key |= (1L << j)
        j += 1
      }
      keys(b) = key
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(keys)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val keys = ctx.freshName("keys")
      val b = ctx.freshName("b")
      val j = ctx.freshName("j")
      val i = ctx.freshName("i")
      val pl = ctx.freshName("pl")
      val t = ctx.freshName("t")
      val key = ctx.freshName("key")
      s"""
         |int $n = $a.numElements();
         |long[] $keys = new long[$bands];
         |for (int $b = 0; $b < $bands; $b++) {
         |  long $key = 0L;
         |  for (int $j = 0; $j < $rowsPerBand; $j++) {
         |    long $pl = (long) ($b * $rowsPerBand + $j);
         |    long $t = 0L;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long s = ((($pl * 1315423911L + $i * 2654435761L) >>> 7) % 2 == 0)
         |        ? 1L : -1L;
         |      $t += s * $a.getLong($i);
         |    }
         |    if ($t >= 0L) $key |= (1L << $j);
         |  }
         |  $keys[$b] = $key;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($keys);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): SignBandKeys =
    copy(child = newChild)
}

object VectorExpressions {
  /** Column-API surface: dot product with a codegen'd primitive loop. */
  def dotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Exact integer dot product (array<bigint>), codegen'd. */
  def longDotProduct(a: Column, b: Column): Column =
    ColumnBridge.column(LongDotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** All sign-LSH band keys of a quantized vector, one codegen loop. */
  def signBandKeys(q: Column, bands: Int, rowsPerBand: Int): Column =
    ColumnBridge.column(SignBandKeys(ColumnBridge.expression(q), bands, rowsPerBand))
}
