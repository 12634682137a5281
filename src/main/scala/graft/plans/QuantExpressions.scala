package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._

/** Int8 scalar quantization for embedding vectors (the SQ8 recipe every
  * large-scale ANN system uses: FAISS's ScalarQuantizer, Lucene/ES
  * int8_hnsw, Milvus SQ8 — public designs).
  *
  * At 100 TB the embedding column IS the scan cost: float32×64 = 256 B
  * per row vs int8×64 + one float scale = ~68 B — a 3.8× reduction in
  * bytes read, shuffled, and held in memory, and the candidate-scoring
  * loop becomes integer multiply-adds. Exactness is recovered by
  * oversampled re-ranking with the full-precision [[DotProduct]]
  * (recall measured in SimilaritySpec).
  *
  * Scheme: symmetric per-vector scaling — q_i = round(v_i / s), with
  * s = max(|v_i|) / 127, so the approximate dot of two vectors is
  * `intDot(qa, qb) * s_a * s_b`. Per-vector scales cost one float each
  * and avoid the global-calibration pass a shared scale would need.
  *
  * All three expressions are the [[DotProduct]] pattern: primitive
  * loops inside WholeStageCodegen, no per-element lambda dispatch.
  */
case class VectorAbsMax(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"VectorAbsMax needs array<float|double>, got ${t.catalogString}")
  }

  private def isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    var m = 0.0
    var i = 0
    while (i < n) {
      val v = math.abs(if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i))
      if (v > m) m = v
      i += 1
    }
    m
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val m = ctx.freshName("m"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |double $m = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = java.lang.Math.abs((double) $a.$get($i));
         |  if ($v > $m) $m = $v;
         |}
         |${ev.value} = $m;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): VectorAbsMax =
    copy(child = newChild)
}

/** q_i = round(v_i / scale) clamped to [-127, 127]; scale <= 0 (a zero
  * vector) quantizes to all zeros rather than dividing by zero. */
case class QuantizeVector(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = ArrayType(ByteType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType, _) | ArrayType(DoubleType, _), DoubleType) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"QuantizeVector needs (array<float|double>, double), got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  private def isFloat = left.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(v: Any, s: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val scale = s.asInstanceOf[Double]
    val n = arr.numElements()
    val out = new Array[Byte](n)
    var i = 0
    while (i < n) {
      if (scale > 0) {
        val x = (if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i)) / scale
        val r = math.rint(x)
        out(i) = math.max(-127.0, math.min(127.0, r)).toByte
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, (a, s) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val out = ctx.freshName("out"); val r = ctx.freshName("r")
      s"""
         |int $n = $a.numElements();
         |byte[] $out = new byte[$n];
         |if ($s > 0) {
         |  for (int $i = 0; $i < $n; $i++) {
         |    double $r = java.lang.Math.rint(((double) $a.$get($i)) / $s);
         |    $out[$i] = (byte) java.lang.Math.max(-127.0, java.lang.Math.min(127.0, $r));
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizeVector =
    copy(left = newLeft, right = newRight)
}

/** Integer dot product of two int8 vectors — a long accumulator (64 ×
  * 127² ≈ 2^20 per element: no overflow for any realistic dim). */
case class QuantizedDotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = LongType

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(ByteType, _), ArrayType(ByteType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"QuantizedDotProduct needs array<tinyint> inputs, got " +
          s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += x.getByte(i).toLong * y.getByte(i).toLong
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += ((long) $a.getByte($i)) * ((long) $b.getByte($i));
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): QuantizedDotProduct =
    copy(left = newLeft, right = newRight)
}

object QuantExpressions {
  /** max(|v_i|) — the per-vector quantization range. */
  def vectorAbsMax(v: Column): Column =
    ColumnBridge.column(VectorAbsMax(ColumnBridge.expression(v)))

  /** Symmetric int8 quantization at the given scale. */
  def quantize(v: Column, scale: Column): Column =
    ColumnBridge.column(QuantizeVector(
      ColumnBridge.expression(v), ColumnBridge.expression(scale)))

  /** Integer dot of two quantized vectors. */
  def quantizedDot(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
