package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, LongType}

/** Bloom-filter membership probe, codegen'd.
  *
  * `left` is a non-negative 60-bit element hash (the engine-neutral
  * md5-prefix hash of [[graft.functions.Dedup.hash60]]); `right` is the
  * filter as an `array<bigint>` of `numBits / 64` little-endian bit
  * words (normally a Literal, so codegen holds one reference to the
  * shared array — it is NOT inlined per row).
  *
  * Bit positions use Kirsch–Mitzenmacher double hashing,
  * p_j = (h1 + j·h2) mod m with h1 = h mod m and
  * h2 = 1 + (h >> 20) mod (m-1): every intermediate stays far below
  * 2^63 (h < 2^60, j·h2 < k·m), so a DuckDB oracle replays the exact
  * same positions — BIGINT overflow would THROW there, not wrap, which
  * is why the formula is overflow-free rather than mix-and-wrap.
  *
  * WHY an expression (SURVEY §2.11 preference b): the composable
  * alternative — `forall(transform(sequence(0,k-1), j -> bit test))` —
  * runs interpreted higher-order lambdas per probe, and the bit test
  * itself needs a variable shift, which `functions.shiftright` (static
  * shift count only) cannot express without `expr()` string plumbing.
  * This emits one tight loop inside WholeStageCodegen.
  */
case class BloomContains(left: Expression, right: Expression,
    numBits: Long, numHashes: Int) extends BinaryExpression {

  require(numBits >= 64 && numBits % 64 == 0 && numHashes >= 1,
    s"BloomContains: numBits=$numBits must be a positive multiple of 64, " +
      s"numHashes=$numHashes >= 1")

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (LongType, ArrayType(LongType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case (l, r) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"BloomContains needs (bigint, array<bigint>), got " +
            s"${l.catalogString} / ${r.catalogString}")
    }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val h = a.asInstanceOf[Long]
    val words = b.asInstanceOf[ArrayData]
    // an undersized bitmap would read out of bounds — and in the
    // codegen path UnsafeArrayData.getLong is UNCHECKED, so without
    // this guard it returns garbage membership bits instead of failing
    if (words.numElements() != (numBits / 64).toInt)
      throw new IllegalArgumentException(
        s"BloomContains: bitmap has ${words.numElements()} words, " +
          s"expected ${numBits / 64} (numBits=$numBits)")
    val m = numBits
    val h1 = h % m
    val h2 = 1L + (h >> 20) % (m - 1L)
    var j = 0
    while (j < numHashes) {
      val p = (h1 + j * h2) % m
      if (((words.getLong((p >> 6).toInt) >>> (p & 63L).toInt) & 1L) == 0L)
        return false
      j += 1
    }
    true
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val h1 = ctx.freshName("h1")
      val h2 = ctx.freshName("h2")
      val p = ctx.freshName("p")
      val j = ctx.freshName("j")
      val hit = ctx.freshName("hit")
      s"""
         |if ($b.numElements() != ${numBits / 64}) {
         |  throw new IllegalArgumentException(
         |    "BloomContains: bitmap has " + $b.numElements() +
         |    " words, expected ${numBits / 64} (numBits=${numBits})");
         |}
         |long $h1 = $a % ${numBits}L;
         |long $h2 = 1L + ($a >> 20) % ${numBits - 1L}L;
         |boolean $hit = true;
         |for (int $j = 0; $j < $numHashes; $j++) {
         |  long $p = ($h1 + $j * $h2) % ${numBits}L;
         |  if ((($b.getLong((int) ($p >> 6)) >>> (int) ($p & 63L)) & 1L) == 0L) {
         |    $hit = false; break;
         |  }
         |}
         |${ev.value} = $hit;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BloomContains =
    copy(left = newLeft, right = newRight)
}

object BloomExpression {
  /** Column-API probe: true iff all `numHashes` bit positions of `hash`
    * are set in the `words` bitmap (an `array<bigint>` of numBits/64
    * words — pass a Literal to share one array across all rows). */
  def bloomContains(hash: Column, words: Column, numBits: Long,
      numHashes: Int): Column =
    ColumnBridge.column(BloomContains(ColumnBridge.expression(hash),
      ColumnBridge.expression(words), numBits, numHashes))
}
