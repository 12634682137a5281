package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** One-pass k-minima MinHash signature over pre-hashed shingles.
  *
  * WHY custom (SURVEY §2.11 escape hatch): the composable form is k
  * separate `array_min(transform(shingles, s -> hash(s, seed_k)))`
  * columns — k interpreted higher-order passes over the shingle array
  * per row (k=64 × |shingles| lambda dispatches), which dominated
  * q_minhash_dedup at sf0.1. This expression takes the base hashes
  * ONCE (`transform(sh, xxhash64)` — a single string-hash pass) and
  * computes all k affine-permutation minima in one primitive nested
  * loop inside WholeStageCodegen.
  *
  * Permutation family: h_k(x) = fmix64(x * MULT(k) + ADD(k)) over
  * Z/2^64 — an odd-multiplier affine step (bijective) followed by the
  * MurmurHash3 64-bit finalizer (bijective xor-shift/multiply
  * avalanche), so each h_k is a bijection and the family behaves like
  * independent permutations. Deterministic constants — no RNG,
  * reproducible across runs/engines.
  *
  * The finalizer is LOAD-BEARING, found by the ×64 soak (round 7): the
  * plain affine family's orderings are correlated ACROSS k — on a real
  * replica corpus a J = 27/28 pair's one extra shingle won the signed
  * min at exactly every k ≡ 0 (mod 4) position, i.e. one row of EVERY
  * band, and a pair whose uniform-permutation miss probability is
  * ~1e-14 was actually missed. A linear map preserves too much of the
  * input's arithmetic structure for "min under 64 related multipliers"
  * to be 64 independent draws; the avalanche destroys that structure.
  */
case class MinHashSignature(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"MinHashSignature needs array<bigint>, got ${t.catalogString}")
  }

  @transient private lazy val mult: Array[Long] =
    Array.tabulate(numHashes)(k => (0x9E3779B97F4A7C15L * (2L * k + 1L)) | 1L)
  @transient private lazy val add: Array[Long] =
    Array.tabulate(numHashes)(k => 0xC2B2AE3D27D4EB4FL * (k + 1L))

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var k = 0
      while (k < numHashes) {
        var v = h * mult(k) + add(k)
        // fmix64 (MurmurHash3 finalizer) — see scaladoc: bijective
        // avalanche that decorrelates the orderings across k
        v ^= v >>> 33; v *= 0xFF51AFD7ED558CCDL
        v ^= v >>> 33; v *= 0xC4CEB9FE1A85EC53L
        v ^= v >>> 33
        if (v < mins(k)) mins(k) = v
        k += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val multRef = ctx.addReferenceObj("minhashMult", mult, "long[]")
    val addRef = ctx.addReferenceObj("minhashAdd", add, "long[]")
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val k = ctx.freshName("k")
      val n = ctx.freshName("n"); val mins = ctx.freshName("mins")
      val h = ctx.freshName("h"); val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |long[] $mins = new long[$numHashes];
         |java.util.Arrays.fill($mins, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $a.getLong($i);
         |  for (int $k = 0; $k < $numHashes; $k++) {
         |    long $v = $h * $multRef[$k] + $addRef[$k];
         |    $v ^= $v >>> 33; $v *= 0xFF51AFD7ED558CCDL;
         |    $v ^= $v >>> 33; $v *= 0xC4CEB9FE1A85EC53L;
         |    $v ^= $v >>> 33;
         |    if ($v < $mins[$k]) $mins[$k] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($mins);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

object MinHashExpression {
  /** Column API: 64-long MinHash signature from an array<bigint> of
    * base shingle hashes. */
  def minhashSig(baseHashes: Column, numHashes: Int): Column =
    ColumnBridge.column(MinHashSignature(ColumnBridge.expression(baseHashes), numHashes))
}
