package graft

import graft.operators.StatefulBatch
import graft.streaming.TwsOps

/** transformWithState clamped balance: the streaming strategy must be a
  * drop-in for the batch fold — same rows, same IEEE bits. */
class TwsSpec extends SparkSuite {

  test("tws stream == batch flatMapGroups, bit-exact, state crosses batches") {
    // twsBalanceQuery itself requires >=4 micro-batches, so a pass here
    // also proves the per-user balance really carried across batch
    // boundaries through RocksDB ValueState
    val stream = TwsOps.twsBalanceQuery(spark, sf).collect()
    val batch = StatefulBatch.clampedBalance(spark, sf).collect()
    assert(stream.length == batch.length)
    stream.zip(batch).foreach { case (s, b) =>
      assert(s.getLong(0) == b.getLong(0) && s.getLong(1) == b.getLong(1))
      // bit equality, not tolerance: same pinned op order on both paths
      assert(java.lang.Double.doubleToLongBits(s.getDouble(2)) ==
        java.lang.Double.doubleToLongBits(b.getDouble(2)),
        s"balance diverged at user=${s.getLong(0)} event=${s.getLong(1)}")
    }
  }

  test("clamp actually engaged on the test corpus (fold is order-sensitive)") {
    // if neither clamp ever fires the fold degenerates to a prefix sum a
    // window could express — make sure this corpus genuinely exercises
    // the non-decomposable path at both bounds
    val out = StatefulBatch.clampedBalance(spark, sf)
    import org.apache.spark.sql.functions._
    val hits = out.agg(
      sum(when(col("balance") === 0.0, 1).otherwise(0)),
      sum(when(col("balance") === 500.0, 1).otherwise(0))).head()
    assert(hits.getLong(0) > 0, "floor clamp never fired")
    assert(hits.getLong(1) > 0, "cap clamp never fired")
  }
}
