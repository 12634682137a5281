package graft

import org.apache.spark.sql.functions._
import graft.functions.{Dedup, Sampling, Similarity}

/** Invariant checks for the round-8 mining/ordering operators — the
  * hash gates pin values; these pin the CONTRACTS a reader relies on:
  * label constraints and margin semantics for hard-negative mining,
  * PRF determinism and expectation shape for duplication-aware
  * sampling, interleave structure for the curriculum writer, and the
  * algebraic identities of the source-overlap matrix. */
class MiningOpsSpec extends SparkSuite {
  import spark.implicits._

  private val gateSf = "/root/testdata/sf0.01"

  test("hard negatives: labels differ, ranks dense, margin flag recomputes") {
    val k = 5
    val margin = 0.2
    val out = Similarity.hardNegatives(spark, gateSf, nQueries = 10, k = k, margin = margin)
      .collect()
    val labels = spark.read.parquet(s"$gateSf/embeddings.parquet")
      .select($"vec_id", $"label").collect()
      .map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(out.nonEmpty)
    out.foreach { r =>
      val (q, n) = (r.getLong(0), r.getLong(1))
      assert(labels(q) != labels(n), s"neighbor $n shares anchor $q's label")
      assert(n != q)
    }
    out.groupBy(_.getLong(0)).values.foreach { rows =>
      val sorted = rows.sortBy(_.getInt(2))
      assert(sorted.map(_.getInt(2)).toSeq == (1 to sorted.length) &&
        sorted.length <= k)
      // cosine non-increasing in rank
      val cs = sorted.map(_.getDouble(3))
      assert(cs.zip(cs.tail).forall { case (a, b) => a >= b })
      // the semi-hard flag is exactly the FaceNet window on the
      // ROUNDED values the row itself carries
      sorted.foreach { r =>
        val (cos, pos, semi) = (r.getDouble(3), r.getDouble(4), r.getBoolean(5))
        assert(semi == (cos < pos && cos > pos - margin))
      }
    }
    // hardest positive recomputes: min same-label cosine per anchor
    val emb = spark.read.parquet(s"$gateSf/embeddings.parquet")
      .collect().map(r => (r.getLong(0),
        r.getSeq[Float](1).map(_.toDouble).toArray, r.getInt(2)))
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var (d, na, nb, i) = (0.0, 0.0, 0.0, 0)
      while (i < a.length) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1 }
      BigDecimal(d / (math.sqrt(na) * math.sqrt(nb)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    }
    val byId = emb.map(e => e._1 -> e).toMap
    out.groupBy(_.getLong(0)).foreach { case (q, rows) =>
      val (_, qv, ql) = byId(q)
      val expectPos = emb.collect {
        case (id, v, l) if id != q && l == ql => cos(qv, v)
      }.min
      assert(math.abs(rows.head.getDouble(4) - expectPos) < 1e-9,
        s"hard_pos_cos for anchor $q")
    }
  }

  test("dup-weighted sample: covers corpus, uniques always kept, PRF replays") {
    val out = Sampling.dupWeightedSample(spark, gateSf).collect()
    val docs = spark.read.parquet(s"$gateSf/documents.parquet")
    assert(out.length == docs.count())
    // copy counts recompute from the content hash
    val copies = docs.groupBy(md5($"text")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hashOf = docs.select($"doc_id", md5($"text")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val thresh = 1152921504606846975L
    out.foreach { r =>
      val (id, n, kept) = (r.getLong(0), r.getLong(2), r.getBoolean(3))
      assert(n == copies(hashOf(id)))
      if (n == 1) assert(kept, s"unique doc $id must survive")
      // the decision replays from the integer PRF
      val u = java.lang.Long.parseLong(
        org.apache.commons.codec.digest.DigestUtils.md5Hex(s"$id|dupw_v1")
          .substring(0, 15), 16)
      assert(kept == (u <= thresh / n), s"PRF decision for doc $id")
    }
    // every duplicate cluster of size n keeps ~n·(1/n) = 1 expected
    // copy; with the fixture's cluster sizes just assert no cluster
    // loses ALL copies while uniques keep everything (distribution
    // sanity, not an exact value — the gate pins exact decisions)
    val keptByHash = out.groupBy(r => hashOf(r.getLong(0)))
      .map { case (h, rs) => copies(h) -> rs.count(_.getBoolean(3)) }
    keptByHash.foreach { case (n, keptN) => if (n == 1L) assert(keptN == 1) }
  }

  test("curriculum: bands from score edges, per-shard positions unique and interleaved") {
    val out = Sampling.curriculum(spark, gateSf).collect()
    val docs = spark.read.parquet(s"$gateSf/documents.parquet").count()
    assert(out.length == docs)
    out.foreach { r =>
      val (score, band, pos) = (r.getDouble(1), r.getInt(2), r.getInt(4))
      val expBand =
        if (score >= 0.75) 0 else if (score >= 0.5) 1
        else if (score >= 0.25) 2 else 3
      assert(band == expBand)
      // interleave structure: position class mod 4 IS the band
      assert(pos % 4 == band && pos >= 0)
    }
    out.groupBy(_.getInt(3)).values.foreach { rows =>
      val ps = rows.map(_.getInt(4))
      assert(ps.distinct.length == ps.length, "positions must be unique per shard")
      // each band's positions within a shard are dense in its class:
      // band b occupies b, b+4, b+8, ... with no gaps
      rows.groupBy(_.getInt(2)).foreach { case (b, rs) =>
        val sorted = rs.map(_.getInt(4)).sorted
        assert(sorted.zipWithIndex.forall { case (p, i) => p == b + 4 * i })
      }
    }
    // deterministic: a second run is bit-identical
    val again = Sampling.curriculum(spark, gateSf).collect()
    assert(out.map(_.toString).toSeq == again.map(_.toString).toSeq)
  }

  test("tokenizer fertility: floor-div recomputes; bounds hold; piece mass conserved") {
    val out = graft.functions.WordPiece.fertility(spark, gateSf).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (nw, np, f) = (r.getLong(1), r.getLong(2), r.getLong(3))
      assert(nw > 0 && np >= nw, "every word is at least one piece")
      assert(f == np * 1000000000L / nw)
      assert(f >= 1000000000L, "fertility floor is 1 piece/word")
    }
    // total piece mass across sources equals the corpus piece count
    // from the independently-gated pieceCounts query
    val totalPieces = graft.functions.WordPiece.pieceCounts(spark, gateSf)
      .agg(org.apache.spark.sql.functions.sum("n_occ")).collect()(0).getLong(0)
    assert(out.map(_.getLong(2)).sum == totalPieces,
      "per-source piece totals must sum to the corpus piece count")
  }

  test("mixture budget: integer chain recomputes; allocation conserves budget") {
    val b = 1000000L
    val out = Sampling.mixtureBudget(spark, gateSf, b).collect()
    assert(out.nonEmpty)
    val sE3 = out.map(r => math.floor(math.sqrt(r.getLong(1).toDouble) * 1e3).toLong)
    val tot = sE3.sum
    out.zip(sE3).foreach { case (r, s) =>
      val (tokens, w, alloc, ep) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(w == s * 1000000000L / tot)
      assert(alloc == w * b / 1000000000L)
      assert(ep == alloc * 1000000L / tokens)
    }
    // floor-div conservation: total allocation within #sources·(loss
    // per floor) of the budget, never above it
    val total = out.map(_.getLong(3)).sum
    assert(total <= b && total >= b - out.length * (b / 1000000000L + 1) - out.length,
      s"allocated $total of $b")
    // temperature flattens: the weight RATIO between the largest and
    // smallest source is the sqrt of the token ratio, so ordering by
    // weight must equal ordering by tokens while the spread shrinks
    val byTok = out.sortBy(_.getLong(1)).map(_.getString(0)).toSeq
    val byW = out.sortBy(_.getLong(2)).map(_.getString(0)).toSeq
    assert(byTok == byW, "weight order must follow token order")
  }

  test("source overlap: identities hold and sizes recompute from shingles") {
    val out = Dedup.sourceOverlap(spark, gateSf).collect()
    assert(out.nonEmpty)
    // recompute per-source distinct shingle vocabulary sizes
    val docs = spark.read.parquet(s"$gateSf/documents.parquet")
      .select($"source", split(trim(lower($"text")), "\\s+").as("t"))
      .collect().map(r => (r.getString(0), r.getSeq[String](1)))
    val vocab = docs.groupBy(_._1).map { case (s, rows) =>
      s -> rows.flatMap { case (_, t) => t.sliding(3).filter(_.length == 3).map(_.mkString(" ")) }.toSet
    }
    out.foreach { r =>
      val (a, b, nc) = (r.getString(0), r.getString(1), r.getLong(2))
      val (jac, ca, cb) = (r.getDouble(3), r.getDouble(4), r.getDouble(5))
      assert(a < b, "pair ordering canonical")
      val expN = (vocab(a) & vocab(b)).size.toLong
      assert(nc == expN, s"n_common for ($a,$b)")
      val (na, nb) = (vocab(a).size, vocab(b).size)
      def r6(x: Double) = BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(jac == r6(nc.toDouble / (na + nb - nc)))
      assert(ca == r6(nc.toDouble / na) && cb == r6(nc.toDouble / nb))
      assert(jac <= math.min(ca, cb) + 1e-9, "Jaccard bounded by both containments")
    }
  }
}
