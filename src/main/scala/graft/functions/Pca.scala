package graft.functions

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.plans.VectorExpressions.dotProduct
import graft.sources.Tables

/** PCA over the embeddings table — the dimensionality-reduction /
  * whitening step of an embedding pipeline, built the way it scales:
  *
  *  1. [[covariance]] — ONE distributed pass produces the d×d moment
  *     matrix (d=64 here, so the model is 2 080 upper-triangle cells —
  *     constant-size regardless of corpus rows). Products are single
  *     IEEE-double multiplies per row; sums are decimal-routed, so the
  *     matrix is bit-deterministic and DuckDB-oracle-gated (the
  *     q_amount_outliers moments discipline, lifted to a matrix).
  *  2. eigensolve on the DRIVER — a 64×64 cyclic Jacobi is microseconds
  *     and has no business being distributed; this is the k-means
  *     control shape again (tiny model driver-side, data never moves).
  *  3. [[pcaProject]] — components broadcast back as literal vectors;
  *     the projection is a codegen'd [[dotProduct]] per component, a
  *     narrow map over the corpus.
  *
  * Step 1 runs as per-partition Gramian accumulation
  * ([[covarianceGramian]]: each task folds its rows into a local
  * d·(d+1)/2 fixed-point array; only those d²-sized partials are
  * exchanged), so shuffle bytes are independent of n — the form that
  * survives a 100 TB corpus. The explode+self-join formulation
  * ([[covarianceFrom]]) computes the SAME fixed-point longs (addition
  * is associative/commutative, so the two are bit-identical — asserted
  * in GramianSpec) and is retained as the differential twin mirroring
  * the DuckDB oracle's shape.
  */
object Pca {

  val dim = 64

  /** Fixed-point scale for the moment sums: each product contributes
    * floor(x·10^10) as a LONG. Long sums are exact, order-independent,
    * and — unlike sum(DECIMAL), whose accumulator Spark widens past
    * precision 18 onto the JVM-BigDecimal path (measured 9× slower on
    * the n·d² pair stream) — stay primitive inside the codegen'd
    * partial aggregate. Headroom: |x| < 1 here, so |Σ| < n·10^10; the
    * Long ceiling allows ~9·10^8 vectors at this scale — at larger n,
    * lower the scale (each lost digit buys 10×). */
  private val fp = 1e10

  /** Upper-triangle sample covariance (i <= j), exact and
    * cross-engine-deterministic: fixed-point long moment sums (floor is
    * truncation in BOTH engines — unlike CAST, which rounds in DuckDB),
    * one fixed-order double expression per cell. The gated output
    * rounds to 9 decimals — DuckDB's huge-integer→double conversions
    * are not correctly rounded, so the unrounded last ulp can differ;
    * [[fitFrom]] keeps full precision for the eigensolve. */
  def covariance(spark: SparkSession, sfDir: String): DataFrame =
    covarianceGramian(Tables.embeddings(spark, sfDir))
      .withColumn("cov", round(col("cov"), 9))

  /** Per-dimension first moments (i, si, n) — the small table the
    * differential pair-join covariance reads (the same longs land in
    * [[gramianMoments]]'s `sums`, which is what the production fit
    * consumes). */
  private[graft] def momentsFrom(embeddings: DataFrame): DataFrame =
    embeddings
      .select(col("vec_id"), posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("i"), col("x").cast("double").as("x"))
      .groupBy(col("i"))
      .agg(sum(floor(col("x") * fp)).as("si"), count(lit(1)).as("n"))

  private[graft] def covarianceFrom(embeddings: DataFrame,
      moments: Option[DataFrame] = None): DataFrame = {
    val e = embeddings.select(col("vec_id"),
      posexplode(col("embedding")).as(Seq("i", "x")))
      .select(col("vec_id"), col("i"), col("x").cast("double").as("x"))
    val m = moments.getOrElse(momentsFrom(embeddings))
    val mm = e.as("a").join(e.as("b"),
        col("a.vec_id") === col("b.vec_id") && col("a.i") <= col("b.i"))
      .groupBy(col("a.i").as("i"), col("b.i").as("j"))
      .agg(sum(floor(col("a.x") * col("b.x") * fp)).as("sij"))
    mm.join(m.select(col("i"), col("si").as("si_i"), col("n")), "i")
      .join(m.select(col("i").as("j"), col("si").as("si_j")), "j")
      .select(col("i"), col("j"),
        ((col("sij").cast("double") / fp
          - (col("si_i").cast("double") / fp) * (col("si_j").cast("double") / fp) / col("n"))
          / (col("n") - 1)).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  val covarianceSql: String =
    s"""WITH e AS (
      |  SELECT vec_id, CAST(i AS INTEGER) AS i,
      |         CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE) AS x
      |  FROM embeddings, unnest(range(0, $dim)) AS t(i)),
      |m AS (
      |  SELECT i, CAST(sum(CAST(floor(x * 1e10) AS BIGINT)) AS BIGINT) AS si,
      |         count(*) AS n
      |  FROM e GROUP BY i),
      |mm AS (
      |  SELECT a.i AS i, b.i AS j,
      |         CAST(sum(CAST(floor(a.x * b.x * 1e10) AS BIGINT)) AS BIGINT) AS sij
      |  FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
      |  GROUP BY 1, 2)
      |SELECT mm.i, mm.j,
      |       round((CAST(mm.sij AS DOUBLE) / 1e10
      |         - (CAST(mi.si AS DOUBLE) / 1e10) * (CAST(mj.si AS DOUBLE) / 1e10) / mi.n)
      |         / (mi.n - 1), 9) AS cov
      |FROM mm
      |JOIN m mi ON mm.i = mi.i
      |JOIN m mj ON mm.j = mj.i
      |ORDER BY mm.i, mm.j""".stripMargin

  /** The 100 TB covariance shape: per-partition Gramian accumulation.
    * Each task folds its rows into a local d·(d+1)/2 array of
    * fixed-point LONG cells (one pass, zero allocation per row), and
    * only those d²-sized partials are exchanged — shuffle bytes are
    * independent of n, where [[covarianceFrom]]'s pair join shuffles
    * n·d rows. Because both forms add the SAME floor(x·fp) longs and
    * long addition is associative/commutative, the two are
    * BIT-IDENTICAL — asserted in PcaSpec, which is what lets either
    * implementation serve the same oracle.
    *
    * (mapPartitions is the documented last resort — justified here
    * because the accumulator is a mutable triangular matrix carried
    * across rows, which no built-in aggregate expresses without
    * shuffling the expanded pairs.) */
  /** The one-row Gramian moment frame (gram[d·(d+1)/2], sums[d], n) —
    * the constant-size sufficient statistic every PCA consumer derives
    * from: [[covarianceGramian]] finishes it into the gated (i, j, cov)
    * table distributed; [[fitFrom]] collects the single row and fits
    * driver-side with the identical IEEE expression. */
  private[graft] def gramianMoments(embeddings: DataFrame): DataFrame = {
    import embeddings.sparkSession.implicits._
    val d = dim
    val fpLocal = fp
    val nTri = d * (d + 1) / 2
    val partials = embeddings.select(col("embedding")).as[Seq[Float]]
      .mapPartitions { rows =>
        val gram = new Array[Long](nTri)
        val sums = new Array[Long](d)
        var n = 0L
        val x = new Array[Double](d)
        rows.foreach { v =>
          var i = 0
          while (i < d) { x(i) = v(i).toDouble; i += 1 }
          var idx = 0
          i = 0
          while (i < d) {
            sums(i) += math.floor(x(i) * fpLocal).toLong
            var j = i
            while (j < d) {
              gram(idx) += math.floor(x(i) * x(j) * fpLocal).toLong
              idx += 1; j += 1
            }
            i += 1
          }
          n += 1
        }
        if (n == 0) Iterator.empty
        else Iterator((gram.toSeq, sums.toSeq, n))
      }
      .toDF("gram", "sums", "n")
    // one d²-sized reduction. NOT a 2 145-column `agg(sum, sum, …)`:
    // Catalyst pays seconds planning that many aggregate expressions
    // (measured 3.2s warm vs 0.1s for this shape on identical data) —
    // instead flatten each partial to (idx, v) cells and reduce with a
    // single narrow sum over ~partitions·d² rows, then repack. The
    // shuffle stays d²-per-partition-sized, independent of n.
    val cells = partials
      .select(posexplode(concat(col("gram"), col("sums"), array(col("n"))))
        .as(Seq("idx", "v")))
      .groupBy(col("idx")).agg(sum(col("v")).as("v"))
    cells.agg(sort_array(collect_list(struct(col("idx"), col("v")))).as("kv"))
      .select(
        expr(s"transform(slice(kv, 1, $nTri), x -> x.v)").as("gram"),
        expr(s"transform(slice(kv, ${nTri + 1}, $d), x -> x.v)").as("sums"),
        expr(s"element_at(kv, ${nTri + d + 1}).v").as("n"))
  }

  private[graft] def covarianceGramian(embeddings: DataFrame): DataFrame = {
    import embeddings.sparkSession.implicits._
    val d = dim
    val fpLocal = fp
    // exact (idx -> i, j) unflattening, driver-built (nTri rows) and
    // broadcast — no closed-form float inversion to get subtly wrong
    val idxMap = broadcast(
      (for (i <- 0 until d; j <- i until d) yield (i, j))
        .zipWithIndex.map { case ((i, j), idx) => (idx, i, j) }
        .toDF("idx", "i", "j"))
    gramianMoments(embeddings)
      .select(posexplode(col("gram")).as(Seq("idx", "sij")),
        col("sums"), col("n"))
      .join(idxMap, "idx")
      .select(col("i"), col("j"),
        ((col("sij").cast("double") / fpLocal
          - (col("sums").getItem(col("i")).cast("double") / fpLocal)
            * (col("sums").getItem(col("j")).cast("double") / fpLocal) / col("n"))
          / (col("n") - 1)).as("cov"))
      .orderBy(col("i"), col("j"))
  }

  // ---- driver-side eigensolve --------------------------------------

  /** Cyclic Jacobi eigensolver for a symmetric matrix. Fixed sweep
    * order and a fixed iteration cap keep it deterministic; returns
    * (eigenvalues, eigenvectors-as-rows), sorted by eigenvalue desc
    * with index tiebreak, each vector sign-normalized so its
    * largest-magnitude entry is positive. */
  private[graft] def jacobiEigen(mIn: Array[Array[Double]])
      : (Array[Double], Array[Array[Double]]) = {
    val n = mIn.length
    val a = mIn.map(_.clone())
    val v = Array.tabulate(n, n)((r, c) => if (r == c) 1.0 else 0.0)
    val eps = 1e-12
    var sweep = 0
    var off = Double.MaxValue
    while (sweep < 100 && off > eps) {
      off = 0.0
      for (p <- 0 until n; q <- p + 1 until n) {
        off += a(p)(q) * a(p)(q)
        if (math.abs(a(p)(q)) > eps) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // theta == 0 (equal diagonal entries) must rotate by 45°:
          // signum(0) = 0 would make this the identity rotation and the
          // off-diagonal entry would never be annihilated
          val t =
            if (theta == 0.0) 1.0
            else math.signum(theta) / (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val s = t * c
          for (k <- 0 until n) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - s * akq
            a(k)(q) = s * akp + c * akq
          }
          for (k <- 0 until n) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - s * aqk
            a(q)(k) = s * apk + c * aqk
          }
          for (k <- 0 until n) {
            val vkp = v(k)(p); val vkq = v(k)(q)
            v(k)(p) = c * vkp - s * vkq
            v(k)(q) = s * vkp + c * vkq
          }
        }
      }
      sweep += 1
    }
    val order = (0 until n).sortBy(i => (-a(i)(i), i))
    val vals = order.map(i => a(i)(i)).toArray
    val vecs = order.map { i =>
      val col = Array.tabulate(n)(k => v(k)(i))
      val mx = col.indices.maxBy(k => (math.abs(col(k)), -k))
      if (col(mx) < 0) col.map(x => -x) else col
    }.toArray
    (vals, vecs)
  }

  /** Fit the d-sized driver model (mean, eigenvalues, eigenvectors)
    * from ONE corpus pass: collect the single-row [[gramianMoments]]
    * statistic and finish driver-side with the exact IEEE expression
    * the distributed finisher evaluates — the covariance matrix is
    * bit-identical to collecting [[covarianceGramian]] (and, by
    * GramianSpec, to the pair-join form), so the eigendata and every
    * downstream projection are unchanged by where the division runs. */
  private[graft] def fitFrom(embeddings: DataFrame)
      : (Array[Double], Array[Double], Array[Array[Double]]) = {
    val row = gramianMoments(embeddings).collect()(0)
    val gram = row.getSeq[Long](0)
    val sums = row.getSeq[Long](1)
    val n = row.getLong(2)
    val mat = Array.ofDim[Double](dim, dim)
    var idx = 0
    for (i <- 0 until dim; j <- i until dim) {
      val c = (gram(idx).toDouble / fp
        - (sums(i).toDouble / fp) * (sums(j).toDouble / fp) / n) / (n - 1)
      mat(i)(j) = c; mat(j)(i) = c
      idx += 1
    }
    val mean = Array.tabulate(dim)(i => sums(i).toDouble / fp / n)
    val (vals, vecs) = jacobiEigen(mat)
    (mean, vals, vecs)
  }

  /** Gated query (rows-only): project every embedding onto the top-2
    * principal components. Correctness is pinned by PcaSpec
    * (orthonormality, eigen-residuals, driver-differential projection,
    * run-to-run determinism); the covariance feeding it IS
    * oracle-gated via q_covariance. */
  def pcaProject(spark: SparkSession, sfDir: String, k: Int = 2): DataFrame = {
    val emb = Tables.embeddings(spark, sfDir)
    val (mean, _, vecs) = fitFrom(emb)
    val comps = vecs.take(k)
    val offsets = comps.map(c => c.zip(mean).map { case (a, b) => a * b }.sum)
    val scoreCols = comps.zipWithIndex.map { case (c, ci) =>
      (dotProduct(col("embedding"), lit(c)) - lit(offsets(ci))).as(s"pc${ci + 1}")
    }
    emb.select(col("vec_id") +: scoreCols.toSeq: _*)
      .orderBy(col("vec_id"))
  }

  /** Hash-gateable CONTRACT view of the eigensolve (the hll_union-gate
    * pattern): the eigenvector digits are driver-FP and engine-private,
    * but what they must SATISFY is not. Per top-k component the gate
    * emits
    *  - `trace` — Σ diag of the ROUNDED covariance, summed in
    *    DECIMAL(20,9) (order-free, so DuckDB recomputes it bit-exactly
    *    from the same fixed-point moments the q_covariance oracle
    *    pins, surfaced as one exact double);
    *  - pinned-TRUE invariants evaluated on the actual data: columns
    *    orthonormal, eigen-residual ‖Av − λv‖∞ small, eigenvalues
    *    sorted non-increasing and non-negative, cumulative explained
    *    variance ≤ trace.
    * A broken eigensolve (wrong matrix, lost symmetry, bad rotation)
    * flips a boolean and the hash gate goes red. */
  def pcaContract(spark: SparkSession, sfDir: String, k: Int = 2): DataFrame = {
    import spark.implicits._
    val emb = Tables.embeddings(spark, sfDir)
    val covDf = covarianceGramian(emb)
      .withColumn("cov", round(col("cov"), 9)).cache()
    val trace = covDf.filter(col("i") === col("j"))
      .agg(sum(col("cov").cast("decimal(20,9)")).cast("double"))
      .collect()(0).getDouble(0)
    val mat = Array.ofDim[Double](dim, dim)
    covDf.collect().foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      mat(i)(j) = c; mat(j)(i) = c
    }
    covDf.unpersist()
    val (vals, vecs) = jacobiEigen(mat)
    def dotA(a: Array[Double], b: Array[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    val rows = (0 until k).map { c =>
      val v = vecs(c)
      val ortho = (0 until k).forall { d =>
        val expect = if (c == d) 1.0 else 0.0
        math.abs(dotA(v, vecs(d)) - expect) < 1e-9
      }
      val av = mat.map(row => dotA(row, v))
      val residual = av.zip(v.map(_ * vals(c)))
        .map { case (x, y) => math.abs(x - y) }.max < 1e-8
      val sorted = c == 0 || vals(c) <= vals(c - 1)
      val explainedOk = vals.take(c + 1).sum <= trace + 1e-9 && vals(c) >= -1e-12
      (c + 1, trace, ortho && residual && sorted && explainedOk)
    }
    rows.toDF("component", "trace", "invariants_hold")
      .orderBy(col("component"))
  }

  def pcaContractSql(k: Int = 2): String =
    s"""WITH e AS (
      |  SELECT vec_id, CAST(i AS INTEGER) AS i,
      |         CAST(embedding[CAST(i AS INTEGER) + 1] AS DOUBLE) AS x
      |  FROM embeddings, unnest(range(0, $dim)) AS t(i)),
      |m AS (
      |  SELECT i, CAST(sum(CAST(floor(x * 1e10) AS BIGINT)) AS BIGINT) AS si,
      |         count(*) AS n
      |  FROM e GROUP BY i),
      |dd AS (
      |  SELECT a.i AS i,
      |         CAST(sum(CAST(floor(a.x * a.x * 1e10) AS BIGINT)) AS BIGINT) AS sii
      |  FROM e a GROUP BY 1),
      |diag AS (
      |  SELECT round((CAST(dd.sii AS DOUBLE) / 1e10
      |           - (CAST(m.si AS DOUBLE) / 1e10) * (CAST(m.si AS DOUBLE) / 1e10) / m.n)
      |           / (m.n - 1), 9) AS cov
      |  FROM dd JOIN m ON dd.i = m.i),
      |tr AS (SELECT CAST(SUM(CAST(cov AS DECIMAL(20,9))) AS DOUBLE) AS trace FROM diag)
      |SELECT CAST(c AS INTEGER) AS component, tr.trace, TRUE AS invariants_hold
      |FROM (SELECT unnest(range(1, ${k + 1})) AS c), tr
      |ORDER BY component""".stripMargin
}
