package graft.ops

/** Top-k PCA basis of a (small, d×d) covariance matrix by FIXED-BUDGET
  * orthogonal iteration — the driver-side step between the distributed
  * covariance pass (SimilarityOps.covariancePairs: one corpus scan,
  * d²-bounded output) and the distributed projection apply. The model
  * is k·d doubles: broadcast scale, like the IVF centroid matrix.
  *
  * Algorithm (deterministic, and replayed VERBATIM by the DuckDB
  * oracle's recursive CTE so both engines derive the bit-identical
  * basis — the ivfCentroids playbook):
  *  - component kk runs `iters` power steps from the fixed start
  *    vector (1/√d, … ); each step computes w = C·v with ascending-j
  *    left-associated sums, then orthogonalizes w against the already
  *    PUBLISHED components in one classical Gram-Schmidt expression
  *    (w_i − (dp_0·q_0i + dp_1·q_1i + …), ascending m — not the
  *    sequential modified-GS order), then normalizes;
  *  - finalize: sign-fix so the largest-|coordinate| (lowest index on
  *    ties) is positive, publish the component rounded to 6 dp
  *    (−0 normalized away), and publish λ = svᵀC·sv (Rayleigh on the
  *    ORIGINAL covariance = the variance the component captures),
  *    rounded to 6 dp.
  *
  * No deflation: orthogonalizing each iterate against the published
  * components pins pairwise orthogonality to rounding level even when
  * the spectrum is near-degenerate (power iteration alone separates
  * O((λ2/λ1)^T) — useless at a 1.5% eigengap, where any orthonormal
  * basis of the top eigenspace is an equally valid answer). Floats are
  * never rounded mid-iteration: both engines run the same IEEE ops in
  * the same textual order, so only the published outputs round.
  */
object PcaOps {

  final case class PcaModel(components: Array[Array[Double]],
                            variances: Array[Double])

  private def round6(x: Double): Double = {
    // Spark's round(): BigDecimal.valueOf (shortest repr) + HALF_UP —
    // the same semantics DuckDB's round() matches across the oracle
    val r = java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()
    if (r == 0.0) 0.0 else r // noNegZero
  }

  /** Fit the top-`k` basis of symmetric `cov` with `iters` orthogonal-
    * iteration steps per component. */
  def fit(cov: Array[Array[Double]], k: Int, iters: Int): PcaModel = {
    val d = cov.length
    val start = Array.fill(d)(1.0 / math.sqrt(d.toDouble))
    val comps = Array.ofDim[Double](k, d)
    val vars = new Array[Double](k)

    def matvec(v: Array[Double]): Array[Double] =
      Array.tabulate(d) { i =>
        var s = 0.0; var j = 0
        while (j < d) { s += cov(i)(j) * v(j); j += 1 }
        s
      }

    var kk = 0
    while (kk < k) {
      var v = start.clone()
      var t = 0
      while (t < iters) {
        val w = matvec(v)
        // classical GS against published components, ascending m,
        // as ONE left-associated subtraction per coordinate
        val dp = Array.tabulate(kk) { m =>
          var s = 0.0; var i = 0
          while (i < d) { s += w(i) * comps(m)(i); i += 1 }
          s
        }
        val wo = Array.tabulate(d) { i =>
          var corr = 0.0; var m = 0
          while (m < kk) { corr += dp(m) * comps(m)(i); m += 1 }
          w(i) - corr
        }
        var sq = 0.0
        var i = 0
        while (i < d) { sq += wo(i) * wo(i); i += 1 }
        val nrm = math.sqrt(sq)
        if (nrm != 0.0) v = wo.map(_ / nrm)
        t += 1
      }
      val mx = v.map(math.abs).max
      val lead = v.indexWhere(x => math.abs(x) == mx)
      val sgn = if (lead >= 0 && v(lead) < 0) -1.0 else 1.0
      val sv = v.map(sgn * _)
      val w2 = matvec(sv)
      var lam = 0.0
      var i = 0
      while (i < d) { lam += sv(i) * w2(i); i += 1 }
      comps(kk) = sv.map(round6)
      vars(kk) = round6(lam)
      kk += 1
    }
    PcaModel(comps, vars)
  }

  /** Build the full symmetric d×d matrix from the upper-triangle rows
    * SimilarityOps.covariancePairs emits ((i, j, cov) with j ≥ i, cov
    * already rounded to 6 dp — the SAME values the oracle's covariance
    * CTE derives, so both fits start from identical doubles). */
  def matrixFromUpper(rows: Seq[(Int, Int, Double)], d: Int): Array[Array[Double]] = {
    val m = Array.ofDim[Double](d, d)
    rows.foreach { case (i, j, c) => m(i)(j) = c; m(j)(i) = c }
    m
  }
}
