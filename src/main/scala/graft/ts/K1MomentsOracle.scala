package graft.ts

import org.apache.commons.math3.distribution.TDistribution

/** DuckDB oracle SQL for the K1 PolyTrend classification computed from
  * sufficient statistics ([[PolyTrendMomentsAgg]] /
  * [[PolyTrend.classifyMoments]], reference semantics
  * `calculations/polytrend.py:286,298-306`).
  *
  * The whole decision ladder is closed-form over power sums: for degree
  * d ≤ 3 the normal equations (X'X)b = X'y solve by Cramer's rule over
  * the Hankel matrix [Σx^(j+k)], SSE is the moment identity
  * Σy² − b'X'y, and the leading-coefficient t-test
  * `p < α  ⟺  t² > t_crit(α, n−p)²` with
  * t² = b_d²·(n−p)·det / (SSE·cofactor_dd). The determinants are
  * expanded SYMBOLICALLY here (Leibniz/cofactor expansion — plain
  * math, shared with no JVM solver code) into SQL over the per-series
  * sums, so DuckDB reproduces the classification with an engine that
  * shares nothing with [[Ols]]'s Gauss-Jordan path.
  *
  * t_crit² values are standard two-sided Student-t critical values
  * (dof 1..4096, α = 0.05) — published statistical constants, embedded
  * as a list literal and indexed by dof. 4096 covers series ~45× longer
  * than sf0.1 produces (≤ 91 hourly buckets per user).
  *
  * The x basis matches the moments aggregate exactly:
  * x = (t − tmin) − (n−1)/2 over hourly buckets; with spans ≤ 719 h,
  * x⁶ ≤ 2.3e15 < 2^53, so the power sums are near-exact on both
  * engines and the integer classification flags cannot sit on a
  * float knife-edge.
  */
object K1MomentsOracle {

  /** Cofactor-expansion determinant over SQL-expression entries. */
  private def detSql(m: Vector[Vector[String]]): String =
    if (m.size == 1) m(0)(0)
    else (0 until m.size).map { j =>
      val minor = m.tail.map(r => r.take(j) ++ r.drop(j + 1))
      val term = s"${m(0)(j)} * (${detSql(minor)})"
      if (j == 0) term else if (j % 2 == 0) s"+ $term" else s"- $term"
    }.mkString("(", " ", ")")

  /** Per-degree pieces: (det, replaced-column dets for b_j, cofactor_dd). */
  private def degreePieces(d: Int): (String, Seq[String], String) = {
    val p = d + 1
    val m = Vector.tabulate(p, p)((j, k) => s"s${j + k}")
    val dets = (0 until p).map { j =>
      detSql(Vector.tabulate(p, p)((r, c) =>
        if (c == j) s"t$r" else s"s${r + c}"))
    }
    val minor = (0 until p).filter(_ != d).toVector
      .map(r => (0 until p).filter(_ != d).toVector.map(c => s"s${r + c}"))
    (detSql(m), dets, detSql(minor))
  }

  /** t_crit² list literal for two-sided α, dof 1..maxDof. */
  private def critSquares(alpha: Double, maxDof: Int): String =
    (1 to maxDof).map { dof =>
      val t = new TDistribution(dof.toDouble)
        .inverseCumulativeProbability(1.0 - alpha / 2.0)
      (t * t).toString
    }.mkString("[", ", ", "]")

  /** The oracle for the hourly-composite K1 MOMENTS path (x = true time
    * spacing, noise-guard scale = rms(y) — [[PolyTrend.classifyMoments]]).
    */
  def sql(alpha: Double = 0.05): String = classificationSql(
    xExpr = "tt - (n - 1) / 2.0",
    scaleExpr = "greatest(sqrt(greatest(sy2, 0) / n), 1e-300)",
    alpha)

  /** The oracle for the SORTED-SERIES K1 path ([[PolyTrendAgg]] /
    * [[PolyTrend.classify]]): x is the centered RANK index (sort by
    * bucket, 1..n − (n+1)/2) and the noise-guard scale is max|y| — the
    * two ways the buffer-the-series variant differs from the moments
    * variant on gapped series.
    */
  def rankSql(alpha: Double = 0.05): String = classificationSql(
    xExpr = "rn - (n + 1) / 2.0",
    scaleExpr = "greatest(may, 1e-300)",
    alpha)

  /** Oracle for the PolyTrend POINT decode
    * (`calculations/polytrend.py:346-354`): the sorted-series
    * classification PLUS the composited series `ts` itself, serialized
    * as comma-joined scaled integers (floor(y·10⁴ + 0.5) — identical
    * doubles floor identically on both engines, and BIGINT→VARCHAR
    * formatting is engine-independent, unlike double formatting).
    */
  def pointSql(alpha: Double = 0.05): String =
    s"""WITH base AS (
       |${rankSql(alpha)}
       |), ser AS (
       |  SELECT user_id,
       |         string_agg(CAST(CAST(floor(y * 10000 + 0.5) AS BIGINT)
       |                    AS VARCHAR), ',' ORDER BY hb) AS ts
       |  FROM (SELECT CAST(user_id AS BIGINT) AS user_id,
       |               CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hb,
       |               avg(value) AS y
       |        FROM events GROUP BY 1, 2)
       |  GROUP BY user_id)
       |SELECT b.user_id, s.ts, b.trend_type, b.slope, b.direction,
       |       b.significance, b.degree
       |FROM base b JOIN ser s USING (user_id)""".stripMargin

  /** Oracle for the PolyTrend summary statistics
    * (`calculations/utils.py:37-64` / TrendPipeline.ptStatistics) over
    * the sorted-series classification: counts per trend_type/direction
    * plus percentages. cnt·100.0/total is ONE division of exact
    * integers — identical IEEE result on both engines, so round(.,1)
    * agrees.
    */
  def statsSql(alpha: Double = 0.05): String = {
    def cnt(col: String, v: Int, as: String) =
      s"CAST(sum(CASE WHEN $col = $v THEN 1 ELSE 0 END) AS BIGINT) AS $as"
    s"""WITH base AS (
       |${rankSql(alpha)}
       |), c AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_total,
       |         ${cnt("trend_type", 1, "n_linear")},
       |         ${cnt("trend_type", 2, "n_quadratic")},
       |         ${cnt("trend_type", 3, "n_cubic")},
       |         ${cnt("trend_type", -1, "n_concealed")},
       |         ${cnt("trend_type", 0, "n_no_trend")},
       |         ${cnt("direction", 1, "n_positive")},
       |         ${cnt("direction", -1, "n_negative")}
       |  FROM base)
       |SELECT *,
       |       round(n_linear * 100.0 / n_total, 1) AS pct_linear,
       |       round(n_quadratic * 100.0 / n_total, 1) AS pct_quadratic,
       |       round(n_cubic * 100.0 / n_total, 1) AS pct_cubic,
       |       round(n_concealed * 100.0 / n_total, 1) AS pct_concealed,
       |       round(n_no_trend * 100.0 / n_total, 1) AS pct_no_trend
       |FROM c""".stripMargin
  }

  private def classificationSql(xExpr: String, scaleExpr: String,
      alpha: Double): String = {
    val (det1, d1, cof1) = degreePieces(1)
    val (det2, d2, cof2) = degreePieces(2)
    val (det3, d3, cof3) = degreePieces(3)
    def bty(ds: Seq[String]) = // b'X'y · det = Σ_j det_j · t_j
      ds.zipWithIndex.map { case (dj, j) => s"($dj) * t$j" }.mkString(" + ")
    s"""WITH h AS (
       |  SELECT user_id,
       |         CAST(floor(epoch(ts)) AS BIGINT) // 3600 AS hb,
       |         avg(value) AS y
       |  FROM events GROUP BY 1, 2),
       |w AS (
       |  SELECT user_id, y,
       |         hb - min(hb) OVER (PARTITION BY user_id) AS tt,
       |         row_number() OVER (PARTITION BY user_id ORDER BY hb) AS rn,
       |         count(*) OVER (PARTITION BY user_id) AS n
       |  FROM h),
       |xc AS (SELECT user_id, n, y, $xExpr AS x FROM w),
       |m AS (
       |  SELECT user_id, max(n) AS n, CAST(max(n) AS DOUBLE) AS s0,
       |         sum(x) AS s1, sum(x*x) AS s2, sum(x*x*x) AS s3,
       |         sum(x*x*x*x) AS s4, sum(x*x*x*x*x) AS s5,
       |         sum(x*x*x*x*x*x) AS s6,
       |         sum(y) AS t0, sum(x*y) AS t1, sum(x*x*y) AS t2,
       |         sum(x*x*x*y) AS t3,
       |         sum(y*y) AS sy2, max(abs(y)) AS may
       |  FROM xc GROUP BY user_id),
       |g AS (
       |  SELECT user_id, n,
       |         $scaleExpr AS scale,
       |         (${d1(1)}) / ($det1) AS slope,
       |         greatest(sy2 - (${bty(d1)}) / ($det1), 0) AS sse1,
       |         ($cof1) / ($det1) AS inv1,
       |         (${d2(2)}) / ($det2) AS b2,
       |         greatest(sy2 - (${bty(d2)}) / ($det2), 0) AS sse2,
       |         ($cof2) / ($det2) AS inv2,
       |         (${d3(3)}) / ($det3) AS b3,
       |         greatest(sy2 - (${bty(d3)}) / ($det3), 0) AS sse3,
       |         ($cof3) / ($det3) AS inv3
       |  FROM m WHERE n >= 6),
       |tc AS (SELECT ${critSquares(alpha, 4096)} AS c2s),
       |sg AS (
       |  SELECT user_id, slope,
       |    CASE WHEN sse1 * inv1 / (n - 2) <= 0 THEN slope <> 0
       |         ELSE slope * slope * (n - 2) / (sse1 * inv1)
       |              > c2s[CAST(n - 2 AS INT)] END AS slope_sig,
       |    ((CASE WHEN sse2 * inv2 / (n - 3) <= 0 THEN b2 <> 0
       |           ELSE b2 * b2 * (n - 3) / (sse2 * inv2)
       |                > c2s[CAST(n - 3 AS INT)] END)
       |      AND abs(b2) > 1e-10 * scale) AS sig2,
       |    ((CASE WHEN sse3 * inv3 / (n - 4) <= 0 THEN b3 <> 0
       |           ELSE b3 * b3 * (n - 4) / (sse3 * inv3)
       |                > c2s[CAST(n - 4 AS INT)] END)
       |      AND abs(b3) > 1e-10 * scale) AS sig3
       |  FROM g, tc)
       |SELECT CAST(user_id AS BIGINT) AS user_id,
       |       CAST(CASE WHEN sig3 THEN (CASE WHEN slope_sig THEN 3 ELSE -1 END)
       |                 WHEN sig2 THEN (CASE WHEN slope_sig THEN 2 ELSE -1 END)
       |                 WHEN slope_sig THEN 1 ELSE 0 END AS INT) AS trend_type,
       |       round(slope, 6) AS slope,
       |       CAST(CASE WHEN slope < 0 THEN -1 ELSE 1 END AS INT) AS direction,
       |       CAST(CASE WHEN slope_sig THEN 1 ELSE -1 END AS INT) AS significance,
       |       CAST(CASE WHEN sig3 THEN 3 WHEN sig2 THEN 2 ELSE 1 END AS INT) AS degree
       |FROM sg""".stripMargin
  }
}
