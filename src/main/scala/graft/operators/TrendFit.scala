package graft.operators

import graft.functions.Num._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** W8 full form: per-series polynomial trend via OLS (reference synthesizes a
  * degree-`poly_degree` polynomial trend per series,
  * models/diffusion_ts_model.py:200-239, config.json:22 → degree 3).
  *
  * Because every series shares the same regular time grid 0..L-1, the design
  * matrix is constant — so the projection (XᵀX)⁻¹Xᵀ is computed ONCE on the
  * driver (the engine's analogue of the reference's plan-time buffer
  * precomputation, SURVEY.md §4) and embedded as literal weight arrays. Each
  * polynomial coefficient is then just a weighted sum over the series — one
  * hash-agg, no per-series matrix solve anywhere near the data.
  *
  * Scale: coefficient extraction is a single partial-aggregating pass keyed by
  * series; trend reconstruction is a broadcast join of the 4-number coefficient
  * row back to the grid. Nothing grows with #series but the agg itself.
  */
object TrendFit {
  val Degree = 3 // config.json:22

  /** Projection weights W = (XᵀX)⁻¹Xᵀ for basis [1, u, u², u³], u = t/(L-1). */
  def projectionWeights(seqLen: Int, degree: Int = Degree): Array[Array[Double]] = {
    val n = degree + 1
    val xs = (0 until seqLen).map(t => t.toDouble / (seqLen - 1))
    // XtX[i][j] = Σ u^(i+j); XtX is (n x n) symmetric
    val xtx = Array.tabulate(n, n)((i, j) => xs.map(u => math.pow(u, i + j)).sum)
    val inv = invert(xtx)
    // W[j][t] = Σ_k inv[j][k] * u_t^k
    Array.tabulate(n, seqLen)((j, t) =>
      (0 until n).map(k => inv(j)(k) * math.pow(xs(t), k)).sum)
  }

  /** Gauss-Jordan inverse for the tiny (degree+1)² normal-equation matrix. */
  private def invert(m0: Array[Array[Double]]): Array[Array[Double]] = {
    val n = m0.length
    val a = m0.map(_.clone())
    val inv = Array.tabulate(n, n)((i, j) => if (i == j) 1.0 else 0.0)
    for (col <- 0 until n) {
      val piv = (col until n).maxBy(r => math.abs(a(r)(col)))
      val tmp = a(col); a(col) = a(piv); a(piv) = tmp
      val tmpI = inv(col); inv(col) = inv(piv); inv(piv) = tmpI
      val p = a(col)(col)
      for (j <- 0 until n) { a(col)(j) /= p; inv(col)(j) /= p }
      for (r <- 0 until n if r != col) {
        val f = a(r)(col)
        for (j <- 0 until n) { a(r)(j) -= f * a(col)(j); inv(r)(j) -= f * inv(col)(j) }
      }
    }
    inv
  }

  /** Fit + reconstruct: (series_id, t, value, trend, residual). `df` must be a
    * long series frame with columns (series_id, t, value) on the 0..L-1 grid.
    */
  def polyTrend(spark: SparkSession, df: DataFrame, seqLen: Int): DataFrame = {
    val w = projectionWeights(seqLen)
    val coefAggs = w.indices.map { j =>
      sum(element_at(typedlit(w(j).toSeq), col("t") + 1) * col("value")).as(s"c$j")
    }
    val coefs = df.groupBy("series_id").agg(coefAggs.head, coefAggs.tail: _*)
    val u = col("t").cast("double") / lit((seqLen - 1).toDouble)
    val trend = w.indices.map(j => col(s"c$j") * pow(u, j.toDouble)).reduce(_ + _)
    df.join(broadcast(coefs), "series_id")
      .select(col("series_id"), col("t"), col("value"),
        r6(trend).as("trend"),
        r6(col("value") - trend).as("residual"))
  }

  /** Same computation as DuckDB SQL over a CTE named `ds(series_id, t, value)`. */
  def polyTrendSql(seqLen: Int): String = {
    val w = projectionWeights(seqLen)
    def arr(ws: Array[Double]): String = ws.map(sqlD).mkString("[", ", ", "]")
    val coefExprs = w.indices.map { j =>
      s"sum((${arr(w(j))})[t + 1] * value) AS c$j"
    }.mkString(",\n       |         ")
    val u = s"(CAST(t AS DOUBLE) / ${sqlD((seqLen - 1).toDouble)})"
    val trend = w.indices.map(j => s"c$j * pow($u, ${sqlD(j.toDouble)})").mkString(" + ")
    s"""coefs AS (
       |  SELECT series_id,
       |         $coefExprs
       |  FROM ds GROUP BY series_id
       |)
       |SELECT ds.series_id, ds.t, ds.value,
       |       ${sqlR6(trend)} AS trend,
       |       ${sqlR6(s"ds.value - ($trend)")} AS residual
       |FROM ds JOIN coefs USING (series_id)
       |ORDER BY series_id, t""".stripMargin
  }

  private val L = 64

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_poly_trend" -> ((s, _) =>
      polyTrend(s, Generators.dataset(s, "linear_sum", 50, L), L).orderBy("series_id", "t"))
  )

  def oracles: Map[String, String] = Map(
    "ts_poly_trend" ->
      s"""WITH ds AS (${Generators.datasetSqlCore("linear_sum", 50, L)}),
         |${polyTrendSql(L)}""".stripMargin
  )
}
