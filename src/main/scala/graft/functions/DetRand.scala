package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, cross-engine pseudo-random columns (SURVEY.md §7.2).
  *
  * The reference draws its generator parameters from `np.random.uniform` /
  * `torch.randn` (/root/reference/utils/data_generators.py:60-101). Oracle-checked
  * queries are re-executed by DuckDB, so engine-native `rand()` is out: instead we
  * use a 2-round LCG (Marsaglia multiplier 69069, mod 2^31) built ONLY from IEEE754
  * ops that are exactly specified (`*`, `+`, `-`, `floor`, `/`): every intermediate
  * stays below 2^53, so Spark and DuckDB compute bit-identical doubles.
  *
  * Gaussians come from Box-Muller over two uniform streams; `log`/`cos` are libm
  * calls (≤1 ulp cross-engine skew), which downstream rounding absorbs — see
  * [[Num.r6]].
  *
  * Keys must satisfy |key| < 2e11 so that key*40503 stays exact.
  */
object DetRand {
  val M = 2147483648.0 // 2^31

  private def fmod(x: Column): Column = x - floor(x / M).cast("double") * M
  private def lcg(x: Column): Column = fmod(x * 69069.0 + 12345.0)

  /** Uniform (0,1), bit-identical in Spark and DuckDB ([[sqlU01]]).
    *
    * The first multiplier is stream-dependent: with a shared multiplier,
    * consecutive streams of the same key stay a constant offset apart through
    * every (affine) LCG round — Box-Muller over such a pair collapses to a 1-D
    * transform and biases the Gaussian mean (caught by GeneratorsSpec's
    * white-noise moments test). Distinct multipliers per stream break the
    * affine relation.
    */
  def u01(key: Column, stream: Int): Column = {
    val seed = fmod(key * 40503.0 + stream.toDouble * 30011.0 + 12345.0)
    (lcg(lcg(fmod(seed * (69069.0 + 2.0 * stream)))) + 0.5) / M
  }

  def uniform(key: Column, stream: Int, lo: Double, hi: Double): Column =
    u01(key, stream) * (hi - lo) + lo

  /** Standard normal via Box-Muller; consumes streams 2s and 2s+1. */
  def gauss(key: Column, stream: Int): Column = {
    val u1 = u01(key, 2 * stream)
    val u2 = u01(key, 2 * stream + 1)
    sqrt(lit(-2.0) * log(u1)) * cos(lit(2.0 * math.Pi) * u2)
  }

  // ---- DuckDB SQL twins (same arithmetic, same op order) ----

  def sqlFmod(x: String): String =
    s"(($x) - floor(($x)/2147483648.0)*2147483648.0)"
  def sqlLcg(x: String): String = sqlFmod(s"($x)*69069.0 + 12345.0")
  def sqlU01(key: String, stream: Int): String = {
    val seed = sqlFmod(s"($key)*40503.0 + $stream.0*30011.0 + 12345.0")
    s"((${sqlLcg(sqlLcg(sqlFmod(s"($seed)*${69069.0 + 2.0 * stream}")))}) + 0.5)/2147483648.0"
  }
  def sqlUniform(key: String, stream: Int, lo: Double, hi: Double): String =
    s"((${sqlU01(key, stream)})*(${Num.sqlD(hi - lo)}) + (${Num.sqlD(lo)}))"
  def sqlGauss(key: String, stream: Int): String =
    s"(sqrt(-2.0*ln(${sqlU01(key, 2 * stream)}))*cos(${Num.sqlD(2.0 * math.Pi)}*(${sqlU01(key, 2 * stream + 1)})))"
}

/** Cross-engine-stable rounding: `floor(x*10^n + 0.5)/10^n` uses only exactly
  * specified IEEE754 ops, so Spark and DuckDB agree bit-for-bit (unlike each
  * engine's own `round`, whose half-way tie handling differs on shortest-repr
  * boundaries). Used on every double column that the DuckDB oracle hashes.
  */
object Num {
  def r(c: Column, n: Int): Column = {
    val p = math.pow(10, n)
    floor(c * p + 0.5) / p
  }
  def r6(c: Column): Column = r(c, 6)
  def r4(c: Column): Column = r(c, 4)

  def sqlR(x: String, n: Int): String = s"(floor(($x)*1e$n + 0.5)/1e$n)"
  def sqlR6(x: String): String = sqlR(x, 6)
  def sqlR4(x: String): String = sqlR(x, 4)

  /** Order-independent float aggregation: quantize each term to a LONG at
    * 10^-n resolution BEFORE summing, so the group sum is integer arithmetic —
    * associative and commutative — and its value cannot depend on partial-merge
    * order. Plain `sum(double)` over a GROUP BY accumulates partials in
    * shuffle-fetch (Spark) / thread-completion (DuckDB) order, so a sum landing
    * within float-noise of an `r6` boundary flips between runs of the SAME
    * engine on the SAME data (observed: DuckDB on ts_decompose_dim). The
    * caller divides the summed long back by 10^n (exact for |sum| < 2^53) and
    * is responsible for the overflow bound: max|term|·10^n · group-size must
    * stay far below 2^63.
    */
  def fx(c: Column, n: Int): Column = floor(c * math.pow(10, n) + 0.5).cast("long")
  def fx9(c: Column): Column = fx(c, 9)
  /** DuckDB twin of [[fx]]; `sum` of BIGINT yields HUGEINT there, so the
    * un-scaling in the caller must CAST to DOUBLE before dividing.
    */
  def sqlFx(x: String, n: Int): String = s"CAST(floor(($x)*1e$n + 0.5) AS BIGINT)"
  def sqlFx9(x: String): String = sqlFx(x, 9)

  /** Double literal for DuckDB SQL. A bare `6.283185307179586` parses as
    * DECIMAL(16,15) there (decimal arithmetic then overflows / loses double
    * semantics); e-notation forces DOUBLE.
    */
  def sqlD(d: Double): String = {
    val s = d.toString
    if (s.contains('E') || s.contains('e')) s else s + "e0"
  }
}
