package graft.operators

import graft.functions.{DetRand => R}
import graft.functions.Num._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Set-oriented synthetic time-series sources (SURVEY.md §2.1, G1-G11).
  *
  * The reference builds each series in a Python loop
  * (/root/reference/utils/data_generators.py:58-108); here one declarative
  * `range(n) × range(seqLen)` job generates the whole batch, so Catalyst/Tungsten
  * parallelize it — the single deliberate non-translation (SURVEY §2.6 S6).
  * Random parameters come from [[graft.functions.DetRand]] so the DuckDB oracle
  * reproduces them bit-for-bit (§7.2).
  *
  * Param streams: 0=freq1 U(2,4), 1=freq2 U(2,4), 2=phase1 U(0,2π), 3=phase2
  * U(0,2π), 4=amp1 U(0.3,0.7), 5=amp2 U(0.3,0.7), 6..8=a1..a3 U(0.2,0.8),
  * 9=start U(0.5,1), 10=end U(-1,0), 11=noise_level U(0.05,0.15), 12=family pick;
  * per-cell Gaussian noise is keyed by series_id*seqLen+t on stream 20
  * (all U(a,b) ranges from data_generators.py:60-101).
  *
  * Scale: `spark.range(n)` partitions the series axis across executors; the tiny
  * time grid is broadcast for the cross join, so no shuffle is needed until a
  * per-series aggregate (z-score) — which shuffles by series_id, the natural key.
  */
object Generators {
  val TwoPi: Double = 2.0 * math.Pi
  val FourPi: Double = 4.0 * math.Pi
  val LambdaDecay = 0.5 // data_generators.py:44 default

  val DefaultN = 100 // oracle-checked scale; gen_parity uses the config.json 10000x512
  val DefaultL = 256

  private def sid = col("series_id")
  private def sidD = col("series_id").cast("double")

  /** Partition count sized to the generated cell count. Tiny fixtures must not
    * inherit cluster-width parallelism: a 3,200-row frame spread over 32 range
    * partitions costs far more in scheduling + per-query sort-sampling than in
    * compute. Large generations (gen_parity: 5.12M cells) still fan out to the
    * full default parallelism.
    */
  private[graft] def rangeParts(spark: SparkSession, cells: Long): Int =
    math.max(1, math.min((cells / 65536L + 1).toInt,
      spark.sparkContext.defaultParallelism))

  /** G1: grid of (series_id, t, time) with time = t * (4π/(L-1)). */
  def grid(spark: SparkSession, n: Long, seqLen: Int): DataFrame = {
    val step = FourPi / (seqLen - 1)
    spark.range(0, n, 1, rangeParts(spark, n * seqLen))
      .withColumnRenamed("id", "series_id")
      .crossJoin(broadcast(spark.range(seqLen).select(col("id").cast("int").as("t"))))
      .withColumn("time", col("t").cast("double") * lit(step))
  }

  /** The raw (pre-noise) signal for one function family, as a Column over a grid
    * row. `customDecay` is the U1 extension point (data_generators.py:43,92-93):
    * any `Column => Column` envelope, pure-column so Catalyst still optimizes.
    */
  def signal(family: String, customDecay: Option[Column => Column] = None): Column = {
    val time = col("time")
    val freq1 = R.uniform(sidD, 0, 2.0, 4.0)
    val freq2 = R.uniform(sidD, 1, 2.0, 4.0)
    val phase1 = R.uniform(sidD, 2, 0.0, TwoPi)
    val phase2 = R.uniform(sidD, 3, 0.0, TwoPi)
    family match {
      case "sine" => sin(freq1 * time + phase1)
      case "cosine" => cos(freq1 * time + phase1)
      case "mixed" =>
        R.uniform(sidD, 4, 0.3, 0.7) * sin(freq1 * time + phase1) +
          R.uniform(sidD, 5, 0.3, 0.7) * cos(freq2 * time + phase2)
      case "exponential_decay" =>
        exp(lit(-LambdaDecay) * time / lit(FourPi)) * sin(freq1 * time + phase1)
      case "linear_sum" =>
        val a1 = R.uniform(sidD, 6, 0.2, 0.8)
        val a2 = R.uniform(sidD, 7, 0.2, 0.8)
        val a3 = R.uniform(sidD, 8, 0.2, 0.8)
        val st = R.uniform(sidD, 9, 0.5, 1.0)
        val en = R.uniform(sidD, 10, -1.0, 0.0)
        val x = st + (en - st) * col("frac")
        a1 * x + a2 * sin(lit(TwoPi) * time + phase1) + a3 * cos(lit(FourPi) * time + phase2)
      case "custom_decay" =>
        val dec = customDecay.map(f => f(time))
          .getOrElse(lit(1.0) / (lit(1.0) + lit(LambdaDecay) * time))
        dec * (sin(freq1 * time + phase1) + lit(0.3) * cos(freq2 * time + phase2))
      case other => throw new IllegalArgumentException(s"unknown family: $other")
    }
  }

  /** Full reference pipeline for one family: signal + noise_level·N(0,1), then
    * per-series z-score with sample std (data_generators.py:98-104, §7.6.6).
    */
  def dataset(spark: SparkSession, family: String, n: Long = DefaultN,
              seqLen: Int = DefaultL, normalize: Boolean = true): DataFrame = {
    val cell = sidD * seqLen + col("t")
    val base = grid(spark, n, seqLen)
      .withColumn("frac", col("t").cast("double") * lit(1.0 / (seqLen - 1)))
      .withColumn("raw", signal(family))
      .withColumn("noisy", col("raw") + R.uniform(sidD, 11, 0.05, 0.15) * R.gauss(cell, 10))
    val out =
      if (!normalize) base.withColumn("value", col("noisy"))
      else {
        val w = Window.partitionBy("series_id")
        base
          .withColumn("mu", avg("noisy").over(w))
          .withColumn("sigma", stddev_samp(col("noisy")).over(w))
          .withColumn("value", (col("noisy") - col("mu")) / (col("sigma") + lit(1e-8)))
      }
    out.select(sid, col("t"), r6(col("value")).as("value"))
  }

  /** G9: labeled dataset — function family drawn per series, label = family index
    * into ['sine','cosine','mixed','exponential_decay'] (data_generators.py:111-147).
    */
  def labeled(spark: SparkSession, n: Long = 200, seqLen: Int = DefaultL): DataFrame = {
    val cell = sidD * seqLen + col("t")
    val fam = floor(R.u01(sidD, 12) * 4.0).cast("int")
    val sig = when(col("label") === 0, signal("sine"))
      .when(col("label") === 1, signal("cosine"))
      .when(col("label") === 2, signal("mixed"))
      .otherwise(signal("exponential_decay"))
    val w = Window.partitionBy("series_id")
    grid(spark, n, seqLen)
      .withColumn("label", fam)
      .withColumn("noisy", sig + R.uniform(sidD, 11, 0.05, 0.15) * R.gauss(cell, 10))
      .withColumn("mu", avg("noisy").over(w))
      .withColumn("sigma", stddev_samp(col("noisy")).over(w))
      .select(sid, col("label"), col("t"),
        r6((col("noisy") - col("mu")) / (col("sigma") + lit(1e-8))).as("value"))
  }

  /** G10: fixed-parameter demo families with shared signal + 0.1·N(0,1) noise
    * (diffusion_ts_model.py:777-816). One output per (family, series, t).
    */
  def demo(spark: SparkSession, n: Long = 32, seqLen: Int = DefaultL): DataFrame = {
    val time = col("time")
    val famSig: Seq[(String, Int, Column)] = Seq(
      ("sine", 0, sin(time)),
      ("cosine", 1, cos(time)),
      ("mixed", 2, lit(0.5) * sin(time) + lit(0.3) * cos(lit(2.0) * time)),
      ("exponential", 3, exp(lit(-0.5) * time / lit(FourPi)) * sin(time)))
    famSig.map { case (name, fi, sig) =>
      val cell = (lit(fi.toDouble) * n + sidD) * seqLen + col("t")
      grid(spark, n, seqLen)
        .select(lit(name).as("family"), sid, col("t"),
          r6(sig + lit(0.1) * R.gauss(cell, 10)).as("value"))
    }.reduce(_ union _)
  }

  /** Multivariate dataset — the reference contract is (batch, seq_len,
    * input_dim) with dim > 1 supported (diffusion_ts_model.py:480,757); SURVEY
    * §1.3 reserves the `dim_id` column. Dims are independent parameter/noise
    * streams: generated as n·d flat series in ONE set-oriented job, then the
    * flat id unpacks to (series_id, dim_id) — no per-dim loop, no extra scan.
    */
  def multivariate(spark: SparkSession, family: String = "mixed", n: Long = 50,
                   seqLen: Int = 64, d: Int = 3): DataFrame =
    dataset(spark, family, n * d, seqLen)
      .select(floor(col("series_id") / d).cast("long").as("series_id"),
        (col("series_id") % d).cast("int").as("dim_id"), col("t"), col("value"))

  /** DuckDB twin of [[multivariate]] (no ORDER BY, embeddable as a CTE). */
  def multivariateSqlCore(family: String, n: Long, seqLen: Int, d: Int): String =
    s"""WITH flat AS (${datasetSqlCore(family, n * d, seqLen)})
       |SELECT CAST(floor(series_id / $d) AS BIGINT) AS series_id,
       |       CAST(series_id % $d AS INT) AS dim_id, t, value
       |FROM flat""".stripMargin

  /** G11: white-noise diffusion start x ~ N(0,1) (diffusion_ts_model.py:760). */
  def whiteNoise(spark: SparkSession, n: Long = DefaultN, seqLen: Int = DefaultL): DataFrame =
    grid(spark, n, seqLen)
      .select(sid, col("t"), r6(R.gauss(sidD * seqLen + col("t"), 0)).as("value"))

  /** P6: sinusoidal positional-encoding features (diffusion_ts_model.py:106-121). */
  def posEncoding(spark: SparkSession, maxLen: Int = DefaultL, dModel: Int = 256): DataFrame = {
    val c = -math.log(10000.0) / dModel
    spark.range(0, maxLen, 1, rangeParts(spark, maxLen.toLong * dModel / 2))
      .select(col("id").cast("int").as("pos"))
      .crossJoin(broadcast(spark.range(dModel / 2).select(col("id").cast("int").as("i"))))
      .withColumn("div_term", exp(col("i") * lit(2.0) * lit(c)))
      .select(col("pos"), col("i"),
        r6(sin(col("pos") * col("div_term"))).as("pe_sin"),
        r6(cos(col("pos") * col("div_term"))).as("pe_cos"))
  }

  /** P7: sinusoidal timestep embedding (diffusion_ts_model.py:134-150). */
  def timestepEmbedding(spark: SparkSession, timesteps: Int = 500, dim: Int = 256): DataFrame = {
    val half = dim / 2
    val c = -math.log(10000.0) / (half - 1)
    spark.range(0, timesteps, 1, rangeParts(spark, timesteps.toLong * half))
      .select(col("id").cast("int").as("step"))
      .crossJoin(broadcast(spark.range(half).select(col("id").cast("int").as("i"))))
      .withColumn("emb", exp(col("i") * lit(c)))
      .select(col("step"), col("i"),
        r6(sin(col("step") * col("emb"))).as("emb_sin"),
        r6(cos(col("step") * col("emb"))).as("emb_cos"))
  }

  // ---------------- DuckDB oracle twins ----------------

  /** Shared SQL fragments. `sidD`/`cell` etc. must mirror the Column builders above
    * operation-for-operation.
    */
  private def gridSql(n: Long, seqLen: Int): String = {
    val step = sqlD(FourPi / (seqLen - 1))
    s"""grid AS (
       |  SELECT CAST(s.i AS BIGINT) AS series_id, CAST(g.j AS INT) AS t,
       |         CAST(g.j AS DOUBLE) * $step AS time,
       |         CAST(g.j AS DOUBLE) * ${sqlD(1.0 / (seqLen - 1))} AS frac
       |  FROM range(0, $n) s(i) CROSS JOIN range(0, $seqLen) g(j)
       |)""".stripMargin
  }

  private def sd = "CAST(series_id AS DOUBLE)"

  private def signalSql(family: String): String = {
    val freq1 = R.sqlUniform(sd, 0, 2.0, 4.0)
    val freq2 = R.sqlUniform(sd, 1, 2.0, 4.0)
    val phase1 = R.sqlUniform(sd, 2, 0.0, TwoPi)
    val phase2 = R.sqlUniform(sd, 3, 0.0, TwoPi)
    family match {
      case "sine" => s"sin($freq1 * time + $phase1)"
      case "cosine" => s"cos($freq1 * time + $phase1)"
      case "mixed" =>
        s"${R.sqlUniform(sd, 4, 0.3, 0.7)} * sin($freq1 * time + $phase1) + " +
          s"${R.sqlUniform(sd, 5, 0.3, 0.7)} * cos($freq2 * time + $phase2)"
      case "exponential_decay" =>
        s"exp(${sqlD(-LambdaDecay)} * time / ${sqlD(FourPi)}) * sin($freq1 * time + $phase1)"
      case "linear_sum" =>
        val st = R.sqlUniform(sd, 9, 0.5, 1.0)
        val en = R.sqlUniform(sd, 10, -1.0, 0.0)
        s"${R.sqlUniform(sd, 6, 0.2, 0.8)} * (($st) + (($en) - ($st)) * frac) + " +
          s"${R.sqlUniform(sd, 7, 0.2, 0.8)} * sin(${sqlD(TwoPi)} * time + $phase1) + " +
          s"${R.sqlUniform(sd, 8, 0.2, 0.8)} * cos(${sqlD(FourPi)} * time + $phase2)"
      case "custom_decay" =>
        s"(1.0e0 / (1.0e0 + ${sqlD(LambdaDecay)} * time)) * " +
          s"(sin($freq1 * time + $phase1) + 0.3e0 * cos($freq2 * time + $phase2))"
    }
  }

  /** The dataset pipeline as a reusable SQL SELECT (no ORDER BY) so other
    * modules (Diffusion, Metrics, Reshape) can embed it as a CTE.
    */
  def datasetSqlCore(family: String, n: Long, seqLen: Int): String = {
    val cell = s"($sd * $seqLen + t)"
    s"""WITH ${gridSql(n, seqLen)},
       |noisy_t AS (
       |  SELECT series_id, t,
       |         (${signalSql(family)}) + ${R.sqlUniform(sd, 11, 0.05, 0.15)} * ${R.sqlGauss(cell, 10)} AS noisy
       |  FROM grid
       |), z AS (
       |  SELECT series_id, t,
       |         avg(noisy) OVER (PARTITION BY series_id) AS mu,
       |         stddev_samp(noisy) OVER (PARTITION BY series_id) AS sigma,
       |         noisy
       |  FROM noisy_t
       |)
       |SELECT series_id, t, ${sqlR6("(noisy - mu) / (sigma + 1e-8)")} AS value
       |FROM z""".stripMargin
  }

  private def datasetSql(family: String, n: Long, seqLen: Int): String =
    datasetSqlCore(family, n, seqLen) + " ORDER BY series_id, t"

  private def labeledSql(n: Long, seqLen: Int): String = {
    val cell = s"($sd * $seqLen + t)"
    s"""WITH ${gridSql(n, seqLen)},
       |lab AS (
       |  SELECT *, CAST(floor((${R.sqlU01(sd, 12)}) * 4.0e0) AS INT) AS label FROM grid
       |), noisy_t AS (
       |  SELECT series_id, label, t,
       |         (CASE label WHEN 0 THEN ${signalSql("sine")} WHEN 1 THEN ${signalSql("cosine")}
       |               WHEN 2 THEN ${signalSql("mixed")} ELSE ${signalSql("exponential_decay")} END)
       |          + ${R.sqlUniform(sd, 11, 0.05, 0.15)} * ${R.sqlGauss(cell, 10)} AS noisy
       |  FROM lab
       |), z AS (
       |  SELECT series_id, label, t,
       |         avg(noisy) OVER (PARTITION BY series_id) AS mu,
       |         stddev_samp(noisy) OVER (PARTITION BY series_id) AS sigma, noisy
       |  FROM noisy_t
       |)
       |SELECT series_id, label, t, ${sqlR6("(noisy - mu) / (sigma + 1e-8)")} AS value
       |FROM z ORDER BY series_id, t""".stripMargin
  }

  private def demoSql(n: Long, seqLen: Int): String = {
    val fams = Seq(
      ("sine", 0, "sin(time)"),
      ("cosine", 1, "cos(time)"),
      ("mixed", 2, "0.5e0 * sin(time) + 0.3e0 * cos(2.0e0 * time)"),
      ("exponential", 3, s"exp(-0.5e0 * time / ${sqlD(FourPi)}) * sin(time)"))
    val parts = fams.map { case (name, fi, sig) =>
      val cell = s"((${sqlD(fi.toDouble)} * $n + $sd) * $seqLen + t)"
      s"""SELECT '$name' AS family, series_id, t,
         |       ${sqlR6(s"($sig) + 0.1e0 * ${R.sqlGauss(cell, 10)}")} AS value
         |FROM grid""".stripMargin
    }
    s"WITH ${gridSql(n, seqLen)}\n" + parts.mkString("", "\nUNION ALL\n", "\nORDER BY family, series_id, t")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val fams = Seq("sine", "cosine", "mixed", "exponential_decay", "linear_sum", "custom_decay")
    val famQs = fams.map { f =>
      s"gen_$f" -> ((s: SparkSession, _: String) => dataset(s, f).orderBy("series_id", "t"))
    }.toMap
    famQs ++ Map(
      "gen_timegrid" -> ((s: SparkSession, _: String) =>
        grid(s, 1, DefaultL).select(col("t"), r6(col("time")).as("time")).orderBy("t")),
      "gen_labeled" -> ((s: SparkSession, _: String) => labeled(s).orderBy("series_id", "t")),
      "gen_multivariate" -> ((s: SparkSession, _: String) =>
        multivariate(s).orderBy("series_id", "dim_id", "t")),
      "gen_demo" -> ((s: SparkSession, _: String) => demo(s).orderBy("family", "series_id", "t")),
      "gen_whitenoise" -> ((s: SparkSession, _: String) => whiteNoise(s).orderBy("series_id", "t")),
      "gen_parity" -> ((s: SparkSession, _: String) =>
        dataset(s, "linear_sum", 10000, 512).orderBy("series_id", "t")),
      "feat_posenc" -> ((s: SparkSession, _: String) => posEncoding(s).orderBy("pos", "i")),
      "feat_timestep_emb" -> ((s: SparkSession, _: String) => timestepEmbedding(s).orderBy("step", "i"))
    )
  }

  def oracles: Map[String, String] = {
    val fams = Seq("sine", "cosine", "mixed", "exponential_decay", "linear_sum", "custom_decay")
    val famOs = fams.map { f => s"gen_$f" -> datasetSql(f, DefaultN, DefaultL) }.toMap
    val posencC = sqlD(-math.log(10000.0) / 256)
    val tsC = sqlD(-math.log(10000.0) / (128 - 1))
    famOs ++ Map(
      "gen_timegrid" ->
        s"""SELECT CAST(j AS INT) AS t, ${sqlR6(s"CAST(j AS DOUBLE) * ${sqlD(FourPi / (DefaultL - 1))}")} AS time
           |FROM range(0, $DefaultL) g(j) ORDER BY t""".stripMargin,
      "gen_labeled" -> labeledSql(200, DefaultL),
      "gen_multivariate" ->
        (multivariateSqlCore("mixed", 50, 64, 3) + " ORDER BY series_id, dim_id, t"),
      "gen_demo" -> demoSql(32, DefaultL),
      "gen_whitenoise" ->
        s"""WITH ${gridSql(DefaultN, DefaultL)}
           |SELECT series_id, t, ${sqlR6(R.sqlGauss(s"($sd * $DefaultL + t)", 0))} AS value
           |FROM grid ORDER BY series_id, t""".stripMargin,
      "gen_parity" -> datasetSql("linear_sum", 10000, 512),
      "feat_posenc" ->
        s"""SELECT CAST(p.i AS INT) AS pos, CAST(d.j AS INT) AS i,
           |       ${sqlR6(s"sin(p.i * exp(d.j * 2.0e0 * $posencC))")} AS pe_sin,
           |       ${sqlR6(s"cos(p.i * exp(d.j * 2.0e0 * $posencC))")} AS pe_cos
           |FROM range(0, $DefaultL) p(i) CROSS JOIN range(0, 128) d(j) ORDER BY pos, i""".stripMargin,
      "feat_timestep_emb" ->
        s"""SELECT CAST(s.i AS INT) AS step, CAST(d.j AS INT) AS i,
           |       ${sqlR6(s"sin(s.i * exp(d.j * $tsC))")} AS emb_sin,
           |       ${sqlR6(s"cos(s.i * exp(d.j * $tsC))")} AS emb_cos
           |FROM range(0, 500) s(i) CROSS JOIN range(0, 128) d(j) ORDER BY step, i""".stripMargin
    )
  }
}
