package graft.operators

import graft.functions.Num._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loss aggregations (SURVEY.md §2.3 A3-A7; reference
  * models/diffusion_ts_model.py:638-693, models/train_diffusion_ts.py:34-86,
  * test_training.py:140-171).
  *
  * pred = x_t (the noised sample), target = x0 — comparing the corrupted signal
  * against the clean one, which exercises the same loss plumbing as the
  * reference's pred_x0-vs-x_start without a learned model.
  *
  * Scale: every loss is one partial-aggregating pass (Spark's hash aggregate
  * replaces the reference's manual per-batch accumulation loop, A6); the DFT for
  * the Fourier loss reuses the bounded explode+groupBy form.
  */
object Metrics {
  private val L = Diffusion.L

  /** (series_id, t, step, target=value, pred=xt) — also the input surface for
    * Pipeline's pluggable-loss queries (U3).
    */
  def lossInput(spark: SparkSession): DataFrame = predTarget(spark)
  def lossInputSql: String = predTargetSql

  private def predTarget(spark: SparkSession): DataFrame =
    Diffusion.qSample(spark).select(
      col("series_id"), col("t"), col("step"),
      col("value").as("target"), col("xt").as("pred"))

  /** A3: global MSE. */
  def lossMse(spark: SparkSession): DataFrame =
    predTarget(spark).agg(r6(avg(pow(col("pred") - col("target"), 2))).as("loss"))
      .select(lit("mse").as("loss_type"), col("loss"))

  /** Full-spectrum rDFT amplitudes of pred and target per series (bins 0..L/2).
    * re/im rounded before the amplitude so both engines rank/aggregate identical
    * inputs. Takes the (possibly checkpointed) pred/target frame so the
    * two-branch losses read one materialization instead of re-deriving the
    * generator + schedule-join scan per branch.
    */
  private def spectraOf(pt: DataFrame): DataFrame = {
    val spark = pt.sparkSession
    val bins = spark.range(0, L / 2 + 1, 1, 1).select(col("id").cast("int").as("k"))
    val theta = lit(2.0 * math.Pi) * col("k") * col("t") / lit(L.toDouble)
    pt.crossJoin(broadcast(bins))
      .groupBy("series_id", "k")
      .agg(
        r6(sum(col("pred") * cos(theta))).as("re_p"),
        r6(-sum(col("pred") * sin(theta))).as("im_p"),
        r6(sum(col("target") * cos(theta))).as("re_t"),
        r6(-sum(col("target") * sin(theta))).as("im_t"))
      .select(col("series_id"), col("k"),
        sqrt(col("re_p") * col("re_p") + col("im_p") * col("im_p")).as("amp_p"),
        sqrt(col("re_t") * col("re_t") + col("im_t") * col("im_t")).as("amp_t"))
  }

  /** A4: time-domain MSE + MSE of rFFT amplitude spectra. The shared
    * pred/target input feeds BOTH aggregate branches, so it is
    * localCheckpoint'd once — without it the generator + schedule-join scan
    * runs twice per query (time loss and spectra).
    */
  def lossFourier(spark: SparkSession): DataFrame = {
    val pt = predTarget(spark).localCheckpoint(eager = true)
    val timeLoss = pt.agg(avg(pow(col("pred") - col("target"), 2)).as("tl"))
    val freqLoss = spectraOf(pt).agg(avg(pow(col("amp_p") - col("amp_t"), 2)).as("fl"))
    timeLoss.crossJoin(freqLoss)
      .select(lit("fourier").as("loss_type"), r6(col("tl") + col("fl")).as("loss"))
  }

  /** A5: combined = mse + 0.5·fourier (diffusion_ts_model.py:681-684); same
    * single-materialization shape as [[lossFourier]].
    */
  def lossCombined(spark: SparkSession): DataFrame = {
    val pt = predTarget(spark).localCheckpoint(eager = true)
    val timeLoss = pt.agg(avg(pow(col("pred") - col("target"), 2)).as("tl"))
    val freqLoss = spectraOf(pt).agg(avg(pow(col("amp_p") - col("amp_t"), 2)).as("fl"))
    timeLoss.crossJoin(freqLoss)
      .select(lit("combined").as("loss_type"),
        r6(col("tl") + lit(0.5) * (col("tl") + col("fl"))).as("loss"))
  }

  /** A6: per-epoch mean loss — one hash-agg replaces the reference's manual
    * accumulation (train_diffusion_ts.py:43-64). Epoch = series_id div 10.
    */
  def epochLosses(spark: SparkSession): DataFrame =
    predTarget(spark)
      .withColumn("epoch", (col("series_id") / 10).cast("int"))
      .groupBy("epoch")
      .agg(r6(avg(pow(col("pred") - col("target"), 2))).as("loss"))

  /** A7/S1: best epoch by loss (argmin with deterministic tiebreak). */
  def bestEpoch(spark: SparkSession): DataFrame =
    epochLosses(spark).orderBy(col("loss"), col("epoch")).limit(1)

  /** A9: elementwise summation of per-layer components across a layer-indexed
    * long table (diffusion_ts_model.py:525-535).
    */
  def layerComponentSum(spark: SparkSession): DataFrame = {
    import graft.functions.{DetRand => R}
    val layers = spark.range(0, 3, 1, 1).select(col("id").cast("int").as("layer"))
    Generators.grid(spark, 10, 32)
      .crossJoin(broadcast(layers))
      .withColumn("trend_l", R.u01((col("series_id").cast("double") * 32 + col("t")) * 3 + col("layer"), 17))
      .groupBy("series_id", "t")
      .agg(r6(sum(col("trend_l"))).as("trend"), count(lit(1)).as("n_layers"))
  }

  // ---------------- DuckDB oracle twins ----------------

  private def predTargetSql: String = {
    import graft.functions.{DetRand => R}
    val sd = "CAST(series_id AS DOUBLE)"
    val cellSql = s"($sd * $L + t)"
    s"""WITH x0 AS (${Generators.datasetSqlCore("linear_sum", Diffusion.N, L)}),
       |${Diffusion.schedSql(Diffusion.T, "linear")},
       |stepped AS (
       |  SELECT x0.*, CAST(floor((${R.sqlU01(sd, 13)}) * ${Diffusion.T}) AS INT) AS step FROM x0
       |), pt AS (
       |  SELECT s.series_id, s.t, s.step, s.value AS target,
       |         c.sqrt_ac * s.value + c.sqrt_omac * (${R.sqlGauss(cellSql, 11)}) AS pred
       |  FROM stepped s JOIN sched c USING (step)
       |)""".stripMargin
  }

  private def spectraSql: String = predTargetSql +
    s""", bins AS (SELECT CAST(i AS INT) AS k FROM range(0, ${L / 2 + 1}) r(i)),
       |spec AS (
       |  SELECT series_id, k,
       |         ${sqlR6(s"sum(pred * cos(${sqlD(2.0 * math.Pi)} * k * t / ${sqlD(L.toDouble)}))")} AS re_p,
       |         ${sqlR6(s"-sum(pred * sin(${sqlD(2.0 * math.Pi)} * k * t / ${sqlD(L.toDouble)}))")} AS im_p,
       |         ${sqlR6(s"sum(target * cos(${sqlD(2.0 * math.Pi)} * k * t / ${sqlD(L.toDouble)}))")} AS re_t,
       |         ${sqlR6(s"-sum(target * sin(${sqlD(2.0 * math.Pi)} * k * t / ${sqlD(L.toDouble)}))")} AS im_t
       |  FROM pt CROSS JOIN bins
       |  GROUP BY series_id, k
       |), amps AS (
       |  SELECT series_id, k, sqrt(re_p*re_p + im_p*im_p) AS amp_p, sqrt(re_t*re_t + im_t*im_t) AS amp_t
       |  FROM spec
       |)""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "loss_mse" -> ((s, _) => lossMse(s)),
    "loss_fourier" -> ((s, _) => lossFourier(s)),
    "loss_combined" -> ((s, _) => lossCombined(s)),
    "train_epoch_losses" -> ((s, _) => epochLosses(s).orderBy("epoch")),
    "train_best_epoch" -> ((s, _) => bestEpoch(s)),
    "layer_component_sum" -> ((s, _) => layerComponentSum(s).orderBy("series_id", "t"))
  )

  def oracles: Map[String, String] = {
    import graft.functions.{DetRand => R}
    Map(
      "loss_mse" -> (predTargetSql +
        s" SELECT 'mse' AS loss_type, ${sqlR6("avg(pow(pred - target, 2))")} AS loss FROM pt"),
      "loss_fourier" -> (spectraSql +
        s""" SELECT 'fourier' AS loss_type,
           |   ${sqlR6("(SELECT avg(pow(pred - target, 2)) FROM pt) + (SELECT avg(pow(amp_p - amp_t, 2)) FROM amps)")} AS loss""".stripMargin),
      "loss_combined" -> (spectraSql +
        s""" SELECT 'combined' AS loss_type,
           |   ${sqlR6("(SELECT avg(pow(pred - target, 2)) FROM pt) + 0.5e0 * ((SELECT avg(pow(pred - target, 2)) FROM pt) + (SELECT avg(pow(amp_p - amp_t, 2)) FROM amps))")} AS loss""".stripMargin),
      "train_epoch_losses" -> (predTargetSql +
        s""" SELECT CAST(floor(series_id / 10) AS INT) AS epoch,
           |        ${sqlR6("avg(pow(pred - target, 2))")} AS loss
           | FROM pt GROUP BY 1 ORDER BY epoch""".stripMargin),
      "train_best_epoch" -> (predTargetSql +
        s""", el AS (
           |  SELECT CAST(floor(series_id / 10) AS INT) AS epoch,
           |         ${sqlR6("avg(pow(pred - target, 2))")} AS loss
           |  FROM pt GROUP BY 1
           |)
           |SELECT epoch, loss FROM el ORDER BY loss, epoch LIMIT 1""".stripMargin),
      "layer_component_sum" ->
        s"""WITH cellgrid AS (
           |  SELECT CAST(s.i AS BIGINT) AS series_id, CAST(g.j AS INT) AS t, CAST(l.m AS INT) AS layer
           |  FROM range(0, 10) s(i) CROSS JOIN range(0, 32) g(j) CROSS JOIN range(0, 3) l(m)
           |)
           |SELECT series_id, t,
           |       ${sqlR6(s"sum(${R.sqlU01("((CAST(series_id AS DOUBLE) * 32 + t) * 3 + layer)", 17)})")} AS trend,
           |       count(*) AS n_layers
           |FROM cellgrid GROUP BY 1, 2 ORDER BY series_id, t""".stripMargin
    )
  }
}
