package graft

import graft.functions.{DetRand, Num}
import graft.operators._
import org.apache.spark.sql.functions._

/** Property-style checks (SURVEY.md §5): structural identities that must hold
  * across swept parameters, not just the fixture values.
  */
class PropertySpecs extends SparkSpec {

  test("patchify ∘ unpatchify = id for every patch size dividing the length") {
    val df = Generators.dataset(spark, "sine", 5, 24).localCheckpoint(true)
    for (p <- Seq(1, 2, 3, 4, 6, 8, 12)) {
      val rt = Reshape.unpatchify(Reshape.patchify(spark, df, p), p)
      val joined = rt.withColumnRenamed("value", "rt").join(df, Seq("series_id", "t"))
      assert(joined.count() == 5 * 24, s"patch size $p lost rows")
      assert(joined.filter(col("rt") =!= col("value")).count() == 0, s"patch size $p corrupted values")
    }
  }

  test("u01 stays in (0,1) and r6 is idempotent across keys and streams") {
    val rows = spark.range(2000).select(
      (0 until 8).map { stream =>
        DetRand.u01(col("id").cast("double") * 997, stream).as(s"u$stream")
      }: _*)
    val exprs = (0 until 8).flatMap { s =>
      Seq(min(col(s"u$s")), max(col(s"u$s")),
        sum(when(Num.r6(col(s"u$s")) === Num.r6(Num.r6(col(s"u$s"))), 0).otherwise(1)))
    }
    val r = rows.agg(exprs.head, exprs.tail: _*).collect()(0)
    for (s <- 0 until 8) {
      assert(r.getDouble(3 * s) > 0.0, s"stream $s emitted 0")
      assert(r.getDouble(3 * s + 1) < 1.0, s"stream $s emitted 1")
      assert(r.getLong(3 * s + 2) == 0, s"r6 not idempotent on stream $s")
    }
  }

  test("q_sample/predict_start inversion holds for every schedule kind") {
    for (kind <- Seq("linear", "cosine")) {
      val bad = Diffusion.qSample(spark, kind)
        .withColumn("x0_hat", (col("xt") - col("sqrt_omac") * col("noise")) / col("sqrt_ac"))
        .filter(abs(col("x0_hat") - col("value")) > 1e-6).count()
      assert(bad == 0, s"inversion failed for $kind schedule")
    }
  }

  test("poly trend of an exact cubic recovers it (residual ~ 0)") {
    import spark.implicits._
    val L = 32
    val df = (for (s <- 0 until 3; t <- 0 until L) yield {
      val u = t.toDouble / (L - 1)
      (s.toLong, t, 1.0 + (s + 1) * u - 2.0 * u * u + 0.5 * u * u * u)
    }).toDF("series_id", "t", "value")
    val worst = TrendFit.polyTrend(spark, df, L)
      .agg(max(abs(col("residual")))).collect()(0).getDouble(0)
    assert(worst < 1e-6, s"cubic not recovered, worst residual $worst")
  }
}
