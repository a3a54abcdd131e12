package graft

import graft.operators.EventsOps
import org.apache.spark.sql.functions._

/** Boundary specs for the time-series diagnostics, on SYNTHETIC series where
  * the right answer is known in closed form (the session_window lesson: pin
  * semantics with a constructed input, never only with the fixture, whose
  * gaps may never exercise the boundary).
  */
class TsDiagnosticsSpec extends SparkSpec {
  import spark.implicits._

  private def series(vals: Seq[Double], user: Long = 1L) =
    vals.zipWithIndex.map { case (v, i) =>
      (user, java.sql.Timestamp.valueOf(f"2024-01-01 00:${i / 60}%02d:${i % 60}%02d"), i.toLong, v)
    }.toDF("user_id", "ts", "event_id", "value")

  test("CUSUM changepoint lands on a known mean shift") {
    // 40 points at 0 then 40 at 10: |CUSUM| peaks exactly at the last
    // pre-shift point (position 40, fraction 0.5)
    val df = EventsOps.changepointOf(series(Seq.fill(40)(0.0) ++ Seq.fill(40)(10.0)))
    val r = df.collect()(0)
    assert(r.getAs[Long]("cp_event_id") == 39L, r.toString)
    assert(math.abs(r.getAs[Double]("frac_before") - 0.5) < 1e-9)
  }

  test("changepoint peak magnitude equals the closed form n1·n2·Δ/n") {
    // peak |CUSUM| for a clean step = n1·(μ − lo) = n1·n2·Δ/n = 40·40·10/80
    val df = EventsOps.changepointOf(series(Seq.fill(40)(0.0) ++ Seq.fill(40)(10.0)))
    assert(math.abs(df.collect()(0).getAs[Double]("cusum_peak") - 200.0) < 1e-6)
  }

  test("ACF of an alternating series is -1 at odd lags, +1 at even lags") {
    val df = EventsOps.autocorrOf(series(Seq.tabulate(64)(i => if (i % 2 == 0) 1.0 else -1.0)))
    val r = df.collect()(0)
    // finite-sample ACF of ±1 alternation: r_k = ±(n−k)/n (denominator keeps
    // all n terms) — so assert sign and magnitude within the 6/64 ≈ 0.094 bound
    for (k <- 1 to EventsOps.AcfK) {
      val v = r.getAs[Double](s"acf_$k")
      val expectedSign = if (k % 2 == 1) -1.0 else 1.0
      assert(v * expectedSign > 0.85, s"acf_$k = $v")
      assert(math.abs(v) <= 1.0 + 1e-9)
    }
  }

  test("ACF values on the fixture stay within [-1, 1]") {
    val bad = EventsOps.autocorr(spark, sf).filter(
      (1 to EventsOps.AcfK).map(k => abs(col(s"acf_$k")) > 1.0 + 1e-9).reduce(_ || _))
    assert(bad.count() == 0)
  }
}
