package graft

import graft.operators.{Relational, TypedOps}
import org.apache.spark.sql.functions._

/** The typed flatMapGroups sessionizer must produce the SAME sessions as the
  * window-function twin — one imperative, one declarative, both oracle-checked.
  */
class TypedSpec extends SparkSpec {

  test("typed sessionizer agrees with the window sessionizer on every session") {
    val typed = TypedOps.sessionStatsTyped(spark, sf)
      .select("user_id", "session_seq", "n_events",
        "session_start", "session_end", "session_value")
    val windowed = Relational.sessionize(spark, sf)
      .select("user_id", "session_seq", "n_events",
        "session_start", "session_end", "session_value")
    assert(typed.count() > 0)
    assert(typed.exceptAll(windowed).count() == 0)
    assert(windowed.exceptAll(typed).count() == 0)
  }

  test("typed session durations are non-negative and bounded by the walk") {
    val bad = TypedOps.sessionStatsTyped(spark, sf)
      .filter(col("duration_sec") < 0 ||
        col("session_end") < col("session_start") ||
        (col("n_events") === 1 && col("duration_sec") =!= 0.0))
      .count()
    assert(bad == 0)
  }

  test("windowed funnel is a subset of the unbounded funnel, stagewise") {
    import graft.operators.EventsOps
    val unb = EventsOps.funnel(spark, sf)
      .select(col("user_id"), col("t_click").as("c0"), col("t_purchase").as("p0"))
    val win = EventsOps.funnelWindowed(spark, sf)
    val j = win.join(unb, "user_id")
    // same signup universe
    assert(win.count() == unb.count())
    // a windowed click exists only when an unbounded one does, and never earlier
    assert(j.filter(col("t_click").isNotNull && col("c0").isNull).count() == 0)
    assert(j.filter(col("t_click").isNotNull && col("t_click") < col("c0")).count() == 0)
    // bound actually binds: each converted stage within the window
    val secs = graft.operators.EventsOps.FunnelWindowMin * 60.0
    assert(j.filter(col("t_click").isNotNull &&
      (col("t_click").cast("double") - col("t_signup").cast("double")) > secs).count() == 0)
    assert(j.filter(col("t_purchase").isNotNull &&
      (col("t_purchase").cast("double") - col("t_click").cast("double")) > secs).count() == 0)
  }
}
