package graft

import graft.operators.{EventsOps, Relational, StatsOps}
import java.sql.Timestamp

/** Boundary semantics of the Kaplan–Meier estimator, the concurrency sweep
  * and the velocity RANGE window, pinned on synthetic events (the trap-#1
  * discipline: drive the exact edge rows, read what the engine does, and
  * encode THAT in the oracle — never intent).
  */
class BehaviorBoundarySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String, Double)*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, t, u, typ, v) => (id, ts(t), u, typ, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("kaplan-meier: product-limit values, censoring at corpus-end minus 7d") {
    // corpus last day = Jan 20. Censor cut: last event ≤ Jan 13 ⇒ death.
    // u1: Jan1→Jan10 (dur 9, death)   u2: Jan1→Jan20 (dur 19, censored)
    // u3: Jan2→Jan11 (dur 9, death)   u4: Jan1→Jan5  (dur 4, death)
    val ev = events(
      (1L, "2024-01-01 08:00:00", 1L, "view", 0.0),
      (2L, "2024-01-10 08:00:00", 1L, "view", 0.0),
      (3L, "2024-01-01 08:00:00", 2L, "view", 0.0),
      (4L, "2024-01-20 08:00:00", 2L, "view", 0.0),
      (5L, "2024-01-02 08:00:00", 3L, "view", 0.0),
      (6L, "2024-01-11 08:00:00", 3L, "view", 0.0),
      (7L, "2024-01-01 08:00:00", 4L, "view", 0.0),
      (8L, "2024-01-05 08:00:00", 4L, "view", 0.0))
    val out = StatsOps.survivalKmOf(ev).orderBy("duration_days").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    // dur 4: risk 4, 1 death  ⇒ S = 3/4
    // dur 9: risk 3, 2 deaths ⇒ S = 3/4 · 1/3 = 1/4
    // dur 19: risk 1, censored ⇒ S carries 1/4
    assert(out.toSeq == Seq(
      (4L, 4L, 1L, 0L, 0.75),
      (9L, 3L, 2L, 0L, 0.25),
      (19L, 1L, 0L, 1L, 0.25)))
  }

  test("peak concurrency: touching sessions overlap, end+1 frees the slot") {
    val ev = events(
      // u1 session [10:00:00, 10:10:00]
      (1L, "2024-01-01 10:00:00", 1L, "view", 0.0),
      (2L, "2024-01-01 10:10:00", 1L, "view", 0.0),
      // u2 single event AT u1's last second — concurrent (inclusive end)
      (3L, "2024-01-01 10:10:00", 2L, "view", 0.0),
      // u3 single event one second LATER — u1/u2 already freed, alone
      (4L, "2024-01-01 10:10:01", 3L, "view", 0.0))
    val out = Relational.peakConcurrencyOf(ev).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 2L, "inclusive session end must overlap")
    assert(out.head.getLong(2) == 3L)
  }

  test("peak concurrency: cross-midnight session is clipped into both days") {
    val ev = events(
      (1L, "2024-01-01 23:50:00", 1L, "view", 0.0),
      (2L, "2024-01-02 00:10:00", 1L, "view", 0.0)) // 20-min gap: ONE session
    val out = Relational.peakConcurrencyOf(ev).orderBy("day").collect()
    assert(out.map(_.getDate(0).toString).toSeq == Seq("2024-01-01", "2024-01-02"))
    assert(out.forall(r => r.getLong(1) == 1L && r.getLong(2) == 1L))
  }

  test("velocity: trailing hour window is [t-3599, t] — 3600s apart misses") {
    def at(base: String, offS: Int): String = {
      val t = Timestamp.valueOf(base).getTime + offS * 1000L
      new Timestamp(t).toString.stripSuffix(".0")
    }
    val b = "2024-01-01 00:00:00"
    // u1: 5 events inside one hour (last at +3599) ⇒ burst 5 ⇒ flagged
    val u1 = Seq(0, 900, 1800, 2700, 3599).zipWithIndex.map { case (o, i) =>
      ((i + 1).toLong, at(b, o), 1L, "view", 0.0)
    }
    // u2: same but last at +3600 ⇒ first event falls out ⇒ burst 4 ⇒ not flagged
    val u2 = Seq(0, 900, 1800, 2700, 3600).zipWithIndex.map { case (o, i) =>
      ((i + 10).toLong, at(b, o), 2L, "view", 0.0)
    }
    val out = EventsOps.velocityFlagsOf(events(u1 ++ u2: _*)).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getLong(2) == 5L) // max_burst
  }
}
