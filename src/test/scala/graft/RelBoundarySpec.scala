package graft

import graft.operators.Relational
import org.apache.spark.sql.Row
import java.sql.Timestamp

/** Boundary semantics of the label join and the CDC merge, pinned on
  * synthetic events (the trap-#1 discipline: never assert boundary behavior
  * from intent — drive the exact edge rows and read what the engine does).
  */
class RelBoundarySpec extends SparkSpec {

  private def ts(s: String) = Timestamp.valueOf(s)

  private def events(rows: (Long, String, Long, String, Double)*) = {
    import spark.implicits._
    rows.toSeq.map { case (id, t, u, typ, v) => (id, ts(t), u, typ, v) }
      .toDF("event_id", "ts", "user_id", "event_type", "value")
  }

  test("label join: same-ts purchase does NOT convert; horizon end is inclusive") {
    val ev = events(
      // u1: purchase at the exact click timestamp — strictly-after ⇒ no label
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      (2L, "2024-01-01 10:00:00", 1L, "purchase", 5.0),
      // u2: purchase at exactly click + 24h — inclusive horizon ⇒ converts
      (3L, "2024-01-01 10:00:00", 2L, "click", 0.0),
      (4L, "2024-01-02 10:00:00", 2L, "purchase", 5.0),
      // u3: purchase 1s past the horizon ⇒ does not convert
      (5L, "2024-01-01 10:00:00", 3L, "click", 0.0),
      (6L, "2024-01-02 10:00:01", 3L, "purchase", 5.0))
    val out = Relational.labelJoinOf(ev).orderBy("event_id").collect()
    assert(out.map(r => (r.getLong(0), r.getBoolean(3))).toSeq ==
      Seq((1L, false), (3L, true), (5L, false)))
    // the converted row carries the purchase id and exact integer latency
    val conv = out.find(_.getLong(0) == 3L).get
    assert(conv.getLong(4) == 86400L && conv.getLong(5) == 4L)
    // unconverted rows carry NULL latency/purchase, not garbage
    assert(out.filter(!_.getBoolean(3)).forall(r => r.isNullAt(4) && r.isNullAt(5)))
  }

  test("label join: nearest purchase wins, same-ts purchases dedupe to min id") {
    val ev = events(
      (1L, "2024-01-01 10:00:00", 1L, "click", 0.0),
      // two purchases at the same nearest ts — min event_id is "the" purchase
      (9L, "2024-01-01 11:00:00", 1L, "purchase", 5.0),
      (8L, "2024-01-01 11:00:00", 1L, "purchase", 5.0),
      // a later purchase must NOT shadow the nearer one
      (3L, "2024-01-01 12:00:00", 1L, "purchase", 5.0))
    val out = Relational.labelJoinOf(ev).collect()
    assert(out.length == 1 && out.head.getLong(5) == 8L && out.head.getLong(4) == 3600L)
  }

  test("cdc merge: base-only passes through, delta wins, tombstone deletes") {
    val cut = Relational.CdcCutoff // 2024-01-30
    val ev = events(
      // u1: only before the cutoff — base row survives untouched
      (1L, "2024-01-10 00:00:00", 1L, "click", 1.0),
      // u2: both sides — the delta's LATEST value wins
      (2L, "2024-01-10 00:00:00", 2L, "click", 2.0),
      (3L, s"$cut 08:00:00", 2L, "view", 20.0),
      (4L, s"$cut 09:00:00", 2L, "click", 21.0),
      // u3: latest change is an error ⇒ tombstoned out entirely
      (5L, "2024-01-10 00:00:00", 3L, "click", 3.0),
      (6L, s"$cut 08:00:00", 3L, "error", 0.0),
      // u4: delta-only insert (no base row)
      (7L, s"$cut 10:00:00", 4L, "signup", 40.0),
      // u5: error BEFORE a later change in the same batch is NOT a tombstone
      (8L, s"$cut 08:00:00", 5L, "error", 0.0),
      (9L, s"$cut 09:00:00", 5L, "click", 50.0))
    val out = Relational.cdcMergeOf(ev).orderBy("user_id").collect()
      .map(r => (r.getLong(0), r.getDouble(2), r.getString(3)))
    assert(out.toSeq == Seq(
      (1L, 1.0, "base"), (2L, 21.0, "delta"), (4L, 40.0, "delta"), (5L, 50.0, "delta")))
  }
}
