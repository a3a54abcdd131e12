package graft.streaming

import java.sql.Timestamp
import org.scalacheck.{Gen, Properties, Test}
import org.scalacheck.Prop.forAll

/** The micro-batch-boundary law behind every stateful sessionizer in this
  * repo: walking a user's (ts-ordered) history through
  * [[StatefulOps.walk]] in ANY consecutive split — carrying the open-session
  * state between chunks exactly as the streaming handlers do — must emit the
  * same closed sessions and leave the same open tail as walking it in one
  * call. TwsSpec/StatefulSpec prove this on real MemoryStream runs for
  * specific data; this property proves it algebraically for arbitrary gap
  * patterns, values, and batch boundaries, which is the reason the BATCH
  * registered forms (`events_closed_sessions`, `events_tws_sessions` — one
  * walk over full history) are valid oracles for the streaming deployments
  * (many walks over micro-batches).
  *
  * No Spark session needed: walk is a pure function — which is itself the
  * design point that lets flatMapGroupsWithState and transformWithState
  * share it.
  */
object WalkProperties extends Properties("graft.walk") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(200)

  private val BaseUs = Timestamp.valueOf("2024-01-01 00:00:00").getTime * 1000L

  // gaps in minutes: mostly inside the 30-min session gap, some past it
  private val genGaps: Gen[List[Double]] =
    Gen.listOfN(24, Gen.oneOf(Gen.choose(0.0, 29.0), Gen.choose(31.0, 240.0)))

  private def events(gaps: List[Double]): Vector[WmEvent] = {
    var us = BaseUs
    gaps.zipWithIndex.map { case (g, i) =>
      us += (g * 60e6).toLong
      WmEvent(1L, i.toLong + 1L, new Timestamp(us / 1000L), us, (i % 7) * 0.25)
    }.toVector
  }

  private def splitAt(xs: Vector[WmEvent], cuts: List[Int]): Vector[Vector[WmEvent]] = {
    val bounds = (0 +: cuts.map(c => math.min(math.max(c, 0), xs.length)).sorted :+ xs.length)
    bounds.sliding(2).collect { case Seq(a, b) if b > a => xs.slice(a, b) }.toVector
  }

  property("chained walk over any batch split equals the one-shot walk") =
    forAll(genGaps, Gen.listOfN(3, Gen.choose(0, 24))) { (gaps, cuts) =>
      val evs = events(gaps)
      val (oneShotClosed, oneShotOpen) = StatefulOps.walk(1L, None, evs.iterator)
      var open: Option[OpenSession] = None
      val chained = splitAt(evs, cuts).flatMap { chunk =>
        val (closed, next) = StatefulOps.walk(1L, open, chunk.iterator)
        open = next
        closed
      }
      chained == oneShotClosed.toVector && open == oneShotOpen
    }

  // the timeout sentinel (n = 0) behaves as "closed but remembers seq": a
  // walk resumed from it starts a NEW session numbered seq + 1 and never
  // re-emits or extends the sentinel, for any event timing
  property("walk from the timeout sentinel continues numbering, never merges") =
    forAll(genGaps, Gen.choose(1L, 40L)) { (gaps, seq) =>
      val evs = events(gaps)
      val sentinel = Some(OpenSession(seq, 0L, BaseUs - 1000L, BaseUs - 1000L, 0L))
      val (closed, open) = StatefulOps.walk(1L, sentinel, evs.iterator)
      val expectedSeqs = (seq + 1) to (seq + closed.length + open.count(_.n > 0))
      val gotSeqs = closed.map(_.session_seq) ++ open.filter(_.n > 0).map(_.session_seq)
      evs.isEmpty || (gotSeqs.toVector == expectedSeqs.toVector &&
        closed.forall(_.n_events > 0L))
    }
}
