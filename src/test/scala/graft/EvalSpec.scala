package graft

import graft.operators.EvalOps
import org.apache.spark.sql.functions._

/** The two-pass heavy-hitter operator leans on one mathematical guarantee:
  * a k-counter Misra–Gries summary retains EVERY item whose frequency in the
  * scanned stream exceeds n/k. If that holds per partition, the pigeonhole
  * argument makes the union of partition summaries a superset of the global
  * heavy hitters, and the exact recount pass makes the output exact. These
  * tests pin the guarantee on adversarial streams, and the end-to-end
  * operator against a brute-force recount.
  */
class EvalSpec extends SparkSpec {

  private def mg(xs: Seq[Long], k: Int): Set[Long] =
    EvalOps.misraGries(xs.iterator, k).toSet

  test("misra-gries retains every item with freq > n/k (skewed stream)") {
    // 3 heavy items at ~20% each drowned in 1000 distinct singletons,
    // heavy occurrences placed worst-case: all AFTER the singleton flood
    val singles = (1000L to 1999L).toSeq
    val heavy = Seq.fill(250)(1L) ++ Seq.fill(250)(2L) ++ Seq.fill(250)(3L)
    val stream = singles ++ heavy
    val n = stream.size
    for (k <- Seq(10, 50, 100)) {
      val out = mg(stream, k)
      val musts = stream.groupBy(identity).filter(_._2.size > n / k).keySet
      assert(musts.subsetOf(out), s"k=$k missing ${musts -- out}")
    }
  }

  test("misra-gries summary size never exceeds k") {
    val stream = (1L to 5000L) ++ (1L to 5000L).map(_ % 7L)
    for (k <- Seq(1, 3, 17)) assert(mg(stream, k).size <= k)
  }

  test("blocked user similarity scores candidates with the EXACT cosine") {
    // banding decides only WHICH pairs are scored; the score itself must be
    // the same exact-integer cosine the brute force computes — recompute it
    // independently per blocked pair and demand equality (r6 is exact here)
    val cnt = Tables.events(spark, sf)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("n"))
      .localCheckpoint(true)
    val dots = cnt.select(col("user_id").as("ua"), col("event_type"), col("n").as("na"))
      .join(cnt.select(col("user_id").as("ub"), col("event_type"), col("n").as("nb")),
        Seq("event_type"))
      .filter(col("ua") =!= col("ub"))
      .groupBy("ua", "ub").agg(sum(col("na") * col("nb")).as("dot"))
    val norms = cnt.groupBy("user_id").agg(sum(col("n") * col("n")).as("nrm2"))
    val expect = dots
      .join(norms.select(col("user_id").as("ua"), col("nrm2").as("n2a")), "ua")
      .join(norms.select(col("user_id").as("ub"), col("nrm2").as("n2b")), "ub")
      .select(col("ua"), col("ub"),
        graft.functions.Num.r6(col("dot").cast("double") /
          sqrt(col("n2a").cast("double") * col("n2b").cast("double"))).as("cos_exact"))
    val blocked = EvalOps.userSimilarityBlocked(spark, sf).localCheckpoint(true)
    val joined = blocked
      .join(expect, col("user_id") === col("ua") && col("similar_user") === col("ub"))
    assert(joined.count() == blocked.count(),
      "every blocked pair must exist in the exact dot>0 pair space")
    assert(joined.filter(col("cos") =!= col("cos_exact")).count() == 0)
    // ranks are contiguous from 1 and capped at top-k per user
    val badRanks = blocked.groupBy("user_id")
      .agg(count(lit(1)).as("m"), max(col("rank")).as("mx"), min(col("rank")).as("mn"))
      .filter(col("mx") =!= col("m") || col("mn") =!= 1 ||
        col("m") > EvalOps.UserSimTopK).count()
    assert(badRanks == 0)
  }

  test("gridRank decile formula equals ntile(10) including the remainder case") {
    // the sf fixtures have row counts divisible by 10, so they never exercise
    // ntile's unequal-bucket remainder (larger buckets first) — pin it on
    // n = 1003 with duplicate x values (ties broken by event_id, as in the op)
    import spark.implicits._
    import org.apache.spark.sql.expressions.Window
    val df = (1 to 1003).map(i => ((i * 7) % 50).toLong -> i.toLong)
      .toDF("x", "event_id")
    // the op's exact ntile identity with n=1003, k=10 (q=100, rem=3)
    val ntileExpr =
      """CASE WHEN r <= (1003 % 10) * (1003 div 10 + 1)
        |     THEN (r - 1) div (1003 div 10 + 1)
        |     ELSE (1003 % 10) + (r - (1003 % 10) * (1003 div 10 + 1) - 1) div (1003 div 10)
        |END""".stripMargin
    val wd = Window.orderBy(col("x").desc, col("event_id").asc)
    val viaNtile = df.withColumn("d", ntile(10).over(wd))
      .groupBy("d").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    // the gridRank route: global r by (x desc, event_id), then the formula
    val gw = Window.orderBy(col("x").desc)
    val grid = df.groupBy("x").agg(count(lit(1)).as("t"))
      .withColumn("cb", coalesce(
        sum(col("t")).over(gw.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("x", "cb")
    val iw = Window.partitionBy("x").orderBy(col("event_id").asc)
    val viaFormula = df.join(grid, "x")
      .withColumn("r", col("cb") + row_number().over(iw).cast("long"))
      .withColumn("d", (expr(ntileExpr) + 1L).cast("int"))
      .groupBy("d").count().collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(viaFormula == viaNtile)
    // per-row equality, not just bucket sizes
    val a = df.withColumn("d", ntile(10).over(wd)).select("event_id", "d")
    val b = df.join(grid, "x")
      .withColumn("r", col("cb") + row_number().over(iw).cast("long"))
      .withColumn("d", (expr(ntileExpr) + 1L).cast("int"))
      .select("event_id", "d")
    assert(a.exceptAll(b).count() == 0 && b.exceptAll(a).count() == 0)
  }

  test("heavy hitters output equals the brute-force recount") {
    val got = EvalOps.heavyHitters(spark, sf)
      .select("user_id", "n_events").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val u = ev.select(countDistinct(col("user_id"))).collect()(0).getLong(0)
    val thr = n.toDouble / math.max(1L, u * EvalOps.HhNum / EvalOps.HhDen)
    val want = ev.groupBy("user_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1))
      .filter(_._2.toDouble > thr).toMap
    assert(got == want)
    assert(want.nonEmpty, "fixture should produce at least one heavy hitter")
  }
}
