package graft

import graft.sources.{RangeLayout, ZOrder}
import org.apache.spark.sql.functions._

class ZOrderSpec extends SparkSpec {

  private def boxesOf(location: String) =
    spark.read.parquet(location)
      .select(input_file_name().as("file"), col("user_id"), col("ts"))
      .groupBy("file")
      .agg(count(lit(1)).as("n_rows"),
        min("user_id").as("min_user"), max("user_id").as("max_user"),
        min("ts").as("min_ts"), max("ts").as("max_ts"))
      .collect()
      .map(r => (r.getAs[Long]("n_rows"),
        r.getAs[Long]("min_user"), r.getAs[Long]("max_user"),
        r.getAs[java.sql.Timestamp]("min_ts"), r.getAs[java.sql.Timestamp]("max_ts")))

  test("z-order: 2-D bounding boxes skip files a 1-D time sort cannot") {
    ZOrder.ensureZOrdered(spark, sf)
    RangeLayout.ensureRangeSorted(spark, sf)
    val zBoxes = boxesOf(ZOrder.location(spark).toString)
    val rBoxes = boxesOf(RangeLayout.location(spark).toString)
    assert(zBoxes.length > 1 && rBoxes.length > 1)

    val fromTs = java.sql.Timestamp.valueOf(ZOrder.FromTs)
    val toTs = java.sql.Timestamp.valueOf(ZOrder.ToTs)
    def intersects(b: (Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp)): Boolean =
      b._2 <= ZOrder.ToUser && b._3 >= ZOrder.FromUser &&
        !b._4.after(toTs) && !b._5.before(fromTs)

    // the ts-sorted layout cannot skip on user: every file spans the queried
    // user slice, so its only skipping dimension is time
    assert(rBoxes.forall(b => b._2 <= ZOrder.FromUser && b._3 >= ZOrder.ToUser),
      s"range files unexpectedly narrow on user: ${rBoxes.mkString(", ")}")

    // the z-ordered layout segments BOTH dimensions: at least one file's
    // bounding box misses the query box outright
    assert(zBoxes.exists(b => !intersects(b)),
      s"no z file skippable: ${zBoxes.mkString(", ")}")

    // bytes-read proxy: rows inside files that must be opened for the 2-D box
    val zRead = zBoxes.filter(intersects).map(_._1).sum
    val rRead = rBoxes.filter(b => !b._4.after(toTs) && !b._5.before(fromTs)).map(_._1).sum
    assert(zRead < rRead, s"z-order read $zRead rows vs range $rRead")

    // layout changed, content didn't
    assert(zBoxes.map(_._1).sum == Tables.events(spark, sf).count())
  }
}
