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

  test("z-order: rank quantization keeps skipping under a skewed user distribution") {
    // 90% of rows on 4 hot users, a 10% tail spread over users 200-999, a
    // uniform synthetic month of timestamps — the shape that silently
    // degenerates a fixed mod-16 grid (tail users alias into every bucket)
    val df = spark.range(4000).select(
      col("id").as("event_id"),
      when(pmod(col("id"), lit(10L)) < 9, pmod(col("id"), lit(4L)))
        .otherwise(lit(200L) + pmod(col("id") * 37L, lit(800L))).as("user_id"),
      timestamp_micros(lit(1704067200000000L) +
        pmod(col("id") * 1046527L, lit(30L * 86400L)) * 1000000L).as("ts"))
      .cache()
    val warehouse = spark.conf.get("spark.sql.warehouse.dir")
    val rankLoc = new org.apache.hadoop.fs.Path(warehouse, "graft_zorder_skew_rank").toString
    val gridLoc = new org.apache.hadoop.fs.Path(warehouse, "graft_zorder_skew_grid").toString

    ZOrder.zOrderTo(df, rankLoc, ZOrder.NumFiles)
    // the r6 fixed-grid key on the same data, same file count, same cut
    df.withColumn("zkey", ZOrder.fixedGridKey)
      .repartitionByRange(ZOrder.NumFiles, col("zkey"))
      .sortWithinPartitions("zkey", "event_id").drop("zkey")
      .write.mode("overwrite").parquet(gridLoc)

    val rankBoxes = boxesOf(rankLoc)
    val gridBoxes = boxesOf(gridLoc)
    assert(rankBoxes.length > 1 && gridBoxes.length > 1)

    // query box: the tail-user half over one week
    val fromU = 200L; val toU = 999L
    val fromTs = java.sql.Timestamp.valueOf("2024-01-08 00:00:00")
    val toTs = java.sql.Timestamp.valueOf("2024-01-15 00:00:00")
    def mustOpen(b: (Long, Long, Long, java.sql.Timestamp, java.sql.Timestamp)): Boolean =
      b._2 <= toU && b._3 >= fromU && !b._4.after(toTs) && !b._5.before(fromTs)

    // rank buckets give the tail its own key range: some file skips outright
    assert(rankBoxes.exists(b => !mustOpen(b)),
      s"no rank-quantized file skippable: ${rankBoxes.mkString(", ")}")
    // and the bytes-read proxy beats the aliasing fixed grid strictly
    val rankRead = rankBoxes.filter(mustOpen).map(_._1).sum
    val gridRead = gridBoxes.filter(mustOpen).map(_._1).sum
    assert(rankRead < gridRead,
      s"rank-quantized read $rankRead rows vs fixed-grid $gridRead")

    // pure layout: nothing lost
    assert(rankBoxes.map(_._1).sum == 4000L)
    df.unpersist()
  }
}
