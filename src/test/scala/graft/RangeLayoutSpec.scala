package graft

import graft.sources.RangeLayout
import org.apache.spark.sql.functions._

/** The structural contract footer-based skipping relies on: disjoint per-file
  * time ranges, completeness, and within-file sortedness.
  */
class RangeLayoutSpec extends SparkSpec {

  test("range layout yields disjoint per-file ts ranges, loses nothing, sorts within files") {
    val stats = RangeLayout.fileStats(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getTimestamp(2), r.getTimestamp(3)))
      .sortBy(_._3)
    assert(stats.length >= 2 && stats.length <= RangeLayout.NumFiles,
      s"expected 2..${RangeLayout.NumFiles} files, got ${stats.length}")
    // pairwise disjoint: each file's min is strictly after the previous max
    stats.sliding(2).foreach { case Array((fa, _, _, aMax), (fb, _, bMin, _)) =>
      assert(bMin.after(aMax), s"overlapping ranges: $fa [..$aMax] vs $fb [$bMin..]")
    }
    // completeness
    assert(stats.map(_._2).sum == Tables.events(spark, sf).count())
    // within-file sortedness: no row precedes its predecessor in file order
    val layout = spark.read.parquet(RangeLayout.location(spark).toString)
    val disorder = layout
      .select(input_file_name().as("file"), col("ts"),
        monotonically_increasing_id().as("pos"))
      .withColumn("prev_ts", lag("ts", 1).over(
        org.apache.spark.sql.expressions.Window.partitionBy("file").orderBy("pos")))
      .filter(col("prev_ts") > col("ts"))
      .count()
    assert(disorder == 0, s"$disorder out-of-order rows inside files")
  }
}
