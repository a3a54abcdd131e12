package graft

import graft.sources.Compaction
import org.apache.spark.sql.functions._

class CompactionSpec extends SparkSpec {

  test("compaction: fragmented dates hold many files, compacted exactly one, rows preserved") {
    val stats = Compaction.fileStats(spark, sf).cache()
    val frag = stats.filter(col("layout") === "fragmented")
    val comp = stats.filter(col("layout") === "compacted")

    // the fragmented layout actually exhibits the small-files problem
    assert(frag.filter(col("n_files") > 1).count() > 0,
      "fragmented layout produced no multi-file dates")
    // compaction collapses every date to exactly one file
    assert(comp.filter(col("n_files") =!= 1).count() == 0)

    // same dates, same per-date row counts — layout changed, content didn't
    val drift = frag.select(col("event_date"), col("n_rows").as("frag_rows"))
      .join(comp.select(col("event_date"), col("n_rows").as("comp_rows")),
        Seq("event_date"), "full")
      .filter(col("frag_rows").isNull || col("comp_rows").isNull ||
        col("frag_rows") =!= col("comp_rows"))
    assert(drift.count() == 0)

    // and the total matches the source table
    val total = comp.agg(sum("n_rows")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count())
    stats.unpersist()
  }
}
