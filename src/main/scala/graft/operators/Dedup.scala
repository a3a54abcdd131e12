package graft.operators

import graft.Tables
import graft.functions.Num._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` / `embeddings` (SURVEY.md §7.5;
  * north-star LLM-pipeline ops): exact, MinHash+LSH, SimHash, n-gram Jaccard,
  * and embedding-cosine near-dup.
  *
  * Hash functions are md5 (identical hex in Spark and DuckDB), so signatures,
  * band keys, and pair sets reproduce bit-for-bit in the oracle.
  *
  * Scale notes:
  *  - exact dedup is one hash-agg on a 128-bit digest (group by md5(text), not
  *    by the raw text — at 100 TB you never shuffle full documents).
  *  - minhash: explode(shingle × hashId) collapses through partial min-agg
  *    before the shuffle, so shuffle volume is #docs × k, independent of doc
  *    length; candidate pairs come from equi-joins on band keys (shuffle on a
  *    short hash key), never from a cross join.
  *  - n-gram blocking drops shingles with document frequency > MaxShingleDf:
  *    stop-shingles generate quadratic candidate blowup and carry no signal —
  *    the standard guard at corpus scale.
  */
object Dedup {
  val NumHashes = 12
  val BandRows = 3 // → 4 bands
  val MaxShingleDf = 50
  val MinSharedRare = 2 // candidate prefilter: ≥2 shared rare shingles
  val JaccardThreshold = 0.1
  /** Band-bucket guard: a degenerate bucket (boilerplate-heavy corpus — e.g.
    * hundreds of near-identical pages landing in one band key) would make the
    * band self-join quadratic in that bucket. Buckets above the cap are
    * dropped from candidate generation: mass-duplicated text is exact-dedup's
    * job (one hash-agg), not pairwise LSH's. Test-corpus max bucket: 7 at
    * sf0.1, so the guard changes nothing at oracle scales.
    */
  val MaxBandBucket = 200

  private def words = split(col("text"), "\\s+")
  private val M31 = 2147483648L

  /** Word 3-gram shingle digest stream: one md5 per WORD (28-bit integer
    * digest), then shingle base = the LCG-style combine of 3 consecutive word
    * digests — ((h₁·69069 + h₂) mod 2³¹)·69069 + h₃ mod 2³¹, all intermediates
    * < 2⁶² so exact BIGINT in both engines. Building the 3-word shingle
    * STRINGS and hashing those measured 8× slower at sf0.1 (6.7 s → 0.8 s for
    * the explode+digest stage): per-shingle string assembly dominates, not the
    * hash. try_element_at + coalesce(0): documents with < 3 words index past
    * the array end, which under Spark 4 ANSI mode would throw; DuckDB's list
    * indexing yields NULL there — both engines coalesce to 0.
    */
  private def shingleDigests(docs: DataFrame): DataFrame = {
    val hw = transform(words, w => conv(substring(md5(w), 1, 7), 16, 10).cast("long"))
    def at(c: Column, i: Column): Column = coalesce(try_element_at(c, i), lit(0L))
    docs.select(col("doc_id"), hw.as("hw"), size(words).as("nw"))
      .select(col("doc_id"),
        explode(transform(sequence(lit(0), greatest(col("nw") - 3, lit(0))),
          i => (((at(col("hw"), i + 1) * 69069L + at(col("hw"), i + 2)) % M31) * 69069L
            + at(col("hw"), i + 3)) % M31)).as("base"))
  }

  /** Distinct (doc_id, base) long table — the canonical shingle-set view.
    *
    * Only longs flow downstream: every shuffle, self-join, and intersection
    * moves 8-byte keys — at corpus scale the set-similarity keys are the
    * dominant shuffle volume. Jaccard over digest sets approximates string-set
    * Jaccard to within 31-bit birthday collisions, and the DuckDB twin
    * computes the identical digest sets, so oracle parity is exact.
    *
    * Pair queries consume this through [[docShingles]]'s warehouse
    * materialization, so the band self-join and the Jaccard verification
    * re-read one parquet artifact instead of re-deriving the explode+digest
    * pass per consumer and per query.
    */
  private[graft] def shinglesOf(docs: DataFrame): DataFrame =
    shingleDigests(docs).distinct()

  private def shinglesLocation(spark: SparkSession): String =
    new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"), "graft_doc_shingles").toString

  /** The corpus's canonical shingle table, MATERIALIZED to the warehouse once
    * per (session, source dir) and re-read by every consumer — seven
    * measurement queries in the dedup class each re-derived (scan → word-md5
    * → rolling-digest explode → distinct) + localCheckpoint'd their own copy
    * (VERDICT r9 #7). Disk materialization (the layout ops' [[WriteOnce]]
    * pattern) survives the driver's between-query unpersist — a memoized
    * localCheckpoint would not (its truncated lineage cannot recompute) —
    * and subsequent consumers pay one columnar scan of 8-byte pairs. This is
    * what a production dedup pipeline does anyway: shingle once, persist,
    * run every detector off the artifact.
    *
    * The read is repartitioned and localCheckpoint'd: every pair query
    * references the shingle frame several times (candidates + verification +
    * set stats), and a bare parquet frame re-scans the disk artifact per
    * reference — at sf10 the rescans cost more than the derive the artifact
    * saved (dedup_containment 189 s vs the r9 in-memory form's 105 s). Worse,
    * the artifact is SMALL on disk (8-byte pairs compress to ~220 MB at
    * sf10), so maxPartitionBytes coalesces the scan to ~3 partitions and
    * every downstream band join inherits 3-way parallelism — the repartition
    * restores full width AND hash-clusters by doc_id, which the signature
    * groupBy then consumes exchange-free. One scan + one narrow shuffle into
    * MEMORY_AND_DISK blocks keeps the cross-query disk sharing AND the
    * in-query block reuse.
    */
  /** (session, dir) → the checkpointed shingle frame plus its backing RDD
    * handle. Without the memo every dedup entry point re-materialized its
    * own MEMORY_AND_DISK copy of the same artifact, and copies piled up
    * until the ContextCleaner GC'd them (ADVICE r10). The RDD handle makes
    * the memo SAFE under the harness's blanket between-query unpersist: a
    * localCheckpoint's lineage is truncated, so a cached frame whose blocks
    * were dropped cannot recompute — the validity probe (storage level
    * reset to NONE by unpersist) re-checkpoints instead of crashing.
    */
  private val shingleMemo = new java.util.concurrent.ConcurrentHashMap[
    String, (DataFrame, org.apache.spark.rdd.RDD[_])]()

  private[graft] def docShingles(spark: SparkSession, dir: String): DataFrame = {
    val loc = shinglesLocation(spark)
    graft.sources.WriteOnce.ensure(loc, dir)(
      shinglesOf(Tables.documents(spark, dir))
        .write.mode("overwrite").parquet(loc))
    val key = System.identityHashCode(spark) + "#" + dir
    shingleMemo.compute(key, (_, cached) =>
      if (cached != null &&
          cached._2.getStorageLevel != org.apache.spark.storage.StorageLevel.NONE)
        cached
      else {
        // a superseded entry for the same session (dir switch) holds dead
        // blocks — release them before caching the replacement
        shingleMemo.forEach((k, v) =>
          if (k != key && k.startsWith(System.identityHashCode(spark) + "#")) {
            graft.sources.Pinned.unpin(v._2.id)
            v._2.unpersist(blocking = false); shingleMemo.remove(k)
          })
        val df = spark.read.parquet(loc)
          .repartition(spark.sparkContext.defaultParallelism, col("doc_id"))
          .localCheckpoint(eager = true)
        val rdd = df.queryExecution.analyzed.collectFirst {
          case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd
        }.getOrElse(df.rdd)
        // pinned: the harness's between-query unpersist exempts this id, so
        // the artifact survives the sweep instead of re-checkpointing per
        // consumer query
        graft.sources.Pinned.pin(rdd.id)
        (df, rdd)
      })._1
  }

  /** Non-distinct digest stream for the signature-only path: MIN-aggregation
    * is insensitive to duplicate shingles, so computing signatures from the
    * raw explode skips the distinct's full shuffle — the groupBy(doc_id)
    * min-aggs partial-aggregate map-side to one row per doc before any data
    * moves. (Pair queries keep the distinct table: Jaccard needs set counts.)
    */
  private def docShinglesAll(spark: SparkSession, dir: String): DataFrame =
    shingleDigests(Tables.documents(spark, dir))

  private val docShinglesSql: String =
    s"""shingles0 AS (
       |  SELECT doc_id,
       |         list_transform(regexp_split_to_array(text, '\\s+'),
       |                        w -> ('0x' || substr(md5(w), 1, 7))::BIGINT) AS hw
       |  FROM documents
       |), shingles AS (
       |  SELECT DISTINCT s.doc_id,
       |         ((((coalesce(s.hw[g.i + 1], 0) * 69069 + coalesce(s.hw[g.i + 2], 0)) % $M31) * 69069
       |           + coalesce(s.hw[g.i + 3], 0)) % $M31) AS base
       |  FROM shingles0 s,
       |       LATERAL (SELECT unnest(generate_series(0, greatest(len(s.hw) - 3, 0))) AS i) g
       |)""".stripMargin

  /** Exact dedup: canonical = min doc_id per identical text; grouped on the
    * md5 digest so the shuffle key is 32 bytes regardless of document size.
    */
  def exact(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(md5(col("text")))
    Tables.documents(spark, dir)
      .select(col("doc_id"),
        min(col("doc_id")).over(w).as("canonical_id"),
        count(lit(1)).over(w).as("group_size"))
      .withColumn("is_dup", col("doc_id") =!= col("canonical_id"))
  }

  /** MinHash signatures: minhash_h = min over shingles of an integer LCG of the
    * shingle digest (exact BIGINT arithmetic, identical in DuckDB), then LSH
    * band keys = the concatenated in-band minhashes.
    */
  def minhashBands(spark: SparkSession, dir: String): DataFrame =
    bandsOf(spark, docShinglesAll(spark, dir))

  private def bandsOf(spark: SparkSession, sh: DataFrame): DataFrame = {
    // all k minhashes as parallel min-aggregates in ONE pass (no k-fold explode:
    // shuffle volume is #docs × k values, scan volume is the shingle table once)
    val mins = (0 until NumHashes).map { h =>
      min((col("base") * (69069L + 2L * h) + 12345L) % 2147483648L).as(s"mh$h")
    }
    val sig = sh.groupBy("doc_id").agg(mins.head, mins.tail: _*)
    val bandCols = (0 until NumHashes / BandRows).map { b =>
      struct(lit(b).as("band"),
        concat_ws("-", (0 until BandRows).map(r => col(s"mh${b * BandRows + r}").cast("string")): _*).as("band_key"))
    }
    sig.select(col("doc_id"), explode(array(bandCols: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band").as("band"), col("bk.band_key").as("band_key"))
  }

  private def minhashBandsSql: String = {
    val minExprs = (0 until NumHashes).map { h =>
      s"min((base * ${69069 + 2 * h} + 12345) % 2147483648) AS mh$h"
    }.mkString(",\n       |         ")
    val bandSelects = (0 until NumHashes / BandRows).map { b =>
      val key = (0 until BandRows).map(r => s"CAST(mh${b * BandRows + r} AS VARCHAR)").mkString(" || '-' || ")
      s"SELECT doc_id, CAST($b AS INT) AS band, $key AS band_key FROM mh"
    }.mkString("\n       |  UNION ALL ")
    s"""WITH $docShinglesSql,
       |mh AS (
       |  SELECT doc_id,
       |         $minExprs
       |  FROM shingles GROUP BY doc_id
       |), bands AS (
       |  $bandSelects
       |)""".stripMargin
  }

  /** LSH candidate pairs (same band key) verified with exact shingle Jaccard.
    * Buckets above [[MaxBandBucket]] are excluded before the self-join (the
    * window count shuffles on the same (band, band_key) the join needs, so the
    * guard adds no extra shuffle of the bands table).
    */
  def minhashPairs(spark: SparkSession, dir: String): DataFrame =
    minhashPairsOf(docShingles(spark, dir))

  /** Contract: `sh` must already be materialized (the [[docShingles]] memo
    * frame, or a caller-side checkpoint) — it is referenced four times
    * (bands, intersection twice, sizes). This method used to defensively
    * `localCheckpoint` its input, which duplicated the memoized shingle
    * frame per query: at sf100 the second ~400 M-row copy no longer fits in
    * storage memory next to the first and the spill made the re-checkpoint
    * alone 144 s of the 164 s query (51× for 10× docs — the r10 `weak`
    * docs_curation_report decade ratio lived entirely in this line; every
    * other phase of the chain scaled 5-6×).
    */
  private[graft] def minhashPairsOf(sh: DataFrame): DataFrame =
    withJaccard(sh, minhashCandidatesOf(sh))

  /** Raw LSH band candidates (pre-verification) over a shingle frame. */
  private[graft] def minhashCandidatesOf(sh: DataFrame): DataFrame = {
    val spark = sh.sparkSession
    val wBucket = Window.partitionBy("band", "band_key")
    val bands = bandsOf(spark, sh)
      .withColumn("bsz", count(lit(1)).over(wBucket))
      .filter(col("bsz") <= MaxBandBucket)
      .drop("bsz")
      .localCheckpoint(true)
    bands.as("a").join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()
  }

  /** Attach set-overlap counts (n_shared, n_a, n_b) to a (doc_a, doc_b) pair
    * set — the shared base for every set-resemblance measure (Jaccard,
    * containment). */
  private def withOverlap(sh: DataFrame, pairs: DataFrame): DataFrame = {
    val sizes = sh.groupBy("doc_id").agg(count(lit(1)).as("n_sh"))
    val shA = sh.select(col("doc_id").as("doc_a"), col("base"))
    val shB = sh.select(col("doc_id").as("doc_b"), col("base"))
    pairs
      .join(shA, "doc_a")
      .join(shB, Seq("doc_b", "base")) // equi-join on (doc_b, base) = set intersection
      .groupBy("doc_a", "doc_b")
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("n_sh", "n_b"), "doc_b")
  }

  /** Attach exact digest-set Jaccard to a (doc_a, doc_b) pair set. */
  private[graft] def withJaccard(sh: DataFrame, pairs: DataFrame): DataFrame =
    withOverlap(sh, pairs)
      .select(col("doc_a"), col("doc_b"),
        r6(col("n_shared").cast("double") /
          (col("n_a") + col("n_b") - col("n_shared")).cast("double")).as("jaccard"))

  /** N-gram Jaccard near-dup: block on shared rare shingles (df ≤ MaxShingleDf),
    * require ≥ MinSharedRare shared rare shingles (the groupBy count doubles as
    * the candidate dedup — no separate DISTINCT pass), then exact Jaccard ≥
    * threshold over the full shingle sets.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairsOf(docShingles(spark, dir))

  /** Same walk over an already-checkpointed shingle frame, so callers that
    * need both detectors ([[minhashQuality]]) scan and shingle the corpus
    * once.
    */
  private[graft] def ngramJaccardPairsOf(sh: DataFrame): DataFrame =
    withJaccard(sh, rareBlockedCands(sh)).filter(col("jaccard") >= JaccardThreshold)

  /** Rare-shingle-blocked candidate pairs (the stage shared by the Jaccard
    * and containment detectors): pairs sharing >= [[MinSharedRare]] shingles
    * of document frequency <= [[MaxShingleDf]]. */
  private def rareBlockedCands(sh: DataFrame): DataFrame = {
    val rare = sh.groupBy("base").agg(count(lit(1)).as("df"))
      .filter(col("df") <= MaxShingleDf && col("df") >= 2)
    val blocked = sh.join(rare.select("base"), "base")
      .select("doc_id", "base").localCheckpoint(true)
    blocked.as("a").join(blocked.as("b"),
        col("a.base") === col("b.base") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_rare_shared"))
      .filter(col("n_rare_shared") >= MinSharedRare)
      .select("doc_a", "doc_b")
  }

  /** Containment threshold: a pair where the smaller shingle set is at least
    * half inside the larger is an asymmetric near-dup candidate. */
  val ContainmentThreshold = 0.5

  /** Containment near-dup: |A intersect B| / min(|A|, |B|) over the same
    * rare-shingle-blocked candidates as [[ngramJaccardPairsOf]]. Jaccard is
    * blind to ASYMMETRIC duplication -- a short doc quoted whole inside a much
    * longer one scores |A|/|B| (small) on Jaccard but 1.0 on containment
    * (Broder's resemblance-vs-containment distinction, "On the resemblance
    * and containment of documents", SEQUENCES 1997). Both measures are
    * emitted side by side so the gap itself is queryable; the candidate
    * stage, and therefore the scale shape, is unchanged.
    */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val cont = r6(col("n_shared").cast("double") /
      least(col("n_a"), col("n_b")).cast("double"))
    val jac = r6(col("n_shared").cast("double") /
      (col("n_a") + col("n_b") - col("n_shared")).cast("double"))
    withOverlap(sh, rareBlockedCands(sh))
      .select(col("doc_a"), col("doc_b"), col("n_a"), col("n_b"), col("n_shared"),
        cont.as("containment"), jac.as("jaccard"))
      .filter(col("containment") >= ContainmentThreshold)
  }

  /** Which doc_ids play the "newly arrived batch" in the incremental pass. */
  val NewBatchMod = 10

  /** Incremental near-dup — the shape a PRODUCTION dedup service actually
    * runs: a newly-arrived batch (1-in-[[NewBatchMod]] docs here) is probed
    * against the EXISTING corpus's band index instead of re-running the full
    * self-join. The candidate join is asymmetric (new bands ⋈ corpus bands on
    * the same (band, band_key)), so its cost is O(batch × bucket), not
    * O(corpus²): the corpus side is the pre-built index a service keeps
    * materialized, and only the batch is shingled fresh. New-vs-new pairs are
    * deliberately NOT emitted — intra-batch dedup is the existing self-join
    * pass ([[minhashPairs]]); this operator answers "which incoming docs
    * already exist", the gate an ingest applies before admission (the same
    * split [[graft.streaming.CurationStream]] documents for its exact-dedup
    * state). The [[MaxBandBucket]] degenerate-bucket guard applies to the
    * corpus index side, same as the batch detector.
    */
  def incrementalPairs(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val bands = bandsOf(spark, sh).localCheckpoint(true)
    val isNew = col("doc_id") % NewBatchMod === (NewBatchMod - 1)
    val wBucket = Window.partitionBy("band", "band_key")
    val index = bands.filter(!isNew)
      .withColumn("bsz", count(lit(1)).over(wBucket))
      .filter(col("bsz") <= MaxBandBucket)
      .select(col("doc_id").as("doc_b"), col("band"), col("band_key"))
    val cand = bands.filter(isNew)
      .select(col("doc_id").as("doc_a"), col("band"), col("band_key"))
      .join(index, Seq("band", "band_key"))
      .select("doc_a", "doc_b").distinct()
    withJaccard(sh, cand)
  }

  /** Max Hamming distance for a SimHash near-dup pair, and the blocking that
    * finds them without all-pairs: split the [[SimBits]]-bit fingerprint into
    * HammingMax + 1 = 4 blocks of [[SimBlockBits]] bits — a pair within
    * Hamming 3 differs in at most 3 blocks, so by pigeonhole it MATCHES on
    * at least one, and the (block, value) equi-join surfaces every such pair.
    * Exact popcount(xor) then keeps the true ones. Same blocked-candidate
    * discipline as MinHash bands and LSH buckets.
    *
    * The pigeonhole guarantee (no false negatives) holds for UNCAPPED
    * buckets only: [[MaxSimBucket]] skips block values shared by >256 docs,
    * so a near-dup cluster larger than the cap (e.g. reordered-token copies
    * with identical fingerprints) loses the pairs that only co-occur in its
    * flooded blocks. That trade is measured, not assumed — the
    * `dedup_band_recall` twin reports the blocked detector's recall against
    * ground truth with the cap in force.
    */
  val HammingMax = 3

  /** Fingerprint width. The r8 16-bit demo form gave each block 4 bits = 16
    * bucket values, so buckets held n/16 docs and candidates went quadratic —
    * the sf10 rehearsal (500k docs) measured the detector at a disk-filling
    * >70 GB candidate shuffle. 60 bits (md5's first 15 hex chars — the widest
    * value that stays inside a SIGNED 64-bit long in both engines) gives
    * 15-bit blocks = 32,768 values, the Manku et al. (WWW'07) production
    * shape; expected bucket stays ≤ ~n/32768 and candidates linear into the
    * millions of docs.
    */
  val SimBits = 60
  val SimBlockBits: Int = SimBits / (HammingMax + 1)
  val SimBlockMod: Long = 1L << SimBlockBits
  /** Degenerate-bucket guard, same stance as the MinHash [[MaxBandBucket]]:
    * a block value shared by more docs than this is uninformative (an
    * identical-doc flood — exact dedup's job) and is skipped rather than
    * allowed to go quadratic.
    */
  val MaxSimBucket = 256L

  /** Raw Hamming-≤ 3 pairs over the blocked candidates. The registered query
    * aggregates to the per-distance histogram ([[simhashPairStats]]):
    * constant-size output at any scale while still executing the full
    * blocked pipeline; the raw pair frame stays the composable building
    * block. At 60 bits Hamming ≤ 3 is a HIGH-PRECISION detector (only
    * near-identical token multisets land that close), which is exactly the
    * production simhash operating point.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    val fp = simhash(spark, dir).localCheckpoint(true)
    val blockCols = (0 to HammingMax).map { b =>
      struct(lit(b).as("blk"),
        (shiftright(col("simhash"), b * SimBlockBits) % SimBlockMod).as("bv"))
    }
    val wBucket = Window.partitionBy("blk", "bv")
    val blocks = fp
      .select(col("doc_id"), col("simhash"), explode(array(blockCols: _*)).as("e"))
      .select(col("doc_id"), col("simhash"), col("e.blk").as("blk"), col("e.bv").as("bv"))
      .withColumn("bsz", count(lit(1)).over(wBucket))
      .filter(col("bsz") <= MaxSimBucket)
    val cand = blocks.as("a").join(blocks.as("b"),
        col("a.blk") === col("b.blk") && col("a.bv") === col("b.bv") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      // multi-block matches dedup via distinct: the r8 emit-on-first-block
      // map-side filter assumed every matching block PRODUCES the candidate,
      // which the bucket cap above breaks (a pair whose earlier matching
      // block was capped away would be dropped entirely). The candidate set
      // is bucket-capped now, so the distinct shuffle is bounded.
      .distinct()
    cand
      .withColumn("hamming", bit_count(col("sh_a").bitwiseXOR(col("sh_b"))))
      .filter(col("hamming") <= HammingMax)
      .select("doc_a", "doc_b", "hamming")
  }

  /** Pair count per Hamming distance — the bounded-output report form. */
  def simhashPairStats(spark: SparkSession, dir: String): DataFrame =
    simhashPairs(spark, dir)
      .groupBy("hamming")
      .agg(count(lit(1)).as("n_pairs"))

  /** The simhash derivation as a reusable CTE chain ending in
    * `fp(doc_id, simhash)` — shared by the fingerprint and pair oracles.
    */
  private def simhashSqlChain: String =
    s"""WITH toks AS (
       |  SELECT DISTINCT doc_id, unnest(regexp_split_to_array(text, '\\s+')) AS tok
       |  FROM documents
       |), hv_t AS (
       |  SELECT doc_id, tok, ('0x' || substr(md5(tok), 1, 15))::BIGINT AS hv FROM toks
       |), votes AS (
       |  SELECT doc_id, CAST(b.i AS INT) AS bit,
       |         CAST(sum(CASE WHEN (hv >> CAST(b.i AS INT)) % 2 = 1 THEN 1 ELSE -1 END) AS BIGINT) AS v
       |  FROM hv_t CROSS JOIN range(0, $SimBits) b(i)
       |  GROUP BY doc_id, b.i
       |), fp AS (
       |  SELECT doc_id,
       |         CAST(sum(CASE WHEN v > 0 THEN (1::BIGINT << bit) ELSE 0 END) AS BIGINT) AS simhash
       |  FROM votes GROUP BY doc_id
       |)""".stripMargin

  /** Banding-quality measurement — the dedup twin of the ANN recall rows
    * (`ann_*_recall`): precision and recall of the RAW MinHash band-candidate
    * generator against the exact-Jaccard near-dup detector
    * ([[ngramJaccardPairs]], itself hash-verified). This is the number an
    * operator reads before trusting banded dedup at scale: recall says what
    * fraction of true near-dups the bands even surface (missed pairs are
    * unrecoverable — verification only filters), precision says how much
    * of the candidate volume the Jaccard verification pass will throw away
    * (pure compute cost). One summary row; the pair sets are combined with
    * a tag-union + two-key max so nothing joins wider than the pair id.
    */
  def minhashQuality(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val cand = minhashCandidatesOf(sh)
      .withColumn("in_cand", lit(1)).withColumn("in_truth", lit(0))
    val truth = ngramJaccardPairsOf(sh)
      .select("doc_a", "doc_b")
      .withColumn("in_cand", lit(0)).withColumn("in_truth", lit(1))
    cand.union(truth)
      .groupBy("doc_a", "doc_b")
      .agg(max(col("in_cand")).as("c"), max(col("in_truth")).as("t"))
      .agg(
        sum(col("c")).cast("long").as("n_candidates"),
        sum(col("t")).cast("long").as("n_true"),
        sum(col("c") * col("t")).cast("long").as("n_hit"))
      .select(col("n_candidates"), col("n_true"), col("n_hit"),
        // zero-guard: double 0/0 is NaN in Spark but NULL in DuckDB, so on a
        // corpus with no candidates / no truth pairs the engines would
        // disagree exactly on the empty edge (ADVICE r5) — both now emit NULL
        when(col("n_candidates") > 0,
          r6(col("n_hit").cast("double") / col("n_candidates").cast("double")))
          .as("band_precision"),
        when(col("n_true") > 0,
          r6(col("n_hit").cast("double") / col("n_true").cast("double")))
          .as("band_recall"))
  }

  /** The banding S-curve, theory vs measurement — THE tuning chart for
    * (bands b, rows r): at Jaccard s a pair survives some band with
    * probability 1−(1−s^r)^b, and choosing (b, r) IS choosing where that
    * curve's cliff sits. This query puts the measured detection rate of the
    * real band-candidate generator next to the theoretical curve per
    * 0.1-wide Jaccard bin (exact Jaccard from the blocked detector, all
    * pairs, unthresholded), so an operator retuning b×r reads where the
    * implementation's cliff actually lands — and a banding bug (wrong key
    * assembly, dropped band) shows up as measurement detaching from theory.
    * Cost rides the already-blocked pair set; binning is map-side floor
    * arithmetic on r6-exact Jaccards, the rollup ≤10 rows.
    */
  def lshScurve(spark: SparkSession, dir: String): DataFrame = {
    val b = NumHashes / BandRows
    val sh = docShingles(spark, dir)
    val jac = withJaccard(sh, rareBlockedCands(sh))
    val cand = minhashCandidatesOf(sh)
      .select(col("doc_a"), col("doc_b")).withColumn("det", lit(1L))
    val sMid = (col("bin").cast("double") + 0.5) / 10.0
    jac.join(cand, Seq("doc_a", "doc_b"), "left")
      .select(least(floor(col("jaccard") * 10.0).cast("int"), lit(9)).as("bin"),
        coalesce(col("det"), lit(0L)).as("det"))
      .groupBy("bin")
      .agg(count(lit(1)).as("n_pairs"), sum(col("det")).as("n_detected"))
      .select(col("bin"), r6(sMid).as("s_mid"), col("n_pairs"), col("n_detected"),
        r6(col("n_detected").cast("double") / col("n_pairs").cast("double"))
          .as("measured_detect"),
        r6(lit(1.0) - pow(lit(1.0) - pow(sMid, BandRows.toDouble), b.toDouble))
          .as("theoretical_detect"))
  }

  def lshScurveOracle: String = {
    val b = NumHashes / BandRows
    val sMid = "(CAST(bin AS DOUBLE) + 0.5) / 10.0"
    minhashCandSql +
      s""", rare AS (
         |  SELECT base FROM shingles GROUP BY base
         |  HAVING count(*) <= $MaxShingleDf AND count(*) >= 2
         |), blocked AS (
         |  SELECT s.doc_id, s.base FROM shingles s JOIN rare r ON s.base = r.base
         |), cand_ng AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM blocked a JOIN blocked b ON a.base = b.base AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSharedRare
         |)${jaccardSql("cand_ng")}
         |, binned AS (
         |  SELECT least(CAST(floor(j.jaccard * 10.0) AS INT), 9) AS bin,
         |         CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS det
         |  FROM jac j LEFT JOIN cand c ON c.doc_a = j.doc_a AND c.doc_b = j.doc_b
         |)
         |SELECT bin, ${sqlR6(sMid)} AS s_mid,
         |       count(*) AS n_pairs, CAST(sum(det) AS BIGINT) AS n_detected,
         |       ${sqlR6("CAST(sum(det) AS DOUBLE) / CAST(count(*) AS DOUBLE)")} AS measured_detect,
         |       ${sqlR6(s"1.0 - power(1.0 - power($sMid, $BandRows.0), $b.0)")} AS theoretical_detect
         |FROM binned GROUP BY 1 ORDER BY 1""".stripMargin
  }

  /** Detector-agreement matrix — which near-dup detector finds what: the
    * exact-Jaccard truth set, the MinHash band candidates, and the SimHash
    * Hamming-≤[[HammingMax]] pairs combined into one Venn breakdown (one row
    * per membership combination with its pair count). This is the
    * operational complement of [[minhashQuality]]'s single precision/recall
    * row: it shows WHERE the detectors disagree — pairs only SimHash sees
    * (token-frequency similarity without shingle overlap), pairs only the
    * bands surface (candidate noise), pairs everyone agrees on. Pair sets
    * combine by tag-union + per-pair max flags — nothing ever joins wider
    * than the pair id — and the rollup is ≤7 rows.
    */
  def detectorOverlap(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val t = ngramJaccardPairsOf(sh).select(col("doc_a"), col("doc_b"), lit("t").as("src"))
    val m = minhashCandidatesOf(sh).select(col("doc_a"), col("doc_b"), lit("m").as("src"))
    val s2 = simhashPairs(spark, dir).select(col("doc_a"), col("doc_b"), lit("s").as("src"))
    t.unionByName(m).unionByName(s2)
      .groupBy("doc_a", "doc_b")
      .agg(max(when(col("src") === "t", 1).otherwise(0)).as("in_ngram"),
        max(when(col("src") === "m", 1).otherwise(0)).as("in_minhash"),
        max(when(col("src") === "s", 1).otherwise(0)).as("in_simhash"))
      .groupBy("in_ngram", "in_minhash", "in_simhash")
      .agg(count(lit(1)).as("n_pairs"))
  }

  def detectorOverlapOracle: String =
    minhashCandSql +
      s""", rare AS (
         |  SELECT base FROM shingles GROUP BY base
         |  HAVING count(*) <= $MaxShingleDf AND count(*) >= 2
         |), blocked AS (
         |  SELECT s.doc_id, s.base FROM shingles s JOIN rare r ON s.base = r.base
         |), cand_ng AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM blocked a JOIN blocked b ON a.base = b.base AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSharedRare
         |)${jaccardSql("cand_ng")}
         |, truth AS (
         |  SELECT doc_a, doc_b FROM jac WHERE jaccard >= ${sqlD(JaccardThreshold)}
         |), ${simhashSqlChain.stripPrefix("WITH ")}
         |, sblocks0 AS (
         |  SELECT doc_id, simhash, b.i AS blk,
         |         (simhash >> (CAST(b.i AS INT) * $SimBlockBits)) % $SimBlockMod AS bv
         |  FROM fp CROSS JOIN range(0, ${HammingMax + 1}) b(i)
         |), sblocks AS (
         |  SELECT doc_id, simhash, blk, bv FROM (
         |    SELECT *, count(*) OVER (PARTITION BY blk, bv) AS bsz FROM sblocks0)
         |  WHERE bsz <= $MaxSimBucket
         |), scand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM sblocks a JOIN sblocks b
         |    ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
         |), spairs AS (
         |  SELECT doc_a, doc_b FROM scand WHERE bit_count(xor(sh_a, sh_b)) <= $HammingMax
         |), tagged AS (
         |  SELECT doc_a, doc_b, 't' AS src FROM truth
         |  UNION ALL SELECT doc_a, doc_b, 'm' FROM cand
         |  UNION ALL SELECT doc_a, doc_b, 's' FROM spairs
         |), flags AS (
         |  SELECT doc_a, doc_b,
         |         max(CASE WHEN src = 't' THEN 1 ELSE 0 END) AS in_ngram,
         |         max(CASE WHEN src = 'm' THEN 1 ELSE 0 END) AS in_minhash,
         |         max(CASE WHEN src = 's' THEN 1 ELSE 0 END) AS in_simhash
         |  FROM tagged GROUP BY 1, 2
         |)
         |SELECT CAST(in_ngram AS INT) AS in_ngram, CAST(in_minhash AS INT) AS in_minhash,
         |       CAST(in_simhash AS INT) AS in_simhash, count(*) AS n_pairs
         |FROM flags GROUP BY 1, 2, 3
         |ORDER BY 1, 2, 3""".stripMargin

  def minhashQualityOracle: String =
    minhashCandSql +
      s""", rare AS (
         |  SELECT base FROM shingles GROUP BY base
         |  HAVING count(*) <= $MaxShingleDf AND count(*) >= 2
         |), blocked AS (
         |  SELECT s.doc_id, s.base FROM shingles s JOIN rare r ON s.base = r.base
         |), cand_ng AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM blocked a JOIN blocked b ON a.base = b.base AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSharedRare
         |)${jaccardSql("cand_ng")}
         |, truth AS (
         |  SELECT doc_a, doc_b FROM jac WHERE jaccard >= ${sqlD(JaccardThreshold)}
         |), flags AS (
         |  SELECT (c.doc_a IS NOT NULL) AS in_cand, (t.doc_a IS NOT NULL) AS in_truth
         |  FROM cand c FULL OUTER JOIN truth t
         |    ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
         |)
         |SELECT CAST(sum(CASE WHEN in_cand THEN 1 ELSE 0 END) AS BIGINT) AS n_candidates,
         |       CAST(sum(CASE WHEN in_truth THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
         |       CAST(sum(CASE WHEN in_cand AND in_truth THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
         |       ${sqlR6("CAST(sum(CASE WHEN in_cand AND in_truth THEN 1 ELSE 0 END) AS DOUBLE) / NULLIF(CAST(sum(CASE WHEN in_cand THEN 1 ELSE 0 END) AS DOUBLE), 0)")} AS band_precision,
         |       ${sqlR6("CAST(sum(CASE WHEN in_cand AND in_truth THEN 1 ELSE 0 END) AS DOUBLE) / NULLIF(CAST(sum(CASE WHEN in_truth THEN 1 ELSE 0 END) AS DOUBLE), 0)")} AS band_recall
         |FROM flags""".stripMargin

  /** SimHash: [[SimBits]]-bit fingerprint from per-token md5 bits, weight ±1
    * per distinct token; bit set iff the signed vote is positive. 15 hex
    * chars of the md5 = 60 bits — the widest value that fits a SIGNED 64-bit
    * long in both engines (16 chars can exceed 2^63 and overflow the cast).
    *
    * One pass: all bit votes are parallel conditional sums in a single
    * `groupBy(doc_id)` — the same trick as the k-minhash aggregation — instead
    * of a crossJoin fan-out of the token table followed by two aggregations
    * (VERDICT r1 "what's wrong #2": 33× slower under the driver bench).
    */
  def simhash(spark: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(spark, dir)
      .select(col("doc_id"), explode(words).as("tok")).distinct()
      .withColumn("hv", conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long"))
    val votes = (0 until SimBits).map { b =>
      sum(when(shiftright(col("hv"), b) % 2 === 1, 1).otherwise(-1)).as(s"v$b")
    }
    toks.groupBy("doc_id").agg(votes.head, votes.tail: _*)
      .select(col("doc_id"),
        (0 until SimBits).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
  }

  /** Jaccard floor for an edge to join the duplicate-cluster graph. */
  val ClusterJaccard = 0.5
  /** Propagation-round cap: min-label propagation converges in ≤ graph-diameter
    * rounds, and duplicate components are dense and small (boilerplate chains);
    * the cap is a runaway guard, not an accuracy bound — the loop exits on the
    * first round with zero label changes.
    */
  val MaxClusterIters = 50

  /** Duplicate CLUSTERS: connected components over the LSH near-dup pair graph
    * (pairs with Jaccard ≥ [[ClusterJaccard]]), labeling each member doc with
    * the minimum doc_id of its component — the canonical-representative form a
    * dedup pipeline actually consumes (keep cluster_id, drop the rest).
    *
    * Distributed shape: iterative min-label propagation — each round is one
    * equi-join of the edge list against the current labels plus a min-agg,
    * repeated until a round changes nothing. Rounds are all-Spark (shuffle on
    * doc_id, partial min-agg map-side); the driver only checks the converged
    * flag (a 1-row count per round, the I3 epoch-loop pattern). At 100 TB the
    * same loop holds — candidate pairs are already bucket-bounded upstream —
    * with large-star/small-star the drop-in replacement if components with
    * huge diameters ever appear (near-dup components don't: they are cliques
    * up to hash noise).
    */
  def duplicateClusters(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashPairs(spark, dir)
      .filter(col("jaccard") >= ClusterJaccard)
      .select("doc_a", "doc_b").localCheckpoint(true)
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
      .unionByName(pairs.select(col("doc_b").as("src"), col("doc_a").as("dst")))
      .localCheckpoint(true)
    // base frames (pairs, edges) stay pinned for the whole propagation; every
    // per-round labels checkpoint is unpersisted as soon as its successor is
    // materialized, so at most two label snapshots hold blocks at a time
    // instead of up to MaxClusterIters of them. Snapshot ownership is tracked
    // by RDD id (Checkpoints.tracked) rather than a global persistent-set
    // diff, so concurrent persists by unrelated code are never swept up.
    var (labelsCp, labelIds) = graft.functions.Checkpoints.tracked(
      edges.select(col("src").as("doc_id")).distinct()
        .withColumn("label", col("doc_id")))
    var labels = labelsCp
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < MaxClusterIters) {
      val nbrMin = edges.join(labels, col("src") === col("doc_id"))
        .groupBy(col("dst")).agg(min(col("label")).as("nbr"))
        .withColumnRenamed("dst", "doc_id")
      val (next, nextIds) = graft.functions.Checkpoints.tracked(
        labels.join(nbrMin, Seq("doc_id"), "left")
          .select(col("doc_id"),
            least(col("label"), coalesce(col("nbr"), col("label"))).as("label"),
            (coalesce(col("nbr"), col("label")) < col("label")).as("chg")))
      changed = next.filter(col("chg")).count()
      // `next` is eagerly materialized above, so the superseded labels blocks
      // are no longer reachable by any future computation
      graft.functions.Checkpoints.release(next, labelIds)
      labelIds = nextIds
      labels = next.select("doc_id", "label")
      iter += 1
    }
    val sizes = labels.groupBy("label").agg(count(lit(1)).as("cluster_size"))
    labels.join(sizes, "label")
      .select(col("doc_id"), col("label").as("cluster_id"), col("cluster_size"))
  }

  /** Embedding-cosine near-dup: nearest neighbour within the same label block
    * for a query subset; near_dup flag at cosine ≥ 0.9.
    */
  def embeddingNearDup(spark: SparkSession, dir: String): DataFrame = {
    val emb = Tables.embeddings(spark, dir)
      .select(col("vec_id"), col("label"),
        transform(col("embedding"), x => x.cast("double")).as("v"))
      .withColumn("norm", sqrt(aggregate(col("v"), lit(0.0), (acc, x) => acc + x * x)))
    val q = emb.filter(col("vec_id") < 200)
      .select(col("vec_id").as("qid"), col("label"), col("v").as("qv"), col("norm").as("qn"))
    val dot = (a: Column, b: Column) => aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)
    val pairs = q.join(emb, Seq("label"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn("cos", r6(dot(col("qv"), col("v")) / (col("qn") * col("norm"))))
    val w = Window.partitionBy("qid").orderBy(desc("cos"), asc("vec_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("qid"), col("vec_id").as("nn_id"), col("cos"),
        (col("cos") >= 0.9).as("near_dup"))
  }

  // ---------------- DuckDB oracle twins ----------------

  /** Full LSH pair chain ending in `jac(doc_a, doc_b, jaccard)` — shared by
    * the pair/cluster oracles here and by the corpus-curation oracle.
    */
  /** The band-candidate CTE alone (`cand`), reused by the pair chain and the
    * banding-quality oracle.
    */
  private[operators] def minhashCandSql: String = minhashBandsSql +
    s""", bands_ok AS (
       |  SELECT doc_id, band, band_key FROM (
       |    SELECT *, count(*) OVER (PARTITION BY band, band_key) AS bsz FROM bands
       |  ) WHERE bsz <= $MaxBandBucket
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM bands_ok a JOIN bands_ok b
       |    ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
       |)""".stripMargin

  private[operators] def minhashPairsSqlChain: String =
    minhashCandSql + jaccardSql("cand")

  private def jaccardSql(candCte: String): String =
    s""", sizes AS (
       |  SELECT doc_id, count(*) AS n_sh FROM shingles GROUP BY doc_id
       |), shared AS (
       |  SELECT c.doc_a, c.doc_b, count(*) AS n_shared
       |  FROM $candCte c
       |  JOIN shingles sa ON sa.doc_id = c.doc_a
       |  JOIN shingles sb ON sb.doc_id = c.doc_b AND sb.base = sa.base
       |  GROUP BY c.doc_a, c.doc_b
       |), jac AS (
       |  SELECT s.doc_a, s.doc_b,
       |         ${sqlR6("CAST(n_shared AS DOUBLE) / CAST(na.n_sh + nb.n_sh - n_shared AS DOUBLE)")} AS jaccard
       |  FROM shared s
       |  JOIN sizes na ON na.doc_id = s.doc_a
       |  JOIN sizes nb ON nb.doc_id = s.doc_b
       |)""".stripMargin

  /** Cluster-canonical dedup ACTION view — the pass that turns near-dup
    * clustering into a corpus decision: every doc maps to its cluster
    * representative (the propagated min-label IS the min doc_id of the
    * component), singletons keep themselves. The "fuzzy dedup keeps one
    * representative per connected component" convention of LLM corpus
    * pipelines; downstream filters on `is_kept`.
    */
  def canonical(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(col("doc_id"))
      .join(duplicateClusters(spark, dir).select("doc_id", "cluster_id"), Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("keeper_id"),
        (coalesce(col("cluster_id"), col("doc_id")) === col("doc_id")).as("is_kept"))

  /** edges → nodes → reach → clusters(doc_id, cluster_id): the transitive-
    * closure CTE block shared by the cluster and canonical oracles.
    */
  private def clusterCtesSql: String =
    s""",
       |edges AS (
       |  SELECT doc_a AS src, doc_b AS dst FROM jac WHERE jaccard >= ${sqlD(ClusterJaccard)}
       |  UNION ALL
       |  SELECT doc_b AS src, doc_a AS dst FROM jac WHERE jaccard >= ${sqlD(ClusterJaccard)}
       |), nodes AS (
       |  SELECT DISTINCT src AS id FROM edges
       |), reach AS (
       |  SELECT id, id AS r FROM nodes
       |  UNION
       |  SELECT e.dst AS id, reach.r FROM edges e JOIN reach ON reach.id = e.src
       |), clusters AS (
       |  SELECT id AS doc_id, min(r) AS cluster_id FROM reach GROUP BY id
       |)""".stripMargin

  /** Duplication-severity histogram — the report a corpus owner reads before
    * choosing a dedup policy: how many near-dup components exist at each
    * size. Rides the same connected-components pass as `dedup_clusters`
    * (components only contain docs with at least one near-dup edge, so sizes
    * start at 2); output is bounded by the largest component size.
    */
  def clusterSizeHist(spark: SparkSession, dir: String): DataFrame =
    duplicateClusters(spark, dir)
      .select("cluster_id", "cluster_size").distinct()
      .groupBy("cluster_size")
      .agg(count(lit(1)).as("n_clusters"))

  /** Blocking key for the edit-distance detector: normalized-text prefix
    * length and the length-bucket width. */
  val EditBlockPrefix = 16
  val EditLenBucket = 32
  /** Edit-distance accept threshold (absolute edits on normalized text). */
  val EditMaxDist = 8
  /** Degenerate-block guard, same stance as [[MaxBandBucket]]: a block that
    * collects mass-duplicated boilerplate would make the within-block join
    * quadratic; such text is exact-dedup's job. Fixture max block: 4. */
  val MaxEditBlock = 64

  /** Near-dup pairs by LEVENSHTEIN edit distance with sorted-key blocking —
    * the character-level detector next to the token-level ones (minhash,
    * simhash, n-gram Jaccard): it catches small in-place edits (typo fixes,
    * token substitutions) that token-set detectors under-weight, and its
    * absolute-edit threshold is what content-moderation and plagiarism
    * pipelines specify. Candidates are blocked on (16-char normalized
    * prefix, length//32): two docs within 8 edits of each other that DON'T
    * share the prefix block are possible (an edit in the first 16 chars) —
    * the standard recall trade of prefix blocking, bounded by running the
    * same operator on a second key (suffix or mid-window) exactly like the
    * multi-band LSH family does. O(len²) DP runs only inside blocks (max
    * block 4 here, guarded at [[MaxEditBlock]]); normalized text shuffles
    * once on the block key — at 100 TB the same plan holds because block
    * cardinality grows with the corpus while block SIZE stays boilerplate-
    * bounded.
    */
  def editDistancePairs(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
      .select(col("doc_id"),
        regexp_replace(trim(lower(col("text"))), "\\s+", " ").as("t"))
      .select(col("doc_id"), col("t"),
        substring(col("t"), 1, EditBlockPrefix).as("pfx"),
        floor(length(col("t")).cast("double") / EditLenBucket).cast("long").as("lb"))
    val bcnt = d.groupBy("pfx", "lb").agg(count(lit(1)).as("bsz"))
      .filter(col("bsz") <= MaxEditBlock)
    val blocked = d.join(bcnt.select("pfx", "lb"), Seq("pfx", "lb"))
    blocked.select(col("pfx"), col("lb"), col("doc_id").as("doc_a"), col("t").as("ta"))
      .join(blocked.select(col("pfx"), col("lb"), col("doc_id").as("doc_b"), col("t").as("tb")),
        Seq("pfx", "lb"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("edit_dist", levenshtein(col("ta"), col("tb")).cast("long"))
      .filter(col("edit_dist") <= EditMaxDist)
      .select(col("doc_a"), col("doc_b"), col("edit_dist"),
        r6(lit(1.0) - col("edit_dist").cast("double") /
          greatest(length(col("ta")), length(col("tb"))).cast("double")).as("similarity"))
  }

  def editDistancePairsOracle: String =
    s"""WITH d AS (
       |  SELECT doc_id, regexp_replace(trim(lower(text)), '\\s+', ' ', 'g') AS t
       |  FROM documents
       |), k AS (
       |  SELECT doc_id, t, substr(t, 1, $EditBlockPrefix) AS pfx, len(t)//$EditLenBucket AS lb FROM d
       |), bcnt AS (
       |  SELECT pfx, lb FROM k GROUP BY 1, 2 HAVING count(*) <= $MaxEditBlock
       |), blocked AS (
       |  SELECT k.* FROM k JOIN bcnt USING (pfx, lb)
       |)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |       CAST(levenshtein(a.t, b.t) AS BIGINT) AS edit_dist,
       |       ${sqlR6("1.0 - CAST(levenshtein(a.t, b.t) AS DOUBLE)/CAST(greatest(len(a.t), len(b.t)) AS DOUBLE)")} AS similarity
       |FROM blocked a JOIN blocked b ON a.pfx = b.pfx AND a.lb = b.lb AND a.doc_id < b.doc_id
       |WHERE levenshtein(a.t, b.t) <= $EditMaxDist
       |ORDER BY doc_a, doc_b""".stripMargin

  /** Per-doc n-gram novelty — the "how much of this document is NEW" curve a
    * curriculum or crawl-dedup pipeline reads in ingestion order: of a doc's
    * distinct 3-gram shingles, the fraction whose FIRST corpus occurrence
    * (min doc_id over the digest) is this doc. High-novelty docs carry fresh
    * content; near-zero novelty marks recombinations of already-seen text
    * that an aggressive dedup policy would drop even when no single pairwise
    * detector fires. Rides the canonical shingle-digest table; only 8-byte
    * digests shuffle (once for first-occurrence, once for the join-back).
    */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val sh = docShingles(spark, dir)
    val first = sh.groupBy("base").agg(min(col("doc_id")).as("first_doc"))
    sh.join(first, "base")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("first_doc") === col("doc_id"), 1L).otherwise(0L)).as("n_novel"))
      .select(col("doc_id"), col("n_shingles"), col("n_novel"),
        r6(col("n_novel").cast("double") / col("n_shingles").cast("double")).as("novelty"))
  }

  def ngramNoveltyOracle: String =
    s"""WITH $docShinglesSql,
       |firstdoc AS (SELECT base, min(doc_id) AS first_doc FROM shingles GROUP BY 1)
       |SELECT s.doc_id, count(*) AS n_shingles,
       |       CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS BIGINT) AS n_novel,
       |       ${sqlR6("CAST(sum(CASE WHEN f.first_doc = s.doc_id THEN 1 ELSE 0 END) AS DOUBLE)/CAST(count(*) AS DOUBLE)")} AS novelty
       |FROM shingles s JOIN firstdoc f USING (base)
       |GROUP BY 1 ORDER BY s.doc_id""".stripMargin

  /** Dedup policy what-if sweep — the decision table an operator reads before
    * picking the production Jaccard threshold: for each candidate threshold
    * 0.1..0.9, how many docs the pairwise-greedy rule (drop the larger id of
    * every qualifying pair — `docs_curated`'s demotion) would remove, and
    * the retained fraction. One pass over the (tiny) verified-pair table
    * crossed with the 9-row threshold spine; the corpus is touched only for
    * its count.
    */
  def policySweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = minhashPairs(spark, dir).select("doc_b", "jaccard")
    val nDocs = Tables.documents(spark, dir).agg(count(lit(1)).as("n_docs"))
    val thr = Tables.documents(spark, dir).sparkSession
      .range(1, 10).select((col("id").cast("double") / 10.0).as("t"))
    pairs.crossJoin(broadcast(thr))
      .filter(col("jaccard") >= col("t"))
      .groupBy("t").agg(countDistinct(col("doc_b")).as("n_dropped"))
      .join(broadcast(thr), Seq("t"), "right")
      .crossJoin(broadcast(nDocs))
      .select(r6(col("t")).as("threshold"),
        coalesce(col("n_dropped"), lit(0L)).as("n_dropped"), col("n_docs"),
        r6((col("n_docs") - coalesce(col("n_dropped"), lit(0L))).cast("double") /
          col("n_docs").cast("double")).as("retained_frac"))
  }

  def policySweepOracle: String =
    minhashPairsSqlChain +
      s""", thr AS (SELECT CAST(i AS DOUBLE)/10.0 AS t FROM range(1, 10) r(i)),
         |nd AS (SELECT count(*) AS n_docs FROM documents),
         |drops AS (
         |  SELECT t.t, count(DISTINCT j.doc_b) AS n_dropped
         |  FROM jac j JOIN thr t ON j.jaccard >= t.t
         |  GROUP BY 1
         |)
         |SELECT ${sqlR6("t.t")} AS threshold,
         |       coalesce(d.n_dropped, 0) AS n_dropped, nd.n_docs,
         |       ${sqlR6("CAST(nd.n_docs - coalesce(d.n_dropped, 0) AS DOUBLE)/CAST(nd.n_docs AS DOUBLE)")} AS retained_frac
         |FROM thr t LEFT JOIN drops d ON d.t = t.t, nd
         |ORDER BY threshold""".stripMargin

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "dedup_policy_sweep" -> ((s, d) => policySweep(s, d).orderBy("threshold")),
    "docs_ngram_novelty" -> ((s, d) => ngramNovelty(s, d).orderBy("doc_id")),
    "dedup_edit_distance" -> ((s, d) => editDistancePairs(s, d).orderBy("doc_a", "doc_b")),
    "dedup_cluster_sizes" -> ((s, d) => clusterSizeHist(s, d).orderBy("cluster_size")),
    "dedup_exact" -> ((s, d) => exact(s, d).orderBy("doc_id")),
    "dedup_canonical" -> ((s, d) => canonical(s, d).orderBy("doc_id")),
    "dedup_minhash_sig" -> ((s, d) => minhashBands(s, d).orderBy("doc_id", "band")),
    "dedup_minhash_pairs" -> ((s, d) => minhashPairs(s, d).orderBy("doc_a", "doc_b")),
    "dedup_ngram_jaccard" -> ((s, d) => ngramJaccardPairs(s, d).orderBy("doc_a", "doc_b")),
    "dedup_containment" -> ((s, d) => containmentPairs(s, d).orderBy("doc_a", "doc_b")),
    "dedup_incremental" -> ((s, d) => incrementalPairs(s, d).orderBy("doc_a", "doc_b")),
    "dedup_minhash_quality" -> ((s, d) => minhashQuality(s, d)),
    "dedup_lsh_scurve" -> ((s, d) => lshScurve(s, d).orderBy("bin")),
    "dedup_detector_overlap" -> ((s, d) => detectorOverlap(s, d).orderBy("in_ngram", "in_minhash", "in_simhash")),
    "dedup_simhash" -> ((s, d) => simhash(s, d).orderBy("doc_id")),
    "dedup_simhash_pairs" -> ((s, d) => simhashPairStats(s, d).orderBy("hamming")),
    "dedup_clusters" -> ((s, d) => duplicateClusters(s, d).orderBy("doc_id")),
    "dedup_embedding_nn" -> ((s, d) => embeddingNearDup(s, d).orderBy("qid"))
  )

  def oracles: Map[String, String] = Map(
    "dedup_policy_sweep" -> policySweepOracle,
    "docs_ngram_novelty" -> ngramNoveltyOracle,
    "dedup_edit_distance" -> editDistancePairsOracle,
    "dedup_exact" ->
      """SELECT doc_id,
        |       min(doc_id) OVER (PARTITION BY md5(text)) AS canonical_id,
        |       count(*) OVER (PARTITION BY md5(text)) AS group_size,
        |       doc_id <> min(doc_id) OVER (PARTITION BY md5(text)) AS is_dup
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_minhash_sig" -> (minhashBandsSql + " SELECT doc_id, band, band_key FROM bands ORDER BY doc_id, band"),
    "dedup_minhash_pairs" -> (minhashPairsSqlChain +
      " SELECT doc_a, doc_b, jaccard FROM jac ORDER BY doc_a, doc_b"),
    "dedup_minhash_quality" -> minhashQualityOracle,
    "dedup_lsh_scurve" -> lshScurveOracle,
    "dedup_detector_overlap" -> detectorOverlapOracle,
    "dedup_incremental" -> (minhashBandsSql +
      s""", bcnt AS (
         |  SELECT band, band_key, count(*) AS bsz FROM bands
         |  WHERE doc_id % $NewBatchMod <> ${NewBatchMod - 1} GROUP BY 1, 2
         |), cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM bands a
         |  JOIN bands b ON b.band = a.band AND b.band_key = a.band_key
         |  JOIN bcnt g ON g.band = b.band AND g.band_key = b.band_key
         |  WHERE a.doc_id % $NewBatchMod = ${NewBatchMod - 1}
         |    AND b.doc_id % $NewBatchMod <> ${NewBatchMod - 1}
         |    AND g.bsz <= $MaxBandBucket
         |  GROUP BY 1, 2
         |)""".stripMargin + jaccardSql("cand") +
      " SELECT doc_a, doc_b, jaccard FROM jac ORDER BY doc_a, doc_b"),
    "dedup_ngram_jaccard" ->
      s"""WITH $docShinglesSql,
         |rare AS (
         |  SELECT base FROM shingles GROUP BY base
         |  HAVING count(*) <= $MaxShingleDf AND count(*) >= 2
         |), blocked AS (
         |  SELECT s.doc_id, s.base FROM shingles s JOIN rare r ON s.base = r.base
         |), cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM blocked a JOIN blocked b ON a.base = b.base AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSharedRare
         |)${jaccardSql("cand")}
         | SELECT doc_a, doc_b, jaccard FROM jac
         | WHERE jaccard >= ${sqlD(JaccardThreshold)}
         | ORDER BY doc_a, doc_b""".stripMargin,
    "dedup_containment" ->
      s"""WITH $docShinglesSql,
         |rare AS (
         |  SELECT base FROM shingles GROUP BY base
         |  HAVING count(*) <= $MaxShingleDf AND count(*) >= 2
         |), blocked AS (
         |  SELECT s.doc_id, s.base FROM shingles s JOIN rare r ON s.base = r.base
         |), cand AS (
         |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
         |  FROM blocked a JOIN blocked b ON a.base = b.base AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2 HAVING count(*) >= $MinSharedRare
         |)${jaccardSql("cand")}
         | SELECT s.doc_a, s.doc_b, na.n_sh AS n_a, nb.n_sh AS n_b, s.n_shared,
         |        ${sqlR6("CAST(s.n_shared AS DOUBLE) / least(na.n_sh, nb.n_sh)")} AS containment,
         |        ${sqlR6("CAST(s.n_shared AS DOUBLE) / CAST(na.n_sh + nb.n_sh - s.n_shared AS DOUBLE)")} AS jaccard
         | FROM shared s
         | JOIN sizes na ON na.doc_id = s.doc_a
         | JOIN sizes nb ON nb.doc_id = s.doc_b
         | WHERE ${sqlR6("CAST(s.n_shared AS DOUBLE) / least(na.n_sh, nb.n_sh)")} >= ${sqlD(ContainmentThreshold)}
         | ORDER BY doc_a, doc_b""".stripMargin,
    // transitive closure via a recursive CTE: reach(id, r) holds every
    // (member, reachable-node) pair of the undirected edge graph; min(r) per
    // member is the component's canonical id — the same fixpoint the Spark
    // label propagation converges to
    "dedup_cluster_sizes" -> (minhashPairsSqlChain.replaceFirst("WITH ", "WITH RECURSIVE ") +
      clusterCtesSql +
      s"""
         |SELECT cluster_size, count(*) AS n_clusters
         |FROM (SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1)
         |GROUP BY 1 ORDER BY cluster_size""".stripMargin),
    "dedup_clusters" -> (minhashPairsSqlChain.replaceFirst("WITH ", "WITH RECURSIVE ") +
      clusterCtesSql +
      s"""
         |SELECT c.doc_id, c.cluster_id, cnt.cluster_size
         |FROM clusters c
         |JOIN (SELECT cluster_id, count(*) AS cluster_size FROM clusters GROUP BY 1) cnt
         |  USING (cluster_id)
         |ORDER BY doc_id""".stripMargin),
    "dedup_canonical" -> (minhashPairsSqlChain.replaceFirst("WITH ", "WITH RECURSIVE ") +
      clusterCtesSql +
      s"""
         |SELECT d.doc_id,
         |       coalesce(c.cluster_id, d.doc_id) AS keeper_id,
         |       coalesce(c.cluster_id, d.doc_id) = d.doc_id AS is_kept
         |FROM documents d LEFT JOIN clusters c USING (doc_id)
         |ORDER BY d.doc_id""".stripMargin),
    "dedup_simhash" -> (simhashSqlChain +
      " SELECT doc_id, simhash FROM fp ORDER BY doc_id"),
    "dedup_simhash_pairs" -> (simhashSqlChain +
      s""", blocks0 AS (
         |  SELECT doc_id, simhash, b.i AS blk,
         |         (simhash >> (CAST(b.i AS INT) * $SimBlockBits)) % $SimBlockMod AS bv
         |  FROM fp CROSS JOIN range(0, ${HammingMax + 1}) b(i)
         |), blocks AS (
         |  SELECT doc_id, simhash, blk, bv FROM (
         |    SELECT *, count(*) OVER (PARTITION BY blk, bv) AS bsz FROM blocks0)
         |  WHERE bsz <= $MaxSimBucket
         |), cand AS (
         |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |         a.simhash AS sh_a, b.simhash AS sh_b
         |  FROM blocks a JOIN blocks b
         |    ON a.blk = b.blk AND a.bv = b.bv AND a.doc_id < b.doc_id
         |)
         |SELECT CAST(bit_count(xor(sh_a, sh_b)) AS INT) AS hamming, count(*) AS n_pairs
         |FROM cand WHERE bit_count(xor(sh_a, sh_b)) <= $HammingMax
         |GROUP BY 1 ORDER BY hamming""".stripMargin),
    "dedup_embedding_nn" ->
      s"""WITH emb AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings
         |), flat AS (
         |  SELECT vec_id, label, unnest(v) AS x, generate_subscripts(v, 1) AS d FROM emb
         |), norms AS (
         |  SELECT vec_id, sqrt(sum(x * x)) AS nrm FROM flat GROUP BY vec_id
         |), dots AS (
         |  SELECT a.vec_id AS qid, b.vec_id AS vid, a.label, sum(a.x * b.x) AS dot
         |  FROM flat a JOIN flat b ON a.d = b.d AND a.label = b.label
         |  WHERE a.vec_id < 200 AND a.vec_id <> b.vec_id
         |  GROUP BY 1, 2, 3
         |), cosv AS (
         |  SELECT d.qid, d.vid, ${sqlR6("d.dot / (na.nrm * nb.nrm)")} AS cos
         |  FROM dots d JOIN norms na ON na.vec_id = d.qid JOIN norms nb ON nb.vec_id = d.vid
         |)
         |SELECT qid, vid AS nn_id, cos, cos >= 0.9e0 AS near_dup
         |FROM (SELECT *, row_number() OVER (PARTITION BY qid ORDER BY cos DESC, vid ASC) AS rn FROM cosv)
         |WHERE rn = 1 ORDER BY qid""".stripMargin
  )
}
