package graft.streaming

import java.util.concurrent.atomic.AtomicBoolean

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.ext.SimilarityQueries

/** q52y's TIERED generational store mechanics (r14):
  * [[SimilarityQueries.maintainPqStore]] must be idempotent and loss-free
  * in EVERY crash window (the scaladoc's two-places-or-one invariant) —
  * including the level-merge windows the r13 whole-store fold didn't
  * have — and [[SimilarityQueries.readPqStore]] must return the exact
  * row multiset in each of those windows. The registered query's oracle
  * proves maintained-ingest ≡ batch build; this pins the windows the
  * oracle can't reach (a clean drain never leaves a torn generation
  * behind) plus the whole-batch-replay composition. ScaleBench gates the
  * amortization claim (per-cycle L0 fold bytes track cycle input).
  */
class StoreMaintainSpec extends SparkSpec {

  private def freshStore(tag: String): String = {
    val dir = s"${graft.Tmp.root}/storemaint-$tag"
    FileUtils.deleteQuietly(new java.io.File(dir))
    dir
  }

  /** Six synthetic fragment dirs, 10 rows each: (vec_id, s, code). */
  private def writeFrags(store: String): Unit = {
    import spark.implicits._
    (0 to 5).foreach { id =>
      (0 until 10).map(i => (id * 10L + i, i % 8, i % 16))
        .toDF("vec_id", "s", "code")
        .coalesce(1).write.mode("overwrite").parquet(s"$store/frag/batch=$id")
    }
  }

  private def rowSet(df: DataFrame): Set[String] =
    df.collect().map(_.toString).toSet

  private def allRows: Set[String] =
    (0 to 5).flatMap(id => (0 until 10).map(i =>
      s"[${id * 10 + i},${i % 8},${i % 16}]")).toSet

  private def exists(p: String): Boolean = new java.io.File(p).exists()

  test("maintain folds ONLY the cycle's frags into L0; expiry runs one cycle late") {
    val store = freshStore("clean")
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L)
    // first cycle: L0 gen over [0,3]; consumed frags RETAINED (read
    // grace — there is no previous cycle whose inputs could expire yet)
    assert(exists(s"$store/gen=0-3-L0-u3/_SUCCESS"))
    val fragIds = Option(new java.io.File(s"$store/frag").listFiles())
      .getOrElse(Array.empty).map(_.getName).sorted.toSeq
    assert(fragIds == (0 to 5).map(i => s"batch=$i"), fragIds)
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
    // second cycle folds ONLY frags 4..5 — the tiered contract: the L0
    // fold never re-reads the standing store (gen=0-3 is not an input)
    val stats = SimilarityQueries.maintainPqStore(spark, store, upTo = 5L)
    assert(exists(s"$store/gen=4-5-L0-u5/_SUCCESS"))
    assert(exists(s"$store/gen=0-3-L0-u3"), "standing gen must be untouched")
    assert(stats.mergesFired == 0)
    val after = Option(new java.io.File(s"$store/frag").listFiles())
      .getOrElse(Array.empty).map(_.getName).sorted.toSeq
    assert(after == Seq("batch=4", "batch=5"), after)
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
  }

  test("level merge: fanout PRE-CYCLE L0 gens fold into L1; inputs keep one-cycle grace") {
    val store = freshStore("tiered")
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 1L, fanout = 2)
    val s2 = SimilarityQueries.maintainPqStore(spark, store, upTo = 3L, fanout = 2)
    // the cycle that WRITES the fanout-th L0 does not merge it: this
    // cycle's own fold is not merge-eligible (merging it would let a
    // crashed attempt's completed merge shadow the replay's rebuild —
    // see the maintainPqStore cascade comment and the bake test below)
    assert(exists(s"$store/gen=2-3-L0-u3/_SUCCESS"))
    assert(s2.mergesFired == 0)
    assert(!exists(s"$store/gen=0-3-L1-u3"))
    // next cycle: both L0s are pre-cycle committed products → merge fires
    val s3 = SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 2)
    assert(s3.mergesFired == 1)
    assert(exists(s"$store/gen=0-3-L1-u5/_SUCCESS"))
    // merge INPUTS are grace-retained this cycle; containment shadows
    // them, so the reader takes L1 ∪ L0[4,5] ∪ newer frags — never a
    // double count
    assert(exists(s"$store/gen=0-1-L0-u1"))
    assert(exists(s"$store/gen=2-3-L0-u3"))
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
    // the NEXT cycle (upTo advances — a same-upTo replay deliberately
    // preserves grace under the stamped basis, see the replay-grace test)
    // finishes the owed expiry of the superseded L0 gens — one cycle late
    SimilarityQueries.maintainPqStore(spark, store, upTo = 6L, fanout = 2)
    assert(!exists(s"$store/gen=0-1-L0-u1"), "superseded L0 gen outlived its grace")
    assert(!exists(s"$store/gen=2-3-L0-u3"))
    assert(exists(s"$store/gen=0-3-L1-u5"))
    assert(exists(s"$store/gen=4-5-L0-u5/_SUCCESS"))
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
  }

  test("crash window: same-cycle merge cannot bake a crashed attempt's partial fold") {
    // r14 review finding: with oldest-fanout-INCLUDING-current merging,
    // the cycle that brings a level to fanout merges its own just-written
    // L0 — and a crash between that merge's _SUCCESS and the offset
    // commit shadows the replay's corrected L0 rebuild under the
    // completed merge forever (silent permanent row loss in the declared
    // whole-batch-replay model). Pre-cycle-only merging closes the
    // window: every merge input is a committed earlier cycle's product.
    val store = freshStore("bake")
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 1L, fanout = 3)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L, fanout = 3)
    // crashed attempt of cycle 3: fragment batch=5 landed PARTIALLY (half
    // its rows), the attempt folded it into a COMPLETE L0[4,5], and died
    // before the offset commit. This is exactly the cycle that reaches
    // fanout=3 at level 0 — the old rule would also have merged [0,5]
    // here, baking the partial fold.
    import spark.implicits._
    (0 until 5).map(i => (50L + i, i % 8, i % 16)).toDF("vec_id", "s", "code")
      .coalesce(1).write.mode("overwrite").parquet(s"$store/frag/batch=5")
    val crashed = SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 3)
    assert(exists(s"$store/gen=4-5-L0-u5/_SUCCESS"))
    assert(crashed.mergesFired == 0,
      "this cycle's own fold must not be merge-eligible")
    assert(!exists(s"$store/gen=0-5-L1-u5"))
    // whole-batch replay: the fragment is rewritten whole and maintenance
    // re-runs — the rebuild lands unshadowed and the store serves complete
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 3)
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
    // the deferred merge fires on the next committed cycle, from fully
    // committed inputs — amortization is kept, just one cycle later
    (0 until 10).map(i => (60L + i, i % 8, i % 16)).toDF("vec_id", "s", "code")
      .coalesce(1).write.mode("overwrite").parquet(s"$store/frag/batch=6")
    val next = SimilarityQueries.maintainPqStore(spark, store, upTo = 6L, fanout = 3)
    assert(next.mergesFired == 1)
    assert(exists(s"$store/gen=0-5-L1-u6/_SUCCESS"))
    val batch6 = (0 until 10).map(i => s"[${60 + i},${i % 8},${i % 16}]").toSet
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows ++ batch6)
  }

  test("replay after a crashed merge keeps the pre-cycle reader's grace (stamped basis)") {
    // r14 review finding: the expiry basis used to exclude only gens with
    // hi == upTo, but a level MERGE ends strictly below upTo (it consumes
    // pre-cycle gens) — so on a whole-batch replay the crashed attempt's
    // completed merge slipped into the basis and its grace-retained
    // inputs were expired ONE CYCLE EARLY, failing a reader that planned
    // before the cycle (inside the promised one-cycle grace). The cycle
    // stamp in the gen name (-u<cycle>) reconstructs the original entry.
    val store = freshStore("replaygrace")
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 1L, fanout = 2)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L, fanout = 2)
    // reader plans against the post-cycle-3 listing: L0[0,1] ∪ L0[2,3] ∪
    // frags 4,5
    val planned = SimilarityQueries.readPqStore(spark, store)
    // cycle 5 fires the (pre-cycle) merge, then "crashes" before its
    // offset commit; the whole batch replays and maintenance re-runs
    SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 2)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 2)
    // the replay must NOT treat the crashed attempt's merge as a
    // prior-cycle gen: its inputs keep their one-cycle grace and the
    // pre-cycle plan still reads complete
    assert(rowSet(planned) == allRows,
      "replay expired the crashed cycle's merge inputs one cycle early")
    assert(exists(s"$store/gen=0-1-L0-u1") && exists(s"$store/gen=2-3-L0-u3"),
      "merge inputs must survive the replayed cycle")
  }

  test("crash window: complete generation from a PARTIAL fragment is rebuilt on replay") {
    val store = freshStore("postgen")
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 1L)
    // crashed attempt of cycle 2: its fragment landed PARTIALLY (batch=3
    // holds half its rows), maintenance folded that partial content into
    // a COMPLETE gen over [2,3], then the function died before the
    // offset commit
    import spark.implicits._
    (0 until 5).map(i => (30L + i, i % 8, i % 16))
      .toDF("vec_id", "s", "code")
      .coalesce(1).write.mode("overwrite").parquet(s"$store/frag/batch=3")
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L)
    // the replay rewrites the fragment WHOLE and re-runs maintenance: the
    // rebuild must fold the full content — trusting the crashed attempt's
    // gen would lose batch 3's other half forever
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L)
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows,
      "replayed maintenance must fold the replayed fragment's full content")
    // and the expiry owed by the crashed attempt is finished: frags ≤
    // gen [0,1] gone, this cycle's own inputs keep their read grace —
    // even though the crashed attempt already published gen=2-3's
    // _SUCCESS (the expiry basis excludes gens ending at upTo)
    assert(!exists(s"$store/frag/batch=0"))
    assert(exists(s"$store/frag/batch=2"),
      "this cycle's consumed inputs must keep their read grace")
  }

  test("read grace: a plan survives one maintenance cycle, not two (tiers included)") {
    val store = freshStore("grace")
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 1L, fanout = 2)
    // planned against the post-cycle-1 listing: L0[0,1] ∪ frags 2..5
    val planned = SimilarityQueries.readPqStore(spark, store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L, fanout = 2)
    // one cycle later every listed path is still on disk — the L1 merge
    // fired, but its L0 inputs are grace-retained and frags ≤ 1 were the
    // only expiry
    assert(rowSet(planned) == allRows,
      "a plan must stay valid across one maintenance cycle")
    val planned2 = SimilarityQueries.readPqStore(spark, store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 2)
    assert(rowSet(planned2) == allRows,
      "a plan planned between cycles must survive the next one")
    // two cycles later L0[0,1] and frags 2,3 are expired: the stale plan
    // fails LOUDLY — never a silent partial row set
    intercept[Exception] { planned.collect() }
  }

  test("crash window: torn L0 generation without _SUCCESS is invisible and rebuilt") {
    val store = freshStore("torn")
    writeFrags(store)
    // a torn L0 gen: parquet-ish junk, no _SUCCESS
    val torn = new java.io.File(s"$store/gen=0-3-L0-u3")
    torn.mkdirs()
    java.nio.file.Files.write(torn.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    // readers ignore it entirely
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
    // the replay rebuilds it from the intact inputs
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L)
    assert(exists(s"$store/gen=0-3-L0-u3/_SUCCESS"))
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
  }

  test("crash window: torn LEVEL MERGE is invisible and re-fires while inputs are live") {
    val store = freshStore("tornmerge")
    writeFrags(store)
    // two complete L0 gens, no merge yet (fanout high enough)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 1L, fanout = 9)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L, fanout = 9)
    // a crashed merge attempt left a torn L1 dir
    val torn = new java.io.File(s"$store/gen=0-3-L1-u5")
    torn.mkdirs()
    java.nio.file.Files.write(torn.toPath.resolve("part-00000.parquet"),
      Array[Byte](1, 2, 3))
    // readers ignore it: live = the two L0 gens ∪ frags 4..5
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
    // the next cycle re-fires the merge (its L0 inputs are still live)
    // and the overwrite replaces the torn files
    val stats = SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 2)
    assert(stats.mergesFired >= 1)
    assert(exists(s"$store/gen=0-3-L1-u5/_SUCCESS"))
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
  }

  test("replay after a complete merge does NOT re-merge (idempotent sweep)") {
    val store = freshStore("remerge")
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 1L, fanout = 2)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L, fanout = 2)
    // cycle 3 fires the (pre-cycle) L1 merge of L0[0,1] ∪ L0[2,3]
    val s3 = SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 2)
    assert(s3.mergesFired == 1)
    // whole-batch replay of cycle 3: the L0 fold rebuilds, but the L1
    // merge's inputs are now superseded — the sweep must not fire again
    val replay = SimilarityQueries.maintainPqStore(spark, store, upTo = 5L, fanout = 2)
    assert(replay.mergesFired == 0,
      "replay re-merged an already-complete level merge")
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
  }

  test("store layer speaks Hadoop FileSystem: file: URIs work end to end") {
    // VERDICT r13 #4 — every list/probe/delete routes through the
    // path's FileSystem, so a URI-addressed store (the HDFS/S3 shape)
    // maintains and serves identically to a bare local path
    val raw = freshStore("uri")
    val store = s"file:$raw"
    writeFrags(store)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 3L)
    assert(exists(s"$raw/gen=0-3-L0-u3/_SUCCESS"))
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
    SimilarityQueries.maintainPqStore(spark, store, upTo = 5L)
    assert(!exists(s"$raw/frag/batch=0"), "expiry must run through the FS too")
    assert(rowSet(SimilarityQueries.readPqStore(spark, store)) == allRows)
  }

  test("stream composition: crash after in-loop maintenance, whole-batch replay") {
    val base = s"${graft.Tmp.root}/storemaint-stream"
    FileUtils.deleteQuietly(new java.io.File(base))
    val store = s"$base/store"
    val cp = s"$base/cp"
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val corpus = graft.Tables.embeddings(spark, sf)
      .select(col("vec_id"), col("embedding"), col("label"))
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1), r.getInt(2)))
      .toSeq
    val cb = SimilarityQueries
      .pqBuildFrom(SimilarityQueries.quantFrame(spark, sf))._3.localCheckpoint()
    val ms = MemoryStream[(Long, Seq[Float], Int)]
    val injected = new AtomicBoolean(false)
    def writer(b: org.apache.spark.sql.Dataset[(Long, Seq[Float], Int)],
        id: Long): Unit = {
      val batch = b.toDF("vec_id", "embedding", "label")
      graft.ops.StreamQueries.annMaintainBatchWriter(cb, store, 2)(batch, id)
      if (id == 3L && !injected.getAndSet(true))
        throw new RuntimeException(
          "injected crash after in-loop maintenance, before offset commit")
    }
    def start() = ms.toDS().writeStream
      .option("checkpointLocation", cp).foreachBatch(writer _).start()
    val groups = corpus.grouped(math.max(1, corpus.length / 6 + 1)).toSeq
    val q1 = start()
    groups.zipWithIndex.foreach { case (g, i) =>
      ms.addData(g)
      if (i < 3) q1.processAllAvailable()
    }
    intercept[Exception] { q1.processAllAvailable(); q1.awaitTermination() }
    assert(!q1.isActive, "query must have died on the injected crash")
    assert(exists(s"$store/gen=2-3-L0-u3/_SUCCESS"),
      "maintenance ran before the injected crash")
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val got = SimilarityQueries.readPqStore(spark, store)
      .select("vec_id", "s", "code")
    val want = SimilarityQueries.pqEncode(
        SimilarityQueries.quantFrame(spark, sf), cb)
      .select(col("vec_id"), col("s"), col("code"))
    assert(rowSet(got) == rowSet(want),
      "replayed maintenance must land exactly on the batch-computed codes")
    assert(injected.get(), "the crash injection never fired")
  }
}
