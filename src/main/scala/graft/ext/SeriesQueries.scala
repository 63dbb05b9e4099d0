package graft.ext

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** X11 (r15): time-series similarity search over per-user event series —
  * the classic OLAP/monitoring workload (retrieved papers: "Time Series
  * Similarity Search for Streaming Data in Distributed Systems" EDBT 2019;
  * REPOSE ICDE 2021) re-expressed in the engine's shortlist-then-rerank
  * idiom: z-normalized Euclidean top-k with a PAA (piecewise aggregate
  * approximation, Keogh et al. 2001) LOWER-BOUND shortlist.
  *
  * Why this shape at 100 TB: the full series table is wide (here 32
  * points; production telemetry is thousands), but the PAA sketch is 8
  * doubles per series — the compact index the shortlist stage scans, with
  * full series touched only for shortlisted candidates (the x3h/x3s
  * device on the time axis). PAA's segment-mean distance times the
  * segment width PROVABLY lower-bounds the true distance, so a
  * sufficiently deep shortlist plus exact rerank loses nothing it didn't
  * declare (recall is annotated per row, same contract as the ANN
  * family).
  *
  * Float discipline (Registry rules): series values enter as exact
  * integer cents; mean/variance derive from integer power sums (the q27
  * device), z-scores and distances are then the IDENTICAL expression
  * text in both engines with strictly sequential folds (Spark
  * `aggregate` ≡ DuckDB `list_reduce` — both left-to-right, so the
  * doubles are bit-equal, not just close); emitted distances are rounded
  * to e4 per the float rules.
  */
object SeriesQueries {

  private val N = 32          // series length (first N events per user)
  private val Segs = 8        // PAA segments (width N/Segs = 4)
  private val Shortlist = 12  // PAA shortlist depth
  private val K = 3           // exact top-k
  private val NQ = 4          // query series = the NQ smallest user_ids

  /** Per-user z-normalized length-N series + PAA sketch from an events
    * frame (user_id, ts, event_id, value). private[graft]: SeriesKnnSpec
    * plants series the fixture lacks, and PlanSpec asserts the first-N
    * prune on THIS frame's plan (the kNN stage's own row_number windows
    * would make the same assert on the full plan vacuous — r15 review).
    */
  private[graft] def seriesFrame(events: DataFrame): DataFrame = {
    // first-N prune BEFORE the array build: row_number caps every user's
    // contribution at N rows, so no unbounded per-user list is ever
    // materialized (a collect-then-slice would carry the user's whole
    // history through the shuffle — the classic telemetry skew trap)
    val firstN = events.withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))))
      .where(col("rn") <= N)
    val ordered = firstN
      .groupBy(col("user_id"))
      .agg(array_sort(collect_list(struct(col("rn"), col("value")))).as("pts"))
      .where(size(col("pts")) === N)
      .select(col("user_id"),
        transform(col("pts"), p =>
          round(p.getField("value") * 100).cast(LongType)).as("vc"))
    // integer power sums -> exact mean/std inputs; zero-variance series
    // excluded on the INTEGER check (no float boundary)
    val sums = ordered
      .withColumn("s1", aggregate(col("vc"), lit(0L), (a, x) => a + x))
      .withColumn("s2", aggregate(col("vc"), lit(0L), (a, x) => a + x * x))
      .where(col("s2") * N - col("s1") * col("s1") > 0)
    val nD = lit(N.toDouble)
    val std = sqrt((col("s2").cast(DoubleType) -
      col("s1").cast(DoubleType) * col("s1").cast(DoubleType) / nD) / nD)
    val withZ = sums.withColumn("z",
      transform(col("vc"), x =>
        (x.cast(DoubleType) - col("s1").cast(DoubleType) / nD) / std))
    val w = N / Segs
    withZ.select(col("user_id"), col("z"),
      transform(sequence(lit(0), lit(Segs - 1)), j =>
        (0 until w).map(o => element_at(col("z"), j * w + o + 1))
          .reduce(_ + _) / lit(w.toDouble)).as("paa"))
  }

  /** Strictly sequential Σ(a[i]−b[i])² — Spark side of the shared fold. */
  private def d2(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)),
      lit(0.0), (acc, x) => acc + x)

  /** The full shortlist + rerank + recall-annotation plan over a series
    * frame; shared by the registration and the spec.
    */
  private[ext] def seriesKnn(sf: DataFrame): DataFrame = {
    val ranked = sf.withColumn("qrank",
      row_number().over(Window.orderBy(col("user_id"))))
    val q = ranked.where(col("qrank") <= NQ)
      .select(col("user_id").as("q_user"), col("z").as("q_z"), col("paa").as("q_paa"))
    val c = sf.select(col("user_id").as("c_user"), col("z").as("c_z"),
      col("paa").as("c_paa"))
    // PAA lower bound: width · Σ(seg means diff)² ≤ true d² (Keogh 2001).
    // The shortlist stage carries ONLY (ids, dpaa) — the full z vectors
    // join back for shortlisted rows alone (the x3s/x3h device; hauling
    // z through the all-pairs frame and its shortlist shuffle would move
    // ~N/Segs× more bytes than the sketch scan this stage exists to be)
    val scored = c.drop("c_z").join(
        broadcast(q.select(col("q_user"), col("q_paa"))),
        col("q_user") =!= col("c_user"))
      .select(col("q_user"), col("c_user"),
        (d2(col("q_paa"), col("c_paa")) * lit((N / Segs).toDouble)).as("dpaa"))
    val wS = Window.partitionBy(col("q_user"))
      .orderBy(col("dpaa").asc, col("c_user"))
    val short = scored.withColumn("paa_rank", row_number().over(wS))
      .where(col("paa_rank") <= Shortlist)
      .select(col("q_user"), col("c_user"), col("paa_rank"))
      .join(broadcast(q.select(col("q_user"), col("q_z"))), Seq("q_user"))
      .join(sf.select(col("user_id").as("c_user"), col("z").as("c_z")),
        Seq("c_user"))
      .select(col("q_user"), col("c_user"), col("paa_rank"),
        d2(col("q_z"), col("c_z")).as("dist2"))
    val wR = Window.partitionBy(col("q_user"))
      .orderBy(col("dist2").asc, col("c_user"))
    val top = short.withColumn("rank", row_number().over(wR))
      .where(col("rank") <= K)
    // exact top-K over ALL candidates (the recall annotation's truth set)
    val exact = c.select(col("c_user"), col("c_z"))
      .join(broadcast(q.select(col("q_user"), col("q_z"))),
        col("q_user") =!= col("c_user"))
      .select(col("q_user"), col("c_user"), d2(col("q_z"), col("c_z")).as("ed2"))
      .withColumn("erank", row_number().over(
        Window.partitionBy(col("q_user")).orderBy(col("ed2").asc, col("c_user"))))
      .where(col("erank") <= K)
      .select(col("q_user"), col("c_user"), lit(true).as("hit"))
    top.join(broadcast(exact), Seq("q_user", "c_user"), "left")
      .select(col("q_user"), col("rank"), col("c_user"),
        round(col("dist2") * 10000).cast(LongType).as("dist2_e4"),
        col("paa_rank"),
        coalesce(col("hit"), lit(false)).as("in_exact_top3"))
  }

  /** DuckDB CTE producing the identical series frame: list(... ORDER BY)
    * for the deterministic window, integer power sums, the same z/PAA
    * expression text, `list_reduce` for the sequential folds.
    */
  private val SeriesCte: String = s"""WITH pts AS (
      SELECT user_id, (list(CAST(round(value*100) AS BIGINT) ORDER BY ts, event_id))[1:$N] AS vc
      FROM events GROUP BY user_id HAVING count(*) >= $N),
    sums AS (SELECT user_id, vc,
        list_reduce(vc, (a, x) -> a + x) AS s1,
        list_reduce(list_transform(vc, x -> x * x), (a, x) -> a + x) AS s2
      FROM pts),
    zf AS (SELECT user_id,
        list_transform(vc, x -> (CAST(x AS DOUBLE) - CAST(s1 AS DOUBLE) / $N.0) /
          sqrt((CAST(s2 AS DOUBLE) - CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / $N.0) / $N.0)) AS z
      FROM sums WHERE s2 * $N - s1 * s1 > 0),
    sf AS (SELECT user_id, z,
        list_transform(generate_series(0, ${Segs - 1}), j ->
          (${(0 until N / Segs).map(o => s"z[${N / Segs}*j + ${o + 1}]").mkString(" + ")}) / ${N / Segs}.0) AS paa
      FROM zf)"""

  private def sqlD2(a: String, b: String): String =
    s"list_reduce(list_transform(generate_series(1, len($a)), i -> ($a[i] - $b[i]) * ($a[i] - $b[i])), (acc, x) -> acc + x)"

  private val KnnOracle: String = s"""$SeriesCte,
    q AS (SELECT user_id AS q_user, z AS q_z, paa AS q_paa FROM
      (SELECT *, row_number() OVER (ORDER BY user_id) AS qrank FROM sf) WHERE qrank <= $NQ),
    scored AS (SELECT q_user, c.user_id AS c_user, q_z, c.z AS c_z,
        ${sqlD2("q_paa", "c.paa")} * ${N / Segs}.0 AS dpaa
      FROM q JOIN sf c ON c.user_id <> q.q_user),
    short AS (SELECT q_user, c_user, paa_rank, ${sqlD2("q_z", "c_z")} AS dist2 FROM
      (SELECT *, row_number() OVER (PARTITION BY q_user ORDER BY dpaa ASC, c_user) AS paa_rank
       FROM scored) WHERE paa_rank <= $Shortlist),
    top AS (SELECT * FROM
      (SELECT *, row_number() OVER (PARTITION BY q_user ORDER BY dist2 ASC, c_user) AS rank
       FROM short) WHERE rank <= $K),
    ex AS (SELECT q_user, c_user, true AS hit FROM
      (SELECT q_user, c.user_id AS c_user,
         row_number() OVER (PARTITION BY q_user ORDER BY ${sqlD2("q_z", "c.z")} ASC, c.user_id) AS erank
       FROM q JOIN sf c ON c.user_id <> q.q_user) WHERE erank <= $K)
    SELECT top.q_user, CAST(top.rank AS INTEGER) AS rank, top.c_user,
      CAST(round(top.dist2 * 10000) AS BIGINT) AS dist2_e4,
      CAST(top.paa_rank AS INTEGER) AS paa_rank,
      coalesce(ex.hit, false) AS in_exact_top3
    FROM top LEFT JOIN ex ON top.q_user = ex.q_user AND top.c_user = ex.c_user"""

  def defs: Seq[Q] = Seq(
    Q("x11_series_knn",
      (s, d) => seriesKnn(seriesFrame(Tables.events(s, d))),
      Some(KnnOracle))
  )
}
