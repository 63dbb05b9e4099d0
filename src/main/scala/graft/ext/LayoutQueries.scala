package graft.ext

import org.apache.spark.sql.functions._

import graft.{Q, Tables}
import graft.functions.Kernels

/** Data-layout operators: multi-dimensional clustering for scan pruning.
  *
  * At 100 TB the cheapest query is the one that never reads the file: a
  * parquet scan prunes on per-file min/max statistics, so the LAYOUT of
  * rows across files decides how selective those statistics are. Sorting
  * by one column gives perfect pruning on that column and none on any
  * other; interleaving the bits of several columns (a Morton / Z-order
  * space-filling curve — the trick behind Delta's OPTIMIZE ZORDER and
  * Hudi's curve clustering) bounds EVERY interleaved dimension in every
  * file, at the price of each bound being coarser.
  *
  * The reference has no layout story at all (it appends flows to
  * ClickHouse in arrival order, `main.go:157-169`); this is the piece a
  * Spark-native rewrite adds so that `src_addr`-and-`dst_addr` (or
  * partkey-and-suppkey) predicates both prune.
  */
object LayoutQueries {

  def defs: Seq[Q] = Seq(
    // X9: Z-order layout audit — normalize two join/filter dimensions to a
    // 256-cell grid (value-proportional, an exact integer DIV — the
    // rank-based alternative, range_partition_id per column, needs a
    // sampled sort boundary per column and cannot be byte-reproduced by an
    // oracle), interleave them with the codegen `interleave_bits` kernel,
    // and group rows into 16 "files" two ways: top-4-bits of the z-value
    // (zorder layout) vs top-4-bits of the partkey grid cell alone (linear
    // layout, i.e. a single-column sort). Per-file min/max of BOTH columns
    // is exactly what a parquet footer would carry — the output shows the
    // linear layout leaves s_min..s_max at full range in every file (a
    // suppkey predicate reads all 16 files) while zorder bounds both
    // (partkey span 4× coarser, suppkey span 4× tighter ⇒ a predicate on
    // EITHER column skips 3/4 of the files).
    //
    // 100 TB posture: one 1-row agg broadcast back (the normalization
    // bounds), then a pure map (DIV + interleave, whole-stage codegen) and
    // one small aggregation — NO global sort in the registered query. The
    // production rewrite pipeline is `repartitionByRange(zv)` +
    // `sortWithinPartitions(zv)` + parquet write: a sampling-based range
    // exchange whose boundaries aren't deterministic across engines, which
    // is why the audit (not the write) is the oracle-gated query.
    Q("x9_zorder",
      (s, d) => {
        val li = Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey"))
        val st = li.agg((max(col("l_partkey")) + 1L).as("mp"),
          (max(col("l_suppkey")) + 1L).as("ms"))
        val n = li.crossJoin(broadcast(st))
          .withColumn("px", expr("(l_partkey * 256) DIV mp"))
          .withColumn("sx", expr("(l_suppkey * 256) DIV ms"))
        val z = n.withColumn("zv",
          Kernels.interleave_bits(col("px"), col("sx")))
        val fileStats = (g: org.apache.spark.sql.RelationalGroupedDataset) => g
          .agg(count(lit(1)).as("n_rows"),
            min(col("l_partkey")).as("p_min"), max(col("l_partkey")).as("p_max"),
            min(col("l_suppkey")).as("s_min"), max(col("l_suppkey")).as("s_max"))
        fileStats(z.groupBy(shiftright(col("zv"), 12).as("bucket")))
          .withColumn("layout", lit("zorder"))
          .unionByName(
            fileStats(n.groupBy(shiftright(col("px"), 4).as("bucket")))
              .withColumn("layout", lit("linear")))
      },
      Some("""WITH st AS (SELECT max(l_partkey) + 1 AS mp, max(l_suppkey) + 1 AS ms
              FROM lineitem),
        n AS (SELECT l_partkey, l_suppkey,
                (l_partkey * 256) // mp AS px, (l_suppkey * 256) // ms AS sx
              FROM lineitem, st),
        z AS (SELECT *, CAST(list_sum(list_transform(range(0, 8),
                i -> (((px >> i) & 1) << (2 * i)) + (((sx >> i) & 1) << (2 * i + 1))))
                AS BIGINT) AS zv
              FROM n)
        SELECT 'zorder' AS layout, CAST(zv >> 12 AS BIGINT) AS bucket,
          count(*) AS n_rows,
          min(l_partkey) AS p_min, max(l_partkey) AS p_max,
          min(l_suppkey) AS s_min, max(l_suppkey) AS s_max
        FROM z GROUP BY 1, 2
        UNION ALL
        SELECT 'linear', CAST(px >> 4 AS BIGINT), count(*),
          min(l_partkey), max(l_partkey), min(l_suppkey), max(l_suppkey)
        FROM n GROUP BY 1, 2""".stripMargin))
  )
}
