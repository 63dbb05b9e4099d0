package graft.ext

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** x3n's compaction pass in isolation: the shard rewrite must (a) shrink
  * the part-file count, (b) preserve the code/norm ROW SETS exactly
  * (compaction is pure layout — any row delta is corruption), and (c)
  * leave the fragment generation untouched (the rollback contract). The
  * registered query's oracle proves served-results-equal-rebuild; this
  * pins the store-level mechanics the oracle can't see.
  */
class CompactionSpec extends SparkSpec {

  test("compactPqStore shrinks files, preserves rows, keeps the fragment generation") {
    val idxDir = s"${graft.Tmp.root}/compactspec_idx"
    FileUtils.deleteQuietly(new java.io.File(idxDir))
    val corpus = SimilarityQueries.quantFrame(spark, sf)
    val (codes, norms, _) = SimilarityQueries.pqBuildFrom(corpus)
    codes.withColumn("batch", pmod(col("vec_id"), lit(8)))
      .write.partitionBy("batch").mode("overwrite").parquet(s"$idxDir/frag/codes")
    norms.withColumn("batch", pmod(col("vec_id"), lit(8)))
      .write.partitionBy("batch").mode("overwrite").parquet(s"$idxDir/frag/norms")
    val fragListing = SimilarityQueries.partFiles(spark, s"$idxDir/frag").sorted

    val (before, after) =
      SimilarityQueries.compactPqStore(spark, idxDir, shardBudgetBytes = 16L << 20)

    assert(after < before, s"expected fewer files after compaction: $before -> $after")
    // tiny store, 16 MiB budget => exactly one shard per frame
    assert(after == 2, s"expected one shard per frame, got $after files")

    def rows(path: String): Seq[String] =
      spark.read.parquet(path).drop("batch")
        .collect().map(_.toString).sorted.toSeq
    assert(rows(s"$idxDir/compact/codes") == rows(s"$idxDir/frag/codes"),
      "compaction changed the code row set")
    assert(rows(s"$idxDir/compact/norms") == rows(s"$idxDir/frag/norms"),
      "compaction changed the norm row set")

    val fragAfter = SimilarityQueries.partFiles(spark, s"$idxDir/frag").sorted
    assert(fragAfter == fragListing,
      "compaction touched the fragment generation (rollback contract broken)")
  }
}
