package graft.ext

import java.nio.file.Paths

import org.apache.commons.io.FileUtils
import org.apache.spark.sql.functions._

import graft.{Registry, SparkSpec}

/** x2j positive contract on a CONTROLLED corpus (the driver fixture has
  * no identical embeddings, so its oracle exercises kept/semantic_dup but
  * never the exact-dup collapse — same device as MultimodalSpec for x5g):
  * one-hot vector geometry makes every verdict derivable by hand.
  *
  * Corpus (64-d, value 10 on the hot dim so quantization is exact):
  *   - seeds 0..7: one-hot at dim k — each lands in its own cluster at
  *     d2 = 0, mutually orthogonal (cos 0 < τ), all kept;
  *   - 100, 101: IDENTICAL one-hot at dim 10 — orthogonal to every seed
  *     (cos 0, never pruned by a seed), equidistant to all centroids so
  *     the tie-break assigns cluster 0; the collapse must emit rep 100
  *     kept, 101 exact_dup;
  *   - 102: one-hot at dim 20; 103: dim 20 = 10 plus dim 21 = 1 —
  *     same cluster-0 tie-break, cos(102,103) = 100/(10·√101) ≈ 0.995
  *     ≥ τ, d2(102) = 200 < d2(103) = 201, so the closer-to-centroid
  *     rule keeps 102 and prunes 103 as semantic_dup;
  *   - 104: dim 0 = 5 + dim 30 = 12; 105: dim 1 = 5 + dim 30 = 12 —
  *     the CLUSTER-BOUNDARY pair: mutually cos = 144/169 ≈ 0.85 ≥ τ,
  *     but 104 is nearest seed 0 (d2 = 169 vs 269) and 105 nearest
  *     seed 1, each below τ of its own seed (cos = 50/130 ≈ 0.385), so
  *     they land in DIFFERENT clusters and BOTH survive — the declared
  *     boundary loss of cluster-confined pruning, pinned here at unit
  *     level (the 30× gate measures the same channel statistically).
  */
class SemanticDedupSpec extends SparkSpec {

  private val dir = s"${graft.Tmp.root}/semdedup-corpus"

  private def vec(hot: Map[Int, Float]): Seq[Float] =
    (0 until 64).map(i => hot.getOrElse(i, 0.0f))

  private lazy val corpus: String = {
    FileUtils.deleteQuietly(Paths.get(dir).toFile)
    import spark.implicits._
    val rows: Seq[(Long, Seq[Float], Int)] =
      (0 until 8).map(k => (k.toLong, vec(Map(k -> 10.0f)), k)) ++ Seq(
        (100L, vec(Map(10 -> 10.0f)), 0),
        (101L, vec(Map(10 -> 10.0f)), 0),
        (102L, vec(Map(20 -> 10.0f)), 0),
        (103L, vec(Map(20 -> 10.0f, 21 -> 1.0f)), 0),
        (104L, vec(Map(0 -> 5.0f, 30 -> 12.0f)), 0),
        (105L, vec(Map(1 -> 5.0f, 30 -> 12.0f)), 1))
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"), col("embedding").cast("array<float>"), col("label"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("x2j: exact-dup collapse, semantic prune, and keep-set are exact") {
    val got = Registry.queries("x2j_semantic_dedup")(spark, corpus)
      .collect()
      .map(r => r.getLong(0) ->
        ((r.getInt(1), r.getLong(2), r.getBoolean(3), r.getString(4))))
      .toMap
    assert(got.size == 14, got)
    for (k <- 0 until 8)
      assert(got(k.toLong) == ((k, k.toLong, true, "kept")), s"seed $k: ${got(k.toLong)}")
    assert(got(100L) == ((0, 100L, true, "kept")), got(100L))
    assert(got(101L) == ((0, 100L, false, "exact_dup")), got(101L))
    assert(got(102L) == ((0, 102L, true, "kept")), got(102L))
    assert(got(103L) == ((0, 103L, false, "semantic_dup")), got(103L))
    // boundary pair: τ-similar but split across clusters 0 and 1 — both
    // survive (the declared cluster-boundary loss)
    assert(got(104L) == ((0, 104L, true, "kept")), got(104L))
    assert(got(105L) == ((1, 105L, true, "kept")), got(105L))
  }
}
