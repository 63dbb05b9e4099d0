package graft

import org.apache.spark.sql.functions._

import graft.functions.Kernels

/** DtwBand kernel obligations: bit-equality with an independent Scala
  * reference DP on random series, the metric sanity properties
  * (identity, symmetry), the LB_Keogh ≤ DTW ≤ lock-step sandwich that
  * makes x11b's shortlist lossless-in-the-declared-way, null semantics,
  * and the codegen span.
  */
class DtwSpec extends SparkSpec {

  private val n = 32
  private val band = 4

  /** Independent reference: same recurrence, deliberately written with a
    * full (n+1)×(n+1) matrix instead of the kernel's two rolling rows.
    */
  private def refDtw(a: Array[Double], b: Array[Double]): Double = {
    val INF = 1e30
    val d = Array.fill(n + 1, n + 1)(INF)
    d(0)(0) = 0.0
    for (i <- 1 to n; j <- 1 to n) {
      d(i)(j) =
        if (math.abs(i - j) > band) INF
        else math.abs(a(i - 1) - b(j - 1)) +
          math.min(math.min(d(i - 1)(j), d(i)(j - 1)), d(i - 1)(j - 1))
    }
    d(n)(n)
  }

  private def lbKeogh(q: Array[Double], c: Array[Double]): Double = {
    var s = 0.0
    for (i <- 0 until n) {
      val lo = math.max(0, i - band); val hi = math.min(n - 1, i + band)
      val u = (lo to hi).map(q).max; val l = (lo to hi).map(q).min
      s += (if (c(i) > u) c(i) - u else if (c(i) < l) l - c(i) else 0.0)
    }
    s
  }

  private val rnd = new scala.util.Random(7)
  private def series(): Array[Double] =
    Array.fill(n)(math.round(rnd.nextDouble() * 1000) / 100.0)

  private lazy val pairs = Seq.fill(50)((series(), series()))

  test("kernel is bit-equal to the reference DP on random pairs") {
    import spark.implicits._
    val df = pairs.toDF("a", "b")
      .select(Kernels.dtw_band(col("a"), col("b"), band).as("d"))
    val got = df.collect().map(_.getDouble(0))
    got.zip(pairs).foreach { case (g, (a, b)) =>
      assert(g == refDtw(a, b), s"kernel $g != reference ${refDtw(a, b)}")
    }
  }

  test("identity is 0, the metric is symmetric, and the sandwich holds") {
    import spark.implicits._
    val sym = pairs.map { case (a, b) => (a, b) }.toDF("a", "b")
      .select(Kernels.dtw_band(col("a"), col("a"), band).as("self"),
        Kernels.dtw_band(col("a"), col("b"), band).as("ab"),
        Kernels.dtw_band(col("b"), col("a"), band).as("ba"))
      .collect()
    sym.zip(pairs).foreach { case (r, (a, b)) =>
      assert(r.getDouble(0) == 0.0, "dtw(a,a) != 0")
      assert(r.getDouble(1) == r.getDouble(2), "dtw not symmetric")
      val lockstep = a.zip(b).map { case (x, y) => math.abs(x - y) }.sum
      // LB_Keogh lower-bounds, the diagonal path upper-bounds
      assert(lbKeogh(a, b) <= r.getDouble(1) + 1e-9,
        s"LB_Keogh ${lbKeogh(a, b)} above dtw ${r.getDouble(1)}")
      assert(r.getDouble(1) <= lockstep + 1e-9,
        s"dtw ${r.getDouble(1)} above lock-step $lockstep")
    }
  }

  test("shape mismatch and null elements yield null; codegen span holds") {
    import spark.implicits._
    val bad = Seq((Seq(1.0, 2.0), Seq(1.0, 2.0, 3.0))).toDF("a", "b")
      .select(Kernels.dtw_band(col("a"), col("b"), band).as("d"))
    assert(bad.collect().head.isNullAt(0))
    // inputs derived from a range scan via the codegen-supported array()
    // constructor — a local relation of constants folds to
    // LocalTableScan, and transform() is CodegenFallback; either would
    // make the span assert vacuous
    val df = spark.range(4).select(
        array((1 to n).map(i =>
          pmod(col("id") * 37 + lit(i * 13), lit(97)).cast("double")): _*).as("a"),
        array((1 to n).map(i =>
          pmod(col("id") * 53 + lit(i * 7), lit(89)).cast("double")): _*).as("b"))
      .select(Kernels.dtw_band(col("a"), col("b"), band).as("d"))
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("dtw_band")).getOrElse("")
    assert(line.trim.startsWith("*("), s"dtw_band outside codegen:\n$plan")
    assert(df.collect().forall(!_.isNullAt(0)))
  }
}
