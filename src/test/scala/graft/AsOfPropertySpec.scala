package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Property harness for the as-of operator's full surface: on seeded random
  * datasets (dense time ties, matchless keys, null keys/times), every
  * (direction, tolerance, leftOuter) combination must equal the
  * compositional window formulation row-for-row.
  *
  * The window reference filters candidates by tolerance BEFORE ranking;
  * that is equivalent to the operator's "best candidate, then tolerance
  * check" because distance is monotone within each side: if the per-side
  * argmax/argmin is out of tolerance, every other row on that side is
  * farther out.
  */
class AsOfPropertySpec extends SparkSpec {

  /** Generalized window-formulation ground truth. */
  private def reference(err: DataFrame, pur: DataFrame, direction: String,
      tolerance: Long, leftOuter: Boolean): DataFrame = {
    val dt = col("pur_ts") - col("err_ts")
    val inTol =
      if (tolerance < 0L) lit(true)
      else direction match {
        case "backward" => -dt <= tolerance
        case "forward" => dt <= tolerance
        case "nearest" => abs(dt) <= tolerance
      }
    val sideCond = direction match {
      case "backward" => col("pur_ts") <= col("err_ts")
      case "forward" => col("pur_ts") >= col("err_ts")
      // backward/forward exclude null times through their inequality; the
      // unconditional nearest join must do it explicitly, else abs(dt) =
      // NULL sorts FIRST under ascending nulls-first and a null-time row
      // falsely takes rank 1
      case "nearest" => col("pur_ts").isNotNull && col("err_ts").isNotNull
    }
    val order = direction match {
      case "backward" => Seq(col("pur_ts").desc, col("pur_id").desc)
      case "forward" => Seq(col("pur_ts").asc, col("pur_id").asc)
      case "nearest" =>
        val back = col("pur_ts") <= col("err_ts")
        Seq(abs(dt).asc, when(back, 0).otherwise(1).asc,
          when(back, -col("pur_id")).otherwise(col("pur_id")).asc)
    }
    val joinCond = col("u") === col("pu") && sideCond && inTol
    val w = Window.partitionBy(col("err_id")).orderBy(order: _*)
    err.join(pur, joinCond, if (leftOuter) "left" else "inner")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("err_id"), col("pur_id"))
  }

  private def dataset(seed: Int): (DataFrame, DataFrame) = {
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    val nKeys = 3 + rnd.nextInt(20)
    val tRange = 5 + rnd.nextInt(60)
    val nErr = 50 + rnd.nextInt(300)
    val nPur = 30 + rnd.nextInt(300)
    def gen(n: Int, idBase: Long) = (1 to n).map { i =>
      val key: java.lang.Long =
        if (rnd.nextInt(40) == 0) null else rnd.nextInt(nKeys).toLong
      val ts: java.lang.Long =
        if (rnd.nextInt(40) == 0) null else rnd.nextInt(tRange).toLong
      (idBase + i, key, ts)
    }
    val err = gen(nErr, 0L).toDF("err_id", "u", "err_ts")
    val pur = gen(nPur, 10000L).toDF("pur_id", "pu", "pur_ts")
    (err, pur)
  }

  for (seed <- Seq(11, 42, 97)) {
    test(s"operator == window reference for every direction/tolerance/outer (seed $seed)") {
      val (err, pur) = dataset(seed)
      err.persist(); pur.persist()
      try {
        val tolerances = Seq(-1L, 0L, 3L, 10L)
        for {
          direction <- Seq("backward", "forward", "nearest")
          tolerance <- tolerances
          outer <- Seq(false, true)
        } {
          val a = plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts",
            "pur_id", leftOuter = outer, direction = direction,
            tolerance = tolerance).select(col("err_id"), col("pur_id"))
          val b = reference(err, pur, direction, tolerance, outer)
          val extra = a.exceptAll(b).count()
          val missing = b.exceptAll(a).count()
          assert(extra == 0 && missing == 0,
            s"direction=$direction tolerance=$tolerance outer=$outer: " +
              s"$extra operator-only rows, $missing reference-only rows")
        }
      } finally { err.unpersist(); pur.unpersist() }
    }
  }
}
