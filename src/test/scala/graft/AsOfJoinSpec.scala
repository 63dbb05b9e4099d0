package graft

import org.apache.spark.sql.functions._

/** The custom sort-merge as-of operator (plans/AsOfJoin.scala) must equal
  * the compositional range-join + row_number()=1 formulation row-for-row —
  * on the fixture and on adversarial generated data (ties, matchless keys,
  * nulls, multiple candidates per left row).
  */
class AsOfJoinSpec extends SparkSpec {

  private def viaWindow(err: org.apache.spark.sql.DataFrame,
      pur: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("err_id"))
      .orderBy(col("pur_ts").desc, col("pur_id").desc)
    err.join(pur, col("u") === col("pu") && col("pur_ts") <= col("err_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("err_id"), col("pur_id"))
  }

  private def viaOperator(err: org.apache.spark.sql.DataFrame,
      pur: org.apache.spark.sql.DataFrame) =
    plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id")
      .select(col("err_id"), col("pur_id"))

  test("asof operator equals the window formulation on the events fixture") {
    val ev = Tables.events(spark, sf)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
    val a = viaOperator(err, pur)
    val b = viaWindow(err, pur)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("asof operator equals the window formulation on adversarial generated data") {
    import spark.implicits._
    // deterministic generator: keys 0..19, times folded into a small range
    // so ties and multi-candidate groups are common; key 13 has no right
    // rows, key 17 no left rows; a null key and a null time on each side
    val err = (1L to 400L).map(i => (i, i % 20, (i * 7) % 50))
      .toDF("err_id", "u", "err_ts")
      .union(spark.sql(
        "SELECT * FROM VALUES (9001L, CAST(NULL AS BIGINT), 5L), (9002L, 3L, CAST(NULL AS BIGINT)) AS t(err_id, u, err_ts)"))
      .filter(col("u").isNull || col("u") =!= 17)
    val pur = (1L to 300L).map(i => (1000L + i, i % 20, (i * 11) % 50))
      .toDF("pur_id", "pu", "pur_ts")
      .union(spark.sql(
        "SELECT * FROM VALUES (9101L, CAST(NULL AS BIGINT), 5L), (9102L, 4L, CAST(NULL AS BIGINT)) AS t(pur_id, pu, pur_ts)"))
      .filter(col("pu").isNull || col("pu") =!= 13)
    val a = viaOperator(err, pur)
    val b = viaWindow(err, pur)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("asof plan is the custom exec: no pair blow-up, no window, sort-merge shape") {
    val ev = Tables.events(spark, sf)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
    val plan = viaOperator(err, pur).queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), plan)
    assert(!plan.contains("Window"), plan)
    assert(!plan.contains("BroadcastNestedLoop"), plan)
    // EnsureRequirements supplied the sort-merge contract: both sides
    // exchanged on the key and sorted under the operator
    assert(plan.contains("Exchange hashpartitioning"), plan)
    assert(plan.contains("Sort ["), plan)
  }

  test("registered q18c query matches q18 row-for-row") {
    val a = Registry.queries("q18c_asof_native")(spark, sf)
    val b = Registry.queries("q18_join_asof")(spark, sf)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  private def fixtureSides() = {
    val ev = Tables.events(spark, sf)
    val err = ev.filter(col("event_type") === "error")
      .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
    val pur = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
    (err, pur)
  }

  test("left-outer asof keeps unmatched and null-keyed left rows with null right columns") {
    import spark.implicits._
    val err = Seq((1L, 10L, 5L), (2L, 10L, 1L), (3L, 99L, 5L))
      .toDF("err_id", "u", "err_ts")
      .union(spark.sql(
        "SELECT * FROM VALUES (4L, CAST(NULL AS BIGINT), 5L) AS t(err_id, u, err_ts)"))
    val pur = Seq((100L, 10L, 3L), (101L, 10L, 2L)).toDF("pur_id", "pu", "pur_ts")
    val out = plans.AsOf.leftJoin(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id")
      .select(col("err_id"), col("pur_id")).collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // err 1: best purchase at ts<=5 is 100; err 2: none at ts<=1; err 3:
    // keyless; err 4: null key — outer keeps all four
    assert(out == Set((1L, 100L), (2L, -1L), (3L, -1L), (4L, -1L)))
    // and equals the compositional left-join formulation on the fixture
    val (ferr, fpur) = fixtureSides()
    val a = plans.AsOf.leftJoin(ferr, fpur, "u", "pu", "err_ts", "pur_ts", "pur_id")
      .select(col("err_id"), col("pur_id"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("err_id"))
      .orderBy(col("pur_ts").desc, col("pur_id").desc)
    val b = ferr.join(fpur, col("u") === col("pu") && col("pur_ts") <= col("err_ts"), "left")
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("err_id"), col("pur_id"))
    assert(a.count() >= viaWindow(ferr, fpur).count())
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }

  test("self-join with shared lineage dedups exprIds: right columns carry right values") {
    // ADVICE r06: without dedup, UnsafeProjection binds duplicate exprIds
    // to their first occurrence and right columns silently return LEFT
    // values. Join a frame to ITSELF with no fresh aliases.
    import spark.implicits._
    val t = Seq((10L, 1L, 7L), (10L, 2L, 8L), (20L, 5L, 9L)).toDF("k", "t", "v")
    val joined = plans.AsOf.join(t, t, "k", "k", "t", "t", "v")
    // schema: k,t,v,k,t,v — compare positionally
    val rows = joined.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    // left (10,1,7) matches right (10,1,7); left (10,2,8) matches the
    // LATEST right at t<=2 which is (10,2,8) itself; (20,5,9) matches itself
    assert(rows == Set(
      (10L, 1L, 7L, 10L, 1L, 7L),
      (10L, 2L, 8L, 10L, 2L, 8L),
      (20L, 5L, 9L, 20L, 5L, 9L)))
    // the broken binding would have made this vacuously true — prove the
    // right side can DIFFER by shifting left times back so earlier right
    // rows win
    val l2 = t.select(col("k"), (col("t") + 0L).as("t"), (col("v") + 100L).as("v"))
    val j2 = plans.AsOf.join(l2, t, "k", "k", "t", "t", "v").collect().map(r =>
      (r.getLong(2), r.getLong(5))).toSet
    assert(j2 == Set((107L, 7L), (108L, 8L), (109L, 9L))) // left v ≠ right v
  }

  test("SQL surface: asof_join table function plans AsOfJoinExec and matches the API") {
    val (err, pur) = fixtureSides()
    err.createOrReplaceTempView("asof_sql_err")
    pur.createOrReplaceTempView("asof_sql_pur")
    val viaSql = spark.sql(
      "SELECT err_id, pur_id FROM asof_join('asof_sql_err', 'asof_sql_pur', " +
        "'u', 'pu', 'err_ts', 'pur_ts', 'pur_id')")
    assert(viaSql.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val viaApi = viaOperator(err, pur)
    assert(viaSql.count() > 0)
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
    // left-outer via the 8th argument
    val outerSql = spark.sql(
      "SELECT err_id, pur_id FROM asof_join('asof_sql_err', 'asof_sql_pur', " +
        "'u', 'pu', 'err_ts', 'pur_ts', 'pur_id', true)")
    val outerApi = plans.AsOf.leftJoin(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id")
      .select(col("err_id"), col("pur_id"))
    assert(outerSql.exceptAll(outerApi).isEmpty && outerApi.exceptAll(outerSql).isEmpty)
  }

  test("infix ASOF JOIN syntax lowers onto AsOfJoinExec and matches the API") {
    val (err, pur) = fixtureSides()
    err.createOrReplaceTempView("asof_sql_err")
    pur.createOrReplaceTempView("asof_sql_pur")
    // Snowflake's shape: MATCH_CONDITION then ON; TIEBREAK is the graft
    // extension carrying the operator's deterministic tie column
    val viaInfix = spark.sql(
      """SELECT err_id, pur_id FROM asof_sql_err ASOF JOIN asof_sql_pur
        |  MATCH_CONDITION (asof_sql_err.err_ts >= asof_sql_pur.pur_ts)
        |  ON asof_sql_err.u = asof_sql_pur.pu
        |  TIEBREAK asof_sql_pur.pur_id""".stripMargin)
    assert(viaInfix.queryExecution.executedPlan.toString.contains("AsOfJoin"))
    val viaApi = viaOperator(err, pur)
    assert(viaInfix.count() > 0)
    assert(viaInfix.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaInfix).isEmpty)
    // LEFT ASOF JOIN keeps unmatched left rows
    val outerInfix = spark.sql(
      """SELECT err_id, pur_id FROM asof_sql_err LEFT ASOF JOIN asof_sql_pur
        |  MATCH_CONDITION (asof_sql_err.err_ts >= asof_sql_pur.pur_ts)
        |  ON asof_sql_err.u = asof_sql_pur.pu
        |  TIEBREAK asof_sql_pur.pur_id""".stripMargin)
    val outerApi = plans.AsOf.leftJoin(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id")
      .select(col("err_id"), col("pur_id"))
    assert(outerInfix.exceptAll(outerApi).isEmpty &&
      outerApi.exceptAll(outerInfix).isEmpty)
    // <= in MATCH_CONDITION selects the forward direction
    val fwdInfix = spark.sql(
      """SELECT err_id, pur_id FROM asof_sql_err ASOF JOIN asof_sql_pur
        |  MATCH_CONDITION (asof_sql_err.err_ts <= asof_sql_pur.pur_ts)
        |  ON asof_sql_err.u = asof_sql_pur.pu
        |  TIEBREAK asof_sql_pur.pur_id""".stripMargin)
    val fwdApi = plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts",
      "pur_id", direction = plans.AsOfJoin.Forward)
      .select(col("err_id"), col("pur_id"))
    assert(fwdInfix.exceptAll(fwdApi).isEmpty && fwdApi.exceptAll(fwdInfix).isEmpty)
  }

  test("infix rewrite leaves ordinary SQL byte-identical") {
    import plans.AsOfInfixParser.rewrite
    val plain = "SELECT a, count(*) FROM t WHERE b LIKE '%asof%' GROUP BY a"
    // keyword in a LITERAL is untouched: the clause regex needs the full
    // JOIN ... MATCH_CONDITION ... ON shape, not the bare word
    assert(rewrite(plain) == plain)
    val noAsof = "SELECT * FROM x JOIN y ON x.k = y.k"
    assert(rewrite(noAsof) eq noAsof) // fast path: no allocation at all
    // default tie = right time column when TIEBREAK is absent
    val defaulted = rewrite(
      "SELECT * FROM l ASOF JOIN r MATCH_CONDITION (l.t >= r.t) ON l.k = r.k")
    assert(defaulted ==
      "SELECT * FROM asof_join('l', 'r', 'l.k', 'r.k', 'l.t', 'r.t', 'r.t', false, 'backward')",
      defaulted)
  }

  test("infix rewrite skips literals and comments, rejects malformed clauses") {
    import plans.AsOfInfixParser.rewrite
    // a COMPLETE clause inside a string literal or comment is untouched
    // (ADVICE r08: the raw-text regex used to corrupt these)
    val inLiteral = "SELECT 'x ASOF JOIN y MATCH_CONDITION (a >= b) ON k = k' AS doc FROM t"
    assert(rewrite(inLiteral) == inLiteral)
    val inComment =
      "SELECT a FROM t -- l ASOF JOIN r MATCH_CONDITION (x >= y) ON k = k\nWHERE a > 0"
    assert(rewrite(inComment) == inComment)
    val inBracketed =
      "SELECT a /* l ASOF JOIN r MATCH_CONDITION (x >= y) ON k = k */ FROM t"
    assert(rewrite(inBracketed) == inBracketed)
    // a real clause NEXT TO a literal containing quotes still rewrites
    val mixed = rewrite("SELECT 'it''s ASOF o''clock' AS s, * FROM " +
      "l ASOF JOIN r MATCH_CONDITION (l.t >= r.t) ON l.k = r.k")
    assert(mixed.contains("asof_join('l', 'r'") &&
      mixed.contains("'it''s ASOF o''clock'"), mixed)
    // malformed shapes fail fast with the supported shape, instead of
    // leaking fragments into the delegate parser
    val noMatch = intercept[IllegalArgumentException](
      rewrite("SELECT * FROM l ASOF JOIN r ON l.k = r.k"))
    assert(noMatch.getMessage.contains("supported shape"), noMatch.getMessage)
    val compoundOn = intercept[IllegalArgumentException](rewrite(
      "SELECT * FROM l ASOF JOIN r MATCH_CONDITION (l.t >= r.t) ON l.k = r.k AND l.j = r.j"))
    assert(compoundOn.getMessage.contains("compound ON"), compoundOn.getMessage)
    val badCond = intercept[IllegalArgumentException](rewrite(
      "SELECT * FROM l ASOF JOIN r MATCH_CONDITION (l.t >= r.t OR l.u = r.u) ON l.k = r.k"))
    assert(badCond.getMessage.contains("MATCH_CONDITION"), badCond.getMessage)
  }

  test("infix bounded MATCH_CONDITION lowers to the tolerance argument") {
    import plans.AsOfInfixParser.rewrite
    val back = rewrite("SELECT * FROM l LEFT ASOF JOIN r " +
      "MATCH_CONDITION (l.t >= r.t AND l.t - r.t <= 500) ON l.k = r.k")
    assert(back == "SELECT * FROM asof_join('l', 'r', 'l.k', 'r.k', " +
      "'l.t', 'r.t', 'r.t', true, 'backward', 500)", back)
    val fwd = rewrite("SELECT * FROM l ASOF JOIN r " +
      "MATCH_CONDITION (l.t <= r.t AND r.t - l.t <= 9) ON l.k = r.k TIEBREAK r.id")
    assert(fwd == "SELECT * FROM asof_join('l', 'r', 'l.k', 'r.k', " +
      "'l.t', 'r.t', 'r.id', false, 'forward', 9)", fwd)
    // a bound over the WRONG columns is not a tolerance — reject, never
    // silently lower
    val wrong = intercept[IllegalArgumentException](rewrite(
      "SELECT * FROM l ASOF JOIN r MATCH_CONDITION (l.t >= r.t AND r.t - l.t <= 5) ON l.k = r.k"))
    assert(wrong.getMessage.contains("tolerance bound"), wrong.getMessage)
  }

  test("infix tolerance SQL equals the DataFrame tolerance join (q18f shape)") {
    val (err, pur) = fixtureSides()
    err.createOrReplaceTempView("asof_tol_err")
    pur.createOrReplaceTempView("asof_tol_pur")
    val tol = 7L * 24L * 3600L * 1000000L
    val viaSql = spark.sql(
      s"""SELECT err_id, pur_id FROM asof_tol_err LEFT ASOF JOIN asof_tol_pur
         |  MATCH_CONDITION (asof_tol_err.err_ts >= asof_tol_pur.pur_ts
         |    AND asof_tol_err.err_ts - asof_tol_pur.pur_ts <= $tol)
         |  ON asof_tol_err.u = asof_tol_pur.pu
         |  TIEBREAK asof_tol_pur.pur_id""".stripMargin)
    val viaApi = plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts",
        "pur_id", leftOuter = true, tolerance = tol)
      .select(col("err_id"), col("pur_id"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
  }

  test("a key naming the wrong side's column fails with a clear error") {
    val (err, pur) = fixtureSides()
    err.createOrReplaceTempView("asof_sql_err")
    pur.createOrReplaceTempView("asof_sql_pur")
    val e = intercept[Exception] {
      // left_key names a RIGHT column: resolves (one children-wide
      // namespace on the SQL path) but must be rejected at planning
      spark.sql("SELECT * FROM asof_join('asof_sql_err', 'asof_sql_pur', " +
        "'pu', 'pu', 'err_ts', 'pur_ts', 'pur_id')").collect()
    }
    assert(e.getMessage.contains("own side"), e.getMessage)
  }

  // window formulations of the direction/tolerance variants — the ground
  // truth the operator must equal row-for-row
  private def viaWindowForward(err: org.apache.spark.sql.DataFrame,
      pur: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("err_id"))
      .orderBy(col("pur_ts").asc, col("pur_id").asc)
    err.join(pur, col("u") === col("pu") && col("pur_ts") >= col("err_ts"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("err_id"), col("pur_id"))
  }

  private def viaWindowNearest(err: org.apache.spark.sql.DataFrame,
      pur: org.apache.spark.sql.DataFrame) = {
    import org.apache.spark.sql.expressions.Window
    val back = col("pur_ts") <= col("err_ts")
    // micros, matching the operator's comparison unit (cast-to-long is
    // seconds and would blur sub-second distances into false ties)
    val w = Window.partitionBy(col("err_id")).orderBy(
      abs(unix_micros(col("pur_ts")) - unix_micros(col("err_ts"))).asc,
      when(back, 0).otherwise(1).asc,
      when(back, -col("pur_id")).otherwise(col("pur_id")).asc)
    err.join(pur, col("u") === col("pu"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("err_id"), col("pur_id"))
  }

  test("forward asof equals the window formulation on fixture and adversarial data") {
    import spark.implicits._
    val (ferr, fpur) = fixtureSides()
    val a = plans.AsOf.join(ferr, fpur, "u", "pu", "err_ts", "pur_ts", "pur_id",
      direction = "forward").select(col("err_id"), col("pur_id"))
    val b = viaWindowForward(ferr, fpur)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // adversarial: dense ties, equal left/right times, matchless keys
    val err = (1L to 400L).map(i => (i, i % 20, (i * 7) % 50)).toDF("err_id", "u", "err_ts")
    val pur = (1L to 300L).map(i => (1000L + i, i % 20, (i * 11) % 50)).toDF("pur_id", "pu", "pur_ts")
    val a2 = plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id",
      direction = "forward").select(col("err_id"), col("pur_id"))
    val b2 = viaWindowForward(err, pur)
    assert(a2.count() > 0)
    assert(a2.exceptAll(b2).isEmpty && b2.exceptAll(a2).isEmpty)
  }

  test("nearest asof equals the window formulation; equidistant ties go backward") {
    import spark.implicits._
    val (ferr, fpur) = fixtureSides()
    val a = plans.AsOf.join(ferr, fpur, "u", "pu", "err_ts", "pur_ts", "pur_id",
      direction = "nearest").select(col("err_id"), col("pur_id"))
    val b = viaWindowNearest(ferr, fpur)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
    // hand-built equidistant tie: purchases at t=3 and t=7 around an error
    // at t=5 — backward (100) must win over forward (101)
    val err = Seq((1L, 10L, 5L)).toDF("err_id", "u", "err_ts")
    val pur = Seq((100L, 10L, 3L), (101L, 10L, 7L)).toDF("pur_id", "pu", "pur_ts")
    val got = plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id",
      direction = "nearest").select(col("pur_id")).collect().map(_.getLong(0)).toSeq
    assert(got == Seq(100L))
    // and the forward row wins when it is strictly closer
    val pur2 = Seq((100L, 10L, 2L), (101L, 10L, 7L)).toDF("pur_id", "pu", "pur_ts")
    val got2 = plans.AsOf.join(err, pur2, "u", "pu", "err_ts", "pur_ts", "pur_id",
      direction = "nearest").select(col("pur_id")).collect().map(_.getLong(0)).toSeq
    assert(got2 == Seq(101L))
  }

  test("tolerance bounds the match in every direction; boundary is inclusive") {
    import spark.implicits._
    val err = Seq((1L, 10L, 100L), (2L, 10L, 200L)).toDF("err_id", "u", "err_ts")
    val pur = Seq((50L, 10L, 90L), (51L, 10L, 195L)).toDF("pur_id", "pu", "pur_ts")
    def run(dir: String, tol: Long, outer: Boolean = false) =
      plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id",
        leftOuter = outer, direction = dir, tolerance = tol)
        .select(col("err_id"), col("pur_id")).collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    // backward, tol=10: err1 matches 90 (Δ=10, inclusive); err2 matches 195
    assert(run("backward", 10L) == Set((1L, 50L), (2L, 51L)))
    // backward, tol=9: err1's only candidate is Δ=10 — dropped inner,
    // null-padded outer; err2 still matches (Δ=5)
    assert(run("backward", 9L) == Set((2L, 51L)))
    assert(run("backward", 9L, outer = true) == Set((1L, -1L), (2L, 51L)))
    // forward, tol=94: err1 → 195 (Δ=95) is out; err2 has no later purchase
    assert(run("forward", 95L) == Set((1L, 51L)))
    assert(run("forward", 94L) == Set.empty[(Long, Long)])
    // nearest, tol=9: err1's backward (Δ=10) is out of tolerance, so the
    // forward row at Δ=95 is also out — no match; err2 keeps Δ=5
    assert(run("nearest", 9L) == Set((2L, 51L)))
    // nearest, tol=95: err1 takes forward 195 only if backward is out —
    // backward Δ=10 is in tolerance and closer, so it wins
    assert(run("nearest", 95L) == Set((1L, 50L), (2L, 51L)))
  }

  test("SQL surface passes direction and tolerance through") {
    val (err, pur) = fixtureSides()
    err.createOrReplaceTempView("asof_sql_err")
    pur.createOrReplaceTempView("asof_sql_pur")
    val viaSql = spark.sql(
      "SELECT err_id, pur_id FROM asof_join('asof_sql_err', 'asof_sql_pur', " +
        "'u', 'pu', 'err_ts', 'pur_ts', 'pur_id', false, 'forward')")
    val viaApi = plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id",
      direction = "forward").select(col("err_id"), col("pur_id"))
    assert(viaSql.exceptAll(viaApi).isEmpty && viaApi.exceptAll(viaSql).isEmpty)
    // an unknown direction fails fast with the accepted values in the error
    val e = intercept[Exception] {
      spark.sql("SELECT * FROM asof_join('asof_sql_err', 'asof_sql_pur', " +
        "'u', 'pu', 'err_ts', 'pur_ts', 'pur_id', false, 'sideways')").collect()
    }
    assert(e.getMessage.contains("direction"), e.getMessage)
    // tolerance as the 10th argument (micros) limits matches like the API
    val tolSql = spark.sql(
      "SELECT err_id, pur_id FROM asof_join('asof_sql_err', 'asof_sql_pur', " +
        "'u', 'pu', 'err_ts', 'pur_ts', 'pur_id', false, 'backward', 604800000000)")
    val tolApi = plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id",
      tolerance = 604800000000L).select(col("err_id"), col("pur_id"))
    assert(tolSql.exceptAll(tolApi).isEmpty && tolApi.exceptAll(tolSql).isEmpty)
  }

  test("registered q18e/q18f/q18g run and match their window formulations") {
    val (ferr, fpur) = fixtureSides()
    val fwd = Registry.queries("q18e_asof_forward")(spark, sf)
    val fwdRef = viaWindowForward(ferr, fpur)
      .withColumnRenamed("pur_id", "next_purchase_id")
    assert(fwd.exceptAll(fwdRef).isEmpty && fwdRef.exceptAll(fwd).isEmpty)
    val near = Registry.queries("q18g_asof_nearest")(spark, sf)
    val nearRef = viaWindowNearest(ferr, fpur)
      .withColumnRenamed("pur_id", "nearest_purchase_id")
    assert(near.exceptAll(nearRef).isEmpty && nearRef.exceptAll(near).isEmpty)
    // tolerance query: every error survives (left outer), matched subset
    // equals the tolerance-filtered window formulation
    val tol = Registry.queries("q18f_asof_tolerance")(spark, sf)
    assert(tol.count() == ferr.count())
  }

  test("bucketed left against unbucketed right co-partitions (no zip error, same rows)") {
    // a bucketed scan satisfies ClusteredDistribution with ITS OWN
    // partition count — EnsureRequirements must still align the right
    // side, and the exec's guard makes any future mismatch loud
    val (err, pur) = fixtureSides()
    spark.sql("DROP TABLE IF EXISTS asof_err_bucketed")
    val loc = new java.io.File(
      spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), "asof_err_bucketed")
    org.apache.commons.io.FileUtils.deleteQuietly(loc)
    err.write.bucketBy(6, "u").sortBy("u").saveAsTable("asof_err_bucketed")
    val bErr = spark.table("asof_err_bucketed")
    val a = plans.AsOf.join(bErr, pur, "u", "pu", "err_ts", "pur_ts", "pur_id")
      .select(col("err_id"), col("pur_id"))
    val b = viaWindow(err, pur)
    assert(a.count() > 0)
    assert(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty)
  }
}
