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
}
