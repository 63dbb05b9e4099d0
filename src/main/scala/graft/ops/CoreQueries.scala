package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}

/** SURVEY §2.2 Q1–Q37: scans/sinks, projection/filter, joins, aggregation,
  * window functions, sort/limit/set ops.
  *
  * Capability map (reference sites cited per query):
  *   - the reference's own dataflow is ingest-only (`main.go:101-175`); the
  *     analytical surface is ClickHouse SQL over the `flows` schema
  *     (`initdb/create_tables.sql:3-33`). Each query here is one row of the
  *     declared inventory, exercised over the driver fixture tables.
  *
  * Scale notes (100 TB posture): every query is a declarative DataFrame
  * plan — filters/projections reach the parquet scan (predicate pushdown +
  * column pruning), small dimension tables are broadcast explicitly, large
  * joins/aggregations shuffle on their keys with map-side partial
  * aggregation, and no query collects to the driver.
  */
object CoreQueries {

  /** Exact integer cents from a 2-decimal double column: engine-independent
    * (fixture money columns are exact 2-decimal values, verified in
    * FIXTURES.md data; round-half-up == round-half-away for positives).
    */
  private def cents(c: Column): Column = round(c * 100).cast(LongType)

  /** long → double money rendering, identical arithmetic in DuckDB. */
  private def money(c: Column): Column = c.cast(DoubleType) / 100.0

  private val tmpRoot = graft.Tmp.root

  /** Write lineitem + orders into the warehouse bucketed (and sorted) by
    * their join key — the SAME bucket count both sides, so a key-equi-join
    * aligns bucket-for-bucket with no exchange. Package-private: PlanSpec
    * audits the join plan this layout produces.
    *
    * Bucket-count sizing rule (VERDICT r10 #5): buckets SCALE WITH DATA at
    * write time — `max(8, ceil(rows / 1M))` off the big side's row count
    * (a parquet-metadata count, paid once per layout). The budget is 1M
    * rows (~100 MB of lineitem) per bucket, the standard ~128 MB-per-task
    * guidance: it bounds each bucket's sorted run — and so the
    * zero-exchange join's per-task sort-merge memory — as data grows,
    * which is what a fixed count cannot do at 100 TB. The budget was
    * MEASURED, not guessed: an A/B at the 10× fixture (6M rows) put a
    * 100k-row budget (61 buckets) at 1.27 s against 8 buckets' 0.54 s —
    * below ~1M rows per bucket the per-task fixed overhead (scheduling +
    * per-bucket file opens) dominates the sort it was meant to bound, so
    * the r10 ratio of 2.98 at 10× is the honest cost of 10× work in 8
    * still-in-memory tasks, not a sort pathology; the rule engages past
    * 8M rows where the sort bound starts to matter. Both tables use the
    * count derived from lineitem so bucket alignment (and the no-exchange
    * plan, PlanSpec-pinned) is preserved at every scale.
    *
    * Memoized per (warehouse dir, fixture dir): the bucketed write is the
    * once-per-layout cost the whole pattern exists to amortize, so repeat
    * invocations (bench sweeps, re-registered queries) reuse the tables and
    * q12b times the JOIN, not two `saveAsTable` writes. Staleness across
    * fixtures is still impossible: a different `d` misses the memo and
    * rewrites.
    */
  @volatile private var bucketedBuiltFor: Option[(String, String)] = None
  private val RowsPerBucket = 1000000L

  /** The sizing rule itself, exposed so ScaleBench's A/B can ask "what
    * would the rule pick here" without re-deriving it.
    */
  private[graft] def ruleBuckets(rows: Long): Int =
    math.max(8L, (rows + RowsPerBucket - 1) / RowsPerBucket).toInt

  /** Bucketed layout with an EXPLICIT bucket count and table-name suffix —
    * the A/B face of [[bucketedPair]] (ScaleBench r12: the rule was
    * measured only below its own crossover; the 30× A/B builds
    * rule-vs-fixed-8 layouts side by side and times the join on each).
    * Not memoized: A/B callers own their layouts.
    */
  private[graft] def bucketedPairWith(s: SparkSession, d: String,
      buckets: Int, suffix: String): Unit = {
    def write(df: org.apache.spark.sql.DataFrame, key: String, name: String): Unit = {
      s.sql(s"DROP TABLE IF EXISTS $name")
      // a table dir orphaned by a killed run blocks CREATE even after DROP
      val loc = new java.io.File(
        s.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), name)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
      df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key).saveAsTable(name)
    }
    write(Tables.lineitem(s, d), "l_orderkey", s"lineitem_bucketed$suffix")
    write(Tables.orders(s, d), "o_orderkey", s"orders_bucketed$suffix")
  }

  /** The q12b join body over a named bucketed layout — shared by the
    * registration and ScaleBench's rule-vs-fixed A/B so both time the
    * same plan.
    */
  private[graft] def bucketedJoin(s: SparkSession, suffix: String): org.apache.spark.sql.DataFrame =
    s.table(s"lineitem_bucketed$suffix")
      .join(s.table(s"orders_bucketed$suffix"), col("l_orderkey") === col("o_orderkey"))
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("n_items"),
        money(sum(cents(col("l_extendedprice")))).as("total"))

  private[graft] def bucketedPair(s: SparkSession, d: String): Unit = synchronized {
    val key = (s.conf.get("spark.sql.warehouse.dir"), d)
    val cached = bucketedBuiltFor.contains(key) &&
      s.catalog.tableExists("lineitem_bucketed") &&
      s.catalog.tableExists("orders_bucketed")
    if (!cached) {
      val rows = Tables.lineitem(s, d).count()
      bucketedPairWith(s, d, ruleBuckets(rows), "")
      bucketedBuiltFor = Some(key)
    }
  }

  def defs: Seq[Q] = Seq(
    // ---------------------------------------------------------- scans/sinks
    Q("q01_scan_parquet",
      (s, d) => Tables.region(s, d),
      Some("SELECT * FROM region")),

    // CSV scan with explicit schema (Q2): materialize nation as CSV first
    // (fixtures are parquet-only), then read it back with a declared schema —
    // the read is the operator under test.
    Q("q02_scan_csv",
      (s, d) => {
        val out = s"$tmpRoot/nation_csv"
        Tables.nation(s, d).write.mode("overwrite")
          .option("header", "true").csv(out)
        val schema = StructType(Seq(
          StructField("n_nationkey", IntegerType),
          StructField("n_name", StringType),
          StructField("n_regionkey", IntegerType)))
        s.read.schema(schema).option("header", "true").csv(out)
      },
      Some("SELECT * FROM nation")),

    // JSON-lines scan (Q3) — goflow2's alternative transport is NDJSON.
    Q("q03_scan_json",
      (s, d) => {
        val out = s"$tmpRoot/supplier_json"
        Tables.supplier(s, d).write.mode("overwrite").json(out)
        val schema = StructType(Seq(
          StructField("s_suppkey", LongType),
          StructField("s_name", StringType),
          StructField("s_nationkey", IntegerType),
          StructField("s_acctbal", DoubleType)))
        s.read.schema(schema).json(out)
          .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
      },
      Some("SELECT * FROM supplier")),

    // JDBC sink + readback (Q4; R5 parity `main.go:157-169`): identical
    // writer code path as the production ClickHouse target, executed
    // against embedded Derby (in the Spark distribution) since no
    // ClickHouse server exists in this environment.
    Q("q04_sink_jdbc",
      (s, d) => {
        // Embedded Derby admits ONE booting JVM per database directory
        // (db.lck), so the path must be per-JVM: a concurrent Bench and
        // ScalaTest run (both drive the registry) otherwise collide with
        // XJ040 on the shared tmp root. applicationId is unique per
        // SparkContext, which is exactly the Derby lock domain here;
        // Tmp.sessionDir also reaps stale sibling sessions' databases
        // (age-gated — ADVICE r12: they otherwise accumulate forever).
        val url = graft.sources.JdbcSink.derbyUrl(
          s"${graft.Tmp.sessionDir(s, "derby")}/q04")
        val p = graft.sources.JdbcSink.props()
        Tables.nation(s, d).write.mode("overwrite").jdbc(url, "nation_rt", p)
        s.read.jdbc(url, "nation_rt", p)
      },
      Some("SELECT * FROM nation")),

    // Parquet sink + readback (Q5; R5-parity sink shape for the lake path).
    Q("q05_sink_parquet",
      (s, d) => {
        val out = s"$tmpRoot/customer_roundtrip"
        Tables.customer(s, d).write.mode("overwrite").parquet(out)
        s.read.parquet(out)
      },
      Some("SELECT * FROM customer")),

    // Temp view + spark.sql (Q6): identical SQL text runs in both engines.
    Q("q06_sql_view",
      (s, d) => {
        Tables.registerViews(s, d)
        s.sql(
          """SELECT n_name, count(*) AS n_cust
            |FROM customer JOIN nation ON c_nationkey = n_nationkey
            |GROUP BY n_name""".stripMargin)
      },
      Some("SELECT n_name, count(*) AS n_cust FROM customer JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name")),

    // ------------------------------------------------- projection / filter
    // Q7: projection + rename + cast (R3 parity, `main.go:127-150`).
    Q("q07_project_cast",
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_linenumber").cast(LongType).as("line_no"),
        floor(col("l_quantity")).cast(IntegerType).as("qty_int"),
        col("l_extendedprice").as("price")),
      Some("SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS line_no, CAST(floor(l_quantity) AS INTEGER) AS qty_int, l_extendedprice AS price FROM lineitem")),

    // Q8: conjunctive/disjunctive predicates.
    Q("q08_filter_pred",
      (s, d) => Tables.orders(s, d)
        .filter(col("o_orderstatus") === "F" &&
          (col("o_totalprice") > 100000.0 || col("o_orderpriority") === "1-URGENT"))
        .select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority"),
      Some("SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority FROM orders WHERE o_orderstatus = 'F' AND (o_totalprice > 100000.0 OR o_orderpriority = '1-URGENT')")),

    // Q9: IN list, BETWEEN, null-safe equality.
    Q("q09_in_between",
      (s, d) => Tables.lineitem(s, d)
        .filter(col("l_returnflag").isin("A", "R") &&
          col("l_quantity").between(10, 20) &&
          (col("l_linestatus") <=> "F"))
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"),
      Some("SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem WHERE l_returnflag IN ('A','R') AND l_quantity BETWEEN 10 AND 20 AND l_linestatus IS NOT DISTINCT FROM 'F'")),

    // Q10: CASE WHEN buckets.
    Q("q10_case_when",
      (s, d) => Tables.orders(s, d)
        .withColumn("bucket",
          when(col("o_totalprice") < 50000.0, "low")
            .when(col("o_totalprice") < 150000.0, "mid")
            .otherwise("high"))
        .groupBy("bucket").agg(count(lit(1)).as("n_orders")),
      Some("SELECT CASE WHEN o_totalprice < 50000.0 THEN 'low' WHEN o_totalprice < 150000.0 THEN 'mid' ELSE 'high' END AS bucket, count(*) AS n_orders FROM orders GROUP BY 1")),

    // Q11: arithmetic scale-up (flows idiom `bytes * sampling_rate`,
    // `main.go:57` × `main.go:49`, here price×quantity in exact cents).
    Q("q11_arith_scaleup",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"),
          money(cents(col("l_extendedprice")) * col("l_quantity").cast(LongType))
            .as("gross")),
      Some("SELECT l_orderkey, l_linenumber, CAST(CAST(round(l_extendedprice*100) AS BIGINT) * CAST(l_quantity AS BIGINT) AS DOUBLE)/100.0 AS gross FROM lineitem")),

    // ------------------------------------------------------------- joins
    // Q12: inner equi-join (planner picks hash/SMJ; AQE may re-plan).
    Q("q12_join_inner",
      (s, d) => Tables.orders(s, d)
        .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_orders"),
          money(sum(cents(col("o_totalprice")))).as("total")),
      Some("SELECT c_mktsegment, count(*) AS n_orders, CAST(SUM(CAST(round(o_totalprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total FROM orders JOIN customer ON o_custkey = c_custkey GROUP BY c_mktsegment")),

    // Q12b: BUCKETED co-located join — the big-fact×big-fact scale
    // technique the brief calls out: both sides written bucketed (and
    // sorted) by the join key, so the join consumes the bucket layout
    // directly and NO shuffle exchange appears on either side (pinned in
    // PlanSpec). At 100 TB this turns every repeated key-join against the
    // table into a scan-local merge — the shuffle is paid once at write
    // time, not per query. The write is memoized per (warehouse, fixture),
    // mirroring that economics: the first call builds, the rest join.
    Q("q12b_join_bucketed",
      (s, d) => {
        bucketedPair(s, d)
        bucketedJoin(s, "")
      },
      Some("""SELECT o_orderpriority, count(*) AS n_items,
        CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS total
        FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        GROUP BY o_orderpriority""".stripMargin)),

    // Q13: explicit broadcast of small dims (nation 25 rows, region 5 rows) —
    // at 100 TB the fact side never shuffles for these joins.
    Q("q13_join_broadcast",
      (s, d) => Tables.customer(s, d)
        .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy("r_name").agg(count(lit(1)).as("n_cust")),
      Some("SELECT r_name, count(*) AS n_cust FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey GROUP BY r_name")),

    // Q14: left outer join (customers with zero orders kept).
    Q("q14_join_left",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(count(col("o_orderkey")).as("n_orders")),
      Some("SELECT c_custkey, count(o_orderkey) AS n_orders FROM customer LEFT JOIN orders ON c_custkey = o_custkey GROUP BY c_custkey")),

    // Q14b: full outer join (nulls on both sides).
    Q("q14b_join_full",
      (s, d) => Tables.nation(s, d)
        .join(Tables.supplier(s, d), col("n_nationkey") === col("s_nationkey"), "full_outer")
        .select("n_name", "s_name"),
      Some("SELECT n_name, s_name FROM nation FULL OUTER JOIN supplier ON n_nationkey = s_nationkey")),

    // Q15: left-semi (EXISTS).
    Q("q15_join_semi",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_semi")
        .select("c_custkey", "c_name"),
      Some("SELECT c_custkey, c_name FROM customer WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)")),

    // Q15b: left-anti (NOT EXISTS) — customers with no URGENT order. The
    // anti-join runs against a FILTERED orders subset (VERDICT r17 #2: the
    // unfiltered form was empty at sf0.01 — every customer has orders —
    // so the oracle row hash-matched an empty result and asserted nothing;
    // 203 sf0.01 customers lack an urgent order, so this row now
    // discriminates). The filter also shows the pushdown shape: the
    // predicate lands in the orders scan BELOW the anti-join build side.
    Q("q15b_join_anti",
      (s, d) => Tables.customer(s, d)
        .join(Tables.orders(s, d).filter(col("o_orderpriority") === "1-URGENT"),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select("c_custkey", "c_name"),
      Some("SELECT c_custkey, c_name FROM customer WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')")),

    // Q16: non-equi range join against a tiny inline bounds table
    // (broadcast nested loop — the small side is broadcast, so the scan side
    // streams once; port-range classification shape).
    Q("q16_join_range",
      (s, d) => {
        val buckets = s.createDataFrame(Seq(
          (1, 15, "small"), (16, 35, "medium"), (36, 60, "large")))
          .toDF("lo", "hi", "bucket")
        Tables.part(s, d)
          .join(broadcast(buckets),
            col("p_size") >= col("lo") && col("p_size") <= col("hi"))
          .groupBy("bucket").agg(count(lit(1)).as("n_parts"))
      },
      Some("SELECT bucket, count(*) AS n_parts FROM part JOIN (VALUES (1,15,'small'),(16,35,'medium'),(36,60,'large')) AS b(lo,hi,bucket) ON p_size BETWEEN lo AND hi GROUP BY bucket")),

    // Q17: cross join (5 × 25).
    Q("q17_join_cross",
      (s, d) => Tables.region(s, d).crossJoin(Tables.nation(s, d))
        .select("r_name", "n_name"),
      Some("SELECT r_name, n_name FROM region CROSS JOIN nation")),

    // Q18: as-of join — for each error event, the most recent purchase by the
    // same user at or before it. Spark has no native as-of; range join +
    // per-key window row_number()=1 is the idiomatic composition (SURVEY Q18).
    Q("q18_join_asof",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
        val w = Window.partitionBy(col("err_id"))
          .orderBy(col("pur_ts").desc, col("pur_id").desc)
        err.join(pur, col("u") === col("pu") && col("pur_ts") <= col("err_ts"))
          .withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select(col("err_id"), col("pur_id").as("asof_purchase_id"))
      },
      Some("""SELECT err_id, asof_purchase_id FROM (SELECT e.event_id AS err_id, p.event_id AS asof_purchase_id, row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.event_id DESC) AS rn FROM events e JOIN events p ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts WHERE e.event_type = 'error') WHERE rn = 1""")),

    // Q18b: interval-overlap join (flow overlaps maintenance window,
    // SURVEY Q18): events inside inline time windows; small side broadcast
    // so the fact side streams once through a BNLJ.
    Q("q18b_interval_overlap",
      (s, d) => {
        val windows = s.createDataFrame(Seq(
          ("w1", "2024-01-05 00:00:00", "2024-01-07 00:00:00"),
          ("w2", "2024-01-15 12:00:00", "2024-01-16 00:00:00"),
          ("w3", "2024-01-25 06:00:00", "2024-01-26 18:00:00")))
          .toDF("w_name", "w_from", "w_to")
          .select(col("w_name"), col("w_from").cast(TimestampType).as("w_from"),
            col("w_to").cast(TimestampType).as("w_to"))
        Tables.events(s, d)
          .join(broadcast(windows),
            col("ts") >= col("w_from") && col("ts") < col("w_to"))
          .groupBy("w_name")
          .agg(count(lit(1)).as("n_events"),
            countDistinct(col("user_id")).as("n_users"))
      },
      Some("""SELECT w_name, count(*) AS n_events, count(DISTINCT user_id) AS n_users
        FROM events JOIN (VALUES
          ('w1', TIMESTAMP '2024-01-05 00:00:00', TIMESTAMP '2024-01-07 00:00:00'),
          ('w2', TIMESTAMP '2024-01-15 12:00:00', TIMESTAMP '2024-01-16 00:00:00'),
          ('w3', TIMESTAMP '2024-01-25 06:00:00', TIMESTAMP '2024-01-26 18:00:00'))
          AS w(w_name, w_from, w_to)
        ON ts >= w_from AND ts < w_to
        GROUP BY w_name""".stripMargin)),

    // Q18c: the SAME as-of semantics as q18, through the custom sort-merge
    // operator (plans/AsOfJoin.scala: LogicalPlan + Strategy + SparkPlan
    // via SparkSessionExtensions) under the IDENTICAL oracle. The
    // compositional q18 materializes every qualifying (error, purchase)
    // pair before row_number() keeps one — per-key quadratic at scale; the
    // operator streams both sorted sides once (sort-merge-join cost shape).
    Q("q18c_asof_native",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
        graft.plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id")
          .select(col("err_id"), col("pur_id").as("asof_purchase_id"))
      },
      Some("""SELECT err_id, asof_purchase_id FROM (SELECT e.event_id AS err_id, p.event_id AS asof_purchase_id, row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.event_id DESC) AS rn FROM events e JOIN events p ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts WHERE e.event_type = 'error') WHERE rn = 1""")),

    // Q18h: the INFIX SQL surface over the same operator (r08's injected
    // parser) — `errors ASOF JOIN purchases MATCH_CONDITION (...) ON ...
    // TIEBREAK ...` lowered onto AsOfJoinExec, oracle-gated with q18c's
    // ground truth so the parser rewrite itself sits under the driver's
    // hash compare, not just unit tests.
    Q("q18h_asof_infix",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
          .createOrReplaceTempView("q18h_errors")
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
          .createOrReplaceTempView("q18h_purchases")
        s.sql(
          """SELECT err_id, pur_id AS asof_purchase_id
            |FROM q18h_errors ASOF JOIN q18h_purchases
            |  MATCH_CONDITION (q18h_errors.err_ts >= q18h_purchases.pur_ts)
            |  ON q18h_errors.u = q18h_purchases.pu
            |  TIEBREAK q18h_purchases.pur_id""".stripMargin)
      },
      Some("""SELECT err_id, asof_purchase_id FROM (SELECT e.event_id AS err_id, p.event_id AS asof_purchase_id, row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.event_id DESC) AS rn FROM events e JOIN events p ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts WHERE e.event_type = 'error') WHERE rn = 1""")),

    // Q18d: LEFT-OUTER as-of through the same operator — every error event
    // survives, unmatched ones with a null purchase (the enrichment shape:
    // "last purchase before this error, if any"). Oracle is the LEFT-join
    // + row_number()=1 composition; unmatched groups carry exactly one
    // all-null right row, so rn=1 keeps them.
    Q("q18d_asof_outer",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
        graft.plans.AsOf.leftJoin(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id")
          .select(col("err_id"), col("pur_id").as("asof_purchase_id"))
      },
      Some("""SELECT err_id, asof_purchase_id FROM (SELECT e.event_id AS err_id, p.event_id AS asof_purchase_id, row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.event_id DESC) AS rn FROM events e LEFT JOIN events p ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts WHERE e.event_type = 'error') WHERE rn = 1""")),

    // Q18e: FORWARD as-of through the operator — for each error, the FIRST
    // purchase at or after it ("next purchase after this error"): argmin by
    // (ts, id) among rows with p.ts >= e.ts, same merge pass as backward
    // (the forward candidate is a peek at the unconsumed head, O(1) state).
    Q("q18e_asof_forward",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
        graft.plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id",
            direction = "forward")
          .select(col("err_id"), col("pur_id").as("next_purchase_id"))
      },
      Some("""SELECT err_id, next_purchase_id FROM (SELECT e.event_id AS err_id, p.event_id AS next_purchase_id, row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts ASC, p.event_id ASC) AS rn FROM events e JOIN events p ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts >= e.ts WHERE e.event_type = 'error') WHERE rn = 1""")),

    // Q18f: backward as-of with a TOLERANCE — the last purchase within 7
    // days before the error; staler matches are discarded (left-outer, so
    // the error survives with a null purchase — the "recent context if any"
    // enrichment shape). Tolerance is in the time column's own unit:
    // micros for TIMESTAMP, 7 days = 604_800_000_000.
    Q("q18f_asof_tolerance",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
        graft.plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id",
            leftOuter = true, tolerance = 7L * 24L * 3600L * 1000000L)
          .select(col("err_id"), col("pur_id").as("recent_purchase_id"))
      },
      Some("""SELECT err_id, recent_purchase_id FROM (SELECT e.event_id AS err_id, p.event_id AS recent_purchase_id, row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.event_id DESC) AS rn FROM events e LEFT JOIN events p ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 7 DAY WHERE e.event_type = 'error') WHERE rn = 1""")),

    // Q18i (r9, VERDICT r08 #5): q18f's bounded as-of expressed INFIX —
    // `MATCH_CONDITION (lt >= rt AND lt - rt <= K)` lowers K (micros, the
    // operator's comparison unit) to asof_join's tolerance argument via
    // the injected parser. Same oracle as q18f, so the whole lowering
    // chain is hash-gated against DuckDB.
    Q("q18i_asof_infix_tol",
      (s, d) => {
        val ev = Tables.events(s, d)
        ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
          .createOrReplaceTempView("q18i_errors")
        ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
          .createOrReplaceTempView("q18i_purchases")
        s.sql(
          """SELECT err_id, pur_id AS recent_purchase_id
            |FROM q18i_errors LEFT ASOF JOIN q18i_purchases
            |  MATCH_CONDITION (q18i_errors.err_ts >= q18i_purchases.pur_ts
            |    AND q18i_errors.err_ts - q18i_purchases.pur_ts <= 604800000000)
            |  ON q18i_errors.u = q18i_purchases.pu
            |  TIEBREAK q18i_purchases.pur_id""".stripMargin)
      },
      Some("""SELECT err_id, recent_purchase_id FROM (SELECT e.event_id AS err_id, p.event_id AS recent_purchase_id, row_number() OVER (PARTITION BY e.event_id ORDER BY p.ts DESC, p.event_id DESC) AS rn FROM events e LEFT JOIN events p ON p.user_id = e.user_id AND p.event_type = 'purchase' AND p.ts <= e.ts AND p.ts >= e.ts - INTERVAL 7 DAY WHERE e.event_type = 'error') WHERE rn = 1""")),

    // Q18g: NEAREST as-of — whichever of the backward and forward matches
    // is closer in time, ties toward backward. The oracle ranks ALL same-
    // key purchases by (|Δt|, side, ±id): side+distance uniquely determine
    // the timestamp, so the per-side tie order (backward takes the max id,
    // forward the min — matching the operator's (time, tie) sort) completes
    // a total order whose global minimum is exactly the operator's choice.
    Q("q18g_asof_nearest",
      (s, d) => {
        val ev = Tables.events(s, d)
        val err = ev.filter(col("event_type") === "error")
          .select(col("event_id").as("err_id"), col("user_id").as("u"), col("ts").as("err_ts"))
        val pur = ev.filter(col("event_type") === "purchase")
          .select(col("event_id").as("pur_id"), col("user_id").as("pu"), col("ts").as("pur_ts"))
        graft.plans.AsOf.join(err, pur, "u", "pu", "err_ts", "pur_ts", "pur_id",
            direction = "nearest")
          .select(col("err_id"), col("pur_id").as("nearest_purchase_id"))
      },
      Some("""SELECT err_id, nearest_purchase_id FROM (SELECT e.event_id AS err_id, p.event_id AS nearest_purchase_id, row_number() OVER (PARTITION BY e.event_id ORDER BY abs(epoch_us(p.ts) - epoch_us(e.ts)) ASC, CASE WHEN p.ts <= e.ts THEN 0 ELSE 1 END ASC, CASE WHEN p.ts <= e.ts THEN -p.event_id ELSE p.event_id END ASC) AS rn FROM events e JOIN events p ON p.user_id = e.user_id AND p.event_type = 'purchase' WHERE e.event_type = 'error') WHERE rn = 1""")),

    // Q19: self-join — ordered order pairs per customer.
    Q("q19_join_self",
      (s, d) => {
        val o = Tables.orders(s, d).select("o_orderkey", "o_custkey")
        val a = o.as("a")
        val b = o.as("b")
        a.join(b, col("a.o_custkey") === col("b.o_custkey") &&
            col("a.o_orderkey") < col("b.o_orderkey"))
          .groupBy(col("a.o_custkey").as("o_custkey"))
          .agg(count(lit(1)).as("n_pairs"))
      },
      Some("SELECT a.o_custkey, count(*) AS n_pairs FROM orders a JOIN orders b ON a.o_custkey = b.o_custkey AND a.o_orderkey < b.o_orderkey GROUP BY a.o_custkey")),

    // --------------------------------------------------------- aggregation
    // Q20 (+flagship): TPC-H Q1 shape — scan + filter + hash agg + sort; the
    // same shape as the flows top-talkers query. Exact cents arithmetic; avg
    // computed as exact-sum / count in double (bit-identical cross-engine).
    Q("q20_agg_hash",
      (s, d) => {
        val li = Tables.lineitem(s, d)
          .filter(col("l_shipdate") <= lit("1998-09-02").cast(TimestampType))
        li.groupBy("l_returnflag", "l_linestatus").agg(
          sum(col("l_quantity").cast(LongType)).as("sum_qty"),
          money(sum(cents(col("l_extendedprice")))).as("sum_base_price"),
          // l_discount is an exact 2-decimal in [0,0.1] → cents(discount) is
          // the integer percent; all-product arithmetic stays in BIGINT.
          (sum(cents(col("l_extendedprice")) * (lit(100L) - cents(col("l_discount"))))
            .cast(DoubleType) / 10000.0).as("sum_disc_price"),
          (sum(col("l_quantity").cast(LongType)).cast(DoubleType) /
            count(lit(1)).cast(DoubleType)).as("avg_qty"),
          count(lit(1)).as("count_order"))
      },
      Some("""SELECT l_returnflag, l_linestatus,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS sum_base_price,
        CAST(SUM(CAST(round(l_extendedprice*100) AS BIGINT) * (100 - CAST(round(l_discount*100) AS BIGINT))) AS DOUBLE)/10000.0 AS sum_disc_price,
        CAST(SUM(CAST(l_quantity AS BIGINT)) AS DOUBLE)/CAST(count(*) AS DOUBLE) AS avg_qty,
        count(*) AS count_order
        FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        GROUP BY l_returnflag, l_linestatus""".stripMargin),
      headline = true),

    // Q21: global (no-group) aggregate.
    Q("q21_agg_global",
      (s, d) => Tables.lineitem(s, d).agg(
        count(lit(1)).as("n_rows"),
        sum(col("l_quantity").cast(LongType)).as("total_qty"),
        min(col("l_shipdate")).as("first_ship"),
        max(col("l_shipdate")).as("last_ship"),
        money(max(cents(col("l_extendedprice")))).as("max_price")),
      Some("SELECT count(*) AS n_rows, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty, min(l_shipdate) AS first_ship, max(l_shipdate) AS last_ship, CAST(MAX(CAST(round(l_extendedprice*100) AS BIGINT)) AS DOUBLE)/100.0 AS max_price FROM lineitem")),

    // Q22: multi count-distinct.
    Q("q22_count_distinct",
      // fanOut (r18, guide §2.5): the count-distinct plan Expands the
      // input 3x and partial-aggregates in the scan stage — on the
      // one-split fixture that whole chain ran in a single task
      // (profiled ~1 s of a 2 s wall); identity at real split counts
      (s, d) => Tables.fanOut(Tables.lineitem(s, d), col("l_partkey"))
        .groupBy("l_returnflag").agg(
        countDistinct(col("l_partkey")).as("n_parts"),
        countDistinct(col("l_suppkey")).as("n_supps"),
        countDistinct(col("l_partkey"), col("l_suppkey")).as("n_ps")),
      Some("SELECT l_returnflag, count(DISTINCT l_partkey) AS n_parts, count(DISTINCT l_suppkey) AS n_supps, count(DISTINCT (l_partkey, l_suppkey)) AS n_ps FROM lineitem GROUP BY l_returnflag")),

    // Q23: approx_count_distinct (HLL++) — sketches differ across engines, so
    // the declared contract is the tolerance itself: the oracle row matches
    // iff Spark's estimate is within 5% relative error of the exact count.
    Q("q23_approx_distinct",
      (s, d) => Tables.fanOut(Tables.lineitem(s, d), col("l_partkey")) // §2.5
        .groupBy("l_returnflag").agg(
        (abs(approx_count_distinct(col("l_partkey"), 0.02) - countDistinct(col("l_partkey")))
          .cast(DoubleType) / countDistinct(col("l_partkey")).cast(DoubleType) <= 0.05)
          .as("hll_within_5pct")),
      Some("SELECT l_returnflag, true AS hll_within_5pct FROM lineitem GROUP BY l_returnflag")),

    // Q24: rollup + grouping_id (traffic-matrix rollup shape).
    Q("q24_rollup",
      (s, d) => Tables.lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("n"), grouping_id().as("gid")),
      Some("SELECT l_returnflag, l_linestatus, count(*) AS n, CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)")),

    // Q24b: cube.
    Q("q24b_cube",
      (s, d) => Tables.orders(s, d)
        .cube("o_orderstatus", "o_orderpriority")
        .agg(count(lit(1)).as("n")),
      Some("SELECT o_orderstatus, o_orderpriority, count(*) AS n FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)")),

    // Q24c: PIVOT — long-to-wide reshaping with an EXPLICIT value list, so
    // the plan is a single hash aggregate (pivot without values adds a
    // distinct-discovery job — a full extra pass at scale).
    Q("q24c_pivot",
      (s, d) => Tables.lineitem(s, d)
        .groupBy("l_returnflag")
        .pivot("l_linestatus", Seq("F", "O"))
        .agg(sum(col("l_quantity").cast(LongType)))
        .select(col("l_returnflag"), col("F").as("qty_f"), col("O").as("qty_o")),
      Some("""SELECT l_returnflag,
        CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_f,
        CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS BIGINT) END) AS BIGINT) AS qty_o
        FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Q24d: UNPIVOT (melt) — wide-to-long, the inverse reshaping; a pure
    // per-row flatMap (no shuffle). Metrics are cast to one type up front
    // (unpivot requires it) and the oracle is the UNION ALL formulation.
    Q("q24d_unpivot",
      (s, d) => Tables.part(s, d)
        .select(col("p_partkey"), col("p_size").cast(LongType).as("p_size"),
          length(col("p_name")).cast(LongType).as("name_len"))
        .unpivot(Array(col("p_partkey")),
          Array(col("p_size"), col("name_len")), "metric", "value"),
      Some("""SELECT p_partkey, 'p_size' AS metric, CAST(p_size AS BIGINT) AS value FROM part
        UNION ALL
        SELECT p_partkey, 'name_len' AS metric, CAST(length(p_name) AS BIGINT) AS value FROM part""".stripMargin)),

    // Q24e: GROUPING SETS — the general form rollup/cube specialize;
    // grouping() flags disambiguate "NULL because aggregated away" from a
    // genuinely NULL key. Identical SQL text runs on both engines.
    Q("q24e_grouping_sets",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("orders_gs")
        s.sql("""SELECT o_orderstatus, o_orderpriority,
          grouping(o_orderstatus) AS g_status,
          grouping(o_orderpriority) AS g_prio, count(*) AS n
          FROM orders_gs
          GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""")
      },
      Some("""SELECT o_orderstatus, o_orderpriority,
        grouping(o_orderstatus) AS g_status,
        grouping(o_orderpriority) AS g_prio, count(*) AS n
        FROM orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)),

    // Q25: collect_list + collect_set, both sorted for determinism. The
    // collected arrays are rendered as CSV strings at the output boundary:
    // the driver's pandas canonicalizer cannot sort raw array cells
    // (VERDICT r01), and stringifying loses nothing on integer/flag data.
    Q("q25_collect_list",
      (s, d) => Tables.lineitem(s, d).groupBy("l_returnflag").agg(
        concat_ws(",", sort_array(collect_set(col("l_linestatus")))).as("statuses"),
        concat_ws(",",
          transform(sort_array(collect_list(col("l_linenumber"))),
            _.cast(StringType))).as("lines_csv"),
        size(collect_list(col("l_linenumber"))).as("n_collected")),
      Some("""SELECT l_returnflag,
        array_to_string(list_sort(list_distinct(list(l_linestatus))), ',') AS statuses,
        array_to_string(list_sort(list(l_linenumber)), ',') AS lines_csv,
        CAST(len(list(l_linenumber)) AS INTEGER) AS n_collected
        FROM lineitem GROUP BY l_returnflag""".stripMargin)),

    // Q26: conditional aggregation (sum/count over CASE).
    Q("q26_agg_conditional",
      (s, d) => Tables.lineitem(s, d).groupBy("l_linestatus").agg(
        money(sum(when(col("l_returnflag") === "R", cents(col("l_extendedprice"))).otherwise(0L)))
          .as("returned_value"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L)).as("n_returned"),
        count_if(col("l_quantity") > 25).as("n_bulk")),
      Some("SELECT l_linestatus, CAST(SUM(CASE WHEN l_returnflag='R' THEN CAST(round(l_extendedprice*100) AS BIGINT) ELSE 0 END) AS DOUBLE)/100.0 AS returned_value, CAST(SUM(CASE WHEN l_returnflag='R' THEN 1 ELSE 0 END) AS BIGINT) AS n_returned, CAST(count_if(l_quantity > 25) AS BIGINT) AS n_bulk FROM lineitem GROUP BY l_linestatus")),

    // Q27: variance/stddev computed exactly over integer quantities
    // (sum & sum-of-squares in BIGINT, then one double division — engine-
    // independent, unlike streaming double accumulation), plus exact median.
    Q("q27_agg_stats",
      (s, d) => {
        val q = col("l_quantity").cast(LongType)
        Tables.lineitem(s, d).groupBy("l_returnflag").agg(
          ((sum(q * q) * count(lit(1)) - sum(q) * sum(q)).cast(DoubleType) /
            (count(lit(1)) * (count(lit(1)) - 1L)).cast(DoubleType)).as("var_qty"),
          sqrt((sum(q * q) * count(lit(1)) - sum(q) * sum(q)).cast(DoubleType) /
            (count(lit(1)) * (count(lit(1)) - 1L)).cast(DoubleType)).as("std_qty"),
          expr("percentile(l_quantity, 0.5)").as("median_qty"))
      },
      Some("""SELECT l_returnflag,
        CAST(SUM(q*q)*count(*) - SUM(q)*SUM(q) AS DOUBLE) / CAST(count(*)*(count(*)-1) AS DOUBLE) AS var_qty,
        sqrt(CAST(SUM(q*q)*count(*) - SUM(q)*SUM(q) AS DOUBLE) / CAST(count(*)*(count(*)-1) AS DOUBLE)) AS std_qty,
        quantile_cont(l_quantity, 0.5) AS median_qty
        FROM (SELECT l_returnflag, l_quantity, CAST(l_quantity AS BIGINT) AS q FROM lineitem)
        GROUP BY l_returnflag""".stripMargin)),

    // Q28: HAVING (post-aggregation filter).
    Q("q28_having",
      (s, d) => Tables.lineitem(s, d).groupBy("l_suppkey")
        .agg(sum(col("l_quantity").cast(LongType)).as("total_qty"))
        .filter(col("total_qty") > 1000L),
      Some("SELECT l_suppkey, CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty FROM lineitem GROUP BY l_suppkey HAVING SUM(CAST(l_quantity AS BIGINT)) > 1000")),

    // ------------------------------------------------------------ windows
    // Q29: ranking functions with deliberate ties (floor bucket) + unique
    // tiebreak for determinism.
    Q("q29_win_rank",
      (s, d) => {
        val bucket = floor(col("o_totalprice") / 50000.0)
        val w = Window.partitionBy(col("o_orderpriority"))
          .orderBy(bucket.desc, col("o_orderkey"))
        Tables.orders(s, d).select(
          col("o_orderkey"), col("o_orderpriority"),
          bucket.cast(LongType).as("price_bucket"),
          row_number().over(w).as("rn"),
          rank().over(Window.partitionBy(col("o_orderpriority")).orderBy(bucket.desc)).as("rnk"),
          dense_rank().over(Window.partitionBy(col("o_orderpriority")).orderBy(bucket.desc)).as("drnk"),
          ntile(4).over(w).as("quartile"))
      },
      Some("""SELECT o_orderkey, o_orderpriority,
        CAST(floor(o_totalprice/50000.0) AS BIGINT) AS price_bucket,
        CAST(row_number() OVER (PARTITION BY o_orderpriority ORDER BY floor(o_totalprice/50000.0) DESC, o_orderkey) AS INTEGER) AS rn,
        CAST(rank() OVER (PARTITION BY o_orderpriority ORDER BY floor(o_totalprice/50000.0) DESC) AS INTEGER) AS rnk,
        CAST(dense_rank() OVER (PARTITION BY o_orderpriority ORDER BY floor(o_totalprice/50000.0) DESC) AS INTEGER) AS drnk,
        CAST(ntile(4) OVER (PARTITION BY o_orderpriority ORDER BY floor(o_totalprice/50000.0) DESC, o_orderkey) AS INTEGER) AS quartile
        FROM orders""".stripMargin)),

    // Q30: lag/lead/first/last — inter-event gap per user (inter-flow gap
    // shape from SURVEY Q30), microsecond-exact integers.
    Q("q30_win_laglead",
      (s, d) => {
        val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
        val wf = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          lag(col("event_id"), 1).over(w).as("prev_id"),
          lead(col("event_id"), 1).over(w).as("next_id"),
          (unix_micros(col("ts")) - unix_micros(lag(col("ts"), 1).over(w))).as("gap_us"),
          first(col("event_id")).over(wf).as("first_id"),
          last(col("event_id")).over(wf).as("last_id"))
      },
      Some("""SELECT event_id, user_id,
        lag(event_id, 1) OVER w AS prev_id,
        lead(event_id, 1) OVER w AS next_id,
        epoch_us(ts) - epoch_us(lag(ts, 1) OVER w) AS gap_us,
        first_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_id,
        last_value(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_id
        FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // Q31: frame specs — running sum (ROWS) + 5-minute trailing window
    // (RANGE on epoch micros), exact cents.
    Q("q31_win_frames",
      (s, d) => {
        val v = cents(col("value"))
        val wRows = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        val wRange = Window.partitionBy(col("user_id"))
          .orderBy(unix_micros(col("ts")))
          .rangeBetween(-300000000L, 0L)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          money(sum(v).over(wRows)).as("running_value"),
          money(sum(v).over(wRange)).as("trail5m_value"),
          count(lit(1)).over(wRange).as("trail5m_n"))
      },
      Some("""SELECT event_id, user_id,
        CAST(sum(v) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)/100.0 AS running_value,
        CAST(sum(v) OVER wr AS DOUBLE)/100.0 AS trail5m_value,
        count(*) OVER wr AS trail5m_n
        FROM (SELECT event_id, user_id, ts, CAST(round(value*100) AS BIGINT) AS v, epoch_us(ts) AS tus FROM events)
        WINDOW wr AS (PARTITION BY user_id ORDER BY tus RANGE BETWEEN 300000000 PRECEDING AND CURRENT ROW)""".stripMargin)),

    // Q31b: positional window values — first/last/nth over an explicit
    // frame. last_value needs the full-partition frame spelled out (the
    // default frame ends at CURRENT ROW, silently yielding the running
    // last); identical frame text on both engines.
    Q("q31b_win_positional",
      (s, d) => {
        val w = Window.partitionBy(col("user_id"))
          .orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
        Tables.events(s, d).select(
          col("event_id"), col("user_id"),
          first(col("event_id")).over(w).as("first_event"),
          last(col("event_id")).over(w).as("last_event"),
          nth_value(col("event_id"), 2).over(w).as("second_event"))
      },
      Some("""SELECT event_id, user_id,
        first_value(event_id) OVER w AS first_event,
        last_value(event_id) OVER w AS last_event,
        nth_value(event_id, 2) OVER w AS second_event
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)),

    // Q32: top-N per group (top ports per host shape).
    Q("q32_win_topn",
      (s, d) => {
        val joined = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
        val w = Window.partitionBy(col("c_mktsegment"))
          .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        joined.withColumn("rn", row_number().over(w))
          .filter(col("rn") <= 3)
          .select("c_mktsegment", "rn", "o_orderkey", "o_totalprice")
      },
      Some("""SELECT c_mktsegment, CAST(rn AS INTEGER) AS rn, o_orderkey, o_totalprice FROM (
        SELECT c_mktsegment, o_orderkey, o_totalprice,
          row_number() OVER (PARTITION BY c_mktsegment ORDER BY o_totalprice DESC, o_orderkey) AS rn
        FROM orders JOIN customer ON o_custkey = c_custkey) WHERE rn <= 3""".stripMargin)),

    // Q32b: top-N per group via the bounded-heap aggregator — the SCALE
    // path beside q32's window formulation. Map-side partial aggregation
    // ships ≤ k entries per group per task instead of sorting every row of
    // the group through the shuffle ([[graft.functions.Aggregators.TopKAgg]]).
    // Top-3 customers by order spend per nation, exploded back to rows;
    // integer cents + (spend DESC, custkey ASC) total order ⇒ exact.
    Q("q32b_topk_agg",
      (s, d) => {
        val spend = Tables.orders(s, d)
          .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
          .groupBy(col("c_nationkey"), col("c_custkey"))
          .agg(sum(cents(col("o_totalprice"))).as("spend_cents"))
        spend.groupBy("c_nationkey")
          .agg(graft.functions.Aggregators.top_k(3)(
            col("spend_cents"), col("c_custkey")).as("top"))
          .select(col("c_nationkey"), posexplode(col("top")))
          .select(col("c_nationkey"),
            (col("pos") + 1).cast(IntegerType).as("rnk"),
            col("col.id").as("c_custkey"),
            col("col.metric").as("spend_cents"))
      },
      Some("""SELECT c_nationkey, CAST(rnk AS INTEGER) AS rnk, c_custkey, spend_cents FROM (
        SELECT c_nationkey, c_custkey, spend_cents,
          row_number() OVER (PARTITION BY c_nationkey ORDER BY spend_cents DESC, c_custkey) AS rnk
        FROM (SELECT c_nationkey, c_custkey, CAST(SUM(round(o_totalprice * 100)) AS BIGINT) AS spend_cents
              FROM orders JOIN customer ON o_custkey = c_custkey
              GROUP BY c_nationkey, c_custkey)) WHERE rnk <= 3""".stripMargin)),

    // ------------------------------------------- sort / limit / set ops
    // Q33: multi-key sort with null ordering (driver hash is order-
    // insensitive; sortedness itself is asserted in SortSpec).
    Q("q33_sort_multi",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_orderstatus").asc, col("o_totalprice").desc_nulls_last, col("o_orderkey").asc)
        .select("o_orderkey", "o_orderstatus", "o_totalprice"),
      Some("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders ORDER BY o_orderstatus ASC, o_totalprice DESC NULLS LAST, o_orderkey ASC")),

    // Q33b: null ordering with real nulls (o_orderstatus='O' → null price),
    // nulls-last under DESC on both engines; driver hashing is order-
    // insensitive so the null placement is exercised via the rank column.
    // (The unpartitioned window is a single-reducer total-order rank —
    // inherent to the audit it demonstrates; at scale use partitioned
    // ranks (q29/q32) or TakeOrderedAndProject (q34) instead.)
    Q("q33b_sort_nulls",
      (s, d) => {
        val priced = Tables.orders(s, d)
          .select(col("o_orderkey"),
            when(col("o_orderstatus") === "O", lit(null).cast(DoubleType))
              .otherwise(col("o_totalprice")).as("maybe_price"))
        import org.apache.spark.sql.expressions.Window
        priced.select(col("o_orderkey"), col("maybe_price"),
          row_number().over(Window.orderBy(
            col("maybe_price").desc_nulls_last, col("o_orderkey"))).as("rk"))
          .filter(col("rk") <= 20 || col("maybe_price").isNull)
      },
      Some("""SELECT o_orderkey, maybe_price, CAST(rk AS INTEGER) AS rk FROM (
        SELECT o_orderkey, maybe_price,
          row_number() OVER (ORDER BY maybe_price DESC NULLS LAST, o_orderkey) AS rk
        FROM (SELECT o_orderkey, CASE WHEN o_orderstatus = 'O' THEN NULL ELSE o_totalprice END AS maybe_price FROM orders))
        WHERE rk <= 20 OR maybe_price IS NULL""".stripMargin)),

    // Q34: top-k (TakeOrderedAndProject — no global sort of the full table)
    // with unique tiebreak for a total order.
    Q("q34_limit_topk",
      (s, d) => Tables.orders(s, d)
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select("o_orderkey", "o_totalprice"),
      Some("SELECT o_orderkey, o_totalprice FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10"),
      headline = true),

    // Q35: union all + union distinct.
    Q("q35_union",
      (s, d) => {
        val a = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        val b = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
        a.unionByName(b).groupBy("nk").agg(count(lit(1)).as("n_all"))
          .join(a.unionByName(b).distinct().withColumn("dist", lit(1)), Seq("nk"))
          .select("nk", "n_all", "dist")
      },
      Some("""SELECT u.nk, count(*) AS n_all, 1 AS dist FROM
        (SELECT c_nationkey AS nk FROM customer UNION ALL SELECT s_nationkey FROM supplier) u
        GROUP BY u.nk""".stripMargin)),

    // Q36: intersect / except (+ _all variants via multiset counts).
    Q("q36_intersect_except",
      (s, d) => {
        val c = Tables.customer(s, d).select(col("c_nationkey").as("nk"))
        val sp = Tables.supplier(s, d).select(col("s_nationkey").as("nk"))
        c.intersect(sp).withColumn("op", lit("intersect"))
          .unionByName(c.except(sp).withColumn("op", lit("except")))
          .unionByName(sp.exceptAll(c).distinct().withColumn("op", lit("except_all_supp")))
          .select("op", "nk")
      },
      Some("""SELECT 'intersect' AS op, nk FROM (SELECT c_nationkey AS nk FROM customer INTERSECT SELECT s_nationkey FROM supplier)
        UNION ALL SELECT 'except' AS op, nk FROM (SELECT c_nationkey AS nk FROM customer EXCEPT SELECT s_nationkey FROM supplier)
        UNION ALL SELECT 'except_all_supp' AS op, nk FROM (SELECT DISTINCT nk FROM (SELECT s_nationkey AS nk FROM supplier EXCEPT ALL SELECT c_nationkey FROM customer))""".stripMargin)),

    // Q37: distinct on a projection (deterministic, unlike bare
    // dropDuplicates row choice; subset-dedup with a deterministic
    // representative lives in ext.DedupQueries).
    Q("q37_distinct",
      (s, d) => Tables.orders(s, d)
        .select("o_custkey", "o_orderstatus").distinct(),
      Some("SELECT DISTINCT o_custkey, o_orderstatus FROM orders"))
  )
}
