package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.{Q, Tables}
import graft.functions.{Aggregators, IpFunctions}

/** Flows-domain queries over a deterministic synthesized flow table with the
  * reference's 23-column schema (SURVEY §1.3, `main.go:45-77` /
  * `create_tables.sql:3-33`), plus the UDF / UDAF / UDTF surface Q54–Q56.
  *
  * The driver fixtures carry no flows table, so one is derived from `events`
  * with pure integer arithmetic — expressed identically in the Spark DSL and
  * in the DuckDB oracle CTE, so every query below is exact-oracle-checkable.
  * The IP-address columns are the interesting part: the Spark side renders
  * them through the R3-parity UDF chain (`longToIpBytes` →
  * `bytesToIpString`, the reference's `net.IP(...).String()` at
  * `main.go:133-139`), while the oracle renders them with independent
  * octet arithmetic — so the UDFs themselves are under oracle test.
  */
object FlowQueries {

  /** Synthesized flows: one flow per event, all columns deterministic
    * integer arithmetic over (event_id, user_id, ts, value).
    *
    * Address rendering defaults to the codegen-native
    * [[graft.functions.IpRender]]/[[graft.functions.IpToBytes]] chain (one
    * WholeStageCodegen span); `udfRender = true` switches to the Scala-UDF
    * chain — q54's declared UDF surface, under the same oracle.
    */
  def flows(s: SparkSession, d: String, udfRender: Boolean = false,
      fan: Boolean = true): DataFrame = {
    val render: Column => Column =
      if (udfRender) c => IpFunctions.bytesToIpString(IpFunctions.longToIpBytes(c))
      else c => IpFunctions.ip_render(IpFunctions.ip_to_bytes(c))
    // conditional fan-out BEFORE the render projection (r18, guide §2.5):
    // the one-split events fixture otherwise runs the IP-render kernels
    // and every downstream pre-shuffle map (edge partial aggs, filters,
    // LPM probes) in a single task for the kernel-heavy flows consumers;
    // identity at production split counts. The exchange carries the raw
    // 6-column events rows, never the rendered strings.
    //
    // PER-CONSUMER, not blanket (r19, VERDICT r18 #1): a light
    // groupBy-sum over the fixture doesn't have enough pre-shuffle kernel
    // work to amortize the added exchange — the driver's cold bench showed
    // qf1 0.60→0.86 s, qf2 0.58→0.76, qf4 0.43→0.69, q54c 0.22→0.30 under
    // the r18 blanket fan-out while the heavies (qf6 3.16×, q22/q23
    // 1.6–1.7×, q27c, qf11) won. Consumers whose per-row kernel chain IS
    // the cost (percentile maps, explodes, the salted-join pair build,
    // LPM probes, the NDJSON write) keep `fan = true`; the single-stage
    // aggregates pass `fan = false` and keep their one-exchange plans.
    val ev0 = Tables.events(s, d)
    val ev = if (fan) Tables.fanOut(ev0, col("event_id")) else ev0
    val eid = col("event_id")
    val uid = col("user_id")
    val srcIp = lit(167772160L) + pmod(uid * 7919L, lit(200L)) * 65536L +
      pmod(eid * 31L, lit(250L)) * 256L + pmod(eid * 17L, lit(250L))
    val dstIp = lit(3232235520L) + pmod(eid * 13L, lit(250L)) * 256L +
      pmod(eid * 7L, lit(254L)) + 1L
    ev.select(
      (pmod(eid, lit(4L)) + 1L).cast(IntegerType).as("type"),
      (unix_micros(col("ts")) / 1000000L).cast(LongType).as("time_received"),
      eid.as("sequence_num"),
      lit(1000L).as("sampling_rate"),
      pmod(eid, lit(2L)).cast(IntegerType).as("flow_direction"),
      render(srcIp).as("src_addr"),
      render(dstIp).as("dst_addr"),
      (round(col("value") * 100).cast(LongType) + 40L).as("bytes"),
      (pmod(eid, lit(100L)) + 1L).as("packets"),
      lit(2048).as("etype"),
      when(pmod(eid, lit(10L)) < 6, 6).when(pmod(eid, lit(10L)) < 9, 17)
        .otherwise(1).cast(IntegerType).as("proto"),
      (lit(1024L) + pmod(uid * 7919L, lit(60000L))).cast(IntegerType).as("src_port"),
      when(pmod(eid, lit(3L)) === 0, 443).when(pmod(eid, lit(3L)) === 1, 80)
        .otherwise(53).cast(IntegerType).as("dst_port"),
      pmod(eid * 5L, lit(64L)).cast(IntegerType).as("tcp_flags"),
      col("value"))
  }

  /** DuckDB CTE computing the same flows table with independent arithmetic
    * (notably: IP strings via octet math, not the Spark UDF).
    */
  private val FlowsCte: String =
    """WITH flows AS (SELECT
      CAST(event_id % 4 + 1 AS INTEGER) AS type,
      epoch_us(ts) // 1000000 AS time_received,
      event_id AS sequence_num,
      CAST(1000 AS BIGINT) AS sampling_rate,
      CAST(event_id % 2 AS INTEGER) AS flow_direction,
      CAST(src_ip // 16777216 AS VARCHAR) || '.' || CAST((src_ip // 65536) % 256 AS VARCHAR) || '.' || CAST((src_ip // 256) % 256 AS VARCHAR) || '.' || CAST(src_ip % 256 AS VARCHAR) AS src_addr,
      CAST(dst_ip // 16777216 AS VARCHAR) || '.' || CAST((dst_ip // 65536) % 256 AS VARCHAR) || '.' || CAST((dst_ip // 256) % 256 AS VARCHAR) || '.' || CAST(dst_ip % 256 AS VARCHAR) AS dst_addr,
      CAST(round(value*100) AS BIGINT) + 40 AS bytes,
      event_id % 100 + 1 AS packets,
      CAST(2048 AS INTEGER) AS etype,
      CAST(CASE WHEN event_id % 10 < 6 THEN 6 WHEN event_id % 10 < 9 THEN 17 ELSE 1 END AS INTEGER) AS proto,
      CAST(1024 + (user_id * 7919) % 60000 AS INTEGER) AS src_port,
      CAST(CASE event_id % 3 WHEN 0 THEN 443 WHEN 1 THEN 80 ELSE 53 END AS INTEGER) AS dst_port,
      CAST((event_id * 5) % 64 AS INTEGER) AS tcp_flags,
      src_ip, dst_ip, value
    FROM (SELECT *,
      167772160 + ((user_id * 7919) % 200) * 65536 + ((event_id * 31) % 250) * 256 + ((event_id * 17) % 250) AS src_ip,
      3232235520 + ((event_id * 13) % 250) * 256 + ((event_id * 7) % 254) + 1 AS dst_ip
    FROM events))"""

  /** qf13's fixed-point-integer rank unit: nano-ranks, 1e9 per unit of
    * probability mass (see the qf13 registration comment for the
    * exactness argument). Single-scan discipline (r16, VERDICT r15 #2):
    * [[buildGraph]] below runs the flows scan exactly once (every flow
    * contributes an edge, so {u} ∪ {v} ≡ {src} ∪ {dst} and nodes derive
    * from the checkpointed edges); previously each round's eager
    * checkpoint of `r` re-ran the scan + edge build (3× at the unrolled
    * depth, 10–20× at convergence depth). The per-round checkpoint of `r`
    * stays: r feeds TWO consumers next round (contrib + dangle), so
    * without it each iteration embeds the previous round's plan twice —
    * 2^iters plan copies by round 3.
    */
  private val RankScale = 1000000000L

  /** The checkpointed flow graph both PageRank modes iterate over — ONE
    * definition so the single-scan discipline cannot drift between them
    * (r16 review). Building it runs the flows scan exactly once (edges is
    * the scan's only consumer; outW/nodes derive from the checkpointed
    * edges). `release()` frees the graph's pinned RDD blocks once a mode
    * has materialized its answer — the bpeTrain hygiene; without it every
    * invocation leaks three graph-sized block sets for the session's
    * lifetime.
    */
  private final case class FlowGraph(edges: DataFrame, outW: DataFrame,
      nodes: DataFrame, nCnt: DataFrame) {
    def release(): Unit =
      Seq(edges, outW, nodes).foreach(releaseBacking)
  }

  /** Unpersist a checkpoint-rooted frame's backing RDD blocks. Callers
    * must pass frames whose analyzed plan IS their own checkpoint (the
    * pageRankStep outputs and the graph members) — a derived frame would
    * surrender its PARENT's blocks.
    */
  private def releaseBacking(df: DataFrame): Unit =
    org.apache.spark.sql.graftshim.Shim.backingRdds(df)
      .foreach(_.unpersist(blocking = false))

  private def buildGraph(f: DataFrame): FlowGraph = {
    // NOT checkpoint-co-partitioned on the iteration key (r19 measured:
    // pinning edges/outW/nodes hash-partitioned + sorted on u/addr to
    // make the per-round joins exchange-free REGRESSED qf13 3.97→4.72 s
    // at bench scale — the graph frames are small enough that the extra
    // build-time exchange + three sorts cost more than the per-round
    // exchanges they remove; revisit only if the per-round join ever
    // dominates a profile at real scale)
    val sc = f.sparkSession.sparkContext
    sc.setJobDescription("pagerank: edges build") // §1.5 job labels
    val edges = f.groupBy(col("src_addr").as("u"), col("dst_addr").as("v"))
      .agg(count(lit(1)).as("w")).localCheckpoint()
    sc.setJobDescription("pagerank: out-weights")
    val outW = edges.groupBy(col("u")).agg(sum(col("w")).as("wu"))
      .localCheckpoint()
    sc.setJobDescription("pagerank: nodes")
    val nodes = edges.select(col("u").as("addr"))
      .union(edges.select(col("v").as("addr"))).distinct()
      .localCheckpoint()
    sc.setJobDescription(null)
    FlowGraph(edges, outW, nodes, nodes.agg(count(lit(1)).as("n")))
  }

  private def initRanks(g: FlowGraph): DataFrame =
    g.nodes.crossJoin(broadcast(g.nCnt))
      .select(col("addr"), expr(s"${RankScale}L div n").as("r"))
      .localCheckpoint()

  private[graft] def pageRank(f: DataFrame, iters: Int): DataFrame = {
    val g = buildGraph(f)
    val sc = f.sparkSession.sparkContext
    try {
      var r = initRanks(g)
      for (i <- 1 to iters) {
        sc.setJobDescription(s"pagerank: round $i")
        val next = pageRankStep(r, g)
        releaseBacking(r) // next is eager — the previous round's blocks can go
        r = next
      }
      sc.setJobDescription(null)
      r
    } finally g.release()
  }

  /** Release a ranks frame returned by [[pageRank]] /
    * [[pageRankFixedPoint]] once the caller has materialized its answer
    * (ADVICE r16: the per-round release work freed the graph and
    * intermediate rounds, but the RETURNED frame's node-sized block set
    * was never freed by any caller — one leaked set per invocation for
    * the session's lifetime).
    */
  private[graft] def releaseRanks(r: DataFrame): Unit = releaseBacking(r)

  /** The qf13 serving shape: run the unrolled iteration, TakeOrdered the
    * top-k (k-row result), eagerly pin THAT, and release the node-sized
    * ranks — the bpeTrain hygiene applied to this family's caller side.
    */
  private[graft] def pageRankTopK(f: DataFrame, iters: Int,
      k: Int): DataFrame = {
    val r = pageRank(f, iters)
    val top = r.orderBy(col("r").desc, col("addr")).limit(k)
      .select(col("addr"), col("r").as("rank_nano"))
      .localCheckpoint() // eager; ≤ k rows, so the pinned set is trivial
    releaseBacking(r)
    top
  }

  /** One PageRank round: contributions shuffled per dst with map-side
    * combine, dangling mass as a 1-row broadcast certificate, eager
    * lineage truncation on the result (node-sized).
    */
  private def pageRankStep(r: DataFrame, g: FlowGraph): DataFrame = {
    val contrib = g.edges.join(g.outW, Seq("u"))
      .join(r.select(col("addr").as("u"), col("r").as("ru")), Seq("u"))
      .select(col("v").as("addr"),
        expr("ru * 85 * w div (100 * wu)").as("c"))
      .groupBy(col("addr")).agg(sum(col("c")).as("cin"))
    val dangle = r.join(g.outW.select(col("u").as("addr")), Seq("addr"), "left_anti")
      .agg(coalesce(sum(col("r")), lit(0L)).as("dg"))
    g.nodes.crossJoin(broadcast(g.nCnt)).crossJoin(broadcast(dangle))
      .join(contrib, Seq("addr"), "left")
      .select(col("addr"),
        (expr(s"${RankScale * 15}L div (100 * n)") +
          expr("(dg * 85) div (100 * n)") +
          coalesce(col("cin"), lit(0L))).as("r"))
      .localCheckpoint()
  }

  /** Detected-fixed-point PageRank (the x2d fixed-point device, r16):
    * iterate until the max |nano-rank delta| between consecutive rounds is
    * ZERO — integer arithmetic makes exact convergence well-defined (no
    * float epsilon), and the `maxIters` cap bounds the loop if the
    * integer map ever settled into a >1-cycle instead of a fixed point.
    * Returns (ranks, iterations-run). The unrolled-3 qf13 registration
    * keeps the oracle finite; this is the mode a real deployment runs.
    */
  /** Quantization limit cycles (r17, VERDICT r16 #5): on larger graphs
    * the integer map need not reach an EXACT fixed point — the 0.85
    * contraction drives the delta down ~15%/round until it hits the
    * truncation-noise floor of the `div` arithmetic, where it oscillates
    * forever (measured on the 30× graph: 12317, 6056, …, 62, then 67 ± 5
    * every round — 0.067 ppm of the 1e9 total mass). `stallRounds > 0`
    * detects that floor: stop when the delta has failed to improve on
    * its best for that many consecutive rounds. Returns (ranks,
    * iterations-run, final max delta) — the caller reads the delta to
    * judge the floor (0 = exact fixed point); the default stallRounds 0
    * preserves the exact-only semantics PageRankSpec pins on the
    * sf0.001 graph, where the map genuinely reaches delta 0.
    */
  private[graft] def pageRankFixedPoint(f: DataFrame,
      maxIters: Int = 50, stallRounds: Int = 0): (DataFrame, Int, Long) = {
    val g = buildGraph(f)
    try {
      var r = initRanks(g)
      var it = 0
      var lastDelta = Long.MaxValue
      var bestDelta = Long.MaxValue
      var stall = 0
      var converged = false
      while (!converged && it < maxIters) {
        val next = pageRankStep(r, g)
        val delta = next.join(r.withColumnRenamed("r", "rp"), Seq("addr"))
          .agg(max(abs(col("r") - col("rp"))).as("d")).head().getLong(0)
        if (delta < bestDelta) { bestDelta = delta; stall = 0 }
        else stall += 1
        converged = delta == 0L || (stallRounds > 0 && stall >= stallRounds)
        lastDelta = delta
        releaseBacking(r) // the delta action above was r's last consumer
        r = next
        it += 1
      }
      (r, it, lastDelta)
    } finally g.release()
  }

  def defs: Seq[Q] = Seq(
    // Q54: the R3 projection UDF chain under oracle test — every rendered
    // address string must equal the oracle's independent octet arithmetic.
    Q("q54_udf_ip",
      (s, d) => flows(s, d, udfRender = true)
        .select("sequence_num", "src_addr", "dst_addr", "src_port", "dst_port"),
      Some(s"$FlowsCte SELECT sequence_num, src_addr, dst_addr, src_port, dst_port FROM flows")),

    // Q54c: the codegen-NATIVE renderer chain (IpToBytes → IpRender) under
    // the identical oracle — proves UDF path ≡ native path ≡ independent
    // octet arithmetic, and keeps the hot normalize expression oracle-tested
    // in batch as well as through the q45c/d/e ingest paths.
    Q("q54c_native_ip",
      // fan = false (r19): a pure render projection with no downstream
      // shuffle — the fan-out exchange was pure tax (driver: 0.22→0.30 s)
      (s, d) => flows(s, d, fan = false)
        .select("sequence_num", "src_addr", "dst_addr", "src_port", "dst_port"),
      Some(s"$FlowsCte SELECT sequence_num, src_addr, dst_addr, src_port, dst_port FROM flows")),

    // Q54b: the codegen-native CIDR predicate (Catalyst Expression with
    // doGenCode, IpFunctions.IpInCidr) vs the oracle's integer range math.
    Q("q54b_cidr_filter",
      (s, d) => flows(s, d)
        .filter(IpFunctions.ip_in_cidr(col("src_addr"), lit("10.64.0.0/10")))
        .groupBy("proto").agg(count(lit(1)).as("n_flows"),
          sum(col("bytes")).as("sum_bytes")),
      Some(s"""$FlowsCte SELECT proto, count(*) AS n_flows,
        CAST(SUM(bytes) AS BIGINT) AS sum_bytes FROM flows
        WHERE src_ip // 4194304 = 171966464 // 4194304
        GROUP BY proto""".stripMargin)),

    // Q55: typed UDAF surface — BitOrAgg re-aggregates the per-flow OR of
    // tcp_flags (`main.go:71` semantics) per protocol; WeightedAvgAgg is a
    // packets-weighted mean of bytes with exact integer partials.
    Q("q55_udaf_bitor",
      // fan = false (r19): one keyed aggregation with capacity-bounded
      // typed-UDAF partials — no kernel chain to amortize the exchange
      (s, d) => flows(s, d, fan = false).groupBy("proto").agg(
        Aggregators.bit_or_agg(col("tcp_flags").cast(LongType)).as("flags_or"),
        Aggregators.weighted_avg(col("bytes"), col("packets")).as("w_avg_bytes")),
      Some(s"""$FlowsCte SELECT proto, bit_or(CAST(tcp_flags AS BIGINT)) AS flags_or,
        CAST(SUM(bytes*packets) AS DOUBLE) / CAST(SUM(packets) AS DOUBLE) AS w_avg_bytes
        FROM flows GROUP BY proto""".stripMargin)),

    // Q56: generator / UDTF shape — expand each flow into per-packet-bucket
    // rows (sequence + explode is Spark's idiomatic table function).
    Q("q56_gen_explode",
      (s, d) => flows(s, d)
        .select(col("sequence_num"),
          explode(sequence(lit(0L), pmod(col("packets"), lit(4L)))).as("bucket"))
        .groupBy("bucket").agg(count(lit(1)).as("n")),
      Some(s"$FlowsCte SELECT bucket, count(*) AS n FROM (SELECT sequence_num, unnest(generate_series(0, packets % 4)) AS bucket FROM flows) GROUP BY bucket")),

    // goflow2's alternative transport is NDJSON flow records; round-trip
    // the flows table through JSON lines with an explicit read schema
    // (Q3 on the flows shape) — the written files ARE the transport format.
    Q("q03b_flows_ndjson",
      (s, d) => {
        val out = s"${graft.Tmp.root}/flows_ndjson"
        val f = flows(s, d).select("sequence_num", "src_addr", "dst_addr",
          "bytes", "packets", "proto", "dst_port")
        f.write.mode("overwrite").json(out)
        s.read.schema(f.schema).json(out)
      },
      Some(s"$FlowsCte SELECT sequence_num, src_addr, dst_addr, bytes, packets, proto, dst_port FROM flows")),

    // Top talkers — the flows deployment's signature query (SURVEY §3.2):
    // sampling-rate scale-up + hash agg + top-k, exactly the shape the
    // reference's ClickHouse deployment exists to serve.
    Q("qf1_top_talkers",
      // fan = false (r19, VERDICT r18 #1): single groupBy-sum + top-k —
      // the r18 blanket fan-out cost 0.60→0.86 s for nothing
      (s, d) => flows(s, d, fan = false)
        .groupBy("src_addr")
        .agg(sum(col("bytes") * col("sampling_rate")).as("est_bytes"),
          sum(col("packets") * col("sampling_rate")).as("est_packets"),
          count(lit(1)).as("n_flows"))
        .orderBy(col("est_bytes").desc, col("src_addr"))
        .limit(10),
      Some(s"""$FlowsCte SELECT src_addr,
        CAST(SUM(bytes*sampling_rate) AS BIGINT) AS est_bytes,
        CAST(SUM(packets*sampling_rate) AS BIGINT) AS est_packets,
        count(*) AS n_flows FROM flows GROUP BY src_addr
        ORDER BY est_bytes DESC, src_addr LIMIT 10""".stripMargin),
      headline = true),

    // Traffic matrix with time bucketing: per (proto, dst_port, hour).
    // Hour buckets, not minutes (VERDICT r17 #2: at sf0.01 no minute
    // bucket exceeded 2 flows, so the HAVING made the row empty since r10
    // and the oracle asserted nothing; hour buckets give ~1.3k discrimin-
    // ating rows through the same grouped-HAVING plan). At 100 TB the
    // bucket width only changes group cardinality, never the plan shape:
    // one keyed shuffle with map-side partial aggregation either way.
    Q("qf2_traffic_matrix",
      // fan = false (r19, VERDICT r18 #1): one keyed shuffle with
      // map-side combine — the exchange bought nothing (0.58→0.76 s)
      (s, d) => flows(s, d, fan = false)
        .groupBy(col("proto"), col("dst_port"),
          ((col("time_received") / 3600L).cast(LongType) * 3600L).as("hour"))
        .agg(sum("bytes").as("sum_bytes"), count(lit(1)).as("n_flows"))
        .filter(col("n_flows") > 2),
      Some(s"""$FlowsCte SELECT proto, dst_port, (time_received // 3600) * 3600 AS hour,
        CAST(SUM(bytes) AS BIGINT) AS sum_bytes, count(*) AS n_flows
        FROM flows GROUP BY 1, 2, 3 HAVING count(*) > 2""".stripMargin)),

    // Port-scan detection: sources touching many distinct destination
    // (addr, port) pairs — count-distinct + HAVING shape.
    // Threshold 3, not the production 50 (VERDICT r17 #2: sf0.01's max
    // fanout is 5, so `> 50` made the row empty since r10 — trivially
    // hash-satisfiable by any wrong plan that also returned nothing; at
    // `> 3` the row emits the 5 widest-fanout sources and discriminates
    // the count-distinct + HAVING machinery). The threshold is pure
    // selectivity — a deployment tunes it without touching the plan.
    Q("qf3_port_scan",
      (s, d) => flows(s, d)
        .groupBy("src_addr")
        .agg(countDistinct(col("dst_addr"), col("dst_port")).as("fanout"),
          countDistinct(col("dst_port")).as("n_ports"))
        .filter(col("fanout") > 3),
      Some(s"""$FlowsCte SELECT src_addr,
        count(DISTINCT (dst_addr, dst_port)) AS fanout,
        count(DISTINCT dst_port) AS n_ports
        FROM flows GROUP BY src_addr HAVING count(DISTINCT (dst_addr, dst_port)) > 3""".stripMargin)),

    // TCP-flag analysis: SYN-without-ACK flows per source (tcp_flags is the
    // OR of flags over the flow, `main.go:71`; SYN=0x02, ACK=0x10).
    Q("qf4_syn_no_ack",
      // fan = false (r19, VERDICT r18 #1): filter + one keyed count —
      // single-stage shape (0.43→0.69 s under the blanket fan-out)
      (s, d) => flows(s, d, fan = false)
        .filter(col("proto") === 6 &&
          col("tcp_flags").bitwiseAND(2) =!= 0 &&
          col("tcp_flags").bitwiseAND(16) === 0)
        .groupBy("src_addr").agg(count(lit(1)).as("n_syn_only"))
        .filter(col("n_syn_only") >= 2),
      Some(s"""$FlowsCte SELECT src_addr, count(*) AS n_syn_only FROM flows
        WHERE proto = 6 AND (tcp_flags & 2) <> 0 AND (tcp_flags & 16) = 0
        GROUP BY src_addr HAVING count(*) >= 2""".stripMargin)),

    // QF9 (r15): k-anonymity audit — the privacy gate a flow archive runs
    // before sharing/retention (Sweeney 2002, k-anonymity). Records are
    // generalized to the quasi-identifier (src /24, dst /24, proto,
    // dst_port); a record is k-exposed when its QI equivalence class
    // holds fewer than k rows. Emits the audit card for k ∈ {2, 5, 10}:
    // class count, violating classes, and rows exposed at that k.
    //
    // Scale posture: ONE keyed shuffle builds the class frame (map-side
    // combine on the generalized tuple); the threshold sweep then runs
    // over the class frame — QI-cardinality, orders of magnitude smaller
    // than the flow table — so the 3× explode is on the small side.
    Q("qf9_k_anonymity",
      (s, d) => flows(s, d)
        .select(
          substring_index(col("src_addr"), ".", 3).as("src24"),
          substring_index(col("dst_addr"), ".", 3).as("dst24"),
          col("proto"), col("dst_port"))
        .groupBy("src24", "dst24", "proto", "dst_port")
        .agg(count(lit(1)).as("k"))
        .select(explode(array(lit(2L), lit(5L), lit(10L))).as("k_threshold"),
          col("k"))
        .groupBy("k_threshold")
        .agg(count(lit(1)).as("n_classes"),
          sum(when(col("k") < col("k_threshold"), 1L).otherwise(0L))
            .as("n_small_classes"),
          sum(when(col("k") < col("k_threshold"), col("k")).otherwise(0L))
            .as("n_exposed_rows")),
      Some(s"""$FlowsCte,
        cls AS (SELECT array_to_string(string_split(src_addr, '.')[1:3], '.') AS src24,
            array_to_string(string_split(dst_addr, '.')[1:3], '.') AS dst24,
            proto, dst_port, count(*) AS k
          FROM flows GROUP BY 1, 2, 3, 4)
        SELECT CAST(t.k_threshold AS BIGINT) AS k_threshold, count(*) AS n_classes,
          CAST(SUM(CASE WHEN k < t.k_threshold THEN 1 ELSE 0 END) AS BIGINT) AS n_small_classes,
          CAST(SUM(CASE WHEN k < t.k_threshold THEN k ELSE 0 END) AS BIGINT) AS n_exposed_rows
        FROM cls, (VALUES (2), (5), (10)) AS t(k_threshold) GROUP BY 1""".stripMargin)),

    // QF10 (r15): destination fan-in + source entropy — the DDoS /
    // amplification lens (complement of qf3's source fan-OUT): for each
    // destination, how many distinct sources hit it and how CONCENTRATED
    // the per-source flow distribution is. Low entropy + high fan-in =
    // a few sources hammering (amplification); high entropy + high
    // fan-in = broad botnet. Entropy in exact integer-derived form:
    // H = log2(S) − Σ c·log2(c) / S over per-source flow counts c —
    // both engines compute the identical expression, compared at e4.
    // The Σ term sums doubles under engine-specific partial-agg order
    // (ADVICE r15); the e4 verdict is still deterministic because the
    // reordering error is bounded ≲ n²·ε·max|c·log2 c| ≈ 1e-9 at the
    // fixture's per-dst source counts, orders of magnitude inside the
    // 0.5e-4 rounding half-ulp — the quantitative argument lives at
    // x4u's registration (TextQueries), which shares the device.
    //
    // Scale posture: two-level aggregation — (dst, src) partial counts
    // shuffle once with map-side combine, then re-key by dst (the
    // classic fan-in shape that never materializes per-flow rows twice);
    // top-15 via TakeOrdered, not a global sort.
    Q("qf10_dst_fanin",
      (s, d) => flows(s, d)
        .groupBy("dst_addr", "src_addr").agg(count(lit(1)).as("c"))
        .groupBy("dst_addr")
        .agg(count(lit(1)).as("n_srcs"),
          sum(col("c")).as("n_flows"),
          (log2(sum(col("c")).cast(DoubleType)) -
            sum(col("c").cast(DoubleType) * log2(col("c").cast(DoubleType))) /
              sum(col("c")).cast(DoubleType)).as("h"))
        .select(col("dst_addr"), col("n_srcs"), col("n_flows"),
          round(col("h") * 10000).cast(LongType).as("src_entropy_e4"))
        .orderBy(col("n_srcs").desc, col("dst_addr"))
        .limit(15),
      Some(s"""$FlowsCte,
        ps AS (SELECT dst_addr, src_addr, count(*) AS c FROM flows GROUP BY 1, 2),
        agg AS (SELECT dst_addr, count(*) AS n_srcs, CAST(SUM(c) AS BIGINT) AS n_flows,
            log2(CAST(SUM(c) AS DOUBLE)) -
              SUM(CAST(c AS DOUBLE) * log2(CAST(c AS DOUBLE))) / CAST(SUM(c) AS DOUBLE) AS h
          FROM ps GROUP BY 1)
        SELECT dst_addr, n_srcs, n_flows,
          CAST(round(h * 10000) AS BIGINT) AS src_entropy_e4
        FROM agg ORDER BY n_srcs DESC, dst_addr LIMIT 15""".stripMargin)),

    // QF11 (r15): windowFunnel — ClickHouse's signature parametric
    // aggregate (`windowFunnel(window)(ts, cond1, cond2, ...)`), part of
    // the query surface a reference deployment actually runs, rebuilt
    // Spark-first as a COMPOSITION over the native as-of operator: per
    // funnel anchor (a 'view' event) the earliest 'click' at-or-after it
    // within the window is ONE forward+tolerance as-of join (q18e/q18f
    // machinery), the earliest 'purchase' after that click is a second,
    // and the per-user level is a distinct-user max over anchors.
    // Greedy-earliest is complete: if ANY chain (b', c') exists for an
    // anchor, the earliest b also admits c' (tb ≤ tb' ⇒ c' ∈ [tb, ta+W]),
    // so taking min at each step never loses a level. Semantics declared:
    // non-strict ordering (t_next ≥ t_prev), window anchored at cond1
    // (t_k − t_1 ≤ W), level 0 for users with no anchor — matching
    // ClickHouse's default (non-strict) mode. Time is integer µs on both
    // engines so the window bound has no ns-vs-µs truncation edge.
    //
    // 100 TB posture: two sort-merge as-of passes (each one streamed
    // pass per sorted side — the operator's whole point vs the
    // pair-exploding range join) + user-keyed distinct/max aggregations.
    Q("qf11_window_funnel",
      (s, d) => {
        // 6 h: the window that separates the fixture's levels (7 days put
        // every user at level 3 — correct but a degenerate hash fixture)
        val W = 6L * 3600 * 1000000L
        val ev = Tables.events(s, d).select(col("user_id"),
          col("event_type"), unix_micros(col("ts")).as("t"), col("event_id"))
        def step(tpe: String, u: String, t: String, id: String) =
          ev.filter(col("event_type") === tpe)
            .select(col("user_id").as(u), col("t").as(t), col("event_id").as(id))
        val a = step("view", "u", "ta", "aid")
        val ab = graft.plans.AsOf.join(a, step("click", "bu", "tb", "bid"),
          "u", "bu", "ta", "tb", "bid", direction = "forward", tolerance = W)
        val abc = graft.plans.AsOf.join(ab, step("purchase", "cu", "tc", "cid"),
          "u", "cu", "tb", "tc", "cid",
          direction = "forward", tolerance = W)
        val l3 = abc.where(col("tc") - col("ta") <= W)
          .select(col("u")).distinct().withColumn("l3", lit(1))
        val l2 = ab.select(col("u")).distinct().withColumn("l2", lit(1))
        val l1 = a.select(col("u")).distinct().withColumn("l1", lit(1))
        ev.select(col("user_id")).distinct()
          .join(l1.withColumnRenamed("u", "user_id"), Seq("user_id"), "left")
          .join(l2.withColumnRenamed("u", "user_id"), Seq("user_id"), "left")
          .join(l3.withColumnRenamed("u", "user_id"), Seq("user_id"), "left")
          .select(col("user_id"),
            when(col("l3").isNotNull, 3).when(col("l2").isNotNull, 2)
              .when(col("l1").isNotNull, 1).otherwise(0).as("level"))
      },
      Some("""WITH ev AS (SELECT user_id, event_type, epoch_us(ts) AS t FROM events),
        u AS (SELECT DISTINCT user_id FROM ev),
        a AS (SELECT user_id, t AS ta FROM ev WHERE event_type = 'view'),
        ab AS (SELECT a.user_id, a.ta,
            (SELECT min(b.t) FROM ev b WHERE b.user_id = a.user_id AND b.event_type = 'click'
               AND b.t >= a.ta AND b.t - a.ta <= 21600000000) AS tb FROM a),
        l3 AS (SELECT DISTINCT user_id FROM ab WHERE tb IS NOT NULL AND EXISTS (
            SELECT 1 FROM ev c WHERE c.user_id = ab.user_id AND c.event_type = 'purchase'
              AND c.t >= ab.tb AND c.t - ab.ta <= 21600000000)),
        l2 AS (SELECT DISTINCT user_id FROM ab WHERE tb IS NOT NULL),
        l1 AS (SELECT DISTINCT user_id FROM a)
        SELECT u.user_id,
          CASE WHEN l3.user_id IS NOT NULL THEN 3 WHEN l2.user_id IS NOT NULL THEN 2
            WHEN l1.user_id IS NOT NULL THEN 1 ELSE 0 END AS level
        FROM u LEFT JOIN l3 ON u.user_id = l3.user_id
          LEFT JOIN l2 ON u.user_id = l2.user_id
          LEFT JOIN l1 ON u.user_id = l1.user_id""".stripMargin)),

    // QF12 (r15): retention — ClickHouse's other signature parametric
    // aggregate (`retention(cond1, ..., condN)`): r1 = cond1 fired for
    // the user, r_i = r1 AND cond_i; the report is Σr_i — the
    // week-over-week retention curve every activation dashboard serves.
    // Conditions here: activity on SINGLE DAYS 1/10/20/30 of 2024-01
    // (week windows saturate this ~2-events/user/day fixture — every
    // user is active every week, a degenerate hash), integer-µs window
    // bounds on both engines. One user-keyed
    // aggregation with map-side combine, then a 1-row total — the
    // cheapest possible distributed shape (no joins at all).
    Q("qf12_retention",
      (s, d) => {
        val base = 1704067200000000L // 2024-01-01T00:00:00Z in µs
        val day = 86400000000L
        // single DAYS 1/10/20/30 (week windows are saturated on this
        // fixture — every user is active every week, a degenerate hash)
        val days = Seq(0L, 9L, 19L, 29L)
        val t = unix_micros(col("ts"))
        def onDay(k: Int) = max(when(
          t >= base + days(k) * day && t < base + (days(k) + 1) * day, 1)
          .otherwise(0))
        Tables.events(s, d)
          .groupBy(col("user_id"))
          .agg(onDay(0).as("w1"), onDay(1).as("w2"),
            onDay(2).as("w3"), onDay(3).as("w4"))
          .agg(sum(col("w1")).as("n_day1"),
            sum(col("w1") * col("w2")).as("ret_day10"),
            sum(col("w1") * col("w3")).as("ret_day20"),
            sum(col("w1") * col("w4")).as("ret_day30"))
      },
      Some("""WITH per AS (SELECT user_id,
          max(CASE WHEN epoch_us(ts) >= 1704067200000000 AND epoch_us(ts) < 1704153600000000 THEN 1 ELSE 0 END) AS w1,
          max(CASE WHEN epoch_us(ts) >= 1704844800000000 AND epoch_us(ts) < 1704931200000000 THEN 1 ELSE 0 END) AS w2,
          max(CASE WHEN epoch_us(ts) >= 1705708800000000 AND epoch_us(ts) < 1705795200000000 THEN 1 ELSE 0 END) AS w3,
          max(CASE WHEN epoch_us(ts) >= 1706572800000000 AND epoch_us(ts) < 1706659200000000 THEN 1 ELSE 0 END) AS w4
        FROM events GROUP BY user_id)
        SELECT CAST(SUM(w1) AS BIGINT) AS n_day1,
          CAST(SUM(w1 * w2) AS BIGINT) AS ret_day10,
          CAST(SUM(w1 * w3) AS BIGINT) AS ret_day20,
          CAST(SUM(w1 * w4) AS BIGINT) AS ret_day30
        FROM per""".stripMargin)),

    // QF13 (r15): weighted PageRank over the src→dst flow graph — the
    // network-centrality lens (which hosts matter structurally, not just
    // by volume — top-talkers rank bytes, PageRank ranks position), the
    // iterative-graph member beyond x2d/x2f's connected components.
    // Brin & Page 1998 with flow-count edge weights, damping 85/100,
    // THREE unrolled iterations (the x3e unrolled-k-means device), and
    // dangling mass redistributed uniformly each round (this bipartite
    // graph makes dangling handling load-bearing: every dst-only address
    // has no out-edges).
    //
    // Exactness device: FIXED-POINT INTEGER ranks (S = 1e9 nano-rank
    // units; contributions R(u)·85·w(u,v) div (100·W(u)) — max operand
    // ~1e9·85·1e5 ≈ 8.5e15, far under Long range even at 30×). Every
    // operation is integer multiply/div/sum, so iteration order and
    // engine cannot perturb a single unit — no float-summation hazard,
    // no e4 rounding needed; floor losses are deterministic and
    // identical on both engines.
    //
    // 100 TB posture: per iteration ONE keyed shuffle (contributions
    // summed per dst with map-side combine) + a 1-row dangling/teleport
    // certificate crossJoined broadcast; edges/out-weights build ONCE —
    // pageRank checkpoints the graph before the loop (r16, VERDICT r15
    // #2), so the flows scan + edge aggregation run exactly once no
    // matter the iteration depth (PageRankSpec COUNTS executed file
    // scans through a QueryExecutionListener — exactly 1 at depth 1 and
    // at depth 4). A detected-fixed-point mode lives alongside in
    // [[pageRankFixedPoint]] for real (non-oracle-parity) use.
    Q("qf13_pagerank",
      (s, d) => pageRankTopK(flows(s, d), iters = 3, k = 20),
      Some(s"""$FlowsCte,
        edges AS (SELECT src_addr AS u, dst_addr AS v, count(*) AS w FROM flows GROUP BY 1, 2),
        outw AS (SELECT u, CAST(SUM(w) AS BIGINT) AS wu FROM edges GROUP BY 1),
        nodes AS (SELECT DISTINCT addr FROM (SELECT src_addr AS addr FROM flows UNION ALL SELECT dst_addr FROM flows)),
        nc AS (SELECT count(*) AS n FROM nodes),
        r0 AS (SELECT addr, CAST(1000000000 AS BIGINT) // n AS r FROM nodes, nc),
        c1 AS (SELECT v AS addr, CAST(SUM(ru * 85 * w // (100 * wu)) AS BIGINT) AS cin FROM
          (SELECT e.v, r0.r AS ru, e.w, o.wu FROM edges e JOIN outw o ON e.u = o.u JOIN r0 ON r0.addr = e.u) GROUP BY 1),
        d1 AS (SELECT coalesce(SUM(r), 0) AS dg FROM r0 WHERE addr NOT IN (SELECT u FROM outw)),
        r1 AS (SELECT nodes.addr, 15000000000 // (100 * n) + (dg * 85) // (100 * n) + coalesce(cin, 0) AS r
          FROM nodes LEFT JOIN c1 ON c1.addr = nodes.addr CROSS JOIN nc CROSS JOIN d1),
        c2 AS (SELECT v AS addr, CAST(SUM(ru * 85 * w // (100 * wu)) AS BIGINT) AS cin FROM
          (SELECT e.v, r1.r AS ru, e.w, o.wu FROM edges e JOIN outw o ON e.u = o.u JOIN r1 ON r1.addr = e.u) GROUP BY 1),
        d2 AS (SELECT coalesce(SUM(r), 0) AS dg FROM r1 WHERE addr NOT IN (SELECT u FROM outw)),
        r2 AS (SELECT nodes.addr, 15000000000 // (100 * n) + (dg * 85) // (100 * n) + coalesce(cin, 0) AS r
          FROM nodes LEFT JOIN c2 ON c2.addr = nodes.addr CROSS JOIN nc CROSS JOIN d2),
        c3 AS (SELECT v AS addr, CAST(SUM(ru * 85 * w // (100 * wu)) AS BIGINT) AS cin FROM
          (SELECT e.v, r2.r AS ru, e.w, o.wu FROM edges e JOIN outw o ON e.u = o.u JOIN r2 ON r2.addr = e.u) GROUP BY 1),
        d3 AS (SELECT coalesce(SUM(r), 0) AS dg FROM r2 WHERE addr NOT IN (SELECT u FROM outw)),
        r3 AS (SELECT nodes.addr, 15000000000 // (100 * n) + (dg * 85) // (100 * n) + coalesce(cin, 0) AS r
          FROM nodes LEFT JOIN c3 ON c3.addr = nodes.addr CROSS JOIN nc CROSS JOIN d3)
        SELECT addr, CAST(r AS BIGINT) AS rank_nano FROM r3
        ORDER BY r DESC, addr LIMIT 20""".stripMargin)),

    // Skew-handled large×large join (100 TB posture): dst_port has 3 hot
    // keys carrying ~all rows — a plain shuffle join puts each hot key on
    // one reducer. Salting fans each hot key over 16 reducers: the left
    // side gets a deterministic salt, the right side replicates per salt,
    // the join key becomes (port, salt). Result is provably identical to
    // the unsalted join — which is exactly what the oracle checks.
    Q("qf6_salted_join",
      (s, d) => {
        val salts = 16
        val f = flows(s, d).filter(col("proto") === 1) // bounded pair count
        // xxhash64, not a multiplicative residue: proto-1 rows all carry
        // ODD sequence_nums (eid%10=9), and odd·odd mod 16 stays odd — a
        // multiply-mod salt would populate only 8 of the 16 buckets
        // (r9 SkewJoinSpec finding); a mixed hash fans out to all 16
        val left = f.select(col("dst_port"), col("bytes"),
          pmod(xxhash64(col("sequence_num")), lit(salts.toLong)).as("salt"))
        val right = f.select(col("dst_port").as("r_port"), col("packets"))
          .withColumn("salt", explode(sequence(lit(0L), lit(salts - 1L))))
        // SHUFFLE_HASH, not the planner's broadcast pick (r18, guide §3.1
        // + §2.5): the whole point of the salt is the shuffle-join
        // topology — under the auto-chosen broadcast join the probe side
        // inherits the scan's ONE fixture split and the entire pair
        // explosion runs in a single task (profiled: 4.4 s of a 4.6 s
        // wall in one 1-task job at sf0.1 on 32 cores); hashed on
        // (dst_port, salt) the hot ports fan out across reducers exactly
        // as the salting demo intends, and the result set is unchanged.
        left.join(right.hint("shuffle_hash"),
            col("dst_port") === col("r_port") && left("salt") === right("salt"))
          .groupBy("dst_port")
          .agg(count(lit(1)).as("n_pairs"), sum(col("bytes") + col("packets")).as("chk"))
      },
      Some(s"""$FlowsCte SELECT a.dst_port, count(*) AS n_pairs,
        CAST(SUM(a.bytes + b.packets) AS BIGINT) AS chk
        FROM flows a JOIN flows b ON a.dst_port = b.dst_port
        WHERE a.proto = 1 AND b.proto = 1
        GROUP BY a.dst_port""".stripMargin)),

    // Q27b: percentile_approx under its declared tolerance vs the exact
    // percentile (the Q23 self-tolerance pattern: the contract IS the
    // bound, so the oracle row is engine-independent).
    Q("q27b_approx_percentile",
      (s, d) => flows(s, d).groupBy("proto").agg(
        (abs(expr("approx_percentile(bytes, 0.5, 1000)") -
          expr("percentile(bytes, 0.5)")).cast(DoubleType) /
          expr("percentile(bytes, 0.5)").cast(DoubleType) <= 0.05)
          .as("p50_within_5pct")),
      Some(s"$FlowsCte SELECT proto, true AS p50_within_5pct FROM flows GROUP BY proto")),

    // Q27c: EXACT percentile (Spark `percentile` ≡ DuckDB `quantile_cont`,
    // both the (n-1)·p linear-interpolation definition). Exact percentile
    // aggregates a per-value count map, so it is scale-safe only on
    // BOUNDED-cardinality domains (packet/byte counters here); unbounded
    // domains take q27b's sketch. Interpolated doubles compared at
    // round(·1e4) per the float rules.
    Q("q27c_exact_percentile",
      (s, d) => flows(s, d).groupBy("proto").agg(
        round(expr("percentile(bytes, 0.5)") * 10000).cast(LongType).as("p50_e4"),
        round(expr("percentile(bytes, 0.9)") * 10000).cast(LongType).as("p90_e4"),
        round(expr("percentile(bytes, 0.99)") * 10000).cast(LongType).as("p99_e4")),
      Some(s"""$FlowsCte SELECT proto,
        CAST(round(quantile_cont(bytes, 0.5) * 10000) AS BIGINT) AS p50_e4,
        CAST(round(quantile_cont(bytes, 0.9) * 10000) AS BIGINT) AS p90_e4,
        CAST(round(quantile_cont(bytes, 0.99) * 10000) AS BIGINT) AS p99_e4
        FROM flows GROUP BY proto""".stripMargin)),

    // uint64 full-domain parity (SURVEY §1.3 caveat): ClickHouse UInt64
    // counters can exceed Long.MaxValue; DECIMAL(20,0) is the lossless
    // Spark carrier. Demonstrated by scaling bytes beyond the Long domain
    // (value × 2^33 ≈ up to 2^79... kept within DECIMAL(20,0) ≈ 1e20) and
    // aggregating in exact decimal arithmetic.
    Q("qf7_uint64_decimal",
      (s, d) => flows(s, d)
        .select(col("proto"),
          (col("bytes").cast(DecimalType(20, 0)) * lit(8589934592L)).as("big"))
        .groupBy("proto")
        // Rendered as digit strings at the output boundary: the driver's
        // oracle path collapses DuckDB DECIMAL to float64 (lossy above
        // 2^53) while Spark parquet keeps exact Decimal — strings keep
        // both sides exact AND comparable (VERDICT r01).
        .agg(sum(col("big")).cast(DecimalType(38, 0)).cast(StringType)
            .as("sum_big"),
          max(col("big")).cast(DecimalType(20, 0)).cast(StringType)
            .as("max_big")),
      Some(s"""$FlowsCte SELECT proto,
        CAST(CAST(SUM(CAST(bytes AS DECIMAL(20,0)) * 8589934592) AS DECIMAL(38,0)) AS VARCHAR) AS sum_big,
        CAST(CAST(MAX(CAST(bytes AS DECIMAL(20,0)) * 8589934592) AS DECIMAL(20,0)) AS VARCHAR) AS max_big
        FROM flows GROUP BY proto""".stripMargin)),

    // QF8: longest-prefix-match route enrichment — the "most specific
    // route" lookup every flow pipeline runs (GeoIP/BGP attribution).
    // Scale shape: the routing table rides as a LITERAL array and LPM is a
    // pure per-row expression — filter the routes by the codegen
    // `ip_in_cidr` kernel, take the max-(plen) struct — so route
    // attribution is a MAP with zero shuffle and no per-flow window (the
    // join+row_number formulation shuffles every flow by its id). A real
    // deployment broadcasts the table (a full BGP table is ~50 MB) with
    // identical per-row logic.
    Q("qf8_lpm_route",
      (s, d) => {
        val routes = Seq(
          ("10.0.0.0/8", 8, "corp-default"),
          ("10.64.0.0/10", 10, "region-west"),
          ("10.96.0.0/11", 11, "dc-west-2"),
          ("10.100.0.0/14", 14, "pod-a"),
          ("10.100.128.0/17", 17, "rack-17"))
        val routeArr = array(routes.map { case (cidr, plen, site) =>
          struct(lit(plen).as("plen"), lit(site).as("site"), lit(cidr).as("cidr"))
        }: _*)
        flows(s, d).select(col("src_addr"), col("bytes"))
          .withColumn("routes_arr", routeArr)
          .select(col("bytes"),
            expr("""array_max(transform(
                filter(routes_arr, r -> ip_in_cidr(src_addr, r.cidr)),
                r -> struct(r.plen AS plen, r.site AS site)))""").as("m"))
          .select(coalesce(col("m.site"), lit("unassigned")).as("site"), col("bytes"))
          .groupBy("site")
          .agg(count(lit(1)).as("n_flows"), sum(col("bytes")).as("total_bytes"))
      },
      Some(s"""$FlowsCte,
        r(cidr, plen, site, rip) AS (VALUES
          ('10.0.0.0/8', 8, 'corp-default', 167772160),
          ('10.64.0.0/10', 10, 'region-west', 171966464),
          ('10.96.0.0/11', 11, 'dc-west-2', 174063616),
          ('10.100.0.0/14', 14, 'pod-a', 174325760),
          ('10.100.128.0/17', 17, 'rack-17', 174358528)),
        ipn AS (SELECT sequence_num, bytes,
            CAST(o[1] AS BIGINT)*16777216 + CAST(o[2] AS BIGINT)*65536
              + CAST(o[3] AS BIGINT)*256 + CAST(o[4] AS BIGINT) AS ip
          FROM (SELECT sequence_num, bytes, string_split(src_addr, '.') AS o FROM flows)),
        m AS (SELECT sequence_num, any_value(bytes) AS bytes,
            coalesce(arg_max(site, plen), 'unassigned') AS site
          FROM ipn LEFT JOIN r ON (ip >> (32 - plen)) = (rip >> (32 - plen))
          GROUP BY sequence_num)
        SELECT site, count(*) AS n_flows, CAST(SUM(bytes) AS BIGINT) AS total_bytes
        FROM m GROUP BY site""".stripMargin)),

    // Flow direction × protocol rollup with sampling-rate scale-up.
    Q("qf5_direction_rollup",
      // fan = false (r19, VERDICT r18 #1): tiny rollup over 8 groups —
      // map-side partials collapse everything before the one exchange
      (s, d) => flows(s, d, fan = false)
        .rollup("flow_direction", "proto")
        .agg(sum(col("bytes") * col("sampling_rate")).as("est_bytes"),
          grouping_id().as("gid")),
      Some(s"""$FlowsCte SELECT flow_direction, proto,
        CAST(SUM(bytes*sampling_rate) AS BIGINT) AS est_bytes,
        CAST(GROUPING(flow_direction, proto) AS BIGINT) AS gid
        FROM flows GROUP BY ROLLUP(flow_direction, proto)""".stripMargin))
  )
}
