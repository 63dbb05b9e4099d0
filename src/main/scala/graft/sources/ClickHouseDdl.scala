package graft.sources

import org.apache.spark.sql.types._

import graft.FlowSchema

/** R5 DDL parity: emit the exact ClickHouse `flows` table the reference
  * ships by hand (`initdb/create_tables.sql:1-35`), generated from the one
  * [[FlowSchema]] definition — the reference maintains the Go struct and
  * the DDL as two artifacts synced by eyeball; here the golden-file test
  * (`ClickHouseDdlSpec`) pins the generated text to the reference file, so
  * a schema edit that would desync them fails the build instead.
  *
  * `ENGINE = Null()` in the reference is a fan-out head: the raw insert
  * table stores nothing, materialized views hanging off it do the real
  * storage — the same shape as this engine's normalize → multiple-sink
  * foreachBatch.
  */
object ClickHouseDdl {

  /** The `CREATE TABLE flows` DDL text (reference parity modulo blank-line
    * grouping).
    */
  def flowsDdl: String = {
    val cols = FlowSchema.chTypes
      .map { case (n, t) => s"    $n $t" }
      .mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS flows
       |(
       |$cols
       |)
       |ENGINE = Null();
       |""".stripMargin
  }

  /** ClickHouse types for the OPT-IN extended columns
    * ([[FlowSchema.extendedFields]]): goflow's FlowMessage carries these as
    * uint32 (next-hop rendered like the other addresses), so a user
    * running the collector with `extended=true` appends exactly these to
    * their own flows DDL. NOT part of [[flowsDdl]] — the default table
    * stays byte-parity with the reference's `create_tables.sql`.
    */
  val extendedChTypes: Seq[(String, String)] = Seq(
    "next_hop" -> "String",
    "in_if" -> "UInt32",
    "out_if" -> "UInt32",
    "src_as" -> "UInt32",
    "dst_as" -> "UInt32",
    "vlan_id" -> "UInt32",
    "mpls_1_label" -> "UInt32",
    "mpls_1_ttl" -> "UInt32",
    "src_mask" -> "UInt32",
    "dst_mask" -> "UInt32",
    "next_hop_as" -> "UInt32")

  /** `CREATE TABLE flows_extended` — the 23 parity columns plus the
    * extended eleven, for deployments that opt in.
    */
  def extendedFlowsDdl: String = {
    val cols = (FlowSchema.chTypes ++ extendedChTypes)
      .map { case (n, t) => s"    $n $t" }
      .mkString(",\n")
    s"""CREATE TABLE IF NOT EXISTS flows_extended
       |(
       |$cols
       |)
       |ENGINE = Null();
       |""".stripMargin
  }

  /** Spark-side type each ClickHouse type must land in (widening unsigned
    * types per SURVEY §1.3) — asserted against [[FlowSchema.schema]] so the
    * two views of the one definition cannot drift.
    */
  def compatibleSparkTypes(chType: String): Set[DataType] = chType match {
    case "String" => Set(StringType)
    case "Int32" => Set(IntegerType)
    case "UInt64" => Set(LongType) // may exceed Int range: must widen
    case "UInt32" => Set(IntegerType, LongType) // Long iff counter-like
    case t => throw new IllegalArgumentException(s"unmapped ClickHouse type $t")
  }
}
