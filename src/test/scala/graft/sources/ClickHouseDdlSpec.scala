package graft.sources

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite

import graft.FlowSchema

/** Golden-file parity: the DDL generated from FlowSchema must equal the
  * reference's hand-written `initdb/create_tables.sql` modulo whitespace,
  * and the Spark schema must be a type-compatible widening of it.
  */
class ClickHouseDdlSpec extends AnyFunSuite {

  private def tokens(s: String): Seq[String] =
    s.split("\\s+").filter(_.nonEmpty).toSeq

  test("generated flows DDL equals the reference DDL modulo whitespace") {
    val ref = Files.readString(
      Paths.get("/root/reference/initdb/create_tables.sql"))
    assert(tokens(ClickHouseDdl.flowsDdl) == tokens(ref))
  }

  test("every ClickHouse column type maps to the Spark field type") {
    val sparkTypes = FlowSchema.schema.fields.map(f => f.name -> f.dataType).toMap
    FlowSchema.chTypes.foreach { case (name, chType) =>
      assert(ClickHouseDdl.compatibleSparkTypes(chType).contains(sparkTypes(name)),
        s"$name: $chType cannot land in ${sparkTypes(name)}")
    }
  }

  test("UInt32 counters that can exceed Int range widen to Long") {
    val sparkTypes = FlowSchema.schema.fields.map(f => f.name -> f.dataType).toMap
    for (n <- Seq("sequence_num", "sampling_rate", "fragment_id"))
      assert(sparkTypes(n) == org.apache.spark.sql.types.LongType, n)
  }

  test("extended DDL = parity columns + the eight extended, types compatible") {
    // the default flows DDL must NOT mention the extended columns (byte
    // parity with the reference); the extended DDL appends exactly them
    for ((n, _) <- ClickHouseDdl.extendedChTypes)
      assert(!ClickHouseDdl.flowsDdl.contains(n), s"$n leaked into parity DDL")
    val extTypes = FlowSchema.extendedSchema.fields.map(f => f.name -> f.dataType).toMap
    assert(ClickHouseDdl.extendedChTypes.map(_._1) ==
      FlowSchema.extendedFields.map(_.name), "column order drift")
    (FlowSchema.chTypes ++ ClickHouseDdl.extendedChTypes).foreach { case (name, chType) =>
      assert(ClickHouseDdl.compatibleSparkTypes(chType).contains(extTypes(name)),
        s"$name: $chType cannot land in ${extTypes(name)}")
      assert(ClickHouseDdl.extendedFlowsDdl.contains(s"$name $chType"), name)
    }
    // 4-byte ASNs exceed Int.MaxValue: the Spark side must be Long
    for (n <- Seq("src_as", "dst_as"))
      assert(extTypes(n) == org.apache.spark.sql.types.LongType, n)
  }
}
