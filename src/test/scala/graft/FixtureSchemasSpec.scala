package graft

import java.nio.file.{Files, Paths}

/** The fixture-schema fingerprint guard (VERDICT r09 #2): drift between
  * the committed FIXTURE_SCHEMAS.json and the live parquet footers must be
  * detected per table — including the exact r9 incident shape, a
  * timestamp column changing physical encoding.
  */
class FixtureSchemasSpec extends SparkSpec {

  test("snapshot reads every fixture table's footer schema") {
    val snap = FixtureSchemas.snapshot(spark, sf)
    assert(snap.keySet == FixtureSchemas.tables.toSet)
    assert(snap("lineitem").contains("l_quantity"))
    // events.ts surfaces through the same legacy-nanos lens as Tables uses,
    // so whatever physical encoding the driver generates is pinned here
    assert(snap("events").contains("ts"))
  }

  test("render/parse round-trip preserves every entry") {
    val snap = FixtureSchemas.snapshot(spark, sf)
    assert(FixtureSchemas.parse(FixtureSchemas.render(snap)) == snap)
  }

  test("a simulated type change is reported as that table's drift") {
    val snap = FixtureSchemas.snapshot(spark, sf)
    // the r9 incident: events.ts changed physical encoding between rounds
    val drifted = snap.updated("events",
      snap("events").replace("ts:", "ts_CHANGED:"))
    val d = FixtureSchemas.diff(snap, drifted)
    assert(d.size == 1 && d.head.contains("table events SCHEMA DRIFT"))
    // missing + new tables are reported distinctly
    val d2 = FixtureSchemas.diff(snap, snap - "region")
    assert(d2.size == 1 && d2.head.contains("table region MISSING"))
    val d3 = FixtureSchemas.diff(snap - "nation", snap)
    assert(d3.size == 1 && d3.head.contains("table nation NEW"))
    // no drift = no lines
    assert(FixtureSchemas.diff(snap, snap).isEmpty)
  }

  test("check seeds when absent, reports drift without overwriting") {
    val dir = Files.createTempDirectory("fixture-schemas")
    val p = dir.resolve("FIXTURE_SCHEMAS.json")
    assert(FixtureSchemas.check(spark, sf, p).isEmpty) // seeds
    assert(Files.exists(p))
    val seeded = Files.readString(p)
    assert(FixtureSchemas.check(spark, sf, p).isEmpty) // matches
    // poison the committed copy: drift must be reported AND the file left
    // untouched so the diff stays visible in later runs
    val poisoned = seeded.replace("l_quantity", "l_quantity_GONE")
    Files.writeString(p, poisoned)
    val d = FixtureSchemas.check(spark, sf, p)
    assert(d.exists(_.contains("table lineitem SCHEMA DRIFT")))
    assert(Files.readString(p) == poisoned)
  }
}
