package graft.ext

import graft.{Registry, SparkSpec}

/** x5h: magic-byte format sniff — the probes must RECOVER the container
  * family that was planted (doc_id%4), independently of the declared mime
  * (doc_id%3); mismatch is exactly their disagreement.
  */
class FormatSniffSpec extends SparkSpec {

  private val planted =
    Array("image/png", "image/jpeg", "image/gif", "audio/wav")
  private val declared =
    Array("image/png", "image/jpeg", "image/gif")

  test("sniffed mime recovers the planted header for every payload") {
    val rows = Registry.queries("x5h_format_sniff")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val id = r.getAs[Long]("doc_id")
      assert(r.getAs[String]("sniffed_mime") == planted((id % 4).toInt),
        s"doc $id: sniffed ${r.getAs[String]("sniffed_mime")}")
      assert(r.getAs[String]("declared_mime") == declared((id % 3).toInt))
      assert(r.getAs[Boolean]("mismatch") ==
        (r.getAs[String]("declared_mime") != r.getAs[String]("sniffed_mime")))
    }
    // the audit finds real work: both agreement and disagreement exist
    assert(rows.exists(_.getAs[Boolean]("mismatch")))
    assert(rows.exists(!_.getAs[Boolean]("mismatch")))
  }
}
