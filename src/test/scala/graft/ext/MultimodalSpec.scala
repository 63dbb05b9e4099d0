package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The multimodal decode kernels' typed outputs — in particular the
  * ArrayType(FloatType) `hist` feature vector that the registered x5c
  * query drops (the driver's canonicalizer can't hash raw arrays): its
  * rationals count/len must reconstruct exactly from the integer counts,
  * and the kernel plumbing must hold under empty-ish payload edges.
  */
class MultimodalSpec extends SparkSpec {

  private def media = {
    import spark.implicits._
    Seq(
      (1L, "hello world".getBytes("UTF-8")),
      (2L, Array[Byte](0, 16, 32, 127, -1, -16)), // bins 0,1,2,7 + top bins dropped to 8-bin range
      (3L, Array.fill[Byte](256)(65)) // 'A' = 0x41 -> bin 4
    ).toDF("doc_id", "payload")
  }

  test("byteHistogram: float hist is exactly counts/len and sums to coverage") {
    val rows = Multimodal.byteHistogram(media, bins = 8)
      .orderBy("doc_id").collect()
    rows.foreach { r =>
      val counts = r.getSeq[Int](1)
      val hist = r.getSeq[Float](2)
      val n = r.getInt(3)
      assert(counts.length == 8 && hist.length == 8)
      // the dropped-by-the-registry float vector IS counts/len, bit-exact
      counts.zip(hist).foreach { case (c, f) =>
        assert(f == c.toFloat / n.toFloat, s"doc ${r.getLong(0)}: $c/$n != $f")
      }
      assert(counts.sum <= n) // bytes >= 128 fall outside the 8 low bins
    }
    // doc 3: all 256 bytes are 'A' (0x41) -> bin 4 holds everything
    val d3 = rows.find(_.getLong(0) == 3L).get
    assert(d3.getSeq[Int](1) == Seq(0, 0, 0, 0, 256, 0, 0, 0))
    assert(d3.getSeq[Float](2)(4) == 1.0f)
  }

  test("realDecode: constructed PNG bytes decode to exact dimensions and channel mean") {
    // a 3×2 image with known channel values: PNG is lossless, so the
    // decoded raster — and therefore the R/G/B mean — is exact
    val img = new java.awt.image.BufferedImage(3, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val pixels = Seq( // (x, y, r, g, b)
      (0, 0, 255, 0, 0), (1, 0, 0, 255, 0), (2, 0, 0, 0, 255),
      (0, 1, 10, 20, 30), (1, 1, 40, 50, 60), (2, 1, 70, 80, 90))
    pixels.foreach { case (x, y, r, g, b) =>
      img.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    val png = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "png", png))
    val Some((w, h, mean)) = Multimodal.realDecode(png.toByteArray)
    assert(w == 3 && h == 2)
    val want = pixels.flatMap { case (_, _, r, g, b) => Seq(r, g, b) }
    assert(mean == want.sum.toDouble / want.size.toDouble,
      s"channel mean $mean != ${want.sum.toDouble / want.size}")
    // JPEG: lossy, so pin dimensions and mean plausibility only
    val jpg = new java.io.ByteArrayOutputStream()
    assert(javax.imageio.ImageIO.write(img, "jpg", jpg))
    val Some((jw, jh, jmean)) = Multimodal.realDecode(jpg.toByteArray)
    assert(jw == 3 && jh == 2 && jmean >= 0.0 && jmean <= 255.0)
    // non-image bytes are None — the declared stub-fallback trigger
    assert(Multimodal.realDecode("not an image".getBytes("UTF-8")).isEmpty)
  }

  test("decodeFeaturesReal: codec path runs on executors, stub fallback for non-images") {
    import spark.implicits._
    val img = new java.awt.image.BufferedImage(4, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 4).foreach(x => (0 until 3).foreach(y =>
      img.setRGB(x, y, (100 << 16) | (150 << 8) | 200)))
    val png = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", png)
    val synthetic = "hello world".getBytes("UTF-8")
    val df = Seq((1L, png.toByteArray), (2L, synthetic)).toDF("doc_id", "payload")
      .repartition(2) // force both rows through the executor-side kernel
    val rows = Multimodal.decodeFeaturesReal(df).orderBy("doc_id").collect()
    // row 1: real decode — uniform image, exact mean (100+150+200)/3
    assert(rows(0).getInt(1) == 4 && rows(0).getInt(2) == 3)
    assert(rows(0).getDouble(3) == 150.0)
    assert(rows(0).getInt(4) == png.toByteArray.length)
    // row 2: undecodable — identical numbers to the stub path
    assert(rows(1).getInt(1) == 1 + (synthetic(0) & 0xff) % 64)
    assert(rows(1).getDouble(3) ==
      synthetic.map(_ & 0xff).sum.toDouble / synthetic.length)
  }

  test("realHeaderMeta: header-only parse recovers planted PNG/WAV metadata, flags junk") {
    import spark.implicits._
    // one planted PNG (x5i geometry at doc 4: 1+4%4=1 × 1+4%3=2), one
    // planted WAV (x5j clip at doc 7: 8+7%8=15 frames @ 8 kHz mono), one
    // junk payload — all through the executor-side kernel
    val docs = Seq(4L, 7L).toDF("doc_id")
    val planted = Multimodal.plantMixedMedia(docs)
      .unionByName(Seq((9L, "not a container".getBytes("UTF-8")))
        .toDF("doc_id", "payload"))
      .repartition(3)
    val rows = Multimodal.realHeaderMeta(planted).orderBy("doc_id").collect()
    assert(rows(0).getString(1) == "png" && rows(0).getBoolean(7))
    assert(rows(0).getInt(2) == 1 && rows(0).getInt(3) == 2) // w, h from header
    assert(rows(0).getInt(4) == 0 && rows(0).getLong(6) == 0L)
    assert(rows(1).getString(1) == "wav" && rows(1).getBoolean(7))
    assert(rows(1).getInt(4) == 8000 && rows(1).getInt(5) == 1)
    assert(rows(1).getLong(6) == 15L) // frame count from the fmt/data headers
    assert(rows(2).getString(1) == "unknown" && !rows(2).getBoolean(7))
    // the fallback row zeroes every metadata field
    assert(rows(2).getInt(2) == 0 && rows(2).getInt(3) == 0 &&
      rows(2).getInt(4) == 0 && rows(2).getInt(5) == 0 &&
      rows(2).getLong(6) == 0L)
  }

  test("kernels distribute: mapPartitions output matches per-row recompute at fixture scale") {
    val df = graft.Tables.documents(spark, sf)
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("payload"))
    val viaKernel = Multimodal.byteHistogram(df, bins = 8)
      .select(col("doc_id"), col("hist_counts"))
    // cross-check against the same arithmetic expressed declaratively
    val recompute = df.select(col("doc_id"),
      transform(sequence(lit(0), lit(7)), b =>
        aggregate(
          transform(sequence(lit(1), length(col("payload"))),
            i => when(floor(ascii(col("payload").cast("string").substr(i, lit(1))) / 16) === b, 1)
              .otherwise(0)),
          lit(0), (acc, v) => acc + v)).as("hist_sql"))
    val joined = viaKernel.join(recompute, "doc_id")
      .filter(not(col("hist_counts").cast("array<int>") === col("hist_sql").cast("array<int>")))
    assert(joined.count() == 0)
  }

  test("x5g phash: dup payloads pair at Hamming 0, unrelated payloads stay apart") {
    // the fixture has no sub-threshold pair (x5g's registered result is
    // legitimately empty at sf0.01), so the band-join + verify contract is
    // witnessed here on synthetic payloads: two identical "images", one
    // perturbed copy, one unrelated
    import spark.implicits._
    val base = ("A" * 40 + "zQx" + "B" * 40).getBytes("UTF-8")
    val perturbed = base.clone(); perturbed(60) = 'C'.toByte // 1-byte change
    val unrelated = Array.tabulate[Byte](90)(i => (33 + (i * 37) % 90).toByte)
    val df = Seq((1L, base), (2L, base), (3L, perturbed), (4L, unrelated))
      .toDF("doc_id", "payload")
    val hb = Multimodal.aHashBands(df)
    // identical payloads -> identical bands
    val b12 = hb.filter(col("doc_id") <= 2).select("b0", "b1", "b2", "b3")
      .collect().map(_.toSeq).toSet
    assert(b12.size == 1, s"identical payloads hashed differently: $b12")
    // compute every pairwise Hamming through the kernel frame, then check
    // the banded plan emits exactly the <= 3 pairs (no pigeonhole miss,
    // no post-filter leak)
    val bands = hb.collect()
      .map(r => r.getLong(0) -> Seq(r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4))).toMap
    def ham(a: Long, b: Long): Int =
      bands(a).zip(bands(b)).map { case (x, y) => Integer.bitCount(x ^ y) }.sum
    val expected = (for {
      a <- bands.keys; b <- bands.keys if a < b && ham(a, b) <= 3
    } yield (a, b)).toSet
    assert(expected.contains((1L, 2L))) // the dup pair must be sub-threshold
    val got = Multimodal.phashPairs(hb, maxHamming = 3)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got == expected, s"banded pairs $got != brute-force $expected")
    assert(Multimodal.phashPairs(hb, maxHamming = 3)
      .filter(col("a") === 1 && col("b") === 2)
      .head().getInt(2) == 0) // exact dups verify at Hamming 0
  }

  test("x5g collapse plan is set-equal to naive all-doc banding on a dup-heavy corpus") {
    // the registered oracle cannot catch a reassembly bug (the fixture
    // has no dup groups and no sub-threshold pair — everything is empty),
    // so prove the collapse plan against ground truth where it matters: a
    // corpus with two exact-dup groups and a near-dup bridge. Naive
    // banding over ALL docs is the ground truth — member hashes equal rep
    // hashes, so the two plans must emit the identical (a, b, hamming)
    // set, clique rows included.
    import spark.implicits._
    val g1 = ("X" * 30 + "hello brave new world" + "Y" * 30).getBytes("UTF-8")
    val g1b = g1.clone(); g1b(35) = 'o'.toByte // near copy of g1
    val other = Array.tabulate[Byte](80)(i => (33 + (i * 41) % 90).toByte)
    val df = Seq(
      (1L, g1), (2L, g1), (3L, g1),          // group 1: clique of 3
      (10L, g1b), (11L, g1b),                // group 2: clique of 2
      (20L, other)                           // singleton
    ).toDF("doc_id", "payload")
    def pairs(d: org.apache.spark.sql.DataFrame) =
      d.select("a", "b", "hamming").collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val collapsed = pairs(Multimodal.phashDedupPlan(df))
    val naive = pairs(Multimodal.phashPairs(Multimodal.aHashBands(df), maxHamming = 3))
    assert(collapsed == naive, s"collapsed $collapsed != naive $naive")
    // the shape the corpus was built for actually occurred: both cliques
    assert(collapsed.contains((1L, 2L, 0)) && collapsed.contains((2L, 3L, 0)) &&
      collapsed.contains((10L, 11L, 0)), collapsed.toString)
    // and no self-pairs / inverted orderings
    assert(collapsed.forall { case (a, b, _) => a < b })
  }

  test("x5k: PNG chunk-grammar split recovers planted frames; corrupt input flips real_decoded") {
    import spark.implicits._
    val docs = Seq(0L, 1L, 2L, 5L, 7L).toDF("doc_id")
    val planted = Multimodal.plantPngFramesMedia(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](1)).toMap
    // the structural walk recovers exactly K frames, each independently
    // decodable at the planted geometry
    planted.foreach { case (id, payload) =>
      val frames = Multimodal.splitPngFrames(payload)
      assert(frames.isDefined, s"doc $id failed to split")
      assert(frames.get.size == 2 + (id % 3).toInt, s"doc $id frame count")
      frames.get.zipWithIndex.foreach { case (fb, f) =>
        val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(fb))
        assert(img != null && img.getWidth == 1 + ((id + f) % 4).toInt &&
          img.getHeight == 1 + ((id + 2L * f) % 3).toInt,
          s"doc $id frame $f geometry")
      }
    }
    // truncated container and missing signature both refuse (None), so
    // the registered query's real_decoded flips instead of mis-summing
    val whole = planted(1L)
    assert(Multimodal.splitPngFrames(whole.dropRight(3)).isEmpty)
    assert(Multimodal.splitPngFrames(whole.drop(1)).isEmpty)
    // hostile chunk length near 2^31 must refuse (Long bounds check), not
    // wrap the Int offset negative and loop forever
    val hostile = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A,
      0x0A, 0x7F, 0xFF.toByte, 0xFF.toByte, 0xF8.toByte, 'I', 'D', 'A', 'T')
    assert(Multimodal.splitPngFrames(hostile).isEmpty)
    val corrupt = Seq((1L, whole.dropRight(3))).toDF("doc_id", "payload")
    val row = Multimodal.realFrameSample(corrupt, every = 2).head()
    assert(!row.getBoolean(5) && row.getInt(1) == 0)
  }

  test("x5l: real box-filter resize equals driver-computed block means exactly") {
    import spark.implicits._
    val docs = Seq(0L, 3L, 11L, 42L).toDF("doc_id")
    val out = Multimodal.realBoxResize(Multimodal.plantPngGridMedia(docs),
        outW = 2, outH = 2).collect()
      .map(r => (r.getLong(0), r.getString(3), r.getLong(4), r.getBoolean(5)))
    out.foreach { case (id, csv, total, ok) =>
      assert(ok, s"doc $id fell back")
      def v(base: Long, x: Int, y: Int): Long = ((base + x * 16 + y * 32) % 64) * 4
      val want = for {
        oy <- 0 until 2; ox <- 0 until 2
        base <- Seq(id, id * 7, id * 13)
      } yield (v(base, 2 * ox, 2 * oy) + v(base, 2 * ox + 1, 2 * oy) +
        v(base, 2 * ox, 2 * oy + 1) + v(base, 2 * ox + 1, 2 * oy + 1)) / 4
      assert(csv == want.mkString(","), s"doc $id resample mismatch")
      assert(total == want.sum)
    }
    // a raster whose dims don't divide the output refuses (the exactness
    // contract), flipping real_decoded rather than approximating
    val img3 = new java.awt.image.BufferedImage(3, 3,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img3, "png", bos)
    val odd = Seq((9L, bos.toByteArray)).toDF("doc_id", "payload")
    assert(!Multimodal.realBoxResize(odd, 2, 2).head().getBoolean(5))
  }
}
