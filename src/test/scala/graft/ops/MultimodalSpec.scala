package graft.ops

import graft.SparkSpec
import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.security.MessageDigest
import javax.imageio.ImageIO

/** Real-decode contract: PNG/JPEG payloads (JDK-encodable, so also
  * JDK-decodable with zero extra dependencies) must yield their ACTUAL
  * pixel dimensions through the same mapPartitions batch shape; anything
  * else — including corrupt image payloads — falls to the deterministic
  * stub. */
class MultimodalSpec extends SparkSpec {

  private def encoded(fmt: String, w: Int, h: Int): Array[Byte] = {
    val img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, 0xff8800) // non-degenerate content
    val bos = new ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"JDK must encode $fmt")
    bos.toByteArray
  }

  test("real PNG/JPEG payloads decode to actual dimensions; others keep the stub contract") {
    import spark.implicits._
    val textBytes = "plain text payload".getBytes("UTF-8")
    val media = Seq(
      Multimodal.MediaRow(1L, encoded("png", 123, 45)),
      Multimodal.MediaRow(2L, encoded("jpg", 77, 33)),
      Multimodal.MediaRow(3L, textBytes)).toDS()
    val f = Multimodal.featuresOf(media).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap

    assert(f(1L).getAs[String]("format") === "png")
    assert(f(1L).getAs[Long]("width") === 123L)
    assert(f(1L).getAs[Long]("height") === 45L)
    assert(f(1L).getAs[Long]("n_frames") === 1L)

    assert(f(2L).getAs[String]("format") === "jpeg")
    assert(f(2L).getAs[Long]("width") === 77L)
    assert(f(2L).getAs[Long]("height") === 33L)

    // non-image payloads: byte-identical to the labeled stub
    val stub = Multimodal.decodeStub(3L, textBytes, MessageDigest.getInstance("MD5"))
    assert(f(3L).getAs[String]("format") === stub.format)
    assert(f(3L).getAs[Long]("width") === stub.width)
    assert(f(3L).getAs[Long]("height") === stub.height)
    assert(f(3L).getAs[Long]("n_frames") === stub.n_frames)
    assert(f(3L).getAs[String]("media_md5") === stub.media_md5)
  }

  test("a truncated image payload falls back to the stub instead of throwing") {
    import spark.implicits._
    val corrupt = encoded("png", 10, 10).take(12) // magic intact, body gone
    val media = Seq(Multimodal.MediaRow(9L, corrupt)).toDS()
    val row = Multimodal.featuresOf(media).collect()(0)
    val stub = Multimodal.decodeStub(9L, corrupt, MessageDigest.getInstance("MD5"))
    assert(row.getAs[String]("format") === stub.format,
      "corrupt payloads must yield the deterministic stub row, not an exception")
    assert(row.getAs[Long]("n_bytes") === 12L)
  }

  test("fixture text payloads never sniff as images (oracle parity of the stub arm)") {
    val feats = Multimodal.extractFeatures(spark, "/root/testdata/sf0.001").collect()
    assert(feats.nonEmpty)
    // stub formats come from n_bytes % 3 — real decode would give n_frames=1
    // for every 'png'/'jpeg' row, which the stub arm does not guarantee
    val md = MessageDigest.getInstance("MD5")
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
      .selectExpr("doc_id", "cast(text as binary) as media").collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Array[Byte]]("media")).toMap
    feats.take(20).foreach { r =>
      val id = r.getAs[Long]("doc_id")
      val stub = Multimodal.decodeStub(id, docs(id), md)
      assert(r.getAs[Long]("width") === stub.width && r.getAs[String]("format") === stub.format,
        s"doc $id must take the stub arm")
    }
  }

  test("perceptual hash: one-pixel edit stays near, inversion lands far") {
    import spark.implicits._
    def gradientPng(invert: Boolean, editPixel: Boolean): Array[Byte] = {
      val img = new BufferedImage(32, 32, BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 32; x <- 0 until 32) {
        val g = (x * 8) % 256
        val v = if (invert) 255 - g else g
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      if (editPixel) img.setRGB(5, 5, 0xffffff)
      val bos = new ByteArrayOutputStream()
      assert(ImageIO.write(img, "png", bos))
      bos.toByteArray
    }
    val media = Seq(
      Multimodal.MediaRow(1L, gradientPng(invert = false, editPixel = false)),
      Multimodal.MediaRow(2L, gradientPng(invert = false, editPixel = true)),
      Multimodal.MediaRow(3L, gradientPng(invert = true, editPixel = false)))
      .toDS()
    val ph = Multimodal.phashOf(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(ph(1L), ph(2L)) <= 6,
      s"one-pixel edit must stay within the near-dup radius: ${hamming(ph(1L), ph(2L))}")
    assert(hamming(ph(1L), ph(3L)) > 20,
      s"inverted image must land far: ${hamming(ph(1L), ph(3L))}")
    // identical payloads hash identically (the hamming-0 exact arm)
    val ph2 = Multimodal.phashOf(media).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ph2 === ph)
  }

  test("7-band split is lossless at hamming <= 6 (pigeonhole, brute-forced)") {
    def bandsOf(h: Long): Seq[Long] =
      Multimodal.PhashBands.map { case (_, sh, mk) => (h >>> sh) & mk }
    val md = MessageDigest.getInstance("MD5")
    def h60(s: String): Long = {
      md.reset()
      val hex = md.digest(s.getBytes("UTF-8")).map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(hex.take(15), 16)
    }
    // deterministic sweep: random base hashes x random <=6-bit flips
    for (i <- 0 until 50) {
      val base = h60(s"band-base:$i")
      val k = 1 + (i % 6)
      val flipped = (0 until k).foldLeft(base) { (h, j) =>
        h ^ (1L << ((h60(s"band-bit:$i:$j") % 60).toInt))
      }
      val hamming = java.lang.Long.bitCount(base ^ flipped)
      assert(hamming <= 6)
      val shared = bandsOf(base).zip(bandsOf(flipped)).count { case (a, b) => a == b }
      assert(shared >= 1,
        s"pair at hamming $hamming must share a band (pigeonhole)")
    }
    // band widths cover exactly the 60 hash bits, disjointly
    val covered = Multimodal.PhashBands.flatMap { case (_, sh, mk) =>
      (0 until 64).filter(b => ((mk >> (b - sh)) & 1L) == 1L && b >= sh)
    }
    assert(covered.sorted === (0 until 60))
  }

  test("planted PNGs: real decode arm yields the expected near-dup pairs under the query") {
    val pairs = Multimodal.phashNearDup(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    // planted ids live in a NEGATIVE range disjoint from every corpus id
    val plantedIds = (0 until Multimodal.PlantedGroups * 3)
      .map(Multimodal.PlantedBase + _).toSet
    val planted = pairs.filter(p => plantedIds(p._1) || plantedIds(p._2))
    // each of the 4 groups: (base, edit), (base, recompress), (edit, recompress)
    assert(planted.length === 12, s"expected 12 planted pairs, got ${planted.toSeq}")
    for (g <- 0 until Multimodal.PlantedGroups) {
      val ids = (0 until 3).map(j => Multimodal.PlantedBase + g * 3 + j)
      val grp = planted.filter(p => ids.contains(p._1) && ids.contains(p._2))
      assert(grp.length === 3, s"group $g must produce all 3 pairs")
      // the re-encoded duplicate (identical pixels, different bytes)
      // must land at hamming 0 THROUGH the decode path
      val recompress = grp.find(p => p._1 == ids(0) && p._2 == ids(2)).get
      assert(recompress._3 === 0, "re-encoded copy must hash identically")
      assert(grp.forall(_._3 <= 6))
    }
    // cross-group pairs must NOT appear (unrelated images land far)
    assert(planted.forall { case (a, b, _) =>
      (a - Multimodal.PlantedBase) / 3 === (b - Multimodal.PlantedBase) / 3 })
  }

  test("MIXED population: corpus-scale identical-pixel triplets pair at hamming 0 through the decode path") {
    // every 100th doc is a REAL encoded PNG; pixels repeat in runs of
    // three (group = doc_id/300), so at 500 docs the real arm must
    // contribute exactly {0,100,200} and {300,400} as hamming-0 cliques
    // — pairs that exist ONLY because the bytes decode (their texts all
    // differ, so the stub arm would never pair them: the all-stub wide
    // face is the control)
    val dir = "/root/testdata/sf0.001"
    val mixedPairs = Multimodal.phashNearDupMixed(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val realPairs = mixedPairs.filter(p => p._1 >= 0 && p._2 >= 0).toSet
    assert(realPairs === Set((0L, 100L, 0), (0L, 200L, 0), (100L, 200L, 0),
      (300L, 400L, 0)),
      s"real-arm triplet structure must surface exactly: $realPairs")
    val stubPairs = Multimodal.phashNearDupWide(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).filter(p => p._1 >= 0).toSet
    assert(realPairs.map(p => (p._1, p._2)).intersect(stubPairs).isEmpty,
      "the control (all-stub) face must not contain the decode-path pairs")
    // the planted groups ride through both faces identically
    val planted = mixedPairs.filter(_._1 < 0)
    assert(planted.length === 12, s"planted pairs unchanged: ${planted.toSeq}")
  }

  test("WIDE 240-bit phash: limb-aligned bands cover the bits; re-encodes at hamming 0") {
    import spark.implicits._
    // every one of the 240 bits lives in EXACTLY one band — flipping
    // bit i changes exactly one of the 7 band values (the disjoint-
    // cover precondition of the hamming<=6 pigeonhole)
    def bands(h: Array[Long]): Seq[Long] = {
      val m = (1L << 30) - 1
      Seq(h(0) & m, (h(0) >>> 30) & m, h(1) & m, (h(1) >>> 30) & m,
        h(2) & m, (h(2) >>> 30) & m, h(3))
    }
    val base = Array(0x0L, 0x0L, 0x0L, 0x0L)
    for (i <- 0 until 240) {
      val flipped = base.clone()
      flipped(i / 60) ^= 1L << (i % 60)
      val changed = bands(base).zip(bands(flipped)).count { case (a, b) => a != b }
      assert(changed === 1, s"bit $i must live in exactly one band")
    }
    // the query face: a re-encoded copy (identical pixels, different
    // bytes) is hamming 0 through the REAL 16x16 decode arm in ANY
    // hash width; exact corpus duplicates pair at 0 through the stub
    // arm. (The one-pixel edit is ~4x amplified in 240-bit space, so
    // its pair may legitimately exceed radius 6 — not asserted.)
    val pairs = Multimodal.phashNearDupWide(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    for (g <- 0 until Multimodal.PlantedGroups) {
      val b0 = Multimodal.PlantedBase + g * 3
      val recompress = pairs.find(p => p._1 == b0 && p._2 == b0 + 2)
      assert(recompress.exists(_._3 == 0),
        s"group $g re-encoded copy must pair at hamming 0 in the wide space")
    }
    // wide-space pairs are a SUBSET of what banded-60 discipline would
    // verify: every reported pair is within the radius
    assert(pairs.forall(_._3 <= 6))
    // planted cross-group pairs never appear
    val plantedIds = (0 until Multimodal.PlantedGroups * 3)
      .map(Multimodal.PlantedBase + _).toSet
    assert(pairs.filter(p => plantedIds(p._1) && plantedIds(p._2)).forall {
      case (a, b, _) =>
        (a - Multimodal.PlantedBase) / 3 === (b - Multimodal.PlantedBase) / 3 })
  }
}
