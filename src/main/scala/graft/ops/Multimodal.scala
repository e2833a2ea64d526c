package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import java.security.MessageDigest

/** Multimodal-column plumbing: media payloads ride through the engine as
  * opaque `binary` columns with typed metadata extracted by a per-partition
  * decoder. PNG and JPEG payloads (sniffed by magic bytes) are decoded FOR
  * REAL via the JDK's javax.imageio — actual width/height, no external
  * dependency; every other payload falls to `decodeStub`, the
  * clearly-marked deterministic stand-in for codecs the container lacks
  * (audio/video). The Spark-side shape — binary column, mapPartitions
  * batching, reused decoder state per partition, typed output schema — is
  * the same either way.
  *
  * Scale posture: decode is embarrassingly parallel per partition; the
  * MessageDigest (stand-in for a codec context) is allocated once per
  * partition, not per row — the pattern that matters when each decode is
  * a 10 ms native call at 100 TB. The magic-byte sniff keeps the
  * expensive ImageIO attempt off non-image payloads entirely.
  */
object Multimodal {

  final case class MediaRow(doc_id: Long, media: Array[Byte])
  final case class MediaFeatures(
      doc_id: Long, n_bytes: Long, media_md5: String, format: String,
      width: Long, height: Long, n_frames: Long)

  /** Magic-byte sniff for the formats the JDK can decode natively. */
  private def sniffImage(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89
        && bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF
        && (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF) Some("jpeg")
    else None

  /** Decode one payload: REAL javax.imageio decode for PNG/JPEG (width,
    * height, n_frames=1 from the actual pixels; headless-safe, JDK
    * built-in), `decodeStub` for everything else — including a sniffed
    * image that fails to parse (truncated/corrupt payloads must yield a
    * row, not an exception, in a 100 TB batch). */
  def decode(docId: Long, bytes: Array[Byte], md: MessageDigest): MediaFeatures =
    sniffImage(bytes) match {
      case Some(fmt) =>
        // NonFatal, not just IOException: the JDK readers throw unchecked
        // exceptions on fuzzed/corrupt bodies (CMMException, IAE, AIOOBE
        // from JPEGImageReader) — a bad blob must yield a stub row, never
        // abort a 100 TB batch
        val img =
          try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes))
          catch { case scala.util.control.NonFatal(_) => null }
        if (img == null) decodeStub(docId, bytes, md)
        else {
          md.reset()
          val hex = md.digest(bytes).map(b => f"$b%02x").mkString
          MediaFeatures(docId, bytes.length.toLong, hex, fmt,
            img.getWidth.toLong, img.getHeight.toLong, n_frames = 1L)
        }
      case None => decodeStub(docId, bytes, md)
    }

  /** STUB decode: derives fake format/dimensions/frame-count
    * deterministically from the payload hash + length — the labeled
    * stand-in for codecs the container lacks. A real deployment
    * replaces the body with an actual codec call; the signature stays. */
  def decodeStub(docId: Long, bytes: Array[Byte], md: MessageDigest): MediaFeatures = {
    md.reset()
    val digest = md.digest(bytes)
    val hex = digest.map(b => f"$b%02x").mkString
    val h = java.lang.Long.parseLong(hex.substring(0, 15), 16)
    val n = bytes.length.toLong
    MediaFeatures(
      doc_id = docId,
      n_bytes = n,
      media_md5 = hex,
      format = (n % 3) match { case 0 => "jpeg"; case 1 => "png"; case _ => "webm" },
      width = h % 1280,
      height = (h / 1280) % 720,
      n_frames = n % 30 + 1)
  }

  /** documents.text re-cast as a binary media column — the fixture tables
    * carry no real blobs, so the text bytes stand in for the payload. */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRow]
  }

  /** Decode-once: the features table is computed ONCE per (session, dir)
    * and persisted (SessionCache); every derived query (frame sampling,
    * resize planning, format stats) reads the cache instead of re-running
    * the decode. With a real codec at ~10 ms/frame, re-decoding per
    * derived query at 100 TB multiplies the single most expensive stage
    * of the pipeline — decode feeds a materialized features table, and
    * everything else derives. Rewrote documents.parquet mid-session?
    * `SessionCache.invalidate(spark, "mmfeat", dir)` first. */
  def features(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "mmfeat", dir) {
      featuresOf(mediaTable(spark, dir))
    }

  /** Feature extraction over an arbitrary media frame — one decoder
    * context per partition, real PNG/JPEG decode, stub for the rest
    * (`decode`). The fixture tables carry text payloads (never image
    * magic bytes), so the oracle-checked queries exercise the stub arm;
    * MultimodalSpec drives this entry point with real encoded images. */
  def featuresOf(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // default ImageIO behavior spools every InputStream to a disk temp
      // file before decoding (FileCacheImageInputStream) — pure waste
      // when the payload is already in memory; JVM-global, idempotent
      javax.imageio.ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      rows.map(r => decode(r.doc_id, r.media, md))
    }.toDF()
  }

  /** Feature-extraction pass: one codec context per partition, streamed
    * row batches, typed output (ordered for the oracle contract). */
  def extractFeatures(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir).orderBy("doc_id")

  /** Frame sampling: every 5th frame index per media payload (the
    * video-preprocessing shape: one row out per sampled frame, ready for
    * a per-frame decode stage). Pure plan-side explode — the frame list
    * never materializes on the driver. */
  def frameSample(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .filter(col("format") === "webm")
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(5))).as("frame_idx"))
      .select(col("doc_id"), col("n_frames"), col("frame_idx"))
      .orderBy("doc_id", "frame_idx")

  /** Resize planning: letterbox every (fake) image into a 224x224 budget —
    * integer target dims from double scale arithmetic, identical in the
    * oracle. A real codec slots into the decode stage; the geometry pass
    * stays exactly this. */
  def resizePlan(spark: SparkSession, dir: String): DataFrame = {
    val w = greatest(col("width"), lit(1L)).cast("double")
    val h = greatest(col("height"), lit(1L)).cast("double")
    val scale = least(lit(224.0) / w, lit(224.0) / h)
    features(spark, dir)
      .filter(col("format").isin("jpeg", "png"))
      .select(col("doc_id"), col("width"), col("height"),
        floor(w * scale).cast("long").as("out_width"),
        floor(h * scale).cast("long").as("out_height"))
      .orderBy("doc_id")
  }

  /** 60-bit perceptual hash per media payload: real images get an
    * 8x8 average-hash over block-averaged grayscale (the classic aHash
    * — robust to recompression and small edits), everything else the
    * deterministic md5-derived stub (same labeled-stub contract as
    * decodeStub; the fixture corpus is all-stub, so the oracle mirrors
    * the md5 arm while MultimodalSpec drives the real arm with encoded
    * PNGs). 60 bits so the hash, its 4x15-bit bands, and the oracle
    * all live in the library's standard md5-60 integer space. */
  def phashOf(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        val ph = sniffImage(r.media) match {
          case Some(_) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) stubPhash(md, r.media) else aHash60(img)
          case None => stubPhash(md, r.media)
        }
        (r.doc_id, ph)
      }
    }.toDF("doc_id", "phash")
  }

  private def stubPhash(md: MessageDigest, bytes: Array[Byte]): Long = {
    md.reset()
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** Classic average-hash, 60 of the 64 cells: block-average the image
    * to an 8x8 grayscale grid, bit i = cell i brighter than the grid
    * mean. One or two differing pixels move at most a few cells across
    * the mean — near-identical images land within a small hamming
    * radius; unrelated images differ in ~30 bits. */
  private[ops] def aHash60(img: java.awt.image.BufferedImage): Long = {
    val w = img.getWidth
    val h = img.getHeight
    val cells = Array.ofDim[Double](64)
    for (cy <- 0 until 8; cx <- 0 until 8) {
      val x0 = cx * w / 8; val x1 = math.max(x0 + 1, (cx + 1) * w / 8)
      val y0 = cy * h / 8; val y1 = math.max(y0 + 1, (cy + 1) * h / 8)
      var sum = 0.0; var n = 0
      for (y <- y0 until math.min(y1, h); x <- x0 until math.min(x1, w)) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3.0
        n += 1
      }
      cells(cy * 8 + cx) = if (n == 0) 0.0 else sum / n
    }
    val mean = cells.sum / 64
    var bits = 0L
    for (i <- 0 until 60) if (cells(i) > mean) bits |= 1L << i
    bits
  }

  // -- planted real-image near-duplicates ----------------------------
  // The fixture corpus's media column is text bytes (all-stub), so the
  // oracle face of phash dedup would never exercise the DECODE path.
  // These deterministic 8x8 grayscale PNGs are unioned in by
  // phashNearDup: pixel values come from a formula BOTH engines can
  // evaluate (md5-60 % 256 per cell), so the DuckDB oracle recomputes
  // the expected aHash from the formula while the Spark side must
  // recover the SAME values through the real encode -> ImageIO decode ->
  // block-average path — a lossy or buggy decode breaks the hash gate.
  // Each group g plants 3 variants: base, a one-cell edit ((v+64)%256 at
  // cell 0 — hamming stays small), and a re-encoded duplicate (identical
  // pixels, one byte appended after IEND so the payload md5 differs —
  // the recompressed-copy stand-in). 8x8 pixels = one pixel per aHash
  // cell, so cell means are exact integers and the 64-int sum / 64 is
  // dyadic — bit-identical mean arithmetic in both engines.

  // NEGATIVE id range: real doc_ids are non-negative at every scale
  // (testdata and ScaleUpTestdata replicas alike), so planted rows can
  // never collide with a corpus id. The first draft used 900000000 and
  // sf10's replica 90 (DocStride 1e7) landed real docs exactly there —
  // planted pairs would have been attributed to unrelated corpus docs
  // while the oracle, mirroring the same union, stayed green.
  private[ops] val PlantedBase = -1000000000L
  private[ops] val PlantedGroups = 4

  /** Deterministic per-cell gray value of planted image (g, j). */
  private[ops] def plantedGray(md: MessageDigest, g: Int, j: Int, cell: Int): Int = {
    md.reset()
    val hex = md.digest(s"img:$g:$cell".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    val v = (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 256L).toInt
    if (j == 1 && cell == 0) (v + 64) % 256 else v
  }

  /** The planted (doc_id, png_bytes) rows. Encoded once per call —
    * PlantedGroups x 3 tiny images, driver-side by construction. */
  private[ops] def plantedPngs(): Seq[(Long, Array[Byte])] = {
    val md = MessageDigest.getInstance("MD5")
    for (g <- 0 until PlantedGroups; j <- 0 until 3) yield {
      val img = new java.awt.image.BufferedImage(
        8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (cell <- 0 until 64) {
        val v = plantedGray(md, g, j, cell)
        img.setRGB(cell % 8, cell / 8, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      val bytes =
        if (j == 2) bos.toByteArray :+ 0x00.toByte // re-encoded duplicate
        else bos.toByteArray
      (PlantedBase + g * 3 + j, bytes)
    }
  }

  /** Per-band (shift, mask) split of the 60-bit phash: 4 bands of 9 bits
    * + 3 bands of 8 bits. Seven bands make the default radius LOSSLESS:
    * <= 6 differing bits across 7 disjoint bands leave >= 1 band with
    * zero differences (pigeonhole), so every pair within maxHamming = 6
    * shares at least one band-equality bucket. */
  private[ops] val PhashBands: Seq[(Int, Int, Long)] =
    (0 until 4).map(i => (i, i * 9, 511L)) ++
      (0 until 3).map(i => (4 + i, 36 + i * 8, 255L))

  /** Banded perceptual near-dup over the media column — the dedup
    * family extended to the multimodal side with the SAME candidate
    * discipline as simhash: candidates only from band-equality joins
    * (never all-pairs), exact bit_count(xor) verify.
    *
    * Recall contract: COMPLETE for `maxHamming <= 6` — the 7-band split
    * (`PhashBands`) guarantees a shared band for any pair within 6 bits
    * of hamming distance, so the band join is a lossless candidate gate
    * at the default radius, not a recall trade. Callers passing a larger
    * `maxHamming` get banding recall only down to the pigeonhole bound
    * (pairs differing in > 6 bits with no agreeing band are missed).
    *
    * On an all-stub fixture the corpus arm's pairs are the
    * exact-duplicate payloads (hamming 0); the PLANTED decodable PNG
    * near-duplicates (`plantedPngs`) are unioned in so the real
    * encode -> decode -> aHash path runs UNDER THE ORACLE with nonzero
    * rows at every scale — the oracle recomputes their hashes from the
    * shared pixel formula, never from the bytes. MultimodalSpec
    * additionally drives the decode arm with one-pixel edits and
    * inversions. */
  def phashNearDup(spark: SparkSession, dir: String,
                   maxHamming: Int = 6): DataFrame =
    phashPairsOf(phashFrame(spark, dir), maxHamming)

  /** Hash-once: the corpus-plus-planted 60-bit hash frame under the
    * same SessionCache contract as `features` — the decode/digest scan
    * runs ONCE per (session, dir) and every consumer (both sides of
    * the pair query's self-join, repeated invocations) reads the
    * materialized frame. Without this the self-join recomputes the
    * full payload scan for EACH side — the exact per-row cost the
    * decode-once discipline exists to not pay twice. Radius-independent
    * (banding and verify both derive from the frame), so one entry
    * serves any maxHamming. Rewrote documents.parquet mid-session?
    * `SessionCache.invalidate(spark, "phash60", dir)` first. */
  private[ops] def phashFrame(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "phash60", dir) {
      import spark.implicits._
      val planted = spark.createDataset(
        plantedPngs().map { case (id, b) => MediaRow(id, b) })
      phashOf(mediaTable(spark, dir).unionByName(planted))
    }

  /** The 7-band rows of a (doc_id, phash) frame: (doc_id, phash, i, bb)
    * — the phash carried alongside so band-join consumers (the pair
    * query, the incremental gate's persisted index) verify from the
    * joined rows without a second signature table. */
  private[ops] def phashBandsOf(ph: DataFrame): DataFrame =
    ph.select(col("doc_id"), col("phash"),
      posexplode(array(PhashBands.map { case (_, sh, mk) =>
        shiftright(col("phash"), sh).bitwiseAND(lit(mk)) }: _*))
        .as(Seq("i", "bb")))

  /** Band + verify over an arbitrary (doc_id, phash) frame. */
  private[ops] def phashPairsOf(ph: DataFrame, maxHamming: Int): DataFrame = {
    val bands = phashBandsOf(ph)
    bands.select(col("doc_id").as("doc_a"), col("phash").as("pa"),
        col("i"), col("bb"))
      .join(bands.select(col("doc_id").as("doc_b"), col("phash").as("pb"),
        col("i"), col("bb")), Seq("i", "bb"))
      .filter(col("doc_a") < col("doc_b"))
      .select("doc_a", "pa", "doc_b", "pb").distinct()
      .withColumn("hamming",
        bit_count(col("pa").bitwiseXOR(col("pb"))).cast("int"))
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  // -- WIDE (240-bit) perceptual hash: the 100 TB candidate discipline --
  // The 60-bit face's banded candidates are the round-13 sf100 finding:
  // lossless hamming<=6 banding over 60 bits forces 7 bands of 8-9 bits,
  // and an 8-9-bit band key is a FIXED-SELECTIVITY filter — candidate
  // pairs grow as n^2/2^bits (measured ~4x per decade to sf10, ~100x/
  // decade once the n^2 term dominates at sf100). Same defect class as
  // r10's fixed 16 LSH buckets and r12's fixed 4-bit vector gate: a
  // width constant chosen at fixture scale silently becomes the corpus-
  // scale bottleneck. The fix is the SAME pigeonhole at a wider hash:
  // 240 bits = 4 x 60-bit limbs (the engine's md5-60 integer space),
  // split limb-aligned into 7 bands (6 x 30 bits + 1 x 60) — still
  // LOSSLESS at hamming <= 6 (7 disjoint bands cover all 240 bits), but
  // a 30-bit band key is ~2^22 more selective than a 9-bit one: at 5M
  // docs, E[random candidates] drops from ~2.4e11 to ~70.
  //
  // Real images get a 16x16 block-average aHash (240 of 256 cells, the
  // classic aHash at double grid resolution); everything else the
  // labeled md5 stub (digest-once: limb k = md5-60 of the payload's
  // 32-char md5 hex ++ ":k" — one full-payload digest, not four). The planted
  // 8x8 PNGs ride through the REAL arm: each 16x16 cell subdivides one
  // source pixel (cell (r,c) -> pixel (r/2, c/2), every pixel counted
  // 4x, so the 256-cell mean equals the 64-pixel mean exactly) — the
  // DuckDB oracle recomputes the wide hashes from the same shared
  // pixel formula.

  /** 240-bit aHash of a real image: 16x16 block-average grid, bit i
    * (i < 240) = cell i brighter than the 256-cell mean, packed into 4
    * 60-bit limbs. */
  private[ops] def aHash240(img: java.awt.image.BufferedImage): Array[Long] = {
    val w = img.getWidth
    val h = img.getHeight
    val cells = Array.ofDim[Double](256)
    for (cy <- 0 until 16; cx <- 0 until 16) {
      val x0 = cx * w / 16; val x1 = math.max(x0 + 1, (cx + 1) * w / 16)
      val y0 = cy * h / 16; val y1 = math.max(y0 + 1, (cy + 1) * h / 16)
      var sum = 0.0; var n = 0
      for (y <- y0 until math.min(y1, h); x <- x0 until math.min(x1, w)) {
        val rgb = img.getRGB(x, y)
        sum += ((rgb >> 16 & 0xff) + (rgb >> 8 & 0xff) + (rgb & 0xff)) / 3.0
        n += 1
      }
      cells(cy * 16 + cx) = if (n == 0) 0.0 else sum / n
    }
    val mean = cells.sum / 256
    val limbs = Array.ofDim[Long](4)
    for (i <- 0 until 240)
      if (cells(i) > mean) limbs(i / 60) |= 1L << (i % 60)
    limbs
  }

  /** DIGEST-ONCE limb derivation: the payload is hashed one time and
    * the four 60-bit limbs derive from the 32-char hex digest plus a
    * limb tag — not four independent full-payload digests. Found by the
    * round-13 sf100 sweep: the wide face's scan cost was 4x the 60-bit
    * face's per row purely from re-digesting multi-KB payloads per
    * limb, which at 100 TB multiplies the most expensive per-row step
    * for no selectivity gain (any deterministic expansion of one
    * collision-resistant digest has the same dup/near-dup behavior on
    * stub payloads: exact duplicates collide at hamming 0, everything
    * else is ~uniform). The DuckDB oracle mirrors the same derivation
    * (md5(md5(text) || ':k')). */
  private def stubPhash240(md: MessageDigest, bytes: Array[Byte]): Array[Long] = {
    md.reset()
    val hex = md.digest(bytes).map(b => f"$b%02x").mkString
    Array.tabulate(4) { k =>
      md.reset()
      md.update(hex.getBytes("UTF-8"))
      md.update(s":$k".getBytes("UTF-8"))
      val limbHex = md.digest().map(b => f"$b%02x").mkString
      java.lang.Long.parseLong(limbHex.substring(0, 15), 16)
    }
  }

  /** (doc_id, h0..h3) wide-hash frame over a media frame — real decode
    * for sniffed images, md5 stub otherwise (decode discipline and
    * failure handling identical to `phashOf`). */
  private[ops] def phash240Of(media: Dataset[MediaRow]): DataFrame = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      javax.imageio.ImageIO.setUseCache(false)
      val md = MessageDigest.getInstance("MD5")
      rows.map { r =>
        val hs = sniffImage(r.media) match {
          case Some(_) =>
            val img =
              try javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(r.media))
              catch { case scala.util.control.NonFatal(_) => null }
            if (img == null) stubPhash240(md, r.media) else aHash240(img)
          case None => stubPhash240(md, r.media)
        }
        (r.doc_id, hs(0), hs(1), hs(2), hs(3))
      }
    }.toDF("doc_id", "h0", "h1", "h2", "h3")
  }

  /** Hash-once for the wide face: corpus-plus-planted 240-bit hash
    * frame, SessionCache'd like `phashFrame` (one payload scan per
    * (session, dir); the self-join and repeated invocations reuse it).
    * Rewrote documents.parquet mid-session?
    * `SessionCache.invalidate(spark, "phash240", dir)` first. */
  private[ops] def phash240Frame(spark: SparkSession, dir: String): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, "phash240", dir) {
      import spark.implicits._
      val planted = spark.createDataset(
        plantedPngs().map { case (id, b) => MediaRow(id, b) })
      phash240Of(mediaTable(spark, dir).unionByName(planted))
    }

  /** Limb-aligned 7-band split of the 240-bit hash: bands 2k/2k+1 are
    * the low/high 30 bits of limb k (k < 3), band 6 the whole 60-bit
    * limb 3. Disjoint cover of all 240 bits -> lossless at
    * hamming <= 6 by the same pigeonhole as the 60-bit face. */
  private[ops] def phash240BandsOf(ph: DataFrame): DataFrame = {
    val m30 = lit((1L << 30) - 1)
    ph.select(col("doc_id") +: Seq("h0", "h1", "h2", "h3").map(col) :+
      posexplode(array(
        col("h0").bitwiseAND(m30), shiftright(col("h0"), 30).bitwiseAND(m30),
        col("h1").bitwiseAND(m30), shiftright(col("h1"), 30).bitwiseAND(m30),
        col("h2").bitwiseAND(m30), shiftright(col("h2"), 30).bitwiseAND(m30),
        col("h3"))).as(Seq("i", "bb")): _*)
  }

  /** Banded near-dup over the WIDE hash — the same candidate
    * discipline as `phashNearDup` with the scale-safe band selectivity.
    * Population identical to the 60-bit face (corpus stand-ins + the
    * planted decodable PNGs); pair semantics finer (240-bit hamming
    * counts a one-pixel edit ~4x, so radius 6 keeps only tighter
    * near-dups — exact duplicates and re-encodes are hamming 0 in any
    * width). */
  def phashNearDupWide(spark: SparkSession, dir: String,
                       maxHamming: Int = 6): DataFrame =
    phash240PairsOf(phash240Frame(spark, dir), maxHamming)

  /** Band + verify over an arbitrary wide-hash frame — the pair query
    * shared by the all-stub and mixed-population faces. */
  private[ops] def phash240PairsOf(ph: DataFrame, maxHamming: Int): DataFrame = {
    val bands = phash240BandsOf(ph)
    val ham = (0 to 3).map(k =>
      bit_count(col(s"a_h$k").bitwiseXOR(col(s"b_h$k"))))
      .reduce(_ + _).cast("int")
    val a = bands.select(col("doc_id").as("doc_a") +:
      (0 to 3).map(k => col(s"h$k").as(s"a_h$k")) :+ col("i") :+ col("bb"): _*)
    val b = bands.select(col("doc_id").as("doc_b") +:
      (0 to 3).map(k => col(s"h$k").as(s"b_h$k")) :+ col("i") :+ col("bb"): _*)
    a.join(b, Seq("i", "bb"))
      .filter(col("doc_a") < col("doc_b"))
      .drop("i", "bb").distinct()
      .withColumn("hamming", ham)
      .filter(col("hamming") <= maxHamming)
      .select("doc_a", "doc_b", "hamming")
      .orderBy("doc_a", "doc_b")
  }

  // -- MIXED population: a real decodable-image FRACTION under load ----
  // The corpus media column is ~all text-byte stand-ins, so the real
  // decode arm only ever carried 12 tiny planted PNGs — the decode-once
  // discipline and the wide-hash scan cost at a realistic image fraction
  // were inferred, not measured (round-13 verdict #6). The mixed faces
  // give every `den`-th doc a REAL 8x8 PNG whose pixels come from a
  // shared md5-60 formula the DuckDB oracle recomputes exactly (the
  // planted-PNG recipe at corpus-proportional mass: 1% at den=100).
  // Pixels repeat in runs of three real-arm docs (group = doc_id/(3*den)),
  // so the real arm contributes corpus-SCALE hamming-0 dup structure
  // through the decode path, not just fixture-sized groups.

  /** Deterministic gray value of mixed-arm image pixel (group, pix) —
    * the same md5-60 convention as the oracle's md5LongSql. */
  private[ops] def mixedGray(md: MessageDigest, group: Long, pix: Int): Int = {
    md.reset()
    val hex = md.digest(s"mix:$group:$pix".getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    (java.lang.Long.parseLong(hex.substring(0, 15), 16) % 256L).toInt
  }

  /** documents.media with every `den`-th doc carrying a REAL encoded
    * PNG (identical-pixel triplets across groups of three real-arm
    * docs), the rest the text-byte stand-in. Encode runs distributed in
    * mapPartitions — at 100 TB the image fraction is produced where the
    * rows live, never collected. */
  def mixedMediaTable(spark: SparkSession, dir: String,
                      den: Int = 100): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"))
      .as[MediaRow]
      .mapPartitions { rows =>
        val md = MessageDigest.getInstance("MD5")
        rows.map { r =>
          if (r.doc_id >= 0 && r.doc_id % den == 0) {
            val group = r.doc_id / (3L * den)
            val img = new java.awt.image.BufferedImage(
              8, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
            for (pix <- 0 until 64) {
              val v = mixedGray(md, group, pix)
              img.setRGB(pix % 8, pix / 8, (v << 16) | (v << 8) | v)
            }
            val bos = new java.io.ByteArrayOutputStream()
            javax.imageio.ImageIO.write(img, "png", bos)
            MediaRow(r.doc_id, bos.toByteArray)
          } else r
        }
      }
  }

  /** Hash-once for the mixed face (SessionCache'd per (session, dir,
    * den) like the all-stub frames). */
  private[ops] def phash240MixedFrame(spark: SparkSession, dir: String,
                                      den: Int): DataFrame =
    graft.core.SessionCache.getOrBuild(spark, s"phash240mix$den", dir) {
      import spark.implicits._
      val planted = spark.createDataset(
        plantedPngs().map { case (id, b) => MediaRow(id, b) })
      phash240Of(mixedMediaTable(spark, dir, den).unionByName(planted))
    }

  /** The wide near-dup query over the mixed population — the face that
    * measures banding + decode cost with a real image fraction under
    * corpus load. */
  def phashNearDupMixed(spark: SparkSession, dir: String,
                        maxHamming: Int = 6, den: Int = 100): DataFrame =
    phash240PairsOf(phash240MixedFrame(spark, dir, den), maxHamming)

  /** Aggregate media stats by fake format — the "how much of each modality
    * do we have" query every dataset card needs. */
  def formatStats(spark: SparkSession, dir: String): DataFrame =
    features(spark, dir)
      .groupBy("format")
      .agg(count(lit(1)).as("n_media"),
        sum("n_bytes").as("total_bytes"),
        round(avg("width"), 4).as("avg_width"))
      .orderBy("format")
}
