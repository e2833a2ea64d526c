package graft.plans

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import graft.core.{Codec, Schemas}

/** Session-extension registration + native expression semantics. */
class GraftExtensionsSpec extends AnyFunSuite with BeforeAndAfterAll {

  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("GraftExtensionsSpec")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .withExtensions(new GraftExtensions) // applies when this JVM has no session yet
    .getOrCreate()

  override def beforeAll(): Unit = {
    spark.sparkContext.setLogLevel("WARN")
    GraftExtensions.install(spark) // reused session: register directly
  }

  test("graft_cosine is callable from SQL and matches the HOF formulation") {
    import spark.implicits._
    val df = Seq((Array(1.0, 2.0, 3.0), Array(2.0, 3.0, 4.0))).toDF("a", "b")
    df.createOrReplaceTempView("vecs")
    val native = spark.sql("SELECT graft_cosine(a, b) AS c FROM vecs").head().getDouble(0)
    val hof = df.select(graft.ops.Similarity.cosine(col("a"), col("b")).as("c")).head().getDouble(0)
    assert(native === hof)
    assert(math.abs(native - 20.0 / (math.sqrt(14) * math.sqrt(29))) < 1e-12)
  }

  test("graft_decode_frame decodes a golden quote frame in SQL") {
    import spark.implicits._
    val frame = Schemas.TickFrame(2, 1, "2885", 7L, 1704447000000L, 286550L,
      Some(10L), Some(286000L), Some(5000L), Some(1.5), Some(2.5),
      Some(285000L), Some(287500L), Some(284250L), Some(286000L))
    Seq(Codec.encode(frame)).toDF("payload").createOrReplaceTempView("frames")
    val row = spark.sql(
      """SELECT t.token, t.last_traded_price, t.volume, t.exchange_timestamp
        |FROM (SELECT graft_decode_frame(payload) AS t FROM frames)""".stripMargin).head()
    assert(row.getString(0) === "2885")
    assert(row.getDouble(1) === 2865.50)
    assert(row.getLong(2) === 5000L)
    assert(row.getTimestamp(3).getTime === 1704447000000L)
  }

  test("graft_decode_frame yields null for an invalid frame") {
    import spark.implicits._
    Seq(Array[Byte](1, 2, 3)).toDF("payload").createOrReplaceTempView("badframes")
    val row = spark.sql("SELECT graft_decode_frame(payload) AS t FROM badframes").head()
    assert(row.isNullAt(0))
  }

  test("graft_cosine rejects non-array-of-double input at analysis time") {
    import spark.implicits._
    Seq(("x", "y")).toDF("a", "b").createOrReplaceTempView("notvecs")
    val e = intercept[Exception] {
      spark.sql("SELECT graft_cosine(a, b) FROM notvecs").collect()
    }
    assert(e.getMessage.toLowerCase.contains("array") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"))
  }

  test("graft_md5long is bit-identical to the composite md5/conv formulation") {
    import spark.implicits._
    val strs = Seq("", "a", "hello world", "ß∂ƒ unicode ✓", "x" * 10000,
      "the quick brown fox", "2885", "\u0000nul") ++
      (1 to 200).map(i => s"doc $i shingle ${i * 37} text")
    val df = strs.toDF("s")
    val rows = df.select(
      graft.ops.TextHashing.md5Long(col("s")).as("native"),
      graft.ops.TextHashing.md5LongComposite(col("s")).as("composite")).collect()
    rows.foreach(r => assert(r.getLong(0) === r.getLong(1)))
    assert(rows.forall(_.getLong(0) >= 0L), "60-bit hash is non-negative")
    // and callable from SQL
    df.createOrReplaceTempView("md5strs")
    val viaSql = spark.sql("SELECT graft_md5long(s) FROM md5strs").collect().map(_.getLong(0))
    assert(viaSql.toSeq === rows.map(_.getLong(0)).toSeq)
  }

  test("graft_textstat: every fused stat is bit-identical to the declarative formulation") {
    import spark.implicits._
    import graft.plans.{GraftExtensions => gx, TextStatsExpr => ts}
    val stops = ts.StopWords.toSeq
    val strs = Seq(
      "", " ", "   ", "tiny", "the quick brown fox jumps over the lazy dog",
      "THE Quick BROWN of OF Of", "a A a", "to to to to",
      "tabs\tand\nnewlinesvertical\ffeed\rreturn end",
      "punct!!! 99 bottles-of-beer, §§§", "x" * 5000,
      "unicode ✓ KK kelvin Kthe", // Kelvin sign: lowers to 'k'
      "astral 😀 emoji the word", "word-with-hyphen and_under score",
      "trailing space ", " leading", "double  space   runs",
      "of and or in to the a") ++
      (1 to 150).map(i => s"doc $i with the number ${i * 37} AND some of IT")
    val df = strs.toDF("text")
    val ws = filter(split(lower(col("text")), "\\s+"), w => w =!= "")
    val rows = df.select(
      gx.textStat(col("text"), ts.NWords).as("f_words"),
      size(ws).cast("long").as("d_words"),
      gx.textStat(col("text"), ts.StopHits).as("f_hits"),
      size(filter(ws, w => w.isin(stops.map(lit): _*))).cast("long").as("d_hits"),
      bit_count(gx.textStat(col("text"), ts.StopMask)).cast("long").as("f_dstop"),
      size(array_distinct(filter(ws, w => w.isin(stops.map(lit): _*)))).cast("long").as("d_dstop"),
      gx.textStat(col("text"), ts.AlnumSpace).as("f_alnum"),
      length(regexp_replace(col("text"), "[^a-z0-9 ]", "")).cast("long").as("d_alnum"),
      gx.textStat(col("text"), ts.NonSpace).as("f_nonsp"),
      length(regexp_replace(col("text"), "\\s", "")).cast("long").as("d_nonsp"),
      col("text")).collect()
    rows.foreach { r =>
      val t = r.getString(10)
      assert(r.getLong(0) === r.getLong(1), s"n_words on '$t'")
      assert(r.getLong(2) === r.getLong(3), s"stop_hits on '$t'")
      assert(r.getLong(4) === r.getLong(5), s"n_stop_distinct on '$t'")
      assert(r.getLong(6) === r.getLong(7), s"alnum_space on '$t'")
      assert(r.getLong(8) === r.getLong(9), s"nonspace on '$t'")
    }
    // MarkerMask windows == the array_intersect(array_distinct(...))
    // scores the declarative langId computed, language by language
    // (extra marker-dense rows cover shared surface forms la/de)
    val mdf = (strs ++ Seq("la de el y es", "le la de et est ist und DER",
      "de de de la la")).toDF("text")
    val dws = array_distinct(filter(split(lower(col("text")), "\\s+"), w => w =!= ""))
    val mcols = ts.LangMarkers.zipWithIndex.flatMap { case ((code, markers), li) =>
      Seq(
        bit_count(shiftright(gx.textStat(col("text"), ts.MarkerMask), 5 * li)
          .bitwiseAND(lit(31L))).cast("long").as(s"f_$code"),
        size(array_intersect(dws, array(markers.map(lit): _*))).cast("long").as(s"d_$code"))
    }
    mdf.select(mcols :+ col("text"): _*).collect().foreach { r =>
      ts.LangMarkers.indices.foreach { li =>
        assert(r.getLong(2 * li) === r.getLong(2 * li + 1),
          s"lang ${ts.LangMarkers(li)._1} score on '${r.getString(8)}'")
      }
    }
    // null text null-propagates like the declarative chain
    val nr = Seq(Option.empty[String]).toDF("text")
      .select(gx.textStat(col("text"), ts.NWords)).head()
    assert(nr.isNullAt(0))
  }

  test("graft_norm_text is bit-identical to the declarative trim/regex chain") {
    import spark.implicits._
    import graft.plans.{GraftExtensions => gx}
    val strs = Seq(
      "", " ", "   ", "\t\n\r\f\u000B", "tiny", "Hello, World!",
      "  leading and trailing  ", "double  spaces   inside",
      "UPPER lower MiXeD 123", "punct!!! 99 bottles-of-beer, §§§",
      "a.b", "a. b", "a .b", " .a", "a. ", ".,;:!?", "0", "z",
      "tabs\tand\nnewlines\u000Bvertical\ffeed\rreturn end",
      "unicode ✓ KK kelvin Kthe", // Kelvin sign: lowers to 'k' — slow path
      "émigré café naïve", "astral 😀 emoji the word",
      "\u00A0nbsp is NOT java \\s\u00A0", "x" * 5000, "A" * 100 + "!" * 100) ++
      (1 to 150).map(i => s"Doc #$i, with THE number ${i * 37}...  and "
        + ("pad " * (i % 7)))
    val df = strs.toDF("text")
    val rows = df.select(
      gx.normText(col("text")).as("fused"),
      graft.ops.TextDedup.normalizedTextRef(col("text")).as("ref"),
      col("text")).collect()
    rows.foreach { r =>
      assert(r.getString(0) === r.getString(1),
        s"norm_text on '${r.getString(2).take(60)}'")
    }
    // null propagates like the declarative chain
    val nr = Seq(Option.empty[String]).toDF("text")
      .select(gx.normText(col("text"))).head()
    assert(nr.isNullAt(0))
  }

  test("graft_textstat charset stats are bit-identical to the regex formulations") {
    import spark.implicits._
    import graft.plans.{GraftExtensions => gx, TextStatsExpr => ts}
    val strs = Seq(
      "", "plain ascii", "tab\tand\nnewline\rkept", // tab/LF/CR excluded from control
      "ctl\u0001\u0002\u0003\u0008\u000B\u000C\u000E\u001F end",
      "non-ascii é ü ✓ 😀 mixed", "\uFFFD", "a\uFFFD\uFFFDb",
      "\u00A0\u00A0", "é" * 500, "x" * 5000,
      "replacement \uFFFD inside é and \u0007 bell") ++
      (1 to 100).map(i => s"doc $i " + ("é\uFFFD\u0001x " * (i % 5)))
    val df = strs.toDF("text")
    val rows = df.select(
      gx.textStat(col("text"), ts.NonAscii).as("f_na"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[^\\x00-\\x7F]", ""))).cast("long").as("d_na"),
      gx.textStat(col("text"), ts.ControlChars).as("f_cc"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]", "")))
        .cast("long").as("d_cc"),
      gx.textStat(col("text"), ts.ReplacementChars).as("f_rc"),
      (length(col("text")) -
        length(regexp_replace(col("text"), "\uFFFD", ""))).cast("long").as("d_rc"),
      col("text")).collect()
    rows.foreach { r =>
      val t = r.getString(6).take(40)
      assert(r.getLong(0) === r.getLong(1), s"non_ascii on '$t'")
      assert(r.getLong(2) === r.getLong(3), s"control_chars on '$t'")
      assert(r.getLong(4) === r.getLong(5), s"replacement_chars on '$t'")
    }
  }

  test("a 283-byte depth superset frame decodes through SQL (quote fields kept)") {
    import spark.implicits._
    val depth = Schemas.TickFrame(4, 1, "2885", 9L, 1704447000000L, 286550L,
      Some(10L), Some(286000L), Some(5000L), Some(1.5), Some(2.5),
      Some(285000L), Some(287500L), Some(284250L), Some(286000L),
      depth = Some(Schemas.BestFive(
        (1 to 5).map(i => Schemas.DepthLevel(i * 10L, 286550L - i)),
        (1 to 5).map(i => Schemas.DepthLevel(i * 9L, 286550L + i)))))
    Seq(Codec.encode(depth)).toDF("payload").createOrReplaceTempView("depthframes")
    val row = spark.sql(
      "SELECT t.token, t.subscription_mode, t.volume FROM (SELECT graft_decode_frame(payload) AS t FROM depthframes)").head()
    assert(row.getString(0) === "2885")
    assert(row.getInt(1) === 4)
    assert(row.getLong(2) === 5000L)
  }

  test("an LTP-mode frame decodes with null quote fields") {
    import spark.implicits._
    val ltp = Schemas.TickFrame(1, 3, "9999", 1L, 1704447000000L, 12345L,
      None, None, None, None, None, None, None, None, None)
    Seq(Codec.encode(ltp)).toDF("payload").createOrReplaceTempView("ltpframes")
    val row = spark.sql(
      "SELECT t.last_traded_price, t.volume FROM (SELECT graft_decode_frame(payload) AS t FROM ltpframes)").head()
    assert(row.getDouble(0) === 123.45)
    assert(row.isNullAt(1))
  }
}
