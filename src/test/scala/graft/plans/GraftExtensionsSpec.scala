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
