package graft.streaming

import graft.SparkSpec
import graft.core.Schemas.Tick
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Stream-stream enrichment: in-window updates match, out-of-window ticks
  * emit null-padded once the watermark closes their window. */
class StreamJoinsSpec extends SparkSpec {

  private val T0 = 1704447000000L

  private def tick(token: String, seq: Long, tsMs: Long): Tick =
    Tick(token, None, 1, 2, seq, new Timestamp(tsMs), new Timestamp(tsMs),
      100.0, Some(1L), Some(100.0), Some(100.0), Some(100.0), Some(100.0),
      Some(100.0), Some(10L), Some(1.0), Some(1.0))

  test("ticks join in-window metadata updates; unmatched emit null-padded") {
    import spark.implicits._
    implicit val ctx = spark.sqlContext
    val ticks = MemoryStream[Tick]
    val updates = MemoryStream[(String, String, Timestamp)]
    val joined = StreamJoins.enrichWithUpdates(
      ticks.toDF(),
      updates.toDS().toDF("token", "meta", "updated_at"),
      joinWindow = "10 minutes", watermark = "1 minute")
      .select("token", "sequence_number", "meta")
    val q = joined.writeStream.format("memory").queryName("ssj_test")
      .outputMode("append").start()

    // update for A at T0; ticks at T0+2min: A (in-window) and B (no update)
    updates.addData(("A", "lot=50", new Timestamp(T0)))
    ticks.addData(tick("A", 1, T0 + 120000), tick("B", 1, T0 + 120000))
    q.processAllAvailable()
    // push both watermarks far past the join window so B's null row flushes
    updates.addData(("Z", "x", new Timestamp(T0 + 3600000)))
    ticks.addData(tick("Z", 9, T0 + 3600000))
    q.processAllAvailable()
    q.stop()

    val rows = spark.table("ssj_test").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getString(2)))
    assert(rows.contains(("A", 1L, "lot=50")), "in-window update must enrich")
    assert(rows.contains(("B", 1L, null)), "no-update tick must emit null-padded")
    val aRows = rows.filter(r => r._1 == "A" && r._2 == 1L)
    assert(aRows.length === 1, "exactly one update in window -> exactly one row")
  }
}
