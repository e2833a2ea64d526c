package graft.ingest

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{Codec, Schemas}
import graft.core.Schemas.Tick
import java.sql.Timestamp

/** Wire-frame decoding stage: Dataset[Array[Byte]] -> Dataset[Tick].
  *
  * Typed map over the binary payload (SURVEY §2.1 S2): the decoder is pure
  * Scala (graft.core.Codec) so it unit-tests without a cluster and runs
  * identically in batch and streaming. Short/invalid frames are dropped and
  * counted via an accumulator rather than silently zero-filled like the
  * reference (/root/reference/parser/binary.go:47-76 ignores read errors).
  */
object TickDecoder {

  /** Decode frames; invalid frames increment the "graft.decode.errors"
    * accumulator and are dropped (at-least-once ingest keeps flowing). */
  def decode(spark: SparkSession, frames: Dataset[Array[Byte]]): Dataset[Tick] = {
    import spark.implicits._
    val errors = spark.sparkContext.longAccumulator("graft.decode.errors")
    frames.flatMap { bytes =>
      Codec.decode(bytes) match {
        case Left(_) =>
          errors.add(1L)
          None
        case Right(f) =>
          val ingestTs = new Timestamp(System.currentTimeMillis())
          Some(Tick(
            token = f.token,
            symbol = None, // enrichment joins the symbol later
            exchange_type = f.exchangeType,
            subscription_mode = f.subscriptionMode,
            sequence_number = f.sequenceNumber,
            exchange_timestamp = new Timestamp(f.exchangeTimestampMs),
            ingest_timestamp = ingestTs,
            last_traded_price = Codec.paiseToRupees(f.lastTradedPricePaise),
            last_traded_quantity = f.lastTradedQuantity,
            average_traded_price = f.averageTradedPricePaise.map(Codec.paiseToRupees),
            open_price = f.openPricePaise.map(Codec.paiseToRupees),
            high_price = f.highPricePaise.map(Codec.paiseToRupees),
            low_price = f.lowPricePaise.map(Codec.paiseToRupees),
            close_price = f.closePricePaise.map(Codec.paiseToRupees),
            volume = f.volume,
            total_buy_quantity = f.totalBuyQuantity,
            total_sell_quantity = f.totalSellQuantity))
      }
    }
  }
}
