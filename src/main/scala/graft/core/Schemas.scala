package graft.core

import org.apache.spark.sql.types._
import java.sql.Timestamp

/** Canonical record shapes for the market-tick pipeline.
  *
  * Derived from the reference wire format (/root/reference/parser/binary.go:8-24)
  * and storage DDL (/root/reference/db/clickhouse.go:16-28), upgraded per
  * SURVEY.md §0.1: we keep sequence_number and exchange_timestamp (the
  * reference parses then drops them) so event-time semantics are possible.
  */
object Schemas {

  /** Raw wire frame, fixed-point paise prices, exactly as decoded off the
    * binary layout (little-endian; 51-byte LTP frame, 123-byte Quote frame).
    * Quote-only fields are Options: an LTP frame simply doesn't carry them
    * (/root/reference/parser/binary.go:63-73 mode-conditional tail).
    */
  final case class TickFrame(
      subscriptionMode: Int,       // 1=LTP 2=Quote 3=SnapQuote 4=Depth
      exchangeType: Int,           // 1=NSE_CM ... 13=CDE_FO
      token: String,               // char[25] NUL-right-trimmed
      sequenceNumber: Long,
      exchangeTimestampMs: Long,   // epoch millis
      lastTradedPricePaise: Long,
      lastTradedQuantity: Option[Long],
      averageTradedPricePaise: Option[Long],
      volume: Option[Long],
      totalBuyQuantity: Option[Double],
      totalSellQuantity: Option[Double],
      openPricePaise: Option[Long],
      highPricePaise: Option[Long],
      lowPricePaise: Option[Long],
      closePricePaise: Option[Long],
      depth: Option[BestFive] = None // mode-4 superset tail (see Codec)
  )

  /** One price level of a depth ladder (fixed-point paise price). */
  final case class DepthLevel(quantity: Long, pricePaise: Long)

  /** Best-five order-book ladder — the SUPERSET extension for Depth
    * (mode 4) frames: the reference declares the mode
    * (/root/reference/models/token.go:16-18) but its parser never decodes
    * a depth tail (/root/reference/parser/binary.go:63-73), so this engine
    * defines the layout (Codec scaladoc). Exactly five levels per side. */
  final case class BestFive(buy: Seq[DepthLevel], sell: Seq[DepthLevel])

  /** Storage/query row: rupee-scaled doubles (paise ÷ 100,
    * /root/reference/parser/binary.go:27-45), event + ingest timestamps.
    */
  final case class Tick(
      token: String,
      symbol: Option[String],
      exchange_type: Int,
      subscription_mode: Int,
      sequence_number: Long,
      exchange_timestamp: Timestamp,
      ingest_timestamp: Timestamp,
      last_traded_price: Double,
      last_traded_quantity: Option[Long],
      average_traded_price: Option[Double],
      open_price: Option[Double],
      high_price: Option[Double],
      low_price: Option[Double],
      close_price: Option[Double],
      volume: Option[Long],
      total_buy_quantity: Option[Double],
      total_sell_quantity: Option[Double]
  )

  /** Instrument config row (/root/reference/config/tokens.json,
    * /root/reference/models/token.go:3-7). */
  final case class TokenConfig(symbol: String, token: String, exchange: String)

  /** Exchange name -> wire code (/root/reference/models/token.go:21-27). */
  val ExchangeCodes: Map[String, Int] = Map(
    "NSE_CM" -> 1, "NSE_FO" -> 2, "BSE_CM" -> 3, "BSE_FO" -> 4,
    "MCX_FO" -> 5, "NCX_FO" -> 7, "CDE_FO" -> 13
  )

  val tokenConfigSchema: StructType = StructType(Seq(
    StructField("symbol", StringType, nullable = false),
    StructField("token", StringType, nullable = false),
    StructField("exchange", StringType, nullable = false)
  ))

  val tickSchema: StructType = StructType(Seq(
    StructField("token", StringType, nullable = false),
    StructField("symbol", StringType, nullable = true),
    StructField("exchange_type", IntegerType, nullable = false),
    StructField("subscription_mode", IntegerType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("exchange_timestamp", TimestampType, nullable = false),
    StructField("ingest_timestamp", TimestampType, nullable = false),
    StructField("last_traded_price", DoubleType, nullable = false),
    StructField("last_traded_quantity", LongType, nullable = true),
    StructField("average_traded_price", DoubleType, nullable = true),
    StructField("open_price", DoubleType, nullable = true),
    StructField("high_price", DoubleType, nullable = true),
    StructField("low_price", DoubleType, nullable = true),
    StructField("close_price", DoubleType, nullable = true),
    StructField("volume", LongType, nullable = true),
    StructField("total_buy_quantity", DoubleType, nullable = true),
    StructField("total_sell_quantity", DoubleType, nullable = true)
  ))
}
