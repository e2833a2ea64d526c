package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import graft.core.Codec

/** Native expression form of the binary tick decoder (SURVEY §4.3): makes
  * the wire format queryable from SQL — `graft_decode_frame(payload)`
  * returns a struct (null for invalid frames), so a raw frame table can be
  * decoded + filtered + aggregated in one codegen'd scan without a typed
  * Dataset round-trip.
  *
  * CodegenFallback: the decode is one virtual call per row into the same
  * pure-Scala codec the typed path uses (byte-layout logic lives in ONE
  * place, /root/repo/src/main/scala/graft/core/Codec.scala); the
  * surrounding projection still codegens.
  */
case class DecodeTickFrameExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == BinaryType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_decode_frame requires binary input, got ${child.dataType}")

  override def nullable: Boolean = true

  override def prettyName: String = "graft_decode_frame"

  override val dataType: DataType = DecodeTickFrameExpr.schema

  override protected def nullSafeEval(input: Any): Any = {
    Codec.decode(input.asInstanceOf[Array[Byte]]) match {
      case Left(_) => null
      case Right(f) =>
        InternalRow(
          f.subscriptionMode,
          f.exchangeType,
          UTF8String.fromString(f.token),
          f.sequenceNumber,
          f.exchangeTimestampMs * 1000L, // TimestampType is micros
          Codec.paiseToRupees(f.lastTradedPricePaise),
          f.lastTradedQuantity.orNull,
          f.averageTradedPricePaise.map(Codec.paiseToRupees).orNull,
          f.volume.orNull,
          f.totalBuyQuantity.orNull,
          f.totalSellQuantity.orNull,
          f.openPricePaise.map(Codec.paiseToRupees).orNull,
          f.highPricePaise.map(Codec.paiseToRupees).orNull,
          f.lowPricePaise.map(Codec.paiseToRupees).orNull,
          f.closePricePaise.map(Codec.paiseToRupees).orNull)
    }
  }

  override protected def withNewChildInternal(newChild: Expression): DecodeTickFrameExpr =
    copy(child = newChild)
}

object DecodeTickFrameExpr {
  val schema: StructType = StructType(Seq(
    StructField("subscription_mode", IntegerType, nullable = false),
    StructField("exchange_type", IntegerType, nullable = false),
    StructField("token", StringType, nullable = false),
    StructField("sequence_number", LongType, nullable = false),
    StructField("exchange_timestamp", TimestampType, nullable = false),
    StructField("last_traded_price", DoubleType, nullable = false),
    StructField("last_traded_quantity", LongType, nullable = true),
    StructField("average_traded_price", DoubleType, nullable = true),
    StructField("volume", LongType, nullable = true),
    StructField("total_buy_quantity", DoubleType, nullable = true),
    StructField("total_sell_quantity", DoubleType, nullable = true),
    StructField("open_price", DoubleType, nullable = true),
    StructField("high_price", DoubleType, nullable = true),
    StructField("low_price", DoubleType, nullable = true),
    StructField("close_price", DoubleType, nullable = true)))
}
