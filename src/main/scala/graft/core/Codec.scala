package graft.core

import java.nio.{ByteBuffer, ByteOrder}
import java.nio.charset.StandardCharsets
import Schemas.{BestFive, DepthLevel, TickFrame}

/** Binary tick-frame codec (pure Scala, no Spark dependency).
  *
  * Wire layout from /root/reference/parser/binary.go:47-76 (little-endian):
  *   off 0  u8   subscription mode (1=LTP 2=Quote 3=SnapQuote 4=Depth)
  *   off 1  u8   exchange type
  *   off 2  25B  token, NUL-right-padded char[25]
  *   off 27 i64  sequence number
  *   off 35 i64  exchange timestamp (epoch ms)
  *   off 43 i64  last traded price (paise)        -- LTP frame ends at 51
  *   off 51 i64  last traded quantity             -- mode >= 2 only:
  *   off 59 i64  average traded price (paise)
  *   off 67 i64  volume
  *   off 75 f64  total buy quantity
  *   off 83 f64  total sell quantity
  *   off 91 i64  open (paise)
  *   off 99 i64  high (paise)
  *   off 107 i64 low (paise)
  *   off 115 i64 close (paise)                    -- Quote frame = 123 bytes
  *
  * Unlike the reference (which ignores binary.Read errors and silently
  * zero-fills short frames), decode validates the frame length and returns
  * Left with a reason — SURVEY.md §7.4.1.
  *
  * Depth superset (mode 4): the reference declares Depth
  * (/root/reference/models/token.go:16-18) but decodes only the Quote tail
  * (/root/reference/parser/binary.go:63-73). This engine defines the
  * best-five layout as a strict extension:
  *   off 123 .. 202  5 buy  levels x (i64 quantity, i64 price paise)
  *   off 203 .. 282  5 sell levels x (i64 quantity, i64 price paise)
  * Depth frame = 283 bytes. A 123-byte mode-4 frame (what the reference
  * emits) still decodes — depth is simply None — so parity is preserved.
  */
object Codec {

  val LtpFrameLen = 51
  val QuoteFrameLen = 123
  val DepthLevels = 5
  val DepthFrameLen = QuoteFrameLen + 2 * DepthLevels * 16 // 283
  val TokenLen = 25

  def decode(bytes: Array[Byte]): Either[String, TickFrame] = {
    if (bytes == null || bytes.length < LtpFrameLen)
      return Left(s"frame too short: ${if (bytes == null) -1 else bytes.length} < $LtpFrameLen")
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    val mode = buf.get(0) & 0xff
    val exchange = buf.get(1) & 0xff
    if (mode < 1 || mode > 4) return Left(s"unknown subscription mode: $mode")
    val wantLen = if (mode >= 2) QuoteFrameLen else LtpFrameLen
    if (bytes.length < wantLen)
      return Left(s"frame too short for mode $mode: ${bytes.length} < $wantLen")
    // a depth frame is either reference-style (exactly the Quote layout)
    // or carries the full best-five tail — anything between is a
    // truncated ladder, and this codec rejects instead of silently
    // dropping data (its contract vs the reference's zero-fill)
    if (mode == 4 && bytes.length > QuoteFrameLen && bytes.length < DepthFrameLen)
      return Left(
        s"truncated depth frame: ${bytes.length} (want $QuoteFrameLen or >= $DepthFrameLen)")

    // NUL-right-trim of the fixed char[25] token (parser/binary.go:55-57)
    var tokEnd = 2
    while (tokEnd < 2 + TokenLen && bytes(tokEnd) != 0) tokEnd += 1
    val token = new String(bytes, 2, tokEnd - 2, StandardCharsets.UTF_8)

    val seq = buf.getLong(27)
    val ts = buf.getLong(35)
    val ltp = buf.getLong(43)
    val depth =
      if (mode == 4 && bytes.length >= DepthFrameLen) {
        def side(base: Int): Seq[DepthLevel] =
          (0 until DepthLevels).map(i =>
            DepthLevel(buf.getLong(base + i * 16), buf.getLong(base + i * 16 + 8)))
        Some(BestFive(side(QuoteFrameLen), side(QuoteFrameLen + DepthLevels * 16)))
      } else None
    val frame =
      if (mode >= 2)
        TickFrame(mode, exchange, token, seq, ts, ltp,
          lastTradedQuantity = Some(buf.getLong(51)),
          averageTradedPricePaise = Some(buf.getLong(59)),
          volume = Some(buf.getLong(67)),
          totalBuyQuantity = Some(buf.getDouble(75)),
          totalSellQuantity = Some(buf.getDouble(83)),
          openPricePaise = Some(buf.getLong(91)),
          highPricePaise = Some(buf.getLong(99)),
          lowPricePaise = Some(buf.getLong(107)),
          closePricePaise = Some(buf.getLong(115)),
          depth = depth)
      else
        TickFrame(mode, exchange, token, seq, ts, ltp,
          None, None, None, None, None, None, None, None, None)
    Right(frame)
  }

  /** Inverse of decode — used by the ScalaCheck round-trip property and the
    * streaming-test fixture generator. */
  def encode(f: TickFrame): Array[Byte] = {
    require(f.token.getBytes(StandardCharsets.UTF_8).length <= TokenLen,
      s"token longer than $TokenLen bytes: ${f.token}")
    f.depth.foreach { d =>
      require(f.subscriptionMode == 4, "depth tail is only valid on mode-4 frames")
      require(d.buy.length == DepthLevels && d.sell.length == DepthLevels,
        s"best-five depth requires exactly $DepthLevels levels per side")
    }
    val len =
      if (f.depth.isDefined) DepthFrameLen
      else if (f.subscriptionMode >= 2) QuoteFrameLen
      else LtpFrameLen
    val buf = ByteBuffer.allocate(len).order(ByteOrder.LITTLE_ENDIAN)
    buf.put(0, f.subscriptionMode.toByte)
    buf.put(1, f.exchangeType.toByte)
    val tok = f.token.getBytes(StandardCharsets.UTF_8)
    System.arraycopy(tok, 0, buf.array(), 2, tok.length) // rest stays NUL
    buf.putLong(27, f.sequenceNumber)
    buf.putLong(35, f.exchangeTimestampMs)
    buf.putLong(43, f.lastTradedPricePaise)
    if (f.subscriptionMode >= 2) {
      buf.putLong(51, f.lastTradedQuantity.getOrElse(0L))
      buf.putLong(59, f.averageTradedPricePaise.getOrElse(0L))
      buf.putLong(67, f.volume.getOrElse(0L))
      buf.putDouble(75, f.totalBuyQuantity.getOrElse(0.0))
      buf.putDouble(83, f.totalSellQuantity.getOrElse(0.0))
      buf.putLong(91, f.openPricePaise.getOrElse(0L))
      buf.putLong(99, f.highPricePaise.getOrElse(0L))
      buf.putLong(107, f.lowPricePaise.getOrElse(0L))
      buf.putLong(115, f.closePricePaise.getOrElse(0L))
    }
    f.depth.foreach { d =>
      def side(base: Int, levels: Seq[DepthLevel]): Unit =
        levels.zipWithIndex.foreach { case (l, i) =>
          buf.putLong(base + i * 16, l.quantity)
          buf.putLong(base + i * 16 + 8, l.pricePaise)
        }
      side(QuoteFrameLen, d.buy)
      side(QuoteFrameLen + DepthLevels * 16, d.sell)
    }
    buf.array()
  }

  /** paise → rupees (/root/reference/parser/binary.go:27-45). */
  @inline def paiseToRupees(p: Long): Double = p / 100.0
}
