package graft.core

import org.scalatest.funsuite.AnyFunSuite
import graft.core.Schemas.TickFrame

/** Golden-frame tests for the binary codec (layout: SURVEY.md §1.2a,
  * fixtures: FIXTURES.md §1). */
class CodecSpec extends AnyFunSuite {

  private val quoteFrame = TickFrame(
    subscriptionMode = 2, exchangeType = 1, token = "2885",
    sequenceNumber = 1234567L, exchangeTimestampMs = 1704447000000L,
    lastTradedPricePaise = 286550L,
    lastTradedQuantity = Some(10L), averageTradedPricePaise = Some(286000L),
    volume = Some(5000L), totalBuyQuantity = Some(120.5), totalSellQuantity = Some(80.25),
    openPricePaise = Some(285000L), highPricePaise = Some(287500L),
    lowPricePaise = Some(284250L), closePricePaise = Some(286000L))

  private val ltpFrame = TickFrame(
    subscriptionMode = 1, exchangeType = 3, token = "9999",
    sequenceNumber = 42L, exchangeTimestampMs = 1704447060000L,
    lastTradedPricePaise = 12345L,
    None, None, None, None, None, None, None, None, None)

  test("golden quote frame: 123 bytes, all fields round-trip") {
    val bytes = Codec.encode(quoteFrame)
    assert(bytes.length === Codec.QuoteFrameLen)
    val decoded = Codec.decode(bytes)
    assert(decoded === Right(quoteFrame))
  }

  test("golden LTP frame: 51 bytes, quote fields absent") {
    val bytes = Codec.encode(ltpFrame)
    assert(bytes.length === Codec.LtpFrameLen)
    assert(Codec.decode(bytes) === Right(ltpFrame))
  }

  private val depthFrame = quoteFrame.copy(
    subscriptionMode = 4,
    depth = Some(Schemas.BestFive(
      buy = (1 to 5).map(i => Schemas.DepthLevel(100L * i, 286550L - 5 * i)),
      sell = (1 to 5).map(i => Schemas.DepthLevel(90L * i, 286550L + 5 * i)))))

  test("golden depth frame: 283 bytes, best-five ladder round-trips") {
    val bytes = Codec.encode(depthFrame)
    assert(bytes.length === Codec.DepthFrameLen)
    assert(Codec.decode(bytes) === Right(depthFrame))
  }

  test("reference-style 123-byte mode-4 frame decodes with depth absent") {
    // the reference's parser emits quote-layout frames for mode 4
    // (/root/reference/parser/binary.go:63-73); the superset must accept them
    val bytes = Codec.encode(quoteFrame.copy(subscriptionMode = 4))
    assert(bytes.length === Codec.QuoteFrameLen)
    val decoded = Codec.decode(bytes)
    assert(decoded.map(_.subscriptionMode) === Right(4))
    assert(decoded.map(_.depth) === Right(None))
    assert(decoded.map(_.volume) === Right(quoteFrame.volume))
  }

  test("truncated depth tail is rejected, not silently dropped") {
    val bytes = Codec.encode(depthFrame)
    assert(Codec.decode(bytes.take(282)).isLeft, "one byte short of the ladder")
    assert(Codec.decode(bytes.take(124)).isLeft, "one byte past the quote layout")
    assert(Codec.decode(bytes.take(123)).isRight, "exact quote layout stays valid")
  }

  test("depth tail on a non-depth mode is rejected at encode") {
    assertThrows[IllegalArgumentException] {
      Codec.encode(depthFrame.copy(subscriptionMode = 2))
    }
  }

  test("paise scaling: 286550 paise = 2865.50 rupees (FIXTURES.md golden)") {
    assert(Codec.paiseToRupees(286550L) === 2865.50)
    assert(Codec.paiseToRupees(-150L) === -1.50)
  }

  test("token NUL-right-trim: token shorter than 25 bytes decodes cleanly") {
    val bytes = Codec.encode(quoteFrame.copy(token = "AB"))
    assert(Codec.decode(bytes).map(_.token) === Right("AB"))
  }

  test("token of exactly 25 bytes (no NUL terminator) decodes fully") {
    val tok = "A" * 25
    val bytes = Codec.encode(quoteFrame.copy(token = tok))
    assert(Codec.decode(bytes).map(_.token) === Right(tok))
  }

  test("short frame is rejected, not zero-filled (unlike the reference)") {
    val bytes = Codec.encode(quoteFrame)
    assert(Codec.decode(bytes.take(50)).isLeft)   // below LTP length
    assert(Codec.decode(bytes.take(100)).isLeft)  // quote mode, below 123
    assert(Codec.decode(Array.emptyByteArray).isLeft)
    assert(Codec.decode(null).isLeft)
  }

  test("LTP-length slice of a quote frame decodes if mode says LTP") {
    // a 51-byte frame with mode=1 is valid even if more data was truncated
    val bytes = Codec.encode(ltpFrame)
    assert(Codec.decode(bytes).isRight)
  }

  test("unknown subscription mode rejected") {
    val bytes = Codec.encode(quoteFrame)
    bytes(0) = 9
    assert(Codec.decode(bytes).isLeft)
    bytes(0) = 0
    assert(Codec.decode(bytes).isLeft)
  }

  test("mode 3 (SnapQuote) decodes the quote-mode fields") {
    val bytes = Codec.encode(quoteFrame.copy(subscriptionMode = 3))
    assert(Codec.decode(bytes).map(_.volume) === Right(Some(5000L)))
  }
}
