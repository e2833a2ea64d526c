package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.Schemas.{BestFive, DepthLevel, TickFrame}

/** ScalaCheck properties: encode∘decode identity and decoder totality
  * (SURVEY §5.2). Raw ScalaCheck runner (no scalatestplus bridge in the
  * offline dependency set). */
class CodecPropertySpec extends AnyFunSuite {

  private def check(prop: Prop, name: String): Unit = {
    val result = SCTest.check(SCTest.Parameters.default.withMinSuccessfulTests(200), prop)
    assert(result.passed, s"$name: $result")
  }

  private val tokenGen: Gen[String] =
    Gen.chooseNum(1, 25).flatMap(n =>
      Gen.listOfN(n, Gen.alphaNumChar).map(_.mkString))

  private val frameGen: Gen[TickFrame] = for {
    mode <- Gen.oneOf(1, 2, 3, 4)
    exch <- Gen.oneOf(1, 2, 3, 4, 5, 7, 13)
    token <- tokenGen
    seq <- Gen.chooseNum(0L, Long.MaxValue)
    ts <- Gen.chooseNum(0L, 4102444800000L)
    ltp <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    ltq <- Gen.chooseNum(0L, Long.MaxValue)
    atp <- Gen.chooseNum(0L, Long.MaxValue)
    vol <- Gen.chooseNum(0L, Long.MaxValue)
    tbq <- Gen.chooseNum(0.0, 1e12)
    tsq <- Gen.chooseNum(0.0, 1e12)
    o <- Gen.chooseNum(0L, Long.MaxValue)
    h <- Gen.chooseNum(0L, Long.MaxValue)
    l <- Gen.chooseNum(0L, Long.MaxValue)
    c <- Gen.chooseNum(0L, Long.MaxValue)
  } yield
    if (mode >= 2)
      TickFrame(mode, exch, token, seq, ts, ltp, Some(ltq), Some(atp), Some(vol),
        Some(tbq), Some(tsq), Some(o), Some(h), Some(l), Some(c))
    else
      TickFrame(mode, exch, token, seq, ts, ltp,
        None, None, None, None, None, None, None, None, None)

  test("encode then decode is identity for any generated frame") {
    check(Prop.forAll(frameGen) { frame =>
      Codec.decode(Codec.encode(frame)) == Right(frame)
    }, "round-trip")
  }

  private val levelGen: Gen[DepthLevel] = for {
    q <- Gen.chooseNum(0L, Long.MaxValue)
    p <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
  } yield DepthLevel(q, p)

  private val depthFrameGen: Gen[TickFrame] = for {
    base <- frameGen
    buy <- Gen.listOfN(Codec.DepthLevels, levelGen)
    sell <- Gen.listOfN(Codec.DepthLevels, levelGen)
  } yield {
    // promote any generated frame to a full mode-4 depth frame
    val quote = if (base.subscriptionMode >= 2) base else base.copy(
      lastTradedQuantity = Some(0L), averageTradedPricePaise = Some(0L),
      volume = Some(0L), totalBuyQuantity = Some(0.0), totalSellQuantity = Some(0.0),
      openPricePaise = Some(0L), highPricePaise = Some(0L),
      lowPricePaise = Some(0L), closePricePaise = Some(0L))
    quote.copy(subscriptionMode = 4, depth = Some(BestFive(buy, sell)))
  }

  test("encode then decode is identity for depth (mode-4 superset) frames") {
    check(Prop.forAll(depthFrameGen) { frame =>
      Codec.decode(Codec.encode(frame)) == Right(frame)
    }, "depth round-trip")
  }

  test("decoder is total on arbitrary byte arrays (never throws)") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { l =>
      Codec.decode(l.toArray)
      true
    }, "totality")
  }
}
