package graft.core

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.core.Schemas.TickFrame

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

  test("decoder is total on arbitrary byte arrays (never throws)") {
    check(Prop.forAll(Gen.listOf(Gen.chooseNum(Byte.MinValue, Byte.MaxValue))) { l =>
      Codec.decode(l.toArray)
      true
    }, "totality")
  }
}
