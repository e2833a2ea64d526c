package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import java.nio.charset.StandardCharsets

/** Broker auth handshake (SURVEY §2.1 S5): RFC 6238 TOTP + the login
  * exchange, against an in-process stub broker. No Spark involved —
  * credentials never enter the engine. */
class BrokerAuthSpec extends AnyFunSuite {

  // RFC 4226 appendix D test key, as base32
  private val rfcKeyAscii = "12345678901234567890"
  private val rfcKeyB32 = "GEZDGNBVGY3TQOJQGEZDGNBVGY3TQOJQ"

  test("base32 decode round-trips the RFC test key (padding/case tolerated)") {
    assert(new String(BrokerAuth.base32Decode(rfcKeyB32), StandardCharsets.US_ASCII)
      === rfcKeyAscii)
    assert(new String(BrokerAuth.base32Decode("mfrgg==="), StandardCharsets.US_ASCII)
      === "abc")
  }

  test("TOTP matches the RFC 6238 SHA-1 test vectors") {
    // RFC 6238 Appendix B, 8-digit codes, key = ASCII "1234...90"
    val vectors = Seq(
      59L -> "94287082",
      1111111109L -> "07081804",
      1111111111L -> "14050471",
      1234567890L -> "89005924",
      2000000000L -> "69279037",
      20000000000L -> "65353130")
    vectors.foreach { case (t, expect) =>
      assert(BrokerAuth.totp(rfcKeyB32, t, digits = 8) === expect, s"t=$t")
    }
    // 6-digit truncations of the same vectors (what the broker consumes)
    assert(BrokerAuth.totp(rfcKeyB32, 59L) === "287082")
  }

  test("login request mirrors the reference: url path, headers, body fields") {
    val cfg = BrokerAuthConfig(
      "https://broker.example/", "C123", "pin42", "apikey-7", rfcKeyB32)
    val (url, headers, body) = BrokerAuth.loginRequest(cfg, "123456")
    assert(url === "https://broker.example/rest/auth/angelbroking/user/v1/loginByPassword")
    assert(headers("X-PrivateKey") === "apikey-7")
    assert(headers("X-UserType") === "USER")
    assert(headers("X-SourceID") === "WEB")
    assert(headers("Content-Type") === "application/json")
    assert(body === """{"clientcode":"C123","password":"pin42","totp":"123456"}""")
  }

  test("authenticate: full exchange against a stub broker, success and decline") {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    val server = HttpServer.create(new java.net.InetSocketAddress(0), 0)
    @volatile var seenBody = ""
    @volatile var seenTotp = ""
    @volatile var decline = false
    server.createContext("/rest/auth/angelbroking/user/v1/loginByPassword",
      (ex: HttpExchange) => {
        seenBody = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
        seenTotp = ex.getRequestHeaders.getFirst("X-PrivateKey")
        val resp =
          if (decline) """{"status":false,"message":"Invalid totp","data":{}}"""
          else """{"status":true,"message":"SUCCESS",""" +
            """"data":{"jwtToken":"jwt-1","feedToken":"feed-1"}}"""
        val bytes = resp.getBytes(StandardCharsets.UTF_8)
        ex.getResponseHeaders.set("Content-Type", "application/json")
        ex.sendResponseHeaders(200, bytes.length)
        ex.getResponseBody.write(bytes)
        ex.close()
      })
    server.start()
    try {
      val cfg = BrokerAuthConfig(
        s"http://127.0.0.1:${server.getAddress.getPort}",
        "C9", "pin", "key-abc", rfcKeyB32)
      val fixedNow = () => 59L // pin the TOTP window for a deterministic body
      assert(BrokerAuth.authenticate(cfg, fixedNow)
        === Right(BrokerAuth.BrokerTokens("jwt-1", "feed-1")))
      assert(seenBody.contains(""""totp":"287082""""),
        s"body must carry the RFC-vector TOTP for t=59: $seenBody")
      assert(seenTotp === "key-abc", "api key must travel as X-PrivateKey")

      decline = true
      val denied = BrokerAuth.authenticate(cfg, fixedNow)
      assert(denied === Left("authentication failed: Invalid totp"))

      // the tokens then become exactly the reference's WS connect headers
      val ws = cfg.wsHeaders("jwt-1", "feed-1")
      assert(ws("Authorization") === "Bearer jwt-1")
      assert(ws("X-Feed-Token") === "feed-1")
    } finally server.stop(0)
  }

  test("malformed / empty responses surface as Left, never throw") {
    assert(BrokerAuth.parseLoginResponse("not json").isLeft)
    assert(BrokerAuth.parseLoginResponse("""{"status":true,"data":{}}""").isLeft)
    assert(BrokerAuth.parseLoginResponse("""{}""").isLeft)
  }
}
