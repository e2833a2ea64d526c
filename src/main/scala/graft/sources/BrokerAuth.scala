package graft.sources

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import javax.crypto.Mac
import javax.crypto.spec.SecretKeySpec

/** The broker REST auth handshake (SURVEY §2.1 S5) — the Spark-native
  * counterpart of /root/reference/angel/auth.go:20-65, upgraded in one
  * way: the reference expects a PRE-GENERATED TOTP code in its
  * environment, while this derives the code from the shared secret via
  * RFC 6238 (SHA-1, 30 s step, 6 digits — the broker's documented
  * parameters), so the config seam ([[BrokerAuthConfig]]) carries the
  * secret once instead of a fresh code per login.
  *
  * Engine-scope boundary: nothing here touches Spark. A deployment calls
  * `authenticate` on the driver, gets (jwtToken, feedToken), and hands
  * `BrokerAuthConfig.wsHeaders(...)` to the websocket source as
  * `header.*` options — credentials never enter the query engine. */
object BrokerAuth {

  final case class BrokerTokens(jwtToken: String, feedToken: String)

  /** RFC 4648 base32 decode (what authenticator apps store the shared
    * secret as); tolerant of padding, spaces and case. */
  def base32Decode(s: String): Array[Byte] = {
    val alphabet = "ABCDEFGHIJKLMNOPQRSTUVWXYZ234567"
    val clean = s.toUpperCase.filterNot(c => c == '=' || c == ' ')
    var buffer = 0L
    var bits = 0
    val out = Array.newBuilder[Byte]
    clean.foreach { c =>
      val v = alphabet.indexOf(c)
      require(v >= 0, s"invalid base32 character '$c'")
      buffer = (buffer << 5) | v
      bits += 5
      if (bits >= 8) { bits -= 8; out += ((buffer >> bits) & 0xFF).toByte }
    }
    out.result()
  }

  /** RFC 4226 HOTP: HmacSHA1 over the big-endian counter, dynamic
    * truncation, `digits` decimal digits. */
  def hotp(key: Array[Byte], counter: Long, digits: Int = 6): String = {
    val mac = Mac.getInstance("HmacSHA1")
    mac.init(new SecretKeySpec(key, "HmacSHA1"))
    val h = mac.doFinal(java.nio.ByteBuffer.allocate(8).putLong(counter).array())
    val off = h(h.length - 1) & 0x0F
    val bin = ((h(off) & 0x7F) << 24) | ((h(off + 1) & 0xFF) << 16) |
      ((h(off + 2) & 0xFF) << 8) | (h(off + 3) & 0xFF)
    val code = bin % math.pow(10, digits.toDouble).toInt
    s"%0${digits}d".format(code)
  }

  /** RFC 6238 TOTP at `epochSeconds` (SHA-1, 30 s step — the RFC's and
    * the broker's defaults). */
  def totp(base32Secret: String, epochSeconds: Long,
      digits: Int = 6, stepSeconds: Long = 30): String =
    hotp(base32Decode(base32Secret), epochSeconds / stepSeconds, digits)

  private def jsonEscape(s: String): String =
    s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    }

  /** The login request EXACTLY as the reference builds it
    * (/root/reference/angel/auth.go:22-48): url, headers, JSON body.
    * Pure — visible to tests and to deployments that front their own
    * HTTP stack. */
  def loginRequest(
      cfg: BrokerAuthConfig, totpCode: String,
      localIp: String = "127.0.0.1", publicIp: String = "127.0.0.1",
      macAddress: String = "00:00:00:00:00:00"): (String, Map[String, String], String) = {
    val url = cfg.apiUrl.stripSuffix("/") +
      "/rest/auth/angelbroking/user/v1/loginByPassword"
    val headers = Map(
      "Content-Type"     -> "application/json",
      "Accept"           -> "application/json",
      "X-UserType"       -> "USER",
      "X-SourceID"       -> "WEB",
      "X-ClientLocalIP"  -> localIp,
      "X-ClientPublicIP" -> publicIp,
      "X-MACAddress"     -> macAddress,
      "X-PrivateKey"     -> cfg.apiKey)
    val body = s"""{"clientcode":"${jsonEscape(cfg.clientCode)}"""" +
      s""","password":"${jsonEscape(cfg.password)}"""" +
      s""","totp":"${jsonEscape(totpCode)}"}"""
    (url, headers, body)
  }

  /** Perform the handshake: derive the current TOTP, POST the login,
    * parse {status, message, data:{jwtToken, feedToken}}. Left(message)
    * on a declined login or malformed response — the caller (a
    * deployment's connect path) decides whether to retry under
    * [[WsBackoff]], mirroring the reference's fatal-on-auth-failure
    * behavior (/root/reference/main.go:196-199). */
  def authenticate(
      cfg: BrokerAuthConfig,
      nowEpochSeconds: () => Long = () => System.currentTimeMillis() / 1000L): Either[String, BrokerTokens] = {
    val (url, headers, body) = loginRequest(cfg, totp(cfg.totpSecret, nowEpochSeconds()))
    // bounded: a black-holed broker endpoint must surface as Left, not
    // wedge the caller's connect path forever
    val builder = HttpRequest.newBuilder(URI.create(url))
      .timeout(java.time.Duration.ofSeconds(30))
      .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
    headers.foreach { case (k, v) => builder.header(k, v) }
    try {
      val resp = HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10)).build()
        .send(builder.build(), HttpResponse.BodyHandlers.ofString())
      parseLoginResponse(resp.body())
    } catch {
      case e: Exception => Left(s"login request failed: ${e.getMessage}")
    }
  }

  /** Parse the broker's LoginResponse shape (auth.go:11-18) using the
    * json4s parser Spark already ships — no new dependency. */
  def parseLoginResponse(body: String): Either[String, BrokerTokens] =
    try {
      import org.json4s._
      val j = org.json4s.jackson.JsonMethods.parse(body)
      j \ "status" match {
        case JBool(true) =>
          (j \ "data" \ "jwtToken", j \ "data" \ "feedToken") match {
            case (JString(jwt), JString(feed)) if jwt.nonEmpty =>
              Right(BrokerTokens(jwt, feed))
            case _ => Left("authentication response missing tokens")
          }
        case _ =>
          val msg = j \ "message" match {
            case JString(m) => m
            case _ => "unknown error"
          }
          Left(s"authentication failed: $msg")
      }
    } catch {
      case e: Exception => Left(s"malformed login response: ${e.getMessage}")
    }
}
