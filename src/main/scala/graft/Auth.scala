package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.interfaces.{RSAPrivateKey, RSAPublicKey}
import java.security.spec.RSAPrivateCrtKeySpec
import java.security.{KeyFactory, Signature}

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}

/** Bearer-token authentication for the lake service, mirroring the
  * reference's Auth0 validator (service/auth/validator.go): RS256 JWTs
  * checked against a JSON Web Key Set file, with required audience,
  * expiry, and issuer claims plus the namespaced tenant/user claims
  * (service/auth/auth.go). Token GENERATION (the reference's
  * cmd/gentoken + service/auth/generator.go) is included for the test
  * harness and local tooling.
  *
  * Everything is JDK crypto — RS256 is just SHA256withRSA over
  * `base64url(header).base64url(payload)`.
  */
object Auth {

  val TenantIDClaim = "https://lake.brimdata.io/tenant_id"
  val UserIDClaim = "https://lake.brimdata.io/user_id"
  val AnonymousTenantID = "tenant_000000000000000000000000001"
  val AnonymousUserID = "user_000000000000000000000000001"

  final case class Config(audience: String, clientId: String, domain: String,
                          jwksPath: String)

  final case class Identity(tenantId: String, userId: String)

  private val mapper = new ObjectMapper

  private def b64url(b: Array[Byte]): String =
    java.util.Base64.getUrlEncoder.withoutPadding.encodeToString(b)

  private def unb64url(s: String): Array[Byte] =
    java.util.Base64.getUrlDecoder.decode(s)

  // ---- JWKS --------------------------------------------------------------

  /** Load kid -> RSA public key from a JWKS file; keys carry the public
    * half as an x5c certificate chain (validator.go loadPublicKeys).
    */
  def loadJwks(path: String): Map[String, RSAPublicKey] = {
    val root = mapper.readTree(Files.readAllBytes(Paths.get(path)))
    val keys = Option(root.get("keys")).map(_.elements())
      .getOrElse(java.util.Collections.emptyIterator[JsonNode]())
    val out = Map.newBuilder[String, RSAPublicKey]
    while (keys.hasNext) {
      val k = keys.next()
      val kid = Option(k.get("kid")).map(_.asText).getOrElse("")
      val x5c = Option(k.get("x5c")).filter(_.isArray).filter(_.size > 0)
      x5c.foreach { arr =>
        val der = java.util.Base64.getMimeDecoder.decode(arr.get(0).asText)
        val cf = java.security.cert.CertificateFactory.getInstance("X.509")
        val cert = cf.generateCertificate(new java.io.ByteArrayInputStream(der))
        out += kid -> cert.getPublicKey.asInstanceOf[RSAPublicKey]
      }
    }
    out.result()
  }

  // ---- PKCS#1 private key (BEGIN RSA PRIVATE KEY) -------------------------

  /** Minimal DER reader for RSAPrivateKey ::= SEQUENCE of 9 INTEGERs
    * (version, n, e, d, p, q, dP, dQ, qInv). JDK only parses PKCS#8, so
    * the classic PEM form needs this tiny decoder.
    */
  def loadPrivateKey(path: String): RSAPrivateKey = {
    val pem = new String(Files.readAllBytes(Paths.get(path)), StandardCharsets.UTF_8)
    val body = pem.linesIterator.filterNot(_.startsWith("-----")).mkString
    val der = java.util.Base64.getMimeDecoder.decode(body)
    var i = 0
    def len(): Int = {
      var l = der(i) & 0xff; i += 1
      if ((l & 0x80) != 0) {
        val n = l & 0x7f; l = 0
        for (_ <- 0 until n) { l = (l << 8) | (der(i) & 0xff); i += 1 }
      }
      l
    }
    def expect(tag: Int): Int = {
      require((der(i) & 0xff) == tag, s"DER tag ${der(i)} != $tag at $i")
      i += 1; len()
    }
    expect(0x30) // outer SEQUENCE
    def int(): BigInt = {
      val l = expect(0x02)
      val v = BigInt(java.util.Arrays.copyOfRange(der, i, i + l))
      i += l; v
    }
    val Seq(_, n, e, d, p, q, dp, dq, qi) = Seq.fill(9)(int())
    val spec = new RSAPrivateCrtKeySpec(n.bigInteger, e.bigInteger, d.bigInteger,
      p.bigInteger, q.bigInteger, dp.bigInteger, dq.bigInteger, qi.bigInteger)
    KeyFactory.getInstance("RSA").generatePrivate(spec).asInstanceOf[RSAPrivateKey]
  }

  // ---- token generation (generator.go GenerateAccessToken) ----------------

  def generateToken(keyId: String, privateKeyFile: String, expirationSec: Long,
                    audience: String, domain: String,
                    tenantId: String, userId: String): String = {
    val key = loadPrivateKey(privateKeyFile)
    def js(s: String): String = s.replace("\\", "\\\\").replace("\"", "\\\"")
    val header = s"""{"alg":"RS256","kid":"${js(keyId)}","typ":"JWT"}"""
    val exp = System.currentTimeMillis() / 1000 + expirationSec
    // issuer is the domain with a trailing slash (Auth0 convention)
    val claims =
      s"""{"aud":"${js(audience)}","exp":$exp,"iss":"${js(domain)}/",""" +
        s""""${js(TenantIDClaim)}":"${js(tenantId)}",""" +
        s""""${js(UserIDClaim)}":"${js(userId)}"}"""
    val signingInput = b64url(header.getBytes(StandardCharsets.UTF_8)) + "." +
      b64url(claims.getBytes(StandardCharsets.UTF_8))
    val sig = Signature.getInstance("SHA256withRSA")
    sig.initSign(key)
    sig.update(signingInput.getBytes(StandardCharsets.UTF_8))
    signingInput + "." + b64url(sig.sign())
  }

  // ---- validation (validator.go) ------------------------------------------

  final class Validator(cfg: Config) {
    private val keys = loadJwks(cfg.jwksPath)
    private val expectedIssuer = cfg.domain.stripSuffix("/") + "/"

    /** Validate the Authorization header; Left(message) carries the exact
      * reference error strings clients print after "status code 401: ".
      */
    def validateRequest(authHeader: Option[String]): Either[String, Identity] =
      authHeader.map(_.trim).filter(_.nonEmpty) match {
        case None => Left("no token present in request")
        case Some(h) =>
          val token =
            if (h.regionMatches(true, 0, "bearer ", 0, 7)) h.substring(7).trim
            else h
          validate(token)
      }

    def validate(token: String): Either[String, Identity] = {
      if (token.isEmpty) return Left("no token present in request")
      val parts = token.split("\\.")
      if (parts.length != 3) return Left("invalid token")
      val (header, claims) =
        try {
          (mapper.readTree(unb64url(parts(0))), mapper.readTree(unb64url(parts(1))))
        } catch { case _: Exception => return Left("invalid token") }
      val kid = Option(header.get("kid")).map(_.asText).getOrElse("")
      val key = keys.getOrElse(kid, return Left("invalid token"))
      val ok =
        try {
          val sig = Signature.getInstance("SHA256withRSA")
          sig.initVerify(key)
          sig.update((parts(0) + "." + parts(1)).getBytes(StandardCharsets.UTF_8))
          sig.verify(unb64url(parts(2)))
        } catch { case _: Exception => false }
      if (!ok) return Left("invalid token")
      // jwt.Parse validates present exp/nbf/iat DURING parsing (jwt-go
      // MapClaims.Valid, req=false) — an expired or not-yet-valid token is
      // "invalid token"; "invalid expiration" below is only for a MISSING
      // exp (validator.go:87 VerifyExpiresAt req=true)
      val now = System.currentTimeMillis() / 1000
      if (Option(claims.get("exp")).exists(_.asLong(0) <= now))
        return Left("invalid token")
      if (Option(claims.get("nbf")).exists(_.asLong(0) > now))
        return Left("invalid token")
      if (Option(claims.get("iat")).exists(_.asLong(0) > now))
        return Left("invalid token")
      if (Option(header.get("alg")).map(_.asText).getOrElse("") != "RS256")
        return Left("invalid signing method")
      val aud = Option(claims.get("aud"))
      val audOk = aud.exists { a =>
        if (a.isArray) {
          val it = a.elements(); var found = false
          while (it.hasNext && !found) found = it.next().asText == cfg.audience
          found
        } else a.asText == cfg.audience
      }
      if (!audOk) return Left("invalid audience")
      // present-and-expired was already rejected above as "invalid token";
      // this req=true check rejects a MISSING exp claim
      if (Option(claims.get("exp")).isEmpty) return Left("invalid expiration")
      if (!Option(claims.get("iss")).exists(_.asText == expectedIssuer))
        return Left("invalid issuer")
      var ident = Identity(AnonymousTenantID, AnonymousUserID)
      Option(claims.get(TenantIDClaim)).foreach { v =>
        val s = v.asText
        if (s.isEmpty || s == AnonymousTenantID) return Left("invalid tenant ID")
        ident = ident.copy(tenantId = s)
      }
      Option(claims.get(UserIDClaim)).foreach { v =>
        val s = v.asText
        if (s.isEmpty || s == AnonymousUserID) return Left("invalid tenant ID")
        ident = ident.copy(userId = s)
      }
      Right(ident)
    }
  }
}
