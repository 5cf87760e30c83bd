package graft.http

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}
import java.security.{KeyFactory, KeyStore, SecureRandom}
import java.security.cert.{Certificate, CertificateFactory, X509Certificate}
import java.security.spec.PKCS8EncodedKeySpec
import java.util.Base64
import javax.net.ssl.{KeyManagerFactory, SSLContext, TrustManagerFactory, X509TrustManager}

/** TLS / mTLS support (reference: `security/SecurityContext.java`,
  * `security/SelfSignedTrustManager.java`; docs "TLS (more secure
  * replacement for SSL) and mTLS support"):
  *
  *   - `http.security.cert.server` — comma-separated paths to trusted server
  *     certificates (PEM or DER) added to the connector trust store;
  *   - `http.security.cert.client` + `http.security.key.client` — client
  *     certificate and PKCS8 private key (PEM or DER) for mTLS;
  *   - `http.security.cert.server.allowSelfSigned` — trust-everything
  *     context for non-production use;
  *   - no properties → the JVM default trust store (globally trusted CAs).
  */
object Ssl {

  final case class SslConfig(
      serverCertPaths: Seq[String] = Nil,
      clientCertPath: Option[String] = None,
      clientKeyPath: Option[String] = None,
      allowSelfSigned: Boolean = false)
      extends Serializable {
    def isConfigured: Boolean =
      serverCertPaths.nonEmpty || clientCertPath.isDefined || allowSelfSigned
  }

  object SslConfig {
    def fromOptions(o: HttpOptions): SslConfig = SslConfig(
      serverCertPaths = o
        .str("http.security.cert.server", "")
        .split(",")
        .map(_.trim)
        .filter(_.nonEmpty)
        .toSeq,
      clientCertPath = o.strOpt("http.security.cert.client"),
      clientKeyPath = o.strOpt("http.security.key.client"),
      allowSelfSigned = o.bool(HttpOptions.AllowSelfSigned, default = false))
  }

  /** Build an SSLContext for the config; None → use JDK defaults. */
  def contextFor(cfg: SslConfig): Option[SSLContext] = {
    if (!cfg.isConfigured) return None
    if (cfg.allowSelfSigned && cfg.serverCertPaths.isEmpty &&
      cfg.clientCertPath.isEmpty)
      return Some(HttpClientFactory.trustAllContext())

    val trustManagers =
      if (cfg.allowSelfSigned) {
        val tm = new X509TrustManager {
          override def checkClientTrusted(c: Array[X509Certificate], a: String): Unit = ()
          override def checkServerTrusted(c: Array[X509Certificate], a: String): Unit = ()
          override def getAcceptedIssuers: Array[X509Certificate] = Array.empty
        }
        Array[javax.net.ssl.TrustManager](tm)
      } else if (cfg.serverCertPaths.nonEmpty) {
        val ts = KeyStore.getInstance(KeyStore.getDefaultType)
        ts.load(null, null)
        cfg.serverCertPaths.zipWithIndex.foreach { case (path, i) =>
          loadCertificates(path).zipWithIndex.foreach { case (cert, j) =>
            ts.setCertificateEntry(s"graft-server-$i-$j", cert)
          }
        }
        val tmf =
          TrustManagerFactory.getInstance(TrustManagerFactory.getDefaultAlgorithm)
        tmf.init(ts)
        tmf.getTrustManagers
      } else null

    val keyManagers = (cfg.clientCertPath, cfg.clientKeyPath) match {
      case (Some(certPath), Some(keyPath)) =>
        val certs = loadCertificates(certPath)
        val key = loadPkcs8Key(keyPath)
        val ks = KeyStore.getInstance(KeyStore.getDefaultType)
        ks.load(null, null)
        ks.setKeyEntry(
          "graft-client",
          key,
          Array.emptyCharArray,
          certs.toArray[Certificate])
        val kmf =
          KeyManagerFactory.getInstance(KeyManagerFactory.getDefaultAlgorithm)
        kmf.init(ks, Array.emptyCharArray)
        kmf.getKeyManagers
      case (None, None) => null
      case _ =>
        throw new HttpConfigException(
          "mTLS requires both http.security.cert.client and http.security.key.client")
    }

    val ctx = SSLContext.getInstance("TLS")
    ctx.init(keyManagers, trustManagers, new SecureRandom())
    Some(ctx)
  }

  /** Load X.509 certificate(s) from a PEM or DER file. */
  def loadCertificates(path: String): Seq[X509Certificate] = {
    val bytes = Files.readAllBytes(Paths.get(path))
    val cf = CertificateFactory.getInstance("X.509")
    // CertificateFactory handles both PEM (BEGIN CERTIFICATE blocks) and DER
    val in = new ByteArrayInputStream(bytes)
    val out = scala.collection.mutable.ArrayBuffer.empty[X509Certificate]
    while (in.available() > 0) {
      cf.generateCertificate(in) match {
        case x: X509Certificate => out += x
        case _ =>
      }
    }
    if (out.isEmpty)
      throw new HttpConfigException(s"No certificates found in '$path'")
    out.toSeq
  }

  /** Load a PKCS8 private key from PEM (`BEGIN PRIVATE KEY`) or raw DER.
    * RSA and EC keys supported (reference docs: "The key MUST be in PKCS8
    * format. Both PEM and DER keys are allowed").
    */
  def loadPkcs8Key(path: String): java.security.PrivateKey = {
    val raw = Files.readAllBytes(Paths.get(path))
    val text = new String(raw, StandardCharsets.US_ASCII)
    val der =
      if (text.contains("-----BEGIN")) {
        val b64 = text.linesIterator
          .filterNot(_.startsWith("-----"))
          .mkString("")
        Base64.getMimeDecoder.decode(b64)
      } else raw
    val spec = new PKCS8EncodedKeySpec(der)
    val algorithms = Seq("RSA", "EC", "Ed25519")
    algorithms.iterator
      .flatMap { alg =>
        try Some(KeyFactory.getInstance(alg).generatePrivate(spec))
        catch { case _: Exception => None }
      }
      .nextOption()
      .getOrElse(
        throw new HttpConfigException(
          s"Could not parse PKCS8 private key at '$path' (tried ${algorithms.mkString(", ")})"))
  }
}
