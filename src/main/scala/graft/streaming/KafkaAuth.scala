package graft.streaming

/** Kafka authentication config builder for managed services
  * (SURVEY.md §2 addendum; behavior from `streaming/auth.py:11-59`,
  * re-expressed for the JVM client the Spark Kafka connector wraps:
  * SASL credentials travel as a `sasl.jaas.config` login-module string
  * and PEM material via the client's `ssl.*` keys, rather than
  * librdkafka's `sasl.username`/`oauth_cb` callables).
  *
  * `properties` returns plain client keys; `sparkOptions` prefixes
  * them with `kafka.` for `readStream.format("kafka")` option maps.
  */
object KafkaAuth {

  sealed trait Mechanism
  case object NoAuth extends Mechanism
  case object SaslPlain extends Mechanism
  case object SaslScram256 extends Mechanism
  case object SaslScram512 extends Mechanism
  /** AWS MSK IAM (the Java client's AWS_MSK_IAM login module). */
  case object SaslIam extends Mechanism
  /** OAUTHBEARER with an unspecified token provider (GCP managed Kafka). */
  case object SaslOauthBearer extends Mechanism

  final case class AuthCfg(
      mechanism: Mechanism = NoAuth,
      securityProtocol: String = "SASL_SSL",
      saslUsername: Option[String] = None,
      saslPassword: Option[String] = None,
      sslCaLocation: Option[String] = None,
      /** Client cert PEM. Alone: a COMBINED cert+key PEM the keystore
        * points at. With [[sslKeyLocation]]: both files are read and
        * inlined (the JVM client has no separate-key-FILE config).
        */
      sslCertificateLocation: Option[String] = None,
      sslKeyLocation: Option[String] = None,
      gcpProjectId: Option[String] = None)

  /** JAAS string values are quoted: embedded `\` and `"` must escape or
    * a hostile password breaks out of the module string.
    */
  private[streaming] def jaasEscape(s: String): String =
    s.replace("\\", "\\\\").replace("\"", "\\\"")

  private def readPem(path: String): String =
    try java.nio.file.Files.readString(java.nio.file.Paths.get(path))
    catch {
      case e: Exception => throw new IllegalArgumentException(
        s"cannot read PEM material at $path: ${e.getMessage}", e)
    }

  private def jaas(module: String, cfg: AuthCfg): String = {
    val u = jaasEscape(cfg.saslUsername.getOrElse(""))
    val p = jaasEscape(cfg.saslPassword.getOrElse(""))
    s"""$module required username="$u" password="$p";"""
  }

  /** Client properties to merge into consumer/producer/admin configs
    * (`auth.py:16-59` dispatch, JVM client key space).
    */
  def properties(cfg: AuthCfg): Map[String, String] = {
    if (cfg.mechanism == NoAuth) return Map.empty
    // JVM-client key space ONLY: librdkafka's `ssl.key.location` is
    // unknown to the Java client (which merely WARNS on unknown keys,
    // so an mTLS config would silently never load the private key and
    // the handshake would fail). A separate key file must be inlined
    // via ssl.keystore.key + ssl.keystore.certificate.chain; a lone
    // cert location is treated as a combined cert+key PEM keystore.
    val keystore: Map[String, String] =
      (cfg.sslCertificateLocation, cfg.sslKeyLocation) match {
        case (Some(cert), Some(key)) => Map(
          "ssl.keystore.type" -> "PEM",
          "ssl.keystore.certificate.chain" -> readPem(cert),
          "ssl.keystore.key" -> readPem(key))
        case (Some(cert), None) => Map(
          "ssl.keystore.type" -> "PEM",
          "ssl.keystore.location" -> cert)
        case (None, Some(key)) => throw new IllegalArgumentException(
          "ssl_key_location requires ssl_certificate_location (the JVM " +
            "client inlines the pair as a PEM keystore)")
        case (None, None) => Map.empty
      }
    val ssl =
      cfg.sslCaLocation.map(l => Map(
        "ssl.truststore.type" -> "PEM",
        "ssl.truststore.location" -> l)).getOrElse(Map.empty) ++ keystore
    val base = Map("security.protocol" -> cfg.securityProtocol) ++ ssl
    val mech: Map[String, String] = cfg.mechanism match {
      case NoAuth => Map.empty
      case SaslPlain => Map(
        "sasl.mechanism" -> "PLAIN",
        "sasl.jaas.config" ->
          jaas("org.apache.kafka.common.security.plain.PlainLoginModule", cfg))
      case SaslScram256 => Map(
        "sasl.mechanism" -> "SCRAM-SHA-256",
        "sasl.jaas.config" ->
          jaas("org.apache.kafka.common.security.scram.ScramLoginModule", cfg))
      case SaslScram512 => Map(
        "sasl.mechanism" -> "SCRAM-SHA-512",
        "sasl.jaas.config" ->
          jaas("org.apache.kafka.common.security.scram.ScramLoginModule", cfg))
      // no aws.region key: it is not a JVM client config — the MSK IAM
      // callback handler derives the region from the bootstrap endpoint
      case SaslIam => Map(
        "sasl.mechanism" -> "AWS_MSK_IAM",
        "sasl.jaas.config" ->
          "software.amazon.msk.auth.iam.IAMLoginModule required;",
        "sasl.client.callback.handler.class" ->
          "software.amazon.msk.auth.iam.IAMClientCallbackHandler")
      case SaslOauthBearer => Map(
        "sasl.mechanism" -> "OAUTHBEARER",
        "sasl.jaas.config" ->
          "org.apache.kafka.common.security.oauthbearer.OAuthBearerLoginModule required;",
        "sasl.login.callback.handler.class" ->
          "com.google.cloud.hosted.kafka.auth.GcpLoginCallbackHandler")
    }
    base ++ mech
  }

  /** The same properties `kafka.`-prefixed for Spark's Kafka source/sink
    * option maps.
    */
  def sparkOptions(cfg: AuthCfg): Map[String, String] =
    properties(cfg).map { case (k, v) => s"kafka.$k" -> v }
}
