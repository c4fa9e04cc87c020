package graft.operators

import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

/** Alert sink — the `SendEmail` role (SendEmail.java:23-49) out of the data
  * plane. The reference hard-coded SMTP credentials (SendEmail.java:35);
  * we deliberately do not reproduce that: transports are pluggable and any
  * credentials would come from the environment.
  */
trait Alerter extends Serializable {
  def alert(subject: String, message: String): Unit
}

object Alerter {
  /** Default: structured log line on the driver. */
  object Log extends Alerter {
    def alert(subject: String, message: String): Unit =
      System.err.println(s"[alert] $subject: $message")
  }

  /** Test sink: collects alerts in memory. */
  final class Collecting extends Alerter {
    private val q = new ConcurrentLinkedQueue[(String, String)]()
    def alert(subject: String, message: String): Unit = q.add(subject -> message)
    def all: List[(String, String)] = q.asScala.toList
  }

  /** Webhook transport: POSTs `{"subject":…,"message":…}` JSON to `url`.
    * A failed delivery logs and continues — an unreachable alert endpoint
    * must never abort a migration that is otherwise succeeding.
    */
  final class Webhook(url: String) extends Alerter {
    def alert(subject: String, message: String): Unit =
      try {
        val conn = new java.net.URI(url).toURL.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setConnectTimeout(5000)
        conn.setReadTimeout(5000)
        conn.setRequestMethod("POST")
        conn.setDoOutput(true)
        conn.setRequestProperty("Content-Type", "application/json")
        val body = s"""{"subject":${jsonStr(subject)},"message":${jsonStr(message)}}"""
        val out = conn.getOutputStream
        try out.write(body.getBytes("UTF-8")) finally out.close()
        val rc = conn.getResponseCode
        if (rc < 200 || rc >= 300)
          System.err.println(s"[alert] webhook returned $rc for: $subject")
        conn.disconnect()
      } catch {
        case e: Exception =>
          System.err.println(s"[alert] webhook delivery failed (${e.getMessage}): $subject: $message")
      }
  }

  /** Minimal SMTP transport (RFC 5321 over a plain socket) — the
    * `SendEmail` role (SendEmail.java:23-49) with every parameter from
    * configuration instead of the reference's hard-coded relay +
    * credentials (SendEmail.java:35). Plain HELO, no AUTH/TLS: meant for
    * an internal relay host like the reference used. Failures log and
    * continue for the same reason as [[Webhook]].
    */
  final class Smtp(host: String, port: Int, from: String, to: Seq[String])
      extends Alerter {
    def alert(subject: String, message: String): Unit =
      try {
        val sock = new java.net.Socket()
        sock.connect(new java.net.InetSocketAddress(host, port), 5000)
        sock.setSoTimeout(5000)
        try {
          val in = new java.io.BufferedReader(
            new java.io.InputStreamReader(sock.getInputStream, "UTF-8"))
          val out = new java.io.PrintWriter(
            new java.io.OutputStreamWriter(sock.getOutputStream, "UTF-8"))
          def send(line: String): Unit = { out.print(line + "\r\n"); out.flush() }
          def expect(code: String): Unit = {
            // skip RFC 5321 multi-line continuations ("250-…")
            var line = in.readLine()
            while (line != null && line.length > 3 && line.charAt(3) == '-') line = in.readLine()
            require(line != null && line.startsWith(code), s"SMTP expected $code, got: $line")
          }
          // header values must never carry CR/LF: a subject derived from a
          // path or exception text would otherwise inject arbitrary
          // headers/commands into the SMTP stream (header injection)
          def hdr(s: String): String = s.replaceAll("[\r\n]+", " ")
          expect("220"); send("HELO graft"); expect("250")
          send(s"MAIL FROM:<${hdr(from)}>"); expect("250")
          to.foreach { r => send(s"RCPT TO:<${hdr(r)}>"); expect("250") }
          send("DATA"); expect("354")
          // dot-stuffing per RFC 5321 §4.5.2 over the FULL payload
          // (headers + body — a body-only pass would leave a leading-dot
          // header line able to terminate DATA early)
          val payload =
            s"Subject: ${hdr(subject)}\r\nFrom: ${hdr(from)}\r\nTo: ${to.map(hdr).mkString(", ")}\r\n\r\n$message"
          val stuffed = payload.linesIterator
            .map(l => if (l.startsWith(".")) "." + l else l).mkString("\r\n")
          send(s"$stuffed\r\n.")
          expect("250"); send("QUIT")
        } finally sock.close()
      } catch {
        case e: Exception =>
          System.err.println(s"[alert] smtp delivery failed (${e.getMessage}): $subject: $message")
      }
  }

  /** Transport from the environment — the operational default for the CLI:
    * `GRAFT_ALERT_WEBHOOK=<url>`, or `GRAFT_SMTP_HOST` (+ optional
    * `GRAFT_SMTP_PORT`/`GRAFT_SMTP_FROM`/`GRAFT_SMTP_TO` comma-separated),
    * else the log sink. Credentials/endpoints never live in code.
    */
  def fromEnv(env: Map[String, String] = sys.env): Alerter =
    env.get("GRAFT_ALERT_WEBHOOK").map(new Webhook(_))
      .orElse(env.get("GRAFT_SMTP_HOST").map(h => new Smtp(
        h,
        env.getOrElse("GRAFT_SMTP_PORT", "25").toInt,
        env.getOrElse("GRAFT_SMTP_FROM", "graft@localhost"),
        env.getOrElse("GRAFT_SMTP_TO", "ops@localhost").split(",").toSeq.map(_.trim))))
      .getOrElse(Log)

  private def jsonStr(s: String): String =
    "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
}
