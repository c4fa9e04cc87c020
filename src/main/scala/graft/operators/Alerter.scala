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
}
