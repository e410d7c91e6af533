package graft.workflow

import java.io.{BufferedReader, InputStreamReader, PrintWriter}
import java.net.Socket
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets

import graft.workflow.Pipeline.Alerter

/** Real alert transports behind [[Pipeline.Alerter]] — the one reference
  * behavior a workflow-layer user would miss from the Log/Noop impls:
  * the reference couples its variance alarm to SMTP email
  * (/root/reference/services/email_service.py:20-99). Two impls:
  *
  *   - [[SmtpAlerter]]: plain-socket RFC 5321 client (EHLO → MAIL FROM →
  *     RCPT TO → DATA → QUIT) building the same From/To/Subject + plain
  *     body message the reference assembles via MIMEText
  *     (email_service.py:28-41). No TLS/AUTH — the reference's own
  *     settings default both off (core/config.py SMTP_USE_TLS handling,
  *     email_service.py:35-39); an authenticated relay is a deployment
  *     concern layered outside the engine.
  *   - [[WebhookAlerter]]: HTTP POST of a JSON {subject, body} payload —
  *     the modern pager-duty/slack-shaped sink.
  *
  * Both are side-effect sinks with no Spark dependency: alerting is
  * driver-side control flow, never part of a distributed plan.
  */
object Alerting {

  /** The reference's variance-alert message, field for field
    * (/root/reference/services/email_service.py:51-99): job name,
    * timestamp, previous/current row counts, variance vs threshold, and
    * the investigate/recommended-action boilerplate trimmed to the
    * fields that carry information. Timestamp is a parameter —
    * determinism over wall-clock reads. */
  def varianceAlertMessage(jobName: String, variancePct: Double,
                           previousCount: Long, currentCount: Long,
                           thresholdPct: Double,
                           timestamp: String): (String, String) = {
    val subject = s"Data Variance Alert - $jobName"
    val body =
      f"""DATA VARIANCE ALERT - IMMEDIATE ATTENTION REQUIRED
         |
         |Job: $jobName
         |Timestamp: $timestamp
         |
         |VARIANCE DETAILS:
         |Previous Count: $previousCount%,d rows
         |Current Count: $currentCount%,d rows
         |Variance: $variancePct%.2f%%
         |Threshold: $thresholdPct%.2f%%
         |
         |The data variance exceeds the configured threshold.
         |This is an automated alert from the ETL monitoring system.""".stripMargin
    (subject, body)
  }

  /** The reference's completion notification
    * (/root/reference/services/email_service.py:101-151): status line,
    * duration, rows processed, optional variance and error. */
  def completionMessage(jobName: String, status: String, durationSec: Double,
                        rowsProcessed: Long,
                        variancePct: Option[Double] = None,
                        errorMessage: Option[String] = None,
                        timestamp: String = ""): (String, String) = {
    val subject = s"$jobName - $status"
    val extra = variancePct.map(v => f"\nVariance: $v%.2f%%").getOrElse("") +
      errorMessage.map(e => s"\nError: $e").getOrElse("")
    val body =
      f"""Job: $jobName
         |Status: $status
         |Timestamp: $timestamp
         |Duration: $durationSec%.2f seconds
         |Rows Processed: $rowsProcessed%,d$extra""".stripMargin
    (subject, body)
  }

  /** W5 with the reference's alert content: computes the variance
    * ([[Pipeline.variancePct]], prev==0 guard included), and past the
    * threshold sends the reference-field message through `alerter`.
    * Returns the variance either way. */
  def validateVarianceAlert(jobName: String, current: Long, previous: Long,
                            thresholdPct: Double = 5.0,
                            alerter: Alerter = Pipeline.LogAlerter,
                            timestamp: String = ""): Double = {
    require(thresholdPct >= 0 && thresholdPct <= 100,
      s"threshold must be in [0,100], got $thresholdPct")
    val v = Pipeline.variancePct(current, previous)
    if (v > thresholdPct) {
      val (subject, body) = varianceAlertMessage(
        jobName, v, previous, current, thresholdPct, timestamp)
      alerter.alert(subject, body)
    }
    v
  }

  /** Minimal SMTP submission over a plain socket. Fails loudly on any
    * non-2xx/3xx reply — an alert that silently vanishes is worse than a
    * crashed pipeline (the reference logs-and-swallows,
    * email_service.py:46-48; a monitoring channel should not). */
  final class SmtpAlerter(host: String, port: Int, from: String,
                          to: Seq[String]) extends Alerter {
    require(to.nonEmpty, "at least one recipient")

    /** CR/LF can't be allowed into header lines or envelope commands: an
      * embedded newline in a job-derived subject would inject extra
      * headers (or raw SMTP commands) — the header-side counterpart of
      * the body's dot-stuffing. Replaced with spaces, not stripped, so
      * a multi-line subject stays readable. */
    private def headerSafe(s: String): String =
      s.replaceAll("[\r\n]+", " ")

    def alert(subject: String, body: String): Unit = {
      val socket = new Socket(host, port)
      try {
        socket.setSoTimeout(10000)
        val in = new BufferedReader(new InputStreamReader(
          socket.getInputStream, StandardCharsets.UTF_8))
        val out = new PrintWriter(socket.getOutputStream, false)
        def send(line: String): Unit = { out.print(line + "\r\n"); out.flush() }
        def expect(codes: Set[Int], after: String): Unit = {
          // multi-line replies: "250-..." continues, "250 ..." ends
          var line = in.readLine()
          while (line != null && line.length >= 4 && line.charAt(3) == '-')
            line = in.readLine()
          require(line != null && line.length >= 3 &&
            codes.contains(line.take(3).toInt),
            s"SMTP $after failed: $line")
        }
        expect(Set(220), "greeting")
        send(s"EHLO graft"); expect(Set(250), "EHLO")
        send(s"MAIL FROM:<${headerSafe(from)}>"); expect(Set(250), "MAIL FROM")
        to.foreach { r =>
          send(s"RCPT TO:<${headerSafe(r)}>"); expect(Set(250, 251), "RCPT TO")
        }
        send("DATA"); expect(Set(354), "DATA")
        val headers = Seq(
          s"From: ${headerSafe(from)}",
          s"To: ${headerSafe(to.mkString(", "))}",
          s"Subject: ${headerSafe(subject)}",
          "MIME-Version: 1.0",
          "Content-Type: text/plain; charset=utf-8")
        headers.foreach(send)
        send("")
        // dot-stuffing (RFC 5321 §4.5.2): a body line starting with '.'
        // gets one prepended
        body.split("\n", -1).foreach { l =>
          send(if (l.startsWith(".")) "." + l else l)
        }
        send("."); expect(Set(250), "message accept")
        send("QUIT")
      } finally socket.close()
    }
  }

  /** HTTP POST alert sink: JSON `{"subject": ..., "body": ...}` to a
    * webhook URL; non-2xx fails loudly. */
  final class WebhookAlerter(url: String) extends Alerter {
    private val client = HttpClient.newHttpClient()

    def alert(subject: String, body: String): Unit = {
      val payload = "{" + graft.JsonEscape.str("subject") + ": " +
        graft.JsonEscape.str(subject) + ", " +
        graft.JsonEscape.str("body") + ": " + graft.JsonEscape.str(body) + "}"
      val req = HttpRequest.newBuilder(java.net.URI.create(url))
        .header("Content-Type", "application/json")
        .POST(HttpRequest.BodyPublishers.ofString(payload,
          StandardCharsets.UTF_8))
        .build()
      val resp = client.send(req, HttpResponse.BodyHandlers.ofString())
      require(resp.statusCode() >= 200 && resp.statusCode() < 300,
        s"webhook alert failed: HTTP ${resp.statusCode()} ${resp.body()}")
    }
  }
}
