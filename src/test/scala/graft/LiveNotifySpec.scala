package graft

import java.io.{BufferedReader, InputStreamReader, OutputStreamWriter}
import java.net.ServerSocket
import java.nio.charset.StandardCharsets
import java.util.Base64

import graft.pipeline.{Notify, SmtpNotify}
import org.scalatest.funsuite.AnyFunSuite

/** K8: the SMTP transport driven over a real localhost socket (round-11
  * verdict #4). The message BYTES are pinned by NotifyProgressSpec; this
  * spec pins the wire dialog `send_notification.py:57-60` runs through
  * smtplib — greeting/EHLO/AUTH LOGIN/MAIL/RCPT/DATA/QUIT — plus the loud
  * failure surfaces (rejected recipient, stalled MTA, STARTTLS-only
  * server). Pure driver-side, no Spark session. */
class LiveNotifySpec extends AnyFunSuite {

  /** Scripted MTA double on a live socket: runs one SMTP session, records
    * every client command plus the DATA payload. `rcptCode` lets a test
    * reject recipients; `greet` false simulates a stalled MTA; `starttls`
    * advertises the capability the client must refuse in plaintext. */
  private final class FakeMta(rcptCode: Int = 250, greet: Boolean = true,
                              starttls: Boolean = false) {
    val srv = new ServerSocket(0, 1, java.net.InetAddress.getByName("127.0.0.1"))
    val cmds = collection.mutable.Buffer[String]()
    @volatile var data: String = ""
    def port: Int = srv.getLocalPort

    private val thread = new Thread(() => try {
      val s = srv.accept()
      val in = new BufferedReader(new InputStreamReader(s.getInputStream, StandardCharsets.US_ASCII))
      val out = new OutputStreamWriter(s.getOutputStream, StandardCharsets.US_ASCII)
      def reply(l: String): Unit = { out.write(l + "\r\n"); out.flush() }
      if (!greet) Thread.sleep(60000)
      else {
      reply("220 fake.mta ESMTP")
      var inData = false
      val body = new StringBuilder
      Iterator.continually(in.readLine()).takeWhile(_ != null).foreach { line =>
        if (inData) {
          if (line == ".") {
            inData = false; data = body.toString
            reply("250 2.0.0 queued")
          } else body.append(if (line.startsWith("..")) line.drop(1) else line).append("\r\n")
        } else {
          cmds += line
          val up = line.toUpperCase
          if (up.startsWith("EHLO")) {
            if (starttls) { reply("250-fake.mta"); reply("250 STARTTLS") }
            else { reply("250-fake.mta"); reply("250 AUTH LOGIN PLAIN") }
          }
          else if (up == "AUTH LOGIN") reply("334 " + Base64.getEncoder.encodeToString("Username:".getBytes))
          else if (cmds.size >= 2 && cmds(cmds.size - 2).toUpperCase == "AUTH LOGIN")
            reply("334 " + Base64.getEncoder.encodeToString("Password:".getBytes))
          else if (cmds.size >= 3 && cmds(cmds.size - 3).toUpperCase == "AUTH LOGIN")
            reply("235 2.7.0 accepted")
          else if (up.startsWith("MAIL FROM")) reply("250 2.1.0 ok")
          else if (up.startsWith("RCPT TO")) reply(s"$rcptCode ${if (rcptCode == 250) "2.1.5 ok" else "5.1.1 no such user"}")
          else if (up == "DATA") { inData = true; reply("354 go ahead") }
          else if (up == "QUIT") { reply("221 bye"); s.close() }
          else reply("500 unrecognized")
        }
      }
      }
    } catch { case _: Throwable => () })
    thread.setDaemon(true)
    thread.start()
    def close(): Unit = srv.close()
  }

  private val to = Seq("ops@example.org", "lead@example.org")
  private val msg = Notify.failureEmail(
    "Biomass Update Failed", "zonal stage: 3 rasters unreadable",
    Notify.defaultTemplate, "etl@example.org", to)

  test("happy path: full EHLO/AUTH LOGIN/MAIL/RCPT/DATA dialog, message bytes intact on the wire") {
    val mta = new FakeMta()
    try {
      val client = new SmtpNotify("127.0.0.1", mta.port, "etl@example.org", "hunter2")
      client.send("etl@example.org", to, msg)
      val cmds = mta.cmds.toSeq
      assert(cmds.head.toUpperCase.startsWith("EHLO "))
      assert(cmds(1) == "AUTH LOGIN")
      // the two base64 lines decode to exactly the configured credentials
      assert(new String(Base64.getDecoder.decode(cmds(2)), "UTF-8") == "etl@example.org")
      assert(new String(Base64.getDecoder.decode(cmds(3)), "UTF-8") == "hunter2")
      assert(cmds(4) == "MAIL FROM:<etl@example.org>")
      assert(cmds(5) == "RCPT TO:<ops@example.org>")
      assert(cmds(6) == "RCPT TO:<lead@example.org>")
      assert(cmds(7) == "DATA")
      assert(cmds(8) == "QUIT")
      // wire bytes == the byte-reproducible MIME message (dot-unstuffed,
      // CRLF-normalized by the fake MTA's line reader)
      assert(mta.data == msg.linesIterator.mkString("", "\r\n", "\r\n"))
      assert(mta.data.contains("Subject: Biomass Update Failed"))
      assert(mta.data.contains("color: red"))
    } finally mta.close()
  }

  test("rejected recipient raises with the server's reply — no partial silent send") {
    val mta = new FakeMta(rcptCode = 550)
    try {
      val client = new SmtpNotify("127.0.0.1", mta.port, "u", "p")
      val e = intercept[java.io.IOException](client.send("etl@example.org", to, msg))
      assert(e.getMessage.contains("RCPT TO ops@example.org") && e.getMessage.contains("550"))
      assert(!mta.cmds.exists(_ == "DATA"), "DATA must not follow a rejected RCPT")
    } finally mta.close()
  }

  test("a stalled MTA (no greeting) fails the read deadline, it never hangs") {
    val mta = new FakeMta(greet = false)
    try {
      val client = new SmtpNotify("127.0.0.1", mta.port, "u", "p", timeoutMs = 300)
      val t0 = System.nanoTime()
      intercept[java.net.SocketTimeoutException](client.send("a@b", to, msg))
      assert((System.nanoTime() - t0) / 1e9 < 10.0)
    } finally mta.close()
  }

  test("a STARTTLS-advertising server is refused loudly in plaintext mode") {
    val mta = new FakeMta(starttls = true)
    try {
      val client = new SmtpNotify("127.0.0.1", mta.port, "u", "p")
      val e = intercept[java.io.IOException](client.send("a@b", to, msg))
      assert(e.getMessage.contains("STARTTLS"))
      assert(!mta.cmds.exists(_.startsWith("AUTH")), "credentials must not ride plaintext past STARTTLS")
    } finally mta.close()
  }
}
