package graft.enrich

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

/** In-process deterministic stand-in for the reference's PropertyMaster
  * API (mls_listings_transform.py:421-481) — lets the real
  * [[HttpLookupClient]] be driven over an actual socket with zero network
  * egress. The response for each posted address is a pure function of
  * `md5(StreetAddress || salt)`, byte-identical to the md5 stub client the
  * oracle SQL recomputes in DuckDB, so the HTTP leg is hash-checkable
  * end-to-end.
  *
  * Routes:
  *   - `/lookup` — 200 with `{"Results":[...]}`, one result per input row
  *   - `/fail`   — 500 with a fixed body (exercises the reference's
  *     non-200 path, transform.py:462-470)
  *
  * JDK `com.sun.net.httpserver` only — no extra dependencies.
  */
final class StubPropertyServer(salt: String = "") {
  private val mapper = new ObjectMapper()
  private val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)

  private def lookupResponse(body: String): (Int, String) = {
    val arr = mapper.readTree(body)
    val out = mapper.createObjectNode()
    val results = out.putArray("Results")
    (0 until arr.size()).foreach { i =>
      val in = arr.get(i)
      val street = in.get("StreetAddress").asText()
      val hex = MessageDigest.getInstance("MD5")
        .digest((street + salt).getBytes(StandardCharsets.UTF_8))
        .map("%02x".format(_)).mkString
      val prop = java.lang.Long.parseLong(hex.substring(0, 12), 16)
      val o = results.addObject()
      o.put("ReferenceID", in.get("ReferenceID").asLong())
      (java.lang.Long.parseLong(hex.substring(0, 1), 16) % 4) match {
        case 0 => // service knows nothing about this address
          o.putNull("asgPropID")
        case 1 => // validated, final
          o.put("asgPropID", prop); o.put("AddedToPmDate", "2023-01-01")
          o.put("IsProvisional", false); o.put("LastValidatedDate", "2024-01-01")
        case 2 => // provisional, never added — the AddedToPmDate quirk branch
          o.put("asgPropID", prop); o.put("IsProvisional", true)
        case _ => // provisional with an issue note
          o.put("asgPropID", prop); o.put("AddedToPmDate", "2023-05-05")
          o.put("IsProvisional", true); o.put("IssueText", "rate limited")
      }
    }
    (200, mapper.writeValueAsString(out))
  }

  server.createContext("/lookup", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = respond(ex)(lookupResponse)
  })

  server.createContext("/fail", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex)(_ => (500, """{"error":"service unavailable"}"""))
  })

  // Deterministic PARTIAL failure: any batch containing a street address
  // with the substring "POISON" gets a 503; clean batches succeed as
  // /lookup. Lets tests exercise the reference's per-partition failure
  // isolation (one bad batch null-enriches ITS rows; others are
  // unaffected) without nondeterminism.
  server.createContext("/flaky", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = respond(ex) { body =>
      if (body.contains("POISON")) (503, """{"error":"backend overloaded"}""")
      else lookupResponse(body)
    }
  })

  // A 200 whose body is NOT the service's JSON shape (captive portal /
  // proxy interception page) — exercises the client's parse guard: the
  // batch must null-enrich, never fail the stage.
  server.createContext("/garbage", new HttpHandler {
    override def handle(ex: HttpExchange): Unit =
      respond(ex)(_ => (200, "<html><body>Please log in to continue</body></html>"))
  })

  // A 200 with well-formed JSON but FEWER results than inputs (partial
  // upstream response) — a client trusting it would silently drop
  // listings; the count guard must null-enrich the whole batch instead.
  server.createContext("/short", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = respond(ex) { body =>
      val arr = mapper.readTree(body)
      val out = mapper.createObjectNode()
      val results = out.putArray("Results")
      if (arr.size() > 0) {
        val o = results.addObject()
        o.put("ReferenceID", arr.get(0).get("ReferenceID").asLong())
        o.putNull("asgPropID")
      }
      (200, mapper.writeValueAsString(out))
    }
  })

  private def respond(ex: HttpExchange)(f: String => (Int, String)): Unit = {
    val body = new String(ex.getRequestBody.readAllBytes(), StandardCharsets.UTF_8)
    val (code, text) =
      try f(body)
      catch { case e: Exception => (400, s"""{"error":"${e.getMessage}"}""") }
    val bytes = text.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", "application/json")
    ex.sendResponseHeaders(code, bytes.length)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  server.setExecutor(null) // default executor; gate batches are tiny
  server.start()

  def port: Int = server.getAddress.getPort
  def lookupUrl: String = s"http://127.0.0.1:$port/lookup"
  def failUrl: String = s"http://127.0.0.1:$port/fail"
  def flakyUrl: String = s"http://127.0.0.1:$port/flaky"
  def garbageUrl: String = s"http://127.0.0.1:$port/garbage"
  def shortUrl: String = s"http://127.0.0.1:$port/short"
  def stop(): Unit = server.stop(0)
}
