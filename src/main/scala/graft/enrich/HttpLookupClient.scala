package graft.enrich

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.nio.charset.StandardCharsets
import java.time.Duration

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.databind.node.{ArrayNode, ObjectNode}
import org.apache.spark.sql.Row

/** Concrete HTTP implementation of [[BatchLookup.LookupClient]] — the
  * reference's PropertyMaster API call (mls_listings_transform.py:421-481):
  * one POST per partition with a JSON array of listing dicts as the body,
  * `Content-Type: application/json` / `Accept: *&#47;*` headers, a
  * fixed pre-call sleep to pace the service (transform.py:434-436, the
  * "Connection reset" workaround), and the reference's exact failure
  * contract — any non-200 status or transport exception yields one
  * null-enriched row PER INPUT ROW carrying the input's ReferenceID and the
  * error text in IssueText (transform.py:478-481), so the pipeline keeps
  * going instead of failing the stage.
  *
  * Success responses are `{"Results": [ {...}, ... ]}`; only the six result
  * keys are kept, each defaulting to null when absent
  * (transform.py:448-451).
  *
  * Scale note: the client is constructed per-partition-call inside
  * `lookup` consumers via serialization — only the endpoint/throttle config
  * is shipped to executors; the `java.net.http.HttpClient` itself is
  * created lazily per JVM task and is not serialized.
  */
final class HttpLookupClient(endpoint: String, throttleMillis: Long = 10L,
                             timeout: Duration = Duration.ofSeconds(30))
    extends BatchLookup.LookupClient {

  @transient private lazy val http: HttpClient =
    HttpClient.newBuilder().connectTimeout(timeout).build()
  @transient private lazy val mapper = new ObjectMapper()

  override def lookup(batch: Seq[Row]): Seq[Row] = {
    // Pace the service — the reference sleeps BEFORE every call
    // (transform.py:436) to avoid connection resets under fan-out.
    if (throttleMillis > 0) Thread.sleep(throttleMillis)
    val body = serialize(batch)
    val outcome: Either[String, String] =
      try {
        val req = HttpRequest.newBuilder(URI.create(endpoint))
          .timeout(timeout)
          .header("Content-Type", "application/json")
          .header("Accept", "*/*")
          .POST(HttpRequest.BodyPublishers.ofString(body, StandardCharsets.UTF_8))
          .build()
        val resp = http.send(req, HttpResponse.BodyHandlers.ofString())
        if (resp.statusCode() == 200) Right(resp.body())
        else Left(resp.body()) // non-200: body text becomes IssueText
      } catch {
        case e: Exception => Left(e.toString) // transport error: repr(e)
      }
    outcome match {
      case Right(text) =>
        // A 200 status does not guarantee a parseable body (proxy pages,
        // truncated responses, captive portals). Parse failures — and
        // responses whose result count does not match the batch, which
        // would silently drop listings — degrade to the same per-input
        // null-enriched contract as transport failures, so a poisoned
        // batch can never fail the stage.
        try {
          val rows = parseResults(text)
          if (rows.size == batch.size) rows
          else nullEnriched(batch,
            s"response had ${rows.size} results for ${batch.size} inputs")
        } catch {
          case e: Exception =>
            nullEnriched(batch, s"unparseable 200 response: ${e.toString}")
        }
      case Left(issue) => nullEnriched(batch, issue)
    }
  }

  /** Failure contract: one null-enriched row per input, in input order,
    * carrying the issue text (transform.py:478-481) — the engine never
    * loses a listing to a flaky service, it just records the issue. */
  private def nullEnriched(batch: Seq[Row], issue: String): Seq[Row] =
    batch.map { r =>
      Row(r.getAs[Any]("ReferenceID"), null, null, null, null, issue)
    }

  /** JSON array of one object per input row, field names from the row
    * schema — the shape `json.dumps([row.asDict() ...])` produces. */
  private def serialize(batch: Seq[Row]): String = {
    val arr = mapper.createArrayNode()
    batch.foreach { r =>
      val o = arr.addObject()
      r.schema.fieldNames.zipWithIndex.foreach { case (name, i) =>
        r.get(i) match {
          case null         => o.putNull(name)
          case s: String    => o.put(name, s)
          case l: Long      => o.put(name, l)
          case n: Int       => o.put(name, n)
          case b: Boolean   => o.put(name, b)
          case d: Double    => o.put(name, d)
          case other        => o.put(name, other.toString)
        }
      }
    }
    mapper.writeValueAsString(arr)
  }

  /** `{"Results": [...]}` → one Row per result dict, keeping only the six
    * schema keys and null-filling absent ones (transform.py:448-451). */
  private def parseResults(text: String): Seq[Row] = {
    val results = mapper.readTree(text).get("Results").asInstanceOf[ArrayNode]
    (0 until results.size()).map { i =>
      val o = results.get(i)
      def node(k: String): Option[JsonNode] =
        Option(o.get(k)).filterNot(_.isNull)
      val refId: Any = node("ReferenceID").map(_.asLong()).orNull
      val prop: Any = node("asgPropID").map(_.asLong()).orNull
      val added: Any = node("AddedToPmDate").map(_.asText()).orNull
      val prov: Any = node("IsProvisional").map(_.asBoolean()).orNull
      val lastVal: Any = node("LastValidatedDate").map(_.asText()).orNull
      val issue: Any = node("IssueText").map(_.asText()).orNull
      Row(refId, prop, added, prov, lastVal, issue)
    }
  }
}
