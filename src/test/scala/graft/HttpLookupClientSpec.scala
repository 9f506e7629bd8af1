package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.enrich.{BatchLookup, HttpLookupClient, StubPropertyServer}
import graft.pipeline.mls.MlsEnrich

/** Drives the real HTTP client over a loopback socket — success parse,
  * non-200 failure, and connection-refused failure — pinning the
  * reference's contract (mls_listings_transform.py:421-481): failures
  * yield one null-enriched row PER INPUT with the ReferenceID preserved
  * and the error text in IssueText; the pipeline never throws. */
class HttpLookupClientSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private val inputSchema = StructType(Seq(
    StructField("StreetAddress", StringType), StructField("City", StringType),
    StructField("StateAbbr", StringType), StructField("Zip5", StringType),
    StructField("Unit", StringType), StructField("ReferenceID", LongType)))

  private def inRow(street: String, ref: Long): Row =
    new org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema(
      Array[Any](street, "CITY", "TX", "75001", null, ref), inputSchema)

  test("200 path: batch POST round-trips and parses Results in order") {
    val server = new StubPropertyServer()
    try {
      val client = new HttpLookupClient(server.lookupUrl, throttleMillis = 0)
      val out = client.lookup(Seq(inRow("ADDR 1", 11L), inRow("ADDR 2", 22L)))
      assert(out.map(_.getAs[Long](0)) == Seq(11L, 22L))
      // Response content matches the md5 stub function for each street
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest("ADDR 1".getBytes("UTF-8")).map("%02x".format(_)).mkString
      val d = java.lang.Long.parseLong(hex.substring(0, 1), 16) % 4
      if (d == 0) assert(out.head.isNullAt(1))
      else assert(out.head.getAs[Long](1) ==
        java.lang.Long.parseLong(hex.substring(0, 12), 16))
    } finally server.stop()
  }

  test("non-200 path: one null-enriched row per input, body as IssueText") {
    val server = new StubPropertyServer()
    try {
      val client = new HttpLookupClient(server.failUrl, throttleMillis = 0)
      val in = Seq(inRow("A", 1L), inRow("B", 2L), inRow("C", 3L))
      val out = client.lookup(in)
      assert(out.length == 3)
      assert(out.map(_.getAs[Long](0)) == Seq(1L, 2L, 3L))
      out.foreach { r =>
        assert(r.isNullAt(1) && r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
        assert(r.getAs[String](5).contains("service unavailable"))
      }
    } finally server.stop()
  }

  test("transport failure (connection refused): same null-enriched contract") {
    // Bind-then-close guarantees the port is unused.
    val sock = new java.net.ServerSocket(0); val port = sock.getLocalPort; sock.close()
    val client = new HttpLookupClient(s"http://127.0.0.1:$port/lookup",
      throttleMillis = 0, timeout = java.time.Duration.ofSeconds(2))
    val out = client.lookup(Seq(inRow("A", 7L)))
    assert(out.length == 1 && out.head.getAs[Long](0) == 7L)
    assert(out.head.isNullAt(1))
    assert(out.head.getAs[String](5).nonEmpty) // exception repr recorded
  }

  test("200 with a non-JSON body (captive portal): null-enriched, not a throw") {
    val server = new StubPropertyServer()
    try {
      val client = new HttpLookupClient(server.garbageUrl, throttleMillis = 0)
      val in = Seq(inRow("A", 1L), inRow("B", 2L))
      val out = client.lookup(in)
      assert(out.length == 2)
      assert(out.map(_.getAs[Long](0)) == Seq(1L, 2L))
      out.foreach { r =>
        assert(r.isNullAt(1))
        assert(r.getAs[String](5).contains("unparseable 200 response"))
      }
    } finally server.stop()
  }

  test("200 with fewer results than inputs: whole batch null-enriched") {
    val server = new StubPropertyServer()
    try {
      val client = new HttpLookupClient(server.shortUrl, throttleMillis = 0)
      val in = Seq(inRow("A", 1L), inRow("B", 2L), inRow("C", 3L))
      val out = client.lookup(in)
      assert(out.length == 3, "a short response must not drop listings")
      assert(out.map(_.getAs[Long](0)) == Seq(1L, 2L, 3L))
      out.foreach(r => assert(
        r.getAs[String](5).contains("1 results for 3 inputs")))
    } finally server.stop()
  }

  test("distributed enrichment over the wire matches the in-JVM stub client") {
    val server = new StubPropertyServer()
    try {
      import spark.implicits._
      val listings = (1 to 200).toDF("k").selectExpr(
        "'MLS' || CAST(k % 3 AS STRING) AS mls",
        "'L' || CAST(k AS STRING) AS mls_listing_id",
        "'ADDR ' || CAST(k % 40 AS STRING) AS street_address",
        "'CITY' || CAST(k % 5 AS STRING) AS city",
        "'TX' AS state", "'75001' AS zip",
        "CAST(NULL AS STRING) AS unit")
      val httpClient = new HttpLookupClient(server.lookupUrl, throttleMillis = 1)
      val overWire = MlsEnrich.lookupPropertyIds(spark, listings, httpClient, 32)
        .get.localCheckpoint(eager = true)
      val inJvm = MlsEnrich.lookupPropertyIds(spark, listings,
        graft.pipeline.mls.MlsJob1Gate.md5StubClient(""), 32).get
      assert(overWire.exceptAll(inJvm).isEmpty && inJvm.exceptAll(overWire).isEmpty)
    } finally server.stop()
  }

  test("PARTIAL failure: only the poisoned partition's rows null-enrich") {
    val server = new StubPropertyServer()
    try {
      import spark.implicits._
      // force the poisoned key into its own partition: batchSize 2 over 6
      // rows -> 3 partitions; exactly the batch carrying POISON gets 503
      val rows = Seq(
        ("ADDR 1", 1L), ("ADDR 2", 2L), ("ADDR 3", 3L),
        ("POISON ST", 4L), ("ADDR 5", 5L), ("ADDR 6", 6L))
      val keys = spark.createDataFrame(
        spark.sparkContext.parallelize(rows.map { case (st, ref) =>
          inRow(st, ref) }, 3), inputSchema)
      val client = new HttpLookupClient(server.flakyUrl, throttleMillis = 0)
      val out = BatchLookup.enrich(spark, keys, client, batchSize = 2,
        MlsEnrich.apiResultSchema).localCheckpoint(eager = true)
      assert(out.count() == 6, "a failing batch lost rows")
      val failed = out.filter("IssueText IS NOT NULL")
        .select("ReferenceID").as[Long].collect().toSet
      // the poisoned batch null-enriched ITS rows and only those
      assert(failed.contains(4L))
      assert(failed.size < 6, "failure leaked into clean batches")
      val clean = out.filter("IssueText IS NULL")
      assert(clean.count() == 6 - failed.size)
      assert(clean.filter("asgPropID IS NOT NULL OR asgPropID IS NULL").count()
        == clean.count()) // parses, no throw
    } finally server.stop()
  }

  test("partition-level failure keeps every key with nulls (BatchLookup path)") {
    val server = new StubPropertyServer()
    try {
      val keys = spark.createDataFrame(
        new java.util.ArrayList[Row](java.util.List.of(
          inRow("X", 1L), inRow("Y", 2L), inRow("Z", 3L))), inputSchema)
      val client = new HttpLookupClient(server.failUrl, throttleMillis = 0)
      val out = BatchLookup.enrich(spark, keys, client, batchSize = 2,
        MlsEnrich.apiResultSchema).localCheckpoint(eager = true)
      assert(out.count() == 3)
      assert(out.filter("asgPropID IS NULL AND IssueText IS NOT NULL").count() == 3)
    } finally server.stop()
  }
}
