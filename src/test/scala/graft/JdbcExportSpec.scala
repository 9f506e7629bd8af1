package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.JdbcExport

/** S11 export semantics against embedded Derby (the JDBC engine bundled
  * with Spark's jars) — truncate-not-drop reload, column projection,
  * bounded parallelism, and row-count validation. */
class JdbcExportSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val url = "jdbc:derby:memory:graft_export;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  test("export writes, re-export truncates (no duplication), counts validate") {
    val df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
      .select($"o_orderkey", $"o_custkey", $"o_orderstatus", $"o_totalprice")
      .limit(500)
    val cfg = JdbcExport.Config(url, "ORDERS_SQOOP",
      columns = Seq("o_orderkey", "o_custkey", "o_totalprice"),
      numPartitions = 2, options = opts)
    val n1 = JdbcExport.export(df, cfg)
    assert(n1 == 500)
    // second export must TRUNCATE and reload, not append or drop/create
    val n2 = JdbcExport.export(df, cfg)
    assert(n2 == 500)
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "ORDERS_SQOOP").options(opts)
      .load()
    assert(back.count() == 500)
    assert(back.columns.map(_.toLowerCase).sorted.toSeq ==
      Seq("o_custkey", "o_orderkey", "o_totalprice"))
  }

  test("validation fails loudly when the landed count diverges") {
    // Pre-create the serving table with a trigger that silently drops one
    // of the exported rows — the kind of serving-side surprise --validate
    // exists to catch. truncate=true keeps the table (and its trigger)
    // across the export.
    val conn = java.sql.DriverManager.getConnection(url)
    try {
      val st = conn.createStatement()
      st.executeUpdate("CREATE TABLE SHRINKY (id BIGINT, v VARCHAR(10))")
      st.executeUpdate(
        "CREATE TRIGGER shrink AFTER INSERT ON SHRINKY DELETE FROM SHRINKY WHERE id = 1")
    } finally conn.close()
    val df = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "v")
    val cfg = JdbcExport.Config(url, "SHRINKY", numPartitions = 1, options = opts)
    val e = intercept[IllegalStateException] { JdbcExport.export(df, cfg) }
    assert(e.getMessage.contains("validation failed"))
    assert(e.getMessage.contains("wrote 3"))
  }
}
