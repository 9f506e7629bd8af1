package graft.streaming

import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.sources.TableIO.table

/** Oracle-gated STREAMING twins — deterministic micro-batch replays of the
  * streaming operators, run as real Structured Streaming queries whose
  * final sink frame the DuckDB oracle recomputes relationally. This puts
  * the streaming surface under the same hash bar as every batch operator
  * (previously it was spec-tested only).
  *
  * Replay design: the delta lands as a fixed number of parquet files and a
  * file-source stream with `maxFilesPerTrigger=1` makes each file one
  * micro-batch — a deterministic batch schedule with no driver-side data
  * collection (the MemoryStream harness the specs use would pull every
  * delta row through the driver; a file replay keeps the data distributed,
  * which is the shape that still works when the delta is a day of ingest).
  * The emitted SET is batch-boundary-invariant by construction: each delta
  * doc belongs to exactly one file, the stream-static join is stateless,
  * and pairs are per-doc independent — so the appended frames union to the
  * relational delta × corpus screen no matter how the files are cut.
  */
object StreamGates {

  private val runSeq = new AtomicInteger(0)

  /** q_stream_neardup: the CorpusStream near-dup intake screen
    * (stream-static PPJoin against the corpus prefix index,
    * CorpusStream.nearDupScreen) replayed over the same delta/corpus split
    * as q_dedup_incremental: doc_id % 10 == 0 arrives on the stream, the
    * rest is the static corpus. Append mode, checkpointed, 4 micro-batches;
    * returns the memory sink's final frame. */
  def streamNearDup(s: SparkSession, dir: String): DataFrame = {
    val root = graft.sources.ScratchDirs.fresh("stream_neardup")
    val docs = table(s, dir, "documents").select(col("doc_id"), col("text"))
    docs.filter(col("doc_id") % 10 === 0)
      .repartition(4)
      .write.parquet(s"$root/delta")
    val index = CorpusStream.corpusPrefixIndex(
      docs.filter(col("doc_id") % 10 =!= 0))
    val incoming = s.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(s"$root/delta")
    val sink = s"graft_stream_neardup_${runSeq.incrementAndGet()}"
    val q = CorpusStream.nearDupScreen(incoming, index)
      .writeStream.format("memory").queryName(sink)
      .outputMode("append")
      .option("checkpointLocation", s"$root/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    s.table(sink)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q_stream_neardup" -> (streamNearDup _))

  /** Same relational definition as q_dedup_incremental — the streaming
    * replay must land exactly where the batch operator lands. */
  val oracles: Map[String, String] = Map(
    "q_stream_neardup" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
        |sh AS (SELECT doc_id, list_distinct(list_transform(range(1, len(t) - 1),
        |         i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS s FROM toks)
        |SELECT a.doc_id AS doc_new, b.doc_id AS doc_existing,
        |  CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |  CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    AS jaccard
        |FROM sh a JOIN sh b
        |  ON a.doc_id % 10 = 0 AND b.doc_id % 10 <> 0
        |WHERE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) /
        |  CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
        |    >= 0.5""".stripMargin)
}
