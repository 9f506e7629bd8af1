package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins README.md's gate counts to the code so the documented numbers
  * cannot drift from `SparkEntry` again (a round-11 review caught a
  * stale streaming-replay count — this spec kills that defect class).
  * The README must state counts in the exact greppable forms asserted
  * here; a reworded claim fails loudly rather than silently un-pinning. */
class ReadmeCountsSpec extends AnyFunSuite {

  private lazy val readme =
    java.nio.file.Files.readString(java.nio.file.Paths.get("README.md"))

  test("headline query count matches SparkEntry.queries and oracleSql") {
    val m = "\\((\\d+) queries, ALL (\\d+) oracle-checked".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README no longer states '(N queries, ALL N oracle-checked'"))
    assert(m.group(1).toInt == SparkEntry.queries.size,
      s"README claims ${m.group(1)} queries; SparkEntry has ${SparkEntry.queries.size}")
    assert(m.group(2).toInt == SparkEntry.oracleSql.size,
      s"README claims ${m.group(2)} oracle-checked; oracleSql has ${SparkEntry.oracleSql.size}")
  }

  test("streaming replay count matches the q_stream_* gate set") {
    val m = "(\\d+) oracle-gated streaming replays".r
      .findFirstMatchIn(readme)
      .getOrElse(fail("README no longer states 'N oracle-gated streaming replays'"))
    val streamGates = SparkEntry.queries.keys.count(_.startsWith("q_stream_"))
    assert(m.group(1).toInt == streamGates,
      s"README claims ${m.group(1)} streaming replays; found $streamGates q_stream_* gates")
  }

  test("every query has an oracle (the 'ALL oracle-checked' claim itself)") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty, s"queries without oracle SQL: $missing")
    val orphaned = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphaned.isEmpty, s"oracle SQL without a query: $orphaned")
  }
}
