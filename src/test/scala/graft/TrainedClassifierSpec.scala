package graft

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the real-weights classifier path: the trained artifact
  * (tools/train_classifier.py, perceptron on the stopword-density rule)
  * must actually CLASSIFY — perfect on its training corpus (the
  * perceptron converged to zero errors), high-accuracy held out — and
  * scoring must stay a Scan→Project plan (the weights are a literal
  * array, not a vocabulary join). */
class TrainedClassifierSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def accuracyOn(dir: String): Double = {
    val pred = operators.TextQueries.txtClassifierTrained(spark, dir)
    val truth = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), (size(filter(split(col("text"), " "),
        t => t.isin("the", "a", "of", "to", "and", "in")))
        .cast("double") / size(split(col("text"), " ")) <= 0.06).as("keep"))
    val joined = pred.join(truth, "doc_id")
      .select((col("label") === "keep") === col("keep"))
      .collect().map(_.getBoolean(0))
    joined.count(identity).toDouble / joined.length
  }

  test("trained weights reproduce the quality rule (train=1.0, held-out>=0.9)") {
    assert(accuracyOn("/root/testdata/sf0.01") == 1.0,
      "perceptron artifact no longer separates its own training corpus — " +
        "was the resource regenerated without re-running the trainer?")
    assert(accuracyOn("/root/testdata/sf0.001") >= 0.9)
  }

  test("real-weights scoring plans as Scan -> Project (no shuffle, no join)") {
    val prev = spark.conf.get("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val plan = operators.TextQueries
        .txtClassifierTrained(spark, "/root/testdata/sf0.001")
        .queryExecution.executedPlan
      assert(plan.collect { case e: ShuffleExchangeExec => e }.isEmpty,
        "trained classifier grew a shuffle — weights must stay a literal")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
