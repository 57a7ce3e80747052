package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.ops.TextClassifier

/** Distributed hashed-token logistic regression: separation on a
  * disjoint-vocabulary corpus, the literal-array vs broadcast-join weight
  * paths agreeing, zero-token docs scoring at the bias, and repartition
  * invariance (the determinism the DuckDB training oracle relies on).
  */
class TextClassifierSpec extends AnyFunSuite {
  private lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def corpus = Seq(
    (0L, "alpha beta gamma alpha", "en"),
    (1L, "beta gamma alpha beta", "en"),
    (2L, "delta alpha beta gamma", "en"),
    (3L, "zulu xray yankee zulu", "de"),
    (4L, "xray yankee zulu xray", "de"),
    (5L, "whiskey zulu xray yankee", "de")
  ).toDF("doc_id", "text", "lang")

  test("trainScore separates disjoint-vocabulary classes") {
    val out = TextClassifier.trainScore(corpus, col("lang") === "en",
      dim = 64, epochs = 3).collect()
      .map(r => r.getLong(0) -> ((r.getDouble(1), r.getDouble(2),
        r.getBoolean(3)))).toMap
    assert(out.size === 6)
    val enScores = (0L to 2L).map(out(_)._2)
    val deScores = (3L to 5L).map(out(_)._2)
    assert(enScores.min > deScores.max,
      s"en=$enScores de=$deScores")
    (0L to 2L).foreach(i => assert(out(i)._3, s"doc $i should predict en"))
    (3L to 5L).foreach(i => assert(!out(i)._3, s"doc $i should predict de"))
    (0L to 2L).foreach(i => assert(out(i)._1 === 1.0))
    (3L to 5L).foreach(i => assert(out(i)._1 === 0.0))
  }

  test("broadcast-join weight path equals the literal-array path") {
    val lit = TextClassifier.trainScore(corpus, col("lang") === "en",
      dim = 64, epochs = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    val join = TextClassifier.trainScore(corpus, col("lang") === "en",
      dim = 64, epochs = 2, forceJoin = true).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(lit === join)
  }

  test("zero-token docs score at the bias and stay in the output") {
    val docs = corpus.union(Seq((6L, "", "de")).toDF("doc_id", "text", "lang"))
    val feats = TextClassifier.features(docs, dim = 64)
    assert(feats.where(col("id") === 6L).count() === 0)
    val labels = docs.select(col("doc_id").as("id"),
      (col("lang") === "en").cast("double").as("y"))
    val (w, bias) = TextClassifier.trainLogreg(feats, labels, dim = 64,
      epochs = 2)
    val scored = TextClassifier.score(feats, labels, w, bias).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("z")).toMap
    assert(scored.size === 7)
    assert(math.abs(scored(6L) - BigDecimal(bias).setScale(6,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
  }

  test("training is invariant to input partitioning") {
    val a = TextClassifier.trainScore(corpus, col("lang") === "en",
      dim = 64, epochs = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    val b = TextClassifier.trainScore(corpus.repartition(7),
      col("lang") === "en", dim = 64, epochs = 2).collect()
      .map(r => (r.getLong(0), r.getDouble(2))).sortBy(_._1).toSeq
    assert(a === b)
  }
}
