package graft

import graft.llm.Classifier
import org.apache.spark.sql.functions._

class ClassifierSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "good clean prose text here", true),
    (2L, "good text text prose words", true),
    (3L, "spam spam junk junk spam buy", false),
    (4L, "junk buy buy spam junk", false),
    (5L, "good prose spam", true),
    (6L, "", false)
  ).toDF("id", "txt", "pos")

  test("hand-computed weights and scores on a tiny corpus") {
    // class token totals: pos = 5+5+3 = 13, neg = 6+5+0 = 11
    // vocab = {good clean prose text here words spam junk buy} → V = 9
    // w(good) = ln((3+1)/(13+9)) − ln((0+1)/(11+9))
    val wGood = math.round(
      (math.log(4.0 / 22.0) - math.log(1.0 / 20.0)) * 1e6)
    // w(spam): tfp = 1 (doc 5), tfn = 3 + 1 = 4
    val wSpam = math.round(
      (math.log(2.0 / 22.0) - math.log(5.0 / 20.0)) * 1e6)
    val (weights, consts) = Classifier.nbTrain(docs, "id", "txt", "pos")
    val w = weights.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(w("good") == wGood)
    assert(w("spam") == wSpam)
    // priors: 3 pos docs vs 3 neg → ln(3)−ln(3) = 0
    val c = consts.collect().head
    assert(c.getAs[Long]("prior_e6") == 0L)
    assert(c.getAs[Long]("oov_e6") ==
      math.round((math.log(1.0 / 22.0) - math.log(1.0 / 20.0)) * 1e6))
    val out = Classifier.nbScore(docs, weights, consts, "id", "txt")
      .orderBy("doc_id").collect()
    // clean docs score positive, spam docs negative
    assert(out.map(_.getAs[Boolean]("pred")).toSeq ==
      Seq(true, true, false, false, true, false))
    // the token-less doc gets exactly the prior (0 here) and is kept
    val empty = out.find(_.getLong(0) == 6L).get
    assert(empty.getAs[Long]("n_terms") == 0L)
    assert(empty.getAs[Long]("score_e6") == 0L)
  }

  test("scores are partitioning-independent and integer-exact") {
    val a = Classifier.nbTrainScore(docs, "id", "txt", "pos")
      .orderBy("doc_id").collect().toSeq
    val b = Classifier.nbTrainScore(docs.repartition(7), "id", "txt", "pos")
      .orderBy("doc_id").collect().toSeq
    assert(a == b)
  }

  test("shard-trained count models merge into exactly the whole-corpus model") {
    val shardA = docs.filter($"id" <= 3)
    val shardB = docs.filter($"id" > 3)
    val merged = Classifier.mergeStats(Seq(
      Classifier.nbTrainStats(shardA, "id", "txt", "pos"),
      Classifier.nbTrainStats(shardB, "id", "txt", "pos")))
    val (wM, cM) = Classifier.weightsFromStats(merged._1, merged._2)
    val (wW, cW) = Classifier.nbTrain(docs, "id", "txt", "pos")
    assert(wM.orderBy("term").collect().toSeq ==
      wW.orderBy("term").collect().toSeq)
    assert(cM.collect().toSeq == cW.collect().toSeq)
    // and the derived path matches direct training on one shard too
    val statsA = Classifier.nbTrainStats(shardA, "id", "txt", "pos")
    val (wA, cA) = Classifier.weightsFromStats(statsA._1, statsA._2)
    val (wA2, cA2) = Classifier.nbTrain(shardA, "id", "txt", "pos")
    assert(wA.orderBy("term").collect().toSeq ==
      wA2.orderBy("term").collect().toSeq)
    assert(cA.collect().toSeq == cA2.collect().toSeq)
  }

  test("count-form model round-trips parquet and keeps merging") {
    val dir = java.nio.file.Files.createTempDirectory("nbstats").toString
    val (st, ds) = Classifier.nbTrainStats(docs.filter($"id" <= 3),
      "id", "txt", "pos")
    st.write.parquet(s"$dir/stats"); ds.write.parquet(s"$dir/docstats")
    val merged = Classifier.mergeStats(Seq(
      (spark.read.parquet(s"$dir/stats"),
        spark.read.parquet(s"$dir/docstats")),
      Classifier.nbTrainStats(docs.filter($"id" > 3), "id", "txt", "pos")))
    val (wM, cM) = Classifier.weightsFromStats(merged._1, merged._2)
    val (wW, cW) = Classifier.nbTrain(docs, "id", "txt", "pos")
    assert(wM.orderBy("term").collect().toSeq ==
      wW.orderBy("term").collect().toSeq)
    assert(cM.collect().toSeq == cW.collect().toSeq)
  }

  test("train once, persist, score later — parquet round-trip") {
    val dir = java.nio.file.Files.createTempDirectory("nbmodel").toString
    val (weights, consts) = Classifier.nbTrain(docs, "id", "txt", "pos")
    weights.write.mode("overwrite").parquet(s"$dir/weights")
    consts.write.mode("overwrite").parquet(s"$dir/consts")
    val fresh = Seq(
      (10L, "good prose"),           // in-vocab positive
      (11L, "spam junk buy"),        // in-vocab negative
      (12L, "zzz unseen tokens")     // all-OOV → prior + 3·oov
    ).toDF("id", "txt")
    val out = Classifier.nbScore(fresh,
      spark.read.parquet(s"$dir/weights"),
      spark.read.parquet(s"$dir/consts"), "id", "txt")
      .orderBy("doc_id").collect()
    assert(out.map(_.getAs[Boolean]("pred")).toSeq ==
      Seq(true, false, false))
    val oov = consts.collect().head.getAs[Long]("oov_e6")
    assert(out(2).getAs[Long]("score_e6") == 3L * oov)
  }
}
