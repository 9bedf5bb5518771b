package graft

import graft.llm.Dedup
import org.apache.spark.sql.functions._

class EditDistanceSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"), // lev 3 vs 1
    (3L, "the quick brown fox jumps over the lazy dog"), // exact dup of 1
    (4L, "completely different text with nothing shared here at all"))
    .toDF("doc_id", "text")

  test("editDistanceVerify computes lev and normalized similarity") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.editDistanceVerify(pairs, docs, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        ((r.getAs[Long]("lev"), r.getAs[Double]("lev_sim")))).toMap
    assert(out((1L, 3L)) == ((0L, 1.0)))
    assert(out((1L, 2L))._1 == 3L)
    val len = "the quick brown fox jumps over the lazy dog".length
    assert(math.abs(out((1L, 2L))._2 - (1.0 - 3.0 / len)) < 1e-12)
    assert(out((1L, 4L))._1 > 20L)
  }

  test("maxDist drops far pairs and length-prefilters before the compare") {
    val pairs = Seq((1L, 2L), (1L, 4L)).toDF("id_a", "id_b")
    val out = Dedup.editDistanceVerify(pairs, docs, "doc_id", "text",
      maxDist = Some(5))
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(out == Set((1L, 2L)))
  }

  test("null text: lev and lev_sim stay null under the equality short-circuit") {
    // the a === b short-circuit must not turn levenshtein's null
    // result into 0 when either side is null
    val withNull = docs.unionByName(
      Seq((9L, null.asInstanceOf[String])).toDF("doc_id", "text"))
    val pairs = Seq((1L, 9L), (9L, 9L)).toDF("id_a", "id_b")
    val out = Dedup.editDistanceVerify(pairs, withNull, "doc_id", "text")
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b")) ->
        r.isNullAt(r.fieldIndex("lev"))).toMap
    assert(out((1L, 9L)) && out((9L, 9L)))
  }

  test("extra pair columns pass through") {
    val pairs = Seq((1L, 2L, 0.93)).toDF("id_a", "id_b", "jaccard")
    val row = Dedup.editDistanceVerify(pairs, docs, "doc_id", "text")
      .select("jaccard", "lev").head()
    assert(row.getDouble(0) == 0.93 && row.getLong(1) == 3L)
  }
}
