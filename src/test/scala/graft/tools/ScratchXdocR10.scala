package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** r10 scratch: A/B crossDocSpans' gram persistence — lazy
  * localCheckpoint vs plain recompute (two gram scans). */
object ScratchXdocR10 {

  def variant(docs: DataFrame, idCol: String, textCol: String,
              k: Int, maxDocFreq: Long, checkpoint: Boolean): DataFrame = {
    import graft.llm.Text
    val byDoc = Window.partitionBy(col(idCol))
    val ordered = byDoc.orderBy(col("pos"))
    val gram = concat_ws(" ",
      col("word") +: (1 until k).map(j => lead(col("word"), j).over(ordered)): _*)
    val grams0 = docs
      .select(col(idCol), posexplode(Text.words(Text.normalize(col(textCol))))
        .as(Seq("pos", "word")))
      .select(col(idCol), col("pos"), gram.as("gram"),
        count(lit(1)).over(byDoc).as("nw"))
      .filter(col("pos") <= col("nw") - k)
      .select(col(idCol), col("pos"), xxhash64(col("gram")).as("h"))
    val grams = if (checkpoint) grams0.localCheckpoint(false) else grams0
    val sharedHashes = grams.groupBy("h")
      .agg(countDistinct(col(idCol)).as("df"))
      .filter(col("df").between(2, maxDocFreq))
      .select("h")
    val covered = grams.join(sharedHashes, "h")
    val newSpan = when(col("pos") >
      lag(col("pos"), 1).over(ordered) + k, 1).otherwise(0)
    covered
      .withColumn("span", sum(newSpan).over(
        ordered.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(idCol), col("span"))
      .agg(min(col("pos")).cast("bigint").as("span_start"),
        (max(col("pos")) + k - 1).cast("bigint").as("span_end"),
        count(lit(1)).cast("bigint").as("n_grams"))
      .drop("span")
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$label: ${(System.nanoTime() - t0) / 1e9}%.2f s (rows=$n)")
    }
    for (i <- 1 to 2)
      time(s"recompute run$i")(
        variant(docs, "doc_id", "text", 5, 1000, checkpoint = false).count())
    for (i <- 1 to 2)
      time(s"lazy-ckpt run$i")(
        variant(docs, "doc_id", "text", 5, 1000, checkpoint = true).count())
    spark.stop()
  }
}
