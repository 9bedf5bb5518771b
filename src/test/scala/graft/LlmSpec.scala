package graft

import graft.llm.{Dedup, Multimodal, Similarity, Text}
import org.apache.spark.sql.functions._

/** LLM-pipeline operator tests: dedup recall/precision on crafted
  * corpora, LSH ANN recall vs brute force, text metrics, multimodal
  * plumbing. */
class LlmSpec extends SparkSuite {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"),
    (3L, "the quick brown fox jumps over the lazy cat again and again"),
    (4L, "completely different words about spark query engines at scale"),
    (5L, "unrelated text mentioning parquet shuffles and broadcast joins"))
    .toDF("doc_id", "text")

  test("minhash near-dups: identical pair found at 1.0; distinct docs absent") {
    val pairs = Dedup.nearDuplicates(docs, "doc_id", "text",
      threshold = 0.9, k = 3, numHashes = 64, bands = 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(pairs.exists(p => p._1 == 1L && p._2 == 2L && p._3 == 1.0))
    assert(!pairs.exists(p => p._2 == 4L || p._2 == 5L))
  }

  test("near-identical docs (one word changed) score high but below 1") {
    val j = Dedup.ngramJaccard(
      Seq((1L, 3L)).toDF("id_a", "id_b"), docs, "doc_id", "text", k = 3)
      .select("jaccard").collect().head.getDouble(0)
    assert(j > 0.5 && j < 1.0)
  }

  test("simhash: identical docs collide at distance 0") {
    val dups = Dedup.simhashNearDups(docs, "doc_id", "text", maxDist = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(dups.contains((1L, 2L)))
  }

  test("dropNearDuplicates keeps the lowest id of each pair") {
    val kept = Dedup.dropNearDuplicates(docs, "doc_id", "text",
      threshold = 0.9, k = 3, numHashes = 64, bands = 16)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 3L, 4L, 5L)) // doc 2 == doc 1, dropped
  }

  test("connectedComponents: min-label over a chain and a separate pair") {
    val pairs = Seq((1L, 2L), (2L, 3L), (7L, 9L)).toDF("id_a", "id_b")
    val comps = Dedup.connectedComponents(pairs)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(comps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 7L -> 7L, 9L -> 7L))
  }

  test("Clean.corpus: quality gate + exact + near-dup removal") {
    val withJunk = docs.unionByName(
      Seq((6L, "tiny")).toDF("doc_id", "text")) // fails minTokens
    val cleaned = graft.llm.Clean.corpus(withJunk, "doc_id", "text",
      graft.llm.Clean.Config(minTokens = 5, nearDupThreshold = 0.9,
        shingleK = 3, numHashes = 64, bands = 16))
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(cleaned.toSeq == Seq(1L, 3L, 4L, 5L))
  }

  test("exact dedup groups by md5") {
    val g = Dedup.exactDupGroups(docs, "doc_id", "text").collect()
    assert(g.length == 1 && g.head.getLong(1) == 2 && g.head.getLong(2) == 1L)
  }

  test("LSH ANN recall vs brute force on real embeddings >= 0.6") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(e, q, k = 1)
      .select("query_id", "nn_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val lsh = Similarity.lshTopK(e, q, k = 1, dim = 64, nBits = 4)
      .select("query_id", "nn_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = bf.count { case (qid, nn) => lsh.get(qid).contains(nn) }
      .toDouble / bf.size
    assert(recall >= 0.6, s"LSH top-1 recall $recall")
  }

  test("IVF ANN recall vs brute force on real embeddings >= 0.8") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val bf = Similarity.bruteForceTopK(e, q, k = 1)
      .select("query_id", "nn_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // assignTop=2 soft assignment: the production recall knob for
    // near-uniform vectors at a low probe fraction (3/8 cells)
    val ivf = Similarity.ivfTopK(e, q, k = 1, nCentroids = 8, nProbe = 3,
        assignTop = 2)
      .select("query_id", "nn_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val recall = bf.count { case (qid, nn) => ivf.get(qid).contains(nn) }
      .toDouble / bf.size
    assert(recall >= 0.8, s"IVF top-1 recall $recall")
  }

  test("IVF index round-trips through cell-partitioned parquet; " +
    "search over the stored index equals the one-shot path") {
    val e = Tables.t(spark, "/root/testdata/sf0.001", "embeddings")
    val q = e.filter(col("vec_id") < 20)
    val direct = Similarity.ivfTopK(e, q, k = 2, nCentroids = 8, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val dir = java.nio.file.Files.createTempDirectory("ivf-idx").toString
    val (cells, codebook) = Similarity.ivfIndex(e, nCentroids = 8)
    cells.write.mode("overwrite").partitionBy("cell")
      .parquet(s"$dir/cells")
    codebook.write.mode("overwrite").parquet(s"$dir/codebook")
    val stored = Similarity.ivfSearch(
      spark.read.parquet(s"$dir/cells"),
      spark.read.parquet(s"$dir/codebook"),
      q, k = 2, nProbe = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(stored == direct,
      s"stored-index search must equal one-shot: ${stored.diff(direct)} / ${direct.diff(stored)}")
  }

  test("cosine of a vector with itself is ~1; orthogonal is 0") {
    val df = Seq((Seq(1.0f, 0f, 2f), Seq(1.0f, 0f, 2f), Seq(0f, 3f, 0f)))
      .toDF("a", "b", "c")
    val r = df.select(Similarity.cosine(col("a"), col("b")),
      Similarity.cosine(col("a"), col("c"))).collect().head
    assert(math.abs(r.getDouble(0) - 1.0) < 1e-12)
    assert(r.getDouble(1) == 0.0)
  }

  test("text metrics: tokens, punct, stopwords, langId, fingerprint") {
    val df = Seq("The quick fox, and the dog!").toDF("text")
    val r = df.select(
      Text.tokenCount(col("text")),
      Text.punctCount(col("text")),
      Text.stopwordCount(col("text")),
      Text.langId(col("text")),
      Text.fingerprint(col("text"))).collect().head
    assert(r.getInt(0) == 6)
    assert(r.getInt(1) == 2)  // comma + bang
    assert(r.getInt(2) == 3)  // the, and, the
    assert(r.getString(3) == "en")
    // deterministic across evaluations
    val again = df.select(Text.fingerprint(col("text"))).collect().head
    assert(r.getLong(4) == again.getLong(0))
  }

  test("empty/blank text is safe") {
    val df = Seq("", "   ").toDF("text")
    val rows = df.select(Text.tokenCount(col("text")),
      Text.langId(col("text"))).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(0, 0))
    assert(rows.map(_.getString(1)).toSeq == Seq("und", "und"))
  }

  test("pii redaction, repetition ratio, decontamination basics") {
    val df = Seq(
      (1L, "mail me at jo.doe+x@corp.example.org from 192.168.1.200 now"),
      (2L, "call 1 (415) 555-0123 today"),
      (3L, "clean text with no pii at all")).toDF("doc_id", "text")
    val red = df.select(col("doc_id"),
      Text.redactPii(col("text")).as("r"),
      Text.piiCount(col("text")).as("n")).collect()
      .map(r => r.getLong(0) -> (r.getString(1), r.getInt(2))).toMap
    assert(red(1L)._1 == "mail me at <EMAIL> from <IP> now")
    assert(red(2L)._1 == "call 1 <PHONE> today" ||
      red(2L)._1.contains("<PHONE>"))
    assert(red(3L)._1 == "clean text with no pii at all" && red(3L)._2 == 0)
    assert(red(1L)._2 == 2)

    val dup = Seq((1L, "a a a a"), (2L, "all words are different"),
      (3L, "")).toDF("doc_id", "text")
      .select(col("doc_id"), Text.dupWordRatio(col("text")).as("d"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(dup(1L) == 0.75 && dup(2L) == 0.0 && dup(3L) == 0.0)

    // decontamination: doc 2 shares doc 1's (test) shingles; 4/5 clean
    val kept = graft.llm.Clean.decontaminate(
      docs, docs.filter(col("doc_id") === 1), "doc_id", "text", k = 5)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(4L, 5L)) // 1 self, 2 identical, 3 near-dup
  }

  test("repeated spans: identical docs share every window; unique text none") {
    val long = ("the quick brown fox jumps over the lazy dog " * 4).trim
    val other = ("entirely different sentences about catalyst plans " * 4).trim
    val d = Seq((1L, long), (2L, long), (3L, other))
      .toDF("doc_id", "text")
    val spans = Dedup.repeatedSpans(d, "doc_id", "text",
      spanChars = 32, winnowW = 8)
    val perDoc = spans.groupBy("doc_id")
      .agg(sum(when(col("n_sites") > 1, 1).otherwise(0)).as("rep"),
        count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // docs 1 and 2 are identical: every sampled window repeats
    assert(perDoc(1L)._1 == perDoc(1L)._2)
    assert(perDoc(2L)._1 == perDoc(2L)._2)
    // doc 3's text repeats internally (x4) but shares nothing with 1/2:
    // its cross-doc n_docs stays 1
    val crossDoc = spans.filter(col("doc_id") === 3L && col("n_docs") > 1)
    assert(crossDoc.count() == 0)
  }

  test("multimodal: real PNG decode, resample, luminance feature") {
    // 100x40, left half black, right half white
    val img = new java.awt.image.BufferedImage(100, 40,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    (0 until 40).foreach(y => (0 until 100).foreach(x =>
      img.setRGB(x, y, if (x < 50) 0x000000 else 0xFFFFFF)))
    val baos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", baos)
    val dir = java.nio.file.Files.createTempDirectory("media-real")
    java.nio.file.Files.write(dir.resolve("split.png"), baos.toByteArray)
    val feats = Multimodal.extractFeatures(
      Multimodal.readMedia(spark, s"file://$dir"), featureDim = 4)
      .collect()
    assert(feats.length == 1)
    val f = feats.head
    // REAL dimensions from the decoder, not the stub hash
    assert(f.width == 100 && f.height == 40 && f.nFrames == 1)
    // strips 0-1 over the black half, 2-3 over the white half
    assert(f.feature(0) < 0.1 && f.feature(1) < 0.15)
    assert(f.feature(2) > 0.85 && f.feature(3) > 0.9)
    // bilinear aspect-fit: downscale preserves ratio, never upscales
    val small = Multimodal.resizeImage(img, 50, 50)
    assert(small.getWidth == 50 && small.getHeight == 20)
    assert(Multimodal.resizeImage(img, 512, 512) eq img)
  }

  test("deterministic sampling: rate bounds, repeatability, subset " +
    "and bucket-predicate agreement") {
    import graft.llm.Sampling
    import org.apache.spark.sql.functions._
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
      .select("event_id")
    val n = ev.count()
    assert(Sampling.deterministicSample(ev, col("event_id"), 256)
      .count() == n)
    assert(Sampling.deterministicSample(ev, col("event_id"), 0)
      .count() == 0)
    val s1 = Sampling.deterministicSample(ev, col("event_id"), 32)
      .collect().map(_.getLong(0)).toSet
    val s2 = Sampling.deterministicSample(ev, col("event_id"), 32)
      .collect().map(_.getLong(0)).toSet
    assert(s1 == s2) // repeatable
    // ~32/256 = 12.5% within loose bounds
    assert(s1.size > n / 16 && s1.size < n / 4, s"got ${s1.size} of $n")
    // agrees with the split assignment: sampled rows are exactly the
    // ones whose bucket is < 32
    val buckets = ev.select(col("event_id"),
      Sampling.bucket256(col("event_id")).as("b")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap
    assert(s1 == buckets.filter(_._2 < 32).keySet)
    intercept[IllegalArgumentException] {
      Sampling.deterministicSample(ev, col("event_id"), 257)
    }
  }

  test("mergeable HLL sketches: per-partition sketch tables union to " +
    "the global distinct estimate (the 100 TB pattern)") {
    import org.apache.spark.sql.functions._
    val ev = Tables.t(spark, "/root/testdata/sf0.001", "events")
    // stage 1 (would be a stored sketch table at scale): one Datasketes
    // HLL sketch per partition key — each row is a few KB regardless
    // of cardinality
    val sketches = ev.groupBy(pmod(col("event_id"), lit(8)).as("part"))
      .agg(expr("hll_sketch_agg(user_id)").as("sk"))
    assert(sketches.count() == 8)
    // stage 2: merging sketches answers the GLOBAL distinct without
    // rescanning the raw data
    val est = sketches
      .agg(expr("hll_sketch_estimate(hll_union_agg(sk))").as("est"))
      .head().getLong(0)
    val exact = ev.select("user_id").distinct().count()
    assert(math.abs(est - exact).toDouble / exact < 0.05,
      s"estimate $est vs exact $exact")
  }

  test("multimodal: real WAV decode — silence then tone, RMS strips") {
    // 1 s mono 16-bit PCM at 8 kHz: first half silence, second half a
    // full-scale-ish 440 Hz tone
    val rate = 8000
    val n = rate
    val pcm = new Array[Byte](n * 2)
    (n / 2 until n).foreach { i =>
      val v = (math.sin(2 * math.Pi * 440 * i / rate) * 20000).toInt
      pcm(2 * i) = (v & 0xFF).toByte
      pcm(2 * i + 1) = ((v >> 8) & 0xFF).toByte
    }
    val fmt = new javax.sound.sampled.AudioFormat(rate.toFloat, 16, 1,
      true, false)
    val ais = new javax.sound.sampled.AudioInputStream(
      new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
    val baos = new java.io.ByteArrayOutputStream()
    javax.sound.sampled.AudioSystem.write(ais,
      javax.sound.sampled.AudioFileFormat.Type.WAVE, baos)
    val dir = java.nio.file.Files.createTempDirectory("media-wav")
    java.nio.file.Files.write(dir.resolve("halftone.wav"), baos.toByteArray)
    val feats = Multimodal.extractFeatures(
      Multimodal.readMedia(spark, s"file://$dir"), featureDim = 4)
      .collect()
    assert(feats.length == 1)
    val f = feats.head
    // REAL audio metadata: rate/channels/frames, not the stub hash
    assert(f.width == rate && f.height == 1 && f.nFrames == n)
    // RMS strips: silent half ~0, tone half ~20000/32768/sqrt(2)~0.43
    assert(f.feature(0) < 0.01 && f.feature(1) < 0.01)
    assert(f.feature(2) > 0.3 && f.feature(3) > 0.3)
    // corrupt WAV bytes degrade to the stub, never crash
    assert(Multimodal.decodeWav("RIFFgarbage".getBytes).isEmpty)
  }

  test("multimodal: plugged codec decoder — decode + quarantine routing") {
    // a fake mp3 codec through the production seam: bytes "FAKEmp3:"
    // followed by 8-bit samples decode; anything else is rejected
    object FakeMp3Decoder extends Multimodal.MediaDecoder {
      private val magic = "FAKEmp3:".getBytes
      def claims(mediaType: String): Boolean = mediaType == "audio/mpeg"
      def decode(mediaType: String, bytes: Array[Byte])
      : Option[(Int, Int, Int, Array[Double])] =
        if (bytes.length > magic.length &&
            bytes.take(magic.length).sameElements(magic)) {
          val samples = bytes.drop(magic.length)
            .map(b => (b & 0xFF).toDouble / 255.0)
          Some((44100, 1, samples.length, samples))
        } else None
    }
    val dir = java.nio.file.Files.createTempDirectory("media-seam")
    java.nio.file.Files.write(dir.resolve("good.mp3"),
      "FAKEmp3:".getBytes ++ Array.tabulate(64)(i => (i * 4).toByte))
    java.nio.file.Files.write(dir.resolve("corrupt.mp3"),
      "ID3garbage-not-our-format".getBytes)
    java.nio.file.Files.write(dir.resolve("clip.mp4"),
      Array.tabulate(128)(i => (i * 3).toByte))
    val media = Multimodal.readMedia(spark, s"file://$dir")
    val rows = Multimodal.extractFeatures(media, featureDim = 4,
      decoder = Some(FakeMp3Decoder)).collect()
      .map(f => f.path.split('/').last -> f).toMap
    // claimed + decodable: REAL decode through the seam (rate/
    // channels/frames from the codec, RMS feature over its samples)
    val good = rows("good.mp3")
    assert(good.status == "decoded")
    assert(good.width == 44100 && good.height == 1 && good.nFrames == 64)
    assert(good.feature.length == 4 && good.feature.forall(_ > 0.0))
    // claimed + rejected: quarantined, never fake data — the feature
    // is a featureDim-length NaN sentinel (rectangular batches, and
    // NaN poisons any aggregate it leaks into)
    val bad = rows("corrupt.mp3")
    assert(bad.status == "quarantined")
    assert(bad.feature.length == 4 && bad.feature.forall(_.isNaN))
    assert(bad.nFrames == 0)
    // unclaimed type: still the labeled deterministic stub
    assert(rows("clip.mp4").status == "stubbed")
    // without a registered decoder both mp3s fall to the stub
    val unplugged = Multimodal.extractFeatures(media, featureDim = 4)
      .collect()
    assert(unplugged.count(_.status == "stubbed") == 3)
  }

  test("multimodal plumbing: binaryFile read -> features -> frame sampling") {
    val dir = java.nio.file.Files.createTempDirectory("media")
    java.nio.file.Files.write(dir.resolve("a.jpg"),
      Array.tabulate(256)(_.toByte))
    java.nio.file.Files.write(dir.resolve("b.mp4"),
      Array.tabulate(512)(i => (i * 7).toByte))
    val media = Multimodal.readMedia(spark, s"file://$dir")
    val feats = Multimodal.extractFeatures(media, featureDim = 4)
    val rows = feats.collect().sortBy(_.path)
    assert(rows.length == 2)
    assert(rows.head.mediaType == "image/jpeg" && rows.head.nFrames == 1)
    assert(rows.last.mediaType == "video/mp4" && rows.last.nFrames >= 1)
    assert(rows.forall(_.feature.length == 4))
    // deterministic stub: same input -> same features
    val again = Multimodal.extractFeatures(media, featureDim = 4)
      .collect().sortBy(_.path)
    assert(rows.map(_.feature.toSeq) sameElements again.map(_.feature.toSeq))
    // frame sampling is video-only (audio nFrames = PCM sample count
    // would explode; images have one frame by definition)
    val frames = Multimodal.sampleFrames(feats, everyN = 30)
    assert(frames.count() >= 1)
    assert(frames.select("mediaType").collect()
      .forall(_.getString(0).startsWith("video/")))
    // resize planning: aspect-preserving fit, no upscaling
    val plan = Multimodal.resizePlan(feats, maxW = 16, maxH = 16)
      .select("width", "height", "target_w", "target_h", "scale").collect()
    plan.foreach { r =>
      val (w, h, tw, th, s) = (r.getInt(0), r.getInt(1), r.getInt(2),
        r.getInt(3), r.getDouble(4))
      assert(tw <= 16 && th <= 16 && s <= 1.0)
      // aspect ratio preserved within rounding
      assert(math.abs(tw.toDouble / th - w.toDouble / h) <
        math.max(1.0 / th, 1.0 / tw) * 2 + 1e-9)
    }
  }
  test("spread width estimate: narrow inputs widen, broadcast build " +
    "sides and pre-shuffled inputs don't trigger a reshuffle") {
    import org.apache.spark.sql.functions.broadcast
    val par = spark.sparkContext.defaultParallelism
    val base = spark.range(1000).toDF("id")
    // coalesce(1): must widen (the expensive-projection guard)
    val narrow = base.coalesce(1)
    val widened = Dedup.spread(narrow, col("id"))
    assert(widened.rdd.getNumPartitions === par)
    // already repartitioned to session width: untouched (eq)
    val wide = base.repartition(par, col("id"))
    assert(Dedup.spread(wide, col("id")) eq wide)
    // broadcast join with a coalesced(1) DIM: the build side must not
    // fool the estimate into reshuffling the wide streamed side
    val dim = spark.range(10).toDF("id").coalesce(1)
    val joined = wide.join(broadcast(dim), "id")
    assert(Dedup.spread(joined, col("id")) eq joined)
    // plans with a clustered-distribution shuffle ahead: untouched
    val agged = base.groupBy("id").count()
    assert(Dedup.spread(agged, col("id")) eq agged)
  }

  test("keepBestPerCluster: longest wins, id breaks ties, singletons stay") {
    import spark.implicits._
    val docs = Seq(
      // cluster 1: lengths 5, 9, 9 -> longest 9, tie between 11/12 -> 11
      (10L, 1L, "abcde"),
      (11L, 1L, "abcdefghi"),
      (12L, 1L, "zyxwvutsr"),
      // singleton cluster keeps itself
      (20L, 2L, "xx"),
      // cluster 3: clone-style exact tie -> lower id
      (30L, 3L, "same text"),
      (31L, 3L, "same text")).toDF("doc_id", "cluster_id", "text")
    val kept = graft.llm.Dedup.keepBestPerCluster(docs, "doc_id",
      "cluster_id", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long") * -1)
      .select("doc_id").collect().map(_.getLong(0)).sorted.toSeq
    assert(kept === Seq(11L, 20L, 30L))
    // a NULL priority must LOSE to every real value, not win the
    // cluster via nulls-first struct ordering
    val withNull = Seq(
      (40L, 4L, Some("real text")),
      (41L, 4L, None: Option[String])).toDF("doc_id", "cluster_id", "text")
    val kept2 = graft.llm.Dedup.keepBestPerCluster(withNull, "doc_id",
      "cluster_id", org.apache.spark.sql.functions.length(
        org.apache.spark.sql.functions.col("text")).cast("long") * -1)
      .select("doc_id").collect().map(_.getLong(0)).toSeq
    assert(kept2 === Seq(40L))
  }

  test("a NaN-element corpus vector is never anyone's neighbor " +
    "(NaN sim would rank FIRST under Double.compare without the guard)") {
    import spark.implicits._
    val corpus = Seq(
      (1L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
      (2L, Seq(0.9f, 0.1f, 0.0f, 0.0f)), // true top-1 of query 1
      (99L, Seq(Float.NaN, 0.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val q = corpus.filter(col("vec_id") === 1L)
    val bf = Similarity.bruteForceTopK(corpus, q, k = 2)
      .select("query_id", "nn_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    assert(bf == Seq((1L, 2L)), s"NaN vector leaked into top-k: $bf")
    // and the pairwise near-dup path rejects NaN sims the same way
    val nd = Similarity.embeddingNearDups(corpus, threshold = 0.5,
      dim = 4, nBits = 2).select("id_a", "id_b").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(!nd.exists(p => p._1 == 99L || p._2 == 99L),
      s"NaN vector paired in embeddingNearDups: $nd")
  }
}
