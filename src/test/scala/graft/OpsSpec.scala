package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.functions.TextExprImpl
import graft.ops.{Multimodal, TrainingOps => T}

class OpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestSession.spark
  import spark.implicits._

  private def naiveSimhash(tokens: Seq[String]): Long = {
    val counts = new Array[Int](64)
    tokens.foreach { t =>
      val h = TextExprImpl.hash64(org.apache.spark.unsafe.types.UTF8String.fromString(t))
      (0 until 64).foreach { b =>
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1 }
    }
    (0 until 64).foldLeft(0L)((acc, b) => if (counts(b) > 0) acc | (1L << b) else acc)
  }

  test("simhash expression == naive reference; near-dup property") {
    val docs = Seq(
      (0L, "the quick brown fox jumps over the lazy dog"),
      (1L, "the quick brown fox jumps over the lazy cat"), // near dup
      (2L, "completely different content about spark engines")).toDF("doc_id", "text")
    val got = T.simhashes(docs).as[(Long, Long)].collect().toMap
    docs.collect().foreach { r =>
      val toks = r.getString(1).split(" ").filter(_.nonEmpty)
      assert(got(r.getLong(0)) == naiveSimhash(toks.toSeq))
    }
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(got(0L), got(1L)) < hamming(got(0L), got(2L)))
  }

  test("simhash pairs finds the near-dup via quarter buckets") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappz"),
      (2L, "one two three four five six seven eight nine ten")).toDF("doc_id", "text")
    val pairs = T.simhashPairs(docs, maxHamming = 16).as[(Long, Long, Int)].collect()
    assert(pairs.exists(p => p._1 == 0L && p._2 == 1L))
  }

  test("winnow fingerprints: shared k-grams overlap for near dups") {
    val a = "the quick brown fox jumps over the lazy dog in the morning sun"
    val b = "the quick brown fox jumps over the lazy cat in the morning sun"
    val c = "entirely unrelated text with no shared substrings whatsoever here"
    def fps(s: String) = {
      val arr = TextExprImpl.winnow(
        org.apache.spark.unsafe.types.UTF8String.fromString(s), 8, 4)
      (0 until arr.numElements()).map(arr.getLong).toSet
    }
    val (fa, fb, fc) = (fps(a), fps(b), fps(c))
    assert((fa & fb).size > (fa & fc).size)
    assert(fps(a) == fps(a)) // deterministic
    assert(fps("short") .isEmpty == false || "short".length < 8) // < k → empty
  }

  test("jaccard pairs over hand corpus") {
    val docs = Seq(
      (0L, "a b c d e f g h"),
      (1L, "a b c d e f g x"),  // shares 5 of 6/6 trigrams? high jaccard
      (2L, "p q r s t u v w")).toDF("doc_id", "text")
    val pairs = T.jaccardPairs(docs, 0.5).as[(Long, Long, Double)].collect()
    assert(pairs.map(p => (p._1, p._2)).toSet == Set((0L, 1L)))
    // trigrams of 8 tokens = 6; shared = 5 ("a b c".."e f g"); jaccard 5/7
    assert(math.abs(pairs.head._3 - math.rint(5.0 / 7.0 * 10000) / 10000) < 1e-12)
  }

  test("minhash LSH finds exact dup and skips unrelated") {
    val docs = Seq(
      (0L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"),
      (1L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"), // exact dup → identical sig
      (2L, "z1 z2 z3 z4 z5 z6 z7 z8 z9 z10")).toDF("doc_id", "text")
    val pairs = T.minhashLshPairs(docs).as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 1L)))
    assert(!pairs.contains((0L, 2L)) && !pairs.contains((1L, 2L)))
  }

  test("IVF ANN achieves high recall vs brute force on the embeddings table") {
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    val queries = Seq(0L, 1L, 2L)
    val bf = T.bruteForceCosineTopK(emb, queries, 10)
      .select("query_id", "rnk", "neighbor").as[(Long, Long, Long)].collect().toSet
    // probing every cell must reproduce the exact baseline
    val ivfAll = T.ivfCosineTopK(emb, queries, 10, nprobe = 10)
      .select("query_id", "rnk", "neighbor").as[(Long, Long, Long)].collect().toSet
    assert(ivfAll == bf)
    // probing 3 of 10 cells trades recall for 70% less scan — sanity bound
    val ivf3 = T.ivfCosineTopK(emb, queries, 10, nprobe = 3)
      .select("query_id", "neighbor").as[(Long, Long)].collect().toSet
    val recall = (bf.map(t => (t._1, t._3)) & ivf3).size.toDouble / bf.size
    assert(recall >= 0.2, s"IVF nprobe=3 recall $recall implausibly low")
  }

  test("multimodal: decode stub plumbing — schema, determinism, frame explode") {
    val media = Seq(
      ("u1", "payload-one".getBytes("UTF-8")),
      ("u2", "payload-two-longer".getBytes("UTF-8"))).toDF("url", "html")
    val meta = Multimodal.extractFeatures(media)
    val rows = meta.collect().sortBy(_.url)
    assert(rows.map(_.url).toSeq == Seq("u1", "u2"))
    assert(rows.forall(r => r.feature.length == 8 && r.width > 0 && r.n_frames >= 1))
    // deterministic across runs
    val again = Multimodal.extractFeatures(media).collect().sortBy(_.url)
    assert(rows.zip(again).forall { case (a, b) =>
      a.content_hash == b.content_hash && a.width == b.width })
    val frames = Multimodal.sampleFrames(meta)
    assert(frames.count() == rows.map(_.n_frames.toLong).sum)
    assert(frames.columns.toSet ==
      Set("url", "width", "height", "frame_no", "frame_hash"))
  }

  test("bloom: no false negatives, plausible fpp, merge") {
    val b = new graft.functions.Bloom(1024, 5)
    val items = (0L until 10000L by 7L).map(i => i * 0x9e3779b97f4a7c15L)
    items.foreach(b.put)
    assert(items.forall(b.mightContain))
    val b2 = graft.functions.Bloom.deserialize(b.serialize())
    assert(items.forall(b2.mightContain))
    val c = new graft.functions.Bloom(1024, 5)
    c.put(42L)
    c.mergeInPlace(b)
    assert(c.mightContain(42L) && items.forall(c.mightContain))
  }
}
