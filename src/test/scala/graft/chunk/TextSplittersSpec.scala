package graft.chunk

import org.scalatest.funsuite.AnyFunSuite

class TextSplittersSpec extends AnyFunSuite {
  import TextSplitters._

  /** Seeded property loop (no scalacheck-scalatest bridge in the
    * offline cache): 200 random mixed-alphabet strings. */
  private def forAllTexts(f: String => Unit): Unit = {
    val rnd = new scala.util.Random(42)
    val alphabet = "abcXYZ019   \n\n..?!##,质量检验"
    for (_ <- 1 to 200) {
      val len = rnd.nextInt(120)
      f(Vector.fill(len)(alphabet(rnd.nextInt(alphabet.length))).mkString)
    }
  }

  test("tokenizer is lossless: concat(encode(t)) == t") {
    forAllTexts { t => assert(encode(t).mkString == t) }
  }

  test("token windows: full coverage with exact overlap") {
    val text = (1 to 50).map(i => s"tok$i").mkString(" ")
    val ids = encode(text)
    val chunks = splitTextOnTokens(text, tokensPerChunk = 16, chunkOverlap = 4)
    // stride 12: windows [0,16) [12,28) [24,40) ...
    assert(chunks.head == ids.take(16).mkString)
    assert(chunks(1) == ids.slice(12, 28).mkString)
    // EVERY window reconstructed exactly — chunk i must be the ids at
    // [12*i, 12*i+16): an upper bound on chunks.length alone would let
    // a regression silently drop the final partial window (tail loss).
    // Emitted starts: s_0 = 0, then s_i iff the previous window did not
    // reach n (s_{i-1} + 16 < n <=> s_i < n - 4); the finishing window
    // ends at n, so per-window equality implies full tail coverage.
    val n = ids.length
    val starts = Iterator.iterate(0)(_ + 12)
      .takeWhile(s => s == 0 || s < n - 4).toVector
    assert(chunks.length == starts.length, s"${chunks.length} vs $starts")
    starts.zipWithIndex.foreach { case (s, i) =>
      assert(chunks(i) == ids.slice(s, s + 16).mkString, s"window $i")
    }
    assert(starts.last + 16 >= n, "last window does not reach the tail")
  }

  test("token windows: short text is one chunk; empty is none") {
    assert(splitTextOnTokens("short text", 100, 10) == Vector("short text"))
    assert(splitTextOnTokens("", 100, 10).isEmpty)
  }

  test("recursive split: every chunk fits chunkSize") {
    forAllTexts { t =>
      val chunks = recursiveSplit(t, chunkSize = 20, chunkOverlap = 0)
      chunks.foreach(c => assert(c.length <= 20))
    }
  }

  test("recursive split: non-separator characters preserved in order") {
    forAllTexts { t =>
      val chunks = recursiveSplit(t, chunkSize = 20, chunkOverlap = 0)
      def strip(s: String) = s.replace("\n", "").replace("#", "")
      assert(strip(chunks.mkString) == strip(t))
    }
  }

  test("recursive split: greedy packing splits on the coarsest separator first") {
    val text = "aaaa\n\nbbbb\n\ncccc"
    assert(recursiveSplit(text, chunkSize = 9) == Vector("aaaabbbb", "cccc"))
    // small size forces descent to the leaf fixed-length chunker
    val leaf = recursiveSplit("abcdefghij", chunkSize = 4, chunkOverlap = 1)
    assert(leaf == Vector("abcd", "defg", "ghij", "j"))
  }

  test("percentile matches numpy linear interpolation") {
    assert(percentile(Seq(1, 2, 3, 4), 50) == 2.5)
    assert(math.abs(percentile(Seq(1, 2, 3, 4), 95) - 3.85) < 1e-9)
    assert(percentile(Seq(7), 95) == 7.0)
  }

  test("gradient matches numpy central differences") {
    assert(gradient(IndexedSeq(1.0, 2.0, 4.0, 7.0)) ==
      IndexedSeq(1.0, 1.5, 2.5, 3.0))
  }

  test("semantic split: single sentence passes through, grouping covers all sentences") {
    assert(semanticSplit("no breaks here") == Vector("no breaks here"))
    val text = (1 to 12).map { i =>
      if (i <= 6) s"quality report item $i." else s"totally different topic $i."
    }.mkString(" ")
    val chunks = semanticSplit(text, method = Percentile, amount = Some(80))
    assert(chunks.nonEmpty)
    val sentences = text.split("(?<=[.?!])\\s+", -1).toVector
    assert(chunks.flatMap(_.split("(?<=[.?!])\\s+", -1)) == sentences)
    // deterministic
    assert(semanticSplit(text, method = Percentile, amount = Some(80)) == chunks)
  }

  test("semantic split: all four breakpoint methods run and cover the text") {
    val text = (1 to 10).map(i => s"sentence number $i goes here.").mkString(" ")
    for (m <- Seq(Percentile, StandardDeviation, Interquartile, Gradient)) {
      val chunks = semanticSplit(text, method = m)
      assert(chunks.nonEmpty, m.toString)
      assert(chunks.mkString(" ").length >= text.length - 5, m.toString)
    }
  }

  test("thresholdFromClusters matches the reference interpolation") {
    // x1 = len(distances) -> percentile 0 (the minimum); x2 = 1 ->
    // percentile 100 (the maximum); midpoints interpolate linearly
    // (spliter.py:434-452)
    val d = Seq(0.1, 0.2, 0.3, 0.4, 0.5)
    assert(thresholdFromClusters(d, 5) == percentile(d, 0))
    assert(thresholdFromClusters(d, 1) == percentile(d, 100))
    // n=3: x=3, y = 0 + (100-0)/(1-5) * (3-5) = 50
    assert(thresholdFromClusters(d, 3) == percentile(d, 50))
    // out-of-range targets clamp to [1, len]
    assert(thresholdFromClusters(d, 99) == percentile(d, 0))
    assert(thresholdFromClusters(d, 0) == percentile(d, 100))
    assert(thresholdFromClusters(d, -7) == percentile(d, 100))
    // single distance: x1 == x2 -> y = 100 (the reference's x2==x1 arm)
    assert(thresholdFromClusters(Seq(0.4), 1) == 0.4)
  }

  test("semantic split with numberOfChunks: count-targeted, covers the text") {
    val text = (1 to 12).map { i =>
      if (i <= 4) s"quality report item $i."
      else if (i <= 8) s"totally different topic $i."
      else s"yet another unrelated subject $i."
    }.mkString(" ")
    val sentences = text.split("(?<=[.?!])\\s+", -1).toVector
    // targeting 1 chunk picks the max-distance threshold: strictly-
    // greater comparison means NO breakpoint fires -> one chunk
    assert(semanticSplit(text, numberOfChunks = Some(1)) ==
      Vector(sentences.mkString(" ")))
    // targeting len(distances) chunks uses percentile 0 (the minimum):
    // every strictly-above-min gap breaks
    val many = semanticSplit(text, numberOfChunks = Some(sentences.length - 1))
    assert(many.length > 1)
    // the interpolation monotone: a larger target never yields fewer
    // chunks, and every variant covers all sentences in order
    val counts = Seq(1, 3, 6, 11).map { n =>
      val c = semanticSplit(text, numberOfChunks = Some(n))
      assert(c.flatMap(_.split("(?<=[.?!])\\s+", -1)) == sentences, s"n=$n")
      c.length
    }
    assert(counts == counts.sorted, s"chunk counts not monotone: $counts")
    // numberOfChunks takes precedence over method/amount (the
    // reference's `if number_of_chunks is not None` branch)
    assert(semanticSplit(text, method = Gradient, amount = Some(5),
      numberOfChunks = Some(1)) == Vector(sentences.mkString(" ")))
  }
}
