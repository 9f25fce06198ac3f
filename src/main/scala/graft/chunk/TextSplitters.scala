package graft.chunk

import graft.embed.HashingEmbedder

/** Ports of the reference's non-markdown chunkers (SURVEY.md §2.2
  * C2-C4; reference core/file_management/chunker/spliter.py). All pure
  * `String => Seq[String]` functions for use inside narrow flatMaps.
  */
object TextSplitters {

  // --- C2: token-window splitter (spliter.py:139-204) -------------------

  /** Lossless BPE-ish regex tokenizer (the zero-egress stand-in for
    * tiktoken gpt2): ` ?letters | ?digits | ?punct-run | whitespace`,
    * chosen so the concatenation of tokens reproduces the text exactly
    * (decode = mkString). */
  private val bpeIsh =
    """ ?[\p{L}]+| ?[\p{N}]+| ?[^\s\p{L}\p{N}]+|\s+""".r

  def encode(text: String): Vector[String] =
    bpeIsh.findAllIn(text).toVector

  /** split_text_on_tokens: sliding windows of `tokensPerChunk` with
    * `chunkOverlap` stride overlap; the window arithmetic mirrors the
    * reference exactly (incl. the trailing-window break condition). */
  def splitTextOnTokens(text: String, tokensPerChunk: Int = 4000,
      chunkOverlap: Int = 200): Vector[String] = {
    require(tokensPerChunk > chunkOverlap, "overlap must be < chunk size")
    val ids = encode(text)
    val out = Vector.newBuilder[String]
    var start = 0
    var cur = math.min(start + tokensPerChunk, ids.length)
    var done = false
    while (start < ids.length && !done) {
      out += ids.slice(start, cur).mkString
      if (cur == ids.length) done = true
      else {
        start += tokensPerChunk - chunkOverlap
        cur = math.min(start + tokensPerChunk, ids.length)
      }
    }
    out.result()
  }

  // --- C3: recursive character splitter (spliter.py:207-293) ------------

  /** RecursiveCharacterTextSplitter.split_text with literal separators
    * (the reference default path: `text.split(sep)` — note it DROPS the
    * separator between parts, a reference quirk kept for fidelity),
    * greedy re-packing up to chunkSize, and forced fixed-length overlap
    * chunks at the leaf. */
  def recursiveSplit(text: String, chunkSize: Int = 200,
      chunkOverlap: Int = 0,
      separators: List[String] = List("\n\n", "\n", "#")): Vector[String] = {
    require(chunkSize > 0 && chunkOverlap >= 0 && chunkOverlap <= chunkSize)

    def chunkText(t: String): Vector[String] = {
      val out = Vector.newBuilder[String]
      var start = 0
      while (start < t.length) {
        val end = math.min(start + chunkSize, t.length)
        out += t.substring(start, end)
        val next = end - chunkOverlap
        start = if (next > start) next else end // overlap=size guard
      }
      out.result()
    }

    def rec(t: String, seps: List[String]): Vector[String] = {
      if (t.length <= chunkSize) return Vector(t)
      seps match {
        case Nil => chunkText(t)
        case sep :: rest =>
          // java split with -1 keeps trailing empties like Python's
          val parts = t.split(java.util.regex.Pattern.quote(sep), -1)
          if (parts.length == 1) rec(t, rest)
          else {
            val chunks = Vector.newBuilder[String]
            var current = ""
            parts.foreach { p =>
              if (p.nonEmpty) {
                if (current.length + p.length > chunkSize && current.nonEmpty) {
                  chunks ++= rec(current, rest)
                  current = p
                } else current += p
              }
            }
            if (current.nonEmpty) chunks ++= rec(current, rest)
            chunks.result()
          }
      }
    }
    rec(text, separators)
  }

  // --- C4: semantic chunker (spliter.py:296-526) -------------------------

  sealed trait Breakpoint
  case object Percentile extends Breakpoint
  case object StandardDeviation extends Breakpoint
  case object Interquartile extends Breakpoint
  case object Gradient extends Breakpoint

  private def defaultAmount(b: Breakpoint): Double = b match {
    case Percentile => 95; case StandardDeviation => 3
    case Interquartile => 1.5; case Gradient => 95
  }

  /** numpy.percentile with linear interpolation. */
  def percentile(xs: Seq[Double], p: Double): Double = {
    val a = xs.sorted.toIndexedSeq
    if (a.isEmpty) return Double.NaN
    val rank = p / 100.0 * (a.length - 1)
    val lo = math.floor(rank).toInt
    val hi = math.min(lo + 1, a.length - 1)
    a(lo) + (rank - lo) * (a(hi) - a(lo))
  }

  /** numpy.gradient with unit spacing: central differences, one-sided
    * at the edges. */
  def gradient(xs: IndexedSeq[Double]): IndexedSeq[Double] = {
    val n = xs.length
    if (n == 1) return IndexedSeq(0.0)
    IndexedSeq.tabulate(n) { i =>
      if (i == 0) xs(1) - xs(0)
      else if (i == n - 1) xs(n - 1) - xs(n - 2)
      else (xs(i + 1) - xs(i - 1)) / 2.0
    }
  }

  /** `_threshold_from_clusters` (spliter.py:434-452): map a target
    * chunk count to a percentile by linear interpolation over the
    * distance count — x1=len(distances) chunks ↔ percentile 0 (every
    * gap a breakpoint), x2=1 chunk ↔ percentile 100 (no breakpoints) —
    * clamped to [0, 100], then take that percentile of the distances. */
  def thresholdFromClusters(distances: Seq[Double],
      numberOfChunks: Int): Double = {
    val x1 = distances.length.toDouble
    val x2 = 1.0
    val x = math.max(math.min(numberOfChunks.toDouble, x1), x2)
    val y = if (x2 == x1) 100.0 else 0.0 + (100.0 - 0.0) / (x2 - x1) * (x - x1)
    percentile(distances, math.min(math.max(y, 0.0), 100.0))
  }

  /** SemanticChunker.split_text: sentence regex split, ±buffer combine,
    * embed (hashing embedder — the deterministic stand-in), cosine
    * distance between neighbors, breakpoint threshold by method (or by
    * the `numberOfChunks` target-count interpolation when set, which
    * takes precedence exactly as the reference's
    * `if self.number_of_chunks is not None` branch does,
    * spliter.py:488-490), group sentences between breakpoints.
    * Per-document local computation — runs inside a flatMap, never as
    * a distributed aggregate (SURVEY.md §2.2 C4). */
  def semanticSplit(text: String,
      bufferSize: Int = 1,
      method: Breakpoint = Percentile,
      amount: Option[Double] = None,
      minChunkSize: Option[Int] = None,
      numberOfChunks: Option[Int] = None): Vector[String] = {
    val thresholdAmount = amount.getOrElse(defaultAmount(method))
    val sentences = text.split("(?<=[.?!])\\s+", -1).toVector
    if (sentences.length == 1) return sentences
    if (method == Gradient && sentences.length == 2) return sentences

    val combined = sentences.indices.map { i =>
      val before = (math.max(0, i - bufferSize) until i).map(sentences) // prior
      val after = ((i + 1) to math.min(sentences.length - 1, i + bufferSize))
        .map(sentences)
      (before.map(_ + " ").mkString + sentences(i) +
        after.map(" " + _).mkString)
    }
    val embs = combined.map(s => HashingEmbedder.embed(s.toLowerCase))
    val distances = (0 until sentences.length - 1).map { i =>
      1.0 - HashingEmbedder.cosine(embs(i), embs(i + 1))
    }

    val (threshold, breakArray) = numberOfChunks match {
      case Some(n) => (thresholdFromClusters(distances, n), distances)
      case None => method match {
      case Percentile => (percentile(distances, thresholdAmount), distances)
      case StandardDeviation =>
        val mean = distances.sum / distances.length
        val std = math.sqrt(
          distances.map(d => (d - mean) * (d - mean)).sum / distances.length)
        (mean + thresholdAmount * std, distances)
      case Interquartile =>
        val iqr = percentile(distances, 75) - percentile(distances, 25)
        (distances.sum / distances.length + thresholdAmount * iqr, distances)
      case Gradient =>
        val g = gradient(distances)
        (percentile(g, thresholdAmount), g)
      }
    }

    val breakIdx = breakArray.zipWithIndex.collect {
      case (x, i) if x > threshold => i
    }
    val chunks = Vector.newBuilder[String]
    var start = 0
    breakIdx.foreach { idx =>
      val combinedText = sentences.slice(start, idx + 1).mkString(" ")
      if (!minChunkSize.exists(combinedText.length < _)) {
        chunks += combinedText
        start = idx + 1
      } else {
        // reference `continue`: skip the breakpoint, keep accumulating
      }
    }
    if (start < sentences.length)
      chunks += sentences.slice(start, sentences.length).mkString(" ")
    chunks.result()
  }
}
