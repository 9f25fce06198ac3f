package graft.embed

/** Deterministic hashing-trick character-n-gram embedder — the
  * zero-egress stand-in for the reference's model embeddings
  * (SURVEY.md §7.1 step 5; reference embeds entity text
  * `"{name}: {' '.join(descriptions)}"`, Base_Neo4j.py:298, into
  * 768-dim vectors, event_graphrag_neo4j.py:289-290; we use dim 64 to
  * match the sandbox embeddings table).
  *
  * Properties the pipeline relies on:
  *  - deterministic (seed folded into the hash; no RNG state);
  *  - similar strings (shared n-grams) => high cosine — so alias
  *    variants of an entity name land above the 0.95 merge threshold
  *    while unrelated names land far below;
  *  - L2-normalized, so dot == cosine.
  *
  * Pure function; used inside mapPartitions batches (reference batch
  * size 100, Base_Neo4j.py:203 — here batching is a no-op since the
  * function is local, but the call shape stays per-partition).
  */
object HashingEmbedder {
  val Dim = 64
  private val Seed = 0x9e3779b97f4a7c15L

  /** splitmix64 finalizer — the deterministic hash backbone. */
  def mix64(z0: Long): Long = {
    var z = z0 + Seed
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  def hashString(s: String, salt: Long): Long = {
    var h = mix64(salt)
    var i = 0
    while (i < s.length) {
      h = mix64(h ^ s.charAt(i).toLong)
      i += 1
    }
    h
  }

  /** Embed text via char 2- and 3-gram hashing with signed buckets. */
  def embed(text: String): Array[Float] = {
    val v = new Array[Float](Dim)
    val t = text.toLowerCase
    var n = 2
    while (n <= 3) {
      var i = 0
      val max = t.length - n
      while (i <= max) {
        // inline n-gram hash without substring allocation
        var h = mix64(n.toLong)
        var j = 0
        while (j < n) { h = mix64(h ^ t.charAt(i + j).toLong); j += 1 }
        val bucket = ((h % Dim) + Dim).toInt % Dim
        val sign = if (((h >>> 17) & 1L) == 0L) 1.0f else -1.0f
        v(bucket) += sign
        i += 1
      }
      n += 1
    }
    // L2 normalize; zero vector stays zero
    var ss = 0.0
    var k = 0
    while (k < Dim) { ss += v(k).toDouble * v(k); k += 1 }
    if (ss > 0) {
      val inv = (1.0 / math.sqrt(ss)).toFloat
      k = 0
      while (k < Dim) { v(k) *= inv; k += 1 }
    }
    v
  }

  def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    val n = math.min(a.length, b.length)
    while (i < n) {
      dot += a(i).toDouble * b(i)
      na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i)
      i += 1
    }
    if (na == 0 || nb == 0) 0.0 else dot / math.sqrt(na * nb)
  }
}
