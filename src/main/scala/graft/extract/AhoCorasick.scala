package graft.extract

import scala.collection.mutable

/** Classic Aho-Corasick multi-pattern matcher. Built once per executor
  * partition over the broadcast evidence dictionary (SURVEY.md §2.3 E3:
  * gazetteer NER as mapPartitions with a per-partition automaton), then
  * each chunk is scanned in O(len + hits) regardless of dictionary size
  * — the property that keeps mention detection linear at 10^12-document
  * scale where per-pattern `contains` would be O(len * patterns).
  */
final class AhoCorasick private (
    goto: Array[mutable.LongMap[Int]],
    fail: Array[Int],
    out: Array[List[Int]]) extends Serializable {

  /** Distinct pattern ids found anywhere in `text`. */
  def matchedIds(text: String): collection.Set[Int] = {
    val hits = mutable.Set.empty[Int]
    var state = 0
    var i = 0
    while (i < text.length) {
      val c = text.charAt(i).toLong
      // single probe per (state, char): getOrElse(-1) folds the old
      // contains+getOrElse double LongMap lookup into one
      var s = state
      var nxt = goto(s).getOrElse(c, -1)
      while (s != 0 && nxt < 0) {
        s = fail(s)
        nxt = goto(s).getOrElse(c, -1)
      }
      state = if (nxt >= 0) nxt else 0
      if (out(state).nonEmpty) hits ++= out(state)
      i += 1
    }
    hits
  }
}

object AhoCorasick {
  /** Build from patterns; pattern index = id. Empty patterns ignored. */
  def apply(patterns: IndexedSeq[String]): AhoCorasick = {
    val goto = mutable.ArrayBuffer(mutable.LongMap.empty[Int])
    val outB = mutable.ArrayBuffer(List.empty[Int])

    patterns.zipWithIndex.foreach { case (p, id) =>
      if (p.nonEmpty) {
        var state = 0
        var i = 0
        while (i < p.length) {
          val c = p.charAt(i).toLong
          state = goto(state).getOrElse(c, {
            goto += mutable.LongMap.empty[Int]
            outB += Nil
            val ns = goto.length - 1
            goto(state)(c) = ns
            ns
          })
          i += 1
        }
        outB(state) ::= id
      }
    }

    val n = goto.length
    val fail = new Array[Int](n)
    val queue = mutable.Queue.empty[Int]
    goto(0).foreach { case (_, s) => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val r = queue.dequeue()
      goto(r).foreach { case (c, s) =>
        queue += s
        var st = fail(r)
        while (st != 0 && !goto(st).contains(c)) st = fail(st)
        fail(s) = if (s != goto(st).getOrElse(c, 0)) goto(st).getOrElse(c, 0) else 0
        outB(s) = outB(s) ++ outB(fail(s))
      }
    }
    new AhoCorasick(goto.map(m => m).toArray, fail, outB.toArray)
  }
}
