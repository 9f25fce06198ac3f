package graft.canon

import graft.SparkSpec
import scala.util.Random

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  /** Local union-find oracle. */
  private def oracle(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = edges.flatMap(e => Seq(e._1, e._2)).distinct
    // min-id per component
    val byRoot = ids.groupBy(find)
    byRoot.flatMap { case (_, members) =>
      val m = members.min
      members.map(_ -> m)
    }
  }

  /** Both the driver union-find fast path and the distributed
    * large-star/small-star fixpoint (localSolveMax = 0) must match. */
  private def check(edges: Seq[(Long, Long)]): Unit = {
    val df = edges.toDF("src", "dst")
    val local = ConnectedComponents.run(df).as[(Long, Long)].collect().toMap
    val dist = ConnectedComponents.run(df, localSolveMax = 0)
      .as[(Long, Long)].collect().toMap
    assert(local == oracle(edges))
    assert(dist == oracle(edges))
  }

  test("chain graph collapses to one component rooted at min") {
    check((1L to 20L).sliding(2).map(s => (s(0), s(1))).toSeq)
  }

  test("star graph (hot-entity skew shape)") {
    check((2L to 500L).map(i => (1L, i)))
  }

  test("inverted star (hub has the max id)") {
    check((1L to 499L).map(i => (500L, i)))
  }

  test("two components and a self-loop") {
    check(Seq((1L, 2L), (2L, 3L), (10L, 11L), (5L, 5L), (11L, 12L)))
  }

  test("random graphs match union-find oracle") {
    val rnd = new Random(42)
    for (_ <- 1 to 3) {
      val n = 200
      val edges = (1 to 300).map(_ => (rnd.nextInt(n).toLong, rnd.nextInt(n).toLong))
        .filter(e => e._1 != e._2)
      check(edges)
    }
  }

  test("edge-order permutation invariance") {
    val rnd = new Random(7)
    val edges = (1 to 100).map(_ => (rnd.nextInt(50).toLong, rnd.nextInt(50).toLong))
      .filter(e => e._1 != e._2)
    val a = ConnectedComponents.run(edges.toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    val b = ConnectedComponents.run(rnd.shuffle(edges).toDF("src", "dst"))
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("string ids work (entity-name keyed CC), both paths") {
    val df = Seq(("b", "a"), ("c", "b"), ("x", "y")).toDF("src", "dst")
    val want = Map("a" -> "a", "b" -> "a", "c" -> "a", "x" -> "x", "y" -> "x")
    val local = ConnectedComponents.run(df).as[(String, String)].collect().toMap
    val dist = ConnectedComponents.run(df, localSolveMax = 0)
      .as[(String, String)].collect().toMap
    assert(local == want)
    assert(dist == want)
  }

  test("supplementary-plane string ids: both paths elect the same representative") {
    // U+FFFF < U+20000 in UTF-8/code-point order (Spark's min), but the
    // opposite under Java compareTo — the local union-find must agree
    // with the distributed min()
    val hi = "￿"
    val sp1 = "𠀀" // U+20000
    val sp2 = "𠀁" // U+20001
    val df = Seq((hi, sp1), (sp1, sp2)).toDF("src", "dst")
    val local = ConnectedComponents.run(df).as[(String, String)].collect().toMap
    val dist = ConnectedComponents.run(df, localSolveMax = 0)
      .as[(String, String)].collect().toMap
    assert(local == dist)
    assert(local.values.toSet == Set(hi), "representative must be the UTF-8 min")
  }

  test("singletons included via runWithVertices") {
    val edges = Seq((1L, 2L)).toDF("src", "dst")
    val verts = Seq(1L, 2L, 3L).toDF("id")
    val got = ConnectedComponents.runWithVertices(edges, verts)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }
}
