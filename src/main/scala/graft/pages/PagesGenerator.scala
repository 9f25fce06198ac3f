package graft.pages

import graft.embed.HashingEmbedder.mix64
import graft.html.HtmlToMarkdown
import java.nio.charset.StandardCharsets
import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}

/** One Common-Crawl-style web page row (BASELINE.json input_hint). */
final case class Page(
    url: String,
    warc_ts: Timestamp,
    html: Array[Byte],
    text: String,
    lang: String)

/** Deterministic synthetic `pages` table (FIXTURES.md §1, seed=42):
  * article HTML with nav/footer boilerplate (link-dense, stripped by
  * the readability scorer), `#`/`##` sections, and 1-3 planted corpus
  * fragments drawn Zipf-style from the golden-fixture chunk contents —
  * the head fragments create the hot-entity skew the canonicalization
  * stage must survive. Alias-decorated entity mentions (trailing `·`,
  * decoration suffixes) exercise the three merge paths (lowercase,
  * suffix-strip, embedding-LSH).
  *
  * Fully deterministic from (seed, page id): the generator runs as a
  * narrow map over spark.range, no RNG state shared across rows.
  */
object PagesGenerator {

  val Seed = 42L

  /** Corpus fragments — loaded from the KB fixture resource. */
  lazy val fragments: Vector[String] = {
    val in = getClass.getResourceAsStream("/graft/corpus_fragments.json")
    require(in != null, "corpus_fragments.json missing")
    val root = new com.fasterxml.jackson.databind.ObjectMapper().readTree(in)
    in.close()
    import scala.jdk.CollectionConverters._
    root.elements().asScala.map(_.asText()).toVector
  }

  /** Alias-decorated entity surfaces for canonicalization work — the
    * same variant set the gazetteer knows (KnowledgeBase.aliasVariants),
    * so every planted alias becomes a distinct mention the canonicalizer
    * must merge back to its base. */
  /** Entity names the alias surfaces derive from. */
  lazy val aliasBases: Vector[String] =
    Vector("室内机电控板", "连接线锁扣", "电控盒", "PCB插座",
      "蒸发器设计规范", "硬件开发课", "规范性引用文件", "术语和定义")

  lazy val aliasSurfaces: Vector[String] =
    aliasBases.flatMap(graft.extract.KnowledgeBase.aliasVariants)

  private val fillerZh = Vector(
    "本期通报涵盖生产过程中的质量情况与整改进展",
    "请各相关部门按照要求落实整改措施并及时反馈",
    "以下内容摘自公司内部技术文件与质量记录",
    "质量管理体系要求对所有过程问题进行闭环管理",
    "数据来源于产线检验记录与供应商来料检验报告")
  private val fillerEn = Vector(
    "This bulletin summarizes process quality findings for the period",
    "All departments shall implement the corrective actions listed below",
    "The following content is excerpted from internal technical standards",
    "Quality records are collected from inspection lines and suppliers")
  private val navWords = Vector("首页", "质量通报", "技术标准", "关于我们", "联系方式")
  private val categories = Vector("quality", "standard", "process", "bulletin")

  private def rand(id: Long, slot: Long): Long = mix64(mix64(Seed ^ id) ^ slot)
  private def pick[T](xs: IndexedSeq[T], id: Long, slot: Long): T =
    xs((((rand(id, slot) % xs.length) + xs.length) % xs.length).toInt)

  /** Zipf-ish rank over n items: P(r) ~ 1/(r+1). */
  def zipfIndex(n: Int, id: Long, slot: Long): Int = {
    val h = rand(id, slot)
    val u = ((h >>> 11).toDouble / (1L << 53).toDouble)  // [0,1)
    val hn = (1 to n).map(1.0 / _).sum
    var acc = 0.0
    var r = 0
    while (r < n) {
      acc += 1.0 / (r + 1) / hn
      if (u < acc) return r
      r += 1
    }
    n - 1
  }

  def buildHtml(id: Long): (String, String) = {
    val cat = pick(categories, id, 1)
    val isEn = (rand(id, 2) % 5) == 0 // ~20% en
    val lang = if (isEn) "en" else "zh"
    val title =
      if (isEn) s"Process Quality Bulletin No.$id"
      else s"过程质量通报第${id}期"
    val nFrag = 1 + (((rand(id, 3) % 3) + 3) % 3).toInt // 1..3
    val filler = if (isEn) fillerEn else fillerZh

    val sb = new StringBuilder
    sb ++= "<html><head><title>" ++= title ++= "</title></head><body>"
    sb ++= "<div class=\"nav\">"
    navWords.foreach(w => sb ++= s"""<a href="/$cat/$w">$w</a> """)
    sb ++= "</div>"
    sb ++= "<div class=\"main\">"
    sb ++= s"<h1>$title</h1>"
    sb ++= s"<p>${pick(filler, id, 4)}，编号 $id。</p>"
    var f = 0
    while (f < nFrag) {
      val fragIdx = zipfIndex(fragments.length, id, 10 + f)
      sb ++= s"<h2>第${f + 1}节 ${pick(categories, id, 20 + f)}</h2>"
      // "摘录：" prefix keeps fragment-leading "# " off line starts so the
      // chunker splits on page structure, not on planted content
      sb ++= s"<p>${pick(filler, id, 30 + f)}。</p>"
      sb ++= "摘录：" + fragments(fragIdx)
      if ((rand(id, 40 + f) & 3L) == 0L) {
        val alias = pick(aliasSurfaces, id, 50 + f)
        sb ++= s"<p>相关部件：$alias，详见附录。</p>"
      }
      f += 1
    }
    if ((rand(id, 6) & 7L) == 0L) {
      sb ++= "<pre><code>QC-CHECK --batch " + (id % 97) + "\nstatus=OK</code></pre>"
    }
    sb ++= s"""<img src="/img/$id.png" alt="附图${id % 9}"/>"""
    sb ++= "</div>"
    sb ++= "<div class=\"footer\">"
    navWords.foreach(w => sb ++= s"""<a href="/f/$w">$w</a> """)
    sb ++= s"<a href=\"/beian\">备案信息</a>©${2020 + (id % 6)}</div>"
    sb ++= "</body></html>"
    (sb.toString, lang)
  }

  def page(id: Long): Page = {
    val (html, lang) = buildHtml(id)
    val text = HtmlToMarkdown(html)
    Page(
      url = f"https://synth.test/${pick(categories, id, 1)}/$id%06d",
      warc_ts = new Timestamp(1700000000000L + id * 977L),
      html = html.getBytes(StandardCharsets.UTF_8),
      text = text,
      lang = lang)
  }

  /** Distributed generation: narrow map over spark.range — each task
    * generates its id span independently, no shuffle, no driver data. */
  def pages(spark: SparkSession, n: Long, partitions: Int = 32): Dataset[Page] = {
    import spark.implicits._
    spark.range(0, n, 1, partitions).map(id => page(id))
  }

  /** Page count for a testdata scale dir (sf0.001 -> 1k pages etc.,
    * FIXTURES.md sizes). */
  def countForScale(sf: Double): Long = math.max((sf * 1e6).toLong, 100L)
}
