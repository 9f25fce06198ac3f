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

  // ---- open vocabulary: component model codes ------------------------
  // The gazetteer bounds entity cardinality at corpus-vocabulary size
  // (63 names); real web corpora have open vocabularies. Pages plant
  // Zipf-distributed synthetic component codes (pattern-detectable, no
  // dictionary) with punctuation/case variant surfaces, so the
  // canonicalization stages (G12 lowercase merge, G9 LSH banding, G10
  // CC, G11 representative merge) run at 10^5+ distinct entities in the
  // bench instead of the closed-gazetteer toy size.

  /** Fixed vocabulary size — scale-independent so page(id) stays a pure
    * function of id (Zipf head repeats at any corpus size; the tail
    * unfolds as pages grow). */
  val CodeVocab = 400000L
  val CodePrefixes = Vector("KJ", "XH", "BJ", "DZ")
  /** Category names the 属于 relation targets (all end in 组件 so the
    * relation template is unambiguous). */
  val CodeCategories: Vector[String] = Vector(
    "压缩机组件", "蒸发器组件", "冷凝器组件", "节流组件", "风机组件",
    "电机组件", "电控组件", "传感组件", "管路组件", "阀门组件",
    "换热组件", "风道组件", "面板组件", "底盘组件", "接线组件",
    "滤网组件", "显示组件", "遥控组件", "支架组件", "密封组件",
    "隔音组件", "排水组件", "加湿组件", "净化组件", "导风组件",
    "轴承组件", "叶轮组件", "外壳组件", "紧固组件", "减震组件",
    "绝缘组件", "散热组件")

  private val base36 = "0123456789ABCDEFGHIJKLMNOPQRSTUVWXYZ"

  /** Canonical surface of vocabulary entry `idx` (injective). The
    * index is scrambled through a bijection on [0, 36^5) first —
    * sequential encoding would give the Zipf head near-identical
    * strings ("KJ-00001", "KJ-00002", …), whose shared shingles blow
    * the LSH bands up quadratically (measured 9.7M candidate pairs at
    * a 43k vocabulary); real part numbers are string-diverse. */
  def codeOf(idx: Long): String = {
    val sb = new StringBuilder(8)
    sb ++= CodePrefixes(((idx % 4) + 4).toInt % 4)
    sb += '-'
    // 2654435761 is coprime to 36^5 = 2^10 * 3^10 => bijective
    var v = (idx * 2654435761L) % 60466176L
    var i = 0
    val digits = new Array[Char](5)
    while (i < 5) { digits(4 - i) = base36((v % 36).toInt); v /= 36; i += 1 }
    sb ++= new String(digits)
    sb.toString
  }

  /** O(1) Zipf(1) rank over CodeVocab: inverse-CDF of density ~1/r via
    * exp of a uniform draw (P(rank k) ~ 1/(k ln V)). */
  def zipfCode(id: Long, slot: Long): Long = {
    val u = ((rand(id, slot) >>> 11).toDouble / (1L << 53).toDouble) // [0,1)
    val r = math.floor(math.exp(u * math.log(CodeVocab.toDouble))).toLong
    math.min(math.max(r, 1L), CodeVocab) - 1L
  }

  /** Variant surface of a code: the alias noise canonicalization must
    * merge back. All punctuation variants embed identically (embedKey
    * strips the separator), so they merge on the LSH+CC path; the
    * lowercase variant merges on the G12 path. */
  def codeSurface(idx: Long, id: Long, slot: Long): String = {
    val canonical = codeOf(idx)
    val v = (((rand(id, slot) % 10) + 10) % 10).toInt
    v match {
      case 0 | 1 | 2 | 3 => canonical                      // 40%
      case 4 | 5 => canonical.replace("-", "")             // 20% fused
      case 6 => canonical.toLowerCase                      // 10% case
      case 7 => canonical.replace("-", ".")                // 10% dotted
      case 8 => canonical.replace("-", "_")                // 10% underscore
      case _ => canonical.replace("-", " ")                // 10% spaced
      // (the spaced form collapses to the fused form under the
      // extractor's whitespace-stripping normalization)
    }
  }

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
      // open-vocabulary component code (Zipf-drawn, variant surface) +
      // its 属于 relation to a per-code category
      val codeIdx = zipfCode(id, 60 + f)
      val surface = codeSurface(codeIdx, id, 70 + f)
      val cat = CodeCategories((codeIdx % CodeCategories.length).toInt)
      sb ++= s"<p>部件型号：$surface，属于$cat。</p>"
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
