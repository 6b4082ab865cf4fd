package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression: registrable domain of a (lowercased)
  * host under the FULL Public Suffix List — the aggregation key of
  * domain-level curation (docs-per-domain caps, per-site reputation:
  * `shop.example.co.uk` and `www.example.co.uk` are ONE site,
  * `example.co.uk`).
  *
  * Rules: the complete publicsuffix.org list (public data, MPL 2.0;
  * embedded verbatim as `public_suffix_list.dat`, 9.5k rules, ICANN +
  * PRIVATE sections — PRIVATE matters for crawl curation: capping
  * `blogspot.com` as ONE domain would throttle millions of unrelated
  * blogs), replacing the ~150-rule embedded subset the first cut
  * shipped (a real crawl hits `.com.au`, `.com.br` ccTLD long tail
  * daily). Standard PSL algorithm: among matching rules the one with
  * the most labels wins, `*` matches exactly one label, `!exception`
  * rules win outright (their suffix is the rule minus its leftmost
  * label), no match falls back to the implicit `*` (bare TLD) rule.
  *
  * Scale shape: the rule set is a per-JVM immutable hash map loaded
  * once from the classpath (~9.5k entries, ~600 KB) — an executor
  * constant like a broadcast, NOT a join; lookup is O(labels) hash
  * probes per host inside whole-stage codegen (one static call, the
  * [[NfcNormalize]] pattern). Compare: the subset formulation was a
  * 150-branch `isin` scan per row, and a broadcast-join formulation
  * would shuffle the probe side's projection through a join for what
  * is a row-local function.
  *
  * Carve-outs (unchanged from the subset version, q267-gated): IPv4
  * literals and single-label hosts (`localhost`) stay whole — the
  * PSL algorithm would group unrelated IPs under a `0.1`
  * pseudo-domain; hosts that ARE a public suffix, are empty, or have
  * empty labels (`a..b`, trailing dot) also return unchanged.
  * Unicode rules are indexed in BOTH their verbatim-unicode and
  * punycode (ACE) forms at load time, so hosts match in whichever
  * form the crawl carries them — the host itself is never
  * IDN-decoded (the crawl keys on the raw host).
  */
case class RegisteredDomain(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"registered_domain expects string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "registered_domain"

  override def nullSafeEval(input: Any): Any =
    RegisteredDomain.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.RegisteredDomain.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RegisteredDomain {
  val info = new ExpressionInfo(classOf[RegisteredDomain].getName, "registered_domain")

  /** (normal rules, wildcard rules keyed by their parent — `*.ck`
    * stored as `ck`, exception rules sans `!`). Loaded once per JVM. */
  private lazy val (normal, wildcard, exception):
      (java.util.HashSet[String], java.util.HashSet[String], java.util.HashSet[String]) = {
    val n = new java.util.HashSet[String](16384)
    val w = new java.util.HashSet[String](64)
    val e = new java.util.HashSet[String](16)
    val in = getClass.getResourceAsStream("/public_suffix_list.dat")
    require(in != null, "public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    // Unicode/IDN rules are ALSO indexed in their punycode (ACE) form
    // — the form real crawl hosts actually carry (`xn--55qx5d.hk`);
    // verbatim-unicode hosts keep matching the verbatim rule. One
    // java.net.IDN.toASCII per unicode rule, once per JVM (advisor
    // r14: punycoded hosts silently fell back to the last-two-label
    // rule before this).
    def addBothForms(set: java.util.HashSet[String], rule: String): Unit = {
      set.add(rule)
      var ascii = true
      var i = 0
      while (ascii && i < rule.length) { if (rule.charAt(i) >= 0x80) ascii = false; i += 1 }
      if (!ascii)
        try set.add(java.net.IDN.toASCII(rule).toLowerCase(java.util.Locale.ROOT))
        catch { case _: IllegalArgumentException => () }
    }
    try {
      for (raw <- src.getLines()) {
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          if (line.startsWith("!")) addBothForms(e, line.substring(1))
          else if (line.startsWith("*.")) addBothForms(w, line.substring(2))
          else addBothForms(n, line)
        }
      }
    } finally src.close()
    (n, w, e)
  }

  private def isIpv4(host: String): Boolean = {
    // ^[0-9]{1,3}(\.[0-9]{1,3}){3}$ — same shape the column
    // formulation guarded with (range not checked there either)
    var i = 0; var digits = 0; var dots = 0
    val len = host.length
    while (i < len) {
      val c = host.charAt(i)
      if (c == '.') {
        if (digits < 1 || digits > 3) return false
        dots += 1; digits = 0
      } else if (c >= '0' && c <= '9') digits += 1
      else return false
      i += 1
    }
    dots == 3 && digits >= 1 && digits <= 3
  }

  /** Called from interpreted eval AND generated code. */
  def compute(input: UTF8String): UTF8String = {
    val host = input.toString
    val out = computeStr(host)
    if (out eq host) input else UTF8String.fromString(out)
  }

  def computeStr(host: String): String = {
    if (host.isEmpty || isIpv4(host)) return host
    if (host.charAt(0) == '.' || host.charAt(host.length - 1) == '.' ||
      host.contains("..")) return host
    val labels = host.split('.')
    val nLab = labels.length
    if (nLab == 1) return host
    // longest matching rule first: scan suffixes from the whole host
    // down; exceptions beat everything, `*` matches one extra label
    var ps = 1 // implicit `*` rule: the bare TLD
    var i = 0
    var done = false
    while (i < nLab && !done) {
      val suf = labels.slice(i, nLab).mkString(".")
      if (exception.contains(suf)) { ps = nLab - i - 1; done = true }
      else if (normal.contains(suf)) { ps = nLab - i; done = true }
      else if (i + 1 < nLab && wildcard.contains(labels.slice(i + 1, nLab).mkString("."))) {
        ps = nLab - i; done = true
      }
      i += 1
    }
    if (ps >= nLab) host // the host IS a public suffix — stays whole
    else labels.slice(nLab - ps - 1, nLab).mkString(".")
  }
}
