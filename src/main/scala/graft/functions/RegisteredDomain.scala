package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** The Public Suffix List (publicsuffix.org — public data, MPL 2.0,
  * shipped verbatim at resources/graft/public_suffix_list.dat from the
  * Debian `publicsuffix` package) parsed into hash sets for O(labels)
  * registered-domain lookup.
  *
  * Loaded lazily ONCE PER JVM from the jar's own resources — on a
  * 1000-executor cluster every executor builds the ~10k-entry sets
  * locally at first use; nothing is broadcast and no join is added, so
  * [[RegisteredDomain]] stays a narrow, shuffle-free projection.
  */
object Psl {
  // The PSL stores IDN rules in Unicode form only; real crawls carry
  // both Unicode and punycode (xn--) hosts. Index BOTH forms of every
  // non-ASCII rule so "foo.xn--p1ai" and "foo.рф" resolve to the same
  // site identity. IDN.toASCII is the JDK's RFC 3490 encoder; a rule it
  // rejects simply stays Unicode-only (defensive — the real list is
  // well-formed).
  private def addForms(set: java.util.HashSet[String], rule: String): Unit = {
    set.add(rule)
    var ascii = true
    var i = 0
    while (ascii && i < rule.length) { if (rule.charAt(i) >= 0x80) ascii = false; i += 1 }
    if (!ascii) {
      try set.add(java.net.IDN.toASCII(rule).toLowerCase(java.util.Locale.ROOT))
      catch { case _: IllegalArgumentException => () }
    }
  }

  // exact rules ("co.uk"), wildcard parents ("kawasaki.jp" for
  // "*.kawasaki.jp"), exception rules minus '!' ("city.kawasaki.jp")
  private lazy val (rules, wildcards, exceptions): (java.util.HashSet[String], java.util.HashSet[String], java.util.HashSet[String]) = {
    val r = new java.util.HashSet[String](16384)
    val w = new java.util.HashSet[String](64)
    val x = new java.util.HashSet[String](16)
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "graft/public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      for (raw <- src.getLines()) {
        val line = raw.trim
        if (line.nonEmpty && !line.startsWith("//")) {
          if (line.startsWith("!")) addForms(x, line.substring(1))
          else if (line.startsWith("*.")) addForms(w, line.substring(2))
          else addForms(r, line)
        }
      }
    } finally src.close()
    (r, w, x)
  }

  /** Number of labels in `labels`' public suffix per the PSL algorithm
    * (longest matching rule wins; exception rules win outright; the
    * default rule "*" makes any unlisted TLD a suffix of 1 label).
    * `lower` must hold the lowercased labels.
    */
  private def publicSuffixLabels(lower: Array[String]): Int = {
    val n = lower.length
    var ps = 1 // default rule "*"
    var k = 1
    // build suffix strings right-to-left incrementally (no re-joins)
    var suffix = lower(n - 1)
    while (k <= n) {
      if (exceptions.contains(suffix)) return k - 1
      if (rules.contains(suffix) && k > ps) ps = k
      if (k < n && wildcards.contains(suffix) && k + 1 > ps) ps = k + 1
      if (k < n) suffix = lower(n - 1 - k) + "." + suffix
      k += 1
    }
    ps
  }

  /** Registered domain (public suffix + one label) of `host`, keeping
    * the input's case. Passthrough (returns `host` unchanged) for: IPv4
    * and other all-numeric hosts, bracketed/colon IPv6 literals, hosts
    * with empty labels (leading/trailing/double dots), single labels,
    * and hosts that ARE a public suffix.
    */
  def registeredDomain(host: String): String = {
    if (host.isEmpty) return host
    var allNumeric = true
    var i = 0
    while (i < host.length) {
      val c = host.charAt(i)
      if (c == ':' || c == '[') return host // IPv6 literal
      if (allNumeric && c != '.' && (c < '0' || c > '9')) allNumeric = false
      i += 1
    }
    if (allNumeric) return host // IPv4 / numeric host
    val labels = host.split("\\.", -1)
    val n = labels.length
    if (n < 2) return host
    var j = 0
    while (j < n) { if (labels(j).isEmpty) return host; j += 1 }
    val lower = new Array[String](n)
    j = 0
    while (j < n) { lower(j) = labels(j).toLowerCase(java.util.Locale.ROOT); j += 1 }
    val ps = publicSuffixLabels(lower)
    if (n <= ps) return host // the host IS a public suffix
    // last ps+1 labels of the ORIGINAL (case-preserving) host
    var cut = host.length
    var seen = 0
    while (seen < ps + 1) {
      cut = host.lastIndexOf('.', cut - 1)
      if (cut < 0) return host // defensive; unreachable given n > ps
      seen += 1
      if (seen == ps + 1) return host.substring(cut + 1)
      ()
    }
    host
  }
}

/** Native Catalyst expression: registered domain of a host per the real
  * Public Suffix List — `user.github.io` → `user.github.io` (private-
  * section suffix), `www.example.co.uk` → `example.co.uk`,
  * `foo.city.kawasaki.jp` → `city.kawasaki.jp` (exception rule beats
  * the `*.kawasaki.jp` wildcard). The site-identity key behind
  * per-domain caps, blocklists, and provenance reports
  * ([[graft.text.Urls.registeredDomain]]).
  *
  * Codegen'd (whole-stage), per-JVM static PSL sets (see [[Psl]]), no
  * shuffle, no broadcast: scan-speed at 100 TB.
  */
case class RegisteredDomain(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_registered_domain requires a string argument, got ${child.dataType.catalogString}")
  override def prettyName: String = "graft_registered_domain"

  /** Kernel shared by eval and generated code. */
  def compute(h: UTF8String): UTF8String = {
    val s = h.toString
    val d = Psl.registeredDomain(s)
    if (d eq s) h else UTF8String.fromString(d)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("rd", this, classOf[RegisteredDomain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.compute($c)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
