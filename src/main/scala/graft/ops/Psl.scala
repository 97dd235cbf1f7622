package graft.ops

/** Public-suffix-list lookup: the registered (registrable) domain of a
  * host, per the publicsuffix.org algorithm, over the rule snapshot
  * compiled into `graft/public_suffix_list.dat` (public data; see the
  * scope note at the top of that resource — multi-label registry rules
  * plus common hosted-platform suffixes, with the spec's implicit `*`
  * default covering every unlisted TLD).
  *
  * Lookup is a pure in-memory hash probe per candidate suffix —
  * O(labels) string slices against three static sets, no allocation
  * beyond the probes — so the wrapping Catalyst expression stays inside
  * whole-stage codegen and the table ships once per executor as class
  * data, not per task.
  *
  * Algorithm (publicsuffix.org/list/ "Formal algorithm"): among all
  * rules matching a suffix of the host, an exception rule beats the
  * rest (its public suffix drops the exception's leftmost label);
  * otherwise the longest match wins; no match means the public suffix
  * is the last label. The registered domain is the public suffix plus
  * one preceding label — empty when the host IS a public suffix (the
  * spec's "nothing to register" case) or empty.
  */
object Psl {

  /** (exact rules, wildcard bases — the `X` of `*.X`, exception rules
    * minus their `!`).
    */
  private val (exact, wildcardBases, exceptions): (Set[String], Set[String], Set[String]) = {
    val in = getClass.getResourceAsStream("/graft/public_suffix_list.dat")
    require(in != null, "graft/public_suffix_list.dat missing from classpath")
    val src = scala.io.Source.fromInputStream(in, "UTF-8")
    try {
      val rules = src.getLines()
        .map(_.trim)
        .filter(l => l.nonEmpty && !l.startsWith("//"))
        .toVector
      (rules.filter(r => !r.startsWith("*.") && !r.startsWith("!")).toSet,
        rules.filter(_.startsWith("*.")).map(_.drop(2)).toSet,
        rules.filter(_.startsWith("!")).map(_.drop(1)).toSet)
    } finally src.close()
  }

  /** Longest matching public suffix of a (lowercased) host; "" for an
    * empty host. An IPv4-looking host has no meaningful suffix but
    * still returns its last label (callers group raw IPs separately).
    */
  def publicSuffix(host: String): String = {
    if (host.isEmpty) return ""
    val labels = host.split('.')
    val n = labels.length
    var i = 0
    while (i < n) {
      val suffix = labels.slice(i, n).mkString(".")
      if (exceptions.contains(suffix))
        return labels.slice(i + 1, n).mkString(".")
      if (exact.contains(suffix)) return suffix
      // `*.X` matches any single label directly under X
      if (i + 1 < n && wildcardBases.contains(labels.slice(i + 1, n).mkString(".")))
        return suffix
      i += 1
    }
    labels(n - 1)
  }

  /** Registered domain (public suffix + one label), or "" when the host
    * is itself a public suffix / empty.
    */
  def registeredDomain(host: String): String = {
    if (host.isEmpty) return ""
    val ps = publicSuffix(host)
    if (host == ps) return ""
    // host ends with "." + ps: take one more label
    val cut = host.length - ps.length - 1 // index of the '.' before ps
    val prevDot = host.lastIndexOf('.', cut - 1)
    host.substring(prevDot + 1)
  }
}
