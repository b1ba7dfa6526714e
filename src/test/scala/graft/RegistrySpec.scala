package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver-contract registry invariants: no name is lost to
  * shadowing (the round-7 la_funnel bug class), and every oracle
  * belongs to a registered query.
  */
class RegistrySpec extends AnyFunSuite {

  test("queries materialize with no within- or cross-registry collisions") {
    // QueryRegistry.q throws on within-registry duplicates at class
    // init and SparkEntry.queries on cross-registry ones — reaching
    // the size assertion proves both guards passed
    val qs = SparkEntry.queries
    assert(qs.size > 200, s"expected the full contract, got ${qs.size}")
  }

  test("every oracle key has a query; oracles are non-empty SQL") {
    val qs = SparkEntry.queries.keySet
    SparkEntry.oracleSql.foreach { case (name, sql) =>
      assert(qs.contains(name), s"oracle without query: $name")
      assert(sql.trim.nonEmpty && sql.toUpperCase.contains("SELECT"),
        s"degenerate oracle SQL for $name")
    }
  }

  test("every bench name — headline and sf1 — is a registered query") {
    // r12: a typo in Bench.headline/sf1Needs used to surface only as a
    // burned 40-minute bench run recording a failed row; now it's a
    // red test at build time. sf1 gating tables must also be real.
    val qs = SparkEntry.queries.keySet
    val tables = Set("region", "nation", "customer", "supplier", "part",
      "orders", "lineitem", "events", "documents", "embeddings")
    Bench.headline.foreach(n =>
      assert(qs.contains(n), s"bench headline names unknown query: $n"))
    (Bench.sf1Needs ++ Bench.sf1EvidenceRows).foreach { case (n, t) =>
      assert(qs.contains(n), s"sf1 block names unknown query: $n")
      assert(tables.contains(t), s"sf1 row $n gates on unknown table: $t")
    }
  }

  test("suspect classification covers every branch with the honest " +
      "labels") {
    def le(w: Double, t: String, seeded: Boolean = false) =
      Some(Bench.LedgerEntry(w, t, seeded = seeded))
    def cls(s: String): String =
      """"class":"([a-z-]+)"""".r.findFirstMatchIn(s).get.group(1)
    // fresh rerun + ledger: the isolated baseline adjudicates both ways
    assert(cls(Bench.classifySuspect(Some(1.0), le(0.9, "aaa"),
      "tip", 0.4)) == "context")
    assert(cls(Bench.classifySuspect(Some(1.5), le(0.9, "aaa"),
      "tip", 0.4)) == "regression")
    // fresh rerun, no ledger: under 1.5x prev-shared is conclusive
    // (isolated bias is HIGH), at/over is UNadjudicable — never call
    // regression against a possibly page-cache-deflated shared value
    assert(cls(Bench.classifySuspect(Some(0.5), None, "tip", 0.4))
      == "context")
    assert(cls(Bench.classifySuspect(Some(1.2), None, "tip", 0.4))
      == "no-isolated-baseline")
    // ledger only: FINAL at the current tip, provisional when stale,
    // proves nothing when the ledger value itself is a >=1.5x mover
    assert(cls(Bench.classifySuspect(None, le(0.5, "tip"), "tip",
      0.4)) == "context")
    assert(cls(Bench.classifySuspect(None, le(0.5, "old"), "tip",
      0.4)) == "context-stale-ledger")
    assert(cls(Bench.classifySuspect(None, le(0.9, "tip"), "tip",
      0.4)) == "needs-attribution")
    // nothing known at all
    assert(cls(Bench.classifySuspect(None, None, "tip", 0.4))
      == "needs-attribution")
    // the rerun value and its source label land in the fragment
    val frag = Bench.classifySuspect(Some(1.2), None, "abc123", 0.4)
    assert(frag.contains("\"isolated\":1.2") &&
      frag.contains("\"isolated_src\":\"rerun@abc123\""))
  }

  test("suspect floors: absolute per scale, with the sf1 relative " +
      "escape hatch") {
    // sf0.1: plain 0.2s floor + 1.5x
    assert(Bench.isSuspect("sf0.1", 0.4, 0.61))
    assert(!Bench.isSuspect("sf0.1", 0.08, 0.21)) // r12 ADVICE case
    assert(!Bench.isSuspect("sf0.1", 0.4, 0.55))  // under 1.5x
    // sf1: the 2.0s floor suppresses the r13 wobble class...
    assert(!Bench.isSuspect("sf1", 0.39, 0.77))   // 1.97x, sub-2s
    assert(!Bench.isSuspect("sf1", 1.47, 2.19))   // one endpoint under
    assert(Bench.isSuspect("sf1", 2.0, 3.1))
    // ...but cannot hide a LARGE regression on a small row: >=3x
    // landing at >=1s is flagged even below the floor
    assert(Bench.isSuspect("sf1", 0.5, 1.9))
    assert(!Bench.isSuspect("sf1", 0.5, 0.9))     // small and <3x
    assert(!Bench.isSuspect("sf1", 0.1, 0.9))     // prev under 0.2s
  }

  test("golden anchors shrink the declared no-oracle set to " +
      "documented necessity") {
    // r14 verdict #7: every kernel payload row now names the
    // oracle-checked same-code golden twin that anchors it (validated
    // in SparkEntry.goldenAnchored — unknown twin or anchored-yet-
    // oracled row fails there), and the RESIDUAL rows-only set is
    // pinned to exactly the documented-necessity rows: the
    // pipeline_dbest journey composite (anchored piecewise by the
    // green decode/stats entries), zlib compression, and the
    // Spark-seeded sample.
    val anchors = SparkEntry.goldenAnchored
    assert(anchors == Map(
      "k3_dbest_change" -> "k3_dbest_change_golden",
      "k3_dbest_changes_all" -> "k3_dbest_changes_all_golden",
      "k3_dbest_point_decode" -> "k3_dbest_point_decode_golden",
      "k4_dbest_generalization" -> "k4_dbest_golden",
      "k5_stl_components" -> "k5_stl_components_golden"))
    val noOracle = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(noOracle -- anchors.keySet ==
      Set("pipeline_dbest", "t_compress_ratio", "t_stratified_sample"))
  }

  test("child budget: seconds-at-stake ordering, scaled to 8") {
    // r14 verdict #1: the r14 sweep spent its 3 children on the three
    // SMALLEST movers (0.86/1.35/3.9 s) because the old ordering keyed
    // on class-then-ratio; the 17 s and 16 s rows shipped unexamined.
    // Rows are (name, sf, prev, now) — stake = now − prev.
    val pool = Seq(
      ("small_big_ratio", "sf0.1", 0.2, 0.9),   // 4.5x, 0.7 s at stake
      ("big_small_ratio", "sf1", 10.0, 17.0),   // 1.7x, 7.0 s at stake
      ("mid", "sf1", 2.0, 5.0))                 // 3.0 s at stake
    assert(Bench.childPriority(pool).map(_._1) ==
      Seq("big_small_ratio", "mid", "small_big_ratio"))
    // budget scales to 8, not 3
    val many = (1 to 12).map(i => (s"q$i", "sf0.1", 1.0, 1.0 + i))
    val picked = Bench.childPriority(many)
    assert(picked.length == 8)
    assert(picked.head._1 == "q12" && picked.last._1 == "q5")
  }

  test("the committed ledger parses with Bench's regex reader") {
    // Bench.parseLedgerJson matches `"name@sf":{...}` with NO space
    // after the colon — a ledger rewritten by a pretty-printer (e.g.
    // json.dump(indent=...)) would silently read as EMPTY and every
    // suspect would lose its isolated baseline. Pin that the file on
    // disk stays in the parseable form, whatever tool last wrote it
    // (Bench.writeLedger or tools/ledger_merge.py).
    val text = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("tools/isolated_ledger.json")), "UTF-8")
    val entries = Bench.parseLedgerJson(text)
    assert(entries.size > 150,
      s"ledger parsed to ${entries.size} entries — reader/format drift")
    entries.foreach { case (k, e) =>
      assert(e.warm > 0, s"non-positive warm for $k")
      assert(e.tip.nonEmpty && e.tip != "unknown", s"no tip for $k")
    }
  }

  test("failed-row retry verdicts: pass, failure, and no-verdict " +
      "branches with the child's numbers threaded through") {
    // r15: a shared-sweep failure (the g_suite_on_view late-sweep OOM
    // class) retries once in a fresh child; the artifact's verdict is
    // this record. A completed child absolves (resource pressure, not
    // code); a failing child is real breakage; silence is no verdict.
    val pass = Bench.failedRetryRecord(
      """{"isolated":"g_suite_on_view","sf":"sf1","dir":"d","cold":90.1,"warm":73.06,"load":0.8,"tip":"abc"}""")
    assert(pass.contains("\"class\":\"isolated-pass\"") &&
      pass.contains("\"warm\":73.06") && pass.contains("\"cold\":90.1") &&
      pass.contains("\"load\":0.8"))
    val fail = Bench.failedRetryRecord(
      """{"isolated":"q","sf":"sf1","error":"UNABLE_TO_ACQUIRE_MEMORY x"}""")
    assert(fail.contains("\"class\":\"isolated-failure\"") &&
      fail.contains("UNABLE_TO_ACQUIRE_MEMORY"))
    // spawn failure / 10-min kill: empty or truncated child output
    assert(Bench.failedRetryRecord("")
      .contains("\"class\":\"no-verdict\""))
    // parseNum is the single field reader both paths share
    assert(Bench.parseNum("warm", pass).contains(73.06))
    assert(Bench.parseNum("warm", fail).isEmpty)
  }

  test("code-unchanged evidence absolves finally; changed files are " +
      "named; seeded entries stay provisional") {
    def le(w: Double, t: String, seeded: Boolean = false) =
      Some(Bench.LedgerEntry(w, t, seeded = seeded))
    def cls(s: String): String =
      """"class":"([a-z-]+)"""".r.findFirstMatchIn(s).get.group(1)
    // r13 verdict #1: git proving the owned paths untouched between
    // the compared tips settles the row whatever the ledger says —
    // with or without a ledger value to report alongside
    assert(cls(Bench.classifySuspect(None, None, "tip", 0.4,
      Some(Nil))) == "context-code-unchanged")
    assert(cls(Bench.classifySuspect(None, le(0.9, "old"), "tip", 0.4,
      Some(Nil))) == "context-code-unchanged")
    // ...but a fresh rerun outranks it (only forced/dev paths can
    // produce this combination; the sweep never spawns for absolved
    // rows) and an UNKNOWN diff (None) absolves nothing
    assert(cls(Bench.classifySuspect(Some(1.5), le(0.9, "a"), "tip",
      0.4, Some(Nil))) == "regression")
    assert(cls(Bench.classifySuspect(None, None, "tip", 0.4, None))
      == "needs-attribution")
    // changed owned files are NAMED so the artifact says why the row
    // could not self-absolve
    val frag = Bench.classifySuspect(None, None, "tip", 0.4,
      Some(Seq("src/main/scala/graft/graph/GraphOps.scala")))
    assert(cls(frag) == "needs-attribution" &&
      frag.contains("\"changed_files\":[\"src/main/scala/graft/graph/GraphOps.scala\"]"))
    // r13 ADVICE: a seeded (no-isolated-baseline-recorded) ledger
    // value issues only provisional absolutions, current tip or not —
    // a regression recorded AS the baseline must not self-absolve
    assert(cls(Bench.classifySuspect(None, le(0.5, "tip",
      seeded = true), "tip", 0.4)) == "context-seeded")
    assert(cls(Bench.classifySuspect(Some(0.55), le(0.5, "old",
      seeded = true), "tip", 0.4)) == "context-seeded")
    // a seeded value >= 1.5x prev-shared still proves nothing
    assert(cls(Bench.classifySuspect(None, le(0.9, "tip",
      seeded = true), "tip", 0.4)) == "needs-attribution")
  }

  test("ledger JSON round-trips optional round/date/seeded fields") {
    val j = """{"entries":{
      "a_q@sf0.1":{"warm":1.5,"tip":"abc1234"},
      "b_q@sf1":{"warm":12.25,"tip":"def5678","round":13},
      "c_q@sf0.1":{"warm":0.8,"tip":"aaa0000","round":14,"date":"2026-08-16","seeded":true}}}"""
    val m = Bench.parseLedgerJson(j)
    assert(m("a_q@sf0.1") == Bench.LedgerEntry(1.5, "abc1234"))
    assert(m("b_q@sf1") == Bench.LedgerEntry(12.25, "def5678", Some(13)))
    assert(m("c_q@sf0.1") == Bench.LedgerEntry(0.8, "aaa0000", Some(14),
      Some("2026-08-16"), seeded = true))
    // the committed ledger parses and every entry carries a round
    val committed = Bench.parseLedgerJson(new String(
      java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("tools/isolated_ledger.json")), "UTF-8"))
    assert(committed.nonEmpty)
    committed.foreach { case (k, e) =>
      assert(e.round.nonEmpty, s"ledger entry without a round stamp: $k")
      assert(e.warm > 0 && e.tip.length >= 7, s"degenerate entry: $k")
    }
  }

  test("round inference reads the driver's BENCH_r series") {
    assert(Bench.roundFromBenchFiles(Seq("BENCH_r01.json",
      "BENCH_r13.json", "CORRECTNESS_r13.json", "notes.md")) == 14)
    assert(Bench.roundFromBenchFiles(Nil) == 0)
  }

  test("every bench name maps to owned paths that exist") {
    // the code-unchanged absolution is only sound if the owned-path
    // table stays truthful: every path must exist in the repo (a
    // renamed package would silently turn the table into a
    // never-matches filter = absolve-everything), and every bench
    // name must resolve to a REGISTRY-specific set, not the
    // whole-tree fallback
    val allNames = Bench.headline ++
      (Bench.sf1Needs ++ Bench.sf1EvidenceRows).map(_._1)
    allNames.foreach { n =>
      val paths = Bench.ownedPaths(n)
      assert(!paths.contains("src/main/scala/graft/"),
        s"bench query $n fell through to the whole-tree fallback")
      paths.foreach(p => assert(
        java.nio.file.Files.exists(java.nio.file.Paths.get(p)),
        s"owned path for $n does not exist: $p"))
    }
    // unknown names get the conservative whole-tree fallback
    assert(Bench.ownedPaths("no_such_query")
      .contains("src/main/scala/graft/"))
  }

  test("owned paths are a transitive closure of the code-level " +
      "reference graph") {
    // The code-unchanged absolution is FINAL and skips the child-JVM
    // recheck, so an under-inclusive owned set silently absolves a
    // real regression forever (review finding, r14: a first-cut table
    // built from IMPORT statements missed fully-qualified calls —
    // PipelineQueries → rel.OlsFit, KernelQueries → api.GraftEngine).
    // This test recomputes the reference graph FROM THE SOURCES
    // (non-comment lines, imports and FQNs alike) and asserts every
    // package/root-class a query's owned files reference is itself
    // owned — each owned set closed under direct references IS the
    // transitive closure. New cross-module calls fail the build here
    // instead of corrupting next round's artifact.
    import java.nio.file.{Files, Path, Paths}
    import scala.jdk.CollectionConverters._
    val srcRoot = Paths.get("src/main/scala/graft")
    val pkgs = Set("rel", "ts", "pipeline", "graph", "streaming",
      "dedup", "sim", "text", "multimodal", "sources", "plans", "io",
      "functions", "api", "model")
    val pkgRef = ("""graft\.(""" + pkgs.mkString("|") + """)\b""").r
    val rootRef = """graft\.([A-Z]\w*)""".r
    val pipeClsRef = """graft\.pipeline\.([A-Z]\w*)""".r
    def codeLines(p: Path): Seq[String] =
      new String(Files.readAllBytes(p), "UTF-8").linesIterator
        .map(_.trim).filterNot(l => l.startsWith("*") ||
          l.startsWith("//") || l.startsWith("/*") ||
          // a file's own `package graft.pipeline` declaration is not a
          // dependency on the pipeline package (file-grain ownership,
          // r14 verdict #6)
          l.startsWith("package ")).toSeq
    def scalaFiles(dir: Path): Seq[Path] =
      if (!Files.exists(dir)) Nil
      else Files.walk(dir).iterator.asScala
        .filter(_.toString.endsWith(".scala")).toSeq
    val allNames = (Bench.headline ++
      (Bench.sf1Needs ++ Bench.sf1EvidenceRows).map(_._1)).distinct
    // few distinct owned sets — check each once, not per name
    allNames.groupBy(Bench.ownedPaths).foreach { case (owned, names) =>
      val ownedPkgs = owned.collect {
        case p if p.endsWith("/") && p.startsWith("src/main/scala/graft/")
          => p.stripPrefix("src/main/scala/graft/").stripSuffix("/")
      }.toSet
      val ownedRoot = owned.collect {
        case p if p.endsWith(".scala") =>
          p.stripPrefix("src/main/scala/graft/").stripSuffix(".scala")
      }.toSet
      // SparkEntry is owned (its edits block absolution) but NOT
      // traversed: it is the aggregation point whose references ARE
      // the registry list — following them would make every query own
      // every module via registration plumbing instead of via its own
      // call graph
      val files = ownedPkgs.toSeq.map(srcRoot.resolve).flatMap(scalaFiles) ++
        ownedRoot.toSeq.filterNot(_ == "SparkEntry")
          .map(f => srcRoot.resolve(f + ".scala"))
          .filter(Files.exists(_))
      val lines = files.flatMap(codeLines)
      // file-grain pipeline ownership (r14 verdict #6): a
      // graft.pipeline reference is satisfied either by owning the
      // whole pipeline/ dir (the ts/streaming closure) or by owning
      // every pipeline/<Class>.scala the code names — an FQN the scan
      // CAN resolve, unlike a bare package ref
      val ownsPipelineDir = ownedPkgs.contains("pipeline")
      val pipeClsRefs = lines.flatMap(l =>
        pipeClsRef.findAllMatchIn(l).map(_.group(1))).toSet
      val missingPipeCls =
        if (ownsPipelineDir) Set.empty[String]
        else pipeClsRefs -- ownedRoot.collect {
          case r if r.startsWith("pipeline/") =>
            r.stripPrefix("pipeline/")
        }
      assert(missingPipeCls.isEmpty,
        s"owned paths for ${names.take(3).mkString(",")}… miss " +
          s"pipeline classes $missingPipeCls referenced by FQN")
      val missingPkgs = lines.flatMap(l =>
        pkgRef.findAllMatchIn(l).map(_.group(1))).toSet --
        ownedPkgs --
        // pipeline refs settled at class grain above
        (if (ownsPipelineDir) Set.empty[String]
         else if (missingPipeCls.isEmpty) Set("pipeline")
         else Set.empty[String])
      assert(missingPkgs.isEmpty,
        s"owned paths for ${names.take(3).mkString(",")}… miss " +
          s"code-referenced packages $missingPkgs — a change there " +
          "could regress the query yet be absolved code-unchanged")
      val missingRoot = lines.flatMap(l =>
        rootRef.findAllMatchIn(l).map(_.group(1))).toSet -- ownedRoot
      assert(missingRoot.isEmpty,
        s"owned paths for ${names.take(3).mkString(",")}… miss " +
          s"root-level classes $missingRoot")
      // same-package bare references are invisible to the graft.X
      // scans: for owned pipeline FILES, any OTHER pipeline class
      // named in the code must itself be owned (file-grain honesty —
      // `Sampling.hashBucket` carries no `graft.` prefix)
      if (!ownsPipelineDir) {
        val pipeDir = srcRoot.resolve("pipeline")
        val allPipeCls = scalaFiles(pipeDir).map(
          _.getFileName.toString.stripSuffix(".scala")).toSet
        val ownedPipeCls = ownedRoot.collect {
          case r if r.startsWith("pipeline/") =>
            r.stripPrefix("pipeline/")
        }
        val ownedPipeFiles = files.filter(
          _.toString.contains("/pipeline/"))
        if (ownedPipeFiles.nonEmpty) {
          val bareRefs = ownedPipeFiles.flatMap(codeLines).flatMap(l =>
            (allPipeCls -- ownedPipeCls).filter(c =>
              ("""\b""" + c + """\b""").r.findFirstIn(l).isDefined))
            .toSet
          assert(bareRefs.isEmpty,
            s"owned paths for ${names.take(3).mkString(",")}… miss " +
              s"same-package pipeline classes $bareRefs")
        }
      }
    }
  }

  test("duplicate registration is rejected") {
    object Dup extends QueryRegistry {
      q("dup_x", "SELECT 1") { (_, _) => null }
    }
    Dup.queries // force init
    intercept[IllegalArgumentException] {
      object Dup2 extends QueryRegistry {
        q("dup_y", "SELECT 1") { (_, _) => null }
        q("dup_y", "SELECT 2") { (_, _) => null }
      }
      Dup2.queries
    }
  }
}
