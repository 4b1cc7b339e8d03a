package graft.golden

import java.nio.file.Files

import graft.SparkSpec

/** Diffs each headline query against its frozen snapshot (see [[Golden]]
  * for why this exists alongside the DuckDB gate: it catches
  * both-engines-drift-together regressions the relational compare is
  * structurally blind to). On mismatch the assertion prints the first
  * differing lines; if the change is INTENDED, regenerate deliberately
  * with `sbt "Test/runMain graft.golden.GoldenRegen"` and review the
  * snapshot diff.
  */
class GoldenSnapshotSpec extends SparkSpec {

  Golden.Names.foreach { name =>
    test(s"golden snapshot: $name matches the frozen expected output") {
      val p = Golden.path(name)
      assert(Files.exists(p), s"missing golden file $p — run GoldenRegen")
      val expected = Files.readString(p).stripLineEnd.split("\n", -1).toSeq
      val actual = Golden.canonicalLines(Golden.run(name, spark))
      val firstDiff = expected.zipAll(actual, "<missing>", "<missing>")
        .zipWithIndex.find { case ((e, a), _) => e != a }
      assert(expected.size == actual.size && firstDiff.isEmpty,
        firstDiff.map { case ((e, a), i) =>
          s"$name drifted from its golden at line $i:\n  expected: $e\n  actual:   $a"
        }.getOrElse(s"$name row count ${actual.size} != golden ${expected.size}"))
    }
  }
}
