package graft.sources

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property pins for SqlDml's quote/paren-aware scanner — the piece
  * every DML statement's correctness hangs on (a mis-split executes a
  * DIFFERENT statement). Segments are generated from atoms that
  * deliberately bury separators and keywords inside string literals
  * (all three quote styles, doubled-quote and backslash escapes) and
  * nested parens; the expected split is known BY CONSTRUCTION, so the
  * properties are exact, not probabilistic. Raw ScalaCheck from fixed
  * seeds (the scalatest bridge isn't in the offline cache) — the
  * PropertySpec pattern.
  */
class SqlScannerPropSpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default.withSize(30), Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private def seeds: Seq[Long] = (1L to 40L)

  /** Atoms that contain NO top-level comma, WHERE, or unbalanced paren
    * — but do contain all of those INSIDE quotes and parens.
    */
  private val atom: Gen[String] = Gen.oneOf(
    Gen.identifier.map(_.take(8)),
    Gen.const("'lit, with where and ((('"),
    Gen.const("'esc\\', still inside'"),
    Gen.const("'doubled '' quote, where'"),
    Gen.const("\"dq, where (\""),
    Gen.const("`bt, where )`"),
    Gen.const("(a, b)"),
    Gen.const("(f(x, 'a)b'), g())"),
    Gen.const("( nested , ( deeper, 'q)q' ) )"),
    Gen.const("x + 1"),
    Gen.const("CASE WHEN a THEN b ELSE c END"))

  private val segment: Gen[String] =
    Gen.choose(1, 4).flatMap(n =>
      Gen.listOfN(n, atom).map(_.mkString(" ")))

  test("splitTopLevel(sep) recovers exactly the generated segments") {
    seeds.foreach { s =>
      val segs = sample(Gen.choose(1, 5).flatMap(n =>
        Gen.listOfN(n, segment)), s)
      val joined = segs.mkString(",")
      assert(SqlDml.splitTopLevel(joined, ',') == segs,
        s"seed=$s input=$joined")
    }
  }

  test("topLevelKeyword finds the constructed WHERE and nothing earlier") {
    seeds.foreach { s =>
      val before = sample(segment, s)
      val after = sample(segment, s + 1000)
      val text = s"$before WHERE $after"
      val found = SqlDml.topLevelKeyword(text, "WHERE")
      assert(found.contains(before.length + 1),
        s"seed=$s text=$text found=$found")
    }
  }

  test("matchingParen finds the constructed close, not one inside quotes") {
    seeds.foreach { s =>
      val inner = sample(segment, s)
      val tail = sample(segment, s + 2000)
      val text = s"($inner) $tail"
      assert(SqlDml.matchingParen(text) == inner.length + 1,
        s"seed=$s text=$text")
    }
  }

  test("a quoted separator never splits; an unbalanced paren throws") {
    assert(SqlDml.splitTopLevel("a = 'x,y', b = 2", ',') ==
      Seq("a = 'x,y'", " b = 2"))
    assert(SqlDml.topLevelKeyword("set x = 'where' ", "WHERE").isEmpty)
    intercept[IllegalArgumentException] {
      SqlDml.matchingParen("(never closed 'but quoted )'")
    }
  }
}
