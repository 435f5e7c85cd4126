package graft.engine

import graft.model.RecipeRule
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Recipe loading/rewrite semantics (`recipe.py:23-69`). */
class RecipeSpec extends AnyFunSuite {

  test("JSON recipe load: extension default, rewrite, depth default 1") {
    val dir = Files.createTempDirectory("graft-recipes-")
    val f = dir.resolve("media.json")
    Files.writeString(f,
      """[{"spider": ".*", "fetch": "(?i).*\\.jpe?g$", "depth": 2},
        | {"spider": ".*\\.html$"}]""".stripMargin)
    val rules = Recipe.load("media", "http://h.test/p",
      recipeDir = Some(dir.toString))
    assert(rules == Seq(
      RecipeRule(spider = Some(".*"), fetch = Some("(?i).*\\.jpe?g$"), depth = 2),
      RecipeRule(spider = Some(".*\\.html$"), depth = 1)))
  }

  test("env overrides: DEPTH, HOST_FILTER, FETCH_ALL/DUMP_ALL key switch") {
    val base = Seq(RecipeRule(spider = Some(".*"), dump = Some(".*\\.mov$")))
    val fetched = Recipe.rewrite(base, "http://Host.Test/x",
      Recipe.Env(depth = Some(5), hostFilter = true, fetchAll = true))
    assert(fetched == Seq(RecipeRule(spider = Some(".*"),
      fetch = Some(".*\\.mov$"), dump = None, depth = 5,
      hostFilter = Some("host.test"))))
    val dumped = Recipe.rewrite(
      Seq(RecipeRule(fetch = Some(".*\\.mp4$"))), "http://h/x",
      Recipe.Env(dumpAll = true))
    assert(dumped.head.dump == Some(".*\\.mp4$") && dumped.head.fetch.isEmpty)
  }

  test("bad regex raises PatternError at plan time") {
    intercept[Recipe.PatternError] {
      Recipe.rewrite(Seq(RecipeRule(spider = Some("(unclosed"))), "http://h/x")
    }
  }

  test("missing recipe file raises FileNotFound with both candidate paths") {
    val e = intercept[java.io.FileNotFoundException] {
      Recipe.load("no-such-recipe", "http://h/x",
        recipeDir = Some("/tmp/definitely-missing-dir"))
    }
    assert(e.getMessage.contains("no-such-recipe.json"))
  }
}
