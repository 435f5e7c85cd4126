package graft.engine

import graft.model.RecipeRule
import graft.urlcanon.PyUrl

/**
 * Recipe compilation (`/root/reference/spiderfetch/recipe.py:23-69`) —
 * recipes are data (no code execution, unlike the reference's execfile):
 * depth defaults to 1; env-style overrides DEPTH / HOST_FILTER / FETCH_ALL
 * / DUMP_ALL; bad regexes raise PatternError at plan time.
 */
object Recipe {

  final case class PatternError(msg: String) extends Exception(msg)

  /** The reference's option/env overrides (`spiderfetch.py:243-253`). */
  final case class Env(
      depth: Option[Int] = None,
      hostFilter: Boolean = false,
      fetchAll: Boolean = false,
      dumpAll: Boolean = false)

  /** rewrite_recipe (`recipe.py:23-44`). */
  def rewrite(recipe: Seq[RecipeRule], url: String, env: Env = Env()): Seq[RecipeRule] = {
    recipe.map { rule0 =>
      var rule = rule0
      env.depth.foreach(d => rule = rule.copy(depth = d))
      if (env.hostFilter)
        rule = rule.copy(hostFilter = PyUrl.getHostname(url))
      if (env.fetchAll) {
        // switch_key(rule, "dump", "fetch") (recipe.py:17-21,33)
        if (rule.dump.isDefined) rule = rule.copy(fetch = rule.dump, dump = None)
      } else if (env.dumpAll) {
        if (rule.fetch.isDefined) rule = rule.copy(dump = rule.fetch, fetch = None)
      }
      Seq(rule.spider, rule.fetch, rule.dump).flatten.foreach { p =>
        try java.util.regex.Pattern.compile(p)
        catch { case e: java.util.regex.PatternSyntaxException =>
          throw PatternError(s"Pattern error: ${e.getMessage}: $p") }
      }
      rule
    }
  }

  /** get_recipe (`recipe.py:67-69`): default crawl plan from a pattern. */
  def default(pattern: String, url: String, env: Env = Env()): Seq[RecipeRule] =
    rewrite(Seq(RecipeRule(spider = Some(".*"), fetch = Some(pattern))), url, env)

  /**
   * load_recipe (`recipe.py:55-65`), data-not-code: recipes are JSON
   * arrays of rules instead of exec'd Python —
   * `[{"spider": ".*", "fetch": "...", "dump": "...", "depth": 2}, ...]`.
   * Mirrors the reference's resolution order: extension defaults, $PWD
   * first, then the recipe dir (RECIPEDIR env or `recipes/`).
   */
  def load(filename: String, url: String, env: Env = Env(),
           recipeDir: Option[String] = None): Seq[RecipeRule] = {
    val withExt =
      if (filename.contains(".")) filename else filename + ".json"
    val dir = recipeDir.orElse(sys.env.get("RECIPEDIR")).getOrElse("recipes")
    val candidates = Seq(
      java.nio.file.Paths.get(withExt),
      java.nio.file.Paths.get(dir, withExt))
    val path = candidates.find(java.nio.file.Files.exists(_)).getOrElse {
      // the reference ships recipes/{jpg,mov,videostream}.py — bare names
      // resolve to the in-repo data twins when no file shadows them
      shipped.get(filename) match {
        case Some(r) => return rewrite(r, url, env)
        case None => throw new java.io.FileNotFoundException(
          s"recipe not found: ${candidates.mkString(" or ")}")
      }
    }
    val json = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    rewrite(parseJson(json), url, env)
  }

  /** The reference's shipped recipes, by bare name. */
  def shipped: Map[String, Seq[RecipeRule]] =
    Map("jpg" -> jpg, "mov" -> mov, "videostream" -> videostream)

  /** Parse a JSON recipe (jackson — already on the Spark classpath). */
  def parseJson(json: String): Seq[RecipeRule] = {
    import com.fasterxml.jackson.databind.ObjectMapper
    val mapper = new ObjectMapper()
    val root = mapper.readTree(json)
    require(root.isArray, "recipe JSON must be an array of rules")
    (0 until root.size()).map { i =>
      val n = root.get(i)
      def opt(k: String): Option[String] =
        if (n.has(k) && !n.get(k).isNull) Some(n.get(k).asText) else None
      RecipeRule(
        spider = opt("spider"), fetch = opt("fetch"), dump = opt("dump"),
        depth = if (n.has("depth")) n.get("depth").asInt else 1,
        hostFilter = opt("host_filter"))
    }
  }

  /** Shipped recipes as data (`recipes/{jpg,mov,videostream}.py`). */
  val jpg: Seq[RecipeRule] = Seq(
    RecipeRule(spider = Some("(?i)(?!.*\\.jpe?g$)"), fetch = Some("(?i).*\\.jpe?g$")))
  val mov: Seq[RecipeRule] = Seq(
    RecipeRule(spider = Some(".*"),
      dump = Some("(?i).*\\.(mpe?g|mp4|avi|mov|flv|wmv).*$"), depth = 2))
  val videostream: Seq[RecipeRule] = Seq(
    RecipeRule(spider = Some("(?i)http:\\/\\/.*\\.(asx|ram|rm)$"),
      dump = Some("(?i)^(mms|rtsp):\\/\\/"), depth = 2))
}
