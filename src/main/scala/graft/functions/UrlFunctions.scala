package graft.functions

import graft.urlcanon.{PyUrl, UrlRewrite}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Native Catalyst expressions for the URL functions on the hot path
 * (SURVEY §4.5 optional upgrade (1)): unlike a Scala UDF, these
 * participate in whole-stage codegen — `doGenCode` emits a direct static
 * call, the standard pattern of Spark's own string expressions — with
 * null-safety handled by the UnaryExpression scaffolding (no
 * serialization round-trip per row, no closure dispatch).
 *
 * Registered for SQL via `UrlFunctions.register(spark)`:
 *   SELECT canonical_host(url), canonical_url(url), url_filename(url) ...
 */
object UrlStatics {
  // static JVM entry points referenced by generated code
  def canonicalHost(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlRewrite.canonicalHost(url.toString))
  def canonicalUrl(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlRewrite.canonicalUrl(url.toString))
  def urlScheme(url: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.getScheme(url.toString))
  def urlFilename(url: UTF8String): UTF8String =
    UTF8String.fromString(UrlRewrite.urlToFilename(url.toString))
  def urlPath(url: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.urlsplit(url.toString).path)
  /** path plus '?'+query when a query exists — the string robots.txt
    * patterns match against (RFC 9309 / the reference matcher's
    * `/fish.php?id=anything` examples). */
  def urlPathQuery(url: UTF8String): UTF8String =
    UTF8String.fromString(PyUrl.pathQuery(url.toString))
  /** rewrite_one against an origin URL; null = dropped (fragment-only,
    * unparseable — the reference's StopIteration analogue). */
  def rewriteUrl(origin: UTF8String, raw: UTF8String): UTF8String =
    UrlRewrite.rewriteOne(origin.toString, raw.toString)
      .map(UTF8String.fromString).orNull
}

/** No lambda fields: `evalImpl` is an abstract METHOD so the expression
  * tree survives Java task (de)serialization — a Function1 field would
  * need a serializable lambda, which method references are not. */
abstract class UrlStaticExpr extends UnaryExpression {
  def methodName: String
  protected def evalImpl(u: UTF8String): UTF8String
  override def dataType: DataType = StringType
  override def nullSafeEval(input: Any): Any =
    evalImpl(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.UrlStatics.$methodName($c)")
}

case class CanonicalHost(child: Expression) extends UrlStaticExpr {
  override def methodName: String = "canonicalHost"
  override protected def evalImpl(u: UTF8String): UTF8String =
    UrlStatics.canonicalHost(u)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "canonical_host"
}
case class CanonicalUrl(child: Expression) extends UrlStaticExpr {
  override def methodName: String = "canonicalUrl"
  override protected def evalImpl(u: UTF8String): UTF8String =
    UrlStatics.canonicalUrl(u)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "canonical_url"
}
case class UrlScheme(child: Expression) extends UrlStaticExpr {
  override def methodName: String = "urlScheme"
  override protected def evalImpl(u: UTF8String): UTF8String =
    UrlStatics.urlScheme(u)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "url_scheme"
}
case class UrlFilename(child: Expression) extends UrlStaticExpr {
  override def methodName: String = "urlFilename"
  override protected def evalImpl(u: UTF8String): UTF8String =
    UrlStatics.urlFilename(u)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "url_filename"
}
case class UrlPath(child: Expression) extends UrlStaticExpr {
  override def methodName: String = "urlPath"
  override protected def evalImpl(u: UTF8String): UTF8String =
    UrlStatics.urlPath(u)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "url_path"
}
case class UrlPathQuery(child: Expression) extends UrlStaticExpr {
  override def methodName: String = "urlPathQuery"
  override protected def evalImpl(u: UTF8String): UTF8String =
    UrlStatics.urlPathQuery(u)
  override protected def withNewChildInternal(c: Expression): Expression = copy(c)
  override def prettyName: String = "url_path_query"
}

/** Reference-exact URL rewrite as a codegen'd binary expression: the
  * same `UrlRewrite.rewriteOne` kernel the typed map used, minus the
  * object serialize/deserialize round-trip — the per-candidate rewrite is
  * the crawl's hottest CPU stage at scale. NULL output = candidate
  * dropped (the caller filters), so this produces nulls even for non-null
  * inputs (custom isNull in codegen). */
case class RewriteUrl(left: Expression, right: Expression)
    extends BinaryExpression {
  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "rewrite_url"
  override protected def nullSafeEval(origin: Any, raw: Any): Any =
    UrlStatics.rewriteUrl(origin.asInstanceOf[UTF8String],
      raw.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (o, r) => s"""
      ${ev.value} = graft.functions.UrlStatics.rewriteUrl($o, $r);
      ${ev.isNull} = (${ev.value} == null);
    """)
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object UrlFunctions {
  /** Register the native expressions for SQL use. */
  def register(spark: SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction("canonical_host",
      exprs => CanonicalHost(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("canonical_url",
      exprs => CanonicalUrl(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("url_scheme",
      exprs => UrlScheme(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("url_filename",
      exprs => UrlFilename(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("url_path",
      exprs => UrlPath(exprs.head), "built-in")
    reg.createOrReplaceTempFunction("url_path_query",
      exprs => UrlPathQuery(exprs.head), "built-in")
  }
}
