package graft.ext

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, ImplicitCastInputTypes, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Root-relative data-file path from the scan's `_metadata.file_path`
  * — the DV/DML row-identity coordinate (`TxTable.DvFileCol`).
  *
  * `file_path` is a RENDERED URI: Spark percent-encodes non-URI
  * characters (a table under `/tmp/a dir/` scans as
  * `file:/tmp/a%20dir/…`), while the manifest stores paths as the
  * driver listed them — decoded. A raw substring match between the two
  * domains silently derives garbage coordinates for any table path
  * with a space/%/non-ASCII character (tombstones that never attach,
  * DML that never matches), so the relativization DECODES first
  * (`URI.getPath`) and fails LOUD if the root marker still does not
  * occur. */
object RelPath {
  def relativize(filePath: UTF8String, marker: String): UTF8String = {
    val s = filePath.toString
    val decoded =
      try new java.net.URI(s).getPath
      catch { case _: java.net.URISyntaxException => s }
    val i = decoded.indexOf(marker)
    if (i < 0)
      sys.error(s"scanned file '$s' (decoded '$decoded') does not live " +
        s"under the table root '$marker' — refusing to derive a row " +
        "identity that could attach tombstones to the wrong file")
    UTF8String.fromString(decoded.substring(i + marker.length))
  }

  def apply(filePath: org.apache.spark.sql.Column, marker: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.GraftColumnBridge.column(RelPathExpr(
      org.apache.spark.sql.GraftColumnBridge.expression(filePath), marker))
}

/** [[RelPath.relativize]] as a codegen'd expression (the projection
  * rides every DML predicate scan and DV-carrying read). */
case class RelPathExpr(child: Expression, marker: String)
    extends UnaryExpression with ImplicitCastInputTypes {
  override def dataType: DataType = StringType
  override def prettyName: String = "rel_path"
  override def inputTypes = Seq(StringType)

  override def nullSafeEval(input: Any): Any =
    RelPath.relativize(input.asInstanceOf[UTF8String], marker)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("marker", marker, "java.lang.String")
    defineCodeGen(ctx, ev, c => s"graft.ext.RelPath.relativize($c, $ref)")
  }

  override protected def withNewChildInternal(newChild: Expression): RelPathExpr =
    copy(child = newChild)
}
