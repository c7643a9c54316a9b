package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** The per-row committing version behind the `_version` metadata column:
  * map the scan's `input_file_name()` back to the manifest version that
  * ADDED that file. The map keys on the file's last two path segments
  * (`data/part-….parquet`) — unique within one table because every data
  * file of a snapshot lives under one `data/` dir with a UUID part name
  * — so the lookup is O(1) whatever scheme/prefix the runtime URI
  * carries. The map ships with the serialized plan via
  * `ctx.addReferenceObj` (one virtual call per row inside whole-stage
  * codegen, the BloomMightContain/CountMin pattern); at ~60 bytes per
  * manifest entry it is the same O(files) driver metadata the snapshot
  * itself already is.
  */
final class FileVersionMap(
    entries: java.util.HashMap[String, java.lang.Long]) extends Serializable {
  def version(file: UTF8String): java.lang.Long = {
    val s = file.toString
    val i = s.lastIndexOf('/')
    val j = if (i <= 0) -1 else s.lastIndexOf('/', i - 1)
    entries.get(s.substring(j + 1))
  }
}

object FileVersionMap {
  /** Build from (relativePath, version) manifest pairs. */
  def apply(files: Seq[(String, Long)]): FileVersionMap = {
    val m = new java.util.HashMap[String, java.lang.Long]()
    files.foreach { case (p, v) =>
      val i = p.lastIndexOf('/')
      val j = if (i <= 0) -1 else p.lastIndexOf('/', i - 1)
      m.put(p.substring(j + 1), v)
    }
    new FileVersionMap(m)
  }
}

case class FileVersion(child: Expression, map: FileVersionMap)
    extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"file_version needs a string file name, got $other")
  }
  override def dataType: DataType = LongType
  override def nullable: Boolean = true
  override def prettyName: String = "file_version"

  override def nullSafeEval(input: Any): Any = {
    val v = map.version(input.asInstanceOf[UTF8String])
    if (v == null) null else v.longValue()
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("fileVerMap", map,
      classOf[FileVersionMap].getName)
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}$$v = $ref.version($c);
      if (${ev.value}$$v == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}$$v.longValue(); }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): FileVersion =
    copy(child = newChild)
}
