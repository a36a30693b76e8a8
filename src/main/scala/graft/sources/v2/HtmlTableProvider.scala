package graft.sources.v2

import java.util

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 form of the HTML table scan:
  *
  * {{{
  *   spark.read.format("graft-html").option("tbody", 2).load(dir)
  * }}}
  *
  * One InputPartition per page file — a directory of N crawled pages scans
  * as N parallel tasks, each parsing its file with the same grammar as
  * [[graft.sources.HtmlTable]] (positional `tbody[i]`, `<tr>`/`<td>` rows,
  * tag-strip + trim cells, header-row filter). Output schema:
  * `src_file string, row_idx int, cells array<string>` — projection into
  * named columns stays relational on top.
  *
  * Deliberately minimal V2 surface (batch read only): the point is the
  * source-API tier — schema declaration, partition planning, per-partition
  * readers — not filter pushdown, which has nothing to push for opaque
  * pages. Reference: `soup.find_all('tbody')[2]` at
  * `Python/etl_project_world_banks.ipynb:79-84`.
  */
class HtmlTableProvider extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-html"
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HtmlTableProvider.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new HtmlTableTable(new CaseInsensitiveStringMap(properties))
}

object HtmlTableProvider {
  val Schema: StructType = StructType(Seq(
    StructField("src_file", StringType, nullable = false),
    StructField("row_idx", IntegerType, nullable = false),
    StructField("cells", ArrayType(StringType), nullable = false)))
}

private[v2] class HtmlTableTable(options: CaseInsensitiveStringMap)
    extends Table with SupportsRead {
  override def name(): String = s"graft-html(${options.get("path")})"
  override def schema(): StructType = HtmlTableProvider.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(o: CaseInsensitiveStringMap): ScanBuilder = {
    val merged = new CaseInsensitiveStringMap(
      (options.asScala ++ o.asScala).asJava)
    () => new HtmlTableScan(merged)
  }
}

private[v2] class HtmlTableScan(options: CaseInsensitiveStringMap)
    extends Scan with Batch {
  override def readSchema(): StructType = HtmlTableProvider.Schema
  override def toBatch: Batch = this

  // The SESSION's Hadoop conf, not `new Configuration()`: a bare conf
  // silently drops configured filesystem settings (object-store
  // credentials, defaultFS, timeouts) that every file-based reader in the
  // session honors — the difference between "works on local paths" and
  // "works on the cluster's actual storage".
  private def hadoopConf: Configuration =
    org.apache.spark.sql.SparkSession.active.sessionState.newHadoopConf()

  override def planInputPartitions(): Array[InputPartition] = {
    val path = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("graft-html requires a load path"))
    val p = new Path(path)
    val fs = p.getFileSystem(hadoopConf)
    // glob expansion first (crawl dirs arrive as /data/pages/2026-*/ at
    // scale), then RECURSIVE file listing under each match — a nested
    // crawl tree scans as one flat file set, one InputPartition per page
    val roots = Option(fs.globStatus(p)).map(_.toSeq).getOrElse(Seq.empty)
    if (roots.isEmpty)
      throw new IllegalArgumentException(s"graft-html: no input matches $path")
    // hidden-path rule matches Spark's InMemoryFileIndex: exclude a file
    // if any path segment BELOW the listed root starts with _ or . (job
    // leftovers live under _temporary/attempt_*/...), and apply it to
    // glob-matched files too — load("dir/*") must not parse _SUCCESS as a
    // page. Segments above the root are the user's base path and exempt.
    def visibleUnder(root: org.apache.hadoop.fs.Path,
        p: org.apache.hadoop.fs.Path): Boolean = {
      var cur = p
      while (cur != null && cur != root) {
        val n = cur.getName
        if (n.startsWith("_") || n.startsWith(".")) return false
        cur = cur.getParent
      }
      true
    }
    val files = roots.flatMap { st =>
      if (st.isFile) {
        if (visibleUnder(st.getPath.getParent, st.getPath))
          Seq(st.getPath.toString)
        else Seq.empty
      } else {
        val it = fs.listFiles(st.getPath, true)
        val buf = scala.collection.mutable.ArrayBuffer.empty[String]
        while (it.hasNext) {
          val f = it.next()
          if (f.isFile && visibleUnder(st.getPath, f.getPath))
            buf += f.getPath.toString
        }
        buf.toSeq
      }
    }.distinct.sorted
    files.map(f => HtmlFilePartition(f): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory = {
    // executors have no SparkSession — ship the session conf with the
    // factory via the standard serializable wrapper
    val conf = new org.apache.spark.util.SerializableConfiguration(hadoopConf)
    new HtmlReaderFactory(conf,
      Option(options.get("tbody")).map(_.toInt).getOrElse(0))
  }
}

private[v2] case class HtmlFilePartition(file: String) extends InputPartition

private[v2] class HtmlReaderFactory(
    conf: org.apache.spark.util.SerializableConfiguration, tbodyIndex: Int)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new HtmlPartitionReader(p.asInstanceOf[HtmlFilePartition].file,
      tbodyIndex, conf.value)
}

private[v2] class HtmlPartitionReader(file: String, tbodyIndex: Int,
    hadoopConf: Configuration)
    extends PartitionReader[InternalRow] {
  // same grammar as graft.sources.HtmlTable
  private val Tbody = "(?s)<tbody[^>]*>(.*?)</tbody>".r
  private val Tr = "(?s)<tr[^>]*>(.*?)</tr>".r
  private val Td = "(?s)<td[^>]*>(.*?)</td>".r
  private val Tag = "<[^>]*>".r

  private val rows: Iterator[InternalRow] = {
    val fs = new Path(file).getFileSystem(hadoopConf)
    val in = fs.open(new Path(file))
    val html =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val tbody = Tbody.findAllMatchIn(html).map(_.group(1)).toVector
      .lift(tbodyIndex)
    tbody.iterator.flatMap { tb =>
      Tr.findAllMatchIn(tb).map(_.group(1)).zipWithIndex.flatMap {
        case (tr, i) =>
          val cells = Td.findAllMatchIn(tr)
            .map(m => Tag.replaceAllIn(m.group(1), "").trim).toArray
          if (cells.isEmpty) None // header-row filter (ipynb:98)
          else Some(InternalRow(
            UTF8String.fromString(file), i,
            new GenericArrayData(
              cells.map(UTF8String.fromString(_): Any))))
      }
    }
  }

  private var current: InternalRow = _
  override def next(): Boolean =
    if (rows.hasNext) { current = rows.next(); true } else false
  override def get(): InternalRow = current
  override def close(): Unit = ()
}
