package graft.sources

import java.util.OptionalLong

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, Path}
import org.apache.parquet.example.data.Group
import org.apache.parquet.example.data.simple.convert.GroupRecordConverter
import org.apache.parquet.hadoop.ParquetFileReader
import org.apache.parquet.hadoop.util.HadoopInputFile
import org.apache.parquet.io.{ColumnIOFactory, RecordReader}
import org.apache.parquet.schema.MessageType

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayBasedMapData, GenericArrayData}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, Statistics, SupportsPushDownFilters, SupportsPushDownRequiredColumns, SupportsReportStatistics}
import org.apache.spark.sql.sources.{EqualNullSafe, EqualTo, Filter, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 read surface for the [[graft.tsdb.GraftDb]] series
  * store: `spark.read.format("graft").load(rootDir)` exposes the store
  * as a plain five-column SQL table
  *
  *   (name STRING, labels MAP<STRING,STRING>, timestamp LONG /* epoch
  *   ms */, value DOUBLE, lvalue LONG)
  *
  * so any Spark SQL — not just the PromQL engine — can query the store
  * directly, the catalog-reader surface a Spark-native engine is
  * expected to have (the analogue of the reference exposing its store
  * through its SQL shell rather than only the PromQL planner).
  *
  * Scale posture:
  *  - PARTITION PRUNING happens at `Scan.build`: the store's physical
  *    layout is `name=<series>/bucket=<bucketStartMs>/...parquet`, and
  *    pushed `name` equality/IN filters plus `timestamp` range bounds
  *    select only the directories whose (name, [bucket, bucket +
  *    bucketMs)) can hold matching rows — at 100 TB a dashboard-style
  *    "one series, last 6h" query opens a handful of files no matter
  *    how large the store is, exactly the reference's time/series
  *    pruning (`indexer.rs` stream probe + per-bucket layout).
  *  - COLUMN PRUNING reaches the parquet row groups:
  *    `SupportsPushDownRequiredColumns` narrows the requested schema
  *    and the reader calls `ParquetFileReader.setRequestedSchema`, so
  *    unread columns are never decompressed. A projection that needs
  *    no file column at all (`SELECT name`, `COUNT(*)`) is answered
  *    from footer row counts without materializing records.
  *  - Pushed filters are reported for `explain` but ALWAYS also left
  *    in the residual (`pushFilters` returns its input unchanged):
  *    directory pruning is conservative, Spark re-evaluates exactly,
  *    so a mis-set `bucketMs` option can cost performance but never
  *    correctness on the name/timestamp dimensions it prunes on.
  *  - One InputPartition per data file: Spark schedules files across
  *    executors; within a (name, bucket) dir files are flush deltas
  *    (compacted by `GraftDb.compact`), so file count tracks data
  *    volume, not small-file pathology.
  *
  * Writes go through [[graft.tsdb.GraftDb]] ingestion (Inserter /
  * importCsv / streaming), which owns the catalog, the bucket layout
  * and the stats sidecar — the table is read-only by design, like a
  * catalog view.
  *
  * Options: `bucketMs` (default 3600000) must match the GraftDb that
  * wrote the store; a LARGER value only widens pruning windows (safe),
  * a smaller one could prune a bucket whose rows extend past the
  * claimed width — same contract as GraftDb's own constructor.
  */
class GraftSource extends TableProvider
    with org.apache.spark.sql.sources.DataSourceRegister {

  override def shortName(): String = "graft"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    GraftSource.tableSchema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val path = Option(properties.get("path")).getOrElse(
      throw new IllegalArgumentException(
        "graft source requires a path: spark.read.format(\"graft\").load(rootDir)"))
    val bucketMs = Option(properties.get("bucketMs")).map(_.toLong)
      .getOrElse(3600 * 1000L)
    new GraftTable(path, bucketMs)
  }
}

object GraftSource {

  val tableSchema: StructType = StructType(Seq(
    StructField("name", StringType),
    StructField("labels", MapType(StringType, StringType)),
    StructField("timestamp", LongType),
    StructField("value", DoubleType),
    StructField("lvalue", LongType)))

  /** One data file of the store with its partition-dir coordinates. */
  final case class GraftFile(path: String, name: String, bucket: Long,
      length: Long)

  /** Hive-style partition-value unescape (`%2F` → `/`): GraftDb writes
    * through Spark's `partitionBy`, which escapes special characters in
    * the `name=` dir the same way.
    */
  private[graft] def unescapePathName(s: String): String = {
    if (!s.contains('%')) return s
    val sb = new StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '%' && i + 2 < s.length &&
          Character.digit(s.charAt(i + 1), 16) >= 0 &&
          Character.digit(s.charAt(i + 2), 16) >= 0) {
        sb.append((Character.digit(s.charAt(i + 1), 16) * 16 +
          Character.digit(s.charAt(i + 2), 16)).toChar)
        i += 3
      } else { sb.append(c); i += 1 }
    }
    sb.result()
  }

  /** List every visible data file under `rootDir`(/data) with its
    * (name, bucket) coordinates. Accepts either the GraftDb root (data
    * lives in `<root>/data`) or a data dir directly.
    */
  private[graft] def listFiles(rootDir: String, conf: Configuration): Seq[GraftFile] = {
    val root = new Path(rootDir)
    val fs = root.getFileSystem(conf)
    val dataDir = {
      val d = new Path(root, "data")
      if (fs.exists(d)) d else root
    }
    if (!fs.exists(dataDir)) return Seq.empty
    def visible(st: FileStatus): Boolean = {
      val n = st.getPath.getName
      !n.startsWith(".") && !n.startsWith("_")
    }
    for {
      nameDir <- fs.listStatus(dataDir).toSeq
      if nameDir.isDirectory && nameDir.getPath.getName.startsWith("name=")
      name = unescapePathName(nameDir.getPath.getName.stripPrefix("name="))
      bucketDir <- fs.listStatus(nameDir.getPath).toSeq
      if bucketDir.isDirectory && bucketDir.getPath.getName.startsWith("bucket=")
      bucket = bucketDir.getPath.getName.stripPrefix("bucket=").toLong
      f <- fs.listStatus(bucketDir.getPath).toSeq
      if f.isFile && visible(f) && f.getLen > 0
    } yield GraftFile(f.getPath.toString, name, bucket, f.getLen)
  }

  /** Directory-level pruning from pushed filters — pure so the spec can
    * pin it. A file survives unless a `name` equality set excludes its
    * series or its bucket interval [bucket, bucket + bucketMs) provably
    * misses the pushed `timestamp` bounds. Unknown filter shapes are
    * ignored (prune stays conservative; Spark re-applies everything).
    */
  private[graft] def prune(files: Seq[GraftFile], filters: Seq[Filter],
      bucketMs: Long): Seq[GraftFile] = {
    var names: Option[Set[String]] = None
    var lo = Long.MinValue
    var hi = Long.MaxValue
    def num(v: Any): Option[Long] = v match {
      case n: java.lang.Number => Some(n.longValue)
      case _ => None
    }
    def addNames(vs: Iterable[Any]): Unit = {
      val set = vs.collect { case s: String => s }.toSet
      names = Some(names.fold(set)(_ intersect set))
    }
    filters.foreach {
      case EqualTo("name", v: String) => addNames(Seq(v))
      case EqualNullSafe("name", v: String) => addNames(Seq(v))
      case In("name", vs) => addNames(vs.toSeq)
      case EqualTo("timestamp", v) => num(v).foreach { t =>
        lo = math.max(lo, t); hi = math.min(hi, t) }
      // strict bounds tighten by one ms (timestamps are integral): a
      // bucket starting exactly at a LessThan bound holds no match
      case GreaterThan("timestamp", v) => num(v).foreach(t =>
        lo = math.max(lo, if (t == Long.MaxValue) t else t + 1))
      case GreaterThanOrEqual("timestamp", v) => num(v).foreach(t => lo = math.max(lo, t))
      case LessThan("timestamp", v) => num(v).foreach(t =>
        hi = math.min(hi, if (t == Long.MinValue) t else t - 1))
      case LessThanOrEqual("timestamp", v) => num(v).foreach(t => hi = math.min(hi, t))
      case _ => ()
    }
    files.filter { f =>
      // saturating end keeps a file whose bucket arithmetic would
      // overflow instead of mis-pruning it
      val bucketEnd =
        if (f.bucket > Long.MaxValue - bucketMs) Long.MaxValue
        else f.bucket + bucketMs
      names.forall(_.contains(f.name)) && f.bucket <= hi && bucketEnd > lo
    }
  }

  /** The filters [[prune]] can act on — reported as pushed in explain. */
  private[graft] def usable(f: Filter): Boolean = f match {
    case EqualTo("name", _: String) | EqualNullSafe("name", _: String) |
         In("name", _) => true
    case EqualTo("timestamp", _) | GreaterThan("timestamp", _) |
         GreaterThanOrEqual("timestamp", _) | LessThan("timestamp", _) |
         LessThanOrEqual("timestamp", _) => true
    case _ => false
  }
}

private[sources] class GraftTable(rootDir: String, bucketMs: Long)
    extends Table with SupportsRead {
  override def name(): String = s"graft:$rootDir"
  override def schema(): StructType = GraftSource.tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftScanBuilder(rootDir, bucketMs)
}

private[sources] class GraftScanBuilder(rootDir: String, bucketMs: Long)
    extends ScanBuilder
    with SupportsPushDownFilters with SupportsPushDownRequiredColumns {

  private var required: StructType = GraftSource.tableSchema
  private var pushed: Array[Filter] = Array.empty

  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    pushed = filters.filter(GraftSource.usable)
    // everything stays residual: pruning is conservative, Spark keeps
    // exact row-level evaluation
    filters
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = {
    val files = GraftSource.prune(
      GraftSource.listFiles(rootDir, new Configuration()),
      pushed.toSeq, bucketMs)
    new GraftScan(files, required, pushed)
  }
}

private[sources] class GraftScan(files: Seq[GraftSource.GraftFile],
    required: StructType, pushed: Array[Filter])
    extends Scan with Batch with SupportsReportStatistics {

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftScan files=${files.size} " +
      s"PushedFilters=[${pushed.mkString(", ")}] " +
      s"ReadSchema=${required.simpleString}"

  override def planInputPartitions(): Array[InputPartition] =
    files.map(f => GraftInputPartition(f.path, f.name): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftReaderFactory(required)

  override def estimateStatistics(): Statistics = new Statistics {
    override def sizeInBytes(): OptionalLong =
      OptionalLong.of(files.map(_.length).sum)
    override def numRows(): OptionalLong = OptionalLong.empty()
  }
}

private[sources] final case class GraftInputPartition(path: String,
    name: String) extends InputPartition

private[sources] class GraftReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(p: InputPartition): PartitionReader[InternalRow] =
    new GraftPartitionReader(p.asInstanceOf[GraftInputPartition], required)
}

/** Per-file reader over parquet-mr's public Group API. Requested-schema
  * projection keeps unread columns un-decompressed; the no-file-column
  * fast path (count / name-only scans) answers from footer row counts.
  *
  * Row materialization here is record-at-a-time (no vectorization) —
  * the right trade for a catalog/SQL access surface whose wins come
  * from opening 0.01% of the store; heavy analytics go through the
  * engine's plain parquet scans which keep Spark's vectorized reader.
  */
private[sources] class GraftPartitionReader(part: GraftInputPartition,
    required: StructType) extends PartitionReader[InternalRow] {

  private val reader = ParquetFileReader.open(
    HadoopInputFile.fromPath(new Path(part.path), new Configuration()))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema
  // file columns actually needed ("name" is a partition value; columns
  // absent from an older file's schema read as null)
  private val wanted: Array[String] = required.fieldNames
    .filter(n => n != "name" && fileSchema.containsField(n))
  private val countOnly = wanted.isEmpty
  private val projSchema: MessageType =
    if (countOnly) null
    else new MessageType(fileSchema.getName,
      wanted.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
  if (!countOnly) reader.setRequestedSchema(projSchema)
  private val columnIO =
    if (countOnly) null else new ColumnIOFactory().getColumnIO(projSchema)

  private val nameValue = UTF8String.fromString(part.name)
  private var recordReader: RecordReader[Group] = null
  private var rowsLeft: Long =
    if (countOnly) reader.getFooter.getBlocks.asScala.map(_.getRowCount).sum
    else 0L
  private var current: Group = null

  private def nextRowGroup(): Boolean = {
    val pages = reader.readNextRowGroup()
    if (pages == null) false
    else {
      recordReader = columnIO.getRecordReader(pages,
        new GroupRecordConverter(projSchema))
      rowsLeft = pages.getRowCount
      true
    }
  }

  override def next(): Boolean = {
    if (countOnly) { if (rowsLeft <= 0) return false; rowsLeft -= 1; return true }
    while (rowsLeft <= 0) if (!nextRowGroup()) return false
    current = recordReader.read()
    rowsLeft -= 1
    current != null
  }

  override def get(): InternalRow = {
    val out = new Array[Any](required.length)
    var i = 0
    while (i < required.length) {
      val f = required.fields(i)
      out(i) =
        if (f.name == "name") nameValue
        else if (countOnly || !fileSchema.containsField(f.name)) null
        else {
          val idx = projSchema.getFieldIndex(f.name)
          if (current.getFieldRepetitionCount(idx) == 0) null
          else f.dataType match {
            case LongType => current.getLong(idx, 0)
            case DoubleType => current.getDouble(idx, 0)
            case _: MapType => readLabels(current.getGroup(idx, 0))
            case StringType => UTF8String.fromString(current.getString(idx, 0))
            case other => throw new IllegalStateException(
              s"unsupported graft column type: $other")
          }
        }
      i += 1
    }
    new GenericInternalRow(out)
  }

  /** Spark parquet map layout: group(MAP) > repeated key_value(key,
    * value) — value itself optional.
    */
  private def readLabels(m: Group): ArrayBasedMapData = {
    val n = m.getFieldRepetitionCount(0)
    val keys = new Array[Any](n)
    val values = new Array[Any](n)
    var i = 0
    while (i < n) {
      val kv = m.getGroup(0, i)
      keys(i) = UTF8String.fromString(kv.getString(0, 0))
      values(i) =
        if (kv.getType.getFieldCount > 1 && kv.getFieldRepetitionCount(1) > 0)
          UTF8String.fromString(kv.getString(1, 0))
        else null
      i += 1
    }
    new ArrayBasedMapData(new GenericArrayData(keys), new GenericArrayData(values))
  }

  override def close(): Unit = reader.close()
}
