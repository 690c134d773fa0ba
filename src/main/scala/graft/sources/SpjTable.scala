package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths}
import java.util.{Collections, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog._
import org.apache.spark.sql.connector.catalog.functions.{BoundFunction, ScalarFunction, UnboundFunction}
import org.apache.spark.sql.connector.expressions.{Expressions, Transform}
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.partitioning.{KeyGroupedPartitioning, Partitioning}
import org.apache.spark.sql.functions.{col, lit, pmod}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Storage-partitioned joins (SPJ) — the DataSourceV2 sibling of the
  * catalog-table bucketing `SnapshotTable.readBucketed` uses. Instead of
  * registering a Hive-style bucketed table, the CONNECTOR ITSELF reports
  * how its files are clustered:
  *
  *   - the table declares `partitioning() = bucket(n, key)`;
  *   - the scan reports `KeyGroupedPartitioning(bucket(n, key), n)` and
  *     every input partition carries its bucket id via `HasPartitionKey`;
  *   - the catalog doubles as a `FunctionCatalog` exposing the `bucket`
  *     function, which Spark binds to compare both sides' transforms
  *     (same canonical name + same arguments = co-partitioned);
  *   - with `spark.sql.sources.v2.bucketing.enabled=true`, Catalyst's
  *     EnsureRequirements sees matching KeyGroupedPartitionings on the
  *     join keys and plans the join with ZERO shuffle exchanges.
  *
  * At 100 TB this is the difference between re-shuffling both fact tables
  * on every join and reading co-located buckets directly — and unlike
  * catalog-table bucketing it needs no metastore entry: the layout
  * contract lives in the data directory (`b<bucket>/` dirs + a JSON
  * sidecar) and survives engine restarts, new sessions, and parallel
  * readers for free.
  *
  * Bucket assignment is `pmod(key, n)` on an integral key, implemented
  * identically in the writer (a Spark expression) and in the V2
  * `ScalarFunction` Spark binds during planning. Supported column types:
  * long / int / double / string (the reader is a parquet-hadoop Group
  * reader with column projection pushed via `parquet.read.schema`).
  *
  * Reference surface: this generalizes the reference's staged-table
  * promote/read cycle (ror_dag.py staging→production) to a layout that
  * big joins can exploit; it is an extension component, not a port.
  */
object SpjTable {

  /** The layout contract: bucket of a key for n buckets. Writer and the
    * V2 function MUST agree on this. */
  def bucketOf(key: Long, n: Int): Int = (((key % n) + n) % n).toInt

  /** Write `df` as an SPJ table directory: `b<bucket>/part-*.parquet`
    * plus a `_spj_meta.json` sidecar carrying (keyCol, nBuckets, schema).
    * The bucket column is directory-only; files keep the original
    * columns. Key column must be integral.
    *
    * Layout note: the Spark writer stages `_bucket=<b>` partition dirs,
    * which are renamed to plain `b<b>` before the sidecar lands — '='
    * in a path would collide with the SnapshotTable manifest's key=value
    * header grammar, and a k=v dir name invites partition inference on
    * plain directory reads. The sidecar is written LAST, so a crashed
    * write is never mistaken for a complete table. */
  def write(df: DataFrame, dir: String, keyCol: String, nBuckets: Int,
            writeOptions: Map[String, String] = Map.empty): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val keyField = df.schema(keyCol)
    require(keyField.dataType == LongType || keyField.dataType == IntegerType,
      s"SPJ key column must be integral, got ${keyField.dataType}")
    df.withColumn("_bucket", pmod(col(keyCol).cast("long"), lit(nBuckets.toLong)))
      .write.mode("overwrite").options(writeOptions).partitionBy("_bucket").parquet(dir)
    val d = Paths.get(dir)
    Files.list(d).iterator().asScala.toList.foreach { p =>
      val n = p.getFileName.toString
      if (n.startsWith("_bucket="))
        Files.move(p, d.resolve("b" + n.stripPrefix("_bucket=")))
    }
    val meta = s"""{"keyCol":${jstr(keyCol)},"nBuckets":$nBuckets,""" +
      s""""schema":${df.schema.json}}"""
    Files.write(Paths.get(dir, "_spj_meta.json"),
      meta.getBytes(StandardCharsets.UTF_8))
  }

  private def jstr(s: String): String =
    "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

  private[sources] case class Meta(keyCol: String, nBuckets: Int, schema: StructType)

  private[sources] def readMeta(dir: String): Meta = {
    val p = Paths.get(dir, "_spj_meta.json")
    require(Files.exists(p), s"not an SPJ table (no _spj_meta.json): $dir")
    val txt = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
    // tiny fixed-shape parse: keyCol + nBuckets + the spark schema json tail
    val keyCol = """"keyCol":"((?:[^"\\]|\\.)*)"""".r
      .findFirstMatchIn(txt).get.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
    val n = """"nBuckets":(\d+)""".r.findFirstMatchIn(txt).get.group(1).toInt
    val schemaJson = txt.substring(txt.indexOf("\"schema\":") + 9, txt.length - 1)
    Meta(keyCol, n, DataType.fromJson(schemaJson).asInstanceOf[StructType])
  }

  private[sources] def bucketFiles(dir: String, b: Int): Array[String] = {
    val d = Paths.get(dir, s"b$b")
    if (!Files.isDirectory(d)) Array.empty
    else Files.list(d).iterator().asScala
      .filter(p => p.getFileName.toString.endsWith(".parquet"))
      .map(_.toString).toArray.sorted
  }

  /** Parquet projection for the requested columns, built from the FILE's
    * own footer schema so repetition levels (required vs optional) match
    * exactly — the record assembler rejects a projection whose repetition
    * disagrees with the file. */
  private[sources] def projectionOf(
      fileSchema: org.apache.parquet.schema.MessageType, names: Seq[String])
    : org.apache.parquet.schema.MessageType = {
    val picked = names.map { n =>
      require(fileSchema.containsField(n), s"column $n missing in file schema")
      fileSchema.getFields.get(fileSchema.getFieldIndex(n))
    }
    new org.apache.parquet.schema.MessageType("spark_schema", picked: _*)
  }

  // ---- row-group skipping on footer stats ----------------------------------
  //
  // File-level pruning (ZoneMapIndex / BloomFileIndex) stops mattering once
  // files are GB-sized: a 1 GB parquet file holds ~8 row groups, and a
  // selective predicate usually hits one of them. The reader below
  // evaluates pushed predicates against each row group's footer MIN/MAX
  // and skips non-qualifying groups BEFORE any page I/O. Pruning is
  // ADVISORY — every pushed filter is also returned as residual so Spark
  // re-applies it row-by-row — which makes a conservative "survive"
  // always safe; only numeric columns prune (parquet string stats order
  // by unsigned bytes, which Java string compares don't match).

  /** Diagnostic counters (JVM-wide — exact in local mode, per-executor on
    * a cluster): row groups materialized vs skipped by footer stats. */
  val rowGroupsRead = new java.util.concurrent.atomic.AtomicLong
  val rowGroupsSkipped = new java.util.concurrent.atomic.AtomicLong
  def resetRowGroupCounters(): Unit = { rowGroupsRead.set(0); rowGroupsSkipped.set(0) }

  private def toDec(v: Any): Option[java.math.BigDecimal] = v match {
    case l: java.lang.Long    => Some(java.math.BigDecimal.valueOf(l))
    case i: java.lang.Integer => Some(java.math.BigDecimal.valueOf(i.longValue))
    case s: java.lang.Short   => Some(java.math.BigDecimal.valueOf(s.longValue))
    case b: java.lang.Byte    => Some(java.math.BigDecimal.valueOf(b.longValue))
    case d: java.lang.Double  =>
      if (d.isNaN || d.isInfinite) None else Some(new java.math.BigDecimal(d))
    case f: java.lang.Float    =>
      if (f.isNaN || f.isInfinite) None else Some(new java.math.BigDecimal(f.doubleValue))
    case _                    => None
  }

  /** (min, max) of a column's row-group stats as exact decimals, or None
    * when stats are absent/non-numeric/NaN — in which case the group
    * survives (never prune on unknown). */
  private def statBounds(
      block: org.apache.parquet.hadoop.metadata.BlockMetaData, colName: String)
    : Option[(java.math.BigDecimal, java.math.BigDecimal)] =
    block.getColumns.asScala.find(_.getPath.toDotString == colName).flatMap { c =>
      val st = c.getStatistics
      if (st == null || st.isEmpty || !st.hasNonNullValue) None
      else for (mn <- toDec(st.genericGetMin); mx <- toDec(st.genericGetMax))
        yield (mn, mx)
    }

  /** True iff the row group can possibly contain a matching row. */
  private[sources] def blockSurvives(
      block: org.apache.parquet.hadoop.metadata.BlockMetaData,
      filters: Seq[org.apache.spark.sql.sources.Filter]): Boolean = {
    import org.apache.spark.sql.sources._
    def one(f: Filter): Boolean = f match {
      case EqualTo(c, v) => (statBounds(block, c), toDec(v)) match {
        case (Some((mn, mx)), Some(d)) => d.compareTo(mn) >= 0 && d.compareTo(mx) <= 0
        case _                         => true
      }
      case GreaterThan(c, v) => (statBounds(block, c), toDec(v)) match {
        case (Some((_, mx)), Some(d)) => mx.compareTo(d) > 0
        case _                        => true
      }
      case GreaterThanOrEqual(c, v) => (statBounds(block, c), toDec(v)) match {
        case (Some((_, mx)), Some(d)) => mx.compareTo(d) >= 0
        case _                        => true
      }
      case LessThan(c, v) => (statBounds(block, c), toDec(v)) match {
        case (Some((mn, _)), Some(d)) => mn.compareTo(d) < 0
        case _                        => true
      }
      case LessThanOrEqual(c, v) => (statBounds(block, c), toDec(v)) match {
        case (Some((mn, _)), Some(d)) => mn.compareTo(d) <= 0
        case _                        => true
      }
      case IsNotNull(c) =>
        // skippable only when the chunk records every value as null
        !block.getColumns.asScala.find(_.getPath.toDotString == c).exists { cc =>
          val st = cc.getStatistics
          st != null && !st.isEmpty && !st.hasNonNullValue &&
            st.getNumNulls == block.getRowCount
        }
      case And(l, r) => one(l) && one(r)
      case _         => true
    }
    filters.forall(one)
  }
}

/** The `bucket(numBuckets, key)` V2 function. Spark binds this from the
  * table's catalog when resolving the scan's KeyGroupedPartitioning; two
  * scans are co-partitioned iff their bound functions share
  * [[BoundFunction.canonicalName]] and arguments. */
object GraftBucketFunction extends UnboundFunction {
  override def name(): String = "bucket"
  override def description(): String =
    "bucket(numBuckets, key): pmod(key, numBuckets) — the SPJ layout function"
  override def bind(inputType: StructType): BoundFunction = {
    require(inputType.fields.length == 2, s"bucket expects (int, key): $inputType")
    Bound
  }
  object Bound extends ScalarFunction[Integer] {
    override def inputTypes(): Array[DataType] = Array(IntegerType, LongType)
    override def resultType(): DataType = IntegerType
    override def name(): String = "bucket"
    override def canonicalName(): String = "graft.bucket"
    override def isResultNullable: Boolean = false
    override def produceResult(input: InternalRow): Integer =
      SpjTable.bucketOf(input.getLong(1), input.getInt(0))
  }
}

/** Catalog for SPJ tables: identifiers map to warehouse subdirectories
  * written by [[SpjTable.write]]. Register with
  * `spark.sql.catalog.<name>=graft.sources.GraftSpjCatalog` and
  * `spark.sql.catalog.<name>.warehouse=<dir>`. Doubles as the
  * FunctionCatalog that serves `bucket` during SPJ planning. */
class GraftSpjCatalog extends TableCatalog with FunctionCatalog {
  private var catalogName: String = _
  private var warehouse: String = _

  override def initialize(name: String, options: CaseInsensitiveStringMap): Unit = {
    catalogName = name
    warehouse = Option(options.get("warehouse"))
      .getOrElse(sys.error(s"set spark.sql.catalog.$name.warehouse"))
  }
  override def name(): String = catalogName

  private def dirFor(ident: Identifier): JPath =
    Paths.get(warehouse, (ident.namespace() :+ ident.name()): _*)

  override def listTables(namespace: Array[String]): Array[Identifier] = {
    val d = Paths.get(warehouse, namespace: _*)
    if (!Files.isDirectory(d)) Array.empty
    else Files.list(d).iterator().asScala
      .filter(p => Files.exists(p.resolve("_spj_meta.json")))
      .map(p => Identifier.of(namespace, p.getFileName.toString)).toArray
  }

  override def loadTable(ident: Identifier): Table = {
    val dir = dirFor(ident)
    if (!Files.exists(dir.resolve("_spj_meta.json")))
      throw new org.apache.spark.sql.catalyst.analysis.NoSuchTableException(ident)
    new GraftSpjTable(dir.toString)
  }

  override def createTable(
      ident: Identifier, schema: StructType, partitions: Array[Transform],
      properties: java.util.Map[String, String]): Table =
    sys.error("SPJ tables are written with graft.sources.SpjTable.write")
  override def alterTable(ident: Identifier, changes: TableChange*): Table =
    sys.error("SPJ tables are immutable through the catalog")
  override def dropTable(ident: Identifier): Boolean = {
    val dir = dirFor(ident)
    if (!Files.exists(dir)) false
    else { SnapshotTable.deleteRecursively(dir); true }
  }
  override def renameTable(oldIdent: Identifier, newIdent: Identifier): Unit =
    Files.move(dirFor(oldIdent), dirFor(newIdent))

  override def listFunctions(namespace: Array[String]): Array[Identifier] =
    Array(Identifier.of(Array.empty, "bucket"))
  override def loadFunction(ident: Identifier): UnboundFunction =
    if (ident.name() == "bucket") GraftBucketFunction
    else throw new org.apache.spark.sql.catalyst.analysis.NoSuchFunctionException(ident)
}

class GraftSpjTable(dir: String) extends Table with SupportsRead {
  private val meta = SpjTable.readMeta(dir)
  override def name(): String = dir
  override def schema(): StructType = meta.schema
  override def capabilities(): JSet[TableCapability] =
    Collections.singleton(TableCapability.BATCH_READ)
  override def partitioning(): Array[Transform] =
    Array(Expressions.bucket(meta.nBuckets, meta.keyCol))
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new GraftSpjScanBuilder(dir, meta)
}

class GraftSpjScanBuilder(dir: String, meta: SpjTable.Meta)
  extends ScanBuilder with SupportsPushDownRequiredColumns
  with SupportsPushDownFilters {
  private var required: StructType = meta.schema
  private var pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  /** Pruning is ADVISORY: every filter comes back as residual (Spark
    * re-applies row-by-row), and the reader uses the comparison-shaped
    * subset to skip whole row groups on footer stats. */
  override def pushFilters(
      filters: Array[org.apache.spark.sql.sources.Filter])
    : Array[org.apache.spark.sql.sources.Filter] = {
    pushed = filters
    filters
  }
  override def pushedFilters(): Array[org.apache.spark.sql.sources.Filter] = pushed
  override def build(): Scan = new GraftSpjScan(dir, meta, required, pushed)
}

class GraftSpjScan(dir: String, meta: SpjTable.Meta, required: StructType,
                   filters: Array[org.apache.spark.sql.sources.Filter])
  extends Scan with Batch with SupportsReportPartitioning
  with org.apache.spark.sql.connector.read.SupportsReportStatistics {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Same posture as GraftSnapshotScan: without reported statistics a
    * DSv2 relation sizes as defaultSizeInBytes (effectively infinite) and
    * can never be a broadcast side. Shared builder — see GraftScanStats. */
  override def estimateStatistics()
    : org.apache.spark.sql.connector.read.Statistics =
    GraftScanStats.fromFiles(
      (0 until meta.nBuckets).flatMap(b => SpjTable.bucketFiles(dir, b)))
  override def description(): String =
    s"GraftSpjScan(dir=$dir, bucket(${meta.nBuckets}, ${meta.keyCol}), " +
      s"rowGroupFilters=[${filters.mkString(", ")}])"

  /** Both sides of a join over tables written with the same (key, n)
    * report this partitioning; EnsureRequirements then skips both
    * exchanges. Every bucket is emitted (empty ones read zero rows) so
    * the two sides' partition-value sets always line up exactly. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(meta.nBuckets, meta.keyCol)), meta.nBuckets)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until meta.nBuckets).map { b =>
      GraftBucketInputPartition(b, SpjTable.bucketFiles(dir, b), required.json, filters)
        : InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSpjReaderFactory
}

case class GraftBucketInputPartition(
    bucket: Int, files: Array[String], schemaJson: String,
    filters: Array[org.apache.spark.sql.sources.Filter])
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class GraftSpjReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBucketInputPartition]
    val schema = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
    new GraftBucketPartitionReader(p.files, schema, p.filters)
  }
}

/** Per-bucket parquet reader (parquet-hadoop low-level API): column
  * projection via `setRequestedSchema` + ROW-GROUP skipping — each
  * group's footer min/max stats are checked against the pushed filters
  * and non-qualifying groups are skipped before any page I/O
  * ([[SpjTable.blockSurvives]]). */
class GraftBucketPartitionReader(
    files: Array[String], schema: StructType,
    filters: Array[org.apache.spark.sql.sources.Filter])
  extends PartitionReader[InternalRow] {
  private val fileIter = files.iterator
  private var fileReader: org.apache.parquet.hadoop.ParquetFileReader = _
  private var projection: org.apache.parquet.schema.MessageType = _
  private var columnIO: org.apache.parquet.io.MessageColumnIO = _
  private var blocks: Iterator[org.apache.parquet.hadoop.metadata.BlockMetaData] = _
  private var recordReader: org.apache.parquet.io.RecordReader[Group] = _
  private var remainingInGroup: Long = 0L
  private var current: Group = _

  private def openFile(file: String): Unit = {
    val conf = new Configuration()
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new HPath(file), conf)
    fileReader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val fileSchema = fileReader.getFooter.getFileMetaData.getSchema
    projection = SpjTable.projectionOf(fileSchema, schema.fieldNames.toSeq)
    fileReader.setRequestedSchema(projection)
    columnIO = new org.apache.parquet.io.ColumnIOFactory().getColumnIO(projection)
    blocks = fileReader.getRowGroups.asScala.iterator
  }

  /** Position at the next SURVIVING row group of the open file, skipping
    * pruned ones without reading their pages. */
  private def nextRowGroup(): Boolean = {
    while (blocks.hasNext) {
      val block = blocks.next()
      if (SpjTable.blockSurvives(block, filters.toSeq)) {
        val store = fileReader.readNextRowGroup()
        recordReader = columnIO.getRecordReader(
          store, new org.apache.parquet.example.data.simple.convert.GroupRecordConverter(projection))
        remainingInGroup = store.getRowCount
        SpjTable.rowGroupsRead.incrementAndGet()
        if (remainingInGroup > 0) return true
      } else {
        fileReader.skipNextRowGroup()
        SpjTable.rowGroupsSkipped.incrementAndGet()
      }
    }
    fileReader.close(); fileReader = null
    false
  }

  override def next(): Boolean = {
    while (true) {
      if (remainingInGroup > 0) {
        current = recordReader.read()
        remainingInGroup -= 1
        return true
      }
      if (fileReader == null || !nextRowGroup()) {
        if (fileReader == null) {
          if (!fileIter.hasNext) return false
          openFile(fileIter.next())
        }
      }
    }
    false // unreachable
  }

  override def get(): InternalRow = {
    val row = new GenericInternalRow(schema.length)
    var i = 0
    while (i < schema.length) {
      val f = schema(i)
      if (current.getFieldRepetitionCount(f.name) == 0) row.setNullAt(i)
      else f.dataType match {
        case LongType    => row.setLong(i, current.getLong(f.name, 0))
        case IntegerType => row.setInt(i, current.getInteger(f.name, 0))
        case DoubleType  => row.setDouble(i, current.getDouble(f.name, 0))
        case StringType  => row.update(i, UTF8String.fromString(current.getString(f.name, 0)))
        case other       => sys.error(s"unsupported type $other")
      }
      i += 1
    }
    row
  }

  override def close(): Unit =
    if (fileReader != null) { fileReader.close(); fileReader = null }
}
