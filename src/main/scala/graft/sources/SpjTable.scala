package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path => JPath, Paths}
import java.util.{Collections, Set => JSet}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{Path => HPath}
import org.apache.parquet.example.data.Group
import org.apache.parquet.hadoop.ParquetReader
import org.apache.parquet.hadoop.api.ReadSupport
import org.apache.parquet.hadoop.example.GroupReadSupport
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
  def write(df: DataFrame, dir: String, keyCol: String, nBuckets: Int): Unit = {
    require(nBuckets > 0, "nBuckets must be positive")
    val keyField = df.schema(keyCol)
    require(keyField.dataType == LongType || keyField.dataType == IntegerType,
      s"SPJ key column must be integral, got ${keyField.dataType}")
    df.withColumn("_bucket", pmod(col(keyCol).cast("long"), lit(nBuckets.toLong)))
      .write.mode("overwrite").partitionBy("_bucket").parquet(dir)
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
    * exactly — GroupReadSupport rejects a projection whose repetition
    * disagrees with the file. */
  private[sources] def parquetProjection(
      file: String, conf: Configuration, names: Seq[String])
    : org.apache.parquet.schema.MessageType = {
    val in = org.apache.parquet.hadoop.util.HadoopInputFile
      .fromPath(new HPath(file), conf)
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    val fileSchema = try reader.getFooter.getFileMetaData.getSchema
    finally reader.close()
    val picked = names.map { n =>
      require(fileSchema.containsField(n), s"column $n missing in $file")
      fileSchema.getFields.get(fileSchema.getFieldIndex(n))
    }
    new org.apache.parquet.schema.MessageType("spark_schema", picked: _*)
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
    else {
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
      true
    }
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
  extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = meta.schema
  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema
  override def build(): Scan = new GraftSpjScan(dir, meta, required)
}

class GraftSpjScan(dir: String, meta: SpjTable.Meta, required: StructType)
  extends Scan with Batch with SupportsReportPartitioning {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftSpjScan(dir=$dir, bucket(${meta.nBuckets}, ${meta.keyCol}))"

  /** Both sides of a join over tables written with the same (key, n)
    * report this partitioning; EnsureRequirements then skips both
    * exchanges. Every bucket is emitted (empty ones read zero rows) so
    * the two sides' partition-value sets always line up exactly. */
  override def outputPartitioning(): Partitioning =
    new KeyGroupedPartitioning(
      Array(Expressions.bucket(meta.nBuckets, meta.keyCol)), meta.nBuckets)

  override def planInputPartitions(): Array[InputPartition] =
    (0 until meta.nBuckets).map { b =>
      GraftBucketInputPartition(b, SpjTable.bucketFiles(dir, b), required.json)
        : InputPartition
    }.toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new GraftSpjReaderFactory
}

case class GraftBucketInputPartition(
    bucket: Int, files: Array[String], schemaJson: String)
  extends InputPartition with HasPartitionKey {
  override def partitionKey(): InternalRow = InternalRow(bucket)
}

class GraftSpjReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[GraftBucketInputPartition]
    val schema = DataType.fromJson(p.schemaJson).asInstanceOf[StructType]
    new GraftBucketPartitionReader(p.files, schema)
  }
}

/** Per-bucket parquet reader (parquet-hadoop Group API) with column
  * projection pushed down via `parquet.read.schema`. */
class GraftBucketPartitionReader(files: Array[String], schema: StructType)
  extends PartitionReader[InternalRow] {
  private val fileIter = files.iterator
  private var reader: ParquetReader[Group] = _
  private var current: Group = _

  override def next(): Boolean = {
    while (true) {
      if (reader == null) {
        if (!fileIter.hasNext) return false
        val file = fileIter.next()
        val conf = new Configuration()
        conf.set(ReadSupport.PARQUET_READ_SCHEMA,
          SpjTable.parquetProjection(file, conf, schema.fieldNames.toSeq).toString)
        reader = ParquetReader.builder(new GroupReadSupport(), new HPath(file))
          .withConf(conf).build()
      }
      current = reader.read()
      if (current != null) return true
      reader.close(); reader = null
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

  override def close(): Unit = if (reader != null) { reader.close(); reader = null }
}
