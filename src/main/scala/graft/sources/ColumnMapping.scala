package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{Metadata, MetadataBuilder, StructField, StructType}

/** Delta-style COLUMN MAPPING (name mode) for manifest tables — the
  * indirection that makes `ALTER TABLE … RENAME COLUMN` and `DROP COLUMN`
  * METADATA-ONLY commits on immutable data files.
  *
  * Invariants (the whole design in four lines):
  *
  *  1. The manifest-recorded schema is the LOGICAL (user-visible) schema;
  *     a field may carry the metadata key `graft.physical` naming the
  *     column as it exists IN THE DATA FILES. Absent metadata means
  *     physical == logical — every table starts trivial and pays zero
  *     overhead until its first rename/drop.
  *  2. A physical name is IMMUTABLE once assigned: RENAME changes only the
  *     logical name (attaching `graft.physical`), DROP removes the field
  *     and parks its physical name in the `graft.retired` table property —
  *     so every file ever written stays correctly addressed forever, and a
  *     later re-ADD of the same logical name takes a FRESH physical name
  *     (`name_2`, `name_3`, …) instead of resurrecting dropped data.
  *  3. Every FILE-LEVEL artifact lives in physical currency: parquet
  *     column names, footer-stat keys, bloom keys, hive partition path
  *     segments and the manifest's per-file partition values, and the
  *     declared `partitionCols` list (fixed at creation, when the two
  *     currencies coincide). Renames therefore never touch file metadata.
  *  4. Translation happens at the STORE BOUNDARY only: reads scan the
  *     physical schema and alias to logical; writes rename logical →
  *     physical just before the parquet write; predicate-derived pruning
  *     columns translate once at each public entry point. All internal
  *     pruning machinery speaks physical.
  *
  * Reference framing: the reference's ELT tables never rename columns
  * (`services/staging/app/staging_repo.py` fixes its staging schema), but
  * a lakehouse user expects Delta's `delta.columnMapping.mode = name`
  * behavior — this is that behavior re-derived for the manifest format.
  */
private[graft] object ColumnMapping {

  /** StructField metadata key: the column's name in the data files. */
  val PhysicalKey = "graft.physical"

  /** Table property: comma-joined physical names of DROPPED columns —
    * consulted when adding columns so dropped data is never resurrected.
    */
  val RetiredProp = "graft.retired"

  def physicalName(f: StructField): String =
    if (f.metadata.contains(PhysicalKey)) f.metadata.getString(PhysicalKey)
    else f.name

  /** True when every field's physical name equals its logical name — the
    * state of every table that never renamed/dropped a column; all mapping
    * seams collapse to identity (no extra Project, no behavior change).
    */
  def trivial(s: StructType): Boolean =
    s.fields.forall(f => !f.metadata.contains(PhysicalKey) ||
      f.metadata.getString(PhysicalKey) == f.name)

  /** The schema as the DATA FILES spell it: fields renamed to physical,
    * the mapping key dropped, every OTHER metadata key kept — the parquet
    * reader consumes EXISTS_DEFAULT from the read schema to fill columns
    * absent from pre-evolution files, and stripping it here would turn
    * declared defaults back into nulls.
    */
  def physicalSchema(s: StructType): StructType =
    StructType(s.fields.map { f =>
      val renamed = StructField(physicalName(f), f.dataType, f.nullable,
        f.metadata)
      withPhysical(renamed, renamed.name) // drops the now-redundant key
    })

  /** The physical name of logical column `c` (identity when unmapped —
    * which also safely passes through names that are ALREADY physical,
    * since a renamed field's old logical name no longer exists).
    */
  def physFor(s: StructType, c: String): String =
    s.fields.find(_.name == c).map(physicalName).getOrElse(c)

  /** The logical name of PHYSICAL column `c` (identity when unmapped) —
    * how metadata recorded in physical currency (declared partitionCols,
    * per-file partition values) renders back at the user surface.
    */
  def logicalFor(s: StructType, c: String): String =
    s.fields.find(f => physicalName(f) == c).map(_.name).getOrElse(c)

  /** `ranges`/`values` column translation for the pruning planners. */
  def physRanges(s: StructType, ranges: Seq[(String, Any, Any)]): Seq[(String, Any, Any)] =
    ranges.map { case (c, lo, hi) => (physFor(s, c), lo, hi) }

  /** Fill mapping metadata absent from `schema` (a caller-supplied subset
    * or bare StructType) from the snapshot's recorded schema, matching by
    * logical name — so `read(dir, schema)` on a mapped table addresses the
    * right physical columns even when the caller's schema carries no
    * metadata.
    */
  def resolve(schema: StructType, snapSchema: Option[StructType]): StructType =
    snapSchema match {
      case None => schema
      case Some(ss) =>
        val byName = ss.fields.map(f => f.name -> f).toMap
        StructType(schema.fields.map { f =>
          if (f.metadata.contains(PhysicalKey)) f
          else byName.get(f.name) match {
            case Some(sf) if sf.metadata.contains(PhysicalKey) =>
              f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
                .putString(PhysicalKey, sf.metadata.getString(PhysicalKey))
                .build())
            case _ => f
          }
        })
    }

  /** Logical frame → physical columns, for writing table data files.
    * Columns of `df` NOT in `s` (evolution adds pre-assigned by the
    * caller) pass through by name. Identity (no Project) when trivial.
    */
  def toPhysical(df: DataFrame, s: StructType): DataFrame =
    if (trivial(s)) df
    else {
      val byName = s.fields.map(f => f.name -> f).toMap
      df.select(df.columns.toIndexedSeq.map { c =>
        byName.get(c) match {
          case Some(f) if physicalName(f) != c => col(c).as(physicalName(f))
          case _ => col(c)
        }
      }: _*)
    }

  /** Physical scan output → logical columns (mapping metadata NOT
    * propagated onto the read output — the user-facing frame is clean).
    * `keep` names pass through untouched (row-identity helper columns).
    */
  def aliasToLogical(df: DataFrame, s: StructType,
                     keep: Seq[String] = Nil): DataFrame =
    if (trivial(s) && keep.isEmpty) df
    else df.select((keep.map(col) ++ s.fields.toSeq.map(f =>
      col(physicalName(f)).as(f.name, Metadata.empty))): _*)

  /** Columns as a logical SELECT list over a physical frame. */
  def logicalCols(s: StructType): Seq[Column] =
    s.fields.toIndexedSeq.map(f => col(physicalName(f)).as(f.name, Metadata.empty))

  /** The user-visible shape: mapping metadata stripped (internals resolve
    * through the snapshot schema; DESCRIBE and CTAS-from-scan must not
    * leak or inherit physical names).
    */
  def stripMapping(s: StructType): StructType =
    StructType(s.fields.map { f =>
      if (!f.metadata.contains(PhysicalKey)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        mb.remove(PhysicalKey)
        f.copy(metadata = mb.build())
      }
    })

  def retired(props: Map[String, String]): Set[String] =
    props.get(RetiredProp).toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty).toSet

  def withRetired(props: Map[String, String], add: Iterable[String]): Map[String, String] = {
    val all = retired(props) ++ add
    if (all.isEmpty) props else props + (RetiredProp -> all.toSeq.sorted.mkString(","))
  }

  /** Every physical name the table has EVER used under the current
    * lineage: live fields' physical names plus dropped columns' parked
    * ones — the collision set a fresh column's physical name must avoid.
    */
  def takenPhysical(s: StructType, props: Map[String, String]): Set[String] =
    s.fields.map(physicalName).toSet ++ retired(props)

  /** A fresh physical name for new logical column `name`: the name itself
    * when free, else the first free `name_2`, `name_3`, … (also avoiding
    * the table's logical names, so the physical column can never shadow a
    * differently-mapped sibling in the files).
    */
  def freshPhysical(name: String, s: StructType, props: Map[String, String]): String = {
    val taken = takenPhysical(s, props) ++ s.fieldNames
    if (!taken(name)) name
    else Iterator.from(2).map(i => s"${name}_$i").find(!taken(_)).get
  }

  /** `f` with its physical name pinned to `phys` (no-op metadata when the
    * two names coincide — trivial tables stay metadata-free).
    */
  def withPhysical(f: StructField, phys: String): StructField =
    if (phys == f.name) {
      if (!f.metadata.contains(PhysicalKey)) f
      else {
        val mb = new MetadataBuilder().withMetadata(f.metadata)
        mb.remove(PhysicalKey)
        f.copy(metadata = mb.build())
      }
    } else f.copy(metadata = new MetadataBuilder().withMetadata(f.metadata)
      .putString(PhysicalKey, phys).build())
}
