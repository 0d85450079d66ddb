package graft.sources

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory}
import org.apache.spark.sql.execution.datasources.FilePartition
import org.apache.spark.sql.execution.datasources.v2.FileScan
import org.apache.spark.sql.types.{DataType, StructType}

/** Read-side half of metadata-only RENAME COLUMN (r12 item 8).
  *
  * Files written before a rename physically carry the OLD column name;
  * parquet resolves requested columns per file BY NAME, so a plain
  * read of the new name yields nulls there. The sidecar's field-id
  * alias log ([[GraftTableMeta]]) says which old names belong to each
  * current column; this factory reads BOTH — the delegate's read data
  * schema is extended with the alias columns — and merges per row:
  * at most ONE of the name variants physically exists in any file
  * (names are unique per field id over time), so `first non-null
  * across the variants` is exactly the file's physical value,
  * including genuine nulls (the absent variants are all-null).
  *
  * Pushed filters on the renamed name stay sound: parquet only pushes
  * predicates on columns present in a FILE's schema, so pre-rename
  * files simply don't row-group-skip, and the Filter above the scan
  * re-evaluates on the MERGED output. Name-keyed skipping tiers
  * (stats/bloom/NDV) decline on old entries by their coverage checks —
  * fail-safe, restored by the next analyze. Batches whose alias slots
  * are merged rebuild ONLY the renamed columns; everything else passes
  * through zero-copy.
  */
private[sources] object GraftRename {

  /** Build the merging factory, or None when no alias column is
    * relevant to this scan's projection (the common case — zero cost).
    * `aliases` maps current lower-case name -> retired names.
    */
  def factoryFor(current: FileScan, aliases: Map[String, Seq[String]],
      iso: PartitionReaderFactory => PartitionReaderFactory)
      : Option[PartitionReaderFactory] = {
    val origData = current.readDataSchema
    val renamed = origData.fields.zipWithIndex.flatMap { case (f, i) =>
      aliases.get(f.name.toLowerCase).map(olds => (i, f, olds))
    }
    if (renamed.isEmpty) return None
    val aliasFields = renamed.flatMap { case (_, f, olds) =>
      olds.map(o => f.copy(name = o))
    }
    val extData = StructType(origData.fields ++ aliasFields)
    val ext = GraftScanFilters.withReadDataSchema(current, extData)
    val innerF = iso(ext.toBatch.createReaderFactory())
    val partSchema = current.readPartitionSchema
    val extTypes = (extData.fields ++ partSchema.fields).map(_.dataType)
    val nOrig = origData.length
    val nAlias = aliasFields.length
    // output layout = orig data cols ++ partition cols (alias block
    // dropped); for each output position, the EXTENDED slots to merge
    var aliasPos = nOrig
    val slots: Array[Array[Int]] =
      (origData.fields.zipWithIndex.map { case (f, i) =>
        aliases.get(f.name.toLowerCase) match {
          case Some(olds) =>
            val s = i +: olds.indices.map(j => aliasPos + j)
            aliasPos += olds.length
            s.toArray
          case None => Array(i)
        }
      } ++ partSchema.fields.indices.map(j =>
        Array(nOrig + nAlias + j))).toArray
    Some(new MergeFactory(innerF, slots, extTypes))
  }

  /** Whether every renamed column's type can go through the columnar
    * merge (same copyable set as the deletion-vector rebuild).
    */
  def columnarApplicable(schema: StructType,
      aliases: Map[String, Seq[String]]): Boolean =
    schema.fields.forall(f => !aliases.contains(f.name.toLowerCase) ||
      GraftDv.columnarApplicable(StructType(Seq(f))))

  private final class MergeFactory(inner: PartitionReaderFactory,
      slots: Array[Array[Int]], extTypes: Array[DataType])
    extends PartitionReaderFactory {

    override def supportColumnarReads(p: InputPartition): Boolean =
      inner.supportColumnarReads(p)

    override def createReader(p: InputPartition)
        : PartitionReader[InternalRow] = {
      val base = inner.createReader(p)
      val proj = new org.apache.spark.sql.catalyst.expressions
        .GenericInternalRow(slots.length)
      new PartitionReader[InternalRow] {
        override def next(): Boolean = base.next()
        override def get(): InternalRow = {
          val row = base.get()
          var i = 0
          while (i < slots.length) {
            val ss = slots(i)
            var v: Any = null
            var j = 0
            while (j < ss.length && v == null) {
              if (!row.isNullAt(ss(j))) v = row.get(ss(j), extTypes(ss(j)))
              j += 1
            }
            proj.update(i, v)
            i += 1
          }
          proj
        }
        override def close(): Unit = base.close()
      }
    }

    override def createColumnarReader(p: InputPartition)
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
      import org.apache.spark.sql.execution.vectorized.OnHeapColumnVector
      import org.apache.spark.sql.vectorized.{ColumnVector, ColumnarBatch}
      val base = inner.createColumnarReader(p)
      new PartitionReader[ColumnarBatch] {
        private var out: ColumnarBatch = _
        private var owned: Seq[OnHeapColumnVector] = Nil
        private def closeOwned(): Unit = {
          owned.foreach(_.close()); owned = Nil
        }
        override def next(): Boolean = {
          val has = base.next()
          if (has) {
            val b = base.get()
            val n = b.numRows()
            closeOwned()
            val vs: Array[ColumnVector] = slots.map { ss =>
              if (ss.length == 1) b.column(ss(0))
              else {
                // merge the variants: per row, the first non-null slot
                val dt = extTypes(ss(0))
                val v = new OnHeapColumnVector(n, dt)
                owned = owned :+ v
                var r = 0
                while (r < n) {
                  var j = 0
                  var done = false
                  while (j < ss.length && !done) {
                    if (!b.column(ss(j)).isNullAt(r)) {
                      GraftDv.copyValue(dt, b.column(ss(j)), r, v, r)
                      done = true
                    }
                    j += 1
                  }
                  if (!done) v.putNull(r)
                  r += 1
                }
                v
              }
            }
            out = new ColumnarBatch(vs, n)
          }
          has
        }
        override def get(): ColumnarBatch = out
        override def close(): Unit = { base.close(); closeOwned() }
      }
    }
  }
}
