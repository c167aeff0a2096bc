package org.apache.spark.sql.execution

import org.apache.spark.sql.catalyst.expressions.UnsafeRow

/** Public facade over [[ExternalAppendOnlyUnsafeRowArray]] — the
  * spill-capable same-key row buffer SortMergeJoin and WindowExec use —
  * which is `private[sql]` and therefore unnameable from graft packages.
  * Lives in `org.apache.spark.sql.execution` for visibility only; no
  * Spark internals are modified. Construction maps the three SMJ buffer
  * confs onto the underlying (inMemRows, inMemSize, spillRows,
  * spillSize) constructor exactly as SortMergeJoinScanner does (size
  * threshold reused for both size params). */
final class SpillableRowBuffer(inMemThreshold: Int, spillThreshold: Int,
                               spillSizeThreshold: Long) {
  private val arr = new ExternalAppendOnlyUnsafeRowArray(
    inMemThreshold, spillSizeThreshold, spillThreshold, spillSizeThreshold)
  def clear(): Unit = arr.clear()
  /** Copies the row into the buffer (or the spill-capable sorter). */
  def add(row: UnsafeRow): Unit = arr.add(row)
  def iteratorFrom(start: Int): Iterator[UnsafeRow] = arr.generateIterator(start)
  def length: Int = arr.length
  /** Bytes spilled to disk so far — exposed so tests can prove a hot
    * key actually took the spill path rather than staying in memory. */
  def spillSize: Long = arr.spillSize
}
