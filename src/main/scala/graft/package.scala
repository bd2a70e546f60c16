import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.col

package object graft {
  /** Column reference by EXACT name: backtick-quoted so names containing
    * dots (e.g. the flattener's make.unique `tag.1`) resolve as columns,
    * not struct-field extractions. */
  def qcol(name: String): Column = col(s"`$name`")
}
