package graft.sinks

import java.sql.{Connection, DriverManager, PreparedStatement}

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.types._

/** Batched JDBC upsert sink.
  *
  * Re-expresses the reference's hand-rolled JDBC output
  * (jdbc/JDBCOutputFormat.kt: batched PreparedStatement, batch 5000,
  * `INSERT ... ON CONFLICT DO UPDATE`; type mapping
  * jdbc/JDBCTypeUtil.kt). Spark-native shape: `foreachPartition` for
  * batch writes and `writeStream.foreachBatch(sink.writeBatch _)`
  * for streaming — each partition opens one connection and flushes
  * every `batchSize` rows, so throughput scales with executors and
  * no data funnels through the driver.
  *
  * Dialects: `postgres` emits ON CONFLICT upserts (the reference's
  * target), `derby` emits standard MERGE (used by the embedded test
  * DB here). `updateExprs` customizes the conflict action — e.g. the
  * reference's running `balance = balance + excluded.balance`
  * accumulation (TripAggregatorApplication.kt:228-233).
  */
class JdbcUpsertSink(
    url: String,
    driver: String,
    table: String,
    keyCols: Seq[String],
    valCols: Seq[String],
    updateExprs: Map[String, String] = Map.empty,
    batchSize: Int = 5000,
    dialect: String = "postgres",
    user: Option[String] = None,
    password: Option[String] = None) extends Serializable {

  private def cols: Seq[String] = keyCols ++ valCols

  /** Postgres-style: INSERT ... ON CONFLICT (keys) DO UPDATE SET ... */
  private def postgresSql: String = {
    val sets = valCols.map { c =>
      val e = updateExprs.getOrElse(c, s"excluded.$c")
      s"$c = $e"
    }.mkString(", ")
    s"""INSERT INTO $table (${cols.mkString(", ")})
       |VALUES (${cols.map(_ => "?").mkString(", ")})
       |ON CONFLICT (${keyCols.mkString(", ")}) DO UPDATE SET $sets""".stripMargin
  }

  /** ANSI/Derby MERGE with a single-row VALUES source. */
  private def derbySql(schema: StructType): String = {
    val typed = cols.map(c => s"CAST(? AS ${sqlType(schema(c).dataType)}) AS $c")
    val on = keyCols.map(k => s"t.$k = s.$k").mkString(" AND ")
    val sets = valCols.map { c =>
      val e = updateExprs.getOrElse(c, s"s.$c")
        .replace("excluded.", "s.").replace(s"$table.", "t.")
      s"t.$c = $e"
    }.mkString(", ")
    s"""MERGE INTO $table t
       |USING (SELECT ${typed.mkString(", ")} FROM SYSIBM.SYSDUMMY1) s
       |ON $on
       |WHEN MATCHED THEN UPDATE SET $sets
       |WHEN NOT MATCHED THEN INSERT (${cols.mkString(", ")})
       |VALUES (${cols.map(c => s"s.$c").mkString(", ")})""".stripMargin
  }

  def upsertSql(schema: StructType): String =
    if (dialect == "derby") derbySql(schema) else postgresSql

  private def sqlType(dt: DataType): String = dt match {
    case LongType => "BIGINT"
    case IntegerType => "INTEGER"
    case DoubleType => "DOUBLE"
    case FloatType => "REAL"
    case BooleanType => "BOOLEAN"
    case TimestampType => "TIMESTAMP"
    case DateType => "DATE"
    case _: DecimalType => "DECIMAL(38,10)"
    case _ => "VARCHAR(4000)"
  }

  /** JDBCTypeUtil-style Spark-type → PreparedStatement setter. */
  private def bind(ps: PreparedStatement, idx: Int, dt: DataType, row: Row, field: Int): Unit = {
    if (row.isNullAt(field)) {
      ps.setObject(idx, null)
    } else dt match {
      case LongType => ps.setLong(idx, row.getLong(field))
      case IntegerType => ps.setInt(idx, row.getInt(field))
      case ShortType => ps.setShort(idx, row.getShort(field))
      case ByteType => ps.setByte(idx, row.getByte(field))
      case DoubleType => ps.setDouble(idx, row.getDouble(field))
      case FloatType => ps.setFloat(idx, row.getFloat(field))
      case BooleanType => ps.setBoolean(idx, row.getBoolean(field))
      case StringType => ps.setString(idx, row.getString(field))
      case TimestampType => ps.setTimestamp(idx, row.getTimestamp(field))
      case DateType => ps.setDate(idx, row.getDate(field))
      case BinaryType => ps.setBytes(idx, row.getAs[Array[Byte]](field))
      case d: DecimalType => ps.setBigDecimal(idx, row.getDecimal(field))
      case _ => ps.setObject(idx, row.get(field))
    }
  }

  private def connect(): Connection = {
    Class.forName(driver)
    user match {
      case Some(u) => DriverManager.getConnection(url, u, password.orNull)
      case None => DriverManager.getConnection(url)
    }
  }

  /** Batch (or foreachBatch) write: one connection per partition,
    * batched execution every `batchSize` rows.
    */
  def writeBatch(df: DataFrame, batchId: Long = 0L): Unit = {
    val schema = df.schema
    val projected = df.select((keyCols ++ valCols).map(df.col): _*)
    val outSchema = projected.schema
    val sql = upsertSql(outSchema)
    val bs = batchSize
    val binds = outSchema.fields.map(_.dataType)
    projected.foreachPartition { (rows: Iterator[Row]) =>
      if (rows.nonEmpty) {
        val conn = connect()
        conn.setAutoCommit(false)
        try {
          val ps = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { row =>
            var i = 0
            while (i < binds.length) {
              bind(ps, i + 1, binds(i), row, i)
              i += 1
            }
            ps.addBatch()
            n += 1
            if (n % bs == 0) { ps.executeBatch(); conn.commit() }
          }
          ps.executeBatch()
          conn.commit()
          ps.close()
        } finally conn.close()
      }
    }
  }

  /** Hook for writeStream.foreachBatch(sink.foreachBatchWriter). */
  def foreachBatchWriter: (DataFrame, Long) => Unit = writeBatch
}
