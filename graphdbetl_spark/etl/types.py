"""Source→Spark type mapping (reference R4, ``graphetl/dtypes.py``).

The reference implements only 3 MySQL types, all lossily
(``dtypes.py:88-92``: VAR_STRING → fixed 32-byte string, LONG → int16,
FLOAT → float16) but *documents* the MySQL connector's full 20-type
universe (``dtypes.py:48-72``). We implement the documented universe
faithfully and non-lossily: variable-length strings, full-width ints,
real decimals/timestamps. SURVEY.md §2A flags the reference's lossy
casts as defects not to replicate.
"""

from __future__ import annotations

from pyspark.sql import types as T

# MySQL connector field-type name → Spark type (dtypes.py:48-72 order).
MYSQL_TYPE_MAP: dict[str, T.DataType] = {
    "DECIMAL": T.DecimalType(38, 18),
    "TINY": T.ByteType(),
    "SHORT": T.ShortType(),
    "LONG": T.IntegerType(),  # MySQL LONG is 32-bit (reference used int16: lossy)
    "FLOAT": T.FloatType(),  # reference used float16: lossy
    "DOUBLE": T.DoubleType(),
    "NULL": T.NullType(),
    "TIMESTAMP": T.TimestampType(),
    "LONGLONG": T.LongType(),
    "INT24": T.IntegerType(),
    "DATE": T.DateType(),
    "TIME": T.StringType(),  # Spark has no TIME type; lossless as ISO string
    "DATETIME": T.TimestampType(),
    "YEAR": T.ShortType(),
    "NEWDATE": T.DateType(),
    "VARCHAR": T.StringType(),
    "BIT": T.BinaryType(),
    "NEWDECIMAL": T.DecimalType(38, 18),
    "ENUM": T.StringType(),
    "SET": T.StringType(),
    "TINY_BLOB": T.BinaryType(),
    "MEDIUM_BLOB": T.BinaryType(),
    "LONG_BLOB": T.BinaryType(),
    "BLOB": T.BinaryType(),
    "VAR_STRING": T.StringType(),  # reference truncated to 32 bytes: lossy
    "STRING": T.StringType(),
    "GEOMETRY": T.BinaryType(),
}


def mysql_to_spark_type(mysql_name: str) -> T.DataType:
    try:
        return MYSQL_TYPE_MAP[mysql_name.upper()]
    except KeyError:
        raise KeyError(f"unmapped MySQL field type: {mysql_name!r}") from None
