"""BigQuery-style staging output: newline-JSON data + a derived schema file.

Reference: ``BigQueryGoogleCloudStorageStoreOutput``
(outputs/BigQueryGoogleCloudStorageStoreOutput.java:22) marshals POJOs to
newline-JSON in GCS and derives the BigQuery table schema by reflection
(impl/BigQuerySchemaMarshallerByType.java, BigQueryDataTypeUtil.java:14-22
type map, BigqueryFieldMarshallers.java:29-62 coercions,
BigQueryFieldMode.java NULLABLE/REQUIRED/REPEATED), including nested and
repeated fields; the staged files then drive a load job
(bigqueryjobs/BigQueryLoadGoogleCloudStorageFilesJob.java).

Spark-native: the DataFrame schema *is* the reflection source. We map
Spark types to BQ types (same table as the reference), honor nested
structs (RECORD) and arrays (REPEATED), write ``data/*.json`` +
``schema.json``. The load-job driving (poll/retry/cleanup) belongs to a
connector, not the engine — same separation the reference's
bigqueryjobs/* had.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import types as T

# Reference type map: BigQueryDataTypeUtil.java:14-22 + marshaller
# coercions (BigqueryFieldMarshallers.java:29-62,110-120).
_BQ_TYPES: list[tuple[type, str]] = [
    (T.StringType, "string"),
    (T.LongType, "integer"),
    (T.IntegerType, "integer"),
    (T.ShortType, "integer"),
    (T.ByteType, "integer"),
    (T.DoubleType, "float"),
    (T.FloatType, "float"),
    (T.DecimalType, "float"),
    (T.BooleanType, "boolean"),
    (T.TimestampType, "timestamp"),
    (T.DateType, "timestamp"),
    (T.BinaryType, "bytes"),
]


def _bq_field(f: T.StructField) -> dict:
    dt, mode = f.dataType, ("NULLABLE" if f.nullable else "REQUIRED")
    if isinstance(dt, T.ArrayType):
        mode = "REPEATED"  # ≙ BigQueryFieldMode.REPEATED
        dt = dt.elementType
    entry: dict = {"name": f.name, "mode": mode}
    if isinstance(dt, T.StructType):
        entry["type"] = "record"  # nested record, ≙ SampleNestedRecord
        entry["fields"] = [_bq_field(sub) for sub in dt.fields]
        return entry
    for klass, bq in _BQ_TYPES:
        if isinstance(dt, klass):
            entry["type"] = bq
            return entry
    entry["type"] = "string"  # catch-all coercion (enum/URI/etc → string)
    return entry


def derive_schema(df: DataFrame) -> list[dict]:
    """BigQuery table schema (list of field dicts) from a DataFrame schema."""
    return [_bq_field(f) for f in df.schema.fields]


@dataclass
class BigQueryStageOutput:
    """Write ``path/data/*.json`` (newline JSON) + ``path/schema.json``.
    Returns a BigQueryStoreResult-shaped dict (≙ BigQueryStoreResult.java:18).
    """

    path: str
    mode: str = "overwrite"

    def write(self, df: DataFrame, job_name: str = "") -> dict:
        data_dir = os.path.join(self.path, "data")
        df.write.mode(self.mode).json(data_dir)
        schema = derive_schema(df)
        os.makedirs(self.path, exist_ok=True)
        with open(os.path.join(self.path, "schema.json"), "w") as fh:
            json.dump(schema, fh, indent=2)
        return {"data_dir": data_dir, "schema": schema}
