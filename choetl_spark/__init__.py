"""choetl_spark — a PySpark-native columnar lightweight-compression engine.

A from-scratch re-imagining of the capabilities of Cinchoo/ChoETL
(reference: /root/reference, a C# row-oriented ETL framework) as an
idiomatic Spark engine:

- ``codecs``    pure NumPy/Arrow per-column codecs (dict, RLE, FSST,
                bit-pack, frame-of-reference, plain, zstd pass) — the
                analog of the Parquet.Net encodings ChoETL delegates to
                (reference src/ChoETL.Parquet/ChoParquetRecordWriter.cs:191-212).
- ``stats`` / ``selector``  stats-driven codec auto-selection — the
                scan-vote-commit pattern of ChoETL's MaxScanRows type
                inference (src/ChoETL/ChoRecordReader.cs:141-287) re-aimed
                at codec choice.
- ``engine``    Spark-side encode/decode: salted repartition →
                ``mapInArrow`` vectorized encode producing an
                encoded-chunk table; decode back to bit-identical rows.
- ``ledger``    per-partition lineage + resume-from-checkpoint.
- ``operators`` relational ops (compare/diff, joins, dedup, similarity,
                text stats) mirroring ChoETL's record ops in Spark form.
- ``sources`` / ``functions``  reader/writer and scalar-function surface
                mirroring ChoETL's format readers and converters.

Everything hot-path is vectorized (Arrow batches / pyspark.sql.functions);
no per-row Python anywhere.
"""

__version__ = "0.1.0"

from choetl_spark.codecs import decode_array, encode_array  # noqa: F401
