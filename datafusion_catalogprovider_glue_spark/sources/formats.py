"""Hive SerDe-triple → Spark reader dispatch (SURVEY.md §2-B).

Behavioral parity with the reference's ``calculate_options``
(glue.rs:348-454): the (InputFormat, OutputFormat, SerializationLibrary)
triple from a Glue ``StorageDescriptor`` picks the file format and its
options; anything unrecognized raises ``NotImplementedYet`` with the
triple in the message (glue.rs:426-429).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from datafusion_catalogprovider_glue_spark.errors import NotImplementedYet

# Hive class names, as Glue emits them (glue.rs:378-425)
PARQUET_IN = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetInputFormat"
PARQUET_OUT = "org.apache.hadoop.hive.ql.io.parquet.MapredParquetOutputFormat"
PARQUET_SERDE = "org.apache.hadoop.hive.ql.io.parquet.serde.ParquetHiveSerDe"
TEXT_IN = "org.apache.hadoop.mapred.TextInputFormat"
TEXT_OUT = "org.apache.hadoop.hive.ql.io.HiveIgnoreKeyTextOutputFormat"
LAZY_SIMPLE_SERDE = "org.apache.hadoop.hive.serde2.lazy.LazySimpleSerDe"
AVRO_IN = "org.apache.hadoop.hive.ql.io.avro.AvroContainerInputFormat"
AVRO_OUT = "org.apache.hadoop.hive.ql.io.avro.AvroContainerOutputFormat"
AVRO_SERDE = "org.apache.hadoop.hive.serde2.avro.AvroSerDe"
HIVE_JSON_SERDE = "org.apache.hive.hcatalog.data.JsonSerDe"
OPENX_JSON_SERDE = "org.openx.data.jsonserde.JsonSerDe"
ION_SERDE = "com.amazon.ionhiveserde.IonHiveSerDe"
ORC_IN = "org.apache.hadoop.hive.ql.io.orc.OrcInputFormat"
ORC_OUT = "org.apache.hadoop.hive.ql.io.orc.OrcOutputFormat"
ORC_SERDE = "org.apache.hadoop.hive.ql.io.orc.OrcSerde"
# the Hive XML SerDe family (hivexmlserde), as Glue emits it for XML
# tables crawled with the XML classifier
XML_IN = "com.ibm.spss.hive.serde2.xml.XmlInputFormat"
XML_SERDE = "com.ibm.spss.hive.serde2.xml.XmlSerDe"
# Hive RegexSerDe: Glue's model for raw log-line tables
REGEX_SERDE = "org.apache.hadoop.hive.serde2.RegexSerDe"


@dataclass
class ReaderSpec:
    """What ``spark.read`` needs: format name + options."""

    format: str
    options: dict[str, str] = field(default_factory=dict)
    supports_schema_inference: bool = True
    # IonHiveSerDe tables: text Ion reads as JSON (the reference's
    # approximation, glue.rs:421-425), but files carrying the binary
    # Ion version marker route to the pure-Python binary decoder
    # (sources/ion_binary.py) — detection happens at registration
    ion_fallback: bool = False


def calculate_reader_spec(storage_descriptor: dict) -> ReaderSpec:
    """Dispatch the SerDe triple to a Spark reader spec.

    ``storage_descriptor`` is AWS-shaped: ``{"InputFormat": …,
    "OutputFormat": …, "SerdeInfo": {"SerializationLibrary": …,
    "Parameters": {…}}, "Parameters": {…}}``.
    """
    sd = storage_descriptor
    input_format = sd.get("InputFormat") or ""
    output_format = sd.get("OutputFormat") or ""
    serde_info = sd.get("SerdeInfo") or {}
    serde = serde_info.get("SerializationLibrary") or ""
    triple = (input_format, output_format, serde)

    # B1 Parquet (glue.rs:378-382)
    if triple == (PARQUET_IN, PARQUET_OUT, PARQUET_SERDE):
        return ReaderSpec("parquet")

    # B2 CSV (glue.rs:383-405)
    if triple == (TEXT_IN, TEXT_OUT, LAZY_SIMPLE_SERDE):
        serde_params = serde_info.get("Parameters") or {}
        delim = serde_params.get("field.delim")
        if not delim:
            # glue.rs:389-398: delimiter is required, error if absent
            raise NotImplementedYet(
                "CSV table without field.delim serde parameter is not supported"
            )
        sd_params = sd.get("Parameters") or {}
        has_header = sd_params.get("skip.header.line.count") == "1"  # glue.rs:399-403
        return ReaderSpec(
            "csv",
            {"sep": delim[0], "header": "true" if has_header else "false"},
        )

    # B3 Avro (glue.rs:406-410)
    if triple == (AVRO_IN, AVRO_OUT, AVRO_SERDE):
        return ReaderSpec("avro", supports_schema_inference=False)

    # B4/B5/B6 JSON variants + Ion (glue.rs:411-425)
    if input_format == TEXT_IN and output_format == TEXT_OUT and serde in (
        HIVE_JSON_SERDE,
        OPENX_JSON_SERDE,
        ION_SERDE,
    ):
        # Ion: TEXT Ion reads as JSON (the reference's approximation,
        # glue.rs:421-425); BINARY Ion files (which that approximation
        # breaks on in both engines) are detected by their version
        # marker at registration and decode via sources/ion_binary.py
        return ReaderSpec("json", ion_fallback=(serde == ION_SERDE))

    # B8c ORC (EXTENSION — the reference's dispatch has no ORC arm, so
    # real Glue ORC tables fall through to its NotImplemented fallback,
    # glue.rs:426-429.  Spark reads ORC natively with vectorization and
    # predicate pushdown, so the rebuild accepts the standard Hive ORC
    # triple instead of refusing it.)
    if triple == (ORC_IN, ORC_OUT, ORC_SERDE):
        return ReaderSpec("orc")

    # B8f XML (EXTENSION — no reference arm; real Glue XML tables come
    # from the XML classifier with the hivexmlserde triple and would
    # hit the reference's NotImplemented fallback.  Spark 4 reads XML
    # natively; the row tag comes from the SerDe's
    # xmlinput.start parameter, "<row>"-style, defaulting to "row".)
    if input_format == XML_IN and serde == XML_SERDE:
        serde_params = serde_info.get("Parameters") or {}
        row_tag = (
            serde_params.get("xmlinput.start", "<row>")
            .strip("<>")
        )
        return ReaderSpec("xml", {"rowTag": row_tag})

    # B8g RegexSerDe (EXTENSION — no reference arm; Hive's
    # RegexSerDe is how Glue models raw log files: one capture group
    # per column, input.regex required, non-matching lines read as
    # all-NULL rows.  Spark has no regex datasource, so the catalog
    # lowers this spec to a text scan + one regexp_extract per column
    # — see GlueCatalog._load_regex_table.)
    if input_format == TEXT_IN and serde == REGEX_SERDE:
        serde_params = serde_info.get("Parameters") or {}
        pattern = serde_params.get("input.regex")
        if not pattern:
            raise NotImplementedYet(
                "RegexSerDe table without input.regex serde parameter "
                "is not supported"
            )
        return ReaderSpec(
            "regex", {"input.regex": pattern}, supports_schema_inference=False
        )

    # B7 fallback (glue.rs:426-429)
    raise NotImplementedYet(
        f"No support for: {input_format}, {output_format}, {serde} yet."
    )
