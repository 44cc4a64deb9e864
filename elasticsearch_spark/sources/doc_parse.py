"""Document parsing: JSON → typed columns with dynamic-mapping semantics.

Re-expresses the reference's document parse + dynamic mapping
(``server/src/main/java/org/elasticsearch/index/mapper/DocumentParser.java:72,456-473``,
``DynamicFieldsBuilder.java``): explicit mappings declare field types;
unmapped fields hit the ``dynamic`` policy —

- ``true``   (default): infer new fields from the data (schema inference
  over the batch, the distributed analog of per-doc type guessing);
- ``false``: unmapped fields are stored (kept inside ``_source``) but not
  indexed → not materialized as columns;
- ``strict``: unmapped fields reject the document
  (``DocumentParser.java:457``) → quarantined to a rejects frame rather
  than failing the job (bulk-item-level failure semantics);
- ``runtime``: unmapped fields become query-time computed columns
  (``runtime_field`` below), not stored columns.

The mapping dict uses ES field types: keyword/text → string, long/integer/
short/byte, double/float, boolean, date (epoch-millis or ISO), ip →
normalized string, binary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

_ES_TO_SPARK = {
    "keyword": T.StringType(), "text": T.StringType(),
    "long": T.LongType(), "integer": T.IntegerType(), "short": T.ShortType(),
    "byte": T.ByteType(), "double": T.DoubleType(), "float": T.FloatType(),
    "half_float": T.FloatType(), "boolean": T.BooleanType(),
    "date": T.TimestampType(), "ip": T.StringType(), "binary": T.BinaryType(),
    # date_nanos (DateFieldMapper.Resolution.NANOSECONDS): nanosecond
    # resolution exceeds Spark's microsecond timestamps, so the column is
    # epoch-nanos as long — the same representation the reference stores in
    # doc values (LongPoint nanos); sort/range/aggs operate on the long
    "date_nanos": T.LongType(),
    # murmur3 (plugins/mapper-murmur3, Murmur3FieldMapper.java): the field
    # stores a 64-bit hash of the value, queried only through cardinality
    # aggs. Parsed as the raw string, hashed JVM-side at parse time (we use
    # xxhash64 — the reference itself documents its hashes as opaque and
    # non-portable, the contract is "stable 64-bit hash", not the bytes)
    "murmur3": T.LongType(),
}


def mapping_to_schema(mapping: dict) -> T.StructType:
    """ES ``properties`` mapping → Spark StructType (nested ``object`` and
    ``nested`` types recurse; nested → array<struct>)."""
    fields = []
    for name, spec in mapping.get("properties", mapping).items():
        if name == "_size":  # metadata toggle, not a document field
            continue
        t = spec.get("type", "object")
        if t == "object" or "properties" in spec and t not in ("nested",):
            dt: T.DataType = mapping_to_schema(spec)
        elif t == "nested":
            dt = T.ArrayType(mapping_to_schema(spec))
        else:
            dt = _ES_TO_SPARK[t]
        fields.append(T.StructField(name, dt))
    return T.StructType(fields)


def parse_documents(
    spark: SparkSession,
    raw: DataFrame,
    json_col: str,
    mapping: dict,
    dynamic: str = "true",
    id_col: str | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Parse a JSON-string column into typed columns per the mapping.

    Returns (parsed, rejects). ``rejects`` is non-empty only under
    ``dynamic: strict`` (docs with unmapped fields, carrying a `_reason`).
    The original JSON is retained as ``_source`` (SourceFieldMapper
    semantics)."""
    # murmur3 fields parse as STRING then hash at materialization — the
    # declared Long type is the hash, not the value
    murmur_fields = {
        n for n, spec in mapping.get("properties", mapping).items()
        if isinstance(spec, dict) and spec.get("type") == "murmur3"
    }
    # date_nanos parses as STRING then converts to epoch-nanos long —
    # from_json can't express the iso-with-9-fraction-digits → long step
    nanos_fields = {
        n for n, spec in mapping.get("properties", mapping).items()
        if isinstance(spec, dict) and spec.get("type") == "date_nanos"
    }
    str_parsed = murmur_fields | nanos_fields
    schema = mapping_to_schema(mapping)
    if str_parsed:
        schema = T.StructType([
            T.StructField(f.name, T.StringType() if f.name in str_parsed else f.dataType)
            for f in schema.fields
        ])
    mapped_names = set(schema.fieldNames())
    keys = raw.select(
        "*", F.json_object_keys(F.col(json_col)).alias("__keys")
    )
    unmapped = F.array_except(
        F.col("__keys"), F.array(*[F.lit(n) for n in sorted(mapped_names)])
    )

    if dynamic == "strict":
        # malformed / null / non-object JSON: json_object_keys is NULL, so
        # size(unmapped) is NULL (or -1 legacy) and the row would match
        # NEITHER branch — vanishing instead of being quarantined with a
        # reason (bulk item-level failure semantics)
        bad_json = F.col("__keys").isNull()
        ok = keys.where(~bad_json & (F.size(unmapped) == 0))
        rejects = (
            keys.where(bad_json | (F.size(unmapped) > 0))
            .withColumn(
                "_reason",
                F.when(bad_json, F.lit("mapper_parsing_exception: not a JSON object"))
                .otherwise(F.concat(
                    F.lit("strict_dynamic_mapping_exception: "),
                    F.array_join(unmapped, ","),
                )),
            )
            .drop("__keys")
        )
    else:
        ok, rejects = keys, keys.limit(0).withColumn("_reason", F.lit("")).drop("__keys")

    parsed = ok.withColumn("__doc", F.from_json(F.col(json_col), schema))

    props = mapping.get("properties", mapping)

    def _spec(n: str) -> dict:
        s = props.get(n)
        return s if isinstance(s, dict) else {}

    # per-field mapping params (MappedFieldType / FieldMapper.java):
    #   ignore_above   (keyword)      — longer values are NOT indexed (null
    #                                    column) but stay in _source
    #   null_value                    — explicit JSON null indexes the
    #                                    substitute (absent fields don't)
    #   ignore_malformed               — unparseable values null the column
    #                                    and record the field in _ignored
    #                                    (IgnoredFieldMapper) instead of
    #                                    failing the document
    # Fields WITHOUT ignore_malformed whose present value fails the typed
    # parse reject the document (mapper_parsing_exception, bulk item-level
    # failure) — checked for numeric/boolean types where from_json's null
    # reliably means malformed (dates/ips parse leniently, documented).
    _CHECKED = (T.LongType, T.IntegerType, T.ShortType, T.ByteType,
                T.DoubleType, T.FloatType, T.BooleanType)
    _INTEGRAL = (T.LongType, T.IntegerType, T.ShortType, T.ByteType)

    def _coerced(n: str, dtype: T.DataType) -> Column:
        # coerce: true (NumberFieldMapper.java default) — JSON strings
        # holding a parseable number index as the number; from_json nulls
        # them, so fall back to casting the raw JSON scalar. Integral types
        # additionally truncate decimal strings ("4.5" -> 4), matching
        # Numbers.toLongExact's coerce path.
        col = F.col(f"__doc.{n}")
        raw_v = F.get_json_object(F.col(json_col), f"$.{n}")
        casts = [raw_v.try_cast(dtype.simpleString())]
        if isinstance(dtype, _INTEGRAL):
            casts.append(raw_v.try_cast("double").try_cast(dtype.simpleString()))
        return F.coalesce(col, *casts)

    def _field_col(n: str) -> Column:
        col = F.col(f"__doc.{n}")
        spec = _spec(n)
        if isinstance(schema[n].dataType, _CHECKED) and n not in murmur_fields:
            col = _coerced(n, schema[n].dataType)
        if n in murmur_fields:
            # a missing field hashes to NOTHING (the reference's murmur3
            # mapper indexes no value) — xxhash64(NULL) would return the
            # seed and give every absent field a phantom shared hash
            return F.when(col.isNotNull(), F.xxhash64(col)).alias(n)
        if n in nanos_fields:
            # ISO strings: Spark's cast truncates to micros, so recover the
            # nanosecond tail (fraction digits 7-9) textually; bare numeric
            # strings are epoch_millis (the default format's second branch,
            # strict_date_optional_time_nanos||epoch_millis)
            ts_us = F.unix_micros(col.try_cast("timestamp"))
            tail = F.regexp_extract(col, r"\.\d{6}(\d{1,3})", 1)
            nanos_tail = F.when(tail == "", F.lit(0)).otherwise(
                F.rpad(tail, 3, "0").cast("long"))
            return F.coalesce(
                ts_us * F.lit(1000) + nanos_tail,
                col.try_cast("long") * F.lit(1_000_000),
            ).alias(n)
        ia = spec.get("ignore_above")
        if ia is not None and spec.get("type") == "keyword":
            col = F.when(F.length(col) <= int(ia), col)
        nv = spec.get("null_value")
        if nv is not None:
            # present-but-null (field name in __keys, parsed null, raw JSON
            # literal null) → substitute; absent stays absent
            raw_v = F.get_json_object(F.col(json_col), f"$.{n}")
            col = F.when(
                col.isNull() & F.array_contains(F.col("__keys"), n)
                & raw_v.isNull(),
                F.lit(nv),
            ).otherwise(col)
        return col.alias(n)

    out_cols = [_field_col(n) for n in schema.fieldNames()]

    # _ignored + malformed rejection over the checked scalar types
    malformed_flags = []
    for f_ in schema.fields:
        if not isinstance(f_.dataType, _CHECKED) or f_.name in murmur_fields:
            continue
        present = F.array_contains(F.col("__keys"), f_.name) & \
            F.get_json_object(F.col(json_col), f"$.{f_.name}").isNotNull()
        bad = present & _coerced(f_.name, f_.dataType).isNull()
        malformed_flags.append((f_.name, bad, bool(_spec(f_.name).get("ignore_malformed"))))
    ignored_entries = [F.when(bad, F.lit(n)) for n, bad, im in malformed_flags if im]
    strict_bad = [bad for _, bad, im in malformed_flags if not im]
    if ignored_entries:
        out_cols.append(
            F.array_compact(F.array(*ignored_entries)).alias("_ignored"))
    if strict_bad:
        import functools as _ft

        any_bad = _ft.reduce(lambda a, b: a | b, strict_bad)
        bad_rows = parsed.where(any_bad).withColumn(
            "_reason", F.lit("mapper_parsing_exception: malformed value")
        ).drop("__keys", "__doc")
        rejects = rejects.unionByName(bad_rows, allowMissingColumns=True)
        parsed = parsed.where(~any_bad)

    # copy_to (FieldMapper copyTo): source values append to the target's
    # token stream — for text/keyword targets the space-joined concat is
    # the same analyzed term multiset
    copy_targets: dict[str, list[str]] = {}
    for n in schema.fieldNames():
        for tgt in _spec(n).get("copy_to") or []:
            copy_targets.setdefault(tgt, []).append(n)

    if dynamic == "true":
        # schema inference over the batch for unmapped fields (the dynamic-
        # mapping update): infer from the JSON itself, add missing columns
        inferred = spark.read.json(
            ok.select(F.col(json_col).alias("value")).rdd.map(lambda r: r["value"])
        ).schema
        for f_ in inferred.fields:
            if f_.name not in mapped_names:
                parsed = parsed.withColumn(
                    f_.name, F.get_json_object(F.col(json_col), f"$.{f_.name}").cast(f_.dataType)
                    if isinstance(f_.dataType, (T.StringType, T.LongType, T.DoubleType, T.BooleanType))
                    else F.from_json(F.col(json_col), T.StructType([f_])).getField(f_.name)
                )
                out_cols.append(F.col(f_.name))

    if copy_targets:
        names_in_out = list(schema.fieldNames())
        for tgt, sources in copy_targets.items():
            pieces = [F.col(f"__doc.{s}").cast("string") for s in sources]
            if tgt in names_in_out:
                joined = F.concat_ws(
                    " ", F.col(f"__doc.{tgt}").cast("string"), *pieces)
                out_cols[names_in_out.index(tgt)] = F.when(
                    F.trim(joined) != "", F.trim(joined)).alias(tgt)
            else:
                joined = F.concat_ws(" ", *pieces)
                out_cols.append(
                    F.when(F.trim(joined) != "", F.trim(joined)).alias(tgt))

    base = [F.col(id_col)] if id_col and id_col in raw.columns else []
    extra = []
    if mapping.get("_size", {}).get("enabled"):
        # _size metadata field (plugins/mapper-size, SizeFieldMapper.java):
        # the byte length of the original _source
        extra.append(F.octet_length(F.col(json_col)).alias("_size"))
    result = parsed.select(
        *base, *out_cols, *extra, F.col(json_col).alias("_source")
    )
    return result, rejects


def runtime_field(df: DataFrame, name: str, expr: str) -> DataFrame:
    """Runtime field (``server/.../search/runtime/``): a query-time computed
    column — evaluated per query, never stored."""
    return df.withColumn(name, F.expr(expr))
