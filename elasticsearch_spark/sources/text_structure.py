"""Text-structure inference (x-pack/plugin/text-structure).

``find_structure`` mirrors POST /_text_structure/find_structure
(TextStructureFinderManager.java): given a sample of raw text lines,
decide the container format — ``ndjson`` | ``delimited`` |
``semi_structured_text`` — and derive the pieces a pipeline needs to
ingest the rest of the data at scale: column names, a header-row guess,
per-field ES mapping types, the timestamp field + its Java time format,
and (for log lines) a grok-ish pattern.

The inference itself runs driver-side over a bounded sample — exactly the
reference's model (it samples ``lines_to_sample`` lines) — and the result
feeds the DISTRIBUTED read: ``structure_to_spark_schema`` converts the
inferred mappings into a Spark schema so ``spark.read.schema(...)`` scans
the full 100 TB corpus without a second inference pass.
"""

from __future__ import annotations

import json
import re

# ordered: first matching format wins (reference tries NDJSON → XML →
# delimited → semi-structured; we skip XML — not in our data model)
_DELIMITERS = [",", "\t", ";", "|"]

# (regex, java format, needs ISO marker) — a subset of the reference's
# TimestampFormatFinder built-in candidates
_TS_PATTERNS = [
    (re.compile(r"\d{4}-\d{2}-\d{2}[T ]\d{2}:\d{2}:\d{2}(?:[.,]\d+)?(?:Z|[+-]\d{2}:?\d{2})?"),
     "ISO8601"),
    (re.compile(r"[A-Z][a-z]{2} [ \d]\d \d{2}:\d{2}:\d{2}"), "MMM dd HH:mm:ss"),
    (re.compile(r"\d{2}/[A-Z][a-z]{2}/\d{4}:\d{2}:\d{2}:\d{2} [+-]\d{4}"),
     "dd/MMM/yyyy:HH:mm:ss XX"),
    (re.compile(r"\d{10,13}(?![\d.])"), "UNIX_MS"),
]

_BOOL = {"true", "false"}


def _scalar_type(v) -> str:
    """ES mapping type for one JSON/string scalar."""
    if isinstance(v, bool):
        return "boolean"
    if isinstance(v, int):
        return "long"
    if isinstance(v, float):
        return "double"
    if v is None:
        return "keyword"
    s = str(v)
    if _TS_PATTERNS[0][0].fullmatch(s):
        return "date"
    if s.lower() in _BOOL:
        return "boolean"
    if re.fullmatch(r"[+-]?\d+", s):
        return "long"
    if re.fullmatch(r"[+-]?\d*\.\d+([eE][+-]?\d+)?", s):
        return "double"
    return "text" if len(s.split()) > 3 else "keyword"


def _merge_type(a: str | None, b: str) -> str:
    if a is None or a == b:
        return b
    num = {"long", "double"}
    if {a, b} <= num:
        return "double"
    if {a, b} <= {"keyword", "text"}:
        return "text"
    return "keyword"  # mixed scalar kinds degrade to keyword


def _find_timestamp(values: list[str]) -> tuple[str | None, str | None]:
    """First (pattern match, java format) that hits most sampled values."""
    for pat, fmt in _TS_PATTERNS:
        hits = sum(1 for v in values if v and pat.search(v))
        if values and hits >= max(1, len(values) // 2):
            return pat.pattern, fmt
    return None, None


def find_structure(sample: str | list[str], lines_to_sample: int = 1000) -> dict:
    """Infer the structure of a raw text sample.

    Returns a dict shaped like the reference response: ``format``,
    ``num_lines_analyzed``, ``mappings`` and — per format —
    ``column_names`` / ``delimiter`` / ``has_header_row`` (delimited),
    ``timestamp_field`` / ``java_timestamp_formats`` / ``grok_pattern``
    (semi-structured), field mappings (ndjson).
    """
    lines = sample.splitlines() if isinstance(sample, str) else list(sample)
    lines = [ln for ln in lines if ln.strip()][:lines_to_sample]
    if not lines:
        raise ValueError("empty sample: cannot determine structure")

    # --- NDJSON -----------------------------------------------------------
    parsed = []
    for ln in lines:
        try:
            obj = json.loads(ln)
        except ValueError:
            parsed = None
            break
        if not isinstance(obj, dict):
            parsed = None
            break
        parsed.append(obj)
    if parsed:
        fields: dict[str, str | None] = {}
        for obj in parsed:
            for k, v in obj.items():
                fields[k] = _merge_type(fields.get(k), _scalar_type(v))
        ts_field = next((k for k, t in fields.items() if t == "date"), None)
        return {
            "format": "ndjson",
            "num_lines_analyzed": len(lines),
            "mappings": {k: {"type": t} for k, t in fields.items()},
            "timestamp_field": ts_field,
            "java_timestamp_formats": ["ISO8601"] if ts_field else [],
        }

    # --- delimited ---------------------------------------------------------
    for d in _DELIMITERS:
        counts = {ln.count(d) for ln in lines}
        if len(counts) == 1 and counts.pop() >= 1:
            rows = [ln.split(d) for ln in lines]
            ncol = len(rows[0])
            first, rest = rows[0], rows[1:] or rows
            # header heuristic (reference: first row non-numeric + unique,
            # later rows typed differently)
            first_all_text = all(_scalar_type(c) in ("keyword", "text") for c in first)
            rest_has_typed = any(
                _scalar_type(c) not in ("keyword", "text") for r in rest for c in r
            )
            has_header = bool(rest) and first_all_text and rest_has_typed and len(set(first)) == ncol
            names = (
                [c.strip() for c in first]
                if has_header
                else [f"column{i + 1}" for i in range(ncol)]
            )
            data = rest if has_header else rows
            types: list[str | None] = [None] * ncol
            for r in data:
                for i, c in enumerate(r[:ncol]):
                    types[i] = _merge_type(types[i], _scalar_type(c.strip()))
            ts_field = next(
                (names[i] for i, t in enumerate(types) if t == "date"), None
            )
            return {
                "format": "delimited",
                "delimiter": d,
                "num_lines_analyzed": len(lines),
                "has_header_row": has_header,
                "column_names": names,
                "mappings": {n: {"type": t or "keyword"} for n, t in zip(names, types)},
                "timestamp_field": ts_field,
                "java_timestamp_formats": ["ISO8601"] if ts_field else [],
            }

    # --- semi-structured log lines ------------------------------------------
    _, fmt = _find_timestamp(lines)
    grok = None
    if fmt:
        pat = next(p for p, f in _TS_PATTERNS if f == fmt)
        m = pat.search(lines[0])
        prefix = lines[0][: m.start()] if m else ""
        # the grok name must match the DETECTED format and resolve in the
        # ingest grok bank, or the advertised infer-then-ingest handoff
        # (structure.grok_pattern → grok processor) raises KeyError
        grok_name = {
            "ISO8601": "TIMESTAMP_ISO8601",
            "MMM dd HH:mm:ss": "SYSLOGTIMESTAMP",
            "dd/MMM/yyyy:HH:mm:ss XX": "HTTPDATE",
            "UNIX_MS": "POSINT",
        }[fmt]
        grok = (
            f"{re.escape(prefix)}%{{{grok_name}:timestamp}} %{{GREEDYDATA:message}}"
            if m else "%{GREEDYDATA:message}"
        )
    return {
        "format": "semi_structured_text",
        "num_lines_analyzed": len(lines),
        "mappings": {"message": {"type": "text"},
                     **({"timestamp": {"type": "date"}} if fmt else {})},
        "timestamp_field": "timestamp" if fmt else None,
        "java_timestamp_formats": [fmt] if fmt else [],
        "grok_pattern": grok,
    }


_SPARK_TYPES = {
    "long": "long",
    "double": "double",
    "boolean": "boolean",
    "date": "timestamp",
    "keyword": "string",
    "text": "string",
}


def structure_to_spark_schema(structure: dict) -> str:
    """Inferred mappings → a Spark DDL schema string, preserving column
    order for delimited data — feed to ``spark.read.schema(...)`` so the
    full-scale scan skips per-file inference."""
    names = structure.get("column_names") or list(structure["mappings"])
    parts = [
        f"`{n}` {_SPARK_TYPES[structure['mappings'][n]['type']]}" for n in names
    ]
    return ", ".join(parts)
