"""SQL-native metric annotations (FR-073): `-- @metric:` comment blocks.

Reference surface: src/velostream/sql/parser/annotations.rs:31-56
(MetricAnnotation fields), :240-355 (parse_metric_annotations state
machine — a `@metric:` line starts a new annotation, subsequent
`@metric_*` lines attach to it), :372-441 (bucket and required-field
validation); runtime emission semantics in
server/processors/metrics_helper.rs (per record: condition gate →
label extraction → counter increment / gauge set / histogram observe).

Spark-first design: a metric over a materialized stream IS an
aggregation, so each metric is computed lazily as a DataFrame —
counters and histograms are map-side-combinable ``groupBy`` aggregates
(conditional sums, no UDFs, whole-stage codegen), gauges are a
``max_by`` per label set (last-write-wins by event time, exactly the
per-record ``gauge.set`` fold). Prometheus label sets are
low-cardinality by construction, so rendering the text exposition
format collects a bounded frame (capped, erroring past the cap rather
than silently flooding the driver).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, functions as F

_METRIC_TYPES = ("counter", "gauge", "histogram")

#: Prometheus metric-name rule (annotations.rs validate_metric_name).
_NAME_RE = re.compile(r"^[a-zA-Z_:][a-zA-Z0-9_:]*$")


@dataclass
class MetricAnnotation:
    """One `@metric` block (annotations.rs:31-56)."""

    name: str
    metric_type: str = "counter"
    help: str | None = None
    labels: list[str] = field(default_factory=list)
    condition: str | None = None
    sample_rate: float = 1.0
    field: str | None = None
    buckets: list[float] | None = None
    #: original bucket tokens — Prometheus renders `le` exactly as declared
    #: ("1.0" stays "1.0", "5" stays "5"; see the expected-output block in
    #: examples/ecommerce_with_metrics.sql:288-301)
    bucket_texts: list[str] | None = None


class MetricParseError(ValueError):
    pass


def _comment_lines(sql: str) -> list[str]:
    """Extract `--` comment bodies, string-literal aware."""
    out = []
    for line in sql.splitlines():
        in_str: str | None = None
        i = 0
        while i < len(line):
            ch = line[i]
            if in_str:
                if ch == in_str:
                    in_str = None
            elif ch in ("'", '"'):
                in_str = ch
            elif ch == "-" and line[i + 1 : i + 2] == "-":
                out.append(line[i + 2 :].strip())
                break
            i += 1
    return out


def _parse_buckets(value: str) -> tuple[list[float], list[str]]:
    """annotations.rs:372-408 — optional [brackets], strictly ascending,
    strictly positive."""
    toks = [t.strip() for t in value.strip().strip("[]").split(",") if t.strip()]
    try:
        vals = [float(t) for t in toks]
    except ValueError:
        raise MetricParseError(f"invalid bucket values: {value!r}") from None
    if any(b <= 0.0 for b in vals):
        raise MetricParseError(f"histogram buckets must be positive: {vals}")
    if any(a >= b for a, b in zip(vals, vals[1:])):
        raise MetricParseError(f"histogram buckets must be ascending: {vals}")
    return vals, toks


def _validate(ann: MetricAnnotation) -> MetricAnnotation:
    """annotations.rs:411-441."""
    if not _NAME_RE.match(ann.name):
        raise MetricParseError(f"invalid Prometheus metric name: {ann.name!r}")
    if ann.metric_type in ("gauge", "histogram") and not ann.field:
        raise MetricParseError(
            f"metric {ann.name!r} with type {ann.metric_type} requires @metric_field"
        )
    return ann


def parse_metric_annotations(sql: str) -> list[MetricAnnotation]:
    """Parse every `@metric` block from a statement's comments
    (annotations.rs:240-355). A `@metric:` line starts a new annotation;
    `@metric_*` lines attach to the current one; unknown `@` directives
    are skipped silently (they are app/job annotations)."""
    anns: list[MetricAnnotation] = []
    cur: MetricAnnotation | None = None
    for comment in _comment_lines(sql):
        if not comment.startswith("@"):
            continue
        directive, colon, value = comment[1:].partition(":")
        if not colon:
            continue
        directive, value = directive.strip(), value.strip()
        if directive == "metric":
            if cur is not None:
                anns.append(_validate(cur))
            cur = MetricAnnotation(name=value)
        elif directive == "metric_type":
            if cur is None:
                raise MetricParseError("@metric_type without preceding @metric")
            t = value.lower()
            if t not in _METRIC_TYPES:
                raise MetricParseError(f"invalid metric type {value!r}")
            cur.metric_type = t
        elif cur is None:
            continue  # non-metric annotation directives
        elif directive == "metric_help":
            cur.help = value.strip("\"'")
        elif directive == "metric_labels":
            cur.labels = [s.strip() for s in value.split(",") if s.strip()]
        elif directive == "metric_condition":
            cur.condition = value
        elif directive == "metric_sample_rate":
            try:
                cur.sample_rate = float(value)
            except ValueError:
                raise MetricParseError(f"invalid sample_rate {value!r}") from None
            if not 0.0 <= cur.sample_rate <= 1.0:
                raise MetricParseError(f"sample_rate out of range: {cur.sample_rate}")
        elif directive == "metric_field":
            cur.field = value
        elif directive == "metric_buckets":
            cur.buckets, cur.bucket_texts = _parse_buckets(value)
    if cur is not None:
        anns.append(_validate(cur))
    return anns


def label_columns(ann: MetricAnnotation) -> list[str]:
    """DataFrame column name for each declared label. Dotted nested paths
    (`metadata.region`, observability/label_extraction.rs:48-90) become
    underscore-joined column names; exposition still renders the declared
    dotted name."""
    return [c.replace(".", "_") for c in ann.labels]


def _label_expr(path: str):
    """Label extraction expression. Nested dot-paths walk struct fields /
    map keys (label_extraction.rs:66-90); a missing nested value becomes
    the reference's default label value 'unknown'
    (label_extraction.rs:26-32)."""
    if "." not in path:
        # A NULL top-level label column takes the same 'unknown' default as
        # a missing nested value (label_extraction.rs:26-32) — a null must
        # never render as the Python string 'None' in the exposition.
        return F.coalesce(F.col(path).cast("string"), F.lit("unknown"))
    parts = path.split(".")
    col = F.col(parts[0])
    for p in parts[1:]:
        col = col.getItem(p)
    return F.coalesce(col.cast("string"), F.lit("unknown"))


def compute_metric(
    df: DataFrame, ann: MetricAnnotation, time_col: str = "_event_time"
) -> DataFrame:
    """Batch fold of the per-record emission loop (metrics_helper.rs):
    condition gate → label extraction → type-specific accumulation.

    Shapes (all label columns cast to string, as Prometheus labels are):

    - counter:   (*labels, value DOUBLE) — count of passing records.
    - gauge:     (*labels, value DOUBLE) — LAST field value per label set
      (ordered by ``time_col`` when present; ties broken by larger value,
      documented-deterministic).
    - histogram: (*labels, le STRING, value DOUBLE) — Prometheus series:
      cumulative bucket counts per declared bound plus '+Inf', and the
      '_sum' / '_count' series.

    Sampling (`@metric_sample_rate`) is a load-shedding knob for the
    per-record hot path; a batch fold sees every record, so it computes
    the exact (unsampled) metric and leaves shedding to the transport.
    One groupBy per metric — map-side combined, no shuffle beyond the
    label key, no Python on the data path.
    """
    if ann.condition:
        # conditions are written in the reference dialect (e.g.
        # JSON_EXTRACT(...), LEN(...)) — route through the same
        # function-name rewrite the SELECT path uses
        from velostream_spark.sql.dialect import _rewrite_functions

        df = df.where(F.expr(_rewrite_functions(ann.condition)))
    names = label_columns(ann)
    labels = [
        _label_expr(c).alias(a) for c, a in zip(ann.labels, names)
    ]
    gb = df.select(*labels, *[c for c in df.columns if c not in ann.labels])
    if ann.metric_type == "counter":
        return gb.groupBy(*names).agg(
            F.count(F.lit(1)).cast("double").alias("value")
        )
    val = F.col(ann.field).cast("double")
    if ann.metric_type == "gauge":
        if time_col in df.columns:
            order = F.struct(F.col(time_col), val)
            agg = F.max_by(val, order)
        else:
            agg = F.last(val)
        return gb.groupBy(*names).agg(agg.alias("value"))
    # histogram
    buckets = ann.buckets or []
    texts = ann.bucket_texts or [str(b) for b in buckets]
    aggs = [
        F.sum(F.when(val <= F.lit(b), 1).otherwise(0)).cast("double").alias(f"_b{i}")
        for i, b in enumerate(buckets)
    ]
    aggs += [
        F.count(F.lit(1)).cast("double").alias("_n"),
        F.coalesce(F.sum(val), F.lit(0.0)).alias("_s"),
    ]
    g = gb.groupBy(*names).agg(*aggs)
    series = [
        F.struct(F.lit(t).alias("le"), F.col(f"_b{i}").alias("value"))
        for i, t in enumerate(texts)
    ]
    series += [
        F.struct(F.lit("+Inf").alias("le"), F.col("_n").alias("value")),
        F.struct(F.lit("_sum").alias("le"), F.col("_s").alias("value")),
        F.struct(F.lit("_count").alias("le"), F.col("_n").alias("value")),
    ]
    return g.select(*names, F.explode(F.array(*series)).alias("_m")).select(
        *names, F.col("_m.le").alias("le"), F.col("_m.value").alias("value")
    )


def _fmt_value(v: float) -> str:
    if v == int(v) and abs(v) < 1e15:
        return str(int(v))
    return repr(v)


def _escape_label(v: str) -> str:
    """Prometheus text-format label-value escaping: backslash, double
    quote, and newline must be escaped inside the quoted value
    (https://prometheus.io/docs/instrumenting/exposition_formats/)."""
    return v.replace("\\", "\\\\").replace('"', '\\"').replace("\n", "\\n")


def _label_str(
    row, ann: MetricAnnotation, extra: tuple[str, str] | None = None
) -> str:
    parts = [
        f'{name}="{_escape_label(str(row[col]))}"'
        for name, col in zip(ann.labels, label_columns(ann))
    ]
    if extra is not None:
        parts.append(f'{extra[0]}="{_escape_label(extra[1])}"')
    return "{" + ",".join(parts) + "}" if parts else ""


def prometheus_text(
    bindings: list[tuple[MetricAnnotation, DataFrame]],
    time_col: str = "_event_time",
    max_series: int = 10_000,
) -> str:
    """Render the Prometheus text exposition format (the shape shown in
    examples/ecommerce_with_metrics.sql:284-301). Label sets are
    low-cardinality by design; ``max_series`` guards the driver collect
    (erroring loudly beats silently materializing a high-cardinality
    label explosion)."""
    out: list[str] = []
    for ann, src in bindings:
        cols = label_columns(ann)
        rows = compute_metric(src, ann, time_col).limit(max_series + 1).collect()
        if len(rows) > max_series:
            raise ValueError(
                f"metric {ann.name!r} exceeds {max_series} series — "
                "label cardinality too high for exposition"
            )
        if ann.help:
            out.append(f"# HELP {ann.name} {ann.help}")
        out.append(f"# TYPE {ann.name} {ann.metric_type}")
        if ann.metric_type in ("counter", "gauge"):
            for r in sorted(rows, key=lambda r: [str(r[c]) for c in cols]):
                out.append(
                    f"{ann.name}{_label_str(r, ann)} {_fmt_value(r['value'])}"
                )
        else:
            key = lambda r: ([str(r[c]) for c in cols], r["le"])  # noqa: E731
            for r in sorted(rows, key=key):
                if r["le"] == "_sum":
                    out.append(
                        f"{ann.name}_sum{_label_str(r, ann)} "
                        f"{_fmt_value(r['value'])}"
                    )
                elif r["le"] == "_count":
                    out.append(
                        f"{ann.name}_count{_label_str(r, ann)} "
                        f"{_fmt_value(r['value'])}"
                    )
                else:
                    out.append(
                        f"{ann.name}_bucket"
                        f"{_label_str(r, ann, ('le', r['le']))} "
                        f"{_fmt_value(r['value'])}"
                    )
    return "\n".join(out) + ("\n" if out else "")
