"""Schema-driven repair: turn the metadata vocabulary into action.

The reference carries ``default`` (and the rest of the annotation
vocabulary, schema.go:133-139) through its document model without acting
on it; validation reports pass them through. This operator makes
``default`` actionable the way real pipelines use it — fill absent
(NULL) properties with the schema's declared default before validation —
plus a closed-world projection that drops columns the schema doesn't
declare (the relational rendering of ``additionalProperties: false``).

All pure Column expressions (coalesce / select) — zero row-time Python,
column-pruning friendly.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from jsonschema_spark.plans.compile import inline_refs
from jsonschema_spark.resolve import ResolveConfig
from jsonschema_spark.schema import Schema


def _as_schema(schema: Schema | dict | str) -> Schema:
    if isinstance(schema, str):
        return Schema.from_json(schema)
    if isinstance(schema, dict):
        return Schema.from_value(schema)
    return schema


def apply_defaults(
    df: DataFrame,
    schema: Schema | dict | str,
    resolve_config: Optional[ResolveConfig] = None,
) -> DataFrame:
    """Fill NULL top-level properties with the schema's scalar ``default``.

    JSON Schema treats ``default`` as an annotation; ingestion pipelines
    treat it as the fill value for absent properties. Only scalar defaults
    on existing columns apply (composite defaults and undeclared columns
    are left untouched); the fill is cast to the column's type so the
    DataFrame schema is unchanged.
    """
    resolved = inline_refs(_as_schema(schema), resolve_config)
    by_name = {f.name: f.dataType for f in df.schema.fields}
    out = df
    for name, sub in (resolved.properties or {}).items():
        if name not in by_name or sub.default is None:
            continue
        if isinstance(sub.default, (dict, list)):
            continue  # composite defaults: out of the scalar-fill contract
        dtype = by_name[name]
        out = out.withColumn(
            name, F.coalesce(F.col(name), F.lit(sub.default).cast(dtype))
        )
    return out


def project_declared(
    df: DataFrame,
    schema: Schema | dict | str,
    resolve_config: Optional[ResolveConfig] = None,
) -> DataFrame:
    """Closed-world projection: keep only columns the schema declares under
    ``properties`` — the relational action matching the reference
    compiler's always-emitted ``additionalProperties: false``
    (go.go:608). Column order follows the DataFrame (stable)."""
    resolved = inline_refs(_as_schema(schema), resolve_config)
    declared = set((resolved.properties or {}).keys())
    keep = [c for c in df.columns if c in declared]
    return df.select(*keep)


#: JSON Schema type -> Spark cast target for string-source coercion
_JSON_TO_SPARK = {"integer": "bigint", "number": "double", "boolean": "boolean"}


def coerce_types(
    df: DataFrame,
    schema: Schema | dict | str,
    resolve_config: Optional[ResolveConfig] = None,
) -> DataFrame:
    """Schema-driven type coercion for raw string ingest (CSV, scraped
    JSON): every declared property whose schema says ``integer`` /
    ``number`` / ``boolean`` but whose DataFrame column is a STRING is
    try_cast to the schema-implied type. Values that are present but
    uncastable become NULL **and are accounted loudly**: the returned
    frame carries ``_coerce_failed`` (array of column names that failed
    on that row, empty when clean) so callers can quarantine instead of
    silently nulling.

    Strict-cast contract: ``"3.0"`` does NOT coerce to integer (it is a
    number, not an integer lexeme — matching the validator's Decimal-exact
    multipleOf/integer semantics), and only STRING source columns are
    touched (a double column under an integer schema is the validator's
    business, not a cast's). Pure codegen'd expressions (try_cast +
    conditional array), zero Python, column-pruning friendly.
    """
    resolved = inline_refs(_as_schema(schema), resolve_config)
    by_name = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_cols = []
    fail_flags = []
    targets = {}
    for name, sub in (resolved.properties or {}).items():
        types = sub.type or ()
        if len(types) != 1 or types[0] not in _JSON_TO_SPARK:
            continue
        if by_name.get(name) != "string":
            continue
        targets[name] = _JSON_TO_SPARK[types[0]]
    for c in df.columns:
        if c in targets:
            coerced = F.expr(f"try_cast(`{c}` AS {targets[c]})")
            out_cols.append(coerced.alias(c))
            fail_flags.append(
                F.when(
                    F.col(c).isNotNull() & coerced.isNull(), F.lit(c)
                )
            )
        else:
            out_cols.append(F.col(c))
    failed = (
        F.array_compact(F.array(*fail_flags))
        if fail_flags
        else F.array().cast("array<string>")
    )
    return df.select(*out_cols, failed.alias("_coerce_failed"))


def repair(
    df: DataFrame,
    schema: Schema | dict | str,
    drop_undeclared: bool = False,
    resolve_config: Optional[ResolveConfig] = None,
) -> DataFrame:
    """Compose the repair steps (defaults first, then projection)."""
    out = apply_defaults(df, schema, resolve_config)
    if drop_undeclared:
        out = project_declared(out, schema, resolve_config)
    return out


def repair_impact_report(
    df: DataFrame,
    schema: Schema | dict | str,
    validate_schema: Schema | dict | str | None = None,
    drop_undeclared: bool = False,
    resolve_config: Optional[ResolveConfig] = None,
) -> DataFrame:
    """Quantify what ``repair`` would fix BEFORE rewriting the table:
    validate the frame as-is AND after the repair chain, then diff the
    per-(keyword_path, keyword, column) violation counts.

      violations_before / violations_after / fixed (= before - after)

    A keyword absent on one side reports 0 there (full outer join over
    the tiny keyword-triage rows); a NEGATIVE ``fixed`` is a loud signal
    that the repair INTRODUCED violations (e.g. a default that itself
    fails a bound). ``validate_schema`` defaults to the repair schema —
    pass the stricter contract when they differ.

    Plan shape: two validated scans + two keyword-sized groupBys + one
    tiny outer join — the decision input for a 100 TB rewrite, at
    two-scan cost."""
    from jsonschema_spark.operators.validate import validate

    vschema = validate_schema if validate_schema is not None else schema
    before = validate(df, vschema).by_keyword().select(
        "keyword_path", "keyword", "column",
        F.col("violations").alias("violations_before"),
    )
    repaired = repair(df, schema, drop_undeclared=drop_undeclared,
                      resolve_config=resolve_config)
    after = validate(repaired, vschema).by_keyword().select(
        "keyword_path", "keyword", "column",
        F.col("violations").alias("violations_after"),
    )
    j = before.join(after, ["keyword_path", "keyword", "column"],
                    "full_outer")
    b = F.coalesce(F.col("violations_before"), F.lit(0))
    a = F.coalesce(F.col("violations_after"), F.lit(0))
    return j.select(
        "keyword_path", "keyword", "column",
        b.alias("violations_before"),
        a.alias("violations_after"),
        (b - a).alias("fixed"),
    )
