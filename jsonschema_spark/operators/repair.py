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
