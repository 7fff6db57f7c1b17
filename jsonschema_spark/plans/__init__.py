from jsonschema_spark.plans.compile import (
    CompiledSchema,
    Check,
    CompileError,
    CompileOptions,
    compile_schema,
    inline_refs,
)

__all__ = [
    "CompiledSchema",
    "Check",
    "CompileError",
    "CompileOptions",
    "compile_schema",
    "inline_refs",
]
