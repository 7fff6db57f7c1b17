from jsonschema_spark.operators.validate import ValidationResult, validate, violations

__all__ = ["ValidationResult", "validate", "violations"]
