from typical_spark.plans.validation import ValidationPlan, ValidationResult

__all__ = ["ValidationPlan", "ValidationResult"]
