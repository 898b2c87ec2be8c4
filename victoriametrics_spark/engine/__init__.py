"""Query engine: AST → Spark DataFrame planner and operator implementations."""
