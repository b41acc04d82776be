"""Data-quality assertion operators (dbt-test equivalents)."""
