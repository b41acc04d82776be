"""Engine operators: relational core + LLM-pipeline extensions."""
